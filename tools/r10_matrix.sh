#!/bin/bash
# Round-10 scale matrix over the BYTE-STABLE regenerated decades
# (single-file sf0.1 / 32-file sf1p / 128-file sf10p / 512-file sf100p,
# all from the r10 letter-permutation ScaleGen — a text "decade" is now
# a true 10x in bytes): one JVM per (query, sf), median-of-5 via
# graft.Bench, harness sort local (the canonical recipe).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r10.jsonl}
SFS=${SFS:-"/root/testdata/sf0.1 $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p"}
QUERIES=${2:-"dedup_semantic_prod dedup_semantic_keep_prod \
dedup_embedding_prod dedup_minhash_lsh_xxh64 text_chunking_bpe \
text_pack_bpe decontaminate_bloom multimodal_video_hash \
dedup_video_dhash dedup_image_cc dedup_image_dhash ann_ivfpq \
default_network"}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
: > "$OUT"
for SF in $SFS; do
  [ -d "$SF" ] || { echo "skip $SF (missing)" >&2; continue; }
  for Q in $QUERIES; do
    LINE=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$Q SPARK_GRAFT_REPEAT=5 \
      SPARK_GRAFT_CPUS=32 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx24g graft.Bench 2>/dev/null | grep '^{')
    echo "{\"sf\":\"$SF\",\"q\":\"$Q\",\"r\":$LINE}" >> "$OUT"
    echo "done $SF $Q" >&2
  done
done
