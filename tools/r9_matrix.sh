#!/bin/bash
# Round-9 scale matrix: the round's changed + new queries at the three
# measured decades (single-file sf0.1 / 32-file sf1p / 128-file sf10p),
# one JVM per (query, sf), median-of-5 via graft.Bench — the same
# canonical recipe as the BENCH artifact's isolated column.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r9.jsonl}
QUERIES=${2:-"dedup_embedding_prod dedup_semantic_prod dedup_semantic_keep_prod \
ann_ivfpq decontaminate_semantic text_ccnet_buckets text_chunking_bpe \
text_pack_bpe embed_pq_trained text_classifier_label dedup_minhash_lsh"}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
: > "$OUT"
for SF in /root/testdata/sf0.1 "$(pwd)/scaledata/sf1p" "$(pwd)/scaledata/sf10p"; do
  [ -d "$SF" ] || { echo "skip $SF (missing)" >&2; continue; }
  for Q in $QUERIES; do
    LINE=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$Q SPARK_GRAFT_REPEAT=5 \
      SPARK_GRAFT_CPUS=32 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx24g graft.Bench 2>/dev/null | grep '^{')
    echo "{\"sf\":\"$SF\",\"q\":\"$Q\",\"r\":$LINE}" >> "$OUT"
    echo "done $SF $Q" >&2
  done
done
