#!/bin/bash
# Round-11 scale matrix: the queries this round CHANGED (distributed
# fine-centroid selection, shift-tolerant video verify) or ADDED
# (audio/video cluster dedup) across the four byte-stable decades,
# plus the FIFTH decade (sf1000p — documents+embeddings only, 20M
# vectors, k = N/32 = 625k: the exact point the r10 verdict predicted
# the old single-task fine merge would carry ~700 MB) for the
# semantic/embedding family. One JVM per (query, sf), isolated
# medians via graft.Bench, harness sort local (the canonical recipe);
# sf1000p uses median-of-3 (a single cell is minutes).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r11.jsonl}
SFS=${SFS:-"/root/testdata/sf0.1 $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p"}
QUERIES=${2:-"dedup_semantic_prod dedup_semantic_keep_prod \
dedup_embedding_prod dedup_audio_cc dedup_video_cc dedup_video_dhash"}
BIGSF=${BIGSF:-"$(pwd)/scaledata/sf1000p"}
BIGQUERIES=${BIGQUERIES:-"dedup_semantic_prod dedup_semantic_keep_prod \
dedup_embedding_prod text_chunking_bpe"}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
run_one() { # sf query repeat heap
  LINE=$(SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_ONLY=$2 SPARK_GRAFT_REPEAT=$3 \
    SPARK_GRAFT_CPUS=32 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx$4 graft.Bench 2>/dev/null | grep '^{')
  echo "{\"sf\":\"$1\",\"q\":\"$2\",\"repeat\":$3,\"r\":$LINE}" >> "$OUT"
  echo "done $1 $2" >&2
}
: > "$OUT"
for SF in $SFS; do
  [ -d "$SF" ] || { echo "skip $SF (missing)" >&2; continue; }
  for Q in $QUERIES; do run_one "$SF" "$Q" 5 24g; done
done
if [ -d "$BIGSF" ]; then
  for Q in $BIGQUERIES; do run_one "$BIGSF" "$Q" 3 96g; done
else
  echo "skip $BIGSF (missing)" >&2
fi
