#!/bin/bash
# Round-12 scale matrix: the r11 set (semantic/embedding family + the
# media cluster-dedup queries, now through the exact-fingerprint
# collapse) across the four byte-stable decades, PLUS the fifth decade
# (sf1000p — documents+embeddings only, 20M vectors, k = N/32 = 625k)
# for the semantic/embedding family. One JVM per (query, sf), isolated
# medians via graft.Bench, harness sort local (the canonical recipe);
# sf1000p uses median-of-3 (a single cell is minutes).
#
# NO SILENT CAPS (r11 verdict #2): every cell the script defines lands
# in the artifact — either a result row or an explicit
# {"status":"failed|timeout"} row with the reason. A missing row is a
# harness bug, not an acceptable outcome. Cells time out individually
# (default 1800 s) so one pathological cell cannot kill the rest of
# the run.
#
# SPARK_GRAFT_BAND=1 opts each cell into bench_history.jsonl (keyed by
# sfDir), so matrix rows accumulate trailing bands across rounds and
# scale claims become adjudicable (r11 verdict #3).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r12.jsonl}
SFS=${SFS:-"/root/testdata/sf0.1 $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p"}
QUERIES=${2:-"dedup_semantic_prod dedup_semantic_keep_prod \
dedup_embedding_prod dedup_audio_cc dedup_video_cc dedup_video_dhash"}
BIGSF=${BIGSF:-"$(pwd)/scaledata/sf1000p"}
BIGQUERIES=${BIGQUERIES:-"dedup_semantic_prod dedup_semantic_keep_prod \
dedup_embedding_prod text_chunking_bpe"}
CELL_TIMEOUT=${CELL_TIMEOUT:-1800}
# GRAFT_CLASSES lets a run pin a frozen snapshot of the compiled
# classes, so concurrent development recompiles cannot change the
# code under measurement mid-matrix
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
run_one() { # sf query repeat heap
  LINE=$(SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_ONLY=$2 SPARK_GRAFT_REPEAT=$3 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BAND=1 \
    timeout "$CELL_TIMEOUT" java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx$4 graft.Bench 2>/dev/null | grep '^{')
  RC=$?
  if [ -n "$LINE" ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"repeat\":$3,\"status\":\"ok\",\"r\":$LINE}" >> "$OUT"
    echo "done $1 $2" >&2
  elif [ "$RC" -eq 124 ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"repeat\":$3,\"status\":\"timeout\",\"reason\":\"cell exceeded ${CELL_TIMEOUT}s\"}" >> "$OUT"
    echo "TIMEOUT $1 $2" >&2
  else
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"repeat\":$3,\"status\":\"failed\",\"reason\":\"exit $RC, no JSON line\"}" >> "$OUT"
    echo "FAILED $1 $2 (rc=$RC)" >&2
  fi
}
: > "$OUT"
for SF in $SFS; do
  if [ ! -d "$SF" ]; then
    for Q in $QUERIES; do
      echo "{\"sf\":\"$SF\",\"q\":\"$Q\",\"status\":\"skipped\",\"reason\":\"sf dir missing\"}" >> "$OUT"
    done
    echo "skip $SF (missing)" >&2
    continue
  fi
  for Q in $QUERIES; do run_one "$SF" "$Q" 5 24g; done
done
if [ -d "$BIGSF" ]; then
  for Q in $BIGQUERIES; do run_one "$BIGSF" "$Q" 3 96g; done
else
  for Q in $BIGQUERIES; do
    echo "{\"sf\":\"$BIGSF\",\"q\":\"$Q\",\"status\":\"skipped\",\"reason\":\"sf dir missing\"}" >> "$OUT"
  done
  echo "skip $BIGSF (missing)" >&2
fi
