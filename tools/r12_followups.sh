#!/bin/bash
# Post-matrix follow-ups for round 12:
#  1. AssignBench at sf1000p (n=20M, k=N/32=625k) — the r10 #1 bar's
#     five-decade assignment point with the single-task detector live.
#  2. dedup_minhash_incremental across the sf1p/sf10p/sf100p decades —
#     the scale rows for the new rolling-admission operator.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-r12_followups.jsonl}
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
: > "$OUT"
run() { # label heap main args...
  local label=$1 heap=$2; shift 2
  LINE=$(SPARK_GRAFT_CPUS=32 timeout 3600 java -cp "$CP" $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx$heap "$@" 2>/dev/null | grep '^{' | tail -1)
  if [ -n "$LINE" ]; then
    echo "{\"what\":\"$label\",\"r\":$LINE}" >> "$OUT"
    echo "done $label" >&2
  else
    echo "{\"what\":\"$label\",\"status\":\"failed\"}" >> "$OUT"
    echo "FAILED $label" >&2
  fi
}
SPARK_GRAFT_ASSIGN_PATHS=tree \
  run assignbench_sf1000p 96g graft.AssignBench scaledata/sf1000p 3
# clean re-measures of the two sf1000p cells whose first matrix pass
# overlapped diagnostic probe JVMs (CPU+disk contention): one JVM per
# repeat, median taken downstream
for Q in dedup_embedding_prod text_chunking_bpe; do
  for i in 1 2 3; do
    LINE=$(SPARK_GRAFT_SF_DIR=scaledata/sf1000p SPARK_GRAFT_ONLY=$Q \
      SPARK_GRAFT_REPEAT=1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BAND=1 \
      timeout 1800 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx96g graft.Bench 2>/dev/null | grep '^{')
    if [ -n "$LINE" ]; then
      echo "{\"what\":\"sf1000p_remeasure\",\"q\":\"$Q\",\"jvm_run\":$i,\"r\":$LINE}" >> "$OUT"
    else
      echo "{\"what\":\"sf1000p_remeasure\",\"q\":\"$Q\",\"jvm_run\":$i,\"status\":\"failed\"}" >> "$OUT"
    fi
    echo "done sf1000p remeasure $Q run$i" >&2
  done
done
for SF in /root/testdata/sf0.1 scaledata/sf1p scaledata/sf10p scaledata/sf100p; do
  LINE=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=dedup_minhash_incremental \
    SPARK_GRAFT_REPEAT=5 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BAND=1 \
    timeout 1800 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx24g graft.Bench 2>/dev/null | grep '^{')
  if [ -n "$LINE" ]; then
    echo "{\"what\":\"minhash_incremental\",\"sf\":\"$SF\",\"r\":$LINE}" >> "$OUT"
    echo "done minhash_incremental $SF" >&2
  else
    echo "{\"what\":\"minhash_incremental\",\"sf\":\"$SF\",\"status\":\"failed\"}" >> "$OUT"
    echo "FAILED minhash_incremental $SF" >&2
  fi
done
echo FOLLOWUPS-DONE
