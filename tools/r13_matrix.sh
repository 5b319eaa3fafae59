#!/bin/bash
# Round-13 scale matrix. Changes vs r12 (VERDICT r12 "Next" #1-#4, #7):
#
#  PROTOCOL IS IN-ARTIFACT: every row carries "protocol" —
#  "cold-jvm-single" (one fresh JVM, REPEAT=1) or "cold-jvm-median3"
#  (median of three fresh JVMs, one repeat each). The r12 matrix mixed
#  same-JVM REPEAT=5 medians (warm page cache + JIT: measured ~3x
#  optimistic on dedup_embedding_prod sf100p — 7.4 warm vs ~24.6 cold)
#  with cold re-measures recorded only in prose. Rows that replace an
#  r12 artifact value carry "supersedes":"scale_matrix_r12.jsonl".
#
#  FAILURES CARRY REASONS: a failed cell records the exit code AND the
#  tail of stderr — the r12 followup harness's bare {"status":"failed"}
#  rows (3x dedup_embedding_prod sf1000p, cause lost) are the defect
#  this fixes.
#
#  NEW CELLS: the stateful syslog operators (grouping_by_session,
#  suppress, grouping_by_context_funcs, patterndb_classify,
#  patterndb_synthetic) get decade rows sf1p->sf100p plus ONE SKEWED
#  layout (50% of events on one key, graft.SkewGen); the media family
#  gets its fifth decade (sf1000p documents exist — the fixtures derive
#  from doc_id alone); dedup_video_cc gets a StageProbe attribution.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r13.jsonl}
CELL_TIMEOUT=${CELL_TIMEOUT:-1800}
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done

ERRLOG=/tmp/r13_cell_stderr.log

# one cold JVM, one repeat; echoes the bench JSON line; returns JAVA's
# exit code (NOT the grep's — a `java | grep` pipeline would report a
# 124 timeout as grep's 1 and the reason row would lie)
one_jvm() { # sf query heap
  local tmp=/tmp/r13_cell_stdout.log rc
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_ONLY=$2 SPARK_GRAFT_REPEAT=1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BAND=1 \
    timeout "$CELL_TIMEOUT" java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx$3 graft.Bench >"$tmp" 2>"$ERRLOG"
  rc=$?
  grep '^{' "$tmp"
  return $rc
}

fail_row() { # sf query protocol rc extra
  local reason
  reason=$(tail -c 300 "$ERRLOG" 2>/dev/null | tr -d '"\\' | tr -s '[:cntrl:]' ' ')
  if [ "$4" -eq 124 ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"$3\",\"status\":\"timeout\",\"reason\":\"cell exceeded ${CELL_TIMEOUT}s\"$5}" >> "$OUT"
  else
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"$3\",\"status\":\"failed\",\"reason\":\"exit $4; stderr tail: $reason\"$5}" >> "$OUT"
  fi
  echo "FAILED $1 $2 (rc=$4)" >&2
}

cell_single() { # sf query heap extra-json
  local extra=${4:-}
  if [ ! -d "$1" ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"cold-jvm-single\",\"status\":\"skipped\",\"reason\":\"sf dir missing\"$extra}" >> "$OUT"
    return
  fi
  LINE=$(one_jvm "$1" "$2" "$3"); RC=$?
  if [ -n "$LINE" ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"cold-jvm-single\",\"status\":\"ok\",\"r\":$LINE$extra}" >> "$OUT"
    echo "done $1 $2" >&2
  else
    fail_row "$1" "$2" "cold-jvm-single" "$RC" "$extra"
  fi
}

cell_median3() { # sf query heap extra-json
  local extra=${4:-} vals="" runs="" anyfail=0
  if [ ! -d "$1" ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"cold-jvm-median3\",\"status\":\"skipped\",\"reason\":\"sf dir missing\"$extra}" >> "$OUT"
    return
  fi
  for i in 1 2 3; do
    LINE=$(one_jvm "$1" "$2" "$3"); RC=$?
    if [ -n "$LINE" ]; then
      V=$(echo "$LINE" | sed -n 's/.*"value":\([0-9.]*\).*/\1/p')
      vals="$vals $V"; runs="$runs,$V"
    else
      fail_row "$1" "$2" "cold-jvm-median3 (run $i)" "$RC" "$extra"
      anyfail=1
    fi
  done
  if [ -n "$vals" ]; then
    MED=$(echo $vals | tr ' ' '\n' | sort -g | awk '{a[NR]=$1} END{print a[int((NR+1)/2)]}')
    N=$(echo $vals | wc -w)
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"cold-jvm-median3\",\"status\":\"ok\",\"median_sec\":$MED,\"runs\":[${runs#,}],\"n\":$N$extra}" >> "$OUT"
    echo "done $1 $2 median=$MED (n=$N)" >&2
  elif [ "$anyfail" -eq 0 ]; then
    echo "{\"sf\":\"$1\",\"q\":\"$2\",\"protocol\":\"cold-jvm-median3\",\"status\":\"failed\",\"reason\":\"no runs recorded\"$extra}" >> "$OUT"
  fi
}

: > "$OUT"
SUP=",\"supersedes\":\"scale_matrix_r12.jsonl\",\"supersedes_reason\":\"r12 rows were same-JVM REPEAT=5 medians (warm page cache + JIT)\""

CORE="dedup_semantic_prod dedup_semantic_keep_prod dedup_embedding_prod \
dedup_audio_cc dedup_video_cc dedup_video_dhash"

# --- core family, small decades: single cold JVM ---------------------------
for SF in /root/testdata/sf0.1 $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p; do
  for Q in $CORE; do cell_single "$SF" "$Q" 24g "$SUP"; done
done

# --- core family, sf100p: median-of-3 cold JVMs ----------------------------
for Q in dedup_semantic_prod dedup_semantic_keep_prod dedup_embedding_prod \
    dedup_audio_cc; do
  cell_median3 "$(pwd)/scaledata/sf100p" "$Q" 96g "$SUP"
done
for Q in dedup_video_cc dedup_video_dhash; do
  cell_single "$(pwd)/scaledata/sf100p" "$Q" 96g "$SUP"
done

# --- sf1000p: the fifth decade ---------------------------------------------
for Q in dedup_semantic_prod dedup_semantic_keep_prod dedup_embedding_prod \
    text_chunking_bpe; do
  cell_median3 "$(pwd)/scaledata/sf1000p" "$Q" 96g "$SUP"
done
# media fifth decade (NEW — fixtures derive from doc_id; sf1000p has
# documents.parquet): single cold JVM, long cells
for Q in dedup_audio_cc dedup_video_cc dedup_video_dhash; do
  cell_single "$(pwd)/scaledata/sf1000p" "$Q" 96g
done

# --- stateful syslog operators: decade rows --------------------------------
STATEFUL="grouping_by_session suppress grouping_by_context_funcs \
patterndb_classify patterndb_synthetic"
for SF in $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p; do
  for Q in $STATEFUL; do cell_single "$SF" "$Q" 96g; done
done

# --- skewed layout: 50% of sf10p events on ONE key -------------------------
SKEW=$(pwd)/scaledata/sf10p_skew50
if [ ! -d "$SKEW" ]; then
  if ! java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.SkewGen \
      "$(pwd)/scaledata/sf10p" "$SKEW" 50 >/tmp/r13_skewgen.log 2>"$ERRLOG"; then
    echo "{\"what\":\"skewgen\",\"status\":\"failed\",\"reason\":\"$(tail -c 200 "$ERRLOG" | tr -d '"\\' | tr -s '[:cntrl:]' ' ')\"}" >> "$OUT"
  else
    tail -1 /tmp/r13_skewgen.log >&2
  fi
fi
for Q in grouping_by_session suppress grouping_by_context_funcs \
    patterndb_synthetic; do
  cell_single "$SKEW" "$Q" 96g ",\"layout\":\"skew50-one-key\""
done

# --- dedup_video_cc decode attribution (r12 Next #4) -----------------------
timeout 1200 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx96g graft.StageProbe \
    "$(pwd)/scaledata/sf100p" dedup_video_cc 2>"$ERRLOG" | grep '^{' | \
  while read -r l; do
    echo "{\"what\":\"stageprobe_video_cc_sf100p\",\"r\":$l}" >> "$OUT"
  done

# --- minhash incremental decades (cold protocol re-rows) -------------------
for SF in /root/testdata/sf0.1 $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p \
    $(pwd)/scaledata/sf100p; do
  cell_single "$SF" "dedup_minhash_incremental" 24g ",\"supersedes\":\"r12_followups.jsonl\",\"supersedes_reason\":\"r12 rows were same-JVM REPEAT=5 medians\""
done

echo MATRIX-DONE >&2
