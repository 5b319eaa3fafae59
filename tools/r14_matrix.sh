#!/bin/bash
# Round-14 scale matrix. Scope (VERDICT r13 "Next" #1, #3, #4, #5):
#
#  1. POST-REWRITE session-family decades: grouping_by_session /
#     grouping_by_context_funcs / suppress at sf1p/sf10p/sf100p +
#     skew50 under the cold-JVM protocol. The r13 rows measured the
#     builtin session_window plan (37x/decade, partial
#     ObjectHashAggregate below the exchange); the rewrite
#     (Sessions.scala window-ordinal sessionization, r13 final commit +
#     r14 suppress) landed AFTER the r13 matrix, so those rows carry
#     supersedes here.
#  2. Pair-LIST queries annotate their output contract in-artifact:
#     rows carry "contract":"pair-list output" and the cell JSON's
#     out_rows (SPARK_GRAFT_ROWS=1) so a >10x decade is adjudicable
#     against output growth.
#  3. Media sf1000p cells promoted to cold-jvm-median3 (r13 had single
#     cold runs on a VM with documented ±40% bands).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r14.jsonl}
CELL_TIMEOUT=${CELL_TIMEOUT:-1800}
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done

ERRLOG=/tmp/r14_cell_stderr.log

one_jvm() { # sf query heap
  local tmp=/tmp/r14_cell_stdout.log rc
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_ONLY=$2 SPARK_GRAFT_REPEAT=1 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BAND=1 SPARK_GRAFT_ROWS=1 \
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

# PART=sessions|media|all (default all) — the two halves run in separate
# quiet windows so measurement cells never share the VM with sbt work
# (the r13 bench-contamination lesson).
PART=${PART:-all}
[ -f "$OUT" ] || : > "$OUT"

if [ "$PART" = "sessions" ] || [ "$PART" = "all" ]; then
# --- 1. session family POST-REWRITE decades --------------------------------
SUP_SESS=",\"supersedes\":\"scale_matrix_r13.jsonl\",\"supersedes_reason\":\"r13 rows measured the builtin session_window plan (partial ObjectHashAggregate below the exchange, 37x/decade); rewritten to window-ordinal sessionization (Sessions.scala groupingBy r13-final / suppress r14)\""
for SF in $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p; do
  for Q in grouping_by_session grouping_by_context_funcs suppress; do
    cell_single "$SF" "$Q" 96g "$SUP_SESS"
  done
done

# --- skewed layout: 50% of sf10p events on ONE key -------------------------
SKEW=$(pwd)/scaledata/sf10p_skew50
if [ ! -d "$SKEW" ]; then
  if ! java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.SkewGen \
      "$(pwd)/scaledata/sf10p" "$SKEW" 50 >/tmp/r14_skewgen.log 2>"$ERRLOG"; then
    echo "{\"what\":\"skewgen\",\"status\":\"failed\",\"reason\":\"$(tail -c 200 "$ERRLOG" | tr -d '"\\' | tr -s '[:cntrl:]' ' ')\"}" >> "$OUT"
  fi
fi
for Q in grouping_by_session grouping_by_context_funcs suppress; do
  cell_single "$SKEW" "$Q" 96g ",\"layout\":\"skew50-one-key\"$SUP_SESS"
done

fi # PART=sessions

if [ "$PART" = "sessions2" ]; then
# --- 1b. session family on the SessionOrdinal prefix-scan plan -------------
# The window-ordinal rows above (PART=sessions) measured the interim
# lag/running-sum Window plan and found it superlinear too (21-33x last
# decade, WindowExec per-group row buffering — jstack attribution in
# SURVEY). These rows supersede them: the plan is now one key exchange +
# one in-partition sort + a codegen'd stateful session_ordinal Project +
# one aggregate (functions/SessionOrdinal.scala).
SUP2=",\"supersedes\":\"scale_matrix_r14.jsonl window-ordinal rows\",\"supersedes_reason\":\"the interim lag/running-sum Window plan still paid WindowExec per-group row buffering (21-33x last decade, jstack-attributed); replaced by the SessionOrdinal prefix-scan expression\",\"plan\":\"session_ordinal\""
for SF in $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p; do
  for Q in grouping_by_session grouping_by_context_funcs suppress; do
    cell_single "$SF" "$Q" 96g "$SUP2"
  done
done
for Q in grouping_by_session grouping_by_context_funcs suppress; do
  cell_single "$(pwd)/scaledata/sf10p_skew50" "$Q" 96g ",\"layout\":\"skew50-one-key\"$SUP2"
done
fi # PART=sessions2

if [ "$PART" = "sessions3" ]; then
# --- 1c. list-emitting session queries on the sorted-run Complete agg ------
# The session_ordinal rows above still carried the partial+final
# ObjectHashAggregate pair for collect_list queries — both halves
# sort-fall-back at 128 keys over the already-sorted stream. SortedRunAgg
# (ClaimOrdered + one Complete SortAggregate riding the existing
# (key, ordinal) order) removes the partial and both fallback sorts.
# suppress is NOT re-measured: it carries no list aggregate and its plan
# is byte-identical to the session_ordinal rows.
SUP3=",\"supersedes\":\"scale_matrix_r14.jsonl session_ordinal rows\",\"supersedes_reason\":\"the session_ordinal plan still paid a partial+final ObjectHashAggregate pair for collect_list (both halves sort-fallback over the already-sorted stream); replaced by one Complete SortAggregate riding the claimed (key, ordinal) order (SortedRunAgg)\",\"plan\":\"sorted_run_agg\""
for SF in $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p; do
  for Q in grouping_by_session grouping_by_context_funcs; do
    cell_single "$SF" "$Q" 96g "$SUP3"
  done
done
SKEW=$(pwd)/scaledata/sf10p_skew50
if [ ! -d "$SKEW" ]; then
  if ! java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.SkewGen \
      "$(pwd)/scaledata/sf10p" "$SKEW" 50 >/tmp/r14_skewgen.log 2>"$ERRLOG"; then
    echo "{\"what\":\"skewgen\",\"status\":\"failed\",\"reason\":\"$(tail -c 200 "$ERRLOG" | tr -d '"\\' | tr -s '[:cntrl:]' ' ')\"}" >> "$OUT"
  fi
fi
for Q in grouping_by_session grouping_by_context_funcs; do
  cell_single "$SKEW" "$Q" 96g ",\"layout\":\"skew50-one-key\"$SUP3"
done
fi # PART=sessions3

if [ "$PART" = "sessions4" ]; then
# --- 1d. suppress on the family-wide sorted-run Complete aggregate ---------
# The sorted_run_agg route (1c) shipped for list queries first; the A/B
# showed fixed-width session aggregates ALSO lose to the partial+final
# HashAggregate split (the partial map fills at ~60M groups combining
# nothing), so the whole family now routes through the Complete
# SortAggregate. These rows supersede suppress's session_ordinal cells.
SUP4=",\"supersedes\":\"scale_matrix_r14.jsonl session_ordinal suppress rows\",\"supersedes_reason\":\"fixed-width session aggregates also paid the can-combine-nothing partial (HashAggregate map fill at ~60M groups); the family now plans one Complete SortAggregate over ClaimOrdered\",\"plan\":\"sorted_run_agg\""
for SF in $(pwd)/scaledata/sf1p $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p; do
  cell_single "$SF" "suppress" 96g "$SUP4"
done
cell_single "$(pwd)/scaledata/sf10p_skew50" "suppress" 96g ",\"layout\":\"skew50-one-key\"$SUP4"
fi # PART=sessions4

if [ "$PART" = "media" ] || [ "$PART" = "all" ]; then
# --- 2. pair-LIST contract annotations (r13 verdict #4) --------------------
# dedup_video_dhash emits one row per candidate PAIR — output cardinality
# grows superlinearly with corpus size by contract (the cluster-path twin
# dedup_video_cc collapses pairs and rides ~9x/decade). Rows carry the
# contract tag + out_rows from the cell JSON.
PAIRLIST=",\"contract\":\"pair-list output: one row per near-dup candidate pair, cardinality superlinear in corpus size by construction; adjudicate sec/output-row, not sec/decade (cluster-path twin dedup_video_cc carries the per-input scaling)\""
for SF in $(pwd)/scaledata/sf10p $(pwd)/scaledata/sf100p; do
  cell_single "$SF" "dedup_video_dhash" 96g "$PAIRLIST"
done

# --- 3. media fifth decade, promoted to median3 (r13 verdict #5) -----------
SUP_MEDIA=",\"supersedes\":\"scale_matrix_r13.jsonl\",\"supersedes_reason\":\"r13 sf1000p media cells were single cold runs on a VM with documented +/-40% bands; promoted to cold-jvm-median3\""
cell_median3 "$(pwd)/scaledata/sf1000p" "dedup_audio_cc" 96g "$SUP_MEDIA"
cell_median3 "$(pwd)/scaledata/sf1000p" "dedup_video_cc" 96g "$SUP_MEDIA"
cell_median3 "$(pwd)/scaledata/sf1000p" "dedup_video_dhash" 96g "$SUP_MEDIA$PAIRLIST"
fi # PART=media

echo "MATRIX-DONE part=$PART" >&2
