#!/bin/bash
# Round-15 scale matrix. Scope (VERDICT r14 "Next" #1, #3, #4, #5):
#
#  1. PART=skewsess — the hot-key straggler fix: skew50 session cells
#     under the r15 skew-split route (SPARK_GRAFT_SESSION_SPLIT) at
#     sf10p AND a freshly generated sf100p_skew50, plus uniform-layout
#     cells with the split ENABLED (the exact-detection stats pass is
#     the price cold keys pay — measure it, don't assert it).
#     Supersedes the r14 skew50 rows (they measured the unsplit plan's
#     single-task sort+scan+fold: 57.1 s vs 6.2 s uniform at sf10p).
#  2. PART=textskew — skewed-text layouts for the dedup families
#     (TextSkewGen: 30% near-dup clusters of ~100 docs + 1 permille
#     literally identical docs = the hot-band-key hazard);
#     dedup_minhash_lsh + dedup_ngram_jaccard decade cells. Both are
#     pair-list queries: out_rows recorded, adjudicate sec/output-row.
#  3. PART=minhash — incremental-minhash admission-regime crossover:
#     the SAME query forced broadcast vs forced shuffle-fallback
#     (SPARK_GRAFT_MINHASH_WAVE_CAP) at sf10p (50k-doc wave) and
#     sf100p (500k-doc wave); plus the sf1000p (5M-doc wave) fallback
#     under StageProbe for stage-level attribution (the broadcast
#     regime at sf1000p is the r14 in-artifact driver abort).
#  4. PART=sess1000 — the session family's fifth decade: frees disk
#     (drops the regenerable sf100p lineitem/orders), replicates
#     sf100p events x10 into sf1000p, runs grouping_by_session +
#     suppress cold-JVM. ~37 GB shuffle per cell: run ALONE.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-scale_matrix_r15.jsonl}
CELL_TIMEOUT=${CELL_TIMEOUT:-3600}
CP="${GRAFT_CLASSES:-target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done

ERRLOG=/tmp/r15_cell_stderr.log

one_jvm() { # sf query heap
  local tmp=/tmp/r15_cell_stdout.log rc
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

PART=${PART:-}
[ -f "$OUT" ] || : > "$OUT"
SPLIT_BUDGET=200000

if [ "$PART" = "skewsess" ]; then
# hot key = 5M rows at sf10p / 50M at sf100p; budget 200k rows/task
# splits it into 25 / 250 ts-range sub-partitions, uniform keys
# (<=~100 rows) never split.
SKEW100=$(pwd)/scaledata/sf100p_skew50
if [ ! -d "$SKEW100" ]; then
  if ! java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.SkewGen \
      "$(pwd)/scaledata/sf100p" "$SKEW100" 50 >/tmp/r15_skewgen.log 2>"$ERRLOG"; then
    echo "{\"what\":\"skewgen sf100p\",\"status\":\"failed\",\"reason\":\"$(tail -c 200 "$ERRLOG" | tr -d '"\\' | tr -s '[:cntrl:]' ' ')\"}" >> "$OUT"
  fi
fi
SUP=",\"supersedes\":\"scale_matrix_r14.jsonl skew50 rows\",\"supersedes_reason\":\"r14 skew rows measured the unsplit plan (one task serializing the hot key's whole sort+scan+fold); r15 skew-split sessionization spreads the hot key over (key, ts-range) splits and stitches boundary sessions\",\"plan\":\"skew_split\",\"split_budget\":$SPLIT_BUDGET"
export SPARK_GRAFT_SESSION_SPLIT=$SPLIT_BUDGET
for Q in grouping_by_session grouping_by_context_funcs suppress; do
  cell_single "$(pwd)/scaledata/sf10p_skew50" "$Q" 96g ",\"layout\":\"skew50-one-key\"$SUP"
done
for Q in grouping_by_session grouping_by_context_funcs suppress; do
  cell_single "$SKEW100" "$Q" 96g ",\"layout\":\"skew50-one-key\"$SUP"
done
# uniform layouts with the split ENABLED: the detection stats pass +
# empty-flags joins are the overhead cold keys pay; compare to the r14
# uniform rows (same queries, split off)
for Q in grouping_by_session grouping_by_context_funcs suppress; do
  cell_single "$(pwd)/scaledata/sf10p" "$Q" 96g ",\"layout\":\"uniform\",\"plan\":\"skew_split_enabled_no_hot_keys\",\"split_budget\":$SPLIT_BUDGET,\"baseline\":\"scale_matrix_r14.jsonl sorted_run_agg uniform rows\""
done
unset SPARK_GRAFT_SESSION_SPLIT
# one unsplit sf100p_skew50 baseline row: quantifies the straggler the
# split removes at the bigger decade (expected ~10x the r14 sf10p 57 s)
cell_single "$SKEW100" "grouping_by_session" 96g ",\"layout\":\"skew50-one-key\",\"plan\":\"sorted_run_agg-unsplit-baseline\""
fi # skewsess

if [ "$PART" = "textskew" ]; then
PAIRLIST=",\"contract\":\"pair-list output: one row per verified near-dup pair; the skew layout packs 30% of docs into ~100-doc near-dup clusters (+1 permille identical docs on ONE band key), so output grows ~100x per clustered doc by construction - adjudicate sec/output-row and straggler shape, not sec/decade\""
for SF in sf1p sf10p sf100p; do
  TS=$(pwd)/scaledata/${SF}_skewtext
  if [ ! -d "$TS" ]; then
    if ! java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.TextSkewGen \
        "$(pwd)/scaledata/$SF" "$TS" 30 1 >>/tmp/r15_textskew.log 2>"$ERRLOG"; then
      echo "{\"what\":\"textskewgen $SF\",\"status\":\"failed\",\"reason\":\"$(tail -c 200 "$ERRLOG" | tr -d '"\\' | tr -s '[:cntrl:]' ' ')\"}" >> "$OUT"
      continue
    fi
  fi
  for Q in dedup_minhash_lsh dedup_ngram_jaccard; do
    cell_single "$TS" "$Q" 96g ",\"layout\":\"skewtext30-ident1pm\"$PAIRLIST"
  done
done
fi # textskew

if [ "$PART" = "minhash" ]; then
# admission-regime crossover: same query, forced broadcast vs forced
# shuffle fallback. sf10p wave = 50k docs, sf100p wave = 500k docs.
for SF in sf10p sf100p; do
  export SPARK_GRAFT_MINHASH_WAVE_CAP=100000000
  cell_single "$(pwd)/scaledata/$SF" "dedup_minhash_incremental" 96g ",\"regime\":\"broadcast (forced, cap=1e8)\""
  export SPARK_GRAFT_MINHASH_WAVE_CAP=0
  cell_single "$(pwd)/scaledata/$SF" "dedup_minhash_incremental" 96g ",\"regime\":\"shuffle-fallback (forced, cap=0)\""
  unset SPARK_GRAFT_MINHASH_WAVE_CAP
done
# sf1000p: 5M-doc wave -> the production default picks the fallback
# (force-broadcast is the r14 in-artifact driver abort). StageProbe for
# stage-level attribution; stages land in the artifact verbatim.
SP=/tmp/r15_stageprobe_mh.log
if SPARK_GRAFT_CPUS=32 timeout "$CELL_TIMEOUT" java -cp "$CP" $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx96g \
    graft.StageProbe "$(pwd)/scaledata/sf1000p" dedup_minhash_incremental nosort \
    >"$SP" 2>"$ERRLOG"; then
  grep '^{' "$SP" | while read -r line; do
    echo "{\"sf\":\"sf1000p\",\"q\":\"dedup_minhash_incremental\",\"protocol\":\"stageprobe-cold-jvm\",\"regime\":\"shuffle-fallback (default cap, 5M-doc wave)\",\"stage\":$line}" >> "$OUT"
  done
  echo "done sf1000p stageprobe" >&2
else
  fail_row "sf1000p" "dedup_minhash_incremental" "stageprobe-cold-jvm" "$?" ""
fi
fi # minhash

if [ "$PART" = "sess1000" ]; then
# disk prep: drop the regenerable sf100p lineitem/orders (18 GB; regen:
# tools/regen_scaledata.sh recipe, ScaleGen sf10p->sf100p x10/512
# lineitem,orders), then replicate events x10. Peak need: 21 GB events
# + ~37 GB shuffle during the session cell.
rm -rf "$(pwd)/scaledata/sf100p/lineitem.parquet" "$(pwd)/scaledata/sf100p/orders.parquet"
if [ ! -d "$(pwd)/scaledata/sf1000p/events.parquet" ]; then
  if ! java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.ScaleGen \
      "$(pwd)/scaledata/sf100p" "$(pwd)/scaledata/sf1000p" 10 2048 events \
      >/tmp/r15_eventsgen.log 2>"$ERRLOG"; then
    echo "{\"what\":\"eventsgen sf1000p\",\"status\":\"failed\",\"reason\":\"$(tail -c 200 "$ERRLOG" | tr -d '"\\' | tr -s '[:cntrl:]' ' ')\"}" >> "$OUT"
    exit 1
  fi
fi
FIFTH=",\"note\":\"fifth decade (r14 verdict #3): events replicated x10 from sf100p (same key cardinality scaling as the lower decades), sorted-run Complete plan, uniform layout\""
cell_single "$(pwd)/scaledata/sf1000p" "grouping_by_session" 96g "$FIFTH"
cell_single "$(pwd)/scaledata/sf1000p" "suppress" 96g "$FIFTH"
fi # sess1000

if [ "$PART" = "skewsess2" ]; then
# follow-ups to the first skewsess batch (rows above):
#  - zero-hot fast path shipped after the uniform rows measured 2x
#    overhead (4 branch re-executions with no hot keys) -> re-measure
#    uniform-with-split; supersedes those rows;
#  - grouping_by_session_fixedwidth (bench-only twin, count+sum, no
#    list): on skew50 the hot key is ONE session, so the list query's
#    single giant sorted types column is an output-contract floor —
#    the fixed-width twin shows the plan win in isolation (split vs
#    unsplit on the same layout);
#  - suppress budget-tuning row: skew50's suppress keys are
#    (user, event_type) — the hot user splits over ~7 subkeys of
#    ~700k rows, MILD skew where a 200k budget forces pointless
#    splits (11.8 s vs 5.9 unsplit). Budget 1M leaves them unsplit.
SUP2=",\"supersedes\":\"scale_matrix_r15.jsonl uniform skew_split_enabled rows\",\"supersedes_reason\":\"zero-hot fast path added: one bounded detection probe then the exact unsplit plan (the first rows measured 4 branch re-executions on data with no hot keys)\",\"plan\":\"skew_split+zero_hot_fastpath\",\"split_budget\":$SPLIT_BUDGET"
export SPARK_GRAFT_SESSION_SPLIT=$SPLIT_BUDGET
for Q in grouping_by_session grouping_by_context_funcs suppress; do
  cell_single "$(pwd)/scaledata/sf10p" "$Q" 96g ",\"layout\":\"uniform\"$SUP2"
done
for SF in sf10p_skew50 sf100p_skew50; do
  cell_single "$(pwd)/scaledata/$SF" "grouping_by_session_fixedwidth" 96g ",\"layout\":\"skew50-one-key\",\"plan\":\"skew_split\",\"split_budget\":$SPLIT_BUDGET"
done
unset SPARK_GRAFT_SESSION_SPLIT
for SF in sf10p_skew50 sf100p_skew50; do
  cell_single "$(pwd)/scaledata/$SF" "grouping_by_session_fixedwidth" 96g ",\"layout\":\"skew50-one-key\",\"plan\":\"sorted_run_agg-unsplit-baseline\""
done
export SPARK_GRAFT_SESSION_SPLIT=1000000
cell_single "$(pwd)/scaledata/sf10p_skew50" "suppress" 96g ",\"layout\":\"skew50-one-key\",\"plan\":\"skew_split\",\"split_budget\":1000000,\"note\":\"budget tuning: 1M leaves the ~700k-row (user,event_type) subkeys unsplit - the mild-skew case where splitting does not pay\""
unset SPARK_GRAFT_SESSION_SPLIT
fi # skewsess2
