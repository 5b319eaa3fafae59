#!/bin/bash
# Scale-proof matrix (SURVEY §Round-7): isolated median-of-3 timings,
# one JVM per (query, sf), across sf0.01 / sf0.1 / sf1.
#
#   sbt 'runMain graft.ScaleGen /root/testdata/sf0.1 scaledata/sf1 10'
#   tools/scale_bench.sh [out.jsonl] [query ...]
#
# Uses the compiled classes directly (sbt compile first) to skip per-run
# launcher overhead. Sort-attribution for a query: `runMain graft.Probe
# <sfDir> <q1,q2>` times it with and without the oracle's total ORDER BY.
set -u
OUT=${1:-scale_matrix.jsonl}
shift 2>/dev/null || true
QUERIES=${@:-"default_network parse_apache parse_snmptrap parse_xml \
app_parser_topic grouping_by_session dedup_cc dedup_keep_best \
dedup_minhash_lsh dedup_ngram_jaccard dedup_embedding_prod \
dedup_semantic_prod dedup_semantic_keep_prod decontaminate_bloom \
text_dedup_url"}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
: > "$OUT"
for SF in /root/testdata/sf0.01 /root/testdata/sf0.1 "$(pwd)/scaledata/sf1"; do
  [ -d "$SF" ] || { echo "skip $SF (missing)" >&2; continue; }
  for Q in $QUERIES; do
    LINE=$(SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_ONLY=$Q SPARK_GRAFT_REPEAT=5 \
      SPARK_GRAFT_CPUS=32 java -cp "$CP" $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx24g graft.Bench 2>/dev/null | grep '^{')
    echo "{\"sf\":\"$SF\",\"q\":\"$Q\",\"r\":$LINE}" >> "$OUT"
    echo "done $SF $Q" >&2
  done
done
