#!/bin/bash
# Regenerate the scaledata decades (gitignored; wiped on VM reset).
# Recipe matches r10-r12: sf1p=x10/32 files, sf10p=x10/128, sf100p=x10/512,
# sf1000p=x10 documents+embeddings only.
set -eu
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic \
    sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$m=ALL-UNNAMED"
done
gen() { java -cp "$CP" $OPENS -Dspark.ui.enabled=false -Xmx64g graft.ScaleGen "$@"; }
[ -d scaledata/sf1p ]    || gen /root/testdata/sf0.1 scaledata/sf1p 10 32
[ -d scaledata/sf10p ]   || gen scaledata/sf1p scaledata/sf10p 10 128
[ -d scaledata/sf100p ]  || gen scaledata/sf10p scaledata/sf100p 10 512
[ -d scaledata/sf1000p ] || gen scaledata/sf100p scaledata/sf1000p 10 1024 documents,embeddings
echo REGEN-DONE
