#!/bin/bash
# Isolated single-query bench runs (VERDICT r3 item 3): java -cp invocation
# so it can run alongside an sbt session without fighting the build lock.
# Usage: bench_one.sh <query-substring> [repeat]
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Bench overwrites BENCH_DETAIL.json (a committed whole-suite artifact);
# preserve it around a filtered run.
cp /root/repo/BENCH_DETAIL.json /tmp/BENCH_DETAIL.json.bak 2>/dev/null || true
trap 'cp /tmp/BENCH_DETAIL.json.bak /root/repo/BENCH_DETAIL.json 2>/dev/null || true' EXIT
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BENCH_REPEAT="${2:-5}" \
java $ADD_OPENS -Xmx24g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench "$1"
