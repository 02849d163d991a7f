#!/usr/bin/env bash
# Production launch (north rule: "launched via spark-submit on
# multi-executor clusters"). In this sandbox there is no cluster manager;
# on a real cluster, size with --num-executors N (and re-run with 4N to
# reproduce the scaling-efficiency measurement graft.Bench performs
# locally via local[4]/local[16]).
#
# Usage: scripts/submit.sh <class> [args...]
#   e.g.  scripts/submit.sh graft.Bench
#         scripts/submit.sh graft.Verify /data/turns /out
set -euo pipefail
CLASS="${1:?main class, e.g. graft.Bench}"; shift || true

JAR="target/scala-2.13/documentaispark_2.13-0.1.0.jar"
[ -f "$JAR" ] || sbt -batch package

exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
  --class "$CLASS" \
  --master "${SPARK_MASTER:-local[32]}" \
  --conf spark.sql.shuffle.partitions="${SPARK_SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --conf spark.sql.adaptive.enabled=true \
  "$JAR" "$@"
