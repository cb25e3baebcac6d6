#!/bin/bash
# Local mirror of the driver's verify step: run graft.Verify directly on the
# compiled classes (fast — skips sbt JVM startup). Usage:
#   scripts/run_verify.sh [sfDir] [outDir] [cpus]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
CPUS=${3:-8}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Full-dump runs (no subset names) must start clean: graft.Verify continues
# past per-query failures, and a stale parquet from a prior run would let
# check.py PASS on a query that no longer even plans.
if [ $# -le 3 ]; then rm -rf "$OUT"; fi
SPARK_GRAFT_CPUS=$CPUS exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$SF" "$OUT" "${@:4}"
