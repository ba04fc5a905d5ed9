#!/usr/bin/env bash
# Full oracle gate under local-cluster — executors in SEPARATE JVMs.
#
# local[*] shares one JVM between driver and executors, which masks an
# entire bug class: Task-not-serializable closures, executor-classpath
# gaps, and driver-state capture (the round-5 json_size UDF bug was
# exactly this — green under local[*], broken the moment a real
# executor boundary appeared). This script runs the same
# Verify + DuckDB selfcheck gate with 2 worker JVMs so that class is
# structurally uncatchable-by-accident.
#
# Usage: scripts/verify_localcluster.sh [sfDir] [outDir] [queryFilter]
#   sfDir       default /root/testdata/sf0.01
#   outDir      default /tmp/verify_lc
#   queryFilter optional comma-separated query names (default: all)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_lc}
FILTER=${3:-}
# SPARK_SCALA_VERSION: the executor launcher resolves the classpath
# via the scala version and falls back to scanning source-build dirs
# (absent in a binary layout) when unset.
SPARK_HOME=${SPARK_HOME:-/opt/spark} \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="local-cluster[2,2,2048]" \
SPARK_GRAFT_CPUS=4 \
  sbt -batch "runMain graft.Verify $SF $OUT $FILTER"
python3 scripts/selfcheck.py "$SF" "$OUT"
