#!/bin/bash
# One-command rebuild + sweep of the duplicate-heavy replica corpus
# (SCALING.md "5x beyond the driver's bench SF"). Builds the N-times
# shifted-key replica under /tmp if absent, then times the text/vector
# pack on it and prints the markdown table to paste into SCALING.md.
#
#   tools/replica_sweep.sh                 # 5x sf0.1, default query set
#   GRAFT_REPLICAS=20 tools/replica_sweep.sh
#
# The pairwise verifiers on an all-duplicates corpus genuinely emit
# quadratic output; give the driver heap (spark-shell picks up
# SPARK_DRIVER_MEMORY, default 16g here).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile
SPARK_DRIVER_MEMORY="${SPARK_DRIVER_MEMORY:-16g}" \
  spark-shell --driver-memory "${SPARK_DRIVER_MEMORY:-16g}" \
  -cp target/scala-2.13/classes -i tools/replica_sweep.scala < /dev/null
