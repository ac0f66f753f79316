#!/usr/bin/env bash
# Memory-pressure / spill gate (VERDICT r11 item 2): run the FULL declared
# surface through graft.Verify at sf0.1 with executors constrained enough
# that the spillable paths — the two-phase count-histogram aggs
# (ExactPercentile/ScalableRank), sort-merge-join row buffers, window
# buffers, the big hash aggs' sort-based fallback — must actually SPILL
# instead of OOM, then hash-compare every query against the DuckDB oracle.
# The 128 GiB local[32] sandbox never executed any spill branch in eleven
# rounds; this is the falsification of "the 100 TB story rests on
# spill-safe operators".
#
# Two pressure levers, both real memory scarcity (no fake force-spill
# thresholds): 1 GiB workers with a sub-1g executor heap, and a reduced
# spark.memory.fraction so unified execution memory per task is a few MB —
# the regime a 100 TB shuffle partition lives in when sized wrong.
# Verify's SPARK_GRAFT_SPILL_REPORT listener sums task-level
# memory/diskBytesSpilled so the transcript QUOTES the spills.
#
# Usage: tools/spill_gate.sh [sfDir] [outDir]
# Env: SPARK_GRAFT_SPILL_FRACTION (default 0.08) — spark.memory.fraction
#      for the run; raise toward 0.6 to relax the pressure.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-/tmp/verify_spill}"
MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,4,1024]}"
FRACTION="${SPARK_GRAFT_SPILL_FRACTION:-0.08}"

JAR="$PWD/target/scala-2.13/graft-app.jar"
jar cf "$JAR" -C target/scala-2.13/classes .

CKPT=$(mktemp -d /tmp/graft-ckpt-XXXXXX)
TC=$(mktemp -d /tmp/graft-tc-XXXXXX)
trap 'rm -rf "$CKPT" "$TC"' EXIT

echo "[spill-gate] master=$MASTER sf=$SF memory.fraction=$FRACTION"
SPARK_HOME=/opt/spark \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="$MASTER" \
SPARK_GRAFT_JARS="$JAR" \
SPARK_GRAFT_EXEC_MEM="${SPARK_GRAFT_EXEC_MEM:-900m}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
SPARK_GRAFT_CHECKPOINT_DIR="$CKPT" \
SPARK_GRAFT_TEXTCACHE_DIR="$TC" \
SPARK_GRAFT_SPILL_REPORT=1 \
SPARK_GRAFT_JAVA_OPTS="-Dspark.memory.fraction=$FRACTION ${SPARK_GRAFT_JAVA_OPTS:-}" \
  tools/bench_java.sh graft.Verify "$SF" "$OUT"
python3 tools/compare.py "$SF" "$OUT"
