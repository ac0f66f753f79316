#!/usr/bin/env bash
# Distributed-reality correctness gate (VERDICT r10 item 1): run the FULL
# declared surface through graft.Verify on a local-cluster master — real
# executor JVMs, real closure serialization, real broadcast + shuffle
# transport over netty, executor-fetched application jars, and the
# RELIABLE Checkpoints branch (graft.checkpoint.reliable=true with a
# checkpoint dir, so the iterative tier q100/q143/q148/q157/q159/q185/q202
# exercises checkpoint-to-files + release-deletes-files) — then
# hash-compare every query against the DuckDB oracle. Ten rounds of
# local[32] never executed any of that; this is the cheapest falsification
# of the "plans you'd want on a real cluster" claim available on one box.
#
# Usage: tools/cluster_gate.sh [sfDir] [outDir]
# Prereq: sbt -batch compile (runs target/ classes; no sbt lock held).
# Env: SPARK_GRAFT_MASTER to override the default local-cluster[2,8,4096]
#      (2 executor JVMs x 8 cores x 4 GiB).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_cluster}"
MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]}"

# Executors share nothing with the driver's -cp: package the compiled
# classes as an app jar they fetch via spark.jars.
JAR="$PWD/target/scala-2.13/graft-app.jar"
jar cf "$JAR" -C target/scala-2.13/classes .

CKPT=$(mktemp -d /tmp/graft-ckpt-XXXXXX)
TC=$(mktemp -d /tmp/graft-tc-XXXXXX)
trap 'rm -rf "$CKPT" "$TC"' EXIT

echo "[cluster-gate] master=$MASTER sf=$SF checkpointDir=$CKPT"
SPARK_HOME=/opt/spark \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="$MASTER" \
SPARK_GRAFT_JARS="$JAR" \
SPARK_GRAFT_EXEC_MEM="${SPARK_GRAFT_EXEC_MEM:-3g}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
SPARK_GRAFT_CHECKPOINT_DIR="$CKPT" \
SPARK_GRAFT_TEXTCACHE_DIR="$TC" \
  tools/bench_java.sh graft.Verify "$SF" "$OUT"
python3 tools/compare.py "$SF" "$OUT"
