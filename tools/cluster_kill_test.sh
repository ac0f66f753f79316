#!/usr/bin/env bash
# Executor-loss recovery proof (round 11, extends the cluster gate): run
# the ITERATIVE tier — the queries whose reliable-checkpoint branch
# (graft.checkpoint.reliable=true) exists precisely for executor loss —
# on local-cluster while a background killer SIGKILLs live executor JVMs
# mid-pass. The standalone Worker relaunches replacements, lost tasks
# retry, reliable checkpoint files survive the dead JVM, and every result
# must still hash-match the DuckDB oracle. A localCheckpoint-based loop
# would be unrecoverable here (blocks die with the executor) — this is
# the one-command falsification of that claim.
#
# Usage: tools/cluster_kill_test.sh [sfDir] [outDir]
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_cluster_kill}"
QUERIES="q100_dedup_components,q143_hierarchy_flatten,q148_subtree_rollup,q157_pagerank,q159_bfs_hops,q185_shortest_path,q202_kcore_peel"

JAR="$PWD/target/scala-2.13/graft-app.jar"
jar cf "$JAR" -C target/scala-2.13/classes .
CKPT=$(mktemp -d /tmp/graft-ckpt-XXXXXX)
TC=$(mktemp -d /tmp/graft-tc-XXXXXX)

# killer: SIGKILL one of THIS TEST'S executor JVMs every 15 s, three
# times, starting after the session is up — each kill lands inside the
# iterative tier's runtime window on this fixture. Scoped to executors
# whose parent is OUR driver (local-cluster workers run in the driver
# JVM, so executors are its direct children) — a bare pgrep on
# CoarseGrainedExecutorBackend would kill executors of any concurrent
# Spark job on the box (review r11).
# the killer subshell records each landed kill in a count file: a run
# where ZERO kills landed (pgrep pattern drift, timing, all kills falling
# between queries) would otherwise certify "survives executor loss" while
# never having killed anything (ADVICE r11) — such a run FAILS below.
KILLCOUNT=$(mktemp /tmp/graft-killcount-XXXXXX)
echo 0 > "$KILLCOUNT"
(
  for i in 1 2 3; do
    sleep 15
    DRIVER=$(pgrep -f "graft.Verify $SF $OUT" | head -1 || true)
    PID=""
    if [ -n "$DRIVER" ]; then
      PID=$(pgrep -P "$DRIVER" -f CoarseGrainedExecutorBackend | head -1 || true)
    fi
    if [ -n "$PID" ] && kill -9 "$PID" 2>/dev/null; then
      echo "[kill-test] SIGKILL executor pid $PID (kill #$i)" >&2
      echo $(( $(cat "$KILLCOUNT") + 1 )) > "$KILLCOUNT"
    else
      echo "[kill-test] no executor of this test alive at kill #$i" >&2
    fi
  done
) &
KILLER=$!

SPARK_HOME=/opt/spark \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,8,4096]}" \
SPARK_GRAFT_JARS="$JAR" \
SPARK_GRAFT_EXEC_MEM="${SPARK_GRAFT_EXEC_MEM:-3g}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
SPARK_GRAFT_CHECKPOINT_DIR="$CKPT" \
SPARK_GRAFT_TEXTCACHE_DIR="$TC" \
SPARK_GRAFT_ONLY="$QUERIES" \
  tools/bench_java.sh graft.Verify "$SF" "$OUT"
RC=$?
kill "$KILLER" 2>/dev/null || true
wait "$KILLER" 2>/dev/null || true
KILLS=$(cat "$KILLCOUNT" 2>/dev/null || echo 0)
rm -rf "$CKPT" "$TC" "$KILLCOUNT"
[ "$RC" -eq 0 ] || { echo "[kill-test] Verify exited $RC" >&2; exit "$RC"; }
if ! [[ "$KILLS" =~ ^[0-9]+$ ]] || [ "$KILLS" -eq 0 ]; then
  echo "[kill-test] FAIL: zero executor kills landed — this run proves" \
    "nothing about recovery (pattern drift or timing); rerun" >&2
  exit 1
fi
echo "[kill-test] $KILLS executor kill(s) landed"
python3 tools/compare.py "$SF" "$OUT"
