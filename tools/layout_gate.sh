#!/usr/bin/env bash
# Layout-invariance sweep (VERDICT r11 item 4): the determinism discipline
# is argued per-query in SURVEY §7.2 ("no result depends on partition
# count, partition order, or AQE's runtime re-plan") — this measures it
# WHOLESALE. Run graft.Verify over the full declared surface under
# adversarial shuffle-partition counts (1, 7, 64 — a serial plan, a prime
# count that never divides anything evenly, and 2x the fixture-era
# default) with AQE DISABLED (so the raw partition count actually bites —
# AQE's coalescing would quietly normalize the layouts), then DuckDB
# hash-compare each run. All 210 hashes must match the oracle under every
# layout; since the oracle is fixed, 3x210 green == the hashes are
# byte-stable across layouts.
#
# Usage: tools/layout_gate.sh [sfDir] [outBase]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUTBASE="${2:-/tmp/verify_layout}"
FAIL=0
for P in 1 7 64; do
  OUT="${OUTBASE}_p${P}"
  echo "[layout-gate] shuffle.partitions=$P aqe=off sf=$SF -> $OUT"
  SPARK_GRAFT_SHUFFLE_PARTITIONS="$P" \
  SPARK_GRAFT_AQE=0 \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
    tools/bench_java.sh graft.Verify "$SF" "$OUT"
  if ! python3 tools/compare.py "$SF" "$OUT"; then
    echo "[layout-gate] FAIL at shuffle.partitions=$P" >&2
    FAIL=1
  fi
done
if [ "$FAIL" -ne 0 ]; then
  echo "[layout-gate] FAILED: at least one layout broke a declared hash" >&2
  exit 1
fi
echo "[layout-gate] PASS: all layouts (1, 7, 64; AQE off) oracle-green"
