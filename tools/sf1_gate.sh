#!/usr/bin/env bash
# sf1 cross-engine correctness gate: run every declared query except
# q81_sim_jaccard (see BASELINE.md §4.0c irreducibility note: its
# ground-truth OUTPUT is itself quadratic — ~76M pairs at sf1) through
# graft.Verify at sf1 and hash-compare against the DuckDB oracle.
#
# Usage: tools/sf1_gate.sh [sf1Dir] [outDir]
# Prereq: tools/sf1_fixture.sh (generates + fingerprint-checks the
# fixture); sbt -batch compile (this runs target/ classes via
# tools/bench_java.sh, no sbt lock).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1="${1:-/tmp/testdata-sf1}"
OUT="${2:-/tmp/verify_sf1}"
KEYS=$(python3 - <<'EOF'
import re
src = open('src/main/scala/graft/SparkEntry.scala').read()
keys = re.findall(r'"(q\d+_[a-z0-9_]+)" ->', src)
keys = sorted(set(keys) - {"q81_sim_jaccard"})
print(",".join(keys))
EOF
)
N=$(echo "$KEYS" | tr ',' '\n' | wc -l)
echo "[sf1-gate] running $N keys (all but q81_sim_jaccard) at $SF1"
SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  tools/bench_java.sh graft.Verify "$SF1" "$OUT"
python3 tools/compare.py "$SF1" "$OUT"
