#!/usr/bin/env bash
# Positive re-pin workflow (VERDICT r10 item 2): poll the scan-free
# calibration probe (graft.Bench SPARK_GRAFT_CALIB_ONLY=1, ~5 s per poll)
# until the host is MEASURED in the fast band, then immediately launch the
# full bench. The ledger routing (Bench.ledgerFor rule 4) independently
# re-checks the run's own before/after probes, so a phase flip mid-run
# still diverts — this script just avoids spending a 10-minute pass on a
# host that is measurably slow before it starts.
#
# Usage: tools/pin_ledger.sh [sfDir] [bandMs] [maxAttempts]
#   bandMs default: the pinned ledger's own calib_ms (the WORSE of the
#   pair — the pin's quiet-state upper bound, matching
#   Bench.parsePinnedCalib); 1000 when no calibrated pin exists yet (the
#   measured quiet-host band is 925-965 ms at 32 cores).
# Env: SPARK_DRIVER_MEM / SPARK_GRAFT_JAVA_OPTS pass through (sf1 pins
#   need 32g: SPARK_DRIVER_MEM=32g SPARK_GRAFT_JAVA_OPTS=-Xms32g).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
BAND="${2:-}"
ATTEMPTS="${3:-20}"
if [ -z "$BAND" ]; then
  BAND=$(python3 -c "
import re
try: s = open('BENCH_LOCAL.json').read()
except FileNotFoundError: s = ''
m = re.search(r'\"calib_ms\":\[(\d+),(\d+)\]', s)
print(max(int(m.group(1)), int(m.group(2))) if m else 1000)")
fi
# second dimension: the memory/shuffle-bandwidth probe (BASELINE §4.0e —
# the dimension that actually moved while the CPU probe stayed flat);
# unknown band (legacy pin) -> very permissive until a calibrated pin exists
MEMBAND=$(python3 -c "
import re
try: s = open('BENCH_LOCAL.json').read()
except FileNotFoundError: s = ''
m = re.search(r'\"calib_mem_ms\":\[(\d+),(\d+)\]', s)
print(max(int(m.group(1)), int(m.group(2))) if m else 10**9)")
CUT=$(python3 -c "print(int($BAND * 1.15))")
MEMCUT=$(python3 -c "print(int($MEMBAND * 1.15))")
echo "[pin] fast band: cpu probe <= $CUT ms, mem probe <= $MEMCUT ms"
for i in $(seq 1 "$ATTEMPTS"); do
  # `|| true`: under set -e -o pipefail a crashed bench_java (OOM,
  # transient classpath) would otherwise abort the WHOLE poll loop at
  # this assignment — before the garbled-line validation below ever
  # runs (round-12 review); an empty/garbled LINE falls through to the
  # retry path either way
  LINE=$(SPARK_GRAFT_CALIB_ONLY=1 SPARK_GRAFT_CPUS=32 \
      tools/bench_java.sh graft.Bench 2>/dev/null | tail -1 || true)
  C=$(echo "$LINE" | sed -E 's/.*"value":([0-9]+).*/\1/')
  M=$(echo "$LINE" | sed -E 's/.*"mem_ms":([0-9]+).*/\1/')
  # a missing/garbled probe line (bench_java crash, partial output) leaves
  # C/M as the whole unmatched line; under set -e the numeric test below
  # would then abort the entire poll loop — validate and retry instead
  # (ADVICE r11)
  if ! [[ "$C" =~ ^[0-9]+$ && "$M" =~ ^[0-9]+$ ]]; then
    echo "[pin] attempt $i/$ATTEMPTS: probe line missing/garbled" \
      "(${LINE:0:80}) — retrying" >&2
    sleep 60
    continue
  fi
  echo "[pin] attempt $i/$ATTEMPTS: cpu $C ms, mem $M ms"
  if [ "$C" -le "$CUT" ] && [ "$M" -le "$MEMCUT" ]; then
    echo "[pin] in band — launching full bench at $SF"
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
      tools/bench_java.sh graft.Bench
    exit 0
  fi
  sleep 60
done
echo "[pin] no fast phase measured in $ATTEMPTS attempts — try later" >&2
exit 1
