#!/bin/bash
# Standing sf0.1 strict correctness gate (round-10 VERDICT item 2).
#
# The official driver gate runs at sf0.01; round 10's one-off sf0.1 run
# caught two REAL scale-only bugs (q154 decimal-quotient rounding, q159
# oracle bit-63 shift) that sf0.01 could never surface. This script makes
# that run a standing per-round artifact instead of an ad-hoc heroic:
# full Verify at sf0.1, the driver-strict DuckDB compare, and a committed
# CORRECTNESS_sf01_r<N>.json with per-query status + corpus fingerprint.
#
# Usage: tools/strict_gate.sh <roundN> [sfDir]
#   tools/strict_gate.sh 11                       → CORRECTNESS_sf01_r11.json
#   tools/strict_gate.sh 11 /root/testdata/sf0.001 → CORRECTNESS_sf0001_r11.json
#     (the sf0.001 sweep caught q112's contract-margin flake in round 11 —
#      a second scale is where scale-only bugs live; sweep occasionally)
#
# Takes ~20-30 min at sf0.1 on local[32]; run with nothing else on the CPU.
set -e
cd "$(dirname "$0")/.."
N="${1:?usage: tools/strict_gate.sh <roundN> [sfDir]}"
SF="${2:-/root/testdata/sf0.1}"
OUT="/tmp/strict_gate_sf01"
TAG="$(basename "$SF" | tr -d '.')"   # sf0.1 → sf01, sf0.001 → sf0001
ART="CORRECTNESS_${TAG}_r${N}.json"
rm -rf "$OUT"
echo "strict gate: Verify at $SF → $OUT"
sbt -batch "runMain graft.Verify $SF $OUT" > /tmp/strict_gate_verify.log 2>&1 \
  || { tail -30 /tmp/strict_gate_verify.log; exit 1; }
grep -E '\[verify\] .* failed:' /tmp/strict_gate_verify.log && exit 1
python3 tools/check.py "$SF" "$OUT" "$ART"
echo "strict gate OK → $ART"
# Round-13 VERDICT item 1a: the full per-query bench artifact (min +
# median + shuffle bytes per query) must be committed EVERY round —
# target/bench_r<N>_full.json is what makes a contaminated driver run
# provable after the fact. This gate makes forgetting it loud. Produce it
# with:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
#   SPARK_GRAFT_BENCH_OUT=target/bench_r<N>_full.json \
#   sbt -batch "runMain graft.Bench"   (3 runs; ~10 min)
# Override with SKIP_BENCH_ARTIFACT=1 only for mid-round partial gates.
BENCH_ART="target/bench_r${N}_full.json"
if [ -z "$SKIP_BENCH_ARTIFACT" ] && [ ! -f "$BENCH_ART" ]; then
  echo "strict gate FAIL: $BENCH_ART missing — run the full local bench and commit it (see comment above)" >&2
  exit 1
fi
if [ -f "$BENCH_ART" ] && ! git ls-files --error-unmatch "$BENCH_ART" >/dev/null 2>&1; then
  echo "strict gate WARNING: $BENCH_ART exists but is not tracked — git add it" >&2
fi
