#!/bin/bash
# Pre-commit gate: NEVER commit uncompiled code (round 8 lost its entire
# official gate output to one missing import committed without compiling).
#
# Runs in ~1-2 min: full compile (main + test), the SparkEntry.entry smoke
# at sf0.001, and the CatalogSchemaSpec drift guards (README counts,
# queries/oracle key parity, no array/map/binary output columns).
# sbt -batch propagates a nonzero exit if ANY step fails.
#
# Usage: tools/precommit.sh   (from the repo root, before EVERY commit)
set -e
cd "$(dirname "$0")/.."
sbt -batch "compile; Test/compile; runMain graft.Smoke; runMain graft.tools.DumpOracles /tmp/oracle_sql.json; testOnly graft.ops.CatalogSchemaSpec"
# Round-9 lesson: plan every oracle in DuckDB and fail on HUGEINT/float
# output columns BEFORE they can hash-mismatch at the driver's gate.
python3 tools/lint_oracle_types.py /tmp/oracle_sql.json /root/testdata/sf0.001
echo "precommit OK"
