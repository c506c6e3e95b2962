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
sbt -batch "compile; Test/compile; runMain graft.Smoke; testOnly graft.ops.CatalogSchemaSpec"
echo "precommit OK"
