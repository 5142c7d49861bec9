#!/bin/bash
# Commit gate: compile (main + test), run the full verify dump at sf0.001,
# and oracle-check it with DuckDB. Every commit must pass this first.
# Usage: tools/gate.sh [sfDir]   (default /root/testdata/sf0.001)
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.001}
sbt -batch 'Test/compile' 2>&1 | tail -5
OUT=$(mktemp -d /tmp/gate.XXXXXX)
tools/run.sh graft.Verify "$SF" "$OUT" 2>&1 | grep -v '^2[0-9]' || true
python3 tools/check.py "$SF" "$OUT"
rc=$?
rm -rf "$OUT"
exit $rc
