#!/bin/bash
# Commit gate: compile (main + test), run the full verify dump at sf0.001,
# and oracle-check it with DuckDB. Every commit must pass this first.
# When engine code (operators/queries/api/sources/functions) is touched,
# also run the plan-guard suites so a plan regression (unbounded window,
# lost broadcast, lost pushdown) can't land silently.
# Usage: tools/gate.sh [sfDir]   (default /root/testdata/sf0.001)
set -e -o pipefail
cd /root/repo
SF=${1:-/root/testdata/sf0.001}
sbt -batch 'Test/compile' 2>&1 | tail -5
if { git status --porcelain; git diff --name-only HEAD~1 2>/dev/null; } \
    | grep -qE 'src/main/scala/graft/(operators|queries|api|sources|functions|core)/'; then
  echo "[gate] engine code touched -> running plan-guard suites"
  sbt -batch 'testOnly graft.PlanSpec graft.WindowGuardSpec graft.ScaleSpec' 2>&1 \
    | grep -E 'Tests:|\*\*\*' | tail -2
fi
OUT=$(mktemp -d /tmp/gate.XXXXXX)
tools/run.sh graft.Verify "$SF" "$OUT" 2>&1 | grep -v '^2[0-9]' || true
python3 tools/check.py "$SF" "$OUT"
rc=$?
rm -rf "$OUT"
exit $rc
