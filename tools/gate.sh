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
ENGINE_TOUCHED=0
if { git status --porcelain; git diff --name-only HEAD~1 2>/dev/null; } \
    | grep -qE 'src/main/scala/graft/(operators|queries|api|sources|functions|core)/'; then
  ENGINE_TOUCHED=1
  echo "[gate] engine code touched -> running plan-guard suites"
  sbt -batch 'testOnly graft.PlanSpec graft.WindowGuardSpec graft.ScaleSpec' 2>&1 \
    | grep -E 'Tests:|\*\*\*' | tail -2
fi
OUT=$(mktemp -d /tmp/gate.XXXXXX)
tools/run.sh graft.Verify "$SF" "$OUT" 2>&1 | grep -v '^2[0-9]' || true
python3 tools/check.py "$SF" "$OUT"
rc=$?
rm -rf "$OUT"
[ $rc -ne 0 ] && exit $rc
# Bench-regression gate: full min-of-2 bench at sf0.1, each query compared
# against BENCH_BASELINE.json with >2x fail (calibration-normalized — see
# tools/benchgate.py). ON BY DEFAULT when engine code is touched (drift was
# proven to be host noise in BENCH_DRIFT.md, so the harness is trustworthy);
# adds ~4 min. Force with GATE_BENCH=1, skip with GATE_BENCH=0 (doc-only or
# emergency commits).
if [ "${GATE_BENCH:-$ENGINE_TOUCHED}" = "1" ]; then
  echo "[gate] bench regression check vs BENCH_BASELINE.json"
  BJ=$(mktemp /tmp/gate-bench.XXXXXX.json)
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    tools/run.sh graft.Bench > "$BJ" 2>/dev/null
  python3 tools/benchgate.py "$BJ"
  rc=$?
  rm -f "$BJ"
  # archive the durable per-query record alongside the gate run so the
  # round artifact survives even if the driver's stdout scrape truncates
  [ -f target/bench_latest.json ] && cp target/bench_latest.json BENCH_LATEST.json
fi
exit $rc
