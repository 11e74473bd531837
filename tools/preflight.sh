#!/usr/bin/env bash
# Land-with-suite gate. Run before ANY commit that touches src/.
#
#   tools/preflight.sh [query1,query2,...]
#
# 1. sbt test must be green (the whole suite — r3/r5/r6 each landed an
#    analysis-broken query precisely because this step was skipped).
# 2. If query names are given (comma-separated), Verify dumps exactly those
#    at sf0.01 and must exit 0 — catching analysis/runtime errors that a
#    unit test without an EntrySpec smoke entry would miss.
#
# Exit 0 = safe to commit. Nonzero = do NOT commit; fix first.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt test ..."
if ! sbt -batch test > /tmp/preflight_test.log 2>&1; then
  tail -40 /tmp/preflight_test.log
  echo "[preflight] FAIL: sbt test red (full log: /tmp/preflight_test.log)"
  exit 1
fi
grep -E "Tests: succeeded|All tests passed" /tmp/preflight_test.log | tail -2

if [[ $# -ge 1 && -n "${1:-}" ]]; then
  out="$(mktemp -d /tmp/preflight_verify.XXXX)"
  echo "[preflight] Verify on: $1 -> $out"
  if ! SPARK_GRAFT_ONLY="$1" sbt -batch \
      "runMain graft.Verify /root/testdata/sf0.01 $out" \
      > /tmp/preflight_verify.log 2>&1; then
    tail -40 /tmp/preflight_verify.log
    echo "[preflight] FAIL: Verify red (full log: /tmp/preflight_verify.log)"
    exit 1
  fi
  if compgen -G "$out/*/QUERY_FAILED.txt" > /dev/null; then
    cat "$out"/*/QUERY_FAILED.txt
    echo "[preflight] FAIL: query failure markers present"
    exit 1
  fi
fi
echo "[preflight] OK"
