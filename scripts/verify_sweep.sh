#!/usr/bin/env bash
# Full oracle sweep at BOTH gate SFs (r13, VERDICT r12 #7): the sf0.001 leg
# is cheap (~50 s) and caught the only correctness bug of r12
# (q_seasonal_profile's round(4) ulp tie) on its first-ever run — run it
# next to the sf0.01 gate every round, not just when chasing a repro.
#
# usage: scripts/verify_sweep.sh [query1,query2,...]
#   no args  = full 252-key sweep at sf0.001 + sf0.01
#   with arg = subset sweep (fast iteration; the comparator reports every
#              other key as MISSING-SPARK-OUTPUT — read only the keys run)
set -euo pipefail
cd "$(dirname "$0")/.."
SUBSET="${1:-}"
for SF in sf0.001 sf0.01; do
  OUT="/tmp/verify_sweep_$SF"
  echo "== $SF =="
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
    sbt -batch "runMain graft.Verify /root/testdata/$SF $OUT $SUBSET" \
    2>&1 | grep -E '\[verify\] .* (ok|FAIL)' | tail -3
  python3 scripts/check_correctness.py "$OUT" "/root/testdata/$SF" \
    | { if [ -n "$SUBSET" ]; then grep -v MISSING-SPARK-OUTPUT; else cat; fi; } \
    | tail -5
done
