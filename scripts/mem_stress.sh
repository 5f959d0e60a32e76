#!/usr/bin/env bash
# Memory-stress proof of the SeriesFold O(1)-state contract (VERDICT r10 #1):
# the "year of 1 Hz" single series actually run under a small heap.
#
#   1. gen    — 20M-sample single series (+4 decoys) at /tmp/memstress,
#               written with the normal 48g heap;
#   2. fold   — CUSUM + MACD + EWMA via SeriesFold under -Xmx1g: COMPLETES
#               (the in-partition sort spills, the fold carries one struct);
#   3. legacy — the r9 collect_list+aggregate HOF CUSUM spelling under the
#               same -Xmx1g: OOMs (the whole series materializes in one
#               aggregation buffer) — the negative control.
#
# Results recorded in PERF.md (r11). Reruns are idempotent.
set -uo pipefail
cd "$(dirname "$0")/.."

DIR=${1:-/tmp/memstress}

if [ ! -d "$DIR/events.parquet" ]; then
  sbt -batch "runMain graft.tools.MemStress gen $DIR" | grep MEMSTRESS
fi

echo "== fold under -Xmx1g (expected: RESULT=OK) =="
SPARK_DRIVER_MEM=1g sbt -batch "runMain graft.tools.MemStress fold $DIR" 2>&1 \
  | grep -E "MEMSTRESS|OutOfMemoryError" || true

echo "== legacy collect_list under -Xmx1g (expected: OutOfMemoryError, no RESULT=OK) =="
SPARK_DRIVER_MEM=1g sbt -batch "runMain graft.tools.MemStress legacy $DIR" 2>&1 \
  | grep -E "MEMSTRESS|OutOfMemoryError" | head -5 || true
