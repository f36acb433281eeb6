#!/bin/bash
# Round-4 session F: the honest bench sweep (run AFTER session E2, chip
# free, host idle).  One phase per invocation so decisions can be made
# between measurements:
#   bash scripts/session_r4f.sh <phase>
# Phases:
#   g1        geometry N=1 (packed args)          — baseline + warms compile
#   g1trace   geometry N=1 with trace (4 iters)   — device-vs-wall breakdown
#   g1leaf    geometry N=1 PACKARGS=0             — quantifies arg packing
#   g4        geometry N=4
#   g8        geometry N=8
#   i1        images N=1
#   i1trace   images N=1 with trace (4 iters)
#   i2        images N=2
#   default   plain `python bench.py`             — exactly the driver's run
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4f"
mkdir -p "$out"
log() { echo "$*" | tee -a "$out/session.log"; }

run() {
  name=$1; shift
  to=$1; shift
  log "=== $name: $* ($(date +%H:%M:%S))"
  timeout "$to" "$@" > "$out/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    log "FAILED rc=$rc ($name)"
  else
    tail -2 "$out/$name.log" | tee -a "$out/session.log"
  fi
}

case "${1:?phase}" in
  g1)      PCRCG_BENCH_LAXMAP=1 run bench_geom_lax1 2400 python bench.py ;;
  g1trace) PCRCG_BENCH_LAXMAP=1 PCRCG_BENCH_ITERS=4 PCRCG_BENCH_TRACE=/tmp/tr_g1 \
             run bench_geom_lax1_trace 1200 python bench.py ;;
  g1leaf)  PCRCG_BENCH_LAXMAP=1 PCRCG_BENCH_PACKARGS=0 run bench_geom_lax1_leaf 2400 python bench.py ;;
  g4)      PCRCG_BENCH_LAXMAP=4 run bench_geom_lax4 2400 python bench.py ;;
  g8)      PCRCG_BENCH_LAXMAP=8 run bench_geom_lax8 3000 python bench.py ;;
  i1)      PCRCG_BENCH_IMAGES=1 PCRCG_BENCH_LAXMAP=1 run bench_images_lax1 3000 python bench.py ;;
  i1trace) PCRCG_BENCH_IMAGES=1 PCRCG_BENCH_LAXMAP=1 PCRCG_BENCH_ITERS=4 \
             PCRCG_BENCH_TRACE=/tmp/tr_i1 run bench_images_lax1_trace 1500 python bench.py ;;
  i2)      PCRCG_BENCH_IMAGES=1 PCRCG_BENCH_LAXMAP=2 run bench_images_lax2 3000 python bench.py ;;
  default) run bench_default 2400 python bench.py ;;
  *) echo "unknown phase $1"; exit 2 ;;
esac
