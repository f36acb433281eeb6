#!/bin/bash
# Round-5 opening session: the ranked device-side perf queue left by
# round 4 (PERF.md "Round 4" — the dispatch path is fixed at the root;
# the wall is device-bound at ~77 ms/pair geometry).  Serialized, idle
# host, one phase per invocation:  bash scripts/session_r5a.sh <phase>
#
#   mtiles   ab_m_tiles.py sweep incl. per-level (12,10,8,8) — BOTH the
#            pairs/s and the per-level neighbor recall vs exact (the m12
#            default keeps L0 recall 0.962; any trim must re-prove >=0.95)
#   fwd      trace_top_ops.py forward fused — refresh the r3 breakdown
#            at HEAD (bench-loop tracing hangs on this runtime; single
#            call traces still work)
#   pyr      trace_top_ops.py pyramid — post-search_kernel breakdown
#   recall9  bench at approx recall_target 0.9 (needs a code knob in
#            ops/neighbors._smallest_k first — only worth wiring if the
#            fwd/pyr traces show approx_min_k dominating)
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r5a"
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
    tail -3 "$out/$name.log" | tee -a "$out/session.log"
  fi
}

case "${1:?phase}" in
  mtiles) run ab_mtiles 5400 python scripts/ab_m_tiles.py ;;
  fwd)    run trace_fwd 2400 python scripts/trace_top_ops.py forward fused ;;
  pyr)    run trace_pyr 2400 python scripts/trace_top_ops.py pyramid fused ;;
  *) echo "unknown phase $1"; exit 2 ;;
esac
