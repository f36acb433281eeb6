#!/bin/bash
# Round-3 session B, phase 1 (timing-sensitive, run with an otherwise
# idle host): same-session A/Bs for the feat_limbs=1 kernel variant and
# the images path, plus op traces to aim the remaining throughput work.
# bench_geom (the limbs=2 side of the A/B) already ran at session start.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3b"
mkdir -p "$out"
run() {
  name=$1; shift
  to=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$out/session.log"
  timeout "$to" "$@" > "$out/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAILED rc=$rc ($name)" | tee -a "$out/session.log"
  else
    tail -2 "$out/$name.log" | tee -a "$out/session.log"
  fi
  sleep 30
}
run bench_geom_limbs1 1800 env PCRCG_BENCH_FEAT_LIMBS=1 python bench.py
run ab_feat_limbs 2400 python scripts/ab_feat_limbs.py
run bench_images 2400 env PCRCG_BENCH_IMAGES=1 python bench.py
run trace_images 1800 python scripts/trace_top_ops.py images
run trace_forward_limbs1 1800 env PCRCG_BENCH_FEAT_LIMBS=1 python scripts/trace_top_ops.py forward
run trace_pyramid 1200 python scripts/trace_top_ops.py pyramid
echo "phase1 done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
