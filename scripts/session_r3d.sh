#!/bin/bash
# Round-3 session D (timing-sensitive — idle host required): same-session
# A/Bs for the round-3 throughput changes:
#   * kpconv_tiled single-block channels to 160 (images first conv C=129
#     was 2x128-blocked + padded to 256 — 17.7 ms traced)
#   * PCRCG_BENCH_LAXMAP: N pairs per dispatch via lax.map (amortizes the
#     wall-minus-device dispatch gap: ~15 ms geometry, ~42 ms images)
#   * per-level search_m_tiles (coarse levels had recall 0.994/1.0 at 12)
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3d"
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
# Geometry with the new search-distance kernel (fresh compile).
run bench_geom 2400 python bench.py
# Images path: single-block first conv + search kernel (fresh compile).
run bench_images 2400 env PCRCG_BENCH_IMAGES=1 python bench.py
# Dispatch-gap amortization.
run bench_geom_lax2 2400 env PCRCG_BENCH_LAXMAP=2 python bench.py
echo "phase1 done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
