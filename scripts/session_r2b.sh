#!/bin/bash
# Round-2 continuation session: query_chunk e2e A/B + images path.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r2b"
mkdir -p "$out"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$out/session.log"
  timeout 2400 "$@" > "$out/$name.log" 2>&1
  echo "rc=$?" | tee -a "$out/session.log"
  tail -2 "$out/$name.log" | tee -a "$out/session.log"
  sleep 30
}
run bench_geom_base python bench.py
run bench_geom_qc2048 env PCRCG_BENCH_QCHUNK=2048 python bench.py
run bench_geom_qc2048_b env PCRCG_BENCH_QCHUNK=2048 python bench.py
run bench_images_qc2048 env PCRCG_BENCH_QCHUNK=2048 PCRCG_BENCH_IMAGES=1 python bench.py
echo "session done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
