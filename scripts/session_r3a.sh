#!/bin/bash
# Round-3 session A: throughput recon — fresh headline numbers + traces of
# the images path and train step so optimization follows the hot ops.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3a"
mkdir -p "$out"
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$out/session.log"
  timeout 3000 "$@" > "$out/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$out/session.log"
  if [ $rc -ne 0 ]; then
    echo "FAILED rc=$rc ($name)" | tee -a "$out/session.log"
  else
    tail -2 "$out/$name.log" | tee -a "$out/session.log"
  fi
  sleep 30
}
run bench_geom python bench.py
run bench_geom_qc2048 env PCRCG_BENCH_QCHUNK=2048 python bench.py
run bench_images env PCRCG_BENCH_IMAGES=1 python bench.py
run trace_images python scripts/trace_top_ops.py images
run trace_train python scripts/trace_top_ops.py train
echo "session done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
