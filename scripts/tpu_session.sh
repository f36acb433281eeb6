#!/bin/bash
# Serialized TPU measurement session — run when the chip is reachable.
# One JAX process at a time (PERF.md: concurrent clients kill running
# jobs); each step logs to perf_runs/session_<ts>/.
set -u
cd "$(dirname "$0")/.."
ts=$(date +%m%d_%H%M)
out="perf_runs/session_$ts"
mkdir -p "$out"

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$out/session.log"
  timeout 2400 "$@" > "$out/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" | tee -a "$out/session.log"
  tail -3 "$out/$name.log" | tee -a "$out/session.log"
  sleep 30  # let the chip free before the next client
}

run bench_geom python bench.py
run bench_images env PCRCG_BENCH_IMAGES=1 python bench.py
run trace_forward python scripts/trace_top_ops.py forward
run trace_pyramid python scripts/trace_top_ops.py pyramid
run ab_qchunk python scripts/ab_query_chunk.py 1024 2048 4096
echo "session done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
