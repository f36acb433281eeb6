#!/bin/bash
# Serialized follow-on chip queue for session 0818b: wait for the images
# bench to finish, then fresh traces + the flagship --images evidence run.
set -u
cd "$(dirname "$0")/.."
out=perf_runs/session_0818b
mkdir -p "$out"

# Wait for the in-flight images bench (writes rc= on exit).
while ! grep -q '^rc=' "$out/bench_images.log" 2>/dev/null; do sleep 15; done
sleep 30

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$out/session.log"
  timeout 3000 "$@" > "$out/$name.log" 2>&1
  echo "rc=$?" | tee -a "$out/session.log"
  tail -3 "$out/$name.log" | tee -a "$out/session.log"
  sleep 30
}

run trace_forward python scripts/trace_top_ops.py forward
run trace_pyramid python scripts/trace_top_ops.py pyramid
run trace_train python scripts/trace_top_ops.py train
run trace_images python scripts/trace_top_ops.py images
echo "queue done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
