#!/bin/bash
# Round-3 session F (chained): wait for session_r3d's benches to finish,
# then run the hardened 45-degree evidence session (session_r3e.sh), then
# clean final benches on an idle host (cache-warm for the driver's
# round-end bench.py run).  Serialized — one JAX/TPU process at a time.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3f"
mkdir -p "$out"
log() { echo "$*" | tee -a "$out/session.log"; }

# Wait for r3d (its script logs "phase1 done" at the end).
while ! grep -q "phase1 done" perf_runs/session_r3d/session.log 2>/dev/null; do
  sleep 60
done
log "r3d complete, starting r3e ($(date +%H:%M:%S))"
bash scripts/session_r3e.sh
log "r3e complete ($(date +%H:%M:%S))"

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
  sleep 20
}
# Final clean numbers, idle host, compiles cached from r3d.
run bench_geom_final 2400 python bench.py
run bench_images_final 2400 env PCRCG_BENCH_IMAGES=1 python bench.py
log "session done ($(date +%H:%M:%S))"
