#!/bin/bash
# Round-3 continuation session B (watcher): when the long-schedule
# GEOMETRY evidence run finishes, stop session_r4a before its images
# stage (the SO(3) pair already carries the color-helps comparison, and
# the 7000-step images run cannot finish before round cutoff) and spend
# the remaining chip time on driver-visible work:
#   1. validate + cache-warm the fixed bench.py (stacked per-lane lax.map
#      inputs — new executable, fresh remote compile),
#   2. the images bench at the 2-pairs-per-dispatch default (its round-3
#      attempt died at cutoff mid-compile).
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4b"
mkdir -p "$out"
echo $$ > /tmp/r4b.pid
log() { echo "$*" | tee -a "$out/session.log"; }

geom=perf_runs/accuracy_evidence_45h_geom_long.jsonl
while ! grep -q '"event": "final"' "$geom" 2>/dev/null; do
  sleep 30
done
log "geometry evidence final reached ($(date +%H:%M:%S)); stopping r4a"
# Stop the r4a driver script plus any python child it has spawned —
# explicit PIDs only (walk the child tree from the recorded pid).
if [ -f /tmp/r4a.pid ]; then
  rpid=$(cat /tmp/r4a.pid)
  for child in $(ps -o pid= --ppid "$rpid" 2>/dev/null); do
    for gchild in $(ps -o pid= --ppid "$child" 2>/dev/null); do
      kill "$gchild" 2>/dev/null
    done
    kill "$child" 2>/dev/null
  done
  kill "$rpid" 2>/dev/null
fi
sleep 35  # let the device free (exit-144 guard)

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
run bench_geom_stacked 900 python bench.py
run bench_images_n2 1500 env PCRCG_BENCH_IMAGES=1 python bench.py
log "session done ($(date +%H:%M:%S))"
