#!/bin/bash
# Round-3 session G (chained after session_r3f): dispatch-batching sweep —
# does LAXMAP=4 keep scaling past the 17.6 pairs/s of N=2?  If yes, the
# bench default moves to 4 (cache stays warm for the driver's round-end
# bench.py).  Keep the host idle during measurement windows.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3g"
mkdir -p "$out"
log() { echo "$*" | tee -a "$out/session.log"; }

while ! grep -q "session done" perf_runs/session_r3f/session.log 2>/dev/null; do
  sleep 60
done
log "r3f complete, starting LAXMAP sweep ($(date +%H:%M:%S))"

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
run bench_geom_lax4 2400 env PCRCG_BENCH_LAXMAP=4 python bench.py
log "session done ($(date +%H:%M:%S))"
