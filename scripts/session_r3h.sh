#!/bin/bash
# Round-3 session H (chained after session_r3g): longer-schedule hardened
# 45-degree evidence.  The 3000-step runs (session_r3e) show the schedule
# effect directly: geometry plateaus at recall ~0.81 while color+geometry
# is still CLIMBING at cutoff (0.44 -> 0.50 over the last 250 steps —
# the 129-dim input has ~2 orders more first-layer weights to learn), so
# the fair color-vs-geometry comparison and the 0.9 recall gate both live
# on the long schedule.  Geometry 9000 steps (the gated artifact), color
# 7000 (wall-clock cap: ~0.24 s/step on-chip).  Compiles cached from r3e.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3h"
mkdir -p "$out"
echo $$ > /tmp/r3h.pid
log() { echo "$*" | tee -a "$out/session.log"; }

while ! grep -q "session done" perf_runs/session_r3g/session.log 2>/dev/null; do
  sleep 60
done
log "r3g complete, starting long-schedule evidence ($(date +%H:%M:%S))"

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
run evidence_geom_45h_long 2400 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --out perf_runs/accuracy_evidence_45h_geom_long.jsonl
run evidence_images_45h_long 3600 python scripts/train_synthetic_register.py \
  --steps 7000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 --images \
  --out perf_runs/accuracy_evidence_45h_images_long.jsonl
log "session done ($(date +%H:%M:%S))"
