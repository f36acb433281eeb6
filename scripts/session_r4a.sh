#!/bin/bash
# Round-3 continuation session A: the long-schedule hardened 45-degree
# evidence queued as session_r3h but never executed (chip time ran out).
# Geometry FIRST (its >=0.9 recall gate is the hard artifact; if wall
# clock cuts the images run short, its trajectory has no "final" record
# and the comparison test skips rather than fails).  Compiles are cached
# from the r3e short runs (same shapes/flags; --steps doesn't change the
# compiled graph).
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4a"
mkdir -p "$out"
echo $$ > /tmp/r4a.pid
log() { echo "$*" | tee -a "$out/session.log"; }

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
run evidence_geom_45h_long 1800 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --out perf_runs/accuracy_evidence_45h_geom_long.jsonl
run evidence_images_45h_long 2100 python scripts/train_synthetic_register.py \
  --steps 7000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 --images \
  --out perf_runs/accuracy_evidence_45h_images_long.jsonl
log "session done ($(date +%H:%M:%S))"
