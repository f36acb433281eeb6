#!/bin/bash
# Round-4 session G: the SO(3) rotation-curriculum evidence pair (last
# queue item — runs unattended at the end of the round; the gate
# test_color_branch_helps_full_so3 only fires when BOTH artifacts are
# committed, so an incomplete run is simply not committed).
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4e"
mkdir -p "$out"
echo $$ > /tmp/r4g.pid
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
  sleep 15
}

run evidence_so3c_geom 5400 python scripts/train_synthetic_register.py \
  --steps 12000 --eval-every 1000 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 180 --resample-frac 0.85 --rot-curriculum 8000 \
  --n-eval 16 --pair-pool 256 \
  --save-params perf_runs/params_so3c_geom.msgpack \
  --out perf_runs/accuracy_evidence_so3c_geom.jsonl
run evidence_so3c_images 9000 python scripts/train_synthetic_register.py \
  --steps 12000 --eval-every 1000 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 180 --resample-frac 0.85 --rot-curriculum 8000 \
  --n-eval 16 --pair-pool 256 --images \
  --save-params perf_runs/params_so3c_images.msgpack \
  --out perf_runs/accuracy_evidence_so3c_images.jsonl

log "session G done ($(date +%H:%M:%S))"
