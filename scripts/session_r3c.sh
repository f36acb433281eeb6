#!/bin/bash
# Round-3 session C: the hardened accuracy-evidence pair — full-SO(3)
# geometry-only vs full color+geometry (--images) on the SAME training
# pool and eval pairs (VERDICT r2 items 2+3).  Not timing-sensitive;
# the CPU test suite may run concurrently (env -u PALLAS_AXON_POOL_IPS).
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3c"
mkdir -p "$out"
run() {
  name=$1; shift
  to=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$out/session.log"
  timeout "$to" "$@" > "$out/$name.log" 2>&1
  rc=$?
  if [ $rc -ne 0 ]; then
    echo "FAILED rc=$rc ($name)" | tee -a "$out/session.log"
  else
    tail -2 "$out/$name.log" | tee -a "$out/session.log"
  fi
  sleep 30
}
run evidence_geom_so3 5400 python scripts/train_synthetic_register.py \
  --steps 10000 --eval-every 1000 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 180 --rot-curriculum 5000 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --out perf_runs/accuracy_evidence_so3_geom.jsonl
run evidence_images_so3 9000 python scripts/train_synthetic_register.py \
  --steps 10000 --eval-every 1000 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 180 --rot-curriculum 5000 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 --images \
  --out perf_runs/accuracy_evidence_so3_images.jsonl
echo "session done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
