#!/bin/bash
# Round-3 session E: hardened moderate-rotation accuracy-evidence pair.
# Complements the full-SO(3) session-C pair: at 45° the model converges
# within the session budget (round-2 experience), so this run carries the
# recall >= 0.9 gate with ALL the round-2 hardening asks in force —
# 16 held-out pairs, independently-resampled crops (no 1:1 identity),
# pair pool spanning both assets scans.  Geometry-only first, then the
# full color+geometry run on the SAME eval pairs.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r3e"
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
run evidence_geom_45h 1800 python scripts/train_synthetic_register.py \
  --steps 3000 --eval-every 250 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --out perf_runs/accuracy_evidence_45h_geom.jsonl
run evidence_images_45h 3600 python scripts/train_synthetic_register.py \
  --steps 3000 --eval-every 250 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 --images \
  --out perf_runs/accuracy_evidence_45h_images.jsonl
echo "session done ($(date +%H:%M:%S))" | tee -a "$out/session.log"
