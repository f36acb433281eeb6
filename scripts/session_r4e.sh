#!/bin/bash
# Round-4 session E: the VERDICT r3 evidence queue (session_r4d sections
# 2-4, reordered by judge-value — the equal-schedule color run first),
# serialized on the one real chip.  The bench A/Bs (r4d section 1) run in
# a separate later session so the host is idle for them.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4e"
mkdir -p "$out"
echo $$ > /tmp/r4e.pid
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

# --- 1. equal-schedule color-thesis evidence (9000 steps, same schedule
#        as the committed accuracy_evidence_45h_geom_long.jsonl) ---
run evidence_images_45h_long 9000 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 --images \
  --save-params perf_runs/params_45h_images_long.msgpack \
  --out perf_runs/accuracy_evidence_45h_images_long.jsonl

# --- 2. geometry rerun that saves params (feeds the exact/approx evals) ---
run evidence_geom_45h_long_v2 5400 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --save-params perf_runs/params_45h_geom_long.msgpack \
  --out perf_runs/accuracy_evidence_45h_geom_long_v2.jsonl

# --- 3. same-weights exact-vs-approx eval (32 pairs) ---
run eval_geom_approx 2400 python scripts/train_synthetic_register.py \
  --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
  --init-params perf_runs/params_45h_geom_long.msgpack --eval-only \
  --out perf_runs/accuracy_evidence_45h_geom_approx_eval.jsonl
run eval_geom_exact 3600 python scripts/train_synthetic_register.py \
  --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
  --init-params perf_runs/params_45h_geom_long.msgpack --eval-only --search-exact \
  --out perf_runs/accuracy_evidence_45h_geom_exact_eval.jsonl

# --- 4. full-SO(3) with rotation curriculum (30 -> 180 deg over 8k) ---
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

log "session done ($(date +%H:%M:%S))"
