#!/bin/bash
# Round-4 session D: the VERDICT r3 evidence queue, serialized on the one
# real chip (r3 lesson: never run two JAX processes concurrently).
#
# 1. Honest stacked-lane bench A/B N in {1,2,4,8} (VERDICT r3 item 1b) and
#    the images-path bench at N in {1,2} (item 4).
# 2. Color-thesis evidence on the EQUAL 9000-step schedule (item 2):
#    images long run + a params-saving geometry rerun.
# 3. Same-weights exact-vs-approx search eval (item 8): the geometry
#    params evaluated under the default approx stack and under
#    search_exact+full-tiles, 32 held-out pairs for finer recall deltas.
# 4. Full-SO(3) rotation-curriculum pair (item: the SO(3) gate must not
#    pass on a 0.25/0.25 tie — produce evidence that can clear a floor).
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4d"
mkdir -p "$out"
echo $$ > /tmp/r4d.pid
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

# --- 1. bench A/Bs (same-session numbers are the only comparable ones) ---
for n in 1 2 4 8; do
  PCRCG_BENCH_LAXMAP=$n run bench_geom_lax$n 2400 python bench.py
done
for n in 1 2; do
  PCRCG_BENCH_IMAGES=1 PCRCG_BENCH_LAXMAP=$n run bench_images_lax$n 3000 python bench.py
done

# --- 2. equal-schedule color-thesis evidence (9000 steps both arms) ---
run evidence_images_45h_long 6000 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 --images \
  --save-params perf_runs/params_45h_images_long.msgpack \
  --out perf_runs/accuracy_evidence_45h_images_long.jsonl
run evidence_geom_45h_long_v2 3600 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --save-params perf_runs/params_45h_geom_long.msgpack \
  --out perf_runs/accuracy_evidence_45h_geom_long_v2.jsonl

# --- 3. same-weights exact-vs-approx eval (32 pairs) ---
run eval_geom_approx 1800 python scripts/train_synthetic_register.py \
  --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
  --init-params perf_runs/params_45h_geom_long.msgpack --eval-only \
  --out perf_runs/accuracy_evidence_45h_geom_approx_eval.jsonl
run eval_geom_exact 2400 python scripts/train_synthetic_register.py \
  --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
  --init-params perf_runs/params_45h_geom_long.msgpack --eval-only --search-exact \
  --out perf_runs/accuracy_evidence_45h_geom_exact_eval.jsonl

# --- 4. full-SO(3) with rotation curriculum (30 -> 180 deg over 8k) ---
run evidence_so3c_geom 3600 python scripts/train_synthetic_register.py \
  --steps 12000 --eval-every 1000 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 180 --resample-frac 0.85 --rot-curriculum 8000 \
  --n-eval 16 --pair-pool 256 \
  --save-params perf_runs/params_so3c_geom.msgpack \
  --out perf_runs/accuracy_evidence_so3c_geom.jsonl
run evidence_so3c_images 6000 python scripts/train_synthetic_register.py \
  --steps 12000 --eval-every 1000 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 180 --resample-frac 0.85 --rot-curriculum 8000 \
  --n-eval 16 --pair-pool 256 --images \
  --save-params perf_runs/params_so3c_images.msgpack \
  --out perf_runs/accuracy_evidence_so3c_images.jsonl

log "session done ($(date +%H:%M:%S))"
