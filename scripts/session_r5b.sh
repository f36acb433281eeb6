#!/bin/bash
# Round-5 chip session B: execute the queued perf levers (VERDICT r5 items
# 2-3) + the SO(3) evidence continuation (item 5).  Serialized, idle host,
# one phase per invocation:  bash scripts/session_r5b.sh <phase>
#
#   probe     tunnel liveness (timeout probe; hang = tunnel down)
#   base      geometry + images bench at HEAD defaults (warm cache,
#             same-session baselines)
#   ab        ab_m_tiles sweep: per-level m_tiles and recall_target — the
#             ~28 ms approx-top-k sort machinery is the ranked lever; any
#             default change must keep per-level recall >= 0.95
#   trace     trace_top_ops forward+pyramid at the chosen defaults
#   final     bench geometry + images at the chosen defaults
#   reeval    refresh the same-weights approx-vs-exact eval artifacts
#             under the new defaults (gate: delta <= 2/32)
#   so3geom   SO(3) continuation, geometry arm (+12k steps from r4 params,
#             32-pair eval pool; gate pre-registered in
#             tests/test_accuracy_evidence.py)
#   so3img    SO(3) continuation, color arm
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r5b"
mkdir -p "$out"
echo $$ > /tmp/r5b.pid
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
    tail -3 "$out/$name.log" | tee -a "$out/session.log"
  fi
  sleep 15
}

case "${1:?phase}" in
  probe)
    run probe 240 python -c "import jax; print(jax.devices())" ;;
  base)
    run bench_geom_base 2400 python bench.py
    PCRCG_BENCH_IMAGES=1 run bench_images_base 3000 python bench.py ;;
  ab)
    run ab_mtiles 7200 python scripts/ab_m_tiles.py \
      128:12 128:12,10,8,8 128:8 128:12:0.9 128:12,10,8,8:0.9 ;;
  trace)
    run trace_fwd 2400 python scripts/trace_top_ops.py forward fused
    run trace_pyr 2400 python scripts/trace_top_ops.py pyramid fused ;;
  final)
    run bench_geom_final 2400 python bench.py
    PCRCG_BENCH_IMAGES=1 run bench_images_final 3000 python bench.py ;;
  reeval)
    run eval_geom_approx 3600 python scripts/train_synthetic_register.py \
      --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
      --init-params perf_runs/params_45h_geom_long.msgpack --eval-only \
      --out perf_runs/accuracy_evidence_45h_geom_approx_eval.jsonl ;;
  so3geom)
    # FRESH 24k-step runs with slow decay (50 epochs): continuation from
    # the r4 params failed live twice — restarting Adam at 1e-3 destroyed
    # the model, and fine-tuning at 1e-4 stayed flat at the start value.
    # The r4 runs themselves were lr-frozen past ~step 3000 (150 decays
    # over 12k steps); --decay-epochs 50 keeps lr above 7.7e-5 to the end.
    run evidence_so3c2_geom 7200 python scripts/train_synthetic_register.py \
      --steps 24000 --eval-every 2000 --budget 13312 --optimizer Adam --lr 0.001 \
      --max-rot-deg 180 --resample-frac 0.85 --rot-curriculum 8000 \
      --decay-epochs 50 \
      --n-eval 32 --pair-pool 256 \
      --save-params perf_runs/params_so3c2_geom.msgpack \
      --out perf_runs/accuracy_evidence_so3c2_geom.jsonl ;;
  so3img)
    run evidence_so3c2_images 10800 python scripts/train_synthetic_register.py \
      --steps 24000 --eval-every 2000 --budget 13312 --optimizer Adam --lr 0.001 \
      --max-rot-deg 180 --resample-frac 0.85 --rot-curriculum 8000 --images \
      --decay-epochs 50 \
      --n-eval 32 --pair-pool 256 \
      --save-params perf_runs/params_so3c2_images.msgpack \
      --out perf_runs/accuracy_evidence_so3c2_images.jsonl ;;
  *) echo "unknown phase $1"; exit 2 ;;
esac
