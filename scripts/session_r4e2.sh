#!/bin/bash
# Round-4 session E2: remainder of the r4e evidence queue after the
# images long run was restarted solo (the pytest suite's xdist workers
# wedged the first attempt's chip client — PERF.md measurement rule 6).
# Runs: geometry params rerun + the same-weights exact/approx evals.
# The SO(3) curriculum pair runs later (session_r4g) after the bench
# session, so the bench A/Bs get the mid-night chip window.
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r4e"
mkdir -p "$out"
echo $$ > /tmp/r4e2.pid
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

run evidence_geom_45h_long_v2 5400 python scripts/train_synthetic_register.py \
  --steps 9000 --eval-every 500 --budget 13312 --optimizer Adam --lr 0.001 \
  --max-rot-deg 45 --resample-frac 0.85 \
  --n-eval 16 --pair-pool 128 \
  --save-params perf_runs/params_45h_geom_long.msgpack \
  --out perf_runs/accuracy_evidence_45h_geom_long_v2.jsonl

run eval_geom_approx 2400 python scripts/train_synthetic_register.py \
  --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
  --init-params perf_runs/params_45h_geom_long.msgpack --eval-only \
  --out perf_runs/accuracy_evidence_45h_geom_approx_eval.jsonl
run eval_geom_exact 3600 python scripts/train_synthetic_register.py \
  --budget 13312 --max-rot-deg 45 --resample-frac 0.85 --n-eval 32 \
  --init-params perf_runs/params_45h_geom_long.msgpack --eval-only --search-exact \
  --out perf_runs/accuracy_evidence_45h_geom_exact_eval.jsonl

log "session E2 done ($(date +%H:%M:%S))"
