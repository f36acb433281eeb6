#!/bin/bash
# Round-5 chip session C: images-path breakdown (VERDICT r5 item 3) +
# the item-9 per-cloud-budget cost/benefit proxy.  Serialized, idle
# host, one phase per invocation:  bash scripts/session_r5c.sh <phase>
#
#   traceimg  trace_top_ops.py images — which ops own the ~28 ms the 2D
#             branch adds over geometry (ResNet convs vs lift vs BN)
#   proxy     bench.py geometry at the symmetric per-cloud-MEAN budget
#             (20736,7168,2048,640): the row count an asymmetric
#             src/tgt layout would reach — the perf ceiling of the
#             [2,N]-surgery, without doing the surgery.  Perf-only
#             (truncates the src cloud); see bench.py PCRCG_BENCH_POINTS.
#   imgbase   images bench at HEAD defaults (same-session baseline)
#   imgfix    images bench after the targeted fix
set -u
cd "$(dirname "$0")/.."
out="perf_runs/session_r5c"
mkdir -p "$out"
echo $$ > /tmp/r5c.pid
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
  traceimg) run trace_images 2400 python scripts/trace_top_ops.py images fused ;;
  proxy)
    PCRCG_BENCH_POINTS=20736,7168,2048,640 run bench_geom_proxy 2400 python bench.py ;;
  imgbase)
    PCRCG_BENCH_IMAGES=1 run bench_images_base 3000 python bench.py ;;
  imgfix)
    PCRCG_BENCH_IMAGES=1 run bench_images_fix 3000 python bench.py ;;
  *) echo "unknown phase $1"; exit 2 ;;
esac
