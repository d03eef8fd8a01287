#!/bin/bash
# Round-4 sprint phase 2: cap retune A/B (emission budget shrank to ~1.10M
# after the superblock pre-cull; sort/inversion rows scale with the cap),
# then the knob-leg gate + bucket-emit prototype measurement.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/sprint_r4
log() { echo "[sprint2] $* $(date +%T)"; }

R19=$((19 << 16))
R18=$((18 << 16))

log "kernel_bench retuned-cap check start"
timeout 3600 python scripts/kernel_bench.py --max-instances $R18 \
  --stages bin bin_packed red > /tmp/sprint_r4/kernel_bench_r18.log 2>&1
log "kernel_bench rc=$?"
grep -v WARNING /tmp/sprint_r4/kernel_bench_r18.log | tail -12

run_quick() { # name env...
  local name=$1; shift
  log "bench[$name] start"
  env "$@" OMNIGS_BENCH_QUICK=1 timeout 1800 python bench.py \
    > /tmp/sprint_r4/bench_$name.log 2>&1
  log "bench[$name] rc=$?"
  grep -v WARNING /tmp/sprint_r4/bench_$name.log | tail -1
}

run_quick gp_r19 OMNIGS_GATHER_REDUCE=1 OMNIGS_DEPTH_PRESORT=1 \
  OMNIGS_MAX_INSTANCES=$R19
run_quick gp_r18 OMNIGS_GATHER_REDUCE=1 OMNIGS_DEPTH_PRESORT=1 \
  OMNIGS_MAX_INSTANCES=$R18

log "bucket_emit_bench start"
timeout 1800 python scripts/bucket_emit_bench.py 1048576 \
  > /tmp/sprint_r4/bucket_emit.log 2>&1
log "bucket_emit rc=$?"
grep -v WARNING /tmp/sprint_r4/bucket_emit.log | tail -3
log DONE
