#!/bin/bash
# Round-4 measurement sprint (ONE chip process at a time):
#   1. kernel_bench — per-stage attribution incl. the round-4 paths
#      (packed/presorted binning, gather-based reduction)
#   2. bench.py quick A/B over the round-4 knobs
# Logs under /tmp/sprint_r4; every stage under timeout.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/sprint_r4
log() { echo "[sprint] $* $(date +%T)"; }

probe() {
  timeout 420 python - <<'PY'
import random, jax.numpy as jnp
n = random.randint(90,140); m = random.randint(40,80)
x = jnp.full((n,m), float(random.random()))
print("probe ok:", float((x@x.T).sum()), flush=True)
PY
}

log "probe"
probe || { log "probe FAILED"; exit 1; }

log "kernel_bench start"
timeout 3600 python scripts/kernel_bench.py > /tmp/sprint_r4/kernel_bench.log 2>&1
log "kernel_bench rc=$?"
grep -v WARNING /tmp/sprint_r4/kernel_bench.log | tail -25

run_quick() { # name env...
  local name=$1; shift
  log "bench[$name] start"
  env "$@" OMNIGS_BENCH_QUICK=1 timeout 1800 python bench.py \
    > /tmp/sprint_r4/bench_$name.log 2>&1
  log "bench[$name] rc=$?"
  grep -v WARNING /tmp/sprint_r4/bench_$name.log | tail -1
}

run_quick base
run_quick gather OMNIGS_GATHER_REDUCE=1
run_quick gather_presort OMNIGS_GATHER_REDUCE=1 OMNIGS_DEPTH_PRESORT=1
log DONE
