#!/bin/bash
# Retry loop for the tunneled chip. Order: bench FIRST (the driver's
# end-of-round artifact — its compiles must land in the persistent cache),
# then the jit-parity gate, then kernel stage timings.
# The remote-compile service wedges for 30-90 min stretches (BENCH.md);
# every stage runs under timeout and the loop re-probes between attempts.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/chip_pipe
log() { echo "[pipeline] $* $(date +%T)" >> /tmp/chip_pipe/log; }
probe() {
  timeout 420 python - <<'PY'
import random, jax.numpy as jnp
n = random.randint(90,140); m = random.randint(40,80)
x = jnp.full((n,m), float(random.random()))
print("probe ok:", float((x@x.T).sum()), flush=True)
PY
}
run_stage() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  if [ -f /tmp/chip_pipe/$name.ok ]; then return 0; fi
  log "stage $name start"
  if timeout "$tmo" "$@" > /tmp/chip_pipe/$name.log 2>&1; then
    touch /tmp/chip_pipe/$name.ok; log "stage $name OK"
    tail -2 /tmp/chip_pipe/$name.log >> /tmp/chip_pipe/log
    return 0
  fi
  log "stage $name FAILED/TIMEOUT"; tail -2 /tmp/chip_pipe/$name.log >> /tmp/chip_pipe/log
  return 1
}
for attempt in $(seq 1 40); do
  log "probe attempt $attempt"
  if probe >> /tmp/chip_pipe/log 2>&1; then
    run_stage bench 3000 python bench.py || continue
    run_stage gate 3000 python scripts/check_jit_parity.py || continue
    log "kbench skipped (slow remote-compile day: minutes/program — stage timings deferred)"
    log DONE; exit 0
  fi
  log "probe failed; sleep 120"
  sleep 120
done
log "gave up"; exit 1
