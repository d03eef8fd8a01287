#!/bin/bash
# Round-4 sprint phase 4: gate re-run on the two-level-reduction code
# (phase-3 gate caught the cancellation bug; rc=1), corrected scaling
# config, fixed bucket-emit kernel.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/sprint_r4
log() { echo "[sprint4] $* $(date +%T)"; }

log "gate start"
timeout 4200 python scripts/check_jit_parity.py > /tmp/sprint_r4/gate2.log 2>&1
rc=$?
log "gate rc=$rc"
grep -v WARNING /tmp/sprint_r4/gate2.log | tail -50
if [ $rc -eq 0 ]; then
  grep -v WARNING /tmp/sprint_r4/gate2.log > GATE_r04.txt
  log "GATE_r04.txt written"
fi

log "scaling 1x1 start"
timeout 2400 python scripts/scaling_bench.py --meshes 1x1 \
  > /tmp/sprint_r4/scaling2.log 2>&1
log "scaling rc=$?"
grep -v WARNING /tmp/sprint_r4/scaling2.log | tail -3

log "bucket_emit start"
timeout 1800 python scripts/bucket_emit_bench.py 1048576 \
  > /tmp/sprint_r4/bucket_emit2.log 2>&1
log "bucket_emit rc=$?"
grep -v WARNING /tmp/sprint_r4/bucket_emit2.log | tail -3
log DONE
