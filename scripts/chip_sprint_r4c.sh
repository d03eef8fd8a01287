#!/bin/bash
# Round-4 sprint phase 3: final-config verification + remaining VERDICT
# measurements.
#   1. check_jit_parity (incl. the new knob legs) -> GATE_r04.txt
#   2. full bench.py at the committed defaults (BENCH_r04 preview)
#   3. quality_check on the pinned scene (measures GATE_PSNR)
#   4. scaling_bench 1x1 on the real chip (sharding tax, VERDICT r3 #8)
#   5. bucket_emit_bench (counting-sort primitive, VERDICT r3 #1)
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/sprint_r4
log() { echo "[sprint3] $* $(date +%T)"; }

log "gate start"
timeout 4200 python scripts/check_jit_parity.py > /tmp/sprint_r4/gate.log 2>&1
rc=$?
log "gate rc=$rc"
grep -v WARNING /tmp/sprint_r4/gate.log | tail -45
if [ $rc -eq 0 ]; then
  grep -v WARNING /tmp/sprint_r4/gate.log > GATE_r04.txt
  log "GATE_r04.txt written"
fi

log "bench full start"
timeout 2400 python bench.py > /tmp/sprint_r4/bench_final.log 2>&1
log "bench rc=$?"
grep -v WARNING /tmp/sprint_r4/bench_final.log | tail -1

log "quality_check start"
timeout 3000 bash scripts/quality_check.sh > /tmp/sprint_r4/quality.log 2>&1
log "quality rc=$?"
tail -2 /tmp/sprint_r4/quality.log

log "scaling 1x1 start"
timeout 2400 python scripts/scaling_bench.py --meshes 1x1 \
  > /tmp/sprint_r4/scaling.log 2>&1
log "scaling rc=$?"
grep -v WARNING /tmp/sprint_r4/scaling.log | tail -3

log "bucket_emit start"
timeout 1800 python scripts/bucket_emit_bench.py 1048576 \
  > /tmp/sprint_r4/bucket_emit.log 2>&1
log "bucket_emit rc=$?"
grep -v WARNING /tmp/sprint_r4/bucket_emit.log | tail -3
log DONE
