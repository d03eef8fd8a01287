#!/bin/bash
# Round-3 measurement sprint (run when the chip is free):
#   1. kernel_bench — per-stage attribution of the r3 kernels
#   2. bench.py — headline number
#   3. check_jit_parity — the on-chip gate, log saved as GATE_r03.txt
#   4. quality_check — 512×256 held-out PSNR regression
# Each stage under timeout; everything logged under /tmp/sprint_r3.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/sprint_r3
log() { echo "[sprint] $* $(date +%T)"; }

log "kernel_bench start"
timeout 2400 python scripts/kernel_bench.py > /tmp/sprint_r3/kernel_bench.log 2>&1
log "kernel_bench rc=$?"
grep -v WARNING /tmp/sprint_r3/kernel_bench.log | tail -12

log "bench start"
timeout 1800 python bench.py > /tmp/sprint_r3/bench.log 2>&1
log "bench rc=$?"
grep -v WARNING /tmp/sprint_r3/bench.log | tail -2

log "gate start"
timeout 3000 python scripts/check_jit_parity.py > /tmp/sprint_r3/gate.log 2>&1
rc=$?
log "gate rc=$rc"
grep -v WARNING /tmp/sprint_r3/gate.log | tail -40
if [ $rc -eq 0 ]; then
  grep -v WARNING /tmp/sprint_r3/gate.log > GATE_r03.txt
  log "GATE_r03.txt written"
fi

log "quality_check start"
timeout 2400 bash scripts/quality_check.sh > /tmp/sprint_r3/quality.log 2>&1
log "quality_check rc=$?"
tail -3 /tmp/sprint_r3/quality.log
log DONE
