#!/bin/bash
# Round-4 sprint phase 5: gate + bench on the blocked (128-row) gather
# reduction, plus the bucket-emit retry.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jaxcomp
cd /root/repo
mkdir -p /tmp/sprint_r4
log() { echo "[sprint5] $* $(date +%T)"; }

log "gate start"
timeout 4200 python scripts/check_jit_parity.py > /tmp/sprint_r4/gate3.log 2>&1
rc=$?
log "gate rc=$rc"
grep -v WARNING /tmp/sprint_r4/gate3.log | grep -E "compact-vs-ghost|jit-vs|pallas-vs|pinhole" | head -12
if [ $rc -eq 0 ]; then
  grep -v WARNING /tmp/sprint_r4/gate3.log > GATE_r04.txt
  log "GATE_r04.txt written"
fi

log "bench full start"
timeout 2400 python bench.py > /tmp/sprint_r4/bench_final2.log 2>&1
log "bench rc=$?"
grep -v WARNING /tmp/sprint_r4/bench_final2.log | tail -1

log "bucket_emit start"
timeout 1800 python scripts/bucket_emit_bench.py 1048576 \
  > /tmp/sprint_r4/bucket_emit3.log 2>&1
log "bucket_emit rc=$?"
grep -v WARNING /tmp/sprint_r4/bucket_emit3.log | tail -4
log DONE
