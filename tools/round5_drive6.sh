#!/bin/bash
# Round-5 phase 6: one stage — the official bench under the FULL shipped
# serving stack (int8 weights + int8 KV cache + split/prefetch kernels),
# captured in-repo as the round's closing number.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r5}
log() { echo "[r5f $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }
if ! timeout 240 python -c "import jax; ds=jax.devices(); assert ds[0].platform != 'cpu'" >/dev/null 2>&1; then
  log "tunnel DOWN"; exit 3
fi
if [ -e "$OUT/bench_shipped.done" ]; then log "skip bench_shipped"; exit 0; fi
log "start bench_shipped"
if timeout 6000 python bench.py >"$OUT/bench_shipped.log" 2>&1; then
  touch "$OUT/bench_shipped.done"
  log "done bench_shipped: $(tail -1 "$OUT/bench_shipped.log" | head -c 300)"
else
  log "FAIL bench_shipped: $(tail -2 "$OUT/bench_shipped.log" | tr '\n' ' ' | head -c 200)"
fi
git add "$OUT" >/dev/null 2>&1 || true
git commit -q -m "Record on-chip measurement: bench_shipped (round 5)" >/dev/null 2>&1 || true
