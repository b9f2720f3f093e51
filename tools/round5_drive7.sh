#!/bin/bash
# Round-5 phase 7: closing ablation rows at the REAL serving batch (the
# segment sweep runs b32 slots) and at note-length token budgets where
# the int8-KV gain fully shows (the 512 budget understates it).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r5}
log() { echo "[r5g $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }
if ! timeout 240 python -c "import jax; ds=jax.devices(); assert ds[0].platform != 'cpu'" >/dev/null 2>&1; then
  log "tunnel DOWN"; exit 3
fi
stage() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; log "done $name: $(tail -1 "$OUT/$name.log" | head -c 200)"
  else
    log "FAIL $name: $(tail -2 "$OUT/$name.log" | tr '\n' ' ' | head -c 200)"
  fi
  git add "$OUT" data/output/decode_bench_runs.jsonl >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $name (round 5)" >/dev/null 2>&1 || true
}

stage decode_b32_shipped 4800 env VTX_DB_BATCH=32 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,kvq python tools/decode_bench.py
stage decode_b16_long_kvq 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_TOKENS=1536 VTX_DB_VARIANTS=full,kvq python tools/decode_bench.py

log "round-5 phase-7 drive complete"
