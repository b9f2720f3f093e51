#!/bin/bash
# Post-drive chip extras (round 4, session 2): measurements whose need only
# became clear from the drive's own results.
#
#   1 decode_b32_force   full vs force4 at the SERVING batch (32): b64/b128
#                        showed force4 +10%/+25% and full regressing, but
#                        the crossover sits between 32 and 64 — this row
#                        decides the engine max_forced_run default.
#   2 decode_b32_spec    speculative ceiling at serving batch (b8 spec_eval
#                        measures the real pair; this bounds batch scaling
#                        of the wide verify).
#
#   bash tools/post_drive_extras.sh [OUT_DIR]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r4}
mkdir -p "$OUT"
log() { echo "[extras $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

commit_stage() {
  git add "$OUT" >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round-4 session 2)" \
    -- "$OUT" >/dev/null 2>&1 || true
}

stage() {
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; log "done $name: $(tail -1 "$OUT/$name.log")"
    commit_stage "$name"
  else
    log "FAIL $name (exit $?; tail): $(tail -3 "$OUT/$name.log" | tr '\n' ' ')"
    commit_stage "$name (failed)"
  fi
}

stage decode_b32_force 4800 env VTX_DB_BATCH=32 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=full,force2,force4,force8 python tools/decode_bench.py
stage decode_b32_spec 4800 env VTX_DB_BATCH=32 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=specself VTX_DB_SPEC_K=6 python tools/decode_bench.py

# The b64/b128 rows showed narrower forced blocks winning more the wider
# the batch (force4 +25% at b128); if force2 beats force4 at b32 above,
# this row is the aggregate-throughput headline candidate.
stage decode_b128_force2 4800 env VTX_DB_BATCH=128 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=force2 python tools/decode_bench.py

log "extras complete"
