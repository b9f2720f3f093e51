#!/bin/bash
# Round-5 on-chip drive, phase 4 — the int8-KV cache rows + the fixed 7b
# rehearsal:
#   1 decode_kvq_b16/128  int8 KV on the xprog path: the stream probes
#                         measured the KV-length slope as the dominant
#                         serving step term; int8 halves it
#   2 eval_kvq_r5         quality gate: shipped r5 checkpoint under the
#                         int8 KV cache (16/16 + 8/8 must hold)
#   3 rehearse_7b         retry with the head_dim-80 attention fallback
#                         (first run died in the VISION tower's flash
#                         compile — Mosaic 128-lane tiling)
#
#   bash tools/round5_drive4.sh [OUT_DIR] (default data/measurements/r5)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r5}
mkdir -p "$OUT"

log() { echo "[r5d $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

probe_tunnel() {
  timeout 240 python - >/dev/null 2>&1 <<'PROBE'
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
PROBE
}

if ! probe_tunnel; then
  log "tunnel DOWN at start"
  exit 3
fi
log "tunnel UP (phase 4)"

DEADLINE=${VTX_QUEUE_DEADLINE:-0}

commit_stage() {
  git add "$OUT" data/output/stream_bench_runs.jsonl \
    data/output/decode_bench_runs.jsonl docs/audit_corpus.json \
    >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round 5)" >/dev/null 2>&1 || true
}

stage() { # stage NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  if [ -e "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
    log "skip $name (past deadline)"; return 0
  fi
  log "start $name"
  if timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1; then
    touch "$OUT/$name.done"; log "done $name: $(tail -1 "$OUT/$name.log")"
    commit_stage "$name"
  else
    log "FAIL $name (exit $?; tail): $(tail -3 "$OUT/$name.log" | tr '\n' ' ')"
    commit_stage "$name (failed)"
    until probe_tunnel; do
      if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
        log "tunnel down after $name and deadline passed; abandoning queue"
        return 1
      fi
      log "tunnel down after $name; re-probing in 300s"
      sleep 300
    done
  fi
}

TOK=data/tokenizers/bpe-zh-2048.json
R5BF=data/checkpoints/base-zh-grounded-r5-bf16/params_4100

stage decode_kvq_b16 4800 env VTX_DB_BATCH=16 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=kvq python tools/decode_bench.py
stage decode_kvq_b128 4800 env VTX_DB_BATCH=128 VTX_DB_QUANT=int8 \
  VTX_DB_VARIANTS=kvq python tools/decode_bench.py

stage eval_kvq_r5 3600 bash -c "env VTX_KV_QUANT=int8 VTX_XPROG_PREFETCH=1 \
  python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint $R5BF --quantize int8 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

stage rehearse_7b 9000 bash tools/rehearse_7b.sh

log "round-5 phase-4 drive complete"
