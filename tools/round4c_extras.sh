#!/bin/bash
# Round-4 session-3 post-drive extras: the int8 quality gate on the
# SHIPPED checkpoint. config.yaml serves base-r3d at quantize: null
# (bf16); the official bench runs int8 at 2x the decode throughput. If
# int8 holds the r3d quality line (16/16 single + 7/8 composite — int4
# already measured a composite drop to 2/8 on params_3000, so this is
# not a foregone conclusion), the product default flips to int8.
#
#   bash tools/round4c_extras.sh [OUT_DIR]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r4}
mkdir -p "$OUT"

log() { echo "[extras3 $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

commit_stage() {
  git add "$OUT" >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round-4 session 3)" \
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

TOK=data/tokenizers/bpe-zh-2048.json

stage eval_r3d_int8 5400 bash -c "python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint data/checkpoints/base-zh-grounded-r3d-bf16 \
  --quantize int8 \
  --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"

log "session-3 extras complete"
