#!/bin/bash
# Round-5 on-chip drive, phase 5 — attribute-statement finetune, corrected
# mix. The phase-3 attempt kept the rescue recipe (composite 0.7 + band
# 0.2), leaving only ~3% of samples carrying attribute statements —
# eval_r5b_content measured stated_rate 0.0 while 16/16+8/8+time_reverse
# 16/16 all held. This run rebalances toward attrs (effective ~36%) from
# the r5b checkpoint and re-evals everything.
#
#   bash tools/round5_drive5.sh [OUT_DIR]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/root/repo/data/measurements/r5}
mkdir -p "$OUT"

log() { echo "[r5e $(date +%H:%M:%S)] $*" | tee -a "$OUT/drive.log"; }

probe_tunnel() {
  timeout 240 python - >/dev/null 2>&1 <<'PROBE'
import jax
ds = jax.devices()
assert ds and ds[0].platform != "cpu", ds
PROBE
}

if ! probe_tunnel; then log "tunnel DOWN at start"; exit 3; fi
log "tunnel UP (phase 5)"

DEADLINE=${VTX_QUEUE_DEADLINE:-0}

commit_stage() {
  git add "$OUT" data/output/decode_bench_runs.jsonl >/dev/null 2>&1 || true
  git commit -q -m "Record on-chip measurement: $1 (round 5)" >/dev/null 2>&1 || true
}

stage() {
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
  fi
}

TOK=data/tokenizers/bpe-zh-2048.json

stage train_attr_r5c 9000 python -m video_transformer_tpu.train.run \
  --preset base --steps 300 --batch 8 --text-len 2048 --lr 7e-5 \
  --grounded --grounded-cache 4096 --grounded-composite 0.35 \
  --grounded-band 0.05 --grounded-attrs 0.6 --grounded-hard-pairs 0.5 \
  --tokenizer $TOK \
  --remat --prompt-profile compact \
  --init-from data/checkpoints/base-zh-grounded-r5b/params_4500 \
  --out data/checkpoints/base-zh-grounded-r5c \
  --checkpoint-every 300 --log-dir data/output/logs

if [ -d data/checkpoints/base-zh-grounded-r5c ]; then
  stage eval_r5c 5400 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5c \
    --all-checkpoints \
    --tokenizer $TOK --topics 16 --composites 8 --batch 8 || true"
  stage eval_r5c_content 5400 bash -c "python -m video_transformer_tpu.train.eval_content \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5c/params_4800 \
    --tokenizer $TOK --topics 16 --batch 8 --attrs 16 \
    --coverage-floor 0 || true"
  stage eval_r5c_ood 5400 bash -c "python -m video_transformer_tpu.train.eval_grounding \
    --preset base --checkpoint data/checkpoints/base-zh-grounded-r5c/params_4800 \
    --shifts time_reverse \
    --tokenizer $TOK --topics 16 --batch 8 || true"
fi

log "round-5 phase-5 drive complete"
