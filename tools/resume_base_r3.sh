#!/bin/bash
# Round-3 session-c orchestrator: resume the base-r3 retrain from the
# committed step-1200 bf16 insurance snapshot (the container recycle at
# ~01:50 killed the live run at ~step 1300; only committed state survives),
# keep the checkpoint preserver running alongside, then chain the full
# post-retrain measurement queue (tools/hardware_queue_r3b.sh).
#
#   bash tools/resume_base_r3.sh [QUEUE_OUT] [DEADLINE_EPOCH]
#
# Safe to re-run: if the final checkpoint (params_3000) already exists the
# training step is skipped and the queue runs directly.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

OUT=${1:-/tmp/hwq_r3b}
DEADLINE=${2:-0}
CKPT=data/checkpoints/base-zh-grounded-r3
INSURANCE=data/checkpoints/base-zh-grounded-r3-insurance/params_1800

log() { echo "[r3c $(date +%H:%M:%S)] $*"; }

if [ ! -d "$CKPT/params_3000" ]; then
  log "resuming base-r3 from $INSURANCE (1200 steps to go)"
  python -m video_transformer_tpu.train.run \
    --preset base --steps 1200 --batch 8 --text-len 2048 \
    --grounded --grounded-cache 4096 --grounded-composite 0.35 \
    --grounded-band 0.15 \
    --tokenizer data/tokenizers/bpe-zh-2048.json \
    --remat --prompt-profile compact \
    --init-from "$INSURANCE" \
    --out "$CKPT" \
    --checkpoint-every 300 --log-dir data/output/logs \
    >/tmp/train_base_r3c.log 2>&1 &
  TRAIN_PID=$!
  echo "$TRAIN_PID" > /tmp/train_base_r3c.pid
  # Preserve intermediate snapshots at 1800/2400 + the final checkpoint the
  # moment training exits — commits are the only recycle-proof storage.
  bash tools/preserve_checkpoints.sh "$TRAIN_PID" "$CKPT" \
    data/checkpoints/base-zh-grounded-r3-insurance 2100 2400 2700 \
    >/tmp/preserve_r3c.log 2>&1 &
  PRESERVE_PID=$!
  wait "$TRAIN_PID"
  log "training exited ($(tail -1 /tmp/train_base_r3c.log))"
  # Let the preserver finish committing the final checkpoint.
  wait "$PRESERVE_PID" 2>/dev/null || true
else
  log "params_3000 already present; skipping training"
fi

log "starting measurement queue -> $OUT (deadline=$DEADLINE)"
VTX_QUEUE_DEADLINE=$DEADLINE bash tools/hardware_queue_r3b.sh "$OUT"
log "orchestrator complete"
