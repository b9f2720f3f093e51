#!/bin/bash
# Base grounded retrain (round 3), runs on the attached chip.
#
# 4096-sample jittered pool (pixel memorization collapsed a 512-pool run to
# 4/16 in round 2), spatial translation jitter, 35% composites with the
# squeezed-band secondary signature, 15% band-only curriculum samples
# (supervision for "read the band region -> name its topic").
cd /root/repo
PYTHONPATH=/root/repo:${PYTHONPATH:-} exec python -m video_transformer_tpu.train.run \
  --preset base --steps 3000 --batch 8 --text-len 2048 \
  --grounded --grounded-cache 4096 --grounded-composite 0.35 \
  --grounded-band 0.15 \
  --tokenizer data/tokenizers/bpe-zh-2048.json \
  --remat --prompt-profile compact \
  --out data/checkpoints/base-zh-grounded-r3 \
  --checkpoint-every 300 --log-dir data/output/logs
