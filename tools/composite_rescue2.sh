#!/bin/bash
# Composite-grounding rescue, round 2.
#
# Rescue 1 (tools/composite_rescue.sh: 400 steps at composite mix 0.6 from
# base-r3 params_3000) lifted composites 1/8 -> 5/8 with single-topic
# INTACT at 16/16 (base-zh-grounded-r3c/params_3300, 2026-08-20). The bar
# is 6/8; the persistent misses (混合精度+学习率调度, 注意力机制+梯度下降)
# name only the primary topic. This round doubles down: higher composite
# mix (0.7), LOWER lr (7e-5) to protect the 16/16 single-topic score, same
# squeezed-band geometry, init from the rescued checkpoint.
#
#   bash tools/composite_rescue2.sh [STEPS]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STEPS=${1:-400}
INIT=data/checkpoints/base-zh-grounded-r3c/params_3300
OUT=data/checkpoints/base-zh-grounded-r3d
TOK=data/tokenizers/bpe-zh-2048.json

python -m video_transformer_tpu.train.run \
  --preset base --steps "$STEPS" --batch 8 --text-len 2048 --lr 7e-5 \
  --grounded --grounded-cache 4096 --grounded-composite 0.7 \
  --grounded-band 0.2 \
  --tokenizer "$TOK" \
  --remat --prompt-profile compact \
  --init-from "$INIT" \
  --out "$OUT" \
  --checkpoint-every 200 --log-dir data/output/logs

python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint "$OUT" --all-checkpoints \
  --tokenizer "$TOK" --topics 16 --composites 8 --batch 8 || true
