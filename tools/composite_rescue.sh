#!/bin/bash
# Conditional compositional-grounding rescue (round 3 plan B).
#
# Reads the all-checkpoint grounding eval log, picks the best base-r3
# checkpoint, and — ONLY if two-signature composites still miss the 6/8
# bar — runs a composite-focused finetune from that checkpoint and
# re-scores it. The round-3 primary fix (squeezed-band signatures +
# band-only curriculum + translation jitter) is already in the base-r3
# retrain; this doubles down on the composite mix if that was not enough.
#
#   bash tools/composite_rescue.sh EVAL_LOG [OUT_DIR]
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
EVAL_LOG=$1
OUT=${2:-data/checkpoints/base-zh-grounded-r3c}
# Deadline pressure knob: fewer steps trades rescue depth for leaving room
# for the round-4 finetunes behind it on the one chip (~11 s/step at base).
STEPS=${VTX_RESCUE_STEPS:-600}

read -r BEST_CKPT COMP_HITS COMP_TOTAL <<EOF
$(python - "$EVAL_LOG" <<'PY'
import json, sys

best, best_line = -1, None
for line in open(sys.argv[1]):
    line = line.strip()
    if not line.startswith("{"):
        continue
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        continue
    if "checkpoint" not in rec:
        continue
    score = rec.get("hits", 0) + rec.get("composite_hits", 0)
    if score >= best:
        best, best_line = score, rec
if best_line is None:
    print("NONE 0 0")
else:
    print(best_line["checkpoint"], best_line.get("composite_hits", 0),
          best_line.get("composite_total", 8))
PY
)
EOF

echo "best=$BEST_CKPT composites=$COMP_HITS/$COMP_TOTAL"
if [ "$BEST_CKPT" = "NONE" ]; then
  echo "no eval records found; nothing to rescue"
  exit 0
fi
if [ "$COMP_HITS" -ge 6 ]; then
  echo "composites already pass (>=6); no rescue needed"
  exit 0
fi

# Teacher COMPOSITE notes run to 1,189 BPE tokens (extra secondary-topic
# chapter; measured 2026-08-20), above eval_grounding's default 1024-token
# generation cap — a cap-truncated note scores "parse" no matter how well
# it grounds. Score composites at 1536 so the measurement sees the whole
# note, and score the UNRESCUED init checkpoint at the same cap first: the
# rescue delta must not be confounded with the cap change.
EVAL_CAP=1536

python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint "$BEST_CKPT" --max-new-tokens $EVAL_CAP \
  --tokenizer data/tokenizers/bpe-zh-2048.json \
  --topics 16 --composites 8 --batch 8 || true

python -m video_transformer_tpu.train.run \
  --preset base --steps "$STEPS" --batch 8 --text-len 2048 --lr 1e-4 \
  --grounded --grounded-cache 4096 --grounded-composite 0.6 \
  --grounded-band 0.2 \
  --tokenizer data/tokenizers/bpe-zh-2048.json \
  --remat --prompt-profile compact \
  --init-from "$BEST_CKPT" \
  --out "$OUT" \
  --checkpoint-every 300 --log-dir data/output/logs

python -m video_transformer_tpu.train.eval_grounding \
  --preset base --checkpoint "$OUT" --all-checkpoints --max-new-tokens $EVAL_CAP \
  --tokenizer data/tokenizers/bpe-zh-2048.json \
  --topics 16 --composites 8 --batch 8 || true
