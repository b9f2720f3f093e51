#!/bin/bash
# Full-pipeline rehearsal at REAL deployment geometry (round-5 verdict #6):
# drive `main.py --url` end-to-end on-chip with the qwen2vl-7b preset —
# synthetic 152,064-token vocabulary (models/synth_vocab.py), int8 decoder,
# constant bf16 host weights (engine.synthetic_weights) — producing an
# actual note artifact + quality report + audit, not just the
# grammar/decode unit gate (tests/test_tpu_integration.py). This is the
# last in-environment step before real safetensors replace the reference's
# Gemini call (reference content_analyzer.py:1296-1300).
#
#   bash tools/rehearse_7b.sh [WORK_DIR]
set -eu
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
WORK=${1:-data/temp/rehearsal7b}
mkdir -p "$WORK"

python - "$WORK" <<'EOF'
import sys, time
from pathlib import Path

import numpy as np
import yaml

work = Path(sys.argv[1])

# 1. Synthetic 152k Qwen-style vocabulary.
from video_transformer_tpu.models.synth_vocab import write_synth_qwen_vocab

vocab = work / "tokenizer.json"
if not vocab.exists():
    t0 = time.perf_counter()
    write_synth_qwen_vocab(vocab, vocab_size=152064)
    print(f"synth vocab: {time.perf_counter() - t0:.1f}s")

# 2. A two-minute structured lecture clip (single-pass path at 7b).
sys.path.insert(0, ".")
from bench import synth_video

clip = work / "lecture.y4m"
if not clip.exists():
    synth_video(clip, seconds=120.0, fps=2.0)
    print(f"clip: {clip.stat().st_size / 1e6:.1f} MB")

# 3. Rehearsal config: the SHIPPED config with the engine swapped to the
# 7b deployment geometry. Everything else (pipeline flow, validator,
# image generation, audit, refiner, quality gates) runs as shipped.
cfg = yaml.safe_load(Path("config/config.yaml").read_text())
cfg["system"]["output_dir"] = str(work / "out")
cfg["system"]["temp_dir"] = str(work / "tmp")
cfg["engine"].update(
    {
        "model_preset": "qwen2vl-7b",
        "quantize": "int8",
        "synthetic_weights": True,
        "checkpoint_dir": None,
        "tokenizer": {"type": "hf", "path": str(vocab), "vocab_size": 152064},
        # Constant weights sample ~uniformly over the allowed set; at
        # V=152k the JSON closers need a strong bias for the note to
        # close within budget (same rationale as the on-chip grammar
        # gate, structure_bias=9.5 there).
        "structure_bias": 9.5,
        "max_new_tokens": 1400,
        "grammar_scale": 0.25,
        "draft": {},
    }
)
# Serving prompts assume a distilled checkpoint; the rehearsal runs the
# compact profile (the spec's 3.7k-token prompt buys nothing on constant
# weights and quadruples the prefill bucket).
cfg.setdefault("analyzer", {})["prompt_profile"] = "compact"
cfg["analyzer"]["max_continuations"] = 0
cfg["analyzer"]["retry_times"] = 0
(work / "config.yaml").write_text(yaml.dump(cfg, allow_unicode=True))
print("config written")
EOF

t0=$(date +%s)
python main.py --config "$WORK/config.yaml" --url "$WORK/lecture.y4m" \
  --no-checkpoint --verbose
rc=$?
t1=$(date +%s)
echo "pipeline wall: $((t1 - t0)) s (rc=$rc)"

echo "--- artifacts ---"
find "$WORK/out" -type f | sort
note=$(find "$WORK/out" -name "*knowledge_note.md" | head -1)
test -n "$note" || { echo "FATAL: no note artifact"; exit 1; }
echo "--- note head ($note) ---"
head -40 "$note"
wc -l "$note"
