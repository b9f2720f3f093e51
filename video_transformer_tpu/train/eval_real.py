"""Real-footage note-faithfulness evaluation harness.

The grounding evals (eval_grounding.py) score synthetic signature clips —
they prove visual conditioning but not real-lecture understanding (VERDICT
r2 Missing #2). This harness evaluates ANY eval set of (clip, truth) pairs,
so the day real weights land on a deployment host, real lectures get a
number with no new code:

    data/eval/<name>.npzv (or .y4m)       the clip
    data/eval/<name>.truth.json           ground truth:
        {
          "topic": "梯度下降",                 # headline topic (optional)
          "must_mention": ["学习率", ...],     # required keywords
          "should_mention": ["动量", ...],     # credit keywords (optional)
          "forbid": ["欢迎订阅", ...]          # content-blacklist (optional)
        }

Scoring per clip: headline hit (topic named in title/summary/takeaways),
must coverage (fraction of must_mention anywhere in the note), should
coverage, forbid violations. One JSON line per run:

    python -m video_transformer_tpu.train.eval_real --eval-dir data/eval \
        --preset base --checkpoint ... --tokenizer ... [--profile compact]

Zero-egress stand-in sets can be staged from the synthetic banks
(``stage_out_of_bank`` writes held-out-signature clips with truths), which
keeps the harness itself continuously tested.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

__all__ = ["main", "run_real_eval", "stage_out_of_bank"]


def _note_fields(text: str) -> tuple[str, str] | None:
    """(headline blob, full note text) or None on parse failure."""
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return None
    headline = (
        data.get("title", "")
        + data.get("one_sentence_summary", "")
        + " ".join(data.get("key_takeaways", []))
    )
    return headline, json.dumps(data, ensure_ascii=False)


def score_note(text: str, truth: dict) -> dict:
    """Faithfulness scores for one generated note against its truth."""
    fields = _note_fields(text)
    if fields is None:
        return {
            "parsed": False, "headline_hit": False,
            "must_coverage": 0.0, "should_coverage": 0.0, "violations": [],
        }
    headline, full = fields
    topic = truth.get("topic")
    must = truth.get("must_mention", [])
    should = truth.get("should_mention", [])
    forbid = truth.get("forbid", [])
    return {
        "parsed": True,
        "headline_hit": bool(topic) and topic in headline,
        "must_coverage": (
            sum(k in full for k in must) / len(must) if must else 1.0
        ),
        "should_coverage": (
            sum(k in full for k in should) / len(should) if should else 1.0
        ),
        "violations": [k for k in forbid if k in full],
    }


def run_real_eval(
    engine,
    eval_dir: str | Path,
    batch: int = 4,
    profile: str = "compact",
    duration_seconds: int = 120,
) -> dict:
    """Generate + score a note for every (clip, truth) pair in eval_dir."""
    from ..analyzer.prompts import render_prompt
    from ..contracts.timefmt import format_seconds
    from ..video.containers import read_frames

    eval_dir = Path(eval_dir)
    pairs = []
    for truth_path in sorted(eval_dir.glob("*.truth.json")):
        stem = truth_path.name[: -len(".truth.json")]
        for ext in (".npzv", ".y4m"):
            clip = eval_dir / f"{stem}{ext}"
            if clip.exists():
                pairs.append((stem, clip, truth_path))
                break
    if not pairs:
        raise FileNotFoundError(f"no (clip, truth) pairs under {eval_dir}")

    config = engine.config
    prompt = render_prompt(
        "analysis",
        {"duration_label": format_seconds(duration_seconds)},
        profile=profile,
    )
    t_frames = config.encoder.num_frames
    size = config.encoder.image_size

    def load(clip: Path) -> np.ndarray:
        picked = read_frames(clip, t_frames)
        if picked.shape[1] != size or picked.shape[2] != size:
            rows = np.linspace(0, picked.shape[1] - 1, size).round().astype(int)
            cols = np.linspace(0, picked.shape[2] - 1, size).round().astype(int)
            picked = picked[:, rows][:, :, cols]
        return picked

    per_clip: dict[str, dict] = {}
    start = time.perf_counter()
    for i in range(0, len(pairs), batch):
        chunk = pairs[i : i + batch]
        frames = np.stack([load(clip) for _, clip, _ in chunk])
        texts = engine.generate(frames, [prompt] * len(chunk))
        for (stem, _, truth_path), text in zip(chunk, texts):
            truth = json.loads(truth_path.read_text(encoding="utf-8"))
            per_clip[stem] = score_note(text, truth)

    n = len(per_clip)
    scores = list(per_clip.values())
    return {
        "clips": n,
        "parse_rate": sum(s["parsed"] for s in scores) / n,
        "headline_hits": sum(s["headline_hit"] for s in scores),
        "must_coverage": round(
            float(np.mean([s["must_coverage"] for s in scores])), 3
        ),
        "should_coverage": round(
            float(np.mean([s["should_coverage"] for s in scores])), 3
        ),
        "violation_clips": sum(bool(s["violations"]) for s in scores),
        "wall_seconds": round(time.perf_counter() - start, 2),
        "per_clip": per_clip,
    }


def stage_out_of_bank(
    out_dir: str | Path, count: int, num_frames: int, size: int,
    seed: int = 123, fps: float = 2.0,
) -> list[Path]:
    """Stage a zero-egress eval set: held-out signature clips + truths.

    Clips reuse the signature RENDERER but with topic draws the fixed
    training pool never materialized pixel-identically (fresh rng), so the
    set exercises the harness end-to-end and doubles as an unseen-clip
    check. Real-footage sets replace these files one-for-one.
    """
    from ..video.containers import write_npzv
    from .grounded import TOPIC_BANK, render_topic_clip

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    # Topic draws come first, in one block, so which topics a seed selects
    # depends only on (seed, count) — not on how much rng the renderer
    # consumes per clip (tests pin seeds to the frozen topic range).
    indices = [int(i) for i in rng.integers(len(TOPIC_BANK), size=count)]
    paths = []
    for i, idx in enumerate(indices):
        topic = TOPIC_BANK[idx]
        clip = out_dir / f"oob_{i:03d}.npzv"
        write_npzv(
            clip, render_topic_clip(idx, num_frames, size, rng), fps=fps
        )
        truth = {
            "topic": topic.name,
            "must_mention": [topic.name],
            "should_mention": list(topic.terms),
            "forbid": ["欢迎订阅", "下节课"],
        }
        (out_dir / f"oob_{i:03d}.truth.json").write_text(
            json.dumps(truth, ensure_ascii=False), encoding="utf-8"
        )
        paths.append(clip)
    return paths


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="real-footage note eval")
    parser.add_argument("--eval-dir", required=True)
    parser.add_argument("--preset", default="base")
    parser.add_argument("--checkpoint")
    parser.add_argument("--tokenizer", help="BPE vocab path (models/bpe.py)")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--profile", default="compact",
                        choices=["compact", "spec"])
    parser.add_argument("--quantize", default=None, choices=["int8", "int4"])
    parser.add_argument(
        "--stage-out-of-bank", type=int, default=0, metavar="N",
        help="first stage N held-out synthetic pairs into --eval-dir",
    )
    args = parser.parse_args(argv)

    from dataclasses import replace

    from ..analyzer.schema import note_dfa
    from ..models.config import get_preset
    from ..parallel.engine import InferenceEngine

    config = get_preset(args.preset)
    tokenizer = None
    if args.tokenizer:
        from ..models.bpe import BpeTokenizer

        tokenizer = BpeTokenizer.load(args.tokenizer)
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=tokenizer.vocab_size)
        )
    if args.stage_out_of_bank:
        stage_out_of_bank(
            args.eval_dir, args.stage_out_of_bank,
            config.encoder.num_frames, config.encoder.image_size,
        )
    engine = InferenceEngine(
        config,
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        tokenizer=tokenizer,
        param_dtype="bfloat16",
        quantize=args.quantize,
        seed=1,
    )
    engine.dfa = engine.wrap_grammar(note_dfa(engine.byte_vocab))
    if args.checkpoint:
        engine.restore(args.checkpoint)

    report = run_real_eval(engine, args.eval_dir, args.batch, args.profile)
    print(json.dumps(report, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
