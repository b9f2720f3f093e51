"""Topic-grounding evaluation: do generated notes describe the FRAMES?

For each sampled topic the evaluator renders an UNSEEN clip carrying that
topic's visual signature (train/grounded.py), generates a note with one
fixed prompt (only the frames differ between rows), and scores a hit when
the note's title/summary/takeaways name the clip's topic. This is the
measurable stand-in for the reference's genuine multimodal analysis
(reference content_analyzer.py:1296-1300) — the reference has no offline
eval at all (its quality signal is the cloud validator).

  python -m video_transformer_tpu.train.eval_grounding \\
      --preset base --checkpoint data/checkpoints/base-zh-grounded \\
      --tokenizer data/tokenizers/bpe-zh-2048.json [--topics 16] [--batch 4]

Prints one JSON line: {"hits": H, "total": N, "per_topic": {...}, ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

__all__ = ["main", "run_eval"]


def _note_blob(text: str) -> str | None:
    """The note fields grounding is scored on, or None on parse failure."""
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return None
    return (
        data.get("title", "")
        + data.get("one_sentence_summary", "")
        + " ".join(data.get("key_takeaways", []))
    )


def run_eval(
    engine,
    topic_ids: list[int],
    batch: int,
    seed: int = 99,
    temperature_prompt_seconds: int = 120,
    composite_pairs: list[tuple[int, int]] | None = None,
    warmup: bool = False,
    shifts: list[str] | None = None,
    profile: str = "compact",
) -> dict:
    """Score grounding hits for ``topic_ids`` through ``engine``.

    ``composite_pairs`` additionally scores two-signature clips
    (render_composite_clip): a pair hits only when the note names BOTH
    topics — the compositional bar single-signature shortcuts cannot pass.

    ``shifts`` names held-out style shifts (train/shifts.py): each one
    re-scores every topic on a transformed clip, measuring grounding
    OUTSIDE the training render distribution — "reads the signature"
    vs "memorized the renderer".
    """
    from ..analyzer.prompts import render_prompt
    from ..contracts.timefmt import format_seconds
    from .grounded import TOPIC_BANK, render_composite_clip, render_topic_clip

    rng = np.random.default_rng(seed)
    config = engine.config
    # Checkpoints must be scored under the profile they serve with: compact
    # for the distilled line, spec for spec-finetuned / real instruction
    # weights (serving the 3.7k-token spec to a compact-only checkpoint
    # collapses grounding — the round-3 prompt-distribution regression).
    prompt = render_prompt(
        "analysis",
        {"duration_label": format_seconds(temperature_prompt_seconds)},
        profile=profile,
    )
    t_frames = config.encoder.num_frames
    size = config.encoder.image_size

    # Warm the compile caches so decode_tokens_per_s reflects steady state
    # (the first generate call carries minutes of XLA compile on TPU). The
    # warmup clip draws from its OWN rng: consuming the scoring stream
    # would change which "unseen clips" the eval measures, making scores
    # incomparable across the warmup flag.
    if warmup and topic_ids:
        warm_rng = np.random.default_rng(seed + 1_000_003)
        warm = np.stack(
            [render_topic_clip(topic_ids[0], t_frames, size, warm_rng)] * min(
                batch, len(topic_ids)
            )
        )
        engine.generate(warm, [prompt] * warm.shape[0])
        engine.stats.__init__()

    results: dict[str, bool] = {}
    hits = 0
    start = time.perf_counter()
    for i in range(0, len(topic_ids), batch):
        ids = topic_ids[i : i + batch]
        frames = np.stack(
            [render_topic_clip(t, t_frames, size, rng) for t in ids]
        )
        texts = engine.generate(frames, [prompt] * len(ids))
        for t, text in zip(ids, texts):
            name = TOPIC_BANK[t].name
            blob = _note_blob(text)
            hit = blob is not None and name in blob
            results[name] = bool(hit)
            hits += hit

    composite_results: dict[str, bool] = {}
    composite_hits = 0
    for i in range(0, len(composite_pairs or []), batch):
        pairs = composite_pairs[i : i + batch]
        frames = np.stack(
            [render_composite_clip(a, b, t_frames, size, rng) for a, b in pairs]
        )
        texts = engine.generate(frames, [prompt] * len(pairs))
        for (a, b), text in zip(pairs, texts):
            label = f"{TOPIC_BANK[a].name}+{TOPIC_BANK[b].name}"
            blob = _note_blob(text)
            # Record which side landed: "both" (hit), "primary"/"secondary"
            # (the composite pooling failure mode is the secondary dying),
            # "neither", or "parse" — the miss diagnosis decides the next
            # training intervention.
            got_a = blob is not None and TOPIC_BANK[a].name in blob
            got_b = blob is not None and TOPIC_BANK[b].name in blob
            hit = got_a and got_b
            if blob is None:
                composite_results[label] = "parse"
            elif hit:
                composite_results[label] = "both"
            elif got_a:
                composite_results[label] = "primary"
            elif got_b:
                composite_results[label] = "secondary"
            else:
                composite_results[label] = "neither"
            composite_hits += hit

    shift_results: dict[str, dict] = {}
    if shifts:
        from .shifts import apply_shift

        for shift in shifts:
            # Fresh rng per shift: every shift scores the same clip
            # distribution, so per-shift hit rates are comparable.
            shift_rng = np.random.default_rng(seed)
            s_hits = 0
            s_topics: dict[str, bool] = {}
            for i in range(0, len(topic_ids), batch):
                ids = topic_ids[i : i + batch]
                frames = np.stack(
                    [
                        apply_shift(
                            shift,
                            render_topic_clip(t, t_frames, size, shift_rng),
                            shift_rng,
                        )
                        for t in ids
                    ]
                )
                texts = engine.generate(frames, [prompt] * len(ids))
                for t, text in zip(ids, texts):
                    blob = _note_blob(text)
                    hit = blob is not None and TOPIC_BANK[t].name in blob
                    s_topics[TOPIC_BANK[t].name] = bool(hit)
                    s_hits += hit
            shift_results[shift] = {
                "hits": s_hits,
                "total": len(topic_ids),
                "per_topic": s_topics,
            }

    elapsed = time.perf_counter() - start
    report = {
        "hits": hits,
        "total": len(topic_ids),
        "per_topic": results,
        "decode_tokens_per_s": round(engine.stats.tokens_per_second, 1),
        "wall_seconds": round(elapsed, 2),
    }
    if composite_pairs:
        report["composite_hits"] = composite_hits
        report["composite_total"] = len(composite_pairs)
        report["per_composite"] = composite_results
    if shift_results:
        report["per_shift"] = shift_results
        report["ood_hits"] = sum(r["hits"] for r in shift_results.values())
        report["ood_total"] = sum(r["total"] for r in shift_results.values())
    return report


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="topic-grounding eval")
    parser.add_argument("--preset", default="tiny")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--tokenizer", help="BPE vocab path (models/bpe.py)")
    parser.add_argument("--topics", type=int, default=16,
                        help="number of topics to sample (stride over bank)")
    parser.add_argument("--composites", type=int, default=0,
                        help="number of two-signature clips to score "
                             "(hit = note names BOTH topics)")
    parser.add_argument(
        "--shifts",
        help="comma list of held-out style shifts (train/shifts.py) or "
             "'all': re-score every topic on out-of-distribution clips",
    )
    parser.add_argument("--batch", type=int, default=4)
    # Generation cap 1536, NOT 1024: teacher composite notes run to 1,189
    # BPE tokens and models free-run longer than their teachers — at 1024
    # the cap truncated notes into "parse" misses (base-r3 params_3000
    # scored 13/16 single at 1024 vs 15/16 at 1536 on identical clips,
    # 2026-08-20). Scores at different caps are not comparable.
    parser.add_argument("--max-new-tokens", type=int, default=1536)
    parser.add_argument("--temperature", type=float, default=0.7)
    parser.add_argument("--quantize", default=None, choices=["int8", "int4"])
    parser.add_argument(
        "--seed", type=int, default=99,
        help="clip-sampling seed; vary to separate a real quality cliff "
             "from single-seed sampling noise (scores at different seeds "
             "draw different unseen clips and are only comparable to the "
             "same seed)",
    )
    parser.add_argument(
        "--prompt-profile", default="compact", choices=["compact", "spec"],
        help="prompt templates to evaluate under — must match the profile "
             "the checkpoint was trained/finetuned against",
    )
    parser.add_argument(
        "--all-checkpoints",
        action="store_true",
        help="treat --checkpoint as a parent dir and score EVERY params_N "
             "under it (newest first) in one process — restore swaps params "
             "in place, so the minutes-long generate compile is paid once",
    )
    args = parser.parse_args(argv)

    from dataclasses import replace

    from ..analyzer.schema import note_dfa
    from ..models.config import get_preset
    from ..parallel.engine import InferenceEngine
    from .grounded import TOPIC_BANK

    config = get_preset(args.preset)
    tokenizer = None
    if args.tokenizer:
        from ..models.bpe import BpeTokenizer

        tokenizer = BpeTokenizer.load(args.tokenizer)
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=tokenizer.vocab_size)
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

    n = min(args.topics, len(TOPIC_BANK))
    stride = max(len(TOPIC_BANK) // n, 1)
    topic_ids = [(i * stride) % len(TOPIC_BANK) for i in range(n)]
    shifts = None
    if args.shifts:
        from .shifts import SHIFT_BANK

        shifts = (
            sorted(SHIFT_BANK)
            if args.shifts == "all"
            else [s.strip() for s in args.shifts.split(",") if s.strip()]
        )
        unknown = [s for s in shifts if s not in SHIFT_BANK]
        if unknown:
            raise SystemExit(f"unknown shifts {unknown}; have {sorted(SHIFT_BANK)}")
    pairs = None
    if args.composites:
        pair_rng = np.random.default_rng(17)
        pairs = []
        for _ in range(args.composites):
            a, b = pair_rng.choice(len(TOPIC_BANK), size=2, replace=False)
            pairs.append((int(a), int(b)))

    if args.all_checkpoints:
        from pathlib import Path

        parent = Path(args.checkpoint)
        ckpts = sorted(
            (
                p for p in parent.iterdir()
                if p.is_dir()
                and p.name.startswith("params_")
                and p.name.split("_")[-1].isdigit()
            ),
            key=lambda p: int(p.name.split("_")[-1]),
            reverse=True,  # newest first: partial sweeps still cover the end
        )
        if not ckpts:
            raise FileNotFoundError(f"no params_N checkpoints under {parent}")
    else:
        ckpts = [args.checkpoint]

    best = 0
    best_total = 1
    for idx, ckpt in enumerate(ckpts):
        engine.restore(str(ckpt))
        report = run_eval(
            engine, topic_ids, args.batch, seed=args.seed,
            composite_pairs=pairs,
            warmup=(idx == 0), shifts=shifts, profile=args.prompt_profile,
        )
        report["checkpoint"] = str(ckpt)
        report["prompt_profile"] = args.prompt_profile
        report["seed"] = args.seed
        print(json.dumps(report, ensure_ascii=False), flush=True)
        total = report["total"] + report.get("composite_total", 0)
        got = report["hits"] + report.get("composite_hits", 0)
        if got * best_total >= best * total:
            best, best_total = got, total
    return 0 if best == best_total else 1


if __name__ == "__main__":
    sys.exit(main())
