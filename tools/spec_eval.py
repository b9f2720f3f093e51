#!/usr/bin/env python3
"""Speculative decoding on REAL checkpoints: acceptance + throughput + parity.

Loads a trained target (e.g. base-zh-grounded-r3) and a small trained draft
(e.g. tiny-zh-grounded) sharing one BPE vocab, then serves the SAME grounded
clips through the plain engine and the speculative engine at temperature 0:

- exact-parity check: the two engines must emit identical completed notes
  (the speculative contract on greedy decoding),
- acceptance: tokens per verify cycle (1 + accepted draft proposals),
- throughput: wall seconds and tok/s, OFF vs ON.

  PYTHONPATH=/root/repo python tools/spec_eval.py \
      --target data/checkpoints/base-zh-grounded-r3 \
      --draft data/checkpoints/tiny-zh-grounded \
      --tokenizer data/tokenizers/bpe-zh-2048.json

Env: VTX_SPEC_K (6), VTX_SPEC_BATCH (8), VTX_SPEC_CLIPS (8), VTX_SPEC_QUANT.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="speculative decode eval")
    parser.add_argument("--target", required=True)
    parser.add_argument("--draft", required=True)
    parser.add_argument("--tokenizer", required=True)
    parser.add_argument("--target-preset", default="base")
    parser.add_argument("--draft-preset", default="tiny")
    args = parser.parse_args(argv)

    spec_k = int(os.environ.get("VTX_SPEC_K", "6"))
    batch = int(os.environ.get("VTX_SPEC_BATCH", "8"))
    n_clips = int(os.environ.get("VTX_SPEC_CLIPS", "8"))
    quant = os.environ.get("VTX_SPEC_QUANT") or None

    from dataclasses import replace

    from video_transformer_tpu.analyzer.prompts import render_prompt
    from video_transformer_tpu.analyzer.schema import note_dfa
    from video_transformer_tpu.contracts.timefmt import format_seconds
    from video_transformer_tpu.models.bpe import BpeTokenizer
    from video_transformer_tpu.models.config import get_preset
    from video_transformer_tpu.parallel.engine import InferenceEngine
    from video_transformer_tpu.train.grounded import TOPIC_BANK, render_topic_clip

    tokenizer = BpeTokenizer.load(args.tokenizer)

    def sized(preset_name: str):
        cfg = get_preset(preset_name)
        return replace(
            cfg, decoder=replace(cfg.decoder, vocab_size=tokenizer.vocab_size)
        )

    target_cfg, draft_cfg = sized(args.target_preset), sized(args.draft_preset)

    def build(with_draft: bool) -> InferenceEngine:
        engine = InferenceEngine(
            target_cfg,
            max_new_tokens=1024,
            temperature=0.0,  # greedy: exact-parity contract is checkable
            tokenizer=tokenizer,
            param_dtype="bfloat16",
            quantize=quant,
            seed=1,
        )
        engine.dfa = engine.wrap_grammar(note_dfa(engine.byte_vocab))
        engine.restore(args.target)
        if with_draft:
            engine.attach_draft(
                draft_cfg, checkpoint=args.draft, spec_tokens=spec_k
            )
        return engine

    # Unseen grounded clips (same renderer as eval_grounding) at the
    # TARGET's frame geometry; the speculative engine resamples for the
    # draft internally.
    rng = np.random.default_rng(1234)
    size = target_cfg.encoder.image_size
    t_frames = target_cfg.encoder.num_frames
    ids = [i % len(TOPIC_BANK) for i in range(n_clips)]
    frames = np.stack(
        [render_topic_clip(t, t_frames, size, rng) for t in ids]
    )
    prompt = render_prompt(
        "analysis",
        {"duration_label": format_seconds(120)},
        profile="compact",
    )
    prompts = [prompt] * n_clips

    def measure(engine: InferenceEngine, label: str) -> dict:
        # Warmup compiles the bucket, then a timed pass.
        engine.generate(frames[:batch], prompts[:batch], batch_bucket=batch)
        engine.stats.__init__()
        start = time.perf_counter()
        texts, status = [], []
        for i in range(0, n_clips, batch):
            t, s = engine.generate(
                frames[i : i + batch], prompts[i : i + batch],
                batch_bucket=batch, return_status=True,
            )
            texts += t
            status += s
        wall = time.perf_counter() - start
        stats = engine.stats
        row = {
            "mode": label,
            "wall_s": round(wall, 2),
            "tokens": stats.tokens_generated,
            "tok_per_s": round(stats.tokens_generated / wall, 1),
            "decode_steps": stats.decode_steps,
            # Per-ROW tokens per loop iteration (rows run in lockstep):
            # for spec this is 1 + accepted proposals per verify cycle.
            "tok_per_step_row": round(
                stats.tokens_generated / max(stats.decode_steps * batch, 1), 2
            ),
        }
        print(json.dumps(row), flush=True)
        return {**row, "texts": texts, "status": status}

    off = measure(build(False), "plain")
    on = measure(build(True), f"spec_k{spec_k}")

    # Greedy parity is the correctness bar: rows BOTH engines complete must
    # be byte-equal (token-capped rows may truncate at different points —
    # see tests/test_speculative.py); a mismatch fails the run.
    completed = [
        i for i in range(n_clips) if off["status"][i] and on["status"][i]
    ]
    matched = [i for i in completed if off["texts"][i] == on["texts"][i]]
    summary = {
        "spec_k": spec_k,
        "batch": batch,
        "clips": n_clips,
        "quant": quant,
        "parity": f"{len(matched)}/{len(completed)} completed rows equal",
        "acceptance_tok_per_cycle_row": on["tok_per_step_row"],
        "speedup": round(off["wall_s"] / on["wall_s"], 2) if on["wall_s"] else 0.0,
        "plain_tok_per_s": off["tok_per_s"],
        "spec_tok_per_s": on["tok_per_s"],
    }
    print(json.dumps(summary))
    if len(matched) != len(completed):
        print("PARITY FAILURE: speculative output diverged from the plain "
              "engine on completed rows", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
