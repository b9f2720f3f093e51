"""Training driver CLI.

Distills (clip, teacher-note) pairs into the VideoLM. Data comes from a
staging directory (``--data``: <id>.<ext> + <id>.note.json pairs, see
train/data.py) or, when absent, from schema-valid synthetic samples — useful
for smoke runs, throughput measurement, and scaling tests.

  python -m video_transformer_tpu.train.run --preset tiny --steps 200 \\
      --batch 8 --out ./checkpoints [--data ./staged] [--tp 2] [--remat]
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np

from ..analyzer.schema import note_dfa
from ..models.config import get_preset
from ..models.tokenizer import ByteTokenizer
from ..ops.preprocess import preprocess_frames
from ..parallel.mesh import build_mesh
from ..utils.logger import setup_logging
from .data import distillation_records, synthetic_batch
from .trainer import TrainConfig, Trainer

__all__ = ["main"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pack_row(tok, encode_note, text, text_len, prompt, prompt_len, rng):
    """One training row: [BOS + prompt block][note body][EOS], PAD-padded.

    The prompt block width is the SERVING bucket for this prompt —
    round_up(tokens + 1, 128), capped at ``prompt_len`` — exactly what
    engine._assemble_inputs computes, so train and serve positions line up
    per row. Returns (row, block_width).
    """
    prefix: list[int] = []
    block = 0
    if prompt and prompt_len > 0:
        text_prompt = prompt(rng) if callable(prompt) else prompt
        n_tokens = len(tok.encode(text_prompt)) + 1
        block = min(_round_up(n_tokens, 128), prompt_len)
        prefix = list(tok.encode_array(text_prompt, block, add_bos=True))
    body = encode_note(text)[: text_len - len(prefix) - 1] + [tok.EOS]
    if not prefix:
        body = [tok.BOS] + body[: text_len - 1]
    row = np.full((text_len,), tok.PAD, dtype=np.int32)
    ids = prefix + body
    row[: len(ids)] = ids[:text_len]
    return row, block


def make_prompt_sampler(prompt_profile: str):
    """Per-row serving-prompt sampler for training.

    Trains with the SAME prompt blocks the analyzer serves with (analysis +
    segment prompts, randomized duration labels) so every serving prompt
    stays in-distribution. ``"mixed"`` draws compact/spec 50/50 per row —
    one checkpoint that serves BOTH profiles; _pack_row buckets each row's
    prompt to its own 128-multiple block, so the two widths coexist in one
    static-shape batch.
    """
    from ..analyzer.prompts import render_prompt
    from ..contracts.timefmt import format_seconds

    def sample_prompt(rng: np.random.Generator) -> str:
        profile = prompt_profile
        if profile == "mixed":
            profile = "spec" if rng.random() < 0.5 else "compact"
        if rng.random() < 0.7:
            return render_prompt(
                "analysis",
                {"duration_label": format_seconds(float(rng.integers(30, 7200)))},
                profile=profile,
            )
        start = float(rng.integers(0, 3600))
        return render_prompt(
            "segment_analysis",
            {
                "segment_index": int(rng.integers(1, 9)),
                "segment_total": int(rng.integers(2, 10)),
                "start_label": format_seconds(start),
                "end_label": format_seconds(start + float(rng.integers(60, 600))),
            },
            profile=profile,
        )

    return sample_prompt


def _frames_to_patches(frames, config):
    import jax.numpy as jnp

    patches = preprocess_frames(
        jnp.asarray(frames[None]), config.encoder, jnp.float32
    )[0]
    return np.asarray(patches)


def _staged_batches(data_dir, config, batch, text_len, logger, prompt=None,
                    prompt_len=0, tok=None, encode_note=None):
    """Cycle over staged (video, note) pairs, yielding device-ready batches."""
    import json

    from ..video.containers import read_frames

    tok = tok or ByteTokenizer(config.decoder.vocab_size)
    encode_note = encode_note or (lambda text: tok.encode(text))
    records = list(distillation_records(data_dir))
    if not records:
        raise SystemExit(f"no (video, note) pairs found under {data_dir}")
    logger.info(f"staged records: {len(records)}")
    rng = np.random.default_rng(0)
    cursor = 0
    while True:
        patches_list, tokens_list, blocks = [], [], []
        for _ in range(batch):
            video, note = records[cursor % len(records)]
            cursor += 1
            frames = read_frames(video, config.encoder.num_frames)
            patches_list.append(_frames_to_patches(frames, config))
            text = json.dumps(note, ensure_ascii=False)
            row, block = _pack_row(
                tok, encode_note, text, text_len, prompt, prompt_len, rng
            )
            tokens_list.append(row)
            blocks.append(block)
        yield (
            np.stack(patches_list),
            np.stack(tokens_list),
            np.asarray(blocks, np.int32),
        )


def _grounded_batches(config, batch, text_len, logger, prompt=None,
                      prompt_len=0, tok=None, encode_note=None, seed=0,
                      cache_size=384, composite_p=0.0, band_p=0.0,
                      attrs_p=0.0, hard_pairs_p=0.0):
    """Grounded pairs: frames carry the note's topic signature.

    Rendering + host preprocessing dominates training wall-clock at large
    frame sizes (one host core), so a pool of ``cache_size`` samples is
    materialized ONCE and batches draw from it — the fixed-corpus epoch
    regime (24 topics x phrasing variants give ample diversity at a few
    hundred samples). cache_size=0 regenerates every sample.
    """
    import json

    from .grounded import (
        TOPIC_BANK,
        composite_note,
        grounded_note,
        render_band_clip,
        render_composite_clip,
        render_topic_clip,
    )

    tok = tok or ByteTokenizer(config.decoder.vocab_size)
    encode_note = encode_note or (lambda text: tok.encode(text))
    rng = np.random.default_rng(seed)

    def sample():
        idx = int(rng.integers(len(TOPIC_BANK)))
        draw = rng.random()
        if composite_p > 0 and draw < composite_p:
            # Compositional pair: two signatures in one clip, note covers both.
            if hard_pairs_p > 0 and rng.random() < hard_pairs_p:
                # Hard negatives: the persistent composite miss
                # (优化器+降维方法, primary-only through two rescue rounds)
                # is the pair with the SMALLEST circular hue distance in
                # the eval set — the band hue reads as a variant of the
                # primary's. Oversample near-hue partners so the band
                # detector learns the fine hue margins.
                hues = (np.arange(len(TOPIC_BANK)) * 0.618034) % 1.0
                d = np.abs(hues - hues[idx])
                d = np.minimum(d, 1.0 - d)
                d[idx] = np.inf
                near = np.argsort(d)[:4]
                other = int(near[int(rng.integers(len(near)))])
            else:
                other = int(rng.integers(len(TOPIC_BANK) - 1))
                other += other >= idx
            frames = render_composite_clip(
                idx, other, config.encoder.num_frames,
                config.encoder.image_size, rng,
            )
            note = composite_note(TOPIC_BANK[idx], TOPIC_BANK[other], rng)
        elif band_p > 0 and draw < composite_p + band_p:
            # Curriculum decomposition: the band region alone carries the
            # signature, note is the ordinary single-topic note — direct
            # supervision for "read the band -> name its topic".
            frames = render_band_clip(
                idx, config.encoder.num_frames, config.encoder.image_size, rng
            )
            note = grounded_note(TOPIC_BANK[idx], rng)
        else:
            attrs = None
            if attrs_p > 0 and rng.random() < attrs_p:
                # Frame-attribute grounding: orientation/shape-count drawn
                # INDEPENDENTLY of the topic and STATED in the note, so
                # class identity cannot predict them — the model must read
                # this clip's pixels (train/grounded.py attrs docstring).
                attrs = (int(rng.integers(3)), int(rng.integers(1, 6)))
            frames = render_topic_clip(
                idx, config.encoder.num_frames, config.encoder.image_size,
                rng,
                orient=None if attrs is None else attrs[0],
                n_shapes=None if attrs is None else attrs[1],
            )
            note = grounded_note(TOPIC_BANK[idx], rng, attrs=attrs)
        text = json.dumps(note, ensure_ascii=False)
        row, block = _pack_row(
            tok, encode_note, text, text_len, prompt, prompt_len, rng
        )
        return frames, row, block

    def augment(frames: np.ndarray) -> np.ndarray:
        """Cheap photometric/temporal jitter: a cached clip never repeats
        pixel-identically, so the pool's effective diversity is unbounded
        (the round-2 lesson: a few-hundred-sample pool trained to acc 0.999
        memorizes pixels and loses unseen-clip grounding)."""
        out = frames.astype(np.float32)
        out *= rng.uniform(0.82, 1.18)  # brightness
        out += rng.uniform(-12.0, 12.0)  # offset
        out += rng.normal(0.0, rng.uniform(0.0, 6.0), out.shape)  # sensor noise
        shift = int(rng.integers(0, frames.shape[0]))  # temporal phase
        out = np.roll(out, shift, axis=0)
        # Temporal reversal: the signature channels (hue pair, stripe
        # orientation/frequency, shape count) are direction-free, so the
        # label survives playing the clip backwards — and the round-4 OOD
        # sweep showed time_reverse is the weakest shift (11/16 vs 15-16/16
        # for photometric shifts on base-r3): the model had latched onto
        # drift direction it never needed.
        if rng.random() < 0.2:
            out = out[::-1]
        # Spatial translation (wrap-around): shifts every sample off the
        # patch grid so the model cannot memorize per-position pixels
        # (round-2 collapse driver); signatures survive — stripes only
        # phase-shift, shapes move, hue is global. The vertical range stays
        # small so composite band boundaries barely smear.
        size = frames.shape[1]
        dy = int(rng.integers(-(size // 32), size // 32 + 1))
        dx = int(rng.integers(-(size // 8), size // 8 + 1))
        out = np.roll(out, (dy, dx), axis=(1, 2))
        return np.clip(out, 0.0, 255.0).astype(np.uint8)

    import jax.numpy as jnp

    def to_batch(drawn):
        frames = np.stack([augment(d[0]) for d in drawn])
        patches = np.asarray(
            preprocess_frames(
                jnp.asarray(frames), config.encoder, jnp.float32
            )
        )
        return (
            patches,
            np.stack([d[1] for d in drawn]),
            np.asarray([d[2] for d in drawn], np.int32),
        )

    if cache_size > 0:
        logger.info(
            f"grounded corpus: {len(TOPIC_BANK)} topics, caching "
            f"{cache_size} samples (per-draw jitter)"
        )
        pool = [sample() for _ in range(cache_size)]
        while True:
            picks = rng.integers(0, cache_size, size=batch)
            yield to_batch([pool[i] for i in picks])

    logger.info(f"grounded corpus: {len(TOPIC_BANK)} topics, on-the-fly")
    while True:
        yield to_batch([sample() for _ in range(batch)])


def _synthetic_batches(config, batch, text_len, dfa, prompt, prompt_len):
    rng = np.random.default_rng(0)
    blocks = np.full((batch,), prompt_len if prompt else 0, np.int32)
    while True:
        patches, tokens = synthetic_batch(
            rng, config, batch, text_len, dfa=dfa,
            prompt=prompt, prompt_len=prompt_len,
        )
        yield patches, tokens, blocks


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="train/distill the VideoLM")
    parser.add_argument(
        "--preset", default="tiny",
        choices=["tiny", "base", "7b", "qwen2vl-7b"],
    )
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--text-len", type=int, default=2048)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--accum", type=int, default=1)
    parser.add_argument("--tp", type=int, default=1, help="model-axis size")
    parser.add_argument(
        "--pp", type=int, default=1,
        help="pipeline stages (GPipe over the decoder blocks; layers must "
             "divide evenly; mutually exclusive with --tp)",
    )
    parser.add_argument(
        "--pp-micro", type=int, default=4,
        help="GPipe microbatches per step (batch must divide by it)",
    )
    parser.add_argument(
        "--pp-schedule", default="gpipe", choices=["gpipe", "1f1b"],
        help="pipeline backward: gpipe (jax.grad, O(n_micro) activation "
             "stash) or 1f1b (hand-scheduled waves, O(stages) stash)",
    )
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--data", help="staging dir of (video, note) pairs")
    parser.add_argument(
        "--grounded", action="store_true",
        help="train on grounded topic-signature pairs (frames determine the "
             "note content; see train/grounded.py)",
    )
    parser.add_argument(
        "--grounded-composite", type=float, default=0.0,
        help="probability of compositional two-signature pairs (the note "
             "must cover BOTH topics in the frames)",
    )
    parser.add_argument(
        "--grounded-hard-pairs", type=float, default=0.0,
        help="within composite draws: probability the partner topic is one "
             "of the 4 nearest-hue topics (hard negatives for the band "
             "detector) instead of uniform",
    )
    parser.add_argument(
        "--grounded-attrs", type=float, default=0.0,
        help="probability a single-topic sample randomizes its stripe "
             "orientation / shape count and the note STATES them — "
             "frame-attribute grounding the class identity cannot shortcut",
    )
    parser.add_argument(
        "--grounded-band", type=float, default=0.0,
        help="probability of band-only curriculum samples (signature only "
             "in the composite band region, ordinary single-topic note)",
    )
    parser.add_argument(
        "--grounded-cache", type=int, default=384,
        help="size of the pre-rendered grounded sample pool (0 = render "
             "every sample on the fly; host-bound at large frame sizes)",
    )
    parser.add_argument(
        "--tokenizer",
        help="path to a trained BPE vocab (models/bpe.py); resizes the "
             "decoder vocab and uses grammar-aligned note tokenization",
    )
    parser.add_argument(
        "--prompt-len", type=int, default=256,
        help="serving prompt block width prepended to each sequence "
             "(masked from the loss; 0 disables)",
    )
    parser.add_argument(
        "--prompt-profile", default="compact",
        choices=["compact", "spec", "mixed"],
        help="prompt templates to train against: compact (short templates — "
             "what distilled checkpoints serve with), spec (the full "
             "reference behavioral spec, ~3.7k tokens; requires a matching "
             "--prompt-len), or mixed (per-row 50/50 compact/spec — one "
             "checkpoint that serves BOTH profiles; _pack_row buckets each "
             "row's prompt to its own 128-multiple block, so the two widths "
             "coexist in one static-shape batch)",
    )
    parser.add_argument(
        "--init-from",
        help="orbax checkpoint (params_N dir or its parent) to initialize "
             "from — continued distillation / fine-tuning",
    )
    parser.add_argument("--out", default="./data/checkpoints")
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--log-dir", default="./data/output/logs")
    args = parser.parse_args(argv)

    logger = setup_logging(args.log_dir, log_name="train.log")
    from ..parallel.mesh import maybe_initialize_distributed

    if maybe_initialize_distributed():
        import jax as _jax

        logger.info(
            f"joined pod: process {_jax.process_index()}/{_jax.process_count()}"
        )
    if args.prompt_len >= args.text_len:
        args.prompt_len = args.text_len // 2
        logger.info(
            f"prompt_len clamped to {args.prompt_len} (text_len {args.text_len})"
        )
    config = get_preset(args.preset)

    # Optional BPE tokenizer: resize the decoder vocab and tokenize notes
    # with grammar-aligned segmentation so training matches the constrained
    # decode loop's forced tokenization (ops/token_grammar.py).
    tok = None
    encode_note = None
    if args.tokenizer:
        from dataclasses import replace

        from ..models.bpe import BpeTokenizer
        from ..ops.token_grammar import TokenGrammar

        tok = BpeTokenizer.load(args.tokenizer)
        config = replace(
            config, decoder=replace(config.decoder, vocab_size=tok.vocab_size)
        )
        grammar = TokenGrammar(note_dfa(512), tok)
        encode_note = grammar.encode_aligned
        logger.info(
            f"bpe tokenizer: {args.tokenizer} vocab={tok.vocab_size} "
            f"merges={len(tok.merges)}"
        )

    # Align the full sequence (video tokens + text) to 128 so the Pallas
    # flash backward engages (unaligned totals fall back to the O(S^2)
    # reference VJP).
    total = config.video_tokens + args.text_len
    if total % 128:
        args.text_len += 128 - total % 128
        logger.info(f"text_len aligned to {args.text_len} (seq multiple of 128)")
    if args.pp > 1:
        if args.tp > 1:
            raise SystemExit("--pp and --tp are mutually exclusive")
        from ..parallel.pipeline_parallel import build_pipe_mesh

        mesh = build_pipe_mesh(args.pp)
        round_to = args.pp_micro
    else:
        mesh = build_mesh({"model": args.tp})
        round_to = mesh.shape["data"]
    if args.batch % round_to:
        args.batch = ((args.batch + round_to - 1) // round_to) * round_to
        logger.info(f"batch rounded up to {args.batch} (divisor {round_to})")
    logger.info(f"mesh: {dict(mesh.shape)} preset={args.preset}")

    trainer = Trainer(
        config,
        mesh,
        TrainConfig(
            learning_rate=args.lr,
            total_steps=args.steps,
            warmup_steps=max(args.steps // 20, 1),
            accum_steps=args.accum,
            remat=args.remat,
            prompt_len=args.prompt_len,
            pp_microbatches=args.pp_micro,
            pp_schedule=args.pp_schedule,
        ),
    )

    prompt = make_prompt_sampler(args.prompt_profile) if args.prompt_len > 0 else None

    if args.data:
        batches = _staged_batches(
            args.data, config, args.batch, args.text_len, logger,
            prompt=prompt, prompt_len=args.prompt_len,
            tok=tok, encode_note=encode_note,
        )
    elif args.grounded:
        batches = _grounded_batches(
            config, args.batch, args.text_len, logger,
            prompt=prompt, prompt_len=args.prompt_len,
            tok=tok, encode_note=encode_note,
            cache_size=args.grounded_cache,
            composite_p=args.grounded_composite,
            band_p=args.grounded_band,
            attrs_p=args.grounded_attrs,
            hard_pairs_p=args.grounded_hard_pairs,
        )
    else:
        logger.info("no --data given: training on schema-valid synthetic pairs")
        batches = _synthetic_batches(
            config, args.batch, args.text_len,
            note_dfa(min(config.decoder.vocab_size, 512)), prompt, args.prompt_len,
        )

    if args.init_from:
        from pathlib import Path

        path = Path(args.init_from)
        if path.is_dir() and not path.name.startswith("params_"):
            candidates = sorted(
                (p for p in path.iterdir() if p.name.startswith("params_")),
                key=lambda p: int(p.name.split("_")[-1]),
            )
            if not candidates:
                raise SystemExit(f"no params_N checkpoints under {path}")
            path = candidates[-1]
        trainer.restore_checkpoint(str(path))
        logger.info(f"event=train_init_from checkpoint={path}")

    start = time.perf_counter()
    tokens_seen = 0
    for step in range(1, args.steps + 1):
        patches, tokens, prompt_lens = next(batches)
        metrics = trainer.step(patches, tokens, prompt_lens)
        tokens_seen += int(metrics.get("tokens", 0))
        if step % 10 == 0 or step == 1:
            elapsed = time.perf_counter() - start
            logger.info(
                f"event=train_step step={step} loss={metrics['loss']:.4f} "
                f"acc={metrics['accuracy']:.3f} grad_norm={metrics['grad_norm']:.3f} "
                f"tokens_per_s={tokens_seen / max(elapsed, 1e-6):.0f}"
            )
        if args.checkpoint_every and step % args.checkpoint_every == 0:
            trainer.save_checkpoint(args.out)
            logger.info(f"event=checkpoint step={step} dir={args.out}")

    trainer.save_checkpoint(args.out)
    logger.info(
        f"event=train_complete steps={args.steps} "
        f"final_loss={metrics['loss']:.4f} checkpoint={args.out}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
