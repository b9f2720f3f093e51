#!/usr/bin/env python3
"""Decode-loop microbench + ablations: where does each decode step's time go?

Times the engine's real constrained decode at a fixed token budget (argmax
sampling, grammar on), then ablates one ingredient at a time:

  full        : grammar + forced fast-forward + sampling (the serving path)
  fused/nofuse: full path with serve-time projection fusion (models/
                fuse.py) forced on/off — measured neutral at b16, default off
  nogrammar   : plain EOS-terminated sampling (table=None, block_width=1)
  noforce     : grammar but max_forced_run=0 (block_width=1)
  forceN      : grammar with max_forced_run=N (e.g. force4) — the block
                width is a real tradeoff: every step pays an (N+1)-wide
                forward, but forced skeleton runs longer than N are split.
                The measured average advance on note content is ~1.2
                tokens/step at N=12, so narrower blocks may win.
  ref_attn    : full path with the XLA reference decode attention (the
                tool sets VTX_FORCE_REF_ATTN for this variant only)
  specself    : speculative decoding, draft = the target's own weights —
                ~100% acceptance, the mechanism's tok/s CEILING (real
                distilled draft/target pairs sit near it on greedy JSON;
                tools/spec_eval.py measures the real pair)
  spectiny    : speculative decoding with a random tiny-preset draft —
                near-zero content acceptance, the mechanism's FLOOR
                (grammar-forced positions still accept). K from
                VTX_DB_SPEC_K (default 6).

Reports per-variant wall seconds, steps/s, tok/s, and a bytes/step roofline
(weights + average valid KV prefix) so the HBM-bandwidth utilization is
explicit. Run on the real chip:

  PYTHONPATH=/root/repo:$PYTHONPATH python tools/decode_bench.py
Env: VTX_DB_PRESET (base), VTX_DB_QUANT (int8), VTX_DB_BATCH (16),
     VTX_DB_TOKENS (512), VTX_DB_VARIANTS (comma list)
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

PRESET = os.environ.get("VTX_DB_PRESET", "base")
QUANT = os.environ.get("VTX_DB_QUANT", "int8") or None
if QUANT in ("none", "0", ""):
    QUANT = None
BATCH = int(os.environ.get("VTX_DB_BATCH", "16"))
TOKENS = int(os.environ.get("VTX_DB_TOKENS", "512"))
VARIANTS = os.environ.get(
    "VTX_DB_VARIANTS", "full,nogrammar,noforce"
).split(",")

# Bandwidth denominator: the MEASURED chip copy peak (tools/roofline.py
# copy_bw_fused_gbps — dispatch-amortized; 478 GB/s on this part, below the
# v5e paper 820), overridable when benching on different hardware.
PEAK_HBM = float(os.environ.get("VTX_HBM_PEAK_GBPS", "478")) * 1e9


SPEC_K = int(os.environ.get("VTX_DB_SPEC_K", "6"))


def build_engine(
    max_forced_run: int,
    use_dfa: bool,
    spec: str | None = None,
    fuse: bool | None = None,
):
    import jax

    from video_transformer_tpu.analyzer.schema import note_dfa
    from video_transformer_tpu.models.config import get_preset
    from video_transformer_tpu.parallel.engine import InferenceEngine
    from video_transformer_tpu.parallel.mesh import build_mesh

    config = get_preset(PRESET)
    mesh = build_mesh({"data": len(jax.devices()), "model": 1})
    dfa = note_dfa(config.decoder.vocab_size, scale=0.5) if use_dfa else None
    engine = InferenceEngine(
        config,
        mesh=mesh,
        dfa=dfa,
        max_new_tokens=TOKENS,
        temperature=0.0,  # argmax: no sampling variance across runs
        structure_bias=0.0,
        max_forced_run=max_forced_run,
        seed=0,
        param_dtype="bfloat16",
        quantize=QUANT,
        fuse_projections=fuse,
    )
    if spec == "self":
        # Full acceptance ceiling: the draft serves the target's own
        # placed tree (no init, no second HBM copy).
        engine.attach_draft(config, spec_tokens=SPEC_K, share_target_params=True)
    elif spec == "tiny":
        from dataclasses import replace

        tiny = get_preset("tiny")
        tiny = replace(
            tiny,
            decoder=replace(
                tiny.decoder, vocab_size=config.decoder.vocab_size
            ),
        )
        engine.attach_draft(tiny, spec_tokens=SPEC_K)
    elif spec is not None:
        raise SystemExit(
            f"unknown spec variant suffix {spec!r} (use specself/spectiny)"
        )
    return engine


def weight_bytes(engine) -> int:
    """Bytes one decode step streams from HBM: the DECODER subtree only
    (int8 kernels + scales + bf16 norms/embeds). The vision encoder
    (0.41 GB at base) is resident but never read during decode — counting
    it (as this tool did through round 3) inflated hbm_bw_util ~2.1x;
    measured at base/int8 the true stream is 0.367 GB/step, so the
    weight-stream floor is ~1,300 steps/s, not ~613 (docs/roofline.md)."""
    import jax

    total = 0
    for collection in engine.params.values():
        if not isinstance(collection, dict):
            continue
        decoder = collection.get("decoder")
        if decoder is not None:
            total += sum(
                int(leaf.nbytes)
                for leaf in jax.tree_util.tree_leaves(decoder)
                if hasattr(leaf, "nbytes")
            )
    return total


def kv_bytes_per_step(engine, prompt_tokens: int, gen_mid: int) -> int:
    """Average bytes the paged decode attention streams per step: the valid
    prefix (prompt + half the generation) per layer, both K and V."""
    cfg = engine.config.decoder
    valid = prompt_tokens + gen_mid
    return 2 * cfg.num_layers * BATCH * cfg.num_kv_heads * valid * cfg.head_dim * 2


def run_variant(name: str) -> dict:
    import jax

    use_dfa = name != "nogrammar"
    spec = None
    if name.startswith("spec"):
        spec = name[4:] or "self"
    if name.startswith("force") and name[5:].isdigit():
        forced = int(name[5:])
    elif name in ("splitwrite", "xprog", "kvq", "fusedwrite"):
        forced = 2  # serving default width: comparable with force2 rows
    else:
        forced = 0 if name in ("nogrammar", "noforce") else 12
    # The ref_attn ablation flips the decode-attention dispatcher to the
    # XLA reference path; the env var is read at TRACE time (the engine
    # compiles lazily on the warmup call), so it must stay set for the
    # whole variant and be cleared after, or it would leak into later
    # variants.
    if name == "ref_attn":
        os.environ["VTX_FORCE_REF_ATTN"] = "1"
    if name == "splitwrite":
        os.environ["VTX_SPLIT_WRITE"] = "1"
    # Since the round-5 default flip, split-write + cross-program prefetch
    # IS the serving path: plain variants (full/forceN/...) measure it.
    # "fusedwrite" restores the old fused kernel; "splitwrite" disables
    # only the prefetch (isolating its contribution); "xprog" is kept as
    # an alias of the default for row continuity.
    if name == "fusedwrite":
        os.environ["VTX_FUSED_WRITE"] = "1"
    if name == "splitwrite":
        os.environ["VTX_NO_XPROG_PREFETCH"] = "1"
    if name == "kvq":
        # int8 KV cache on top of the default path: halves the measured
        # KV-length slope (stream_bench kv_fit), the dominant step term
        # at serving note lengths.
        os.environ["VTX_KV_QUANT"] = "int8"
    try:
        return _run_variant_body(name, forced, use_dfa, spec)
    finally:
        if name == "ref_attn":
            os.environ.pop("VTX_FORCE_REF_ATTN", None)
        if name in ("splitwrite", "xprog", "kvq", "fusedwrite"):
            os.environ.pop("VTX_FUSED_WRITE", None)
            os.environ.pop("VTX_NO_XPROG_PREFETCH", None)
            os.environ.pop("VTX_KV_QUANT", None)


def _run_variant_body(name: str, forced: int, use_dfa: bool, spec: str | None) -> dict:
    import jax

    # "fused"/"nofuse": force projection fusion (models/fuse.py) on/off
    # regardless of the engine default — measured NEUTRAL at base/int8 b16
    # (296.6 fused vs 301.0 unfused steps/s, 2026-08-20), so the default is
    # off; the variants keep the ablation reproducible.
    engine = build_engine(
        max_forced_run=forced, use_dfa=use_dfa, spec=spec,
        fuse={"fused": True, "nofuse": False}.get(name),
    )

    prompt = "请根据视频内容生成结构化笔记。" * 4
    prompts = [prompt] * BATCH

    # Warmup compiles the bucket.
    engine.generate_text(prompts)
    jax.effects_barrier()

    walls, tokens, steps = [], [], []
    for _ in range(3):
        engine.stats.__init__()
        start = time.perf_counter()
        engine.generate_text(prompts)
        walls.append(time.perf_counter() - start)
        tokens.append(engine.stats.tokens_generated)
        steps.append(engine.stats.decode_steps)
    wall = sorted(walls)[1]  # median of 3
    toks = tokens[walls.index(wall)]
    nsteps = steps[walls.index(wall)]

    # Each decode step streams the decoder weights once plus the valid KV
    # prefix; steps/s x bytes/step over the MEASURED copy peak is the
    # HBM-bandwidth utilization (docs/roofline.md).
    wb = weight_bytes(engine)
    kvb = kv_bytes_per_step(engine, 128, toks // BATCH // 2)
    steps_per_s = nsteps / wall if wall else 0.0
    return {
        "variant": name,
        "wall_s_median": round(wall, 3),
        "wall_s_all": [round(w, 3) for w in walls],
        "tokens": toks,
        "tok_per_s": round(toks / wall, 1),
        "decode_steps": nsteps,
        "steps_per_s": round(steps_per_s, 1),
        # Per-ROW tokens per loop iteration (rows run in lockstep):
        # grammar fast-forward advance, or (for spec variants) 1 + accepted
        # draft proposals per verify cycle.
        "tok_per_step_row": round(toks / (nsteps * BATCH), 2) if nsteps else 0.0,
        "weight_bytes": wb,
        "kv_bytes_per_step_est": kvb,
        "hbm_gb_per_s": round(steps_per_s * (wb + kvb) / 1e9, 1),
        "hbm_bw_util": round(steps_per_s * (wb + kvb) / PEAK_HBM, 3),
    }


def main() -> int:
    import jax

    backend = jax.default_backend()
    out = {"backend": backend, "preset": PRESET, "quant": QUANT,
           "batch": BATCH, "tokens_budget": TOKENS, "spec_k": SPEC_K,
           "variants": []}
    for name in VARIANTS:
        result = run_variant(name.strip())
        out["variants"].append(result)
        print(json.dumps(result), flush=True)
    print(json.dumps(out))
    # Persist for the official bench: bench.py folds recent rows into its
    # extras so the driver-captured BENCH artifact carries the ablation
    # table (round-3 verdict asked for exactly this).
    out["unix_time"] = int(time.time())
    runs_path = Path(__file__).resolve().parent.parent / "data/output/decode_bench_runs.jsonl"
    runs_path.parent.mkdir(parents=True, exist_ok=True)
    with runs_path.open("a") as fh:
        fh.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
