#!/usr/bin/env python3
"""Decode-step component probes: WHERE does the serving step's time go?

The round-4 serving numbers plateaued at ~7.1k tok/s while estimated HBM
traffic sat under 20% of the fused copy peak, and the round-4 verdict asks
for either >8k captured or a MEASURED proof of the ceiling. The decode
ablations (tools/decode_bench.py) vary one serving ingredient at a time
but never decompose a single step. This tool does, with two probes:

1. weights-only chain (`weights`): the decoder's int8 dense matmuls —
   exactly the kernels+scales one decode step streams — applied back to
   back inside one fori_loop, no attention/KV/grammar/sampling, at several
   row counts M (= batch x forced-block width in serving terms). The
   steps/s here is the hard ceiling any decode loop built from these
   matmuls can reach, and GB/s vs the fused copy peak shows how much of
   the plateau is the narrow-M matmul weight stream itself.

2. KV-length sweep (`kv`): the REAL serving decode (grammar + force2 +
   sampling) at fixed batch and token budget, with prompt length swept
   128 -> ~1k tokens. The per-step slope d(step_time)/d(L) x 1/B isolates
   the paged-attention KV prefix stream; combined with probe 1 this fits
     step_time(B, L) ~= fixed + weights(M) + kv_coef * B * L
   and the fit says which component must shrink for >8k tok/s (e.g.
   whether an int8-KV cache kernel would pay).

  PYTHONPATH=/root/repo python tools/stream_bench.py
Env: VTX_SB_PRESET (base), VTX_SB_QUANT (int8), VTX_SB_PROBES
     (weights,kv), VTX_SB_ROWS (16,48,128,384), VTX_SB_BATCHES (16,128),
     VTX_SB_TOKENS (256). Appends one JSON line per probe to stdout and
     the combined record to data/output/stream_bench_runs.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

PRESET = os.environ.get("VTX_SB_PRESET", "base")
QUANT = os.environ.get("VTX_SB_QUANT", "int8") or None
PROBES = os.environ.get("VTX_SB_PROBES", "weights,kv").split(",")
ROWS = [
    int(r)
    for r in os.environ.get("VTX_SB_ROWS", "16,48,128,384,640,1664").split(",")
]
BATCHES = [int(b) for b in os.environ.get("VTX_SB_BATCHES", "16,128").split(",")]
TOKENS = int(os.environ.get("VTX_SB_TOKENS", "256"))
PEAK_HBM = float(os.environ.get("VTX_HBM_PEAK_GBPS", "478")) * 1e9

_PHRASE = "请根据视频内容生成结构化要点笔记，覆盖全部章节。"


def _dense_mats(engine) -> list[tuple]:
    """(kernel, scale) for every quantized decoder dense, forward order."""
    import jax

    params = engine.params["params"]["decoder"]
    quant = engine.params["quant"]["decoder"]
    mats = []
    n_layers = engine.config.decoder.num_layers
    for i in range(n_layers):
        lp, lq = params[f"layer_{i}"], quant[f"layer_{i}"]
        for group, names in (("attn", ("q", "k", "v", "out")),
                             ("mlp", ("gate", "up", "down"))):
            for name in names:
                mats.append((lp[group][name]["kernel"], lq[group][name]["scale"]))
    return mats


def probe_weights(engine, rows: list[int], inner_steps: int = 64) -> list[dict]:
    import jax
    import jax.numpy as jnp

    mats = _dense_mats(engine)
    stream_bytes = sum(int(k.nbytes) + int(s.nbytes) for k, s in mats)

    # mats/xs are ARGUMENTS of the jitted chain, never captured constants:
    # closure capture would embed the 0.4 GB weight tree into the
    # serialized program and blow the remote compiler's request limit
    # (observed: HTTP 413 through the axon tunnel).
    @functools.partial(jax.jit, static_argnames=("steps",))
    def chain(xs, kernels, scales, steps):
        def body(_, acc):
            # acc feeds each input so XLA cannot hoist the matmuls out of
            # the loop as loop-invariant; the perturbation is numerically
            # invisible (acc ~ O(1e5), eps 1e-20).
            eps = (acc * 1e-20).astype(jnp.bfloat16)
            total = jnp.float32(0)
            for x, k, s in zip(xs, kernels, scales):
                y = (x + eps) @ k.astype(jnp.bfloat16)
                total += jnp.sum(y.astype(jnp.float32) * s[None, :])
            return total

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    kernels = [k for k, _ in mats]
    scales = [s for _, s in mats]
    results = []
    for m in rows:
        xs = [
            jnp.ones((m, int(k.shape[0])), jnp.bfloat16) for k, _ in mats
        ]
        float(chain(xs, kernels, scales, inner_steps))  # compile + warm
        walls = []
        for _ in range(3):
            start = time.perf_counter()
            float(chain(xs, kernels, scales, inner_steps))
            walls.append(time.perf_counter() - start)
        wall = sorted(walls)[1]
        step = wall / inner_steps
        results.append({
            "rows": m,
            "ms_per_step": round(step * 1e3, 3),
            "steps_per_s": round(1 / step, 1),
            "stream_gb": round(stream_bytes / 1e9, 3),
            "gb_per_s": round(stream_bytes / step / 1e9, 1),
            "util_of_fused_peak": round(stream_bytes / step / PEAK_HBM, 3),
        })
        print(json.dumps({"probe": "weights", **results[-1]}), flush=True)
    return results


def probe_kv(engine, batch: int, prompt_mults: list[int]) -> list[dict]:
    """Real serving decode at several prompt lengths; slope isolates the
    KV prefix stream. Token budget fixed, argmax sampling."""
    results = []
    for mult in prompt_mults:
        prompt = _PHRASE * mult
        prompts = [prompt] * batch
        engine.generate_text(prompts)  # compile + warm this bucket
        walls, steps = [], []
        for _ in range(3):
            engine.stats.__init__()
            start = time.perf_counter()
            engine.generate_text(prompts)
            walls.append(time.perf_counter() - start)
            steps.append(engine.stats.decode_steps)
        wall = sorted(walls)[1]
        nsteps = steps[walls.index(wall)]
        prompt_tokens = len(prompt.encode("utf-8")) + 2
        results.append({
            "batch": batch,
            "prompt_tokens_approx": prompt_tokens,
            "decode_steps": int(nsteps),
            "ms_per_step": round(wall / max(nsteps, 1) * 1e3, 3),
            "steps_per_s": round(nsteps / wall, 1),
            "tok_per_s": round(
                engine.stats.tokens_generated / wall, 1
            ),
        })
        print(json.dumps({"probe": "kv", **results[-1]}), flush=True)
    return results


def main() -> int:
    import jax

    sys.path.insert(0, str(REPO / "tools"))
    from decode_bench import build_engine, weight_bytes

    os.environ.setdefault("VTX_DB_PRESET", PRESET)

    record: dict = {
        "preset": PRESET,
        "quant": QUANT,
        "backend": jax.default_backend(),
        "unix_time": int(time.time()),
    }

    # Serving-true engine: grammar + force2 (the shipped default) + argmax.
    import decode_bench as db

    db.PRESET, db.QUANT, db.TOKENS = PRESET, QUANT, TOKENS
    engine = build_engine(max_forced_run=2, use_dfa=True)
    record["decoder_stream_gb"] = round(weight_bytes(engine) / 1e9, 3)

    if "weights" in PROBES:
        record["weights"] = probe_weights(engine, ROWS)
    if "kv" in PROBES:
        record["kv"] = {}
        for b in BATCHES:
            # Long prompts at wide batch blow the KV cache budget (bf16
            # cache bytes = 2 x layers x B x Hkv x S x D x 2; b128 at a
            # 1.9k bucket is ~12 GB on a 16 GB part) — cap the sweep.
            mults = [1, 4, 12, 24] if b <= 32 else [1, 4, 8, 12]
            record["kv"][str(b)] = probe_kv(engine, b, mults)

    # Component fit: step_ms(B, L) ~= a_B + kv_ms_per_token_row * L.
    if "kv" in record and record["kv"]:
        fit = {}
        for b, rows in record["kv"].items():
            ls = np.array([r["prompt_tokens_approx"] for r in rows], float)
            ts = np.array([r["ms_per_step"] for r in rows], float)
            slope, intercept = np.polyfit(ls, ts, 1)
            fit[b] = {
                "ms_per_step_at_L0": round(float(intercept), 3),
                "us_per_prompt_token": round(float(slope) * 1e3, 3),
                "kv_share_at_L1000": round(
                    float(slope * 1000 / (intercept + slope * 1000)), 3
                ),
            }
        record["kv_fit"] = fit
        print(json.dumps({"probe": "kv_fit", **fit}), flush=True)

    out = REPO / "data/output/stream_bench_runs.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("a") as f:
        f.write(json.dumps(record) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
