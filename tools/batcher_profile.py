#!/usr/bin/env python3
"""Where do the ContinuousBatcher's seconds go on the bench sweep?

bench_on measured 29.8 s vs bench_off's 2.04 s on the same 10-segment
sweep (round 3). This tool reproduces the ON path in isolation and times
every device dispatch class separately:

  build      : engine + batcher construction (compiles prefill/enqueue/chunk)
  warmup     : one throwaway request end-to-end (first-compile isolation)
  stage      : batched preprocess + enqueue-prefill dispatches
  chunk      : decode_refill program walls (per-call list)
  steps      : executed while_loop iterations per chunk (from status row)
  engine_ref : the SAME 10 requests through engine.generate (run-to-
               completion baseline, one batch)

Run on the real chip:
  PYTHONPATH=/root/repo python tools/batcher_profile.py
Env: VTX_BP_PRESET (base), VTX_BP_QUANT (int8), VTX_BP_REQUESTS (10),
     VTX_BP_SLOTS (8)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

PRESET = os.environ.get("VTX_BP_PRESET", "base")
QUANT = os.environ.get("VTX_BP_QUANT", "int8") or None
N_REQ = int(os.environ.get("VTX_BP_REQUESTS", "10"))
SLOTS = int(os.environ.get("VTX_BP_SLOTS", "8"))
# Diagnostics: VTX_BP_DEVICE_REFILL=0 drives the host-refill loop (its
# chunk program has NO lax.cond — isolates the refill-cond tax);
# VTX_BP_CHUNK_STEPS sizes host-mode chunks (set >= max_new so ONE chunk
# decodes the wave and ms_per_step is clean of dispatch latency).
DEVICE_REFILL = os.environ.get("VTX_BP_DEVICE_REFILL", "1") not in ("0", "")
CHUNK_STEPS = int(os.environ.get("VTX_BP_CHUNK_STEPS", "64"))
PROMPT = "请分析这段讲座视频，生成结构化笔记。"


def main() -> int:
    import jax
    import jax.numpy as jnp

    from video_transformer_tpu.analyzer.schema import note_dfa
    from video_transformer_tpu.models.config import get_preset
    from video_transformer_tpu.parallel.engine import InferenceEngine
    from video_transformer_tpu.parallel.mesh import build_mesh
    from video_transformer_tpu.parallel.serving import (
        ContinuousBatcher,
        Request,
    )

    out: dict = {"backend": jax.default_backend(), "preset": PRESET,
                 "quant": QUANT, "requests": N_REQ, "slots": SLOTS}

    t0 = time.perf_counter()
    config = get_preset(PRESET)
    mesh = build_mesh({"data": len(jax.devices()), "model": 1})
    engine = InferenceEngine(
        config,
        mesh=mesh,
        dfa=note_dfa(config.decoder.vocab_size, scale=0.5),
        max_new_tokens=2048,
        temperature=1.0,
        structure_bias=2.5,
        seed=0,
        param_dtype="bfloat16",
        quantize=QUANT,
    )
    enc = config.encoder
    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 255, (N_REQ, enc.num_frames, enc.image_size, enc.image_size, 3),
        dtype=np.uint8,
    )
    batcher = ContinuousBatcher(
        engine, slots=SLOTS, prompt_len=256,
        device_refill=DEVICE_REFILL, chunk_steps=CHUNK_STEPS,
    )
    out["device_refill"] = DEVICE_REFILL
    out["chunk_steps_cfg"] = CHUNK_STEPS
    out["build_s"] = round(time.perf_counter() - t0, 2)

    cfg = config
    park_row_mb = (
        cfg.decoder.num_kv_heads * batcher.park_len * cfg.decoder.head_dim
        * 2 * cfg.decoder.num_layers * 2 / 1e6
    )
    pool_row_mb = (
        cfg.decoder.num_kv_heads * batcher.cache_len * cfg.decoder.head_dim
        * 2 * cfg.decoder.num_layers * 2 / 1e6
    )
    out["geometry"] = {
        "layers": cfg.decoder.num_layers,
        "kv_heads": cfg.decoder.num_kv_heads,
        "head_dim": cfg.decoder.head_dim,
        "park_len": batcher.park_len,
        "cache_len": batcher.cache_len,
        "queue_depth": batcher.queue_depth,
        "park_row_mb": round(park_row_mb, 1),
        "pool_row_mb": round(pool_row_mb, 1),
    }

    # Instrument stage + chunk dispatches.
    stage_walls: list[float] = []
    preproc_walls: list[float] = []
    enqueue_walls: list[float] = []
    chunk_walls: list[float] = []
    chunk_steps: list[int] = []
    orig_stage = batcher._stage
    orig_chunk = batcher._decode_refill if DEVICE_REFILL else batcher._decode
    orig_pre = engine.preprocess
    def timed_pre(frames):
        t = time.perf_counter()
        out_p = orig_pre(frames)
        jax.block_until_ready(out_p)
        preproc_walls.append(time.perf_counter() - t)
        return out_p

    def wrap_enq(orig_enq):
        def timed_enq(*args):
            t = time.perf_counter()
            outs = orig_enq(*args)
            jax.block_until_ready(outs[-1])
            enqueue_walls.append(time.perf_counter() - t)
            return outs

        return timed_enq

    engine.preprocess = timed_pre
    if DEVICE_REFILL:
        # Stage programs are built lazily per lane bucket; wrap at build.
        orig_build = batcher._build_enqueue
        batcher._build_enqueue = lambda lanes: wrap_enq(orig_build(lanes))

    def timed_stage():
        t = time.perf_counter()
        orig_stage()
        jax.block_until_ready(batcher._q_tail)
        stage_walls.append(time.perf_counter() - t)

    def timed_chunk(*args):
        t = time.perf_counter()
        outs = orig_chunk(*args)
        jax.block_until_ready(outs[-1])
        chunk_walls.append(time.perf_counter() - t)
        chunk_steps.append(int(np.asarray(outs[-1])[4 if DEVICE_REFILL else 3, 0]))
        return outs

    batcher._stage = timed_stage
    if DEVICE_REFILL:
        batcher._decode_refill = timed_chunk
    else:
        batcher._decode = timed_chunk

    # Warmup: compile every program once (one request through the pool).
    t0 = time.perf_counter()
    batcher.submit(Request(999, frames[0], PROMPT))
    batcher.run()
    out["warmup_s"] = round(time.perf_counter() - t0, 2)
    stage_walls.clear()
    preproc_walls.clear()
    enqueue_walls.clear()
    chunk_walls.clear()
    chunk_steps.clear()

    # The measured sweep: N requests, one drain.
    t0 = time.perf_counter()
    for i in range(N_REQ):
        batcher.submit(Request(i, frames[i], PROMPT))
    completions = batcher.run()
    wall = time.perf_counter() - t0
    out["sweep_wall_s"] = round(wall, 2)
    out["completions"] = len(completions)
    out["complete"] = sum(c.complete for c in completions)
    out["tokens"] = int(sum(c.tokens for c in completions))
    out["stage_walls_s"] = [round(w, 3) for w in stage_walls]
    out["preproc_walls_s"] = [round(w, 3) for w in preproc_walls]
    out["enqueue_walls_s"] = [round(w, 3) for w in enqueue_walls]
    out["chunk_walls_s"] = [round(w, 3) for w in chunk_walls]
    out["chunk_steps"] = chunk_steps
    other = wall - sum(stage_walls) - sum(chunk_walls)
    out["host_other_s"] = round(other, 3)
    if sum(chunk_steps):
        out["ms_per_step"] = round(
            sum(chunk_walls) / sum(chunk_steps) * 1e3, 3
        )

    # Reference: same requests, run-to-completion engine batch (first call
    # compiles, second is the measured steady state).
    engine.generate(frames, [PROMPT] * N_REQ, return_status=True)
    t0 = time.perf_counter()
    steps0 = engine.stats.decode_steps
    texts, status = engine.generate(
        frames, [PROMPT] * N_REQ, return_status=True
    )
    out["engine_ref_wall_s"] = round(time.perf_counter() - t0, 2)
    out["engine_ref_steps"] = engine.stats.decode_steps - steps0
    out["engine_ref_complete"] = int(sum(status))

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
