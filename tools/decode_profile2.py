#!/usr/bin/env python3
"""Second-stage decode profiling: loop mechanics vs engine program.

  loop64      : bare fori_loop of 64 decode_block_pick steps, cache carried
  loop64_rng  : same + rng split/argmax sample each iter (engine's sample)
  engine_gen  : the engine's compiled no-grammar generate program, called
                directly with device-resident inputs (512-step budget)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/decode_profile2.py
"""

from __future__ import annotations

import json
import os
import time

PRESET = os.environ.get("VTX_DP_PRESET", "base")
QUANT = os.environ.get("VTX_DP_QUANT", "int8") or None
BATCH = int(os.environ.get("VTX_DP_BATCH", "16"))
CACHE_LEN = int(os.environ.get("VTX_DP_CACHE", "768"))
ITERS = 64


def timeit(fn, *args, iters=8):
    # block_until_ready is unreliable through the axon tunnel — force a
    # real device->host fetch of one output leaf as the sync point.
    import jax
    import numpy as _np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _np.asarray(leaf)

    sync(fn(*args))
    start = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - start) / iters


def main() -> int:
    import jax
    import jax.numpy as jnp

    from video_transformer_tpu.models.config import get_preset
    from video_transformer_tpu.models.lm import init_kv_cache
    from video_transformer_tpu.models.quant import quantize_decoder_int8
    from video_transformer_tpu.models.vlm import VideoLM

    config = get_preset(PRESET)
    cfg = config.decoder
    model = VideoLM(config)
    params = model.init_variables(jax.random.PRNGKey(0), batch=1)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    if QUANT == "int8":
        params = quantize_decoder_int8(params)

    cache0 = init_kv_cache(cfg, BATCH, CACHE_LEN, jnp.bfloat16)
    cache0 = dict(cache0, index=jnp.full((BATCH,), 200, jnp.int32))
    results = {}

    def loop(p, c, tok0):
        def body(_, carry):
            tok, c = carry
            logits, c = model.apply(
                p, tok[:, None], c, jnp.zeros((BATCH,), jnp.int32),
                method=VideoLM.decode_block_pick,
            )
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return tok, c

        tok, c = jax.lax.fori_loop(0, ITERS, body, (tok0, c))
        return tok, c["index"]

    tok0 = jnp.zeros((BATCH,), jnp.int32)
    f = jax.jit(loop)
    t = timeit(lambda: f(params, cache0, tok0))
    results["loop64_ms_per_iter"] = round(t / ITERS * 1e3, 3)

    def loop_rng(p, c, tok0, rng):
        def body(_, carry):
            tok, c, rng = carry
            logits, c = model.apply(
                p, tok[:, None], c, jnp.zeros((BATCH,), jnp.int32),
                method=VideoLM.decode_block_pick,
            )
            rng, key = jax.random.split(rng)
            tok = jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
            return tok, c, rng

        tok, c, _ = jax.lax.fori_loop(0, ITERS, body, (tok0, c, rng))
        return tok, c["index"]

    f2 = jax.jit(loop_rng)
    t2 = timeit(lambda: f2(params, cache0, tok0, jax.random.PRNGKey(1)))
    results["loop64_rng_ms_per_iter"] = round(t2 / ITERS * 1e3, 3)

    # Engine program, no grammar, called straight at the compiled boundary.
    from video_transformer_tpu.parallel.engine import InferenceEngine
    from video_transformer_tpu.parallel.mesh import build_mesh

    mesh = build_mesh({"data": len(jax.devices()), "model": 1})
    engine = InferenceEngine(
        config, mesh=mesh, dfa=None, max_new_tokens=512, temperature=0.0,
        structure_bias=0.0, max_forced_run=0, seed=0,
        param_dtype="bfloat16", quantize=QUANT,
    )
    gen = engine._get_generate(BATCH, 128, False, None)
    import numpy as np

    prompt = np.zeros((BATCH, 128), np.int32)
    lengths = np.full((BATCH,), 128, np.int32)
    active = np.ones((BATCH,), bool)
    state = np.zeros((BATCH,), np.int32)
    rng = jax.random.PRNGKey(0)
    t3 = timeit(lambda: gen(engine.params, prompt, lengths, active, state, rng),
                iters=3)
    results["engine_gen_512_s"] = round(t3, 3)
    results["engine_gen_ms_per_iter"] = round(t3 / 512 * 1e3, 3)

    print(json.dumps({"backend": jax.default_backend(), **results}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
