#!/usr/bin/env python3
"""Isolate where a decode step's ~5 ms goes (see tools/decode_bench.py).

Times each ingredient as its own donated jitted program at the bench's real
shapes (base/int8, batch 16):

  step_w13 / step_w1 : model.decode_block_pick at block width 13 / 1
  step_w1_ref        : width 1 with the XLA reference attention
  step_w1_bf16       : width 1, unquantized bf16 weights
  cache_update       : just the 24-layer k/v row writes (no attention/mlp)
  attn_only          : the paged decode attention kernel alone, 24 layers
  matmul_proxy       : x @ W for every decoder dense (pure weight-stream)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/decode_profile.py
Env: VTX_DP_PRESET, VTX_DP_QUANT, VTX_DP_BATCH, VTX_DP_CACHE (cache len)
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np

PRESET = os.environ.get("VTX_DP_PRESET", "base")
QUANT = os.environ.get("VTX_DP_QUANT", "int8") or None
if QUANT in ("none", "0", ""):
    QUANT = None
BATCH = int(os.environ.get("VTX_DP_BATCH", "16"))
CACHE_LEN = int(os.environ.get("VTX_DP_CACHE", "768"))


def timeit(fn, *args, iters=20):
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
    from video_transformer_tpu.models.vlm import VideoLM
    from video_transformer_tpu.models.quant import quantize_decoder_int8

    config = get_preset(PRESET)
    cfg = config.decoder
    model = VideoLM(config)
    rng = jax.random.PRNGKey(0)
    params = model.init_variables(rng, batch=1)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    params_q = quantize_decoder_int8(params) if QUANT == "int8" else params

    cache = init_kv_cache(cfg, BATCH, CACHE_LEN, jnp.bfloat16)
    cache = dict(cache, index=jnp.full((BATCH,), 200, jnp.int32))

    results = {}

    def step(p, block, c, pick):
        return model.apply(p, block, c, pick, method=VideoLM.decode_block_pick)

    pick0 = jnp.zeros((BATCH,), jnp.int32)
    for name, width, p in (
        ("step_w13", 13, params_q),
        ("step_w1", 1, params_q),
        ("step_w1_bf16", 1, params),
    ):
        block = jnp.zeros((BATCH, width), jnp.int32)
        # A donated program would need a fresh cache per call; time the
        # non-donated compile (same kernel sequence, one extra copy).
        f_nd = jax.jit(step)
        results[name] = timeit(lambda b=block, pp=p: f_nd(pp, b, cache, pick0))

    os.environ["VTX_FORCE_REF_ATTN"] = "1"
    block1 = jnp.zeros((BATCH, 1), jnp.int32)
    f_ref = jax.jit(step)
    results["step_w1_ref"] = timeit(lambda: f_ref(params_q, block1, cache, pick0))
    del os.environ["VTX_FORCE_REF_ATTN"]

    # cache update alone: 24 layers x 2 tensors of per-row DUS
    from video_transformer_tpu.ops.decode_attention import update_cache_rows

    def cache_update(c, new):
        k = [update_cache_rows(layer, new, c["index"]) for layer in c["k"]]
        v = [update_cache_rows(layer, new, c["index"]) for layer in c["v"]]
        return dict(c, k=k, v=v)

    new_kv = jnp.zeros((BATCH, cfg.num_kv_heads, 1, cfg.head_dim), jnp.bfloat16)
    f_cu = jax.jit(cache_update)
    results["cache_update"] = timeit(lambda: f_cu(cache, new_kv))

    # attention alone, 24 layers sequential
    from video_transformer_tpu.ops.decode_attention import decode_attention

    q1 = jnp.zeros((BATCH, cfg.num_heads, 1, cfg.head_dim), jnp.bfloat16)
    lengths = jnp.full((BATCH,), 200, jnp.int32)

    def attn_layers(q, kc, vc, n):
        out = q
        for _ in range(cfg.num_layers):
            out = decode_attention(out, kc, vc, n)
        return out

    f_at = jax.jit(attn_layers)
    results["attn_only_24L"] = timeit(lambda: f_at(q1, cache["k"][0], cache["v"][0], lengths))

    # pure weight-stream proxy: every decoder dense as one matmul chain
    h, m = cfg.hidden_dim, cfg.mlp_dim
    dims = []
    for _ in range(cfg.num_layers):
        dims += [
            (h, cfg.num_heads * cfg.head_dim),
            (h, cfg.num_kv_heads * cfg.head_dim),
            (h, cfg.num_kv_heads * cfg.head_dim),
            (cfg.num_heads * cfg.head_dim, h),
            (h, m), (h, m), (m, h),
        ]
    keys = jax.random.split(jax.random.PRNGKey(1), len(dims))
    dtype = jnp.int8 if QUANT == "int8" else jnp.bfloat16
    ws = [
        (jax.random.normal(k, d, jnp.bfloat16) * 0.02).astype(dtype)
        for k, d in zip(keys, dims)
    ]
    wbytes = sum(w.nbytes for w in ws)

    def proxy(x, ws):
        acc = jnp.zeros((BATCH, 1), jnp.bfloat16)
        for w in ws:
            y = x[:, : w.shape[0]] @ w.astype(jnp.bfloat16)
            acc = acc + y[:, :1]
        return acc

    x = jnp.zeros((BATCH, max(h, m)), jnp.bfloat16)
    f_px = jax.jit(proxy)
    results["matmul_proxy"] = timeit(lambda: f_px(x, ws))
    results["matmul_proxy_gbps"] = wbytes / results["matmul_proxy"] / 1e9

    out = {
        "backend": jax.default_backend(),
        "preset": PRESET,
        "quant": QUANT,
        "batch": BATCH,
        "cache_len": CACHE_LEN,
        **{k: (round(v * 1e3, 3) if "gbps" not in k else round(v, 1))
           for k, v in results.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
