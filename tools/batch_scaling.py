#!/usr/bin/env python3
"""In-loop decode step time vs batch and weight dtype (base preset).

If the step is weight-streaming/overhead bound, time is flat in batch and
aggregate tok/s scales linearly — the cheapest throughput lever there is.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/batch_scaling.py
"""

from __future__ import annotations

import json
import os
import time

CACHE_LEN = int(os.environ.get("VTX_BS_CACHE", "768"))
ITERS = 32


def timeit(fn, *args, iters=6):
    import jax
    import numpy as np

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

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

    config = get_preset(os.environ.get("VTX_BS_PRESET", "base"))
    cfg = config.decoder
    model = VideoLM(config)
    params = model.init_variables(jax.random.PRNGKey(0), batch=1)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    params_q = quantize_decoder_int8(params)

    out = {"backend": jax.default_backend(), "rows": []}
    for batch in (8, 16, 32, 64, 128):
        cache0 = init_kv_cache(cfg, batch, CACHE_LEN, jnp.bfloat16)
        cache0 = dict(cache0, index=jnp.full((batch,), 200, jnp.int32))
        tok0 = jnp.zeros((batch,), jnp.int32)

        def loop(p, c, tok0, batch=batch):
            def body(_, carry):
                tok, c = carry
                logits, c = model.apply(
                    p, tok[:, None], c, jnp.zeros((batch,), jnp.int32),
                    method=VideoLM.decode_block_pick,
                )
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return tok, c

            tok, c = jax.lax.fori_loop(0, ITERS, body, (tok0, c))
            return tok, c["index"]

        f = jax.jit(loop)
        for qname, p in (("int8", params_q), ("bf16", params)):
            t = timeit(f, p, cache0, tok0)
            ms = t / ITERS * 1e3
            out["rows"].append({
                "batch": batch, "quant": qname,
                "ms_per_step": round(ms, 3),
                "agg_tok_s_at_adv1": round(batch / (ms / 1e3), 0),
            })
            print(json.dumps(out["rows"][-1]), flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
