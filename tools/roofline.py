#!/usr/bin/env python3
"""Measure this chip's ACTUAL peak HBM bandwidth and matmul throughput.

The public v5e spec (820 GB/s, 197 bf16 TFLOP/s) is the wrong denominator if
the attached chip is a different part or is virtualized — every decode
roofline claim depends on these two numbers, so measure them:

  copy_bw     : y = x * 1.0001 over a 512 MB array (read+write counted)
  reduce_bw   : sum(x) over 512 MB (read-only traffic)
  matmul_tf   : 4096^3 bf16 matmul TFLOP/s (MXU peak proxy)
  matmul16_gbps : [16,K]@[K,N] weight-streaming proxy at decode batch
  op_overhead : per-op cost of a 256-op chain of trivial [16,1024] adds

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/roofline.py
"""

from __future__ import annotations

import json
import time


def timeit(fn, *args, iters=10):
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

    results = {"backend": jax.default_backend()}

    n = 256 * 1024 * 1024 // 4  # 256 MB of f32
    x = jnp.ones((n,), jnp.float32)

    f_copy = jax.jit(lambda x: x * 1.0001)
    t = timeit(f_copy, x)
    results["copy_bw_gbps"] = round(2 * x.nbytes / t / 1e9, 1)

    # One pass per dispatch under-measures badly through the axon tunnel
    # (per-call latency ~ the pass itself: round 3 saw 139 GB/s here while
    # the real decode step sustained 278). Chain R passes inside ONE
    # program, with optimization_barrier between them so XLA cannot fuse
    # the chain into a single read+write loop.
    R = 8

    def chain_copy(x):
        for _ in range(R):
            x = jax.lax.optimization_barrier(x * 1.0001)
        return x

    t = timeit(jax.jit(chain_copy), x)
    results["copy_bw_fused_gbps"] = round(2 * R * x.nbytes / t / 1e9, 1)

    f_red = jax.jit(lambda x: jnp.sum(x))
    t = timeit(f_red, x)
    results["reduce_bw_gbps"] = round(x.nbytes / t / 1e9, 1)

    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    b = jnp.ones((m, m), jnp.bfloat16)
    f_mm = jax.jit(lambda a, b: a @ b)
    t = timeit(f_mm, a, b)
    results["matmul_tflops"] = round(2 * m**3 / t / 1e12, 1)

    # Weight-streaming at decode batch: one [16, 8192] @ [8192, 8192] (128MB
    # bf16 weight) — is a skinny matmul bandwidth-bound or overhead-bound?
    k = 8192
    w = jnp.ones((k, k), jnp.bfloat16)
    xa = jnp.ones((16, k), jnp.bfloat16)
    f_skinny = jax.jit(lambda x, w: x @ w)
    t = timeit(f_skinny, xa, w)
    results["matmul16_gbps"] = round(w.nbytes / t / 1e9, 1)
    wq = jnp.ones((k, k), jnp.int8)
    f_skq = jax.jit(lambda x, w: x @ w.astype(jnp.bfloat16))
    t = timeit(f_skq, xa, wq)
    results["matmul16_int8_gbps"] = round(wq.nbytes / t / 1e9, 1)

    # Weight-streaming with dispatch amortized: R distinct weights consumed
    # by one program (each matmul must read its own 64 MB int8 kernel; the
    # barrier keeps XLA from batching them into one pass).
    ws = [jnp.full((k, k), i + 1, jnp.int8) for i in range(R)]

    def chain_mm(x, ws):
        acc = jnp.zeros((x.shape[0], k), jnp.float32)
        for w in ws:
            acc = jax.lax.optimization_barrier(
                acc + x @ w.astype(jnp.bfloat16)
            )
        return acc

    t = timeit(jax.jit(chain_mm), xa, ws)
    results["matmul16_int8_fused_gbps"] = round(
        R * wq.nbytes / t / 1e9, 1
    )

    y = jnp.ones((16, 1024), jnp.float32)

    def chain(y):
        for i in range(256):
            y = y + 1.0
            y = y * 0.999
        return y

    f_chain = jax.jit(chain)
    t = timeit(f_chain, y)
    results["op_overhead_us"] = round(t / 512 * 1e6, 2)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
