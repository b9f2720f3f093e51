"""Pallas flash-attention backward: O(S) memory training gradients.

The forward saves only (O, LSE); the backward recomputes attention
probabilities blockwise — the FlashAttention-2 recipe:

    P  = exp(QK^T * scale - LSE)
    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - D) * scale,   D = rowsum(dO * O)
    dQ = dS K ,  dK = dS^T Q

Three kernels: a forward that additionally emits LSE, a dQ kernel (grid over
query blocks) and a dK/dV kernel (grid over key blocks, per q-head partials
summed over the GQA group in XLA). Causal block skipping applies on both
sides of the triangle. attention.py dispatches here for training shapes with
>=128-aligned blocks and falls back to the recompute-via-reference VJP
otherwise.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_fwd_lse", "flash_bwd", "supports_pallas_bwd"]

_NEG_INF = -1e30


def _block(s: int) -> int | None:
    for candidate in (512, 256, 128):
        if s % candidate == 0:
            return candidate
    return None


def supports_pallas_bwd(s_q: int, s_k: int) -> bool:
    # These kernels compute causal positions without an Sk - Sq offset, so
    # KV-prefix queries (Sq != Sk) must use the reference VJP.
    return s_q == s_k and _block(s_q) is not None and _block(s_k) is not None


# ---------------------------------------------------------------------------
# Forward with LSE
# ---------------------------------------------------------------------------


def _fwd_lse_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    *, block_q: int, block_k: int, causal: bool, scale: float,
):
    q_block_idx = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    s_k = k_ref.shape[2]
    num_k_blocks = s_k // block_k
    d = q.shape[-1]

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_prev = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l_prev = jnp.zeros((block_q, 1), jnp.float32)
    q_pos = q_block_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            logits = jnp.where(k_pos <= q_pos, logits, _NEG_INF)
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    if causal:
        upper = jnp.minimum(
            ((q_block_idx + 1) * block_q + block_k - 1) // block_k, num_k_blocks
        )
    else:
        upper = num_k_blocks
    acc, m_final, l_final = jax.lax.fori_loop(0, upper, body, (acc, m_prev, l_prev))

    safe_l = jnp.maximum(l_final, 1e-30)
    o_ref[0, 0] = (acc / safe_l).astype(o_ref.dtype)
    lse_ref[0, 0] = m_final + jnp.log(safe_l)  # [block_q, 1]


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def flash_fwd_lse(q, k, v, causal: bool = True, interpret: bool = False):
    """Forward returning (O, LSE [B, Hq, S_q, 1] fp32).

    LSE carries a trailing singleton so its Pallas blocks are
    (block_q, 1) in the last two dims — divisible-by-8 x full-dim, which
    the TPU lowering requires (a bare [B, H, S] layout with (1, block_q)
    blocks is rejected whenever H > 1).
    """
    b, hq, s_q, d = q.shape
    hkv, s_k = k.shape[1], k.shape[2]
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    block_q, block_k = _block(s_q), _block(s_k)
    assert block_q is not None and block_k is not None

    kernel = functools.partial(
        _fwd_lse_kernel, block_q=block_q, block_k=block_k, causal=causal,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, hq, s_q, 1), jnp.float32),
        ),
        grid=(b, hq, s_q // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_k, d),
                         lambda bi, hi, qi, g=group: (bi, hi // g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s_k, d),
                         lambda bi, hi, qi, g=group: (bi, hi // g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


# ---------------------------------------------------------------------------
# Backward: dQ
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dq_ref,
    *, block_q: int, block_k: int, causal: bool, scale: float,
):
    q_block_idx = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0]  # [bq, 1]
    dsum = dsum_ref[0, 0]
    s_k = k_ref.shape[2]
    num_k_blocks = s_k // block_k
    d = q.shape[-1]

    q_pos = q_block_idx * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0
    )

    def body(kb, dq):
        k_blk = k_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        logits = (
            jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        )
        if causal:
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            logits = jnp.where(k_pos <= q_pos, logits, _NEG_INF)
        p = jnp.exp(logits - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum) * scale
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    if causal:
        upper = jnp.minimum(
            ((q_block_idx + 1) * block_q + block_k - 1) // block_k, num_k_blocks
        )
    else:
        upper = num_k_blocks
    dq = jax.lax.fori_loop(0, upper, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


# ---------------------------------------------------------------------------
# Backward: dK / dV (per q-head partials; caller sums over the GQA group)
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, dsum_ref, dk_ref, dv_ref,
    *, block_q: int, block_k: int, causal: bool, scale: float,
):
    k_block_idx = pl.program_id(2)
    k_blk = k_ref[0, 0].astype(jnp.float32)  # [bk, d]
    v_blk = v_ref[0, 0].astype(jnp.float32)
    s_q = q_ref.shape[2]
    num_q_blocks = s_q // block_q
    d = k_blk.shape[-1]

    k_pos = k_block_idx * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1
    )

    def body(qb, carry):
        dk, dv = carry
        q_blk = q_ref[0, 0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, 0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)]  # [bq, 1]
        dsum = dsum_ref[0, 0, pl.ds(qb * block_q, block_q)]

        logits = (
            jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * scale
        )
        if causal:
            q_pos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            logits = jnp.where(k_pos <= q_pos, logits, _NEG_INF)
        p = jnp.exp(logits - lse)  # [bq, bk]
        dv_new = dv + jnp.dot(p.T, do_blk, preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - dsum) * scale
        dk_new = dk + jnp.dot(ds.T, q_blk, preferred_element_type=jnp.float32)
        return dk_new, dv_new

    if causal:
        # Only query blocks at/after this key block see it.
        lower = (k_block_idx * block_k) // block_q
    else:
        lower = 0
    dk, dv = jax.lax.fori_loop(
        lower, num_q_blocks, body,
        (jnp.zeros((block_k, d), jnp.float32), jnp.zeros((block_k, d), jnp.float32)),
    )
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def flash_bwd(q, k, v, o, lse, grad_out, causal: bool = True, interpret: bool = False):
    """Blockwise gradients (dQ, dK, dV) from saved (O, LSE)."""
    b, hq, s_q, d = q.shape
    hkv, s_k = k.shape[1], k.shape[2]
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    block_q, block_k = _block(s_q), _block(s_k)
    assert block_q is not None and block_k is not None

    # D = rowsum(dO * O): cheap elementwise, fused by XLA.
    dsum = jnp.sum(
        grad_out.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
        keepdims=True,
    )  # [B, Hq, S_q, 1]

    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, xi: (bi, hi, xi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_grouped_spec = pl.BlockSpec(
        (1, 1, s_k, d), lambda bi, hi, xi, g=group: (bi, hi // g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (1, 1, block_q, 1), lambda bi, hi, xi: (bi, hi, xi, 0),
        memory_space=pltpu.VMEM,
    )

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, block_q=block_q, block_k=block_k, causal=causal,
            scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, hq, s_q // block_q),
        in_specs=[q_spec, kv_grouped_spec, kv_grouped_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, grad_out, lse, dsum)

    # dK/dV per q-head, then the GQA group sums into the kv heads.
    kv_block_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, xi, g=group: (bi, hi // g, xi, 0),
        memory_space=pltpu.VMEM,
    )
    q_full_spec = pl.BlockSpec(
        (1, 1, s_q, d), lambda bi, hi, xi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    row_full_spec = pl.BlockSpec(
        (1, 1, s_q, 1), lambda bi, hi, xi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_kv_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, xi: (bi, hi, xi, 0),
        memory_space=pltpu.VMEM,
    )
    dk_part, dv_part = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, block_q=block_q, block_k=block_k, causal=causal,
            scale=scale,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, hq, s_k, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, s_k, d), jnp.float32),
        ),
        grid=(b, hq, s_k // block_k),
        in_specs=[
            q_full_spec, kv_block_spec, kv_block_spec, q_full_spec,
            row_full_spec, row_full_spec,
        ],
        out_specs=(out_kv_spec, out_kv_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, grad_out, lse, dsum)

    dk = dk_part.reshape(b, hkv, group, s_k, d).sum(axis=2).astype(k.dtype)
    dv = dv_part.reshape(b, hkv, group, s_k, d).sum(axis=2).astype(v.dtype)
    return dq, dk, dv
