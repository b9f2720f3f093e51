"""Multi-head attention: Pallas flash-attention kernel + XLA reference.

The Pallas kernel implements online-softmax flash attention tiled for the
MXU: queries are blocked over the grid while K/V stay in HBM and stream
through a double-buffered VMEM scratch (pallas_guide.md: Double Buffering),
so VMEM use is O(block) regardless of sequence length — the 7b preset's
32k-token prefill fits where the old keep-full-K/V-in-VMEM layout blew the
~16 MB budget. Causal programs bound their K-block loop at the triangle
edge, skipping both the compute AND the DMA for masked-out blocks. It
replaces the reference framework's cloud-attention entirely (there is no
native attention in /root/reference — this is the compute core of the
TPU-native engine).

Layouts: q [B, Hq, Sq, D], k/v [B, Hkv, Sk, D], GQA via Hq % Hkv == 0.
When Sq != Sk the causal mask aligns queries to the LAST Sq key positions
(KV-prefix semantics, matching mha_reference). Right-padded batches are safe
under causal masking (pad queries only read the valid prefix; valid queries
never look forward at pads).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "mha_reference"]

_NEG_INF = -1e30


def mha_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, causal: bool = True
) -> jax.Array:
    """Plain XLA attention, used on CPU and as the numerics oracle."""
    b, hq, s_q, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    qg = q.reshape(b, hkv, group, s_q, d)
    logits = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    logits *= 1.0 / math.sqrt(d)
    if causal:
        s_k = k.shape[2]
        q_pos = jnp.arange(s_q)[:, None] + (s_k - s_q)
        k_pos = jnp.arange(s_k)[None, :]
        logits = jnp.where(k_pos <= q_pos, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", weights.astype(v.dtype), v)
    return out.reshape(b, hq, s_q, d)


def _flash_kernel(
    q_ref,  # [1, 1, block_q, D] VMEM
    k_hbm,  # [B, Hkv, Sk, D] ANY (streamed)
    v_hbm,
    o_ref,  # [1, 1, block_q, D] VMEM
    k_scratch,  # [2, block_k, D] double buffer
    v_scratch,
    sems,  # DMA semaphores (2, 2)
    *,
    block_q: int,
    block_k: int,
    num_k_blocks: int,
    causal: bool,
    scale: float,
    group: int,
    q_offset: int,
):
    """One (batch, q-head, q-block) program: online softmax over streamed
    K/V blocks. ``q_offset`` = Sk - Sq aligns the causal mask when queries
    continue an existing KV prefix (mha_reference line 42 semantics)."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    q_block_idx = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale  # [block_q, d]

    d = q.shape[-1]
    if causal:
        # Only K blocks intersecting the causal triangle contribute — both
        # their DMA and their compute are skipped entirely.
        upper = jnp.minimum(
            (q_offset + (q_block_idx + 1) * block_q + block_k - 1) // block_k,
            num_k_blocks,
        )
    else:
        upper = num_k_blocks

    def get_dma_pair(slot, kb):
        return (
            pltpu.make_async_copy(
                k_hbm.at[bi, hi // group, pl.ds(kb * block_k, block_k), :],
                k_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[bi, hi // group, pl.ds(kb * block_k, block_k), :],
                v_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    k0, v0 = get_dma_pair(0, 0)
    k0.start()
    v0.start()

    q_pos = (
        q_offset
        + q_block_idx * block_q
        + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    )

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        slot = kb % 2

        @pl.when(kb + 1 < upper)
        def _():
            kn, vn = get_dma_pair((kb + 1) % 2, kb + 1)
            kn.start()
            vn.start()

        kc, vc = get_dma_pair(slot, kb)
        kc.wait()
        vc.wait()

        k_blk = k_scratch[slot].astype(jnp.float32)  # [block_k, d]
        v_blk = v_scratch[slot].astype(jnp.float32)

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

    acc = jnp.zeros((block_q, d), jnp.float32)
    m_prev = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l_prev = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_prev, l_prev = jax.lax.fori_loop(0, upper, body, (acc, m_prev, l_prev))

    out = acc / jnp.maximum(l_prev, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pick_block(s: int, preferred: int) -> int | None:
    """Largest power-of-two block <= preferred that divides s exactly.

    None when no power of two >= 8 divides s — the dispatcher must fall back
    to the XLA reference rather than silently dropping the tail block."""
    block = preferred
    while block >= 8:
        if s % block == 0:
            return block
        block //= 2
    return s if 0 < s < 8 else None


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def _flash_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    interpret: bool = False,
) -> jax.Array:
    b, hq, s_q, d = q.shape
    hkv = k.shape[1]
    s_k = k.shape[2]
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)

    block_q = _pick_block(s_q, 512)
    block_k = _pick_block(s_k, 512)
    assert block_q is not None and block_k is not None  # dispatcher-checked

    grid = (b, hq, s_q // block_q)

    kernel = functools.partial(
        _flash_kernel,
        block_q=block_q,
        block_k=block_k,
        num_k_blocks=s_k // block_k,
        causal=causal,
        scale=scale,
        group=group,
        q_offset=s_k - s_q,
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d),
                lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            # K/V stay in HBM; the kernel streams block_k slices through the
            # double-buffered scratch below (VMEM stays O(block), so long
            # sequences never exceed the ~16 MB budget).
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, d), k.dtype),
            pltpu.VMEM((2, block_k, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * s_q * s_k * d,
            bytes_accessed=(q.size + k.size * group + v.size * group + q.size)
            * q.dtype.itemsize,
            transcendentals=b * hq * s_q * s_k,
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention_diff(q, k, v, causal):
    return _flash_attention_pallas(q, k, v, causal=causal)


def _flash_diff_fwd(q, k, v, causal):
    from .flash_bwd import flash_fwd_lse, supports_pallas_bwd

    if supports_pallas_bwd(q.shape[2], k.shape[2]):
        # O(S) residuals: the Pallas backward recomputes P blockwise from
        # (O, LSE) — long-context training never materializes S x S.
        out, lse = flash_fwd_lse(q, k, v, causal=causal)
        return out, (q, k, v, out, lse)
    return _flash_attention_pallas(q, k, v, causal=causal), (q, k, v, None, None)


def _flash_diff_bwd(causal, residuals, grad_out):
    q, k, v, out, lse = residuals
    if out is not None:
        from .flash_bwd import flash_bwd

        return flash_bwd(q, k, v, out, lse, grad_out, causal=causal)
    # Fallback for blocks below 128: recompute via the XLA reference
    # (exact gradients, O(S^2) transient memory).
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_reference(q_, k_, v_, causal), q, k, v)
    return vjp(grad_out)


_flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = True,
    force_reference: bool = False,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA reference elsewhere.

    Differentiable everywhere: the TPU path carries a custom VJP (Pallas
    forward, recomputed-reference backward). Sequence lengths without a
    power-of-two divisor fall back to the XLA reference rather than dropping
    a partial tail block. Sq != Sk (KV-prefix queries) is handled by the
    forward kernel's q_offset, but the Pallas backward assumes Sq == Sk, so
    the differentiable dispatch routes mismatched shapes to the reference.
    """
    if (
        force_reference
        or jax.default_backend() != "tpu"
        or q.shape[2] != k.shape[2]
        or _pick_block(q.shape[2], 512) is None
        or _pick_block(k.shape[2], 512) is None
        # Lane (head) dim must be 128-aligned for Mosaic VMEM tiling.
        # Qwen2-VL's VISION tower has head_dim 80 (hidden 1280 / 16
        # heads): the 7b full-pipeline rehearsal failed exactly here
        # ("Slice shape along dimension 3 must be aligned to tiling
        # (128), but is 80", 2026-08-21) — text-only gates never touched
        # the vision encode path. XLA handles 80 fine.
        or q.shape[3] % 128 != 0
    ):
        return mha_reference(q, k, v, causal=causal)
    return _flash_attention_diff(q, k, v, causal)
