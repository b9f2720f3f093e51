"""Fused int4 dequant matmul: stream packed nibbles, unpack in VMEM.

models/quant.py stores int4 weights as two's-complement nibble pairs in a
uint8 carrier [K//2, N] (the axon backend cannot relayout XLA's sub-byte s4
dtype — see that module). The XLA lowering of the unpack-then-dot graph
MATERIALIZES the unpacked bf16 halves to HBM every decode step, so int4
measured SLOWER than int8 (162 vs 300 steps/s at base batch 16): ~3x the
intended traffic. This kernel is the roofline-correct path — the packed
bytes stream HBM->VMEM exactly once (double-buffered), the nibble extract
happens in VMEM, and two MXU dots against the even/odd input features
accumulate in fp32:

    y = x[..., 0::2] @ sign_extend(lo(P)) + x[..., 1::2] @ sign_extend(hi(P))

Per-output-channel dequant scales multiply OUTSIDE (XLA fuses the epilogue,
models/lm.py::QDense). Decode M (= batch * block width) is small, so x
rides whole in VMEM; the grid is over N tiles, each program streaming the
full K extent in double-buffered chunks (pallas_guide.md: Double Buffering).

Used for the DECODE path only (M <= _MAX_M): prefill/training matmuls are
compute-bound and amortize the XLA unpack over thousands of rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int4_matmul"]

# Beyond this row count the op is compute-bound and XLA's path is fine.
_MAX_M = 256


def _pick(n: int, candidates=(512, 256, 128)) -> int | None:
    for c in candidates:
        if n % c == 0:
            return c
    return None


def _kernel(x_even_ref, x_odd_ref, packed_hbm, o_ref, pk, sem, *,
            bk2: int, n_chunks: int, bn: int):
    j = pl.program_id(0)  # N-tile index

    def chunk_dma(slot, idx):
        return pltpu.make_async_copy(
            packed_hbm.at[pl.ds(idx * bk2, bk2), pl.ds(j * bn, bn)],
            pk.at[slot],
            sem.at[slot],
        )

    chunk_dma(0, 0).start()

    m = x_even_ref.shape[0]
    acc0 = jnp.zeros((m, bn), jnp.float32)

    def body(idx, acc):
        slot = idx % 2

        @pl.when(idx + 1 < n_chunks)
        def _():
            chunk_dma((idx + 1) % 2, idx + 1).start()

        chunk_dma(slot, idx).wait()
        # Unpack + sign-extend entirely in i32: Mosaic on this toolchain
        # legalizes no 8-bit vector arithmetic at all (subi and shrui on
        # vector<...xi8> both failed on-chip), so widen first.
        p = pk[slot].astype(jnp.int32)  # [bk2, bn] u8 -> i32
        lo = ((p & 0xF) ^ 8) - 8
        hi = ((p >> 4) ^ 8) - 8
        xe = x_even_ref[:, pl.ds(idx * bk2, bk2)].astype(jnp.bfloat16)
        xo = x_odd_ref[:, pl.ds(idx * bk2, bk2)].astype(jnp.bfloat16)
        acc = acc + jnp.dot(
            xe, lo.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        acc = acc + jnp.dot(
            xo, hi.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
        return acc

    acc = jax.lax.fori_loop(0, n_chunks, body, acc0)
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_matmul_pallas(
    x_even: jax.Array,  # [M, K2] bf16
    x_odd: jax.Array,  # [M, K2]
    packed: jax.Array,  # [K2, N] uint8
    interpret: bool = False,
) -> jax.Array:
    m, k2 = x_even.shape
    n = packed.shape[1]
    bn = _pick(n, (256, 128))
    bk2 = _pick(k2, (512, 256, 128))
    assert bn is not None and bk2 is not None  # dispatcher checked
    n_chunks = k2 // bk2
    m_pad = max(((m + 7) // 8) * 8, 8)
    if m_pad != m:
        pad = ((0, m_pad - m), (0, 0))
        x_even = jnp.pad(x_even, pad)
        x_odd = jnp.pad(x_odd, pad)

    out = pl.pallas_call(
        functools.partial(_kernel, bk2=bk2, n_chunks=n_chunks, bn=bn),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((m_pad, k2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, k2), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((m_pad, bn), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, bk2, bn), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x_even, x_odd, packed)
    return out[:m]


def int4_matmul(
    x: jax.Array, packed: jax.Array, force_reference: bool = False
) -> jax.Array:
    """x [..., K] bf16 @ packed-int4 [K//2, N] -> [..., N] bf16 (unscaled).

    Dispatch: the fused Pallas kernel for small row counts on TPU (the
    decode path, where the weight stream dominates); the XLA two-half-dot
    expression elsewhere. ``VTX_FORCE_REF_ATTN`` forces the XLA path (the
    same perf-ablation knob the attention kernels honor)."""
    import os

    from ..models.quant import unpack_int4

    lead = x.shape[:-1]
    k = x.shape[-1]
    m = 1
    for dim in lead:
        m *= dim
    k2, n = packed.shape
    xf = x.reshape(m, k)
    use_kernel = (
        not force_reference
        and not os.environ.get("VTX_FORCE_REF_ATTN")
        and jax.default_backend() == "tpu"
        and m <= _MAX_M
        and _pick(n, (256, 128)) is not None
        and _pick(k2, (512, 256, 128)) is not None
    )
    if use_kernel:
        y = _int4_matmul_pallas(
            xf[:, 0::2].astype(jnp.bfloat16), xf[:, 1::2].astype(jnp.bfloat16),
            packed,
        )
    else:
        w_even, w_odd = unpack_int4(packed)
        y = (
            xf[:, 0::2] @ w_even.astype(x.dtype)
            + xf[:, 1::2] @ w_odd.astype(x.dtype)
        )
    return y.reshape(*lead, n).astype(x.dtype)
