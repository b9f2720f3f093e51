"""Context parallelism: ring attention over a sequence-sharded mesh axis.

When one segment's token count outgrows a single chip's HBM (the seam
SURVEY §2.5 reserves for this case), the sequence dimension itself shards:
each device on the "cp" axis holds a contiguous Q/K/V block, and K/V blocks
rotate around the ring with `lax.ppermute` while every device folds each
visiting block into its ONLINE-SOFTMAX accumulator (running max / sum /
weighted value — the same math as the flash kernel, ops/attention.py, so
the result is exact, not approximate). Total memory per device is O(S/N);
communication is the classic ring: N-1 block transfers riding ICI,
overlapped with the block attention compute by XLA's scheduler.

Causality uses GLOBAL positions carried per block, so the rotation order
never changes the math. Exactness against the sequential reference is
pinned by tests/test_context_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import compat_shard_map

__all__ = ["CP_AXIS", "ring_attention", "build_cp_mesh"]

CP_AXIS = "cp"
_NEG_INF = -1e30


def build_cp_mesh(
    n_shards: int, devices: list[jax.Device] | None = None
) -> Mesh:
    """A 1-D ("cp",) mesh of n_shards devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_shards:
        raise ValueError(f"need {n_shards} devices, have {len(devices)}")
    return jax.make_mesh(
        (n_shards,), (CP_AXIS,),
        devices=devices[:n_shards],
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def _block_attend(q, k, v, q_pos, k_pos, scale, causal, acc, m_prev, l_prev):
    """Fold one K/V block into the online-softmax accumulator.

    q [B, H, Sq, D]; k/v [B, Hkv, Sk, D] (GQA via broadcast); positions are
    GLOBAL so causality survives ring rotation.
    """
    b, hq, s_q, d = q.shape
    hkv = k.shape[1]
    group = hq // hkv
    qg = q.reshape(b, hkv, group, s_q, d)
    logits = (
        jnp.einsum("bhgqd,bhkd->bhgqk", qg.astype(jnp.float32),
                   k.astype(jnp.float32))
        * scale
    )
    if causal:
        mask = k_pos[None, :] <= q_pos[:, None]  # [Sq, Sk]
        logits = jnp.where(mask[None, None, None], logits, _NEG_INF)

    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    # A block can be ENTIRELY masked for some query rows (future blocks on
    # the ring); exp(-1e30 - (-1e30)) would be 1, so zero those explicitly.
    p = jnp.where(logits <= _NEG_INF / 2, 0.0, jnp.exp(logits - m_new))
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhgqk,bhkd->bhgqd", p, v.astype(jnp.float32)
    )
    return acc_new, m_new, l_new


def ring_attention(
    q: jax.Array,  # [B, Hq, S, D]
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,
    mesh: Mesh,
    causal: bool = True,
) -> jax.Array:
    """Exact attention with the sequence sharded over the "cp" mesh axis.

    S must divide by the axis size. Returns [B, Hq, S, D] sharded the same
    way (out_specs keeps the sequence split).
    """
    n = mesh.shape[CP_AXIS]
    b, hq, s, d = q.shape
    if s % n:
        raise ValueError(f"sequence {s} must divide over {n} cp shards")
    scale = 1.0 / (d ** 0.5)
    block = s // n

    def cp(ql, kl, vl):
        idx = jax.lax.axis_index(CP_AXIS)
        q_pos = idx * block + jnp.arange(block)

        acc = jnp.zeros(
            (b, kl.shape[1], hq // kl.shape[1], block, d), jnp.float32
        )
        m = jnp.full((b, kl.shape[1], hq // kl.shape[1], block, 1),
                     _NEG_INF, jnp.float32)
        l = jnp.zeros_like(m)

        k_blk, v_blk = kl, vl
        # After r rotations each device holds the block that ORIGINATED at
        # ring position (idx - r) mod n.
        for r in range(n):
            src = (idx - r) % n
            k_pos = src * block + jnp.arange(block)
            acc, m, l = _block_attend(
                ql, k_blk, v_blk, q_pos, k_pos, scale, causal, acc, m, l
            )
            if r + 1 < n:
                perm = [(i, (i + 1) % n) for i in range(n)]
                k_blk = jax.lax.ppermute(k_blk, CP_AXIS, perm)
                v_blk = jax.lax.ppermute(v_blk, CP_AXIS, perm)

        out = acc / jnp.maximum(l, 1e-30)
        return out.reshape(b, hq, block, d).astype(q.dtype)

    return compat_shard_map(
        cp,
        mesh=mesh,
        in_specs=(P(None, None, CP_AXIS), P(None, None, CP_AXIS),
                  P(None, None, CP_AXIS)),
        out_specs=P(None, None, CP_AXIS),
    )(q, k, v)
