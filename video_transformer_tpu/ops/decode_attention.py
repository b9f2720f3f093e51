"""Length-aware decode attention: paged KV reads with block skipping.

The XLA decode path (models/lm.py::_cache_attention) reads the ENTIRE padded
cache every step — at cache_len 4096 with ~500 valid positions that is ~8x
wasted HBM bandwidth, and decode is bandwidth-bound. This Pallas kernel keeps
K/V in HBM and DMAs only the blocks inside each row's valid prefix, double-
buffered so the next block streams while the current one computes
(pallas_guide.md: Double Buffering + PrefetchScalarGridSpec).

Layout: q [B, Hq, W, D] (W = decode block width), k/v caches
[B, Hkv, S, D], per-row valid lengths [B] (= index + W). Grid (B, Hkv);
each program streams ceil(length/BLK) K/V blocks for its (row, kv-head) and
runs online softmax for the G*W query rows of that group.

Falls back to the XLA path off-TPU or for unaligned shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "adopt_rows",
    "decode_attention",
    "decode_attention_reference",
    "decode_attention_update",
    "update_cache_rows",
]

_NEG_INF = -1e30
_BLOCK = 512


def decode_attention_reference(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    rows: jax.Array | None = None,
) -> jax.Array:
    """XLA oracle: full-cache masked attention (per-row causal lengths).

    q [B, Hq, W, D]; lengths[b] is the count of valid cache positions for
    the FIRST query row; query row j may additionally see positions up to
    lengths[b] + j (in-block causality). ``rows`` [B] (optional) maps each
    logical query row to its PHYSICAL cache row (paged serving: the cache
    may hold more rows than the decode batch; gathers here, zero-copy
    indexing in the Pallas kernels).
    """
    if rows is not None:
        k_cache = k_cache[rows]
        v_cache = v_cache[rows]
    b, hq, w, d = q.shape
    hkv = k_cache.shape[1]
    group = hq // hkv
    qg = q.reshape(b, hkv, group, w, d).astype(jnp.float32)
    logits = jnp.einsum(
        "bhgqd,bhkd->bhgqk", qg, k_cache.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(d))
    q_extra = jnp.arange(w)[None, None, None, :, None]
    k_pos = jnp.arange(k_cache.shape[2])[None, None, None, None, :]
    limit = lengths[:, None, None, None, None] + q_extra
    logits = jnp.where(k_pos < limit, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", weights, v_cache.astype(jnp.float32))
    return out.reshape(b, hq, w, d).astype(q.dtype)


def _kernel(
    len_ref,  # scalar prefetch [B]
    rows_ref,  # scalar prefetch [B]: logical row -> physical cache row
    q_ref,  # [1, 1, GW, D] VMEM
    k_hbm,  # [R, Hkv, S, D] ANY (R >= B under paged serving)
    v_hbm,
    o_ref,  # [1, 1, GW, D] VMEM
    k_scratch,  # [2, BLK, D]
    v_scratch,
    sems,  # DMA sems (2, 2)
    *,
    block: int,
    width: int,
    group: int,
    scale: float,
):
    row = pl.program_id(0)
    phys = rows_ref[row]  # physical cache row (paged row table)
    head = pl.program_id(1)
    length = len_ref[row]  # valid positions for query row 0
    # Query row j (within width) may see length + j positions; the maximum
    # extent decides how many blocks to stream.
    max_len = length + width - 1
    num_blocks = (max_len + block - 1) // block

    gw, d = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0].astype(jnp.float32) * scale  # [GW, D]

    def get_dma_pair(slot, blk_idx):
        return (
            pltpu.make_async_copy(
                k_hbm.at[phys, head, pl.ds(blk_idx * block, block), :],
                k_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[phys, head, pl.ds(blk_idx * block, block), :],
                v_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    k0, v0 = get_dma_pair(0, 0)
    k0.start()
    v0.start()

    # Positions of query rows within the block: row j has extra budget j.
    q_extra = jax.lax.broadcasted_iota(jnp.int32, (gw, block), 0) % width

    def body(blk_idx, carry):
        acc, m_prev, l_prev = carry
        slot = blk_idx % 2

        @pl.when(blk_idx + 1 < num_blocks)
        def _():
            kn, vn = get_dma_pair((blk_idx + 1) % 2, blk_idx + 1)
            kn.start()
            vn.start()

        kc, vc = get_dma_pair(slot, blk_idx)
        kc.wait()
        vc.wait()

        k_blk = k_scratch[slot].astype(jnp.float32)  # [BLK, D]
        v_blk = v_scratch[slot].astype(jnp.float32)

        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        k_pos = blk_idx * block + jax.lax.broadcasted_iota(
            jnp.int32, (gw, block), 1
        )
        logits = jnp.where(k_pos < length + q_extra, logits, _NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc = jnp.zeros((gw, d), jnp.float32)
    m0 = jnp.full((gw, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((gw, 1), jnp.float32)
    acc, _, l_final = jax.lax.fori_loop(0, num_blocks, body, (acc, m0, l0))

    o_ref[0, 0] = (acc / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)


def _kernel_pipelined(
    len_ref,  # scalar prefetch [B]
    rows_ref,  # scalar prefetch [B]: logical row -> physical cache row
    q_ref,  # [1, 1, GW, D] VMEM
    k_hbm,  # [R, Hkv, S, D] ANY
    v_hbm,
    o_ref,  # [1, 1, GW, D] VMEM
    k_scratch,  # [4, BLK, D] — slots {2p, 2p+1} per program parity p
    v_scratch,
    sems,  # DMA sems (4, 2)
    *,
    block: int,
    width: int,
    group: int,
    scale: float,
    hkv: int,
):
    """_kernel with CROSS-PROGRAM block-0 prefetch.

    The plain kernel starts its first cache-block DMA at program entry and
    waits — B x Hkv cold DMA latencies per layer per decode step, unhidden
    because Mosaic only auto-pipelines VMEM-blocked operands, not manual
    ANY-space DMAs. Here program P starts program P+1's block-0 fetch
    before its own compute loop, so in steady state there is always a DMA
    in flight across program boundaries. Slot discipline: program parity p
    owns scratch slots {2p, 2p+1}; its block b lives in slot 2p + b%2, so
    the prefetch into the OTHER parity's slot 2*(1-p) never collides
    (sequential grid: programs P-1 and P+1 share parity but never overlap
    in time). Scratch and semaphores persist across grid steps on TPU (and
    in interpret mode — probed), which is what makes the handoff legal.
    """
    row = pl.program_id(0)
    head = pl.program_id(1)
    f = row * hkv + head
    total = pl.num_programs(0) * pl.num_programs(1)
    parity = f % 2
    phys = rows_ref[row]
    length = len_ref[row]
    max_len = length + width - 1
    num_blocks = (max_len + block - 1) // block

    def get_dma_pair(slot, phys_row, head_idx, blk_idx):
        return (
            pltpu.make_async_copy(
                k_hbm.at[phys_row, head_idx, pl.ds(blk_idx * block, block), :],
                k_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[phys_row, head_idx, pl.ds(blk_idx * block, block), :],
                v_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    # Cold start: only the very first program fetches its own block 0 —
    # every later program's block 0 was started by its predecessor.
    @pl.when(f == 0)
    def _():
        k0, v0 = get_dma_pair(2 * parity, phys, head, 0)
        k0.start()
        v0.start()

    # Hand off: start the NEXT program's block 0 before computing.
    @pl.when(f + 1 < total)
    def _():
        nf = f + 1
        nrow = nf // hkv
        nhead = nf % hkv
        nk, nv = get_dma_pair(2 * (nf % 2), rows_ref[nrow], nhead, 0)
        nk.start()
        nv.start()

    gw, d = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0].astype(jnp.float32) * scale  # [GW, D]
    q_extra = jax.lax.broadcasted_iota(jnp.int32, (gw, block), 0) % width

    def body(blk_idx, carry):
        acc, m_prev, l_prev = carry
        slot = 2 * parity + blk_idx % 2

        @pl.when(blk_idx + 1 < num_blocks)
        def _():
            kn, vn = get_dma_pair(
                2 * parity + (blk_idx + 1) % 2, phys, head, blk_idx + 1
            )
            kn.start()
            vn.start()

        kc, vc = get_dma_pair(slot, phys, head, blk_idx)
        kc.wait()
        vc.wait()

        k_blk = k_scratch[slot].astype(jnp.float32)
        v_blk = v_scratch[slot].astype(jnp.float32)

        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        k_pos = blk_idx * block + jax.lax.broadcasted_iota(
            jnp.int32, (gw, block), 1
        )
        logits = jnp.where(k_pos < length + q_extra, logits, _NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((gw, d), jnp.float32)
    m0 = jnp.full((gw, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((gw, 1), jnp.float32)
    acc, _, l_final = jax.lax.fori_loop(0, num_blocks, body, (acc, m0, l0))

    o_ref[0, 0] = (acc / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "pipelined"))
def _decode_attention_pallas(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    rows: jax.Array | None = None,
    interpret: bool = False,
    pipelined: bool = False,
) -> jax.Array:
    b, hq, w, d = q.shape
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    block = _pick_cache_block(s)
    assert block is not None  # dispatcher guarantees divisibility
    if rows is None:
        rows = jnp.arange(b, dtype=jnp.int32)

    # Queries for one kv head, flattened: [B, Hkv, G*W, D], with the row
    # count padded to the fp32 sublane multiple (8) for clean VMEM tiling.
    gw = group * w
    gw_pad = ((gw + 7) // 8) * 8
    qg = q.reshape(b, hkv, group, w, d).reshape(b, hkv, gw, d)
    if gw_pad != gw:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gw_pad - gw), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, gw_pad, d),
                lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, gw_pad, d),
            lambda i, j, *_: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            # Scratch keeps the cache dtype: blocks stream at native width
            # and cast to fp32 on-chip (no full-cache cast in HBM).
            # The pipelined kernel doubles the slots (parity handoff).
            pltpu.VMEM((4 if pipelined else 2, block, d), k_cache.dtype),
            pltpu.VMEM((4 if pipelined else 2, block, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((4 if pipelined else 2, 2)),
        ],
    )

    if pipelined:
        kernel = functools.partial(
            _kernel_pipelined, block=block, width=w, group=group,
            scale=scale, hkv=hkv,
        )
        # The cross-program DMA handoff requires the documented sequential
        # grid order — "parallel" would license reordering that breaks it.
        semantics = ("arbitrary", "arbitrary")
    else:
        kernel = functools.partial(
            _kernel, block=block, width=w, group=group, scale=scale
        )
        semantics = ("parallel", "parallel")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qg.shape, q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), rows.astype(jnp.int32), qg, k_cache, v_cache)
    out = out[:, :, :gw, :]
    return out.reshape(b, hkv, group, w, d).reshape(b, hq, w, d)


def _pick_cache_block(s: int) -> int | None:
    """Largest block in {512, 256, 128} that divides the cache length.

    The engine rounds cache_len to a 128 multiple, so 128 always divides in
    practice; None signals the dispatcher to fall back (the block-count loop
    would otherwise DMA past the end of the cache on the last block)."""
    for block in (512, 256, 128):
        if s % block == 0:
            return block
    return None


def update_cache_rows(
    cache_layer: jax.Array,
    new: jax.Array,
    index: jax.Array,
    rows: jax.Array | None = None,
) -> jax.Array:
    """Write new [B, H, s, D] into cache [R, H, S, D] at per-row offsets
    (XLA path; the fused Pallas kernel below writes in place instead).
    ``rows`` [B] (optional) selects each logical row's physical cache row
    (gather + scatter here — correctness fallback only)."""

    def write_row(row_cache, row_new, row_index):
        return jax.lax.dynamic_update_slice(row_cache, row_new, (0, row_index, 0))

    if rows is None:
        return jax.vmap(write_row)(cache_layer, new, index)
    sub = jax.vmap(write_row)(cache_layer[rows], new, index)
    return cache_layer.at[rows].set(sub)


def _fused_kernel(
    len_ref,  # scalar prefetch [B]: valid positions for query row 0
    rows_ref,  # scalar prefetch [B]: logical row -> physical cache row
    q_ref,  # [1, 1, GW, D] VMEM
    k_new_ref,  # [1, 1, Wpad, D] VMEM (rows [0, width) are real)
    v_new_ref,
    k_hbm,  # [R, Hkv, S, D] ANY (aliased with k_out; R >= B when paged)
    v_hbm,
    o_ref,  # [1, 1, GW, D] VMEM
    k_out,  # ANY, aliased with k_hbm — never touched directly
    v_out,
    k_scratch,  # [2, BLK, D]
    v_scratch,
    sems,  # DMA sems (2, 2)
    w_sems,  # row-write DMA sems (4,)
    rmw_k,  # [w_pad + 8, D] row-write staging
    rmw_v,
    *,
    block: int,
    width: int,
    group: int,
    scale: float,
    w_pad: int,
):
    """decode_attention with the K/V cache row-write FUSED into the kernel.

    The XLA scatter path (update_cache_rows + .at[layer].set) costs a full
    cache copy per decode step when the compiler cannot prove in-place
    aliasing through the loop carry — measured ~19 MB/row/step at base
    geometry, the dominant decode cost. Here each (row, head) program DMAs
    its ``width`` new rows straight into the HBM cache (aliased in place via
    input_output_aliases), waits, then streams the valid prefix exactly as
    the plain kernel does. Extra traffic: width*D writes per program — KBs,
    not MBs.
    """
    row = pl.program_id(0)
    phys = rows_ref[row]  # physical cache row (paged row table)
    head = pl.program_id(1)
    length = len_ref[row]
    base = length - 1  # write offset: new rows occupy [base, base + width)

    # Write the new K/V rows into the cache, in place. DMA sublane offsets
    # must be 8-aligned (Mosaic tiling), and ``base`` is arbitrary, so this
    # is a read-modify-write of the 8-aligned region containing the block:
    # stream the old region in, rotate the new rows to their in-region
    # offset, keep old rows below the offset, and DMA the merged region
    # back. Region = w_pad + 8 rows — KBs, not MBs.
    region = w_pad + 8
    region_start = (base // 8) * 8
    offset = base - region_start

    rmw_reads = [
        pltpu.make_async_copy(
            k_hbm.at[phys, head, pl.ds(region_start, region), :],
            rmw_k, w_sems.at[0],
        ),
        pltpu.make_async_copy(
            v_hbm.at[phys, head, pl.ds(region_start, region), :],
            rmw_v, w_sems.at[1],
        ),
    ]
    for dma in rmw_reads:
        dma.start()
    for dma in rmw_reads:
        dma.wait()

    d = q_ref.shape[3]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (region, d), 0)
    for new_ref, rmw in ((k_new_ref, rmw_k), (v_new_ref, rmw_v)):
        # Rotate in f32 (Mosaic's dynamic rotate is 32-bit only) and cast
        # back to the cache dtype for the write.
        padded = jnp.concatenate(
            [new_ref[0, 0].astype(jnp.float32), jnp.zeros((8, d), jnp.float32)],
            axis=0,
        )
        rolled = pltpu.roll(padded, offset, axis=0)
        # Rows < offset keep old cache data; rows >= offset + width land in
        # the reserved tail slack (never attended, rewritten by later steps).
        rmw[...] = jnp.where(
            row_ids >= offset, rolled, rmw[...].astype(jnp.float32)
        ).astype(rmw.dtype)

    # Compiled, k_out/v_out ARE k_hbm/v_hbm (input_output_aliases) and the
    # second DMA pair is a duplicate write of identical bytes; in interpret
    # mode the alias is a copy, so both views must be written for streaming
    # reads AND outputs to agree.
    rmw_writes = [
        pltpu.make_async_copy(
            rmw_k, k_hbm.at[phys, head, pl.ds(region_start, region), :],
            w_sems.at[0],
        ),
        pltpu.make_async_copy(
            rmw_v, v_hbm.at[phys, head, pl.ds(region_start, region), :],
            w_sems.at[1],
        ),
        pltpu.make_async_copy(
            rmw_k, k_out.at[phys, head, pl.ds(region_start, region), :],
            w_sems.at[2],
        ),
        pltpu.make_async_copy(
            rmw_v, v_out.at[phys, head, pl.ds(region_start, region), :],
            w_sems.at[3],
        ),
    ]
    for dma in rmw_writes:
        dma.start()
    for dma in rmw_writes:
        dma.wait()

    max_len = length + width - 1
    num_blocks = (max_len + block - 1) // block

    gw, d = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0].astype(jnp.float32) * scale  # [GW, D]

    def get_dma_pair(slot, blk_idx):
        return (
            pltpu.make_async_copy(
                k_hbm.at[phys, head, pl.ds(blk_idx * block, block), :],
                k_scratch.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[phys, head, pl.ds(blk_idx * block, block), :],
                v_scratch.at[slot],
                sems.at[slot, 1],
            ),
        )

    k0, v0 = get_dma_pair(0, 0)
    k0.start()
    v0.start()

    q_extra = jax.lax.broadcasted_iota(jnp.int32, (gw, block), 0) % width

    def body(blk_idx, carry):
        acc, m_prev, l_prev = carry
        slot = blk_idx % 2

        @pl.when(blk_idx + 1 < num_blocks)
        def _():
            kn, vn = get_dma_pair((blk_idx + 1) % 2, blk_idx + 1)
            kn.start()
            vn.start()

        kc, vc = get_dma_pair(slot, blk_idx)
        kc.wait()
        vc.wait()

        k_blk = k_scratch[slot].astype(jnp.float32)
        v_blk = v_scratch[slot].astype(jnp.float32)

        logits = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)
        k_pos = blk_idx * block + jax.lax.broadcasted_iota(
            jnp.int32, (gw, block), 1
        )
        logits = jnp.where(k_pos < length + q_extra, logits, _NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(logits - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc = jnp.zeros((gw, d), jnp.float32)
    m0 = jnp.full((gw, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((gw, 1), jnp.float32)
    acc, _, l_final = jax.lax.fori_loop(0, num_blocks, body, (acc, m0, l0))

    o_ref[0, 0] = (acc / jnp.maximum(l_final, 1e-30)).astype(o_ref.dtype)


def _batch_write_kernel(
    len_ref,  # scalar prefetch [B]: valid positions for query row 0
    rows_ref,  # scalar prefetch [B]: logical row -> physical cache row
    k_new_ref,  # [B, Hkv, Wpad, D] VMEM (whole array)
    v_new_ref,
    k_hbm,  # [R, Hkv, S, D] ANY, aliased with k_out
    v_hbm,
    k_out,  # ANY, aliased — duplicate writes keep interpret mode honest
    v_out,
    k_stage,  # [chunk, region, D] VMEM staging
    v_stage,
    sems,  # DMA sems (chunk, 4)
    *,
    w_pad: int,
    hkv: int,
    chunk: int,
    items: int,
):
    """All (row, head) cache-row writes with ``chunk`` RMWs in flight.

    The fused attention kernel serializes 2 DMA round trips (region read,
    region write) at the head of EVERY (row, head) program — 2*B*Hkv
    round trips per decode step before any attention math. Batching the
    read-modify-writes here cuts that to ~2*ceil(B*Hkv/chunk): within a
    grid step every item's read (then write) is in flight concurrently.
    The attention kernel then runs read-only (_kernel), which also drops
    its per-program RMW scratch."""
    g = pl.program_id(0)
    region = w_pad + 8
    d = k_stage.shape[-1]

    def item_coords(j):
        item = g * chunk + j
        row = item // hkv
        head = item % hkv
        phys = rows_ref[row]
        length = len_ref[row]
        base = length - 1
        region_start = (base // 8) * 8
        return item, row, head, phys, region_start, base - region_start

    # Phase 1: all region reads in flight.
    for j in range(chunk):
        item, _, head, phys, region_start, _ = item_coords(j)

        @pl.when(item < items)
        def _(j=j, head=head, phys=phys, region_start=region_start):
            pltpu.make_async_copy(
                k_hbm.at[phys, head, pl.ds(region_start, region), :],
                k_stage.at[j], sems.at[j, 0],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[phys, head, pl.ds(region_start, region), :],
                v_stage.at[j], sems.at[j, 1],
            ).start()

    # Phase 2: merge each region and start both write DMAs.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (region, d), 0)
    for j in range(chunk):
        item, row, head, phys, region_start, offset = item_coords(j)

        @pl.when(item < items)
        def _(j=j, row=row, head=head, phys=phys,
              region_start=region_start, offset=offset):
            pltpu.make_async_copy(
                k_hbm.at[phys, head, pl.ds(region_start, region), :],
                k_stage.at[j], sems.at[j, 0],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[phys, head, pl.ds(region_start, region), :],
                v_stage.at[j], sems.at[j, 1],
            ).wait()
            for new_ref, stage in ((k_new_ref, k_stage), (v_new_ref, v_stage)):
                # Rotate in f32 (Mosaic dynamic rotate is 32-bit only).
                padded = jnp.concatenate(
                    [
                        new_ref[row, head].astype(jnp.float32),
                        jnp.zeros((8, d), jnp.float32),
                    ],
                    axis=0,
                )
                rolled = pltpu.roll(padded, offset, axis=0)
                stage[j] = jnp.where(
                    row_ids >= offset, rolled, stage[j].astype(jnp.float32)
                ).astype(stage.dtype)
            pltpu.make_async_copy(
                k_stage.at[j],
                k_hbm.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 0],
            ).start()
            pltpu.make_async_copy(
                v_stage.at[j],
                v_hbm.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 1],
            ).start()
            pltpu.make_async_copy(
                k_stage.at[j],
                k_out.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 2],
            ).start()
            pltpu.make_async_copy(
                v_stage.at[j],
                v_out.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 3],
            ).start()

    # Phase 3: drain the writes.
    for j in range(chunk):
        item, _, head, phys, region_start, _ = item_coords(j)

        @pl.when(item < items)
        def _(j=j, head=head, phys=phys, region_start=region_start):
            pltpu.make_async_copy(
                k_stage.at[j],
                k_hbm.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 0],
            ).wait()
            pltpu.make_async_copy(
                v_stage.at[j],
                v_hbm.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 1],
            ).wait()
            pltpu.make_async_copy(
                k_stage.at[j],
                k_out.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 2],
            ).wait()
            pltpu.make_async_copy(
                v_stage.at[j],
                v_out.at[phys, head, pl.ds(region_start, region), :],
                sems.at[j, 3],
            ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _batch_row_write_pallas(
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, Hkv, W, D]
    v_new: jax.Array,
    index: jax.Array,  # [B]
    rows: jax.Array | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    b, hkv, w, d = k_new.shape
    if rows is None:
        rows = jnp.arange(b, dtype=jnp.int32)
    w_pad = ((w + 7) // 8) * 8
    kn = k_new.astype(k_cache.dtype)
    vn = v_new.astype(v_cache.dtype)
    if w_pad != w:
        kn = jnp.pad(kn, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
        vn = jnp.pad(vn, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))

    items = b * hkv
    chunk = min(4, items)
    region = w_pad + 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((items + chunk - 1) // chunk,),
        in_specs=[
            pl.BlockSpec(
                kn.shape, lambda g, *_: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                vn.shape, lambda g, *_: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk, region, d), k_cache.dtype),
            pltpu.VMEM((chunk, region, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((chunk, 4)),
        ],
    )
    lengths = (index + 1).astype(jnp.int32)
    k_out, v_out = pl.pallas_call(
        functools.partial(
            _batch_write_kernel, w_pad=w_pad, hkv=hkv, chunk=chunk,
            items=items,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        grid_spec=grid_spec,
        # Operands: lengths=0, rows=1, k_new=2, v_new=3, k_cache=4,
        # v_cache=5.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lengths, rows.astype(jnp.int32), kn, vn, k_cache, v_cache)
    return k_out, v_out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _decode_attention_update_pallas(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, Hkv, W, D]
    v_new: jax.Array,
    index: jax.Array,  # [B] current per-row cache fill (pre-block)
    rows: jax.Array | None = None,  # [B] logical -> physical cache row
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    b, hq, w, d = q.shape
    hkv, s = k_cache.shape[1], k_cache.shape[2]
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    block = _pick_cache_block(s)
    assert block is not None  # dispatcher guarantees divisibility
    if rows is None:
        rows = jnp.arange(b, dtype=jnp.int32)

    gw = group * w
    gw_pad = ((gw + 7) // 8) * 8
    qg = q.reshape(b, hkv, group, w, d).reshape(b, hkv, gw, d)
    if gw_pad != gw:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, gw_pad - gw), (0, 0)))
    # New rows padded to the sublane multiple; the pad rows are written past
    # the block into the 2*block_width cache slack the engine reserves, then
    # overwritten by the next step (never attended: mask stops at length).
    w_pad = ((w + 7) // 8) * 8
    kn = k_new.astype(k_cache.dtype)
    vn = v_new.astype(v_cache.dtype)
    if w_pad != w:
        kn = jnp.pad(kn, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
        vn = jnp.pad(vn, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, gw_pad, d), lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w_pad, d), lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w_pad, d), lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, gw_pad, d), lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block, d), k_cache.dtype),
            pltpu.VMEM((2, block, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((w_pad + 8, d), k_cache.dtype),
            pltpu.VMEM((w_pad + 8, d), v_cache.dtype),
        ],
    )

    lengths = (index + 1).astype(jnp.int32)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(
            _fused_kernel, block=block, width=w, group=group, scale=scale,
            w_pad=w_pad,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(qg.shape, q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        grid_spec=grid_spec,
        # Operand indices count the scalar-prefetch args first: lengths=0,
        # rows=1, q=2, k_new=3, v_new=4, k_cache=5, v_cache=6.
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths, rows.astype(jnp.int32), qg, kn, vn, k_cache, v_cache)
    out = out[:, :, :gw, :]
    return out.reshape(b, hkv, group, w, d).reshape(b, hq, w, d), k_out, v_out


def decode_attention_update(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    index: jax.Array,
    rows: jax.Array | None = None,
    force_reference: bool = False,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused cache-row write + length-aware decode attention.

    Returns (attn_out, k_cache, v_cache) with the new rows written at each
    row's ``index`` offset — in place on TPU (pallas input_output_aliases),
    via the XLA scatter fallback elsewhere. ``rows`` [B] maps logical decode
    rows to physical cache rows (paged serving; None = identity). The
    aligned read-modify-write can touch up to round_up(width, 8) + 8 rows
    past ``index``; callers must reserve that much tail slack past the
    maximum index (the engine and batcher size their caches accordingly).

    ``k_scale``/``v_scale`` [Hkv] (present iff the caches are int8,
    models/lm.py::init_kv_cache quant=True) need NO kernel plumbing: the
    per-head scale factors out of the attention algebra — q is pre-scaled
    by k_scale (softmax sees exactly the dequantized logits) and the
    output post-scaled by v_scale (P @ V_int8 is linear in V) — and the
    kernels' scratch already follows the cache dtype, streaming int8
    blocks at half the bytes. New rows are quantized OUTSIDE the write
    kernel; its f32 rotate round-trips int8 in [-127, 127] exactly."""
    import os

    quantized = k_scale is not None
    s = k_cache.shape[2]
    w_pad = ((q.shape[2] + 7) // 8) * 8
    if quantized:
        from ..models.lm import quantize_kv

        k_new = quantize_kv(k_new, k_scale)
        v_new = quantize_kv(v_new, v_scale)
        group = q.shape[1] // k_cache.shape[1]
        ks_q = jnp.repeat(k_scale, group)  # per q-head
        vs_q = jnp.repeat(v_scale, group)
    if (
        force_reference
        or os.environ.get("VTX_FORCE_REF_ATTN")
        or jax.default_backend() != "tpu"
        or _pick_cache_block(s) is None
        or q.shape[3] % 128 != 0  # Mosaic lane tiling (vision towers
        # can carry head_dim 80 — see ops/attention.py dispatch)
    ):
        k_cache = update_cache_rows(
            k_cache, k_new.astype(k_cache.dtype), index, rows
        )
        v_cache = update_cache_rows(
            v_cache, v_new.astype(v_cache.dtype), index, rows
        )
        if quantized:
            kd = k_cache.astype(jnp.float32) * k_scale[None, :, None, None]
            vd = v_cache.astype(jnp.float32) * v_scale[None, :, None, None]
            out = decode_attention_reference(q, kd, vd, index + 1, rows)
        else:
            out = decode_attention_reference(
                q, k_cache, v_cache, index + 1, rows
            )
        return out, k_cache, v_cache
    if quantized or not os.environ.get("VTX_FUSED_WRITE"):
        # DEFAULT serving path (round 5): batched row writes (all RMW DMAs
        # overlapped) + the read-only attention kernel with cross-program
        # block-0 prefetch. Measured over the fused kernel at base/int8
        # (decode_force1_* / decode_xprog_*, 2026-08-21): b16 6,165 ->
        # 6,970 (split) -> 7,225 tok/s (+prefetch); b128 7,099 -> 7,982 ->
        # 8,600 — the RMW round trips and cold first-block DMA at the head
        # of every (row, head) program were the decode plateau's biggest
        # term. int8 caches REQUIRE this path (the fused kernel's
        # in-kernel RMW has no quantize step). VTX_FUSED_WRITE=1 restores
        # the fused kernel for ablations.
        k_cache, v_cache = _batch_row_write_pallas(
            k_cache, v_cache, k_new, v_new, index, rows
        )
        q_in = (
            q * ks_q[None, :, None, None].astype(q.dtype) if quantized else q
        )
        out = _decode_attention_pallas(
            q_in, k_cache, v_cache, index + 1, rows,
            pipelined=not os.environ.get("VTX_NO_XPROG_PREFETCH"),
        )
        if quantized:
            out = (out * vs_q[None, :, None, None]).astype(q.dtype)
        return out, k_cache, v_cache
    return _decode_attention_update_pallas(
        q, k_cache, v_cache, k_new, v_new, index, rows
    )


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    rows: jax.Array | None = None,
    force_reference: bool = False,
) -> jax.Array:
    """Dispatch: paged Pallas kernel on TPU, XLA reference elsewhere or for
    cache lengths not divisible by a supported block size.
    VTX_FORCE_REF_ATTN=1 forces the XLA path (perf-ablation harness)."""
    import os

    if (
        force_reference
        or os.environ.get("VTX_FORCE_REF_ATTN")
        or jax.default_backend() != "tpu"
        or _pick_cache_block(k_cache.shape[2]) is None
        or q.shape[3] % 128 != 0
    ):
        return decode_attention_reference(q, k_cache, v_cache, lengths, rows)
    return _decode_attention_pallas(
        q, k_cache, v_cache, lengths, rows,
        pipelined=bool(os.environ.get("VTX_XPROG_PREFETCH")),
    )


def _adopt_kernel(rows_ref, count_ref, src_hbm, dst_hbm, dst_out, sem, *,
                  park_len: int):
    """Copy staged prefill row ``i`` into physical cache row rows[i].

    One HBM->HBM DMA of the [Hkv, park_len, D] park region per grid step;
    lanes past ``count`` are skipped (stage batches are padded to the ring
    width). XLA expresses this as a gather+scatter, whose dynamic-index
    scatter lowering measured ~48 s/GB through the axon backend — 3 orders
    of magnitude off DMA speed; this kernel IS the scatter.
    """
    i = pl.program_id(0)

    @pl.when(i < count_ref[0])
    def _():
        # Compiled, dst_out IS dst_hbm (input_output_aliases) and the second
        # DMA is a duplicate write of identical bytes; in interpret mode the
        # alias is a copy, so both views must be written.
        for dst in (dst_hbm, dst_out):
            dma = pltpu.make_async_copy(
                src_hbm.at[i, :, pl.ds(0, park_len), :],
                dst.at[rows_ref[i], :, pl.ds(0, park_len), :],
                sem,
            )
            dma.start()
            dma.wait()


@functools.partial(jax.jit, static_argnames=("park_len", "interpret"))
def _adopt_rows_pallas(
    dst: jax.Array,  # [R, Hkv, S, D]
    src: jax.Array,  # [depth, Hkv, Spark, D]
    rows: jax.Array,  # [depth] target physical rows (distinct where valid)
    count: jax.Array,  # [] valid lane count
    park_len: int,
    interpret: bool = False,
) -> jax.Array:
    depth = src.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(depth,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_adopt_kernel, park_len=park_len),
        out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
        grid_spec=grid_spec,
        # Operands: rows=0, count=1, src=2, dst=3.
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(rows.astype(jnp.int32), count.reshape(1).astype(jnp.int32), src, dst)


def adopt_rows(
    dst: jax.Array,
    src: jax.Array,
    rows: jax.Array,
    count: jax.Array,
    park_len: int,
    force_reference: bool = False,
) -> jax.Array:
    """Scatter staged prefill rows into the paged cache at ``rows`` —
    in place on TPU (DMA kernel), via a sequential-scan fallback elsewhere.

    The fallback scan re-reads each target row before writing, so padded
    lanes (i >= count) are no-ops even when their pad index collides with
    a valid lane's row."""
    import os

    if (
        force_reference
        or os.environ.get("VTX_FORCE_REF_ATTN")
        or jax.default_backend() != "tpu"
    ):
        h, d = dst.shape[1], dst.shape[3]
        valid = jnp.arange(src.shape[0]) < count

        def body(acc, inp):
            row, s_row, ok = inp
            cur = jax.lax.dynamic_slice(
                acc, (row, 0, 0, 0), (1, h, park_len, d)
            )
            new = jnp.where(ok, s_row[None, :, :park_len, :], cur)
            return jax.lax.dynamic_update_slice(acc, new, (row, 0, 0, 0)), None

        dst, _ = jax.lax.scan(body, dst, (rows, src, valid))
        return dst
    return _adopt_rows_pallas(dst, src, rows, count, park_len)
