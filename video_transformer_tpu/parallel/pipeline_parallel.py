"""Pipeline parallelism over the decoder block list (GPipe-style).

The decoder's layer stack is the natural stage boundary (ROADMAP round 1):
each device on the mesh "pipe" axis holds a contiguous slice of blocks, and
microbatches stream through the stages with `lax.ppermute` moving
activations device-to-device over ICI. Everything runs inside one
`shard_map`, so the schedule is a single compiled program:

  step t: every stage applies its blocks to its current microbatch, then
          passes the result to the right neighbor; stage 0 injects
          microbatch t, the last stage emits finished microbatches from
          t = S-1 onward (n_micro + S - 1 total steps — the classic GPipe
          bubble, fraction (S-1)/(n_micro + S - 1)).

Backward is jax.grad THROUGH the shard_map: ppermute is differentiable (its
transpose is the reverse permute), which yields a correct full-forward-then-
full-backward pipeline without hand-writing 1F1B. Activation memory is
bounded with per-block remat when requested.

Scope: embedding, vision encoder, and the logits head are replicated (they
are a small fraction of parameters at 7b scale — the 28 decoder blocks are
the memory); only the block stack is staged. Numerical parity with the
sequential decoder is pinned by tests/test_pipeline_parallel.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import compat_shard_map
from ..models.config import DecoderConfig
from ..ops.attention import flash_attention
from ..ops.norms import rms_norm
from ..ops.rotary import apply_rope, rope_angles

__all__ = [
    "PIPE_AXIS",
    "stack_block_params",
    "block_forward",
    "pipeline_blocks_forward",
    "build_pipe_mesh",
]

PIPE_AXIS = "pipe"


def build_pipe_mesh(
    n_stages: int, devices: list[jax.Device] | None = None
) -> Mesh:
    """A 1-D ("pipe",) mesh of n_stages devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devices)}")
    return jax.make_mesh(
        (n_stages,), (PIPE_AXIS,),
        devices=devices[:n_stages],
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def stack_block_params(decoder_params: dict[str, Any], num_layers: int):
    """layer_0..layer_{L-1} trees -> one tree with leading layer dim [L, ...].

    The leading dim shards over "pipe": each stage receives its contiguous
    [L/S, ...] slice with no reshaping.
    """
    layers = [decoder_params[f"layer_{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def block_forward(
    block_params: dict[str, Any],
    x: jax.Array,  # [B, S, H]
    positions: jax.Array,  # [B, S]
    cos: jax.Array,
    sin: jax.Array,
    config: DecoderConfig,
) -> jax.Array:
    """One decoder block, functionally (mirrors models/lm.py semantics)."""
    b, s, _ = x.shape
    dtype = x.dtype

    def dense(p, v):
        y = v @ p["kernel"].astype(dtype)
        if "bias" in p:  # Qwen2-family q/k/v biases (pre-RoPE)
            y = y + p["bias"].astype(dtype)
        return y

    h = rms_norm(x, block_params["attn_norm"]["weight"])
    attn_p = block_params["attn"]
    q = dense(attn_p["q"], h).reshape(b, s, config.num_heads, config.head_dim)
    k = dense(attn_p["k"], h).reshape(b, s, config.num_kv_heads, config.head_dim)
    v = dense(attn_p["v"], h).reshape(b, s, config.num_kv_heads, config.head_dim)
    q = apply_rope(q.transpose(0, 2, 1, 3), positions, cos, sin)
    k = apply_rope(k.transpose(0, 2, 1, 3), positions, cos, sin)
    out = flash_attention(q, k, v.transpose(0, 2, 1, 3), causal=True)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, -1)
    x = x + dense(attn_p["out"], out)

    h = rms_norm(x, block_params["mlp_norm"]["weight"])
    mlp = block_params["mlp"]
    h = dense(mlp["down"], jax.nn.silu(dense(mlp["gate"], h)) * dense(mlp["up"], h))
    return x + h


def _make_stage_fn(config: DecoderConfig, remat: bool):
    """The per-stage function: apply this stage's [L/S] blocks via lax.scan."""
    cos, sin = rope_angles(config.max_seq_len, config.head_dim, config.rope_theta)
    apply_block = block_forward
    if remat:
        apply_block = jax.checkpoint(block_forward, static_argnums=(5,))

    def stage_fn(local_params, h, pos):
        def body(carry, layer_params):
            return apply_block(layer_params, carry, pos, cos, sin, config), None

        out, _ = jax.lax.scan(body, h, local_params)
        return out

    return stage_fn


def _gpipe_fwd(stage_fn, n_stages: int, n_micro: int):
    """The forward tick program: inject -> stage -> emit -> ppermute."""
    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def pp(local_params, xm, posm):
        stage = jax.lax.axis_index(PIPE_AXIS)
        last = n_stages - 1
        state = jnp.zeros_like(xm[0])
        outputs = jnp.zeros_like(xm)
        # Positions travel with the activations so later stages rope
        # correctly even though they never see the raw inputs.
        pos_state = jnp.zeros_like(posm[0])

        for t in range(n_micro + n_stages - 1):
            inject = xm[min(t, n_micro - 1)]
            pos_inject = posm[min(t, n_micro - 1)]
            take = (stage == 0) & (t < n_micro)
            state = jnp.where(take, inject, state)
            pos_state = jnp.where(take, pos_inject, pos_state)

            state = stage_fn(local_params, state, pos_state)

            emit = t - last
            if emit >= 0:
                outputs = outputs.at[emit].set(
                    jnp.where(stage == last, state, outputs[emit])
                )
            state = jax.lax.ppermute(state, PIPE_AXIS, fwd_perm)
            pos_state = jax.lax.ppermute(pos_state, PIPE_AXIS, fwd_perm)

        # Replicate the last stage's outputs to every stage (the loss and
        # logits head run replicated).
        outputs = jnp.where(
            jax.lax.axis_index(PIPE_AXIS) == last, outputs, 0.0
        )
        return jax.lax.psum(outputs, PIPE_AXIS)

    return pp


def _pipeline_1f1b(config: DecoderConfig, mesh: Mesh, n_micro: int, remat: bool):
    """Pipeline with a hand-scheduled memory-bounded backward (1F1B-class).

    jax.grad through the GPipe forward stashes every microbatch's stage
    activations until the full backward — O(n_micro) per stage. Here the
    pipeline is a custom_vjp whose backward runs TWO waves in one tick
    loop:

      recompute wave (left->right): re-runs the forward exactly as GPipe,
        stashing each stage's INPUT activation in a rotating buffer;
      backward wave (right->left), offset by (S-1) ticks: stage i runs the
        VJP of its stage function against the cotangent arriving from stage
        i+1, reading its input activation from the buffer slot the
        recompute wave filled 2i ticks earlier.

    A stashed activation lives at most 2(S-1) ticks, so the buffer depth is
    2S-1 — activation memory O(stages), independent of n_micro. The FLOPs
    price of that bound is one extra stage forward per microbatch vs
    GPipe+remat (primal forward + recompute wave + the VJP's internal
    forward = 3 forwards + backward, vs remat's 2 + backward — roughly
    +25% of a fused fwd+bwd). The bubble is the schedule's
    n_micro + 2(S-1) ticks — same asymptotics as separate forward+backward
    GPipe passes.

    ``remat`` is deliberately dropped inside this backward: the primal and
    the recompute wave are never differentiated through (jax.checkpoint
    would be a no-op), and the per-tick VJP already bounds its transient to
    one microbatch's stage residuals — per-block remat there would only
    re-run each block a fourth time for no persistent-memory gain.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    last = n_stages - 1
    del remat
    stage_fn = _make_stage_fn(config, remat=False)
    fwd_perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    bwd_perm = [(i, (i - 1) % n_stages) for i in range(n_stages)]

    fwd_sharded = compat_shard_map(
        _gpipe_fwd(stage_fn, n_stages, n_micro),
        mesh=mesh, in_specs=(P(PIPE_AXIS), P(), P()), out_specs=P(),
    )

    def bwd_pp(local_params, xm, posm, gm):
        stage = jax.lax.axis_index(PIPE_AXIS)
        depth = 2 * n_stages - 1  # max stash lifetime 2(S-1) ticks, +1 slack
        offset = last  # backward wave enters when the first output exists
        fwd_state = jnp.zeros_like(xm[0])
        pos_state = jnp.zeros_like(posm[0])
        cot_state = jnp.zeros_like(xm[0])
        acts = jnp.zeros((depth,) + xm.shape[1:], xm.dtype)
        param_grads = jax.tree_util.tree_map(jnp.zeros_like, local_params)
        dx = jnp.zeros_like(xm)

        for t in range(n_micro + 2 * last):
            # ---- recompute wave (the GPipe forward, replayed) ----
            wave_live = t < n_micro + last
            if wave_live:
                take = (stage == 0) & (t < n_micro)
                fwd_state = jnp.where(take, xm[min(t, n_micro - 1)], fwd_state)
                pos_state = jnp.where(
                    take, posm[min(t, n_micro - 1)], pos_state
                )
                acts = acts.at[t % depth].set(fwd_state)
                new_fwd = stage_fn(local_params, fwd_state, pos_state)

            # ---- backward wave ----
            # Stage i processes microbatch m = t - offset - (last - i); its
            # input activation was stashed by the wave at tick i + m, i.e.
            # buffer slot (t - offset - last + 2i) mod depth.
            m = t - offset - last + stage
            valid = (m >= 0) & (m < n_micro)
            m_c = jnp.clip(m, 0, n_micro - 1)
            g_in = jnp.where(
                stage == last,
                jax.lax.dynamic_index_in_dim(
                    gm, jnp.clip(t - offset, 0, n_micro - 1), 0, keepdims=False
                ),
                cot_state,
            )
            a = jnp.take(acts, (t - offset - last + 2 * stage) % depth, axis=0)
            pos_b = jax.lax.dynamic_index_in_dim(posm, m_c, 0, keepdims=False)
            _, vjp_fn = jax.vjp(
                lambda p, h: stage_fn(p, h, pos_b), local_params, a
            )
            dparams, da = vjp_fn(g_in.astype(a.dtype))
            param_grads = jax.tree_util.tree_map(
                lambda acc, dp: acc + jnp.where(valid, dp, 0),
                param_grads, dparams,
            )
            da = jnp.where(valid, da, 0)
            # Stage 0's input grad is the pipeline's dx for microbatch
            # m0 = t - offset - last (a trace-time constant).
            m0 = t - offset - last
            if 0 <= m0 < n_micro:
                dx = dx.at[m0].set(jnp.where(stage == 0, da, dx[m0]))

            if wave_live:
                fwd_state = jax.lax.ppermute(new_fwd, PIPE_AXIS, fwd_perm)
                pos_state = jax.lax.ppermute(pos_state, PIPE_AXIS, fwd_perm)
            cot_state = jax.lax.ppermute(da, PIPE_AXIS, bwd_perm)

        dx = jnp.where(stage == 0, dx, 0)
        return param_grads, jax.lax.psum(dx, PIPE_AXIS)

    bwd_sharded = compat_shard_map(
        bwd_pp,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P(), P()),
        out_specs=(P(PIPE_AXIS), P()),
    )

    @jax.custom_vjp
    def run(stacked_params, xm, posm):
        return fwd_sharded(stacked_params, xm, posm)

    def run_fwd(stacked_params, xm, posm):
        return run(stacked_params, xm, posm), (stacked_params, xm, posm)

    def run_bwd(res, g):
        stacked_params, xm, posm = res
        dparams, dx = bwd_sharded(stacked_params, xm, posm, g)
        # Integer positions take a float0 cotangent.
        dpos = np.zeros(posm.shape, jax.dtypes.float0)
        return dparams, dx, dpos

    run.defvjp(run_fwd, run_bwd)
    return run


def pipeline_blocks_forward(
    stacked_params: Any,  # leaves [L, ...], L % n_stages == 0
    x: jax.Array,  # [B, S, H] block-stack input (post-embedding)
    positions: jax.Array,  # [B, S]
    config: DecoderConfig,
    mesh: Mesh,
    n_micro: int,
    remat: bool = False,
    schedule: str = "gpipe",
) -> jax.Array:
    """Run the staged block stack over x with GPipe microbatching.

    Returns [B, S, H] (the last stage's output, replicated over "pipe").
    The batch splits into ``n_micro`` microbatches; utilization is
    n_micro / (n_micro + S - 1), so pick n_micro >= 4*S in production.
    ``schedule="1f1b"`` swaps in the memory-bounded hand-scheduled
    backward (_pipeline_1f1b): O(stages) stashed activations instead of
    jax.grad's O(n_micro) — pick it when n_micro must grow to fill the
    bubble but activation memory is the binding constraint.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} must divide into {n_micro} microbatches")
    if schedule not in ("gpipe", "1f1b"):
        raise ValueError(f"unknown pipeline schedule: {schedule!r}")

    mb = b // n_micro
    x_micro = x.reshape(n_micro, mb, *x.shape[1:])
    pos_micro = positions.reshape(n_micro, mb, positions.shape[-1])

    if schedule == "1f1b":
        run = _pipeline_1f1b(config, mesh, n_micro, remat)
        out_micro = run(stacked_params, x_micro, pos_micro)
    else:
        stage_fn = _make_stage_fn(config, remat)
        pp_sharded = compat_shard_map(
            _gpipe_fwd(stage_fn, n_stages, n_micro),
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P(), P()),
            out_specs=P(),
        )
        out_micro = pp_sharded(stacked_params, x_micro, pos_micro)
    return out_micro.reshape(b, *x.shape[1:])


def pipeline_vlm_logits(
    model: Any,  # VideoLM
    variables: Any,
    patches: jax.Array,  # [B, N, patch_dim]
    tokens: jax.Array,  # [B, St]
    mesh: Mesh,
    n_micro: int,
    remat: bool = False,
    schedule: str = "gpipe",
) -> jax.Array:
    """VLM training forward with the decoder block stack pipelined.

    Vision encoder, embedding, and the tied logits head run replicated
    (small fraction of weights); the [video, text] sequence streams through
    the staged block stack. Gradients flow through stack_block_params'
    jnp.stack (its transpose unstacks back onto layer_i leaves), so
    jax.grad of a loss on these logits trains the ORIGINAL parameter tree —
    this is the Trainer's PP path.
    """
    from ..models.vlm import VideoLM

    cfg = model.config.decoder
    video = model.apply(variables, patches, method=VideoLM.encode_video)
    decoder_params = variables["params"]["decoder"]
    embedding = decoder_params["embed"]["embedding"]
    dtype = video.dtype
    text = jnp.take(embedding, tokens, axis=0).astype(dtype)
    x = jnp.concatenate([video, text], axis=1)
    b, s, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(s)[None, :].astype(jnp.int32), (b, s))

    stacked = stack_block_params(decoder_params, cfg.num_layers)
    x = pipeline_blocks_forward(
        stacked, x, positions, cfg, mesh, n_micro, remat=remat,
        schedule=schedule,
    )
    x = rms_norm(x, decoder_params["final_norm"]["weight"])
    head = decoder_params.get("lm_head", embedding)  # untied if present
    return jnp.einsum(
        "bsh,vh->bsv", x.astype(jnp.float32), head.astype(jnp.float32)
    )


def pipeline_decoder_apply(
    variables: Any,
    tokens: jax.Array,  # [B, S]
    config: DecoderConfig,
    mesh: Mesh,
    n_micro: int,
    remat: bool = False,
    schedule: str = "gpipe",
) -> jax.Array:
    """Full decoder forward (embed -> staged blocks -> norm -> tied logits)
    with the block stack pipelined. Drop-in equal to Decoder.__call__ on the
    training path (no cache); parity pinned in tests."""
    decoder_params = variables["params"]["decoder"]
    embedding = decoder_params["embed"]["embedding"]
    dtype = jnp.dtype("float32") if embedding.dtype == jnp.float32 else embedding.dtype

    x = jnp.take(embedding, tokens, axis=0).astype(dtype)
    b, s, _ = x.shape
    positions = jnp.broadcast_to(jnp.arange(s)[None, :].astype(jnp.int32), (b, s))

    stacked = stack_block_params(decoder_params, config.num_layers)
    x = pipeline_blocks_forward(
        stacked, x, positions, config, mesh, n_micro, remat=remat,
        schedule=schedule,
    )
    x = rms_norm(x, decoder_params["final_norm"]["weight"])
    head = decoder_params.get("lm_head", embedding)  # untied if present
    logits = jnp.einsum(
        "bsh,vh->bsv", x.astype(jnp.float32), head.astype(jnp.float32)
    )
    return logits
