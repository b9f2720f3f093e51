"""Expert parallelism: a top-2 MoE SwiGLU block sharded expert-per-device.

Neither the reference nor the shipped presets use mixture-of-experts, but
the parallelism seam is part of the framework contract (SURVEY §2.5): when
a future preset swaps dense MLPs for experts, this module provides the
TPU-native execution — experts shard over the "expert" mesh axis, tokens
route to their top-k experts with an all-to-all-free DENSE dispatch
(every device computes its local experts over the full token batch, then
masks and psums), which is the right trade below ~64 experts on ICI: the
matmuls stay MXU-shaped and the only collective is one psum of activations.

Capacity-style sparse dispatch (true all-to-all) matters at hundreds of
experts; the seam isolates that as a future swap without touching callers.
Router correctness, load-balance auxiliary loss, and parity against a
single-device dense evaluation are pinned in tests/test_expert_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import compat_shard_map

__all__ = ["EXPERT_AXIS", "build_expert_mesh", "init_moe_params", "moe_swiglu"]

EXPERT_AXIS = "expert"


def build_expert_mesh(
    n_devices: int, devices: list[jax.Device] | None = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return jax.make_mesh(
        (n_devices,), (EXPERT_AXIS,),
        devices=devices[:n_devices],
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def init_moe_params(
    rng: jax.Array, hidden: int, mlp_dim: int, n_experts: int
) -> dict[str, jax.Array]:
    """Router + stacked expert weights (leading dim shards over 'expert')."""
    keys = jax.random.split(rng, 4)
    scale = hidden ** -0.5
    return {
        "router": jax.random.normal(keys[0], (hidden, n_experts)) * scale,
        "gate": jax.random.normal(keys[1], (n_experts, hidden, mlp_dim)) * scale,
        "up": jax.random.normal(keys[2], (n_experts, hidden, mlp_dim)) * scale,
        "down": jax.random.normal(keys[3], (n_experts, mlp_dim, hidden))
        * (mlp_dim ** -0.5),
    }


def _top2_routing(logits: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[T, E] router logits -> (combine weights [T, E], aux loss scalar)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top2 = jax.lax.top_k(probs, 2)[0]  # [T, 2]
    threshold = top2[:, 1:2]
    mask = (probs >= threshold).astype(jnp.float32)  # keep top-2 entries
    weights = probs * mask
    weights = weights / jnp.maximum(weights.sum(-1, keepdims=True), 1e-9)
    # Switch-style load-balance loss: E * sum_e (dispatch_fraction_e *
    # mean_prob_e), where dispatch counts each token's PRIMARY expert
    # (the >= threshold mask double-counts and degenerates at uniform).
    n_experts = logits.shape[-1]
    primary = jnp.argmax(probs, axis=-1)
    fraction = jnp.mean(
        jax.nn.one_hot(primary, n_experts, dtype=jnp.float32), axis=0
    )
    mean_prob = probs.mean(axis=0)
    aux = n_experts * jnp.sum(fraction * mean_prob)
    return weights, aux


def moe_swiglu(
    params: dict[str, jax.Array],
    x: jax.Array,  # [B, S, H]
    mesh: Mesh | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-2 MoE SwiGLU. Returns (output [B, S, H], load-balance aux loss).

    mesh=None evaluates densely on one device (the test oracle); with a
    mesh, each device computes its LOCAL experts over all tokens and a psum
    combines — weights stay resident per device (the point of EP).
    """
    b, s, h = x.shape
    tokens = x.reshape(b * s, h)
    logits = tokens.astype(jnp.float32) @ params["router"].astype(jnp.float32)
    weights, aux = _top2_routing(logits)  # [T, E]

    def expert_eval(gate_w, up_w, down_w, w_col):
        hidden = jax.nn.silu(tokens @ gate_w.astype(x.dtype)) * (
            tokens @ up_w.astype(x.dtype)
        )
        out = hidden @ down_w.astype(x.dtype)
        return out * w_col[:, None].astype(x.dtype)

    if mesh is None:
        out = jnp.zeros_like(tokens)
        for e in range(params["router"].shape[1]):
            out = out + expert_eval(
                params["gate"][e], params["up"][e], params["down"][e],
                weights[:, e],
            )
        return out.reshape(b, s, h), aux

    def ep(toks, gate_l, up_l, down_l, weights_l):
        # gate_l [E/N, H, M]; weights_l [T, E/N] (this device's columns).
        def body(carry, packed):
            gate_w, up_w, down_w, w_col = packed
            hidden = jax.nn.silu(toks @ gate_w.astype(x.dtype)) * (
                toks @ up_w.astype(x.dtype)
            )
            contrib = (hidden @ down_w.astype(x.dtype)) * w_col[:, None].astype(
                x.dtype
            )
            return carry + contrib, None

        local = jnp.zeros_like(toks)
        local, _ = jax.lax.scan(
            body, local,
            (gate_l, up_l, down_l, jnp.moveaxis(weights_l, -1, 0)),
        )
        return jax.lax.psum(local, EXPERT_AXIS)

    out = compat_shard_map(
        ep,
        mesh=mesh,
        in_specs=(
            P(), P(EXPERT_AXIS), P(EXPERT_AXIS), P(EXPERT_AXIS),
            P(None, EXPERT_AXIS),
        ),
        out_specs=P(),
    )(tokens, params["gate"], params["up"], params["down"], weights)
    return out.reshape(b, s, h), aux
