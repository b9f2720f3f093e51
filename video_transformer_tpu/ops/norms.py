"""Normalization primitives.

RMSNorm is expressed in plain jnp: XLA fuses the reduction + rsqrt + scale
into neighboring ops on TPU, so a hand-written kernel buys nothing here —
the Pallas budget goes to attention and the embed path instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rms_norm"]


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS normalization over the last axis, computed in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
