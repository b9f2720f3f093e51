"""Rotary position embeddings (RoPE).

Angles are precomputed once per model and gathered by absolute position, so
the same code path serves prefill (positions 0..S) and incremental decode
(position = cache index) without retracing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rope_angles", "apply_rope"]


def rope_angles(
    max_seq_len: int, head_dim: int, theta: float = 10000.0
) -> tuple[jax.Array, jax.Array]:
    """Precompute (cos, sin) tables of shape [max_seq_len, head_dim // 2]."""
    freqs = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    positions = jnp.arange(max_seq_len, dtype=jnp.float32)
    angles = jnp.outer(positions, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jax.Array, positions: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """Rotate x [B, H, S, D] by the angles at ``positions`` [B, S] or [S]."""
    if positions.ndim == 1:
        positions = positions[None, :]
    cos_g = cos[positions][:, None, :, :]  # [B, 1, S, D/2]
    sin_g = sin[positions][:, None, :, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rotated = jnp.concatenate(
        [x1 * cos_g - x2 * sin_g, x2 * cos_g + x1 * sin_g], axis=-1
    )
    return rotated.astype(x.dtype)
