"""Video ViT encoder: tubelet embedding + bidirectional transformer.

Replaces the reference's "upload MP4 to Gemini" step
(content_analyzer.py:238-294) with on-device vision encoding. Frames are
split into non-overlapping (t, p, p) tubelets; patchification is pure
reshape/transpose (free at the XLA level) followed by one large MXU matmul.
Position information uses factorized 3D sincos embeddings, so clip geometry
can change without re-learning positions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import flash_attention
from ..ops.norms import rms_norm
from .config import EncoderConfig

__all__ = ["VideoEncoder", "tubelet_patchify", "sincos_3d_positions"]


def tubelet_patchify(frames: jax.Array, patch: int, tubelet_t: int) -> jax.Array:
    """[B, T, H, W, 3] -> [B, N, tubelet_t * patch * patch * 3].

    N = (T / tubelet_t) * (H / patch) * (W / patch), ordered time-major then
    raster within each frame group — matching sincos_3d_positions.
    """
    b, t, h, w, c = frames.shape
    tt = tubelet_t
    gh, gw = h // patch, w // patch
    x = frames.reshape(b, t // tt, tt, gh, patch, gw, patch, c)
    # -> [B, T', GH, GW, tt, patch, patch, C]
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (t // tt) * gh * gw, tt * patch * patch * c)


def sincos_3d_positions(config: EncoderConfig) -> np.ndarray:
    """Factorized (t, y, x) sincos position table [N, hidden_dim].

    hidden_dim is split 1/4 time, 3/8 row, 3/8 col (rounded to even sizes).
    """
    dim = config.hidden_dim
    t_dim = (dim // 4) // 2 * 2
    rest = dim - t_dim
    y_dim = (rest // 2) // 2 * 2
    x_dim = dim - t_dim - y_dim

    grid_t = config.num_frames // config.tubelet_t
    grid_s = config.image_size // config.patch_size

    def table(length: int, d: int) -> np.ndarray:
        pos = np.arange(length, dtype=np.float64)[:, None]
        freq = np.exp(-np.log(10000.0) * np.arange(0, d, 2, dtype=np.float64) / d)
        angles = pos * freq[None, :]
        return np.concatenate([np.sin(angles), np.cos(angles)], axis=1)

    t_table = table(grid_t, t_dim)  # [T', t_dim]
    y_table = table(grid_s, y_dim)
    x_table = table(grid_s, x_dim)

    out = np.zeros((grid_t, grid_s, grid_s, dim), dtype=np.float32)
    out[..., :t_dim] = t_table[:, None, None, :]
    out[..., t_dim : t_dim + y_dim] = y_table[None, :, None, :]
    out[..., t_dim + y_dim :] = x_table[None, None, :, :]
    return out.reshape(grid_t * grid_s * grid_s, dim)


class EncoderBlock(nn.Module):
    config: EncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = x.dtype
        b, n, _ = x.shape

        h = rms_norm(x, self.param("attn_norm", nn.initializers.ones, (cfg.hidden_dim,)))
        qkv_dim = cfg.num_heads * cfg.head_dim
        q = nn.Dense(qkv_dim, use_bias=False, dtype=dtype, name="q")(h)
        k = nn.Dense(qkv_dim, use_bias=False, dtype=dtype, name="k")(h)
        v = nn.Dense(qkv_dim, use_bias=False, dtype=dtype, name="v")(h)
        q = q.reshape(b, n, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        attn = flash_attention(q, k, v, causal=False)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, qkv_dim)
        x = x + nn.Dense(cfg.hidden_dim, use_bias=False, dtype=dtype, name="out")(attn)

        h = rms_norm(x, self.param("mlp_norm", nn.initializers.ones, (cfg.hidden_dim,)))
        gate = nn.Dense(cfg.mlp_dim, use_bias=False, dtype=dtype, name="gate")(h)
        up = nn.Dense(cfg.mlp_dim, use_bias=False, dtype=dtype, name="up")(h)
        h = nn.Dense(cfg.hidden_dim, use_bias=False, dtype=dtype, name="down")(
            nn.silu(gate) * up
        )
        return x + h


class VideoEncoder(nn.Module):
    """Tubelet-embedded bidirectional transformer over video tokens."""

    config: EncoderConfig

    @nn.compact
    def __call__(self, patches: jax.Array, dtype: jnp.dtype = jnp.bfloat16) -> jax.Array:
        """patches: [B, N, patch_dim] float (already normalized) -> [B, N, H]."""
        cfg = self.config
        x = nn.Dense(cfg.hidden_dim, use_bias=False, dtype=dtype, name="patch_embed")(
            patches.astype(dtype)
        )
        positions = jnp.asarray(sincos_3d_positions(cfg), dtype)
        x = x + positions[None, : x.shape[1], :]
        for i in range(cfg.num_layers):
            x = EncoderBlock(cfg, name=f"layer_{i}")(x)
        x = rms_norm(
            x, self.param("final_norm", nn.initializers.ones, (cfg.hidden_dim,))
        )
        return x
