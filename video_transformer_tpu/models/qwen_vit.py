"""Qwen2-VL-compatible vision tower, TPU-native.

A faithful JAX implementation of Qwen2-VL's ViT semantics so REAL vision
weights port losslessly (verified bitwise-close against the HF torch module
in tests/test_qwen_port.py): conv3d patch embedding expressed as one MXU
matmul over flattened tubelets (stride == kernel makes them identical),
pre-LayerNorm blocks with fused-QKV attention under 2D rotary embeddings,
QuickGELU MLP, and the 2x2 PatchMerger projecting into the LM width.

Differences from the native encoder (models/vit.py) are intentional — this
module's architecture is pinned by the source checkpoint format
(HF transformers Qwen2VisionTransformerPretrainedModel), not by TPU
preference; XLA still fuses it onto the MXU fine. Static shapes throughout:
the (t, h, w) patch grid is fixed by the preset, so rotary tables and merge
reshapes are compile-time constants.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QwenVisionConfig", "QwenVisionEncoder", "qwen_patchify"]


@dataclass(frozen=True)
class QwenVisionConfig:
    """Geometry of the Qwen2-VL vision tower (HF Qwen2VLVisionConfig)."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 3584  # LM width the merger projects into
    in_channels: int = 3
    # Clip geometry (frames are resized so H == W == image_size).
    image_size: int = 224
    num_frames: int = 8

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @property
    def grid(self) -> tuple[int, int, int]:
        side = self.image_size // self.patch_size
        return (self.num_frames // self.temporal_patch_size, side, side)

    @property
    def tokens_per_clip(self) -> int:
        t, h, w = self.grid
        return t * h * w

    @property
    def merged_tokens_per_clip(self) -> int:
        return self.tokens_per_clip // self.spatial_merge_size**2

    @property
    def patch_dim(self) -> int:
        return (
            self.in_channels * self.temporal_patch_size * self.patch_size**2
        )


def qwen_patchify(frames: jax.Array, config: QwenVisionConfig) -> jax.Array:
    """[B, T, H, W, 3] -> [B, N, C*Tp*P*P] in Qwen2-VL's patch order.

    Layout matches the HF processor: patch vectors are (channel, temporal,
    row, col)-ordered, and patches are sequenced in 2x2 spatial-merge-block
    order within each temporal group (the order rot_pos_emb and the merger
    assume).
    """
    b, t, h, w, c = frames.shape
    p = config.patch_size
    tp = config.temporal_patch_size
    m = config.spatial_merge_size
    gh, gw = h // p, w // p
    x = frames.reshape(b, t // tp, tp, gh // m, m, p, gw // m, m, p, c)
    # -> [B, T', GH/m, GW/m, m, m, C, tp, p, p]  (merge-block grouping, then
    #    conv-kernel channel-major patch layout)
    x = x.transpose(0, 1, 3, 6, 4, 7, 9, 2, 5, 8)
    return x.reshape(b, (t // tp) * gh * gw, c * tp * p * p)


def _rotary_table(config: QwenVisionConfig) -> np.ndarray:
    """Per-patch rotary angles [N, head_dim//2]: cat(h-freqs, w-freqs).

    Positions follow the merge-block patch order produced by qwen_patchify
    (HF rot_pos_emb permutation).
    """
    gt, gh, gw = config.grid
    m = config.spatial_merge_size
    dim = config.head_dim // 2
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    )

    hpos = np.broadcast_to(np.arange(gh)[:, None], (gh, gw))
    wpos = np.broadcast_to(np.arange(gw)[None, :], (gh, gw))

    def block_order(grid: np.ndarray) -> np.ndarray:
        return (
            grid.reshape(gh // m, m, gw // m, m)
            .transpose(0, 2, 1, 3)
            .reshape(-1)
        )

    hpos, wpos = block_order(hpos), block_order(wpos)
    freqs = np.concatenate(
        [hpos[:, None] * inv_freq[None, :], wpos[:, None] * inv_freq[None, :]],
        axis=1,
    )  # [gh*gw, head_dim//2]
    freqs = np.tile(freqs, (gt, 1))
    return freqs.astype(np.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_vision_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array
) -> jax.Array:
    """x [B, H, N, D]; cos/sin [N, D] (fp32 rotation, dtype restored)."""
    orig = x.dtype
    x32 = x.astype(jnp.float32)
    out = x32 * cos[None, None] + _rotate_half(x32) * sin[None, None]
    return out.astype(orig)


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return (normed * scale + bias).astype(x.dtype)


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class _VisionBlock(nn.Module):
    config: QwenVisionConfig
    frame_tokens: int = 0  # patches per temporal group (attention segment)

    @nn.compact
    def __call__(
        self, x: jax.Array, cos: jax.Array, sin: jax.Array
    ) -> jax.Array:
        cfg = self.config
        d = cfg.embed_dim
        b, n, _ = x.shape
        dtype = x.dtype

        scale1 = self.param("norm1_scale", nn.initializers.ones, (d,))
        bias1 = self.param("norm1_bias", nn.initializers.zeros, (d,))
        h = _layer_norm(x, scale1, bias1)

        qkv = nn.Dense(3 * d, use_bias=True, dtype=dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t: jax.Array) -> jax.Array:
            return t.reshape(b, n, cfg.num_heads, cfg.head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)
        q = _apply_vision_rope(q, cos, sin)
        k = _apply_vision_rope(k, cos, sin)

        # Qwen2-VL vision attention is SEGMENTED per temporal frame group
        # (cu_seqlens = repeat_interleave(h*w, t) in the HF tower): patches
        # attend within their own frame pair only. Fold the static temporal
        # groups into the batch — XLA sees one bigger batched attention, no
        # masks needed.
        groups = n // self.frame_tokens
        fold = lambda a: (
            a.reshape(b, cfg.num_heads, groups, self.frame_tokens, cfg.head_dim)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b * groups, cfg.num_heads, self.frame_tokens, cfg.head_dim)
        )

        from ..ops.attention import flash_attention

        attn = flash_attention(fold(q), fold(k), fold(v), causal=False)
        attn = (
            attn.reshape(b, groups, cfg.num_heads, self.frame_tokens, cfg.head_dim)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b, cfg.num_heads, n, cfg.head_dim)
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, d)
        x = x + nn.Dense(d, use_bias=True, dtype=dtype, name="proj")(attn)

        scale2 = self.param("norm2_scale", nn.initializers.ones, (d,))
        bias2 = self.param("norm2_bias", nn.initializers.zeros, (d,))
        h = _layer_norm(x, scale2, bias2)
        h = nn.Dense(cfg.mlp_dim, use_bias=True, dtype=dtype, name="fc1")(h)
        h = _quick_gelu(h)
        h = nn.Dense(d, use_bias=True, dtype=dtype, name="fc2")(h)
        return x + h


class QwenVisionEncoder(nn.Module):
    """Patch embed -> depth x blocks -> 2x2 PatchMerger -> LM width."""

    config: QwenVisionConfig

    @nn.compact
    def __call__(
        self, patches: jax.Array, dtype: jnp.dtype = jnp.bfloat16
    ) -> jax.Array:
        """patches [B, N, patch_dim] (qwen_patchify order) -> [B, N/4, hidden_size]."""
        cfg = self.config
        # Conv3d with stride == kernel == tubelet is exactly one matmul over
        # the flattened tubelet; the port pre-permutes the conv kernel.
        x = nn.Dense(
            cfg.embed_dim, use_bias=False, dtype=dtype, name="patch_embed"
        )(patches.astype(dtype))

        angles = jnp.asarray(_rotary_table(cfg))  # [N, head_dim//2]
        emb = jnp.concatenate([angles, angles], axis=-1)  # [N, head_dim]
        cos, sin = jnp.cos(emb), jnp.sin(emb)

        _, gh, gw = cfg.grid
        for i in range(cfg.depth):
            x = _VisionBlock(cfg, frame_tokens=gh * gw, name=f"block_{i}")(
                x, cos, sin
            )

        # PatchMerger: LayerNorm, group each 2x2 spatial block (consecutive
        # in qwen_patchify order), two-layer MLP with exact GELU.
        ln_scale = self.param("merger_ln_scale", nn.initializers.ones, (cfg.embed_dim,))
        ln_bias = self.param("merger_ln_bias", nn.initializers.zeros, (cfg.embed_dim,))
        x = _layer_norm(x, ln_scale, ln_bias)
        b, n, d = x.shape
        group = cfg.spatial_merge_size**2
        x = x.reshape(b, n // group, group * d)
        x = nn.Dense(group * d, use_bias=True, dtype=dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.hidden_size, use_bias=True, dtype=dtype, name="merger_fc2")(x)
        return x
