"""Decoder-only language model (pre-norm, RoPE, GQA, SwiGLU).

Functional Flax modules with an explicit KV cache threaded through calls —
no mutable state, so prefill and decode jit/scan cleanly and the cache can be
sharded with the rest of the activations. Replaces the reference's cloud LLM
text generation (content_analyzer.py:_generate_content) with an on-device
implementation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import flash_attention
from ..ops.norms import rms_norm
from ..ops.rotary import apply_rope, rope_angles
from .config import DecoderConfig

__all__ = ["Decoder", "init_kv_cache"]

Cache = dict[str, Any]


def init_kv_cache(
    config: DecoderConfig,
    batch: int,
    max_len: int,
    dtype: jnp.dtype,
    quant: bool = False,
) -> Cache:
    """Allocate an empty KV cache: per-layer k/v LISTS of [B, Hkv, max_len, D].

    Per-layer leaves (not one stacked [L, ...] tensor) so each decode step
    touches only its own layer's buffer: the stacked layout's
    slice-out/scatter/slice-in chain defeated XLA's in-place analysis inside
    the decode while_loop and cost a full-cache copy per step (measured
    ~19 MB/row/step at base geometry — the dominant decode cost).

    ``index`` is PER ROW ([B]) so batch rows can advance asynchronously —
    grammar fast-forward appends different run lengths per row.

    ``quant=True`` stores K/V as int8 with per-(layer, head) f32 scales —
    halving the decode step's dominant HBM stream (the measured KV-length
    slope, tools/stream_bench.py 2026-08-21: 3.4 us/prompt-token at b16 —
    over half the step at serving note lengths). Scales start at a tiny
    epsilon and are CALIBRATED IN-PROGRAM by the prefill block (amax with
    1.5x margin, Attention below): they ride the cache pytree through the
    decode loop, so no separate calibration pass or compile exists.
    """
    shape = (batch, config.num_kv_heads, max_len, config.head_dim)
    kv_dtype = jnp.int8 if quant else dtype
    cache: Cache = {
        "k": [jnp.zeros(shape, kv_dtype) for _ in range(config.num_layers)],
        "v": [jnp.zeros(shape, kv_dtype) for _ in range(config.num_layers)],
        "index": jnp.zeros((batch,), jnp.int32),
    }
    if quant:
        cache["k_scale"] = [
            jnp.full((config.num_kv_heads,), 1e-6, jnp.float32)
            for _ in range(config.num_layers)
        ]
        cache["v_scale"] = [
            jnp.full((config.num_kv_heads,), 1e-6, jnp.float32)
            for _ in range(config.num_layers)
        ]
    return cache


def quantize_kv(x: jax.Array, scale: jax.Array) -> jax.Array:
    """bf16/f32 [B, Hkv, S, D] -> int8 rows under per-head ``scale`` [Hkv]."""
    q = jnp.round(x.astype(jnp.float32) / scale[None, :, None, None])
    return jnp.clip(q, -127, 127).astype(jnp.int8)


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, weight)


class QDense(nn.Module):
    """Dense (bias optional) that transparently serves int8/int4 weight-only
    quant.

    Parameter layout matches nn.Dense (one ``kernel`` [in, out], optional
    ``bias`` [out]), so checkpoints interchange. When the caller's variables
    carry a ``quant`` collection (models/quant.py), the kernel leaf is int8
    — or nibble-packed uint8 [in//2, out] for int4 — and the matching
    per-output-channel ``scale`` multiplies the matmul output. XLA streams
    the quantized kernel from HBM (half / quarter the bytes of bf16) and
    fuses the on-load convert and the scale epilogue. The int4 path runs
    TWO half-dots over the even/odd input features so the nibble extract is
    a pure elementwise producer of each dot operand (no reshape between —
    reshapes break XLA's fusion into the dot's operand load). The bias
    (used for Qwen2-family q/k/v, which carry projection biases) is added
    after the scale epilogue, matching the float semantics W@x + b.
    """

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # Packed-int4 kernels are [in//2, out] uint8 — read them directly:
        # self.param would reject the halved shape (flax checks init-shape
        # equality; the packed carrier is a serving-only transform).
        if (
            self.has_variable("params", "kernel")
            and self.get_variable("params", "kernel").dtype == jnp.uint8
        ):
            kernel = self.get_variable("params", "kernel")
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (x.shape[-1], self.features),
                jnp.float32,
            )
        if kernel.dtype == jnp.uint8:  # packed int4 (models/quant.py)
            from ..ops.int4_matmul import int4_matmul

            y = int4_matmul(x.astype(self.dtype), kernel).astype(self.dtype)
        else:
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.has_variable("quant", "scale"):
            scale = self.get_variable("quant", "scale")
            y = y * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def _fused_dense(
    mod: nn.Module,
    x: jax.Array,
    dtype: Any,
    kernel_name: str,
    scale_name: str,
    bias_name: str | None = None,
) -> jax.Array:
    """One wide matmul over a serve-time fused kernel (models/fuse.py).

    Mirrors QDense exactly — int4 packed-carrier dispatch, per-output-channel
    dequant scale epilogue, bias after the scale — just reading the fused
    leaf installed at the caller's scope instead of a per-projection
    submodule."""
    kernel = mod.get_variable("params", kernel_name)
    if kernel.dtype == jnp.uint8:  # packed int4 (models/quant.py)
        from ..ops.int4_matmul import int4_matmul

        y = int4_matmul(x.astype(dtype), kernel).astype(dtype)
    else:
        y = x.astype(dtype) @ kernel.astype(dtype)
    if mod.has_variable("quant", scale_name):
        y = y * mod.get_variable("quant", scale_name).astype(dtype)
    if bias_name is not None and mod.has_variable("params", bias_name):
        y = y + mod.get_variable("params", bias_name).astype(dtype)
    return y


class Attention(nn.Module):
    config: DecoderConfig
    layer_idx: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, S, H]
        positions: jax.Array,  # [B, S] or [S]
        rope: tuple[jax.Array, jax.Array],
        cache: Cache | None,
        prefill: bool = False,
    ) -> tuple[jax.Array, Cache | None]:
        cfg = self.config
        b, s, _ = x.shape
        dtype = x.dtype

        # Separate q/k/v projections: each output dim is heads*head_dim and
        # shards cleanly over the 'model' mesh axis (a fused qkv concat would
        # split incorrectly under tensor parallelism).
        q_dim = cfg.num_heads * cfg.head_dim
        kv_dim = cfg.num_kv_heads * cfg.head_dim
        if self.has_variable("params", "qkv_kernel"):
            # Serve-time fused projection (models/fuse.py): one wide matmul
            # dispatch instead of three narrow ones. Column-wise identical
            # math; split recovers q/k/v.
            qkv = _fused_dense(
                self, x, dtype, "qkv_kernel", "qkv_scale", "qkv_bias"
            )
            q, k, v = jnp.split(qkv, [q_dim, q_dim + kv_dim], axis=-1)
        else:
            # Qwen2-family checkpoints add q/k/v biases BEFORE RoPE: the
            # k-bias gets rotated per position, so it must live here, not
            # be folded.
            q = QDense(q_dim, dtype=dtype, use_bias=cfg.qkv_bias, name="q")(x)
            k = QDense(kv_dim, dtype=dtype, use_bias=cfg.qkv_bias, name="k")(x)
            v = QDense(kv_dim, dtype=dtype, use_bias=cfg.qkv_bias, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim).transpose(0, 2, 1, 3)

        cos, sin = rope
        q = apply_rope(q, positions, cos, sin)
        k = apply_rope(k, positions, cos, sin)

        if cache is None:
            # Prefill / training: full self-attention over the sequence.
            out = flash_attention(q, k, v, causal=True)
        else:
            from ..ops.decode_attention import (
                decode_attention_update,
                update_cache_rows,
            )

            index = cache["index"]  # [B]
            # Paged serving: cache["rows"] [B] maps logical decode rows to
            # physical cache rows (the batcher's refill is then an int32
            # table update instead of a KV copy); absent = identity.
            rows = cache.get("rows")
            k_layer = cache["k"][self.layer_idx]
            v_layer = cache["v"][self.layer_idx]
            quantized = k_layer.dtype == jnp.int8
            k_scale = cache["k_scale"][self.layer_idx] if quantized else None
            v_scale = cache["v_scale"][self.layer_idx] if quantized else None
            if prefill:
                if quantized:
                    # In-program calibration: the prefill block's amax (with
                    # 1.5x margin for decode-time outliers) fixes this
                    # layer's per-head scales; the engine runs ONE prefill
                    # per generate program, so every later decode row
                    # quantizes under the same scale the prefix used.
                    k_scale = jnp.maximum(
                        k_scale,
                        1.5 * jnp.max(jnp.abs(k), axis=(0, 2, 3)) / 127.0,
                    )
                    v_scale = jnp.maximum(
                        v_scale,
                        1.5 * jnp.max(jnp.abs(v), axis=(0, 2, 3)) / 127.0,
                    )
                    k_store = quantize_kv(k, k_scale)
                    v_store = quantize_kv(v, v_scale)
                else:
                    k_store = k.astype(k_layer.dtype)
                    v_store = v.astype(v_layer.dtype)
                # Cache-filling prefill: write the block, then in-block
                # causal flash attention (exact — full-precision k/v —
                # and avoids attending the padded cache tail: S_block^2
                # instead of S_block * S).
                k_layer = update_cache_rows(k_layer, k_store, index, rows)
                v_layer = update_cache_rows(v_layer, v_store, index, rows)
                out = flash_attention(q, k, v, causal=True)
            else:
                # Fused row-write + length-aware paged attention: the new
                # k/v rows land in the cache INSIDE the kernel (in place on
                # TPU), and only the valid prefix streams from HBM.
                out, k_layer, v_layer = decode_attention_update(
                    q, k_layer, v_layer, k, v, index, rows,
                    k_scale=k_scale, v_scale=v_scale,
                )
            new_k = list(cache["k"])
            new_v = list(cache["v"])
            new_k[self.layer_idx] = k_layer
            new_v[self.layer_idx] = v_layer
            cache = dict(cache, k=new_k, v=new_v)
            if quantized and prefill:
                new_ks = list(cache["k_scale"])
                new_vs = list(cache["v_scale"])
                new_ks[self.layer_idx] = k_scale
                new_vs[self.layer_idx] = v_scale
                cache = dict(cache, k_scale=new_ks, v_scale=new_vs)

        out = out.transpose(0, 2, 1, 3).reshape(b, s, q_dim)
        out = QDense(cfg.hidden_dim, dtype=dtype, name="out")(out)
        return out, cache


class SwiGLU(nn.Module):
    config: DecoderConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        dtype = x.dtype
        if self.has_variable("params", "gateup_kernel"):
            gateup = _fused_dense(self, x, dtype, "gateup_kernel", "gateup_scale")
            gate, up = jnp.split(gateup, [cfg.mlp_dim], axis=-1)
        else:
            gate = QDense(cfg.mlp_dim, dtype=dtype, name="gate")(x)
            up = QDense(cfg.mlp_dim, dtype=dtype, name="up")(x)
        return QDense(cfg.hidden_dim, dtype=dtype, name="down")(
            nn.silu(gate) * up
        )


class DecoderBlock(nn.Module):
    config: DecoderConfig
    layer_idx: int

    @nn.compact
    def __call__(self, x, positions, rope, cache, prefill=False):
        attn_out, cache = Attention(
            self.config, self.layer_idx, name="attn"
        )(
            RMSNorm(self.config.hidden_dim, name="attn_norm")(x),
            positions, rope, cache, prefill,
        )
        x = x + attn_out
        mlp_out = SwiGLU(self.config, name="mlp")(
            RMSNorm(self.config.hidden_dim, name="mlp_norm")(x)
        )
        return x + mlp_out, cache


class Decoder(nn.Module):
    """Token/embedding-input decoder producing logits.

    Accepts either token ids [B, S] or pre-computed input embeddings
    [B, S, H] (used by the VLM to splice in video tokens). ``remat=True``
    rematerializes each block in the backward pass (activation memory
    ~O(layers) -> O(1) at the cost of one extra forward), the standard
    HBM-for-FLOPs trade for the base/7b presets.
    """

    config: DecoderConfig
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.embed = nn.Embed(
            cfg.vocab_size, cfg.hidden_dim, name="embed",
            embedding_init=nn.initializers.normal(0.02),
        )
        block_cls = (
            nn.remat(DecoderBlock, static_argnums=()) if self.remat else DecoderBlock
        )
        self.blocks = [
            block_cls(cfg, layer_idx=i, name=f"layer_{i}")
            for i in range(cfg.num_layers)
        ]
        self.final_norm = RMSNorm(cfg.hidden_dim, name="final_norm")
        if not cfg.tied_embeddings:
            # Untied logits head, stored [vocab, hidden] to match the HF
            # lm_head.weight layout (ported verbatim by models/port.py).
            self.lm_head = self.param(
                "lm_head",
                nn.initializers.normal(0.02),
                (cfg.vocab_size, cfg.hidden_dim),
                jnp.float32,
            )

    def embed_tokens(self, tokens: jax.Array, dtype: jnp.dtype) -> jax.Array:
        return self.embed(tokens).astype(dtype)

    def __call__(
        self,
        inputs: jax.Array,
        positions: jax.Array | None = None,
        cache: Cache | None = None,
        dtype: jnp.dtype = jnp.bfloat16,
        prefill: bool = False,
        logits_at: jax.Array | None = None,
    ) -> tuple[jax.Array, Cache | None]:
        """``logits_at`` [B] narrows the logits head to ONE position per row
        (the decode loop consumes a single next-token distribution per step;
        at real vocab sizes the [B, W, V] head over a fast-forward block is
        W x wasted FLOPs and tens of MB of f32 logits)."""
        cfg = self.config
        if inputs.ndim == 2:
            x = self.embed_tokens(inputs, dtype)
        else:
            x = inputs.astype(dtype)
        b, s, _ = x.shape

        if positions is None:
            if cache is not None:
                positions = cache["index"][:, None] + jnp.arange(s)[None, :].astype(
                    jnp.int32
                )
            else:
                positions = jnp.broadcast_to(
                    jnp.arange(s)[None, :].astype(jnp.int32), (b, s)
                )

        rope = rope_angles(cfg.max_seq_len, cfg.head_dim, cfg.rope_theta)

        for block in self.blocks:
            x, cache = block(x, positions, rope, cache, prefill)

        x = self.final_norm(x)
        if logits_at is not None:
            x = jnp.take_along_axis(x, logits_at[:, None, None], axis=1)
        # Logits head (fp32 accumulate): the embedding table when tied,
        # the separate [V, H] lm_head otherwise (Qwen2-VL unties them).
        head = self.embed.embedding if cfg.tied_embeddings else self.lm_head
        logits = jnp.einsum(
            "bsh,vh->bsv", x.astype(jnp.float32), head.astype(jnp.float32)
        )
        if cache is not None:
            cache = dict(cache, index=cache["index"] + s)
        return logits, cache
