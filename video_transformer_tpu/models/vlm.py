"""VideoLM: encoder -> projector -> decoder, the full video-language model.

This model IS the analysis engine: where the reference uploads an MP4 and
prompts Gemini (content_analyzer.py:560-655), this model consumes
preprocessed tubelet patches and generates the structured note JSON on
device. Exposed methods map onto the inference engine's phases:

- ``encode_video``  : patches -> projected video embeddings
- ``prefill``       : video embeds + prompt tokens -> cache + last logits
- ``decode_step``   : one incremental token step against the cache
- ``__call__``      : teacher-forced training forward (video + text -> logits)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .config import VLMConfig
from .lm import Cache, Decoder
from .vit import VideoEncoder

__all__ = ["VideoLM"]


class VideoLM(nn.Module):
    config: VLMConfig
    remat: bool = False
    """Rematerialize decoder blocks in the backward pass (training only)."""

    def setup(self):
        cfg = self.config
        from .config import EncoderConfig

        self._ported_vision = not isinstance(cfg.encoder, EncoderConfig)
        if self._ported_vision:
            # Ported Qwen2-VL tower: its PatchMerger already projects into
            # the decoder width, so no extra projector.
            from .qwen_vit import QwenVisionEncoder

            if cfg.encoder.hidden_size != cfg.decoder.hidden_dim:
                raise ValueError(
                    f"vision hidden_size {cfg.encoder.hidden_size} != "
                    f"decoder hidden_dim {cfg.decoder.hidden_dim}"
                )
            self.encoder = QwenVisionEncoder(cfg.encoder, name="visual")
        else:
            self.encoder = VideoEncoder(cfg.encoder, name="encoder")
            self.projector_up = nn.Dense(
                cfg.decoder.hidden_dim, use_bias=False, name="projector_up"
            )
            self.projector_down = nn.Dense(
                cfg.decoder.hidden_dim, use_bias=False, name="projector_down"
            )
        self.decoder = Decoder(cfg.decoder, remat=self.remat, name="decoder")

    @property
    def compute_dtype(self) -> jnp.dtype:
        return jnp.dtype(self.config.dtype)

    def encode_video(self, patches: jax.Array) -> jax.Array:
        """[B, N, patch_dim] -> [B, Nv, decoder_hidden] video embeddings.

        Nv == N for the native encoder; N/4 for a ported Qwen2-VL tower
        (its 2x2 PatchMerger already lands in the decoder width).
        """
        dtype = self.compute_dtype
        encoded = self.encoder(patches, dtype=dtype)
        if self._ported_vision:
            return encoded.astype(dtype)
        projected = self.projector_down(
            nn.gelu(self.projector_up(encoded.astype(dtype)))
        )
        return projected.astype(dtype)

    def _splice(self, video_embeds: jax.Array, tokens: jax.Array) -> jax.Array:
        """Concatenate video embeddings ahead of token embeddings."""
        dtype = self.compute_dtype
        text_embeds = self.decoder.embed_tokens(tokens, dtype)
        return jnp.concatenate([video_embeds, text_embeds], axis=1)

    @staticmethod
    def _ragged_last(
        logits: jax.Array, cache: Cache, lengths: jax.Array | None, offset: int
    ) -> tuple[jax.Array, Cache]:
        """Per-row last-VALID logits + cache index for ragged prefills.

        ``lengths`` [B] counts each row's valid TOKEN positions (pad tail
        excluded); positions past a row's length hold pad K/V that decode
        never attends (length-masked) and later overwrites in place.
        """
        if lengths is None:
            return logits[:, -1, :], cache
        pos = offset + lengths - 1
        last = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0, :]
        return last, dict(cache, index=offset + lengths)

    def prefill(
        self,
        patches: jax.Array,
        prompt_tokens: jax.Array,
        cache: Cache,
        lengths: jax.Array | None = None,
    ) -> tuple[jax.Array, Cache]:
        """Encode video + prompt, fill the KV cache; returns (last_logits, cache).

        ``lengths`` [B] marks per-row valid token counts (continuation
        prefills carry ragged prefixes); None = the full block is valid.
        """
        video_embeds = self.encode_video(patches)
        inputs = self._splice(video_embeds, prompt_tokens)
        logits, cache = self.decoder(
            inputs, cache=cache, dtype=self.compute_dtype, prefill=True
        )
        return self._ragged_last(logits, cache, lengths, video_embeds.shape[1])

    def prefill_text(
        self,
        prompt_tokens: jax.Array,
        cache: Cache,
        lengths: jax.Array | None = None,
    ) -> tuple[jax.Array, Cache]:
        """Text-only prefill (validator / consolidation / rewrite passes)."""
        logits, cache = self.decoder(
            prompt_tokens, cache=cache, dtype=self.compute_dtype, prefill=True
        )
        return self._ragged_last(logits, cache, lengths, 0)

    def decode_step(
        self, tokens: jax.Array, cache: Cache
    ) -> tuple[jax.Array, Cache]:
        """One decode step: tokens [B, 1] -> (logits [B, V], cache)."""
        logits, cache = self.decoder(tokens, cache=cache, dtype=self.compute_dtype)
        return logits[:, -1, :], cache

    def decode_block(
        self, tokens: jax.Array, cache: Cache
    ) -> tuple[jax.Array, Cache]:
        """Multi-token decode against the cache: [B, W] -> ([B, W, V], cache).

        Used by grammar fast-forward: a sampled token plus its forced literal
        run are consumed in one call; the caller picks each row's logits at
        its last valid position.
        """
        logits, cache = self.decoder(tokens, cache=cache, dtype=self.compute_dtype)
        return logits, cache

    def decode_block_pick(
        self, tokens: jax.Array, cache: Cache, pick: jax.Array
    ) -> tuple[jax.Array, Cache]:
        """decode_block computing logits ONLY at ``pick`` [B] per row:
        [B, W] -> ([B, V], cache). The hidden states of every block position
        still enter the KV cache; the logits head runs once per row instead
        of once per block column (the decode loop's hot path)."""
        logits, cache = self.decoder(
            tokens, cache=cache, dtype=self.compute_dtype, logits_at=pick
        )
        return logits[:, 0, :], cache

    def __call__(
        self, patches: jax.Array, tokens: jax.Array
    ) -> jax.Array:
        """Training forward: logits [B, Nv + St, V] with teacher forcing."""
        video_embeds = self.encode_video(patches)
        inputs = self._splice(video_embeds, tokens)
        logits, _ = self.decoder(inputs, cache=None, dtype=self.compute_dtype)
        return logits

    def init_variables(self, rng: jax.Array, batch: int = 1) -> Any:
        """Initialize parameters with tiny dummy inputs."""
        cfg = self.config
        patches = jnp.zeros(
            (batch, cfg.encoder.tokens_per_clip, cfg.encoder.patch_dim),
            self.compute_dtype,
        )
        tokens = jnp.zeros((batch, 8), jnp.int32)
        return self.init(rng, patches, tokens)
