"""The pjit inference engine: sharded prefill + constrained decode loop.

One compiled program per (batch, prompt-length) bucket:

  prefill: video patches + prompt tokens -> KV cache + first logits
  decode:  lax.while_loop of single-token steps, each step doing
           DFA logit masking (one gather), sampling, cache append.

Batches shard over the mesh "data" axis (segments of a long video — the
reference's sequential loop at content_analyzer.py:870-942 — become one
sharded forward); parameters shard over "model" per sharding.py. Everything
inside `_build_generate` is traced once; there is no per-token host
round-trip.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import VLMConfig
from ..models.lm import init_kv_cache
from ..models.tokenizer import ByteTokenizer
from ..models.vlm import VideoLM
from ..ops.constrained import JsonDfa, advance_state, constrain_logits
from ..ops.preprocess import preprocess_frames
from .mesh import DATA_AXIS, build_mesh
from .sharding import param_shardings

__all__ = ["InferenceEngine", "EngineStats"]


def _round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


@dataclass
class EngineStats:
    """Cumulative device-side throughput counters."""

    generate_calls: int = 0
    tokens_generated: int = 0
    generate_seconds: float = 0.0
    prefill_tokens: int = 0
    frames_preprocessed: int = 0
    preprocess_seconds: float = 0.0

    @property
    def tokens_per_second(self) -> float:
        return self.tokens_generated / self.generate_seconds if self.generate_seconds else 0.0

    def as_dict(self) -> dict[str, Any]:
        return {
            "generate_calls": self.generate_calls,
            "tokens_generated": self.tokens_generated,
            "generate_seconds": round(self.generate_seconds, 3),
            "tokens_per_second": round(self.tokens_per_second, 1),
            "prefill_tokens": self.prefill_tokens,
            "frames_preprocessed": self.frames_preprocessed,
            "preprocess_seconds": round(self.preprocess_seconds, 3),
        }


class InferenceEngine:
    """Owns params, mesh placement, and the compiled generate function."""

    def __init__(
        self,
        config: VLMConfig,
        mesh: Mesh | None = None,
        dfa: JsonDfa | None = None,
        max_new_tokens: int = 1024,
        temperature: float = 0.7,
        seed: int = 0,
        params: Any = None,
    ):
        self.config = config
        self.mesh = mesh if mesh is not None else build_mesh({"model": 1})
        self.dfa = dfa
        self.max_new_tokens = max_new_tokens
        self.temperature = float(temperature)
        self.tokenizer = ByteTokenizer(config.decoder.vocab_size)
        self.model = VideoLM(config)
        self.stats = EngineStats()
        self._rng = jax.random.PRNGKey(seed)
        self._generate_cache: dict[tuple[int, int], Any] = {}

        if params is None:
            params = self.model.init_variables(jax.random.PRNGKey(seed))
        shardings = param_shardings(self.mesh, params)
        self.params = jax.device_put(params, shardings)
        self._table = (
            jax.device_put(
                dfa.device_table(), NamedSharding(self.mesh, P())
            )
            if dfa is not None
            else None
        )

    # -- compiled program ----------------------------------------------------

    def _build_generate(self, batch: int, prompt_len: int):
        """Trace + compile the full generate program for one shape bucket."""
        cfg = self.config
        dfa = self.dfa
        table = self._table
        model = self.model
        temperature = self.temperature
        max_new = self.max_new_tokens
        eos = self.tokenizer.EOS
        cache_len = _round_up(
            cfg.video_tokens + prompt_len + max_new + 1, 128
        )
        if cache_len > cfg.decoder.max_seq_len:
            raise ValueError(
                f"sequence {cache_len} exceeds max_seq_len {cfg.decoder.max_seq_len}"
            )
        data_sharding = NamedSharding(self.mesh, P(DATA_AXIS))

        def generate(params, patches, prompt, rng):
            b = patches.shape[0]
            dtype = jnp.dtype(cfg.dtype)
            cache = init_kv_cache(cfg.decoder, b, cache_len, dtype)
            cache = {
                "k": jax.lax.with_sharding_constraint(
                    cache["k"], NamedSharding(self.mesh, P(None, DATA_AXIS))
                ),
                "v": jax.lax.with_sharding_constraint(
                    cache["v"], NamedSharding(self.mesh, P(None, DATA_AXIS))
                ),
                "index": cache["index"],
            }
            logits, cache = model.apply(
                params, patches, prompt, cache, method=VideoLM.prefill
            )
            state = jnp.full((b,), dfa.start if dfa else 0, jnp.int32)
            done = jnp.zeros((b,), bool)
            tokens = jnp.full((b, max_new), eos, jnp.int32)

            def sample(logits, state, done, key):
                if table is not None:
                    logits = constrain_logits(logits, state, table)
                if temperature > 0:
                    tok = jax.random.categorical(key, logits / temperature, axis=-1)
                else:
                    tok = jnp.argmax(logits, axis=-1)
                # Finished rows keep emitting EOS.
                return jnp.where(done, eos, tok).astype(jnp.int32)

            def cond(carry):
                step, _, _, _, _, done, _ = carry
                return jnp.logical_and(step < max_new, ~jnp.all(done))

            def body(carry):
                step, logits, cache, state, tokens, done, rng = carry
                rng, key = jax.random.split(rng)
                tok = sample(logits, state, done, key)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, tok[:, None], (0, step)
                )
                if table is not None:
                    new_state = advance_state(state, tok, table)
                    state = jnp.where(done, state, new_state)
                    done = done | (state == dfa.accept)
                else:
                    done = done | (tok == eos)
                logits, cache = model.apply(
                    params, tok[:, None], cache, method=VideoLM.decode_step
                )
                return step + 1, logits, cache, state, tokens, done, rng

            carry = (jnp.int32(0), logits, cache, state, tokens, done, rng)
            steps, _, _, _, tokens, _, _ = jax.lax.while_loop(cond, body, carry)
            return tokens, steps

        return jax.jit(
            generate,
            in_shardings=(
                param_shardings(self.mesh, self.params),
                data_sharding,
                data_sharding,
                NamedSharding(self.mesh, P()),
            ),
            out_shardings=(data_sharding, NamedSharding(self.mesh, P())),
        )

    def _get_generate(self, batch: int, prompt_len: int):
        key = (batch, prompt_len)
        if key not in self._generate_cache:
            self._generate_cache[key] = self._build_generate(batch, prompt_len)
        return self._generate_cache[key]

    # -- public API ----------------------------------------------------------

    @property
    def data_parallel(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    def preprocess(self, frames: np.ndarray) -> jax.Array:
        """uint8 [B, T, H, W, 3] -> patches, timed into stats."""
        start = time.perf_counter()
        patches = preprocess_frames(
            jnp.asarray(frames), self.config.encoder, jnp.dtype(self.config.dtype)
        )
        patches.block_until_ready()
        self.stats.preprocess_seconds += time.perf_counter() - start
        self.stats.frames_preprocessed += frames.shape[0] * frames.shape[1]
        return patches

    def generate(
        self, frames: np.ndarray, prompts: list[str], prompt_len: int = 256
    ) -> list[str]:
        """Analyze a batch of clips: returns one decoded text per clip.

        frames: uint8 [B, T, H, W, 3]; B is padded up to a multiple of the
        data-parallel degree before the sharded call.
        """
        b_real = frames.shape[0]
        if len(prompts) != b_real:
            raise ValueError("one prompt per clip required")
        b_padded = _round_up(max(b_real, 1), self.data_parallel)

        if b_padded != b_real:
            pad = np.zeros((b_padded - b_real,) + frames.shape[1:], frames.dtype)
            frames = np.concatenate([frames, pad], axis=0)
            prompts = prompts + [""] * (b_padded - b_real)

        prompt_tokens = np.stack(
            [self.tokenizer.encode_array(p, prompt_len, add_bos=True) for p in prompts]
        )

        patches = self.preprocess(frames)
        fn = self._get_generate(b_padded, prompt_len)

        self._rng, key = jax.random.split(self._rng)
        start = time.perf_counter()
        tokens, steps = fn(self.params, patches, jnp.asarray(prompt_tokens), key)
        tokens = np.asarray(tokens)
        elapsed = time.perf_counter() - start

        self.stats.generate_calls += 1
        self.stats.tokens_generated += int(steps) * b_real
        self.stats.generate_seconds += elapsed
        self.stats.prefill_tokens += b_real * (
            self.config.video_tokens + prompt_len
        )

        return [self.tokenizer.decode(tokens[i]) for i in range(b_real)]
