"""Paged decode-attention kernel numerics (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.ops.decode_attention import (
    _decode_attention_pallas,
    decode_attention_reference,
)


def setup(b=2, hq=4, hkv=2, w=8, d=32, s=1024, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(keys[0], (b, hq, w, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
    return q, k, v


class TestPagedDecodeAttention:
    def test_matches_reference_varied_lengths(self):
        q, k, v = setup()
        lengths = jnp.array([100, 900], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_short_lengths_skip_blocks(self):
        """Output must be independent of cache content beyond each length."""
        q, k, v = setup(b=1, hq=2, hkv=1)
        lengths = jnp.array([40], jnp.int32)
        out1 = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        # Poison everything beyond length + width.
        k2 = k.at[:, :, 64:, :].set(1e4)
        v2 = v.at[:, :, 64:, :].set(-1e4)
        out2 = _decode_attention_pallas(q, k2, v2, lengths, interpret=True)
        np.testing.assert_allclose(out1, out2, atol=1e-6)

    def test_in_block_causality(self):
        """Query row j sees exactly lengths + j positions."""
        q, k, v = setup(b=1, hq=1, hkv=1, w=4, s=512)
        lengths = jnp.array([10], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_bfloat16_cache(self):
        q, k, v = setup(b=1, hq=2, hkv=2, w=8, s=512)
        k = k.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        lengths = jnp.array([300], jnp.int32)
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(expected, np.float32),
            atol=3e-2, rtol=3e-2,
        )

    def test_full_length(self):
        q, k, v = setup(b=1, hq=2, hkv=1, w=8, s=512)
        lengths = jnp.array([505], jnp.int32)  # 505 + 7 = 512 = S
        expected = decode_attention_reference(q, k, v, lengths)
        got = _decode_attention_pallas(q, k, v, lengths, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)
