"""Kernel numerics tests (Pallas kernels run in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.ops.attention import (
    _flash_attention_pallas,
    mha_reference,
)
from video_transformer_tpu.ops.norms import rms_norm
from video_transformer_tpu.ops.rotary import apply_rope, rope_angles


def random_qkv(b=2, hq=2, hkv=1, s=128, d=32, dtype=jnp.float32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(keys[0], (b, hq, s, d), dtype)
    k = jax.random.normal(keys[1], (b, hkv, s, d), dtype)
    v = jax.random.normal(keys[2], (b, hkv, s, d), dtype)
    return q, k, v


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_reference(self, causal):
        q, k, v = random_qkv()
        expected = mha_reference(q, k, v, causal=causal)
        got = _flash_attention_pallas(q, k, v, causal=causal, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_gqa_grouping(self):
        q, k, v = random_qkv(hq=4, hkv=2)
        expected = mha_reference(q, k, v, causal=True)
        got = _flash_attention_pallas(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    def test_causality(self):
        """Perturbing future keys must not change earlier outputs."""
        q, k, v = random_qkv(b=1, hq=1, hkv=1, s=64)
        out1 = _flash_attention_pallas(q, k, v, causal=True, interpret=True)
        k2 = k.at[:, :, 48:, :].set(99.0)
        v2 = v.at[:, :, 48:, :].set(-99.0)
        out2 = _flash_attention_pallas(q, k2, v2, causal=True, interpret=True)
        np.testing.assert_allclose(out1[:, :, :48], out2[:, :, :48], atol=1e-5)
        assert not np.allclose(out1[:, :, 48:], out2[:, :, 48:])

    def test_bfloat16_path(self):
        q, k, v = random_qkv(dtype=jnp.bfloat16)
        expected = mha_reference(q, k, v, causal=True)
        got = _flash_attention_pallas(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(
            got.astype(jnp.float32), expected.astype(jnp.float32), atol=3e-2, rtol=3e-2
        )

    @pytest.mark.parametrize("s_q,s_k", [(64, 256), (128, 384)])
    def test_kv_prefix_causal_offset(self, s_q, s_k):
        """Sq != Sk: queries align to the LAST Sq key positions (the
        mha_reference s_k - s_q offset), not to position zero."""
        keys = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(keys[0], (1, 2, s_q, 32))
        k = jax.random.normal(keys[1], (1, 2, s_k, 32))
        v = jax.random.normal(keys[2], (1, 2, s_k, 32))
        expected = mha_reference(q, k, v, causal=True)
        got = _flash_attention_pallas(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)

    @pytest.mark.slow
    def test_long_sequence_streaming(self):
        """8k-token causal prefill through the K/V-streaming path (the
        VMEM-resident layout this replaced could not scale past ~8k)."""
        q, k, v = random_qkv(b=1, hq=1, hkv=1, s=8192, d=64, dtype=jnp.bfloat16)
        expected = mha_reference(q, k, v, causal=True)
        got = _flash_attention_pallas(q, k, v, causal=True, interpret=True)
        np.testing.assert_allclose(
            got.astype(jnp.float32),
            expected.astype(jnp.float32),
            atol=3e-2,
            rtol=3e-2,
        )


class TestRMSNorm:
    def test_unit_scale(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
        out = rms_norm(x, jnp.ones(64))
        rms = jnp.sqrt(jnp.mean(out**2, axis=-1))
        np.testing.assert_allclose(rms, 1.0, atol=1e-3)

    def test_dtype_preserved(self):
        x = jnp.ones((2, 8), jnp.bfloat16)
        assert rms_norm(x, jnp.ones(8)).dtype == jnp.bfloat16


class TestRoPE:
    def test_norm_preserved(self):
        cos, sin = rope_angles(128, 32)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 32))
        pos = jnp.arange(16)
        rotated = apply_rope(x, pos, cos, sin)
        np.testing.assert_allclose(
            jnp.linalg.norm(rotated, axis=-1),
            jnp.linalg.norm(x, axis=-1),
            rtol=1e-5,
        )

    def test_position_zero_is_identity(self):
        cos, sin = rope_angles(8, 16)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 1, 16))
        out = apply_rope(x, jnp.zeros((1, 1), jnp.int32), cos, sin)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_relative_shift_consistency(self):
        """<q(m), k(n)> must depend only on m - n."""
        cos, sin = rope_angles(64, 16)
        q = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 16))
        k = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1, 16))

        def dot_at(m, n):
            qm = apply_rope(q, jnp.array([m]), cos, sin)
            kn = apply_rope(k, jnp.array([n]), cos, sin)
            return float(jnp.sum(qm * kn))

        assert dot_at(5, 3) == pytest.approx(dot_at(10, 8), rel=1e-4)
        assert dot_at(7, 7) == pytest.approx(dot_at(0, 0), rel=1e-4)
