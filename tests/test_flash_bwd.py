"""Pallas flash-attention backward: gradient parity with the XLA reference
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.ops.attention import mha_reference
from video_transformer_tpu.ops.flash_bwd import (
    flash_bwd,
    flash_fwd_lse,
    supports_pallas_bwd,
)


def setup(b=1, hq=2, hkv=1, s=256, d=32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (b, hq, s, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32)
    grad = jax.random.normal(keys[3], (b, hq, s, d), jnp.float32)
    return q, k, v, grad


def reference_grads(q, k, v, grad, causal):
    def fn(q_, k_, v_):
        return mha_reference(q_, k_, v_, causal=causal)

    _, vjp = jax.vjp(fn, q, k, v)
    return vjp(grad)


class TestFlashForwardLSE:
    def test_output_and_lse(self):
        q, k, v, _ = setup()
        out, lse = flash_fwd_lse(q, k, v, causal=True, interpret=True)
        expected = mha_reference(q, k, v, causal=True)
        np.testing.assert_allclose(out, expected, atol=2e-5, rtol=2e-5)
        # LSE check against explicit logsumexp.
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
        mask = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), bool))
        logits = jnp.where(mask, logits, -1e30)
        expected_lse = jax.nn.logsumexp(logits, axis=-1)
        assert lse.shape == expected_lse.shape + (1,)  # TPU-tileable layout
        np.testing.assert_allclose(
            lse[:, :1, :, 0], expected_lse[:, :1], atol=2e-4, rtol=2e-4
        )


class TestFlashBackward:
    @pytest.mark.parametrize("causal", [True, False])
    def test_grads_match_reference(self, causal):
        q, k, v, grad = setup()
        out, lse = flash_fwd_lse(q, k, v, causal=causal, interpret=True)
        dq, dk, dv = flash_bwd(
            q, k, v, out, lse, grad, causal=causal, interpret=True
        )
        rq, rk, rv = reference_grads(q, k, v, grad, causal)
        np.testing.assert_allclose(dq, rq, atol=3e-4, rtol=3e-4)
        np.testing.assert_allclose(dk, rk, atol=3e-4, rtol=3e-4)
        np.testing.assert_allclose(dv, rv, atol=3e-4, rtol=3e-4)

    def test_gqa_group_summation(self):
        q, k, v, grad = setup(hq=4, hkv=2)
        out, lse = flash_fwd_lse(q, k, v, causal=True, interpret=True)
        dq, dk, dv = flash_bwd(
            q, k, v, out, lse, grad, causal=True, interpret=True
        )
        rq, rk, rv = reference_grads(q, k, v, grad, True)
        np.testing.assert_allclose(dq, rq, atol=3e-4, rtol=3e-4)
        np.testing.assert_allclose(dk, rk, atol=3e-4, rtol=3e-4)
        np.testing.assert_allclose(dv, rv, atol=3e-4, rtol=3e-4)

    def test_multi_block_sequences(self):
        # 512-long sequences: 2+ blocks on both sides of the triangle.
        q, k, v, grad = setup(s=512, seed=3)
        out, lse = flash_fwd_lse(q, k, v, causal=True, interpret=True)
        dq, dk, dv = flash_bwd(
            q, k, v, out, lse, grad, causal=True, interpret=True
        )
        rq, rk, rv = reference_grads(q, k, v, grad, True)
        np.testing.assert_allclose(dq, rq, atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(dk, rk, atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(dv, rv, atol=5e-4, rtol=5e-4)

    def test_support_predicate(self):
        assert supports_pallas_bwd(3456, 3456)  # 128 divides
        assert not supports_pallas_bwd(100, 256)
        # KV-prefix queries (Sq != Sk): the bwd kernels lack the causal
        # offset, so they must route to the reference VJP.
        assert not supports_pallas_bwd(256, 512)
