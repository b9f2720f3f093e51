"""Fused packed-int4 matmul kernel (ops/int4_matmul.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_transformer_tpu.models.quant import pack_int4, unpack_int4
from video_transformer_tpu.ops.int4_matmul import (
    _int4_matmul_pallas,
    int4_matmul,
)


def _setup(m=16, k=512, n=256, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    q = jnp.asarray(rng.integers(-7, 8, (k, n)), jnp.int8)
    return x, q, pack_int4(q)


def _oracle(x, q):
    return (x.astype(jnp.float32) @ q.astype(jnp.float32)).astype(jnp.bfloat16)


class TestInt4Matmul:
    def test_pallas_interpret_matches_oracle(self):
        x, q, packed = _setup()
        got = _int4_matmul_pallas(
            x[:, 0::2], x[:, 1::2], packed, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(_oracle(x, q), np.float32),
            rtol=2e-2, atol=0.5,
        )

    def test_multi_chunk_k(self):
        x, q, packed = _setup(m=8, k=2816, n=256, seed=1)
        got = _int4_matmul_pallas(
            x[:, 0::2], x[:, 1::2], packed, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(_oracle(x, q), np.float32),
            rtol=2e-2, atol=1.0,
        )

    def test_odd_m_pads(self):
        x, q, packed = _setup(m=3, k=256, n=128, seed=2)
        got = _int4_matmul_pallas(
            x[:, 0::2], x[:, 1::2], packed, interpret=True
        )
        assert got.shape == (3, 128)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(_oracle(x, q), np.float32),
            rtol=2e-2, atol=0.5,
        )

    def test_dispatcher_xla_fallback_matches(self):
        """Off-TPU the dispatcher must agree with the unpack expression."""
        x, q, packed = _setup(m=4, k=256, n=128, seed=3)
        y = int4_matmul(x, packed)
        w_even, w_odd = unpack_int4(packed)
        want = (
            x[:, 0::2] @ w_even.astype(jnp.bfloat16)
            + x[:, 1::2] @ w_odd.astype(jnp.bfloat16)
        )
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=0.5,
        )

    def test_batched_leading_dims(self):
        x, q, packed = _setup(m=6, k=256, n=128, seed=4)
        x3 = x.reshape(2, 3, 256)
        y = int4_matmul(x3, packed)
        assert y.shape == (2, 3, 128)
