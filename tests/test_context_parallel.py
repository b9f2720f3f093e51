"""Context parallelism: ring attention == sequential attention, exactly.

8-device CPU mesh (conftest). Exactness matters: ring attention is online
softmax over rotating blocks, not an approximation, so results must match
mha_reference to float tolerance including causal masking across shard
boundaries and GQA grouping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.ops.attention import mha_reference
from video_transformer_tpu.parallel.context_parallel import (
    build_cp_mesh,
    ring_attention,
)


def qkv(b=2, hq=4, hkv=2, s=256, d=32, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(keys[0], (b, hq, s, d)),
        jax.random.normal(keys[1], (b, hkv, s, d)),
        jax.random.normal(keys[2], (b, hkv, s, d)),
    )


class TestRingAttention:
    # The 8-shard variants re-exercise the same ring code over more hops at
    # ~20 s of shard_map compile each on the single host core — slow-gated;
    # 2/4 shards keep multi-hop coverage in the default suite.
    @pytest.mark.parametrize(
        "n_shards",
        [2, 4, pytest.param(8, marks=pytest.mark.slow)],
    )
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_reference(self, n_shards, causal):
        q, k, v = qkv()
        mesh = build_cp_mesh(n_shards)
        out = ring_attention(q, k, v, mesh, causal=causal)
        ref = mha_reference(q, k, v, causal=causal)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_causality_across_shard_boundaries(self):
        """Perturbing the LAST shard's keys must not affect earlier shards'
        outputs — the global-position mask survives ring rotation."""
        q, k, v = qkv(b=1, hq=2, hkv=2, s=64)
        mesh = build_cp_mesh(4)
        out1 = ring_attention(q, k, v, mesh, causal=True)
        k2 = k.at[:, :, 48:, :].set(33.0)
        v2 = v.at[:, :, 48:, :].set(-33.0)
        out2 = ring_attention(q, k2, v2, mesh, causal=True)
        np.testing.assert_allclose(
            np.asarray(out1[:, :, :48]), np.asarray(out2[:, :, :48]), atol=1e-5
        )
        assert not np.allclose(out1[:, :, 48:], out2[:, :, 48:])

    def test_bfloat16_path(self):
        q, k, v = qkv(s=128)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        mesh = build_cp_mesh(4)
        out = ring_attention(q, k, v, mesh, causal=True)
        ref = mha_reference(q, k, v, causal=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=3e-2,
        )

    def test_indivisible_sequence_raises(self):
        q, k, v = qkv(s=100)
        with pytest.raises(ValueError, match="divide"):
            ring_attention(q, k, v, build_cp_mesh(8))

    def test_gradients_match_reference(self):
        """CP is used for long-context TRAINING too: grads through the ring
        (ppermute transpose) must equal sequential grads."""
        q, k, v = qkv(b=1, hq=2, hkv=1, s=64)
        mesh = build_cp_mesh(4)

        def ring_loss(args):
            return jnp.mean(ring_attention(*args, mesh, causal=True) ** 2)

        def seq_loss(args):
            return jnp.mean(mha_reference(*args, causal=True) ** 2)

        g_ring = jax.jit(jax.grad(ring_loss))((q, k, v))
        g_seq = jax.jit(jax.grad(seq_loss))((q, k, v))
        for a, b in zip(g_ring, g_seq):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5
            )
