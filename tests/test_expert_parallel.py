"""Expert parallelism: sharded MoE == dense single-device MoE, fwd and bwd."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_transformer_tpu.parallel.expert_parallel import (
    build_expert_mesh,
    init_moe_params,
    moe_swiglu,
)

H, M, E = 64, 128, 8


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.PRNGKey(0), H, M, E)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, H))
    return params, x


class TestExpertParallel:
    @pytest.mark.parametrize("n_devices", [2, 4, 8])
    def test_sharded_matches_dense(self, setup, n_devices):
        params, x = setup
        dense_out, dense_aux = moe_swiglu(params, x, mesh=None)
        mesh = build_expert_mesh(n_devices)
        ep_out, ep_aux = moe_swiglu(params, x, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(ep_out), np.asarray(dense_out), atol=2e-5, rtol=2e-5
        )
        np.testing.assert_allclose(float(ep_aux), float(dense_aux), rtol=1e-6)

    def test_top2_sparsity(self, setup):
        """Each token draws from exactly its top-2 experts: zeroing any
        OTHER expert's weights must not change that token's output."""
        params, x = setup
        tokens = x.reshape(-1, H)
        logits = tokens @ params["router"]
        top2 = set(np.asarray(jax.lax.top_k(logits[0], 2)[1]).tolist())
        out_full, _ = moe_swiglu(params, x, mesh=None)
        dead = next(e for e in range(E) if e not in top2)
        pruned = dict(
            params, down=params["down"].at[dead].set(0.0)
        )
        out_pruned, _ = moe_swiglu(pruned, x, mesh=None)
        np.testing.assert_allclose(
            np.asarray(out_full.reshape(-1, H)[0]),
            np.asarray(out_pruned.reshape(-1, H)[0]),
            atol=1e-6,
        )

    def test_gradients_match_dense(self, setup):
        params, x = setup
        mesh = build_expert_mesh(4)

        def ep_loss(p):
            out, aux = moe_swiglu(p, x, mesh=mesh)
            return jnp.mean(out**2) + 0.01 * aux

        def dense_loss(p):
            out, aux = moe_swiglu(p, x, mesh=None)
            return jnp.mean(out**2) + 0.01 * aux

        g_ep = jax.jit(jax.grad(ep_loss))(params)
        g_dense = jax.jit(jax.grad(dense_loss))(params)
        for key in ("router", "gate", "up", "down"):
            np.testing.assert_allclose(
                np.asarray(g_ep[key]), np.asarray(g_dense[key]),
                atol=3e-5, rtol=3e-4,
            )

    def test_load_balance_loss_favors_uniform(self):
        """A uniform router scores lower aux loss than a collapsed one."""
        from video_transformer_tpu.parallel.expert_parallel import _top2_routing

        uniform = jnp.zeros((64, E))
        collapsed = jnp.zeros((64, E)).at[:, 0].set(10.0).at[:, 1].set(9.0)
        _, aux_uniform = _top2_routing(uniform)
        _, aux_collapsed = _top2_routing(collapsed)
        assert float(aux_uniform) < float(aux_collapsed)
