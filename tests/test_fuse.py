"""Serve-time projection fusion (models/fuse.py).

Fusing q/k/v and gate/up into single wide kernels must be a pure execution
re-plan: identical greedy tokens for every quant mode, identical math for
biased (Qwen2-style) projections, and a param tree whose fused leaves
replace the per-projection ones. Reference basis: none — the reference has
no model serving code (cloud API calls, content_analyzer.py); this is
TPU-serving machinery of the rebuild.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np
import pytest

from video_transformer_tpu.models.config import get_preset
from video_transformer_tpu.models.fuse import fuse_projections
from video_transformer_tpu.models.lm import Decoder
from video_transformer_tpu.models.quant import quantize_decoder


def _leaf_names(tree) -> set[str]:
    return {jtu.keystr(kp) for kp, _ in jtu.tree_flatten_with_path(tree)[0]}


def _decoder_variables(cfg, rng, quant=None):
    model = Decoder(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    variables = model.init(rng, tokens)
    variables = {"params": {"decoder": variables["params"]}}
    if quant:
        variables = quantize_decoder(variables, quant)
    return model, variables


def _apply(model, variables, tokens):
    scoped = {"params": variables["params"]["decoder"]}
    if "quant" in variables:
        scoped["quant"] = variables["quant"]["decoder"]
    logits, _ = model.apply(scoped, tokens)
    return logits


class TestFuseTransform:
    def test_fused_tree_structure(self):
        cfg = get_preset("tiny").decoder
        _, variables = _decoder_variables(cfg, jax.random.PRNGKey(0), "int8")
        fused = fuse_projections(variables)
        names = _leaf_names(fused)
        assert any("qkv_kernel" in n for n in names)
        assert any("gateup_kernel" in n for n in names)
        assert any("qkv_scale" in n for n in names)
        assert not any("['attn']['q']" in n for n in names)
        assert not any("['mlp']['gate']" in n for n in names)
        # out/down stay per-module (their scales too)
        assert any("['attn']['out']['kernel']" in n for n in names)
        assert any("['mlp']['down']['scale']" in n for n in names)

    def test_idempotent_and_input_unaliased(self):
        cfg = get_preset("tiny").decoder
        _, variables = _decoder_variables(cfg, jax.random.PRNGKey(0))
        fused = fuse_projections(variables)
        assert _leaf_names(fuse_projections(fused)) == _leaf_names(fused)
        # the caller's tree still carries the separate projections
        assert any("['attn']['q']" in n for n in _leaf_names(variables))

    @pytest.mark.parametrize("quant", [None, "int8", "int4"])
    def test_logits_parity(self, quant):
        cfg = get_preset("tiny").decoder
        model, variables = _decoder_variables(cfg, jax.random.PRNGKey(1), quant)
        tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
        base = _apply(model, variables, tokens)
        fused = _apply(model, fuse_projections(variables), tokens)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(fused), rtol=1e-5, atol=1e-5
        )

    def test_qkv_bias_parity(self):
        """Qwen2-style biased projections: biases concat and add after the
        scale epilogue, matching the unfused QDense order."""
        from dataclasses import replace

        cfg = replace(get_preset("tiny").decoder, qkv_bias=True)
        model, variables = _decoder_variables(cfg, jax.random.PRNGKey(3), "int8")
        # random biases (init gives zeros, which would hide ordering bugs)
        def randomize_bias(path, leaf):
            if path[-1].key == "bias":
                return jax.random.normal(jax.random.PRNGKey(hash(str(path)) % 2**31), leaf.shape) * 0.1
            return leaf

        variables = jtu.tree_map_with_path(randomize_bias, variables)
        fused = fuse_projections(variables)
        assert any("qkv_bias" in n for n in _leaf_names(fused))
        tokens = jax.random.randint(jax.random.PRNGKey(4), (1, 8), 0, cfg.vocab_size)
        np.testing.assert_allclose(
            np.asarray(_apply(model, variables, tokens)),
            np.asarray(_apply(model, fused, tokens)),
            rtol=1e-5, atol=1e-5,
        )


class TestEngineFusion:
    @pytest.mark.parametrize("quant", [None, "int8"])
    def test_greedy_decode_parity(self, quant):
        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        cfg = get_preset("tiny")
        mesh = build_mesh({"model": 1})
        prompts = ["测试"] * 2
        outs = {}
        for fuse in (False, True):
            engine = InferenceEngine(
                cfg, mesh=mesh,
                dfa=note_dfa(cfg.decoder.vocab_size, scale=0.25),
                max_new_tokens=32, temperature=0.0, seed=0,
                param_dtype="bfloat16", quantize=quant,
                fuse_projections=fuse,
            )
            names = _leaf_names(engine.params)
            assert any("qkv_kernel" in n for n in names) == fuse
            outs[fuse] = engine.generate_text(prompts)
        assert outs[False] == outs[True]

    def test_fusion_disabled_under_tensor_parallelism(self):
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        if len(jax.devices()) < 2:
            pytest.skip("needs >=2 devices")
        cfg = get_preset("tiny")
        mesh = build_mesh({"model": 2})
        engine = InferenceEngine(
            cfg, mesh=mesh, max_new_tokens=8, temperature=0.0,
            fuse_projections=True,  # asked for, but TP makes it illegal
        )
        assert not engine.fuse_projections
        assert not any("qkv_kernel" in n for n in _leaf_names(engine.params))
