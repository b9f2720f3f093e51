"""Inference engine tests on the virtual 8-device CPU mesh."""

import json

import jax
import numpy as np
import pytest

from video_transformer_tpu.models.config import (
    DecoderConfig,
    EncoderConfig,
    VLMConfig,
)
from video_transformer_tpu.ops.constrained import DfaBuilder
from video_transformer_tpu.parallel.engine import InferenceEngine
from video_transformer_tpu.parallel.mesh import build_mesh, mesh_shape_from_config
from video_transformer_tpu.parallel.sharding import param_shardings, spec_for_path


def micro_config() -> VLMConfig:
    return VLMConfig(
        name="micro",
        encoder=EncoderConfig(
            hidden_dim=64, num_layers=1, num_heads=2, head_dim=32, mlp_dim=128,
            image_size=32, patch_size=16, tubelet_t=2, num_frames=4,
        ),
        decoder=DecoderConfig(
            vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
            num_kv_heads=2, head_dim=32, mlp_dim=128, max_seq_len=1024,
        ),
        dtype="float32",
    )


def tiny_dfa():
    return (
        DfaBuilder()
        .literal('{"title": ')
        .free_string(1, 8)
        .literal(', "tags": ')
        .string_list(1, 6)
        .literal("}")
        .finish()
    )


class TestMesh:
    def test_mesh_shape_resolution(self):
        assert mesh_shape_from_config({"data": -1, "model": 2}, 8) == (4, 2)
        assert mesh_shape_from_config({}, 8) == (8, 1)
        assert mesh_shape_from_config({"data": 2, "model": 4}, 8) == (2, 4)

    def test_invalid_mesh_raises(self):
        with pytest.raises(ValueError):
            mesh_shape_from_config({"model": 3}, 8)
        with pytest.raises(ValueError):
            mesh_shape_from_config({"data": 3, "model": 2}, 8)

    def test_build_mesh_axes(self):
        mesh = build_mesh({"data": 4, "model": 2})
        assert mesh.shape == {"data": 4, "model": 2}


class TestShardingRules:
    def test_column_parallel_rules(self):
        from jax.sharding import PartitionSpec as P

        assert spec_for_path(("decoder", "layer_0", "attn", "q", "kernel")) == P(
            None, "model"
        )
        assert spec_for_path(("decoder", "layer_0", "attn", "out", "kernel")) == P(
            "model", None
        )
        assert spec_for_path(("decoder", "embed", "embedding")) == P()
        assert spec_for_path(("decoder", "layer_1", "mlp", "down", "kernel")) == P(
            "model", None
        )


class TestInferenceEngine:
    @pytest.fixture(scope="class")
    def engine(self):
        mesh = build_mesh({"data": 4, "model": 2})
        return InferenceEngine(
            micro_config(),
            mesh=mesh,
            dfa=tiny_dfa(),
            max_new_tokens=128,
            temperature=1.0,
            seed=0,
        )

    def test_generate_valid_json(self, engine):
        frames = np.random.default_rng(0).integers(
            0, 255, (2, 4, 32, 32, 3), dtype=np.uint8
        )
        texts = engine.generate(frames, ["analyze", "analyze"], prompt_len=16)
        assert len(texts) == 2
        for text in texts:
            parsed = json.loads(text)
            assert "title" in parsed and "tags" in parsed
            assert isinstance(parsed["tags"], list)

    def test_batch_padding_to_mesh(self, engine):
        # 3 clips on a data=4 mesh: padded internally, 3 results out.
        frames = np.random.default_rng(1).integers(
            0, 255, (3, 4, 32, 32, 3), dtype=np.uint8
        )
        texts = engine.generate(frames, ["a", "b", "c"], prompt_len=16)
        assert len(texts) == 3
        for text in texts:
            json.loads(text)

    def test_stats_accumulate(self, engine):
        stats = engine.stats.as_dict()
        assert stats["generate_calls"] >= 2
        assert stats["tokens_generated"] > 0
        assert stats["frames_preprocessed"] > 0

    def test_bf16_serving_params_and_restore(self, tmp_path):
        """param_dtype=bfloat16: weights resident in bf16 (decode is weight-
        bandwidth-bound), f32 checkpoints restore through an f32 template
        then cast, and generation still emits valid grammar output."""
        import jax

        from video_transformer_tpu.train.trainer import TrainConfig, Trainer

        mesh = build_mesh({"data": 8, "model": 1})
        trainer = Trainer(micro_config(), mesh, TrainConfig(total_steps=1))
        trainer.save_checkpoint(str(tmp_path))

        engine = InferenceEngine(
            micro_config(),
            mesh=mesh,
            dfa=tiny_dfa(),
            max_new_tokens=96,
            temperature=1.0,
            seed=0,
            param_dtype="bfloat16",
            compilation_cache_dir=None,
        )
        engine.restore(str(tmp_path))
        leaves = jax.tree_util.tree_leaves(engine.params)
        float_leaves = [x for x in leaves if x.dtype in ("bfloat16", "float32")]
        assert float_leaves and all(
            x.dtype == "bfloat16" for x in float_leaves
        )
        texts = engine.generate_text(["hello"], prompt_len=16)
        json.loads(texts[0])

    def test_token_cap_truncation_is_safe(self):
        """Generation that cannot reach the accept state within max_new must
        still return cleanly (truncated text; repair handles it upstream)."""
        import jax

        dfa = (
            DfaBuilder()
            .literal('{"long": ')
            .free_string(200, 400)  # min length alone exceeds the cap
            .literal("}")
            .finish()
        )
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=dfa, max_new_tokens=32, temperature=1.0, seed=0,
        )
        frames = np.zeros((1, 4, 32, 32, 3), np.uint8)
        text = engine.generate(frames, ["x"], prompt_len=8)[0]
        assert text.startswith('{"long": "')
        with pytest.raises(json.JSONDecodeError):
            json.loads(text)  # truncated by design
        # Emitted token count respects the cap (+ one fast-forward block).
        assert engine.stats.tokens_generated <= 32 + 1 + engine.max_forced_run

    def test_mixed_completion_rows(self):
        """Rows finishing at very different lengths stay independent."""
        import jax

        dfa = (
            DfaBuilder()
            .literal('{"v": ')
            .free_string(1, 60)
            .literal("}")
            .finish()
        )
        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 4, "model": 2}),
            dfa=dfa, max_new_tokens=128, temperature=1.0, seed=2,
        )
        frames = np.zeros((4, 4, 32, 32, 3), np.uint8)
        texts = engine.generate(frames, ["a", "b", "c", "d"], prompt_len=8)
        lengths = set()
        for text in texts:
            parsed = json.loads(text)
            lengths.add(len(parsed["v"]))
        assert len(lengths) > 1  # rows diverged and each still parsed

    def test_free_decoding_mode(self):
        """dfa=None: unconstrained sampling terminates on EOS or the cap."""
        import jax

        engine = InferenceEngine(
            micro_config(),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            dfa=None,
            max_new_tokens=24,
            temperature=1.0,
            seed=0,
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 4, 32, 32, 3), dtype=np.uint8
        )
        text = engine.generate(frames, ["x"], prompt_len=8)[0]
        assert isinstance(text, str)
        assert len(text.encode("utf-8", "replace")) <= 24

    def test_params_are_sharded(self, engine):
        shardings = param_shardings(engine.mesh, engine.params)
        q_kernel = engine.params["params"]["decoder"]["layer_0"]["attn"]["q"][
            "kernel"
        ]
        # Column-parallel: second dim split over 2 model shards.
        assert q_kernel.sharding.shard_shape(q_kernel.shape) == (64, 32)


class TestBlockWidthInvariance:
    def test_greedy_output_invariant_to_forced_run_width(self):
        """At temperature 0 the emitted text is identical for any
        max_forced_run: splitting a forced literal run across steps feeds
        the decoder the same prefix before each sampled token, so the
        block width is a pure performance knob (tools/decode_bench.py
        forceN picks the serving default)."""
        texts = {}
        for width in (12, 2):
            engine = InferenceEngine(
                micro_config(),
                mesh=build_mesh({"data": 4, "model": 2}),
                dfa=tiny_dfa(),
                max_new_tokens=96,
                temperature=0.0,
                seed=0,
                max_forced_run=width,
            )
            texts[width] = engine.generate_text(["总结要点"] * 2)
        assert texts[12] == texts[2]
