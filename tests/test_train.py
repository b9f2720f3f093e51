"""Trainer tests: sharded train step on the virtual mesh; loss goes down."""

import numpy as np
import pytest

from video_transformer_tpu.models.config import (
    DecoderConfig,
    EncoderConfig,
    VLMConfig,
)
from video_transformer_tpu.ops.constrained import DfaBuilder
from video_transformer_tpu.parallel.mesh import build_mesh
from video_transformer_tpu.train.data import sample_dfa_text, synthetic_batch
from video_transformer_tpu.train.trainer import TrainConfig, Trainer


def micro_config():
    return VLMConfig(
        name="micro-train",
        encoder=EncoderConfig(
            hidden_dim=64, num_layers=1, num_heads=2, head_dim=32, mlp_dim=128,
            image_size=32, patch_size=16, tubelet_t=2, num_frames=4,
        ),
        decoder=DecoderConfig(
            vocab_size=512, hidden_dim=64, num_layers=2, num_heads=2,
            num_kv_heads=2, head_dim=32, mlp_dim=128, max_seq_len=512,
        ),
        dtype="float32",
    )


class TestTrainer:
    def test_loss_decreases_on_fixed_batch(self):
        mesh = build_mesh({"data": 4, "model": 2})
        trainer = Trainer(
            micro_config(), mesh,
            TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=50),
        )
        rng = np.random.default_rng(0)
        patches, tokens = synthetic_batch(rng, micro_config(), batch=4, text_len=48)
        first = trainer.step(patches, tokens)
        for _ in range(8):
            last = trainer.step(patches, tokens)
        assert np.isfinite(first["loss"]) and np.isfinite(last["loss"])
        assert last["loss"] < first["loss"]
        assert trainer.step_count == 9

    def test_pipeline_parallel_trainer_matches_sequential(self):
        """One PP train step (2 stages, 2 microbatches) produces the same
        loss/metrics as the sequential step on identical init + batch, and
        subsequent steps keep training (GPipe backward is exact, not an
        approximation)."""
        from video_transformer_tpu.parallel.pipeline_parallel import (
            build_pipe_mesh,
        )

        config = micro_config()
        tc = TrainConfig(
            learning_rate=1e-3, warmup_steps=1, total_steps=50,
            pp_microbatches=2,
        )
        seq = Trainer(config, build_mesh({"data": 4, "model": 2}), tc, seed=11)
        pp = Trainer(config, build_pipe_mesh(2), tc, seed=11)
        assert pp.use_pp and not seq.use_pp

        rng = np.random.default_rng(3)
        patches, tokens = synthetic_batch(rng, config, batch=4, text_len=48)
        m_seq = seq.step(patches, tokens)
        m_pp = pp.step(patches, tokens)
        assert abs(m_seq["loss"] - m_pp["loss"]) < 2e-3
        assert abs(m_seq["accuracy"] - m_pp["accuracy"]) < 1e-6

        first = m_pp["loss"]
        for _ in range(6):
            last = pp.step(patches, tokens)
        assert last["loss"] < first

    def test_pipeline_trainer_1f1b_matches_sequential(self):
        """The 1F1B schedule's hand-written backward trains identically."""
        from video_transformer_tpu.parallel.pipeline_parallel import (
            build_pipe_mesh,
        )

        config = micro_config()
        tc = TrainConfig(
            learning_rate=1e-3, warmup_steps=1, total_steps=50,
            pp_microbatches=2, pp_schedule="1f1b",
        )
        seq = Trainer(
            config, build_mesh({"data": 4, "model": 2}),
            TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=50),
            seed=11,
        )
        pp = Trainer(config, build_pipe_mesh(2), tc, seed=11)

        rng = np.random.default_rng(3)
        patches, tokens = synthetic_batch(rng, config, batch=4, text_len=48)
        m_seq = seq.step(patches, tokens)
        m_pp = pp.step(patches, tokens)
        assert abs(m_seq["loss"] - m_pp["loss"]) < 2e-3
        assert abs(m_seq["accuracy"] - m_pp["accuracy"]) < 1e-6
        first = m_pp["loss"]
        for _ in range(4):
            last = pp.step(patches, tokens)
        assert last["loss"] < first

    def test_pipeline_trainer_rejects_uneven_stages(self):
        from video_transformer_tpu.parallel.pipeline_parallel import (
            build_pipe_mesh,
        )

        with pytest.raises(ValueError, match="pipeline stages"):
            Trainer(micro_config(), build_pipe_mesh(3))  # 2 layers % 3 != 0

    def test_remat_and_accumulation(self):
        mesh = build_mesh({"data": 4, "model": 2})
        trainer = Trainer(
            micro_config(), mesh,
            TrainConfig(
                learning_rate=1e-3, warmup_steps=1, total_steps=50,
                accum_steps=2, remat=True,
            ),
        )
        rng = np.random.default_rng(2)
        patches, tokens = synthetic_batch(rng, micro_config(), batch=4, text_len=32)
        import jax

        before = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0]).copy()
        trainer.step(patches, tokens)  # accumulation step: no param update yet
        assert int(trainer.opt_state.gradient_step) == 0
        mid = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
        np.testing.assert_allclose(before, mid)
        # Three more micro-steps: 2 applied updates, the second past warmup
        # (the first applied update runs at warmup lr=0).
        for _ in range(3):
            trainer.step(patches, tokens)
        assert int(trainer.opt_state.gradient_step) == 2
        after = np.asarray(jax.tree_util.tree_leaves(trainer.params)[0])
        assert not np.allclose(before, after)

    def test_checkpoint_roundtrip(self, tmp_path):
        import jax

        mesh = build_mesh({"data": 8, "model": 1})
        trainer = Trainer(micro_config(), mesh)
        rng = np.random.default_rng(1)
        patches, tokens = synthetic_batch(rng, micro_config(), batch=8, text_len=32)
        trainer.step(patches, tokens)
        trainer.save_checkpoint(str(tmp_path))

        restored = Trainer(micro_config(), mesh, seed=123)
        restored.restore_checkpoint(str(tmp_path / f"params_{trainer.step_count}"))
        for a, b in zip(
            jax.tree_util.tree_leaves(trainer.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # Crash-resume continues the params_N numbering: the next periodic
        # save must land after the restored step, not collide with it.
        assert restored.step_count == trainer.step_count
        restored.step(patches, tokens)
        restored.save_checkpoint(str(tmp_path))
        assert (tmp_path / f"params_{trainer.step_count + 1}").exists()


class TestSyntheticData:
    def test_dfa_sample_is_valid_json(self):
        import json

        dfa = (
            DfaBuilder()
            .literal('{"a": ')
            .free_string(1, 10)
            .literal(', "b": ')
            .string_list(1, 8)
            .literal("}")
            .finish()
        )
        rng = np.random.default_rng(0)
        for _ in range(5):
            text = sample_dfa_text(dfa, rng)
            parsed = json.loads(text)
            assert "a" in parsed and "b" in parsed

    def test_synthetic_batch_shapes(self):
        config = micro_config()
        rng = np.random.default_rng(0)
        patches, tokens = synthetic_batch(rng, config, batch=3, text_len=32)
        assert patches.shape == (3, config.video_tokens, config.encoder.patch_dim)
        assert tokens.shape == (3, 32)
        assert tokens.dtype == np.int32


class TestCompositeGrounding:
    def test_composite_clip_carries_both_signatures(self):
        import numpy as np

        from video_transformer_tpu.train.grounded import (
            render_composite_clip,
            render_topic_clip,
        )

        rng = np.random.default_rng(0)
        size = 32
        comp = render_composite_clip(1, 7, 4, size, rng)
        top_only = render_topic_clip(1, 4, size, np.random.default_rng(0))
        split = int(size * 0.6)
        # Top band tracks the primary topic's palette; bottom band does not.
        top_diff = np.abs(
            comp[:, :split].astype(int) - top_only[:, :split].astype(int)
        ).mean()
        bottom_diff = np.abs(
            comp[:, split:].astype(int) - top_only[:, split:].astype(int)
        ).mean()
        assert bottom_diff > top_diff * 2

    def test_composite_note_names_both_topics_and_replays(self):
        import json

        import numpy as np

        from video_transformer_tpu.analyzer.schema import note_dfa
        from video_transformer_tpu.train.grounded import (
            TOPIC_BANK,
            composite_note,
        )

        rng = np.random.default_rng(1)
        primary, secondary = TOPIC_BANK[3], TOPIC_BANK[30]
        note = composite_note(primary, secondary, rng)
        assert primary.name in note["title"]
        blob = " ".join(note["key_takeaways"]) + json.dumps(
            note["deep_dive"], ensure_ascii=False
        )
        assert secondary.name in blob
        # Full note must replay through the byte grammar (trainable pair).
        dfa = note_dfa(512)
        table = dfa.next_state
        state = dfa.start
        for byte in json.dumps(note, ensure_ascii=False).encode("utf-8"):
            state = int(table[state, byte])
            assert state >= 0, "composite note leaves the grammar"
