"""End-to-end training CLI + checkpoint restore into the inference engine."""

import numpy as np
import pytest


class TestTrainingCLI:
    def test_synthetic_smoke_run_and_restore(self, tmp_path):
        """Train a few steps via the CLI, then restore into an engine."""
        from video_transformer_tpu.train.run import main

        out = tmp_path / "ckpt"
        code = main(
            [
                "--preset", "tiny", "--steps", "4", "--batch", "2",
                "--text-len", "64", "--out", str(out),
                "--log-dir", str(tmp_path / "logs"), "--checkpoint-every", "0",
            ]
        )
        assert code == 0
        checkpoints = list(out.glob("params_*"))
        assert checkpoints, "final checkpoint missing"

        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        import jax

        engine = InferenceEngine(
            get_preset("tiny"),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            max_new_tokens=8,
        )
        before = np.asarray(
            jax.tree_util.tree_leaves(engine.params)[0]
        ).copy()
        engine.restore(str(out))  # parent dir: picks highest params_N
        after = np.asarray(jax.tree_util.tree_leaves(engine.params)[0])
        assert not np.allclose(before, after)

    def test_restore_missing_raises(self, tmp_path):
        import jax

        from video_transformer_tpu.models.config import get_preset
        from video_transformer_tpu.parallel.engine import InferenceEngine
        from video_transformer_tpu.parallel.mesh import build_mesh

        engine = InferenceEngine(
            get_preset("tiny"),
            mesh=build_mesh({"data": 1, "model": 1}, devices=jax.devices()[:1]),
            max_new_tokens=8,
        )
        (tmp_path / "empty").mkdir()
        with pytest.raises(FileNotFoundError):
            engine.restore(str(tmp_path / "empty"))

    def test_staged_data_pipeline(self, tmp_path):
        """distillation_records + staged batch construction."""
        import json

        from video_transformer_tpu.train.data import distillation_records
        from video_transformer_tpu.video.containers import write_npzv

        frames = np.zeros((8, 16, 16, 3), np.uint8)
        write_npzv(tmp_path / "vid1.npzv", frames, fps=4.0)
        (tmp_path / "vid1.note.json").write_text(
            json.dumps({"title": "t"}), encoding="utf-8"
        )
        (tmp_path / "orphan.note.json").write_text("{}", encoding="utf-8")
        records = list(distillation_records(tmp_path))
        assert len(records) == 1
        assert records[0][1] == {"title": "t"}
