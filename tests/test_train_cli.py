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


class TestGroundingEval:
    def test_restore_skips_orbax_tmp_dirs(self, tmp_path):
        """A killed save leaves params_N.orbax-checkpoint-tmp; restore must
        pick the highest COMPLETE checkpoint, not crash on the suffix."""
        import orbax.checkpoint as ocp

        import __graft_entry__
        from video_transformer_tpu.parallel.engine import InferenceEngine

        engine = InferenceEngine(
            __graft_entry__._tiny_config(), compilation_cache_dir=None
        )
        with ocp.StandardCheckpointer() as checkpointer:
            checkpointer.save(
                str((tmp_path / "params_7").resolve()), engine.params
            )
        (tmp_path / "params_9.orbax-checkpoint-tmp").mkdir()
        engine.restore(str(tmp_path))  # picks params_7; no crash on _9-tmp

    def test_run_eval_scores_hits(self):
        """run_eval counts a hit only when the note names the clip's topic."""
        import json as _json

        from video_transformer_tpu.train.eval_grounding import run_eval
        from video_transformer_tpu.train.grounded import TOPIC_BANK

        class StubEngine:
            class config:
                class encoder:
                    num_frames = 2
                    image_size = 16

            class stats:
                tokens_per_second = 0.0

            def __init__(self):
                self.calls = 0

            def generate(self, frames, prompts):
                # First row names its topic, second row names the wrong one.
                out = []
                for i in range(frames.shape[0]):
                    name = TOPIC_BANK[0].name if self.calls == 0 else "错误主题"
                    self.calls += 1
                    out.append(_json.dumps({"title": name, "deep_dive": []},
                                           ensure_ascii=False))
                return out

        report = run_eval(StubEngine(), [0, 5], batch=1)
        assert report["total"] == 2
        assert report["hits"] == 1
        assert report["per_topic"][TOPIC_BANK[0].name] is True
        assert report["per_topic"][TOPIC_BANK[5].name] is False

    def test_run_eval_composite_requires_both_topics(self):
        """A composite clip hits only when the note names BOTH topics."""
        import json as _json

        from video_transformer_tpu.train.eval_grounding import run_eval
        from video_transformer_tpu.train.grounded import TOPIC_BANK

        class StubEngine:
            class config:
                class encoder:
                    num_frames = 2
                    image_size = 16

            class stats:
                tokens_per_second = 0.0

            def __init__(self):
                self.calls = 0

            def generate(self, frames, prompts):
                out = []
                for _ in range(frames.shape[0]):
                    if self.calls == 0:
                        title = TOPIC_BANK[1].name + "与" + TOPIC_BANK[2].name
                    else:
                        title = TOPIC_BANK[3].name  # names only one of the pair
                    self.calls += 1
                    out.append(_json.dumps({"title": title, "deep_dive": []},
                                           ensure_ascii=False))
                return out

        report = run_eval(
            StubEngine(), [], batch=1, composite_pairs=[(1, 2), (3, 4)]
        )
        assert report["composite_total"] == 2
        assert report["composite_hits"] == 1
        both = f"{TOPIC_BANK[1].name}+{TOPIC_BANK[2].name}"
        one = f"{TOPIC_BANK[3].name}+{TOPIC_BANK[4].name}"
        assert report["per_composite"][both] == "both"
        # The miss records WHICH side landed (the secondary dying in
        # pooling is the known composite failure mode).
        assert report["per_composite"][one] == "primary"


class TestPromptProfiles:
    """Prompt-profile unification (round 4): one checkpoint, both profiles."""

    def test_mixed_sampler_draws_both_profiles(self):
        """'mixed' must emit BOTH the compact and the spec analysis prompt
        across draws (per-row 50/50), and every draw must be one of the two
        pure profiles — never a third variant."""
        from video_transformer_tpu.analyzer.prompts import render_prompt
        from video_transformer_tpu.train.run import make_prompt_sampler

        sampler = make_prompt_sampler("mixed")
        rng = np.random.default_rng(7)
        drawn = {len(sampler(rng)) for _ in range(40)}
        # The spec analysis prompt is ~6x the compact one; seeing both size
        # classes proves both profiles are served.
        compact_max = max(
            len(render_prompt("analysis", {"duration_label": "01:00"},
                              profile="compact")),
            len(render_prompt(
                "segment_analysis",
                {"segment_index": 1, "segment_total": 2,
                 "start_label": "00:00", "end_label": "01:00"},
                profile="compact")),
        ) + 32  # duration labels vary a few chars
        assert any(length <= compact_max for length in drawn)
        assert any(length > 2 * compact_max for length in drawn)

    def test_run_eval_serves_requested_profile(self):
        """run_eval(profile=...) must hand engine.generate the profile's
        prompt — scoring a spec-finetuned checkpoint under compact (or vice
        versa) silently measures the wrong distribution."""
        import json as _json

        from video_transformer_tpu.train.eval_grounding import run_eval

        seen: list[str] = []

        class StubEngine:
            class config:
                class encoder:
                    num_frames = 2
                    image_size = 16

            class stats:
                tokens_per_second = 0.0

            def generate(self, frames, prompts):
                seen.extend(prompts)
                return [_json.dumps({"title": "x"})] * frames.shape[0]

        run_eval(StubEngine(), [0], batch=1, profile="spec")
        spec_len = len(seen[0])
        seen.clear()
        run_eval(StubEngine(), [0], batch=1)  # default stays compact
        assert spec_len > 4 * len(seen[0])
