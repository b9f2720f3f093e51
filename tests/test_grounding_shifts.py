"""Out-of-distribution style shifts (train/shifts.py) + eval integration.

The shifts exist to measure grounding OUTSIDE the training render
distribution (VERDICT round-2, Missing #2), so the tests pin the two
properties the harness depends on: every shift is label-preserving
(signature channels survive) and genuinely changes the pixels.
"""

import json

import numpy as np
import pytest

from video_transformer_tpu.train.eval_grounding import run_eval
from video_transformer_tpu.train.grounded import (
    TOPIC_BANK,
    _topic_palette,
    render_topic_clip,
)
from video_transformer_tpu.train.shifts import SHIFT_BANK, apply_shift


class TestShiftBank:
    @pytest.mark.parametrize("name", sorted(SHIFT_BANK))
    def test_shape_dtype_and_actually_shifts(self, name):
        rng = np.random.default_rng(3)
        frames = render_topic_clip(5, 4, 32, rng)
        out = apply_shift(name, frames, rng)
        assert out.shape == frames.shape
        assert out.dtype == np.uint8
        assert not np.array_equal(out, frames), f"{name} was a no-op"

    @pytest.mark.parametrize("name", sorted(SHIFT_BANK))
    def test_label_preserving_palette(self, name):
        """After any shift, the clip's mean color stays closer to its own
        topic palette than to a far-away topic's — the hue channel of the
        signature survives (the cheapest label-preservation proxy)."""
        rng = np.random.default_rng(7)
        idx, far = 3, 14  # golden-ratio hues: far-apart palettes
        frames = render_topic_clip(idx, 4, 32, rng)
        out = apply_shift(name, frames, rng).astype(np.float32)
        if name == "zoom_out":  # ignore the gray letterbox border
            out = out[:, 4:28, 4:28]
        mean = out.mean(axis=(0, 1, 2))

        def palette_dist(topic_idx):
            fg, bg = _topic_palette(topic_idx)
            return float(np.linalg.norm(mean - (fg + bg) / 2))

        assert palette_dist(idx) < palette_dist(far)

    def test_time_reverse_is_pure_reordering(self):
        rng = np.random.default_rng(0)
        frames = render_topic_clip(1, 6, 16, rng)
        out = apply_shift("time_reverse", frames, rng)
        assert np.array_equal(out, frames[::-1])

    def test_unknown_shift_raises(self):
        with pytest.raises(KeyError):
            apply_shift("nope", np.zeros((2, 8, 8, 3), np.uint8), np.random.default_rng(0))


class TestEvalWithShifts:
    def test_run_eval_reports_per_shift_buckets(self):
        """Shifted clips are scored per shift; an engine that always names
        topic 0 hits only topic 0's rows in every bucket."""

        class StubEngine:
            class config:
                class encoder:
                    num_frames = 2
                    image_size = 16

            class stats:
                tokens_per_second = 0.0

            def generate(self, frames, prompts):
                note = json.dumps(
                    {"title": TOPIC_BANK[0].name, "deep_dive": []},
                    ensure_ascii=False,
                )
                return [note] * frames.shape[0]

        report = run_eval(
            StubEngine(), [0, 5], batch=2, shifts=["time_reverse", "posterize4"]
        )
        assert report["hits"] == 1  # in-distribution: topic 0 only
        assert report["ood_total"] == 4
        assert report["ood_hits"] == 2
        for shift in ("time_reverse", "posterize4"):
            bucket = report["per_shift"][shift]
            assert bucket["total"] == 2
            assert bucket["per_topic"][TOPIC_BANK[0].name] is True
            assert bucket["per_topic"][TOPIC_BANK[5].name] is False
