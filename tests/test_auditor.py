"""Vision-grounded image audit (reference quality_auditor.py:151-245).

The reference uploads the rendered PNG to a vision model; the TPU-native
auditor must likewise put the IMAGE in front of the model, not just the
note text. These tests prove the plumbing with a fake engine that scores
from what it actually sees in the frames: a matched image/note pair passes
while a deliberately mismatched pair fails, even though both images are
forensically identical in structure.
"""

import json
import logging

import numpy as np
import pytest
from PIL import Image, ImageDraw

from video_transformer_tpu.pipeline.auditor import QualityAuditor
from video_transformer_tpu.utils.counter import APICounter


def _diagram(path, color):
    """A forensically healthy diagram: white bg, boxes + connectors in
    ``color``. Both colors score identically on the pixel forensics, so any
    pass/fail difference must come from the model seeing the image."""
    img = Image.new("RGB", (640, 480), "white")
    d = ImageDraw.Draw(img)
    for i in range(3):
        x = 60 + i * 190
        d.rectangle([x, 120, x + 150, 220], outline=color, width=6)
        d.rectangle([x + 20, 300, x + 130, 380], fill=color)
        if i < 2:
            d.line([x + 150, 170, x + 190, 170], fill=color, width=6)
    img.save(path)
    return path


class VisionJudgeEngine:
    """Fake engine whose verdict depends on the pixels it receives.

    It mimics the real engine surface the auditor touches: config.encoder
    geometry, wrap_grammar, byte_vocab, and the video generate() entry
    point. The judge rule — red diagrams match this note, blue ones don't —
    stands in for real visual grounding; what matters is that the score is
    a function of the frames argument.
    """

    def __init__(self):
        self.calls = []

        class _Enc:
            num_frames = 4

        class _Cfg:
            encoder = _Enc()

        self.config = _Cfg()
        self.byte_vocab = 512

    def wrap_grammar(self, dfa):
        return dfa

    def generate(self, frames, prompts, dfa=None):
        assert isinstance(frames, np.ndarray) and frames.dtype == np.uint8
        b, t, h, w, c = frames.shape
        assert (b, t, c) == (1, 4, 3), frames.shape
        self.calls.append({"prompt": prompts[0], "shape": frames.shape})
        shapes = frames[0, 0].reshape(-1, 3).astype(np.int32)
        ink = shapes[np.abs(shapes - 255).sum(axis=1) > 60]
        red = float(ink[:, 0].mean()) if len(ink) else 0.0
        blue = float(ink[:, 2].mean()) if len(ink) else 0.0
        score = 92 if red > blue else 18
        return [json.dumps({"score": score, "feedback": "视觉判定"})]

    def generate_text(self, *a, **k):  # pragma: no cover - must not be hit
        raise AssertionError("image audit must use the vision path")


def _auditor(engine):
    auditor = QualityAuditor(
        {"auditor": {"threshold": 75, "use_engine": True}},
        APICounter({}),
        logging.getLogger("test"),
    )
    auditor.attach_engine(engine)
    return auditor


def test_matched_image_passes_mismatched_fails(tmp_path):
    engine = VisionJudgeEngine()
    auditor = _auditor(engine)
    note = "# 笔记\n红色模块化流程图，三个层级。" * 10

    matched = auditor.audit_image(_diagram(tmp_path / "m.png", (200, 30, 30)), note)
    mismatched = auditor.audit_image(_diagram(tmp_path / "x.png", (30, 30, 200)), note)

    assert matched.passed and matched.score >= 75
    assert not mismatched.passed and mismatched.score < 75
    # Both audits reached the model through the VIDEO path with the image.
    assert len(engine.calls) == 2
    assert "笔记摘录" in engine.calls[0]["prompt"]
    assert note[:40].split("\n")[0] in engine.calls[0]["prompt"]


def test_image_clip_geometry(tmp_path):
    engine = VisionJudgeEngine()
    auditor = _auditor(engine)
    big = Image.new("RGB", (1920, 1080), "white")
    ImageDraw.Draw(big).rectangle([100, 100, 1500, 900], outline="black", width=20)
    big.save(tmp_path / "big.png")

    clip = auditor._image_clip(tmp_path / "big.png")
    assert clip.dtype == np.uint8
    assert clip.shape[0] == 1 and clip.shape[1] == 4 and clip.shape[4] == 3
    assert max(clip.shape[2], clip.shape[3]) <= 512  # host-side downscale
    assert np.array_equal(clip[0, 0], clip[0, 3])  # still tiled across time


def test_engine_failure_defaults_to_pass(tmp_path):
    class Boom(VisionJudgeEngine):
        def generate(self, *a, **k):
            raise RuntimeError("tunnel down")

    auditor = _auditor(Boom())
    result = auditor.audit_image(
        _diagram(tmp_path / "d.png", (200, 30, 30)), "note"
    )
    assert result.passed  # reference default-pass semantics
