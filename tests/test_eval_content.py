"""Content-quality eval scoring (train/eval_content.py).

The coverage checks are the measurable stand-in for "is the note BODY
faithful", so they must themselves be trustworthy: a teacher note (the
distillation target, train/grounded.py::grounded_note) scores 1.0, a
title-only shell scores near the floor, and a note carrying ANOTHER topic's
content is flagged by the contamination counter.
"""

import numpy as np

from video_transformer_tpu.train.eval_content import (
    _contamination,
    content_checks,
)
from video_transformer_tpu.train.grounded import TOPIC_BANK, grounded_note


def test_teacher_note_scores_full_coverage():
    rng = np.random.default_rng(0)
    for idx in (0, 7, 23, 40):
        topic = TOPIC_BANK[idx]
        note = grounded_note(topic, rng)
        checks = content_checks(note, topic)
        assert all(checks.values()), (
            f"teacher note for {topic.name} fails its own coverage: "
            f"{[k for k, v in checks.items() if not v]}"
        )


def test_title_only_shell_scores_low():
    topic = TOPIC_BANK[3]
    shell = {
        "title": f"{topic.name}讲解",
        "one_sentence_summary": "本视频讲解了一些内容",
        "key_takeaways": ["认真学习很重要"],
        "deep_dive": [
            {
                "chapter_title": "第一章",
                "chapter_summary": "概述",
                "sections": [{"topic": "概述", "explanation": "略"}],
            }
        ],
        "glossary": {"概念": "一个概念"},
        "visual_schemas": [{"type": "overview", "schema": "A -> B"}],
    }
    checks = content_checks(shell, topic)
    assert checks["title_names_topic"]
    # Everything body-level must fail: that is the gap topic-naming
    # hit rates cannot see.
    assert sum(checks.values()) <= 2


def test_wrong_topic_body_is_contaminated():
    rng = np.random.default_rng(1)
    right, wrong = TOPIC_BANK[0], TOPIC_BANK[5]
    note = grounded_note(wrong, rng)
    note["title"] = f"{right.name}精讲"  # names the right topic...
    text = __import__("json").dumps(note, ensure_ascii=False)
    checks = content_checks(note, right)
    assert checks["title_names_topic"]
    assert not checks["deep_dive_covers_terms"]
    assert not checks["gloss_faithful"]
    assert _contamination(text, right, TOPIC_BANK) >= 1


def test_parse_failure_fields_absent():
    topic = TOPIC_BANK[2]
    checks = content_checks({}, topic)
    assert not any(checks.values())


class TestAttrGrounding:
    """Frame-attribute grounding: randomized orientation/shape-count must
    flow render -> teacher note -> stated_attrs round trip, and the parser
    must refuse ambiguous claims."""

    def test_render_respects_attr_overrides(self):
        from video_transformer_tpu.train.grounded import render_topic_clip

        rng = np.random.default_rng(0)
        base = render_topic_clip(5, 4, 64, rng, orient=0, n_shapes=2)
        rng = np.random.default_rng(0)
        rotated = render_topic_clip(5, 4, 64, rng, orient=1, n_shapes=2)
        # Horizontal stripes vary along rows; vertical along columns: the
        # variance of the row-means flips between the two.
        g_base = base[0].mean(axis=2)
        g_rot = rotated[0].mean(axis=2)
        assert g_base.mean(axis=1).std() > g_base.mean(axis=0).std()
        assert g_rot.mean(axis=0).std() > g_rot.mean(axis=1).std()

    def test_teacher_note_states_attrs_and_roundtrips(self):
        from video_transformer_tpu.train.eval_content import stated_attrs
        from video_transformer_tpu.train.grounded import (
            TOPIC_BANK,
            grounded_note,
        )

        rng = np.random.default_rng(3)
        for orient in range(3):
            for count in (1, 3, 5):
                note = grounded_note(
                    TOPIC_BANK[7], rng, attrs=(orient, count)
                )
                assert stated_attrs(note) == (orient, count)
                # And the attr additions keep full content coverage.
                checks = content_checks(note, TOPIC_BANK[7])
                assert all(checks.values())

    def test_unstated_and_ambiguous_parse_none(self):
        from video_transformer_tpu.train.eval_content import stated_attrs
        from video_transformer_tpu.train.grounded import (
            TOPIC_BANK,
            grounded_note,
        )

        rng = np.random.default_rng(4)
        plain = grounded_note(TOPIC_BANK[2], rng)
        assert stated_attrs(plain) == (None, None)
        hedged = grounded_note(TOPIC_BANK[2], rng, attrs=(0, 2))
        hedged["key_takeaways"].append("画面以纵向条纹展示四个移动方块")
        assert stated_attrs(hedged) == (None, None)

    def test_default_rendering_unchanged(self):
        """attrs=None must reproduce the historical idx-bound clip byte
        for byte — existing checkpoints/evals depend on it."""
        from video_transformer_tpu.train.grounded import render_topic_clip

        a = render_topic_clip(9, 4, 64, np.random.default_rng(11))
        b = render_topic_clip(
            9, 4, 64, np.random.default_rng(11),
            orient=None, n_shapes=None,
        )
        assert np.array_equal(a, b)
