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
