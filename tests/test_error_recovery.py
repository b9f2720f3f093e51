"""Failure-injection tests: the layered-recovery contract (SURVEY §5).

Mirrors reference test_full_error_recovery.py / test_long_video_edge_cases:
segment failures become gap notes, engine crashes fail the video cleanly,
odd containers and durations degrade gracefully.
"""

import json
import logging

import numpy as np
import pytest

from video_transformer_tpu.analyzer import ContentAnalyzer
from video_transformer_tpu.utils.counter import APICounter, APILimitExceeded
from video_transformer_tpu.video.containers import write_npzv, write_y4m


class ScriptedEngine:
    """Engine stub returning scripted per-call outputs (the reference's
    scripted-response pattern, test_long_video_integration.py:98)."""

    class _Cfg:
        class encoder:
            num_frames = 4

    config = _Cfg()
    data_parallel = 4

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = 0

        class _Stats:
            def as_dict(self):
                return {}

        self.stats = _Stats()

        from video_transformer_tpu.models.tokenizer import ByteTokenizer

        self.tokenizer = ByteTokenizer(512)

    def generate(self, frames, prompts, prompt_len=256, dfa=None,
                 prefixes=None, return_status=False, return_tokens=False):
        out = []
        for _ in prompts:
            if not self.responses:
                raise RuntimeError("script exhausted")
            item = self.responses.pop(0)
            self.calls += 1
            if isinstance(item, Exception):
                raise item
            out.append(item)
        result = (out,)
        if return_status:
            result += ([True] * len(out),)
        if return_tokens:
            result += ([self.tokenizer.encode(t) for t in out],)
        return result if len(result) > 1 else out

    def generate_text(self, prompts, prompt_len=512, dfa=None):
        return self.generate(np.zeros((len(prompts), 1, 1, 1)), prompts)


def note_json(title="T", topic="主题", start=10, end=20):
    return json.dumps(
        {
            "title": title,
            "one_sentence_summary": "总结。",
            "key_takeaways": [f"{title} 的结论"],
            "deep_dive": [
                {
                    "chapter_title": f"{title} 章",
                    "chapter_summary": "",
                    "sections": [
                        {
                            "topic": topic,
                            "explanation": "解释。",
                            "timestamp": {"start": start, "end": end},
                        }
                    ],
                }
            ],
            "glossary": {topic: "定义"},
            "visual_schemas": [
                {"type": "overview", "description": "d", "schema": "A -> B"}
            ],
        },
        ensure_ascii=False,
    )


def make_config(tmp_path, segment_seconds=10, hard_max=50, consolidate=False):
    return {
        "system": {
            "temp_dir": str(tmp_path / "temp"),
            "log_dir": str(tmp_path / "logs"),
            "quality_gates": {"enabled": consolidate, "max_extra_llm_calls": 1},
            "render": {"include_concept_index": True},
        },
        "analyzer": {
            "max_continuations": 0,
            "retry_times": 0,
            "long_video": {
                "enabled": True,
                "default_segment_seconds": segment_seconds,
                "overlap_seconds": 0,
                "min_segment_seconds": 4,
                "hard_max_api_calls": hard_max,
                "consolidate": consolidate,
            },
        },
        "engine": {},
    }


def write_clip(path, seconds=30, fps=4.0, writer=write_npzv, size=16):
    frames = np.zeros((int(seconds * fps), size, size, 3), dtype=np.uint8)
    writer(path, frames, fps=fps)
    return path


class TestSegmentFailureIsolation:
    def test_one_bad_segment_becomes_gap_note(self, tmp_path):
        clip = write_clip(tmp_path / "v.npzv", seconds=30)
        # Initial pass: one malformed response; the per-video model repair
        # (which consumes one engine call) and the two re-asks also fail.
        engine = ScriptedEngine(
            [note_json("A", "一", 1, 5), "THIS IS NOT JSON AT ALL ((", note_json("C", "三", 21, 29)]
            + ["repair bad ((", "still bad ((", "still bad (("]
        )
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.metadata["segments"] == 3
        assert result.metadata["segments_analyzed"] == 2
        assert len(result.metadata["segment_gaps"]) == 1
        manifest = json.loads(
            (tmp_path / "temp" / "segments" / "v" / "manifest.json").read_text()
        )
        statuses = [s["status"] for s in manifest["segments"]]
        assert statuses.count("completed") == 2
        assert statuses.count("failed") == 1

    def test_all_segments_failing_raises(self, tmp_path):
        clip = write_clip(tmp_path / "v2.npzv", seconds=30)
        # 3 segments x (1 + 2 re-asks) + 1 model-repair attempt
        engine = ScriptedEngine(["bad"] * 10)
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        with pytest.raises(RuntimeError, match="All video segments failed"):
            analyzer.analyze_video(clip)

    def test_reask_recovers_flaky_segment(self, tmp_path):
        """A malformed response recovered by the re-ask loop leaves no gap."""
        clip = write_clip(tmp_path / "vr.npzv", seconds=30)
        engine = ScriptedEngine(
            [note_json("A", "一", 1, 5), "flaky garbage ((", note_json("C", "三", 21, 29)]
            + ["repair bad (("]  # the one model-repair attempt also fails
            + [note_json("B", "二", 11, 15)]  # re-ask succeeds
        )
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.metadata["segments_analyzed"] == 3
        assert result.metadata["segment_gaps"] == []
        assert engine.calls == 5  # 3 + 1 model repair + 1 re-ask

    def test_engine_crash_propagates(self, tmp_path):
        clip = write_clip(tmp_path / "v3.npzv", seconds=5)
        engine = ScriptedEngine([RuntimeError("device lost")])
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        with pytest.raises(RuntimeError, match="device lost"):
            analyzer.analyze_video(clip)

    def test_budget_exhausted_single_pass_raises_api_limit(self, tmp_path):
        clip = write_clip(tmp_path / "v4.npzv", seconds=5)
        counter = APICounter(max_calls=1)
        counter.increment("local")  # use it up
        analyzer = ContentAnalyzer(
            make_config(tmp_path), counter, logging.getLogger("t"),
            engine=ScriptedEngine([]),
        )
        with pytest.raises(APILimitExceeded):
            analyzer.analyze_video(clip)


class TestConsolidationRecovery:
    def test_bad_consolidation_falls_back_to_merged(self, tmp_path):
        clip = write_clip(tmp_path / "v5.npzv", seconds=30)
        engine = ScriptedEngine(
            [
                note_json("A", "一", 1, 5),
                note_json("B", "二", 11, 15),
                note_json("C", "三", 21, 25),
                "completely broken consolidation output ((",
            ]
        )
        analyzer = ContentAnalyzer(
            make_config(tmp_path, consolidate=True),
            APICounter(50),
            logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        # Merged result survives; all three topics present.
        topics = [
            s["topic"]
            for ch in result.knowledge_doc.deep_dive
            for s in ch.get("sections", [])
        ]
        assert topics == ["一", "二", "三"]

    def test_accepted_consolidation_replaces_merge(self, tmp_path):
        # 7 segments -> 7 chapters: over the 2-6 budget, so consolidation
        # actually runs (notes already inside the budget skip it).
        clip = write_clip(tmp_path / "v6.npzv", seconds=70)
        consolidated = json.dumps(
            {
                "title": "合并后",
                "one_sentence_summary": "s",
                "key_takeaways": ["k"],
                "glossary": {},
                # Titles draw their terms from the merged note (the
                # grounding acceptance check rejects invented chapters).
                "deep_dive": [
                    {"chapter_title": "A 章", "sections": []},
                    {"chapter_title": "B 章", "sections": []},
                ],
            },
            ensure_ascii=False,
        )
        engine = ScriptedEngine(
            [note_json(t, topic, 1 + 10 * i, 5 + 10 * i)
             for i, (t, topic) in enumerate(
                 [("A", "一"), ("B", "二"), ("C", "三"), ("D", "四"),
                  ("E", "五"), ("F", "六"), ("G", "七")]
             )]
            + [consolidated]
        )
        analyzer = ContentAnalyzer(
            make_config(tmp_path, consolidate=True),
            APICounter(50),
            logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.title == "合并后"
        assert len(result.knowledge_doc.deep_dive) == 2

    def test_consolidation_skipped_inside_chapter_budget(self, tmp_path):
        """<= 6 chapters: the merged note ships untouched (no extra call)."""
        clip = write_clip(tmp_path / "v7.npzv", seconds=30)
        engine = ScriptedEngine(
            [
                note_json("A", "一", 1, 5),
                note_json("B", "二", 11, 15),
                note_json("C", "三", 21, 25),
            ]
        )
        analyzer = ContentAnalyzer(
            make_config(tmp_path, consolidate=True),
            APICounter(50),
            logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.title == "A"  # merged, not consolidated
        assert engine.calls == 3  # no consolidation call consumed

    def test_ungrounded_consolidation_rejected(self, tmp_path):
        """A candidate whose chapters are invented (not drawn from the
        merged note) is rejected even though it is structurally valid."""
        clip = write_clip(tmp_path / "v8.npzv", seconds=70)
        fabricated = json.dumps(
            {
                "title": "捏造",
                "one_sentence_summary": "s",
                "key_takeaways": ["k"],
                "glossary": {},
                "deep_dive": [
                    {"chapter_title": "量子纠缠", "sections": []},
                    {"chapter_title": "罗马帝国", "sections": []},
                ],
            },
            ensure_ascii=False,
        )
        engine = ScriptedEngine(
            [note_json(t, t, 1 + 10 * i, 5 + 10 * i)
             for i, t in enumerate("ABCDEFG")]
            + [fabricated]
        )
        analyzer = ContentAnalyzer(
            make_config(tmp_path, consolidate=True),
            APICounter(50),
            logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.title == "A"  # fabricated candidate rejected


class TestContainerEdgeCases:
    def test_y4m_long_video_path(self, tmp_path):
        clip = write_clip(tmp_path / "v.y4m", seconds=20, writer=write_y4m)
        engine = ScriptedEngine([note_json("A"), note_json("B")])
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(clip)
        assert result.metadata["segments"] == 2

    def test_fractional_fps_clip(self, tmp_path):
        frames = np.zeros((7, 16, 16, 3), dtype=np.uint8)
        path = tmp_path / "odd.npzv"
        write_npzv(path, frames, fps=2.5)  # 2.8 seconds
        engine = ScriptedEngine([note_json("A")])
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        result = analyzer.analyze_video(path)
        assert result.metadata["duration"] == pytest.approx(2.8)

    def test_unreadable_video_duration_zero_single_pass(self, tmp_path):
        # duration 0.0 -> no segmentation -> single pass still attempted
        bad = tmp_path / "bad.y4m"
        bad.write_bytes(b"garbage")
        engine = ScriptedEngine([note_json("A")])
        analyzer = ContentAnalyzer(
            make_config(tmp_path), APICounter(50), logging.getLogger("t"),
            engine=engine,
        )
        with pytest.raises(FileNotFoundError):
            analyzer.analyze_video(bad)
