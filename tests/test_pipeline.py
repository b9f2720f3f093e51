"""Pipeline orchestration tests with injected stub components.

Mirrors the reference's stub-suite pattern (tests/test_api_key_reuse.py,
test_pipeline_validation_fix.py): fake analyzer/validator/generator/auditor
drive the 5-step flow without a model.
"""

import logging
from dataclasses import dataclass

import pytest

from video_transformer_tpu.contracts import (
    AnalysisResult,
    KnowledgeDocument,
    VisualSchemaItem,
)
from video_transformer_tpu.pipeline.pipeline import VideoPipeline
from video_transformer_tpu.pipeline.validator import ValidationResult
from video_transformer_tpu.pipeline.visualizer import ImageGenerator, parse_schema_graph
from video_transformer_tpu.utils.counter import APICounter
from video_transformer_tpu.utils.progress import ProgressTracker


def make_result(video_path="v.npzv"):
    doc = KnowledgeDocument(
        title="测试笔记",
        one_sentence_summary="核心总结。",
        key_takeaways=["结论一"],
        deep_dive=[
            {
                "chapter_title": "章一",
                "chapter_summary": "概述。",
                "chapter_self_check": [{"q": "问?", "a": "答。"}],
                "sections": [
                    {"topic": "主题", "explanation": "解释内容。", "example": "示例。"}
                ],
            }
        ],
        glossary={"术语": "定义"},
        visual_schemas=[
            VisualSchemaItem("overview", "总览", "测试笔记\n章一 -> 主题")
        ],
    )
    return AnalysisResult(
        video_path=video_path, knowledge_doc=doc, metadata={"duration": 60.0}
    )


class StubAnalyzer:
    def __init__(self, result=None, fail=False):
        self.result = result or make_result()
        self.fail = fail
        self.rewrites = 0

    def analyze_video(self, path):
        if self.fail:
            raise RuntimeError("分析失败")
        return self.result

    def generate_report(self, analysis, image_relative_path=None, self_check_mode="static"):
        return analysis.knowledge_doc.to_markdown(
            image_paths=[image_relative_path] if image_relative_path else None,
            self_check_mode=self_check_mode,
        )

    def rewrite_visual_schema(self, original_structure, feedback):
        self.rewrites += 1
        return original_structure + f"\n(改写 {self.rewrites})"


class StubValidator:
    def __init__(self, scores):
        self.scores = list(scores)
        self.calls = 0

    def validate(self, mind_map_structure, knowledge_doc_content):
        score = self.scores[min(self.calls, len(self.scores) - 1)]
        self.calls += 1
        return ValidationResult(
            total_score=score, passed=score >= 75, feedback="需要改进"
        )


class StubGenerator:
    def __init__(self, data=b"x" * 2048, fail=False):
        self.data = data
        self.fail = fail

    def generate_blueprint(self, structure):
        if self.fail:
            raise RuntimeError("render timeout")
        return self.data

    def save_image(self, data, path):
        from pathlib import Path

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_bytes(data)


@dataclass
class StubAuditResult:
    score: float
    passed: bool
    feedback: str = ""


class StubAuditor:
    threshold = 75.0

    def __init__(self, score=90.0):
        self.score = score

    def audit_image(self, image_path, knowledge_doc_content):
        return StubAuditResult(score=self.score, passed=self.score >= 75)


def make_config(tmp_path, **system_overrides):
    system = {
        "output_dir": str(tmp_path / "output"),
        "temp_dir": str(tmp_path / "temp"),
        "self_check_mode": "static",
        "note_refine": {"enabled": False},
        "quality_gates": {"enabled": False},
        "render": {"include_concept_index": True},
    }
    system.update(system_overrides)
    return {
        "system": system,
        "proxy": {},
        "downloader": {},
        "validator": {"threshold": 75, "max_rounds": 3},
        "image_generator": {"backend": "local"},
        "auditor": {"threshold": 75},
        "analyzer": {},
        "api_keys": {},
    }


def build_pipeline(tmp_path, monkeypatch, analyzer=None, validator=None,
                   generator=None, auditor=None, **system_overrides):
    config = make_config(tmp_path, **system_overrides)
    logger = logging.getLogger("test_pipeline")
    pipeline = VideoPipeline(config, logger, APICounter(max_calls=100))
    analyzer = analyzer or StubAnalyzer()
    monkeypatch.setattr(
        "video_transformer_tpu.pipeline.pipeline.ContentAnalyzer",
        lambda **kwargs: analyzer,
    )
    if auditor is not None:
        monkeypatch.setattr(
            "video_transformer_tpu.pipeline.pipeline.QualityAuditor",
            lambda **kwargs: auditor,
        )
    if validator is not None:
        pipeline.validator = validator
    if generator is not None:
        pipeline.generator = generator
    return pipeline, analyzer


@pytest.fixture
def clip(tmp_path):
    import numpy as np

    from video_transformer_tpu.video.containers import write_npzv

    path = tmp_path / "vid.npzv"
    frames = np.zeros((8, 16, 16, 3), dtype=np.uint8)
    write_npzv(path, frames, fps=4.0)
    return path


class TestSingleVideoFlow:
    def test_happy_path(self, tmp_path, monkeypatch, clip):
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        result = pipeline.process_single_video(str(clip))
        assert result.success
        assert result.document_path and result.blueprint_path
        assert result.validation_score == 90
        assert result.audit_score == 90
        from pathlib import Path

        assert Path(result.document_path).read_text(encoding="utf-8").startswith(
            "# 测试笔记"
        )

    def test_saved_note_passes_offline_linter(self, tmp_path, monkeypatch, clip):
        from video_transformer_tpu.tools.validate_note import validate_file

        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch,
            validator=StubValidator([90]), auditor=StubAuditor(90),
            self_check_mode="lecture",
        )
        result = pipeline.process_single_video(str(clip))
        report = validate_file(result.document_path)
        assert report.format == "lecture"
        assert report.ok, report.errors

    def test_validation_rewrite_loop(self, tmp_path, monkeypatch, clip):
        validator = StubValidator([50, 60, 90])
        pipeline, analyzer = build_pipeline(
            tmp_path, monkeypatch, validator=validator, auditor=StubAuditor(90)
        )
        result = pipeline.process_single_video(str(clip))
        assert result.success
        assert validator.calls == 3
        assert analyzer.rewrites == 2
        assert result.validation_score == 90

    def test_validation_exhausted_still_succeeds(self, tmp_path, monkeypatch, clip):
        validator = StubValidator([10, 10, 10])
        pipeline, analyzer = build_pipeline(
            tmp_path, monkeypatch, validator=validator, auditor=StubAuditor(90)
        )
        result = pipeline.process_single_video(str(clip))
        assert result.success  # never fails the video
        assert validator.calls == 3

    def test_image_failure_degrades_to_markdown(self, tmp_path, monkeypatch, clip):
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch,
            validator=StubValidator([90]),
            generator=StubGenerator(fail=True),
        )
        result = pipeline.process_single_video(str(clip))
        assert result.success
        assert result.blueprint_path is None
        from pathlib import Path

        content = Path(result.document_path).read_text(encoding="utf-8")
        assert "Image generation timed out" in content

    def test_failed_audit_discards_image(self, tmp_path, monkeypatch, clip):
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch,
            validator=StubValidator([90]), auditor=StubAuditor(10),
        )
        result = pipeline.process_single_video(str(clip))
        assert result.success
        assert result.blueprint_path is None
        assert result.audit_score == 0.0

    def test_analyzer_failure_marks_failed(self, tmp_path, monkeypatch, clip):
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch, analyzer=StubAnalyzer(fail=True)
        )
        result = pipeline.process_single_video(str(clip))
        assert not result.success
        assert "分析失败" in result.error_message


class TestBatchFlow:
    def test_batch_counts(self, tmp_path, monkeypatch, clip):
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        batch = pipeline.process_batch([str(clip), str(clip)])
        # Same video id twice: no progress tracker, so both run.
        assert batch.total == 2
        assert batch.successful == 2

    def test_progress_tracker_skips(self, tmp_path, monkeypatch, clip):
        config_pipeline, _ = build_pipeline(
            tmp_path, monkeypatch,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        tracker = ProgressTracker(
            tmp_path / "progress.json", logging.getLogger("t")
        )
        config_pipeline.progress_tracker = tracker
        first = config_pipeline.process_single_video(str(clip))
        assert first.success
        second = config_pipeline.process_single_video(str(clip))
        assert second.error_message == "已处理(跳过)"


class TestShardedBatch:
    def _analyzer_with_batch(self):
        analyzer = StubAnalyzer()

        def analyze_videos(paths):
            analyzer.batched = list(paths)
            return [make_result(str(p)) for p in paths]

        analyzer.analyze_videos = analyze_videos
        return analyzer

    def test_sharded_batch_happy_path(self, tmp_path, monkeypatch, clip):
        analyzer = self._analyzer_with_batch()
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch, analyzer=analyzer,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        batch = pipeline.process_batch_sharded([str(clip)])
        assert batch.successful == 1 and batch.failed == 0
        assert analyzer.batched == [clip]
        assert batch.results[0].document_path

    def test_sharded_batch_missing_video_recorded(self, tmp_path, monkeypatch, clip):
        analyzer = self._analyzer_with_batch()
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch, analyzer=analyzer,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        batch = pipeline.process_batch_sharded(
            [str(clip), str(tmp_path / "missing.npzv")]
        )
        assert batch.successful == 1 and batch.failed == 1
        assert batch.results[0].success is False  # download failure first
        assert batch.results[1].success is True

    def test_sharded_batch_all_downloads_fail(self, tmp_path, monkeypatch):
        analyzer = self._analyzer_with_batch()
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch, analyzer=analyzer,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        batch = pipeline.process_batch_sharded(
            [str(tmp_path / "a.npzv"), str(tmp_path / "b.npzv")]
        )
        assert batch.failed == 2 and batch.successful == 0
        assert not hasattr(analyzer, "batched")  # analysis never invoked

    def test_sharded_batch_falls_back_on_analysis_crash(
        self, tmp_path, monkeypatch, clip
    ):
        analyzer = StubAnalyzer()

        def broken(paths):
            raise RuntimeError("device lost")

        analyzer.analyze_videos = broken
        pipeline, _ = build_pipeline(
            tmp_path, monkeypatch, analyzer=analyzer,
            validator=StubValidator([90]), auditor=StubAuditor(90),
        )
        batch = pipeline.process_batch_sharded([str(clip)])
        # Falls back to the sequential path, which succeeds via analyze_video.
        assert batch.successful == 1


class TestVideoIdExtraction:
    def test_bilibili(self):
        assert VideoPipeline._extract_video_id(
            "https://www.bilibili.com/video/BV1xx411c7mD"
        ) == "BV1xx411c7mD"

    def test_bilibili_part(self):
        assert VideoPipeline._extract_video_id(
            "https://www.bilibili.com/video/BV1xx411c7mD?p=3"
        ) == "BV1xx411c7mD_p3"

    def test_youtube(self):
        assert VideoPipeline._extract_video_id(
            "https://www.youtube.com/watch?v=dQw4w9WgXcQ"
        ) == "dQw4w9WgXcQ"

    def test_local_path(self):
        assert VideoPipeline._extract_video_id("/data/clips/lecture01.npzv") == (
            "lecture01"
        )

    def test_fallback_hash(self):
        video_id = VideoPipeline._extract_video_id("https://example.com/weird")
        assert len(video_id) == 12


class TestLocalVisualizer:
    def test_parse_schema_graph(self):
        title, nodes, edges = parse_schema_graph(
            "知识蓝图\n输入 -> 编码器 -> 解码器\n- 损失函数"
        )
        assert title == "知识蓝图"
        assert "编码器" in nodes and "损失函数" in nodes
        assert ("输入", "编码器") in edges

    def test_render_produces_valid_png(self, tmp_path):
        generator = ImageGenerator({"image_generator": {"backend": "local"}})
        data = generator.generate_blueprint("标题\nA -> B\nC")
        assert data is not None
        from PIL import Image
        import io

        with Image.open(io.BytesIO(data)) as img:
            assert img.size[0] >= 100
            assert img.format == "PNG"

    def test_empty_schema_returns_none(self):
        generator = ImageGenerator({"image_generator": {}})
        assert generator.generate_blueprint("") is None
