"""Golden-artifact contracts against the checked-in sample note.

Mirrors reference test_compressed_note_contract.py (golden data checked into
the repo, contracts asserted against it).
"""

from pathlib import Path

import pytest

SAMPLE = Path(__file__).resolve().parents[1] / "data" / "samples" / (
    "sample_lecture_note.md"
)


@pytest.fixture(scope="module")
def sample_text():
    return SAMPLE.read_text(encoding="utf-8")


class TestGoldenSample:
    def test_passes_offline_linter(self, sample_text):
        from video_transformer_tpu.tools.validate_note import validate_note

        report = validate_note(sample_text)
        assert report.format == "lecture"
        assert report.ok, report.errors

    def test_refiner_leaves_it_untouched(self, sample_text):
        from video_transformer_tpu.utils.refiner import refine_note

        assert refine_note(sample_text, 3600, {"enabled": True}) == sample_text

    def test_quality_gates_clean(self, sample_text):
        from video_transformer_tpu.utils.quality import apply_quality_gates

        scrubbed, report = apply_quality_gates(sample_text, "pdf", {"enabled": True})
        assert report["gates_triggered"] == []
        assert scrubbed == sample_text

    def test_compressor_contract(self, sample_text):
        from video_transformer_tpu.utils.compressor import compress_note

        digest = compress_note(sample_text, max_chapters=6, max_lines=120)
        lines = digest.splitlines()
        assert lines[0] == "# 深度学习优化方法精讲（精简版）"
        assert len(lines) <= 120
        assert any(ln.startswith("## 第1章：") for ln in lines)

    def test_blueprint_renders_from_sample_schema(self, sample_text):
        from video_transformer_tpu.pipeline.visualizer import ImageGenerator

        schema_block = sample_text.split("```")[1]
        generator = ImageGenerator({"image_generator": {"backend": "local"}})
        data = generator.generate_blueprint(schema_block)
        assert data is not None and len(data) > 1000

    def test_structural_validator_scores_sample(self, sample_text):
        from video_transformer_tpu.pipeline.validator import ConsistencyValidator
        from video_transformer_tpu.utils.counter import APICounter

        schema_block = sample_text.split("```")[1]
        validator = ConsistencyValidator(
            {"validator": {"threshold": 40}}, APICounter(10)
        )
        result = validator.validate(schema_block, sample_text)
        assert result.total_score > 0
        assert result.dimension_scores["accuracy"] > 0
