"""Unit tests for infrastructure utils: counter, budget planner, progress,
quality gates, refiner contract, config, validators, timefmt."""

import json
import logging

import pytest

from video_transformer_tpu.contracts.timefmt import (
    format_seconds,
    parse_time_value,
    section_timestamp,
)
from video_transformer_tpu.contracts.validators import (
    detect_stub_output,
    validate_markdown_structure,
)
from video_transformer_tpu.utils.budget_planner import plan_segments_with_budget
from video_transformer_tpu.utils.counter import APICounter, APILimitExceeded
from video_transformer_tpu.utils.progress import ProgressTracker
from video_transformer_tpu.utils.quality import apply_quality_gates
from video_transformer_tpu.utils.refiner_contract import (
    budget_for_duration,
    count_budget_lines,
    format_budget_warning,
    normalize_topic_title,
)


class TestAPICounter:
    def test_budgeted_limit_raises(self):
        counter = APICounter(max_calls=2)
        counter.increment("Gemini")
        counter.increment("gemini")
        with pytest.raises(APILimitExceeded):
            counter.increment("Gemini")

    def test_local_service_is_budgeted(self):
        counter = APICounter(max_calls=1)
        counter.increment("local")
        with pytest.raises(APILimitExceeded):
            counter.increment("tpu")

    def test_other_services_unlimited(self):
        counter = APICounter(max_calls=1)
        for _ in range(10):
            assert counter.increment("Kimi")
        assert counter.current_count == 0

    def test_hard_max_clamps_soft(self):
        counter = APICounter(max_calls=20)
        assert counter.set_max_calls(100, hard_max_calls=50) == 50
        assert counter.increase_max_calls(10) == 50

    def test_remaining_and_can_call(self):
        counter = APICounter(max_calls=3)
        counter.increment("gemini")
        assert counter.remaining() == 2
        assert counter.can_call()
        counter.increment("gemini")
        counter.increment("gemini")
        assert not counter.can_call()
        counter.reset()
        assert counter.remaining() == 3


class TestBudgetPlanner:
    CONFIG = {
        "analyzer": {
            "max_continuations": 3,
            "retry_times": 0,
            "long_video": {
                "default_segment_seconds": 480,
                "overlap_seconds": 20,
                "min_segment_seconds": 90,
                "hard_max_api_calls": 50,
                "consolidate": True,
            },
        }
    }

    def test_short_video_single_segment(self):
        plan = plan_segments_with_budget(300, self.CONFIG, 0)
        assert plan.num_segments == 1
        assert plan.fits_budget

    def test_hour_video_fits(self):
        plan = plan_segments_with_budget(3600, self.CONFIG, 0)
        assert plan.num_segments >= 8
        assert plan.fits_budget
        assert plan.estimated_calls <= plan.available_calls

    def test_zero_duration_unfit(self):
        plan = plan_segments_with_budget(0, self.CONFIG, 0)
        assert plan.num_segments == 0
        assert not plan.fits_budget

    def test_exhausted_budget_unfit(self):
        plan = plan_segments_with_budget(3600, self.CONFIG, 50)
        assert plan.available_calls == 0
        assert not plan.fits_budget

    def test_tight_budget_grows_segments(self):
        plan = plan_segments_with_budget(3600, self.CONFIG, 30)
        if plan.fits_budget:
            assert plan.segment_duration >= 480
            assert plan.overlap == 0

    def test_duration_threshold_whole_video(self):
        config = {
            "analyzer": {
                **self.CONFIG["analyzer"],
                "long_video": {
                    **self.CONFIG["analyzer"]["long_video"],
                    "duration_threshold_seconds": 1200,
                },
            }
        }
        plan = plan_segments_with_budget(600, config, 0)
        assert plan.num_segments == 1
        assert plan.segment_duration == 600
        assert plan.overlap == 0


class TestProgressTracker:
    def test_roundtrip(self, tmp_path):
        logger = logging.getLogger("test_progress")
        tracker = ProgressTracker(tmp_path / "progress.json", logger)
        tracker.mark_processed("vid1")
        tracker.mark_failed("vid2", "boom")

        reloaded = ProgressTracker(tmp_path / "progress.json", logger)
        assert reloaded.is_processed("vid1")
        assert reloaded.is_failed("vid2")
        assert reloaded.filter_unprocessed(["vid1", "vid2", "vid3"]) == ["vid2", "vid3"]

    def test_mark_processed_clears_failure(self, tmp_path):
        logger = logging.getLogger("test_progress2")
        tracker = ProgressTracker(tmp_path / "p.json", logger)
        tracker.mark_failed("v", "err")
        tracker.mark_processed("v")
        assert not tracker.is_failed("v")
        assert tracker.get_statistics() == {"processed_count": 1, "failed_count": 0}

    def test_corrupt_file_starts_fresh(self, tmp_path):
        path = tmp_path / "p.json"
        path.write_text("{not json", encoding="utf-8")
        tracker = ProgressTracker(path, logging.getLogger("test_progress3"))
        assert tracker.data["processed"] == []

    def test_reset(self, tmp_path):
        tracker = ProgressTracker(tmp_path / "p.json", logging.getLogger("tp4"))
        tracker.mark_processed("v")
        tracker.reset()
        assert not tracker.is_processed("v")
        saved = json.loads((tmp_path / "p.json").read_text())
        assert saved["processed"] == []


class TestQualityGates:
    def test_placeholder_block_removed(self):
        md = "\n".join(
            [
                "## 实战与代码",
                "逐行说明：",
                "1：完成关键计算或调用步骤。",
                "2：完成关键计算或调用步骤。",
                "3：完成关键计算或调用步骤。",
                "",
                "正文继续",
            ]
        )
        out, report = apply_quality_gates(md, "pdf", {"enabled": True})
        assert "完成关键计算或调用步骤" not in out
        assert "placeholder_explanations" in report["gates_triggered"]
        assert "正文继续" in out

    def test_placeholder_block_kept_below_ratio(self):
        md = "\n".join(
            [
                "逐行说明：",
                "1：完成关键计算或调用步骤。",
                "2：定义模型结构。",
                "3：训练并评估。",
            ]
        )
        out, report = apply_quality_gates(md, "pdf", None)
        assert "定义模型结构" in out
        assert report["gates_triggered"] == []

    def test_concept_index_artifacts_removed(self):
        md = "\n".join(
            [
                "### 概念索引（Concept Index）",
                "- 正常概念",
                "- :05-:10 的片段",
                "- 以下片段未覆盖或分析失败",
                "",
                "### 代码与伪代码",
            ]
        )
        out, report = apply_quality_gates(md, "pdf", None)
        assert ":05-:10" not in out
        assert "未覆盖或分析失败" not in out
        assert "- 正常概念" in out
        assert "concept_index_artifacts" in report["gates_triggered"]

    def test_templated_exercises_replaced(self):
        md = "\n".join(
            [
                "练习与答解：",
                "1. 问题一",
                "2. 问题二",
                "答：因为 A 直接影响核心流程的效果与可解释性。",
                "答：因为 B 直接影响核心流程的效果与可解释性。",
                "",
                "## 下一节",
            ]
        )
        out, report = apply_quality_gates(md, "pdf", None)
        assert "templated_exercises" in report["gates_triggered"]
        assert "计算 2 + 3 的结果。" in out
        assert "## 下一节" in out

    def test_duplicate_chapters_demoted(self):
        md = "\n".join(
            [
                "### 第1章：机器学习基础",
                "内容A",
                "### 第2章：机器学习基础：进阶",
                "内容B",
            ]
        )
        out, report = apply_quality_gates(md, "pdf", None)
        assert "#### 补充：机器学习基础：进阶" in out
        assert "duplicated_chapter_titles" in report["gates_triggered"]

    def test_trailing_newline_preserved(self):
        out, _ = apply_quality_gates("# 标题\n正文\n", "default", None)
        assert out.endswith("\n")


class TestRefinerContract:
    def test_budget_caps(self):
        assert budget_for_duration(0).target_lines == 220
        assert budget_for_duration(3600).target_lines == 400
        assert budget_for_duration(36000).target_lines == 900

    def test_tolerance(self):
        result = budget_for_duration(3600)
        assert result.min_lines == 360
        assert result.max_lines == 440

    def test_count_budget_lines_excluding_code(self):
        text = "a\n```\ncode1\ncode2\n```\nb"
        assert count_budget_lines(text) == 6
        assert count_budget_lines(text, exclude_code_from_budget=True) == 2

    def test_budget_warning_format(self):
        assert (
            format_budget_warning(950, 900)
            == "<!-- BUDGET_EXCEEDED: actual=950, target=900 -->"
        )

    def test_topic_normalization(self):
        assert normalize_topic_title("梯度 下降（SGD）!") == normalize_topic_title(
            "梯度下降sgd"
        )


class TestValidators:
    def test_stub_detection(self):
        assert detect_stub_output("")
        assert detect_stub_output("final report")
        assert detect_stub_output("# 只有标题\n## 空节")
        assert not detect_stub_output("# 标题\n正文内容在这里。")

    def test_empty_section_detected(self):
        md = "# 标题\n## 第一节\n## 第二节\n正文"
        assert detect_stub_output(md)

    def test_structure_default_mode(self):
        ok, errors = validate_markdown_structure("# x\n正文", "default")
        assert not ok
        assert any("覆盖清单" in e for e in errors)

    def test_structure_fence_before_appendix(self):
        md = "```\ncode\n```\n## 📌 覆盖清单 (Coverage Index)\n## 📎 附录 (Appendix)"
        ok, errors = validate_markdown_structure(md, "default")
        assert not ok
        assert any("代码围栏" in e for e in errors)

    def test_legacy_mode_always_passes_structure(self):
        ok, errors = validate_markdown_structure("anything", "static")
        assert ok and errors == []


class TestTimeFormat:
    def test_parse_values(self):
        assert parse_time_value(65) == 65
        assert parse_time_value(65000) == 65.0  # ms heuristic
        assert parse_time_value("01:05") == 65
        assert parse_time_value("1:02:03") == 3723
        assert parse_time_value("not a time") is None
        assert parse_time_value(None) is None

    def test_format_seconds(self):
        assert format_seconds(3723) == "01:02:03"

    def test_section_timestamp_variants(self):
        assert section_timestamp({"timestamp": {"start": 5, "end": 10}}) == (
            "(00:00:05–00:00:10)"
        )
        assert section_timestamp({"timestamp": "00:05 - 00:10"}) == (
            "(00:00:05–00:00:10)"
        )
        assert section_timestamp({"start_time": 5}) == "(00:00:05)"
        assert section_timestamp({}) == ""
