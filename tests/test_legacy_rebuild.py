"""Legacy-note rebuild: output structure + takeaway mapping contract."""

import pytest

from video_transformer_tpu.utils.refiner import rebuild_legacy_note, refine_note
from video_transformer_tpu.utils.refiner_contract import (
    HEADING_COVERAGE_INDEX,
    HEADING_EXPANDED,
    HEADING_KEY_POINTS,
    HEADING_MISTAKES,
    MAPPING_SECTION_HEADING,
    MAPPING_TABLE_HEADER,
    UNMAPPED_TAKEAWAYS_HEADING,
)


def legacy_note(n_topics=3, explanation_lines=40):
    lines = [
        "# 机器学习基础",
        "",
        "> 🎯 **一句话核心**",
        "> 核心总结。",
        "",
        "## 📝 关键结论 (Key Takeaways)",
        "",
        "- 梯度下降 是训练的基石",
        "- 过拟合 需要用正则化控制",
        "- 这条结论不匹配任何主题",
        "",
        "## 🔍 深度解析 (Deep Dive)",
        "",
        "### 第1章：核心",
        "",
    ]
    topic_names = ["梯度下降", "正则化", "交叉验证"][:n_topics]
    for idx, name in enumerate(topic_names, 1):
        lines += [f"#### {idx}. {name}", "", "**💡 原理解析**："]
        lines += [f"{name} 的解释第 {j} 行。" for j in range(explanation_lines)]
        lines += ["", "**⚠️ 常见误区**：", f"- 误用 {name} 的情况", ""]
    lines += [
        "## 📖 关键术语表 (Glossary)",
        "",
        "- **过拟合**: 模型记住了训练噪声",
        "",
    ]
    return "\n".join(lines)


class TestLegacyRebuild:
    def test_output_structure(self):
        rebuilt = rebuild_legacy_note(legacy_note(), target_lines=200)
        for heading in (
            HEADING_MISTAKES, HEADING_KEY_POINTS, HEADING_EXPANDED,
            HEADING_COVERAGE_INDEX, MAPPING_SECTION_HEADING,
        ):
            assert heading in rebuilt, heading
        assert MAPPING_TABLE_HEADER in rebuilt
        # Heading order per OutputStructure.
        positions = [
            rebuilt.find(h)
            for h in (HEADING_MISTAKES, HEADING_KEY_POINTS, HEADING_EXPANDED,
                      HEADING_COVERAGE_INDEX, MAPPING_SECTION_HEADING)
        ]
        assert positions == sorted(positions)

    def test_mapping_strategies(self):
        rebuilt = rebuild_legacy_note(legacy_note(), target_lines=200)
        # Takeaway 1 names topic 梯度下降 -> topic_substring.
        assert "| 梯度下降 是训练的基石 | 梯度下降 | topic_substring |" in rebuilt
        # Takeaway 2 mentions glossary term 过拟合 (no topic hit) ->
        # glossary_term or earliest_unmatched fallback.
        assert "过拟合 需要用正则化控制" in rebuilt
        # Unmatched takeaway either maps by earliest_unmatched or lands
        # in the unmapped section.
        assert (
            "earliest_unmatched" in rebuilt
            or UNMAPPED_TAKEAWAYS_HEADING in rebuilt
        )

    def test_mistakes_collected(self):
        rebuilt = rebuild_legacy_note(legacy_note(), target_lines=200)
        assert "- 梯度下降：误用 梯度下降 的情况" in rebuilt

    def test_coverage_lists_all_topics(self):
        rebuilt = rebuild_legacy_note(legacy_note(), target_lines=200)
        coverage = rebuilt.split(HEADING_COVERAGE_INDEX)[1].split("##")[0]
        for name in ("梯度下降", "正则化", "交叉验证"):
            assert f"- {name}" in coverage

    def test_refine_note_uses_rebuild_for_over_budget_legacy(self):
        note = legacy_note(explanation_lines=200)  # way over budget
        refined = refine_note(note, 60, {"min_lines": 100, "max_lines": 150})
        assert HEADING_EXPANDED in refined
        assert len(refined.splitlines()) < len(note.splitlines())

    def test_duplicate_topics_merged(self):
        note = legacy_note().replace("#### 3. 交叉验证", "#### 3. 梯度 下降")
        rebuilt = rebuild_legacy_note(note, target_lines=200)
        coverage = rebuilt.split(HEADING_COVERAGE_INDEX)[1].split("##")[0]
        assert coverage.count("梯度") == 1  # normalized dedupe
