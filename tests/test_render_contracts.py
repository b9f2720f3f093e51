"""Rendering contract matrices: timestamps, heading order, mode inversions.

Mirrors reference tests/test_timestamp_rendering.py and
test_knowledge_document_contract.py.
"""

import pytest

from video_transformer_tpu.contracts import KnowledgeDocument


def doc_with_section(section):
    return KnowledgeDocument(
        title="标题",
        one_sentence_summary="总结。",
        key_takeaways=["结论"],
        deep_dive=[
            {
                "chapter_title": "章",
                "chapter_summary": "概述。",
                "sections": [dict({"topic": "主题", "explanation": "解释。"}, **section)],
            }
        ],
        glossary={"术": "语"},
    )


class TestTimestampRenderingMatrix:
    CASES = [
        ({"timestamp": {"start": 65, "end": 125}}, "(00:01:05–00:02:05)"),
        ({"timestamp": {"start": 65}}, "(00:01:05)"),
        ({"timestamp": {"start_time": 65, "end_time": 125}}, "(00:01:05–00:02:05)"),
        ({"timestamp": "01:05"}, "(00:01:05)"),
        ({"timestamp": "01:05 - 02:05"}, "(00:01:05–00:02:05)"),
        ({"timestamp": "1:02:03"}, "(01:02:03)"),
        ({"time_range": {"start": 30, "end": 60}}, "(00:00:30–00:01:00)"),
        ({"timecode": "00:45"}, "(00:00:45)"),
        ({"time": 90}, "(00:01:30)"),
        ({"start_time": 10, "end_time": 20}, "(00:00:10–00:00:20)"),
        ({"start": 10}, "(00:00:10)"),
        ({"end": 20}, "(00:00:20)"),
        ({"timestamp": {"start": 65000, "end": 125000}}, "(00:01:05–00:02:05)"),  # ms
        ({"timestamp": "65"}, "(00:01:05)"),  # numeric string seconds
        ({}, None),  # no timestamp -> bare heading
        ({"timestamp": "garbage"}, None),
    ]

    @pytest.mark.parametrize("section,expected", CASES)
    def test_static_mode_stamp(self, section, expected):
        md = doc_with_section(section).to_markdown(self_check_mode="static")
        if expected is None:
            assert "#### 1. 主题\n" in md + "\n"
        else:
            assert f"#### 1. 主题 {expected}" in md

    @pytest.mark.parametrize("section,expected", CASES[:3])
    def test_default_mode_stamp(self, section, expected):
        md = doc_with_section(section).to_markdown(self_check_mode="default")
        assert f"#### 1. 主题 {expected}" in md


class TestHeadingOrderContract:
    def test_default_mode_heading_order(self):
        md = doc_with_section({}).to_markdown(self_check_mode="default")
        order = [
            "# 标题",
            "## 📝 关键结论 (Key Takeaways)",
            "## 🔍 深度解析 (Deep Dive)",
            "## 📌 覆盖清单 (Coverage Index)",
            "## 📎 附录 (Appendix)",
            "## 📖 关键术语表 (Glossary)",
        ]
        positions = [md.find(h) for h in order]
        assert all(p != -1 for p in positions), positions
        assert positions == sorted(positions)

    def test_lecture_mode_heading_order(self):
        md = doc_with_section({}).to_markdown(self_check_mode="lecture")
        order = [
            "# 标题",
            "## 核心概念图谱",
            "## 主题详解",
            "## 实战与代码",
            "## FAQ / 避坑指南",
            "## 📎 附录 (Appendix)",
            "### 术语表（Glossary）",
            "### 代码与伪代码",
        ]
        positions = [md.find(h) for h in order]
        assert all(p != -1 for p in positions)
        assert positions == sorted(positions)

    def test_default_mode_no_per_section_self_check(self):
        doc = doc_with_section(
            {"self_check": [{"q": "q?", "a": "a."}]}
        )
        md = doc.to_markdown(self_check_mode="default")
        # Questions surface once, at chapter level — not inside sections.
        assert md.count("### 📋 第1章自测") == 1
        assert "**✅ 自测（做完再看答案）**" not in md

    def test_legacy_mode_inverse_assertions(self):
        doc = doc_with_section({"self_check": [{"q": "q?", "a": "a."}]})
        md = doc.to_markdown(self_check_mode="static")
        assert "### 📋 第1章自测" not in md
        assert "**✅ 自测（做完再看答案）**：" in md
        assert "## 📌 覆盖清单 (Coverage Index)" not in md

    def test_glossary_omitted_when_empty(self):
        doc = doc_with_section({})
        doc.glossary = {}
        md = doc.to_markdown(self_check_mode="default")
        assert "## 📖 关键术语表 (Glossary)" not in md
