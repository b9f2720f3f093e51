"""Contract tests for KnowledgeDocument / AnalysisResult.

Models the reference's test strategy (tests/test_models.py,
test_knowledge_document_contract.py): exact heading contracts per render
mode, from_api_response gating, normalization tolerance.
"""

import pytest

from video_transformer_tpu.contracts import (
    AnalysisResult,
    KnowledgeDocument,
    VisualSchemaItem,
)


def make_doc(**overrides):
    base = dict(
        title="测试视频笔记",
        one_sentence_summary="这是一句话核心总结。",
        key_takeaways=["结论一", "结论二"],
        deep_dive=[
            {
                "chapter_title": "基础概念",
                "chapter_summary": "本章介绍基础。",
                "chapter_self_check": [{"q": "什么是基础？", "a": "基础是根基。"}],
                "sections": [
                    {
                        "topic": "梯度下降",
                        "explanation": "沿负梯度方向更新参数。",
                        "example": "学习率 0.1 时一步更新。",
                        "code": "w -= lr * grad",
                        "connections": ["反向传播"],
                        "self_check": [{"q": "为何用负梯度？", "a": "函数值下降最快。"}],
                        "common_mistakes": ["学习率过大发散"],
                        "challenge": ["先想想为什么需要学习率"],
                        "timestamp": {"start": 65, "end": 125},
                    }
                ],
            }
        ],
        glossary={"梯度": "多元函数的方向导数向量"},
        visual_schemas=[
            VisualSchemaItem(type="overview", description="总览图", schema="A -> B")
        ],
    )
    base.update(overrides)
    return KnowledgeDocument(**base)


class TestLegacyModes:
    def test_static_mode_headings(self):
        md = make_doc().to_markdown(self_check_mode="static")
        assert md.startswith("# 测试视频笔记")
        assert "> 🎯 **一句话核心**" in md
        assert "## 📝 关键结论 (Key Takeaways)" in md
        assert "## 🔍 深度解析 (Deep Dive)" in md
        assert "### 第1章：基础概念" in md
        assert "## 📖 关键术语表 (Glossary)" in md
        assert "**🧩 挑战（先想 20 秒再往下看）**：" in md
        assert "**✅ 自测（做完再看答案）**：" in md
        assert "#### 📌 本章自测答案" in md

    def test_static_answers_at_chapter_end(self):
        md = make_doc().to_markdown(self_check_mode="static")
        q_at = md.find("- Q1.1：为何用负梯度？")
        ans_heading = md.find("#### 📌 本章自测答案")
        ans_at = md.find("  答案：函数值下降最快。")
        assert -1 < q_at < ans_heading < ans_at

    def test_interactive_mode_details_tag(self):
        md = make_doc().to_markdown(self_check_mode="interactive")
        assert "<details>" in md and "</details>" in md
        assert "<summary>点击展开答案</summary>" in md

    def test_questions_only_has_no_answers(self):
        md = make_doc().to_markdown(self_check_mode="questions_only")
        assert "- Q1.1：为何用负梯度？" in md
        assert "答案：函数值下降最快。" not in md

    def test_timestamp_rendering(self):
        md = make_doc().to_markdown(self_check_mode="static")
        assert "#### 1. 梯度下降 (00:01:05–00:02:05)" in md

    def test_image_paths_render(self):
        md = make_doc().to_markdown(
            image_paths=["img/a.png"], self_check_mode="static"
        )
        assert "## 🖼️ 核心图解 (Visual Architecture)" in md
        assert "![总览图](img/a.png)" in md

    def test_unknown_mode_falls_back_to_static(self):
        md_static = make_doc().to_markdown(self_check_mode="static")
        md_bogus = make_doc().to_markdown(self_check_mode="bogus")
        assert md_static == md_bogus

    def test_flat_legacy_deep_dive(self):
        doc = make_doc(
            deep_dive=[
                {"topic": "主题A", "explanation": "解释A", "example": "", "code": ""}
            ]
        )
        md = doc.to_markdown(self_check_mode="static")
        assert "#### 1. 主题A" in md
        assert "**💡 原理解析**：" in md  # v1 fallback layout


class TestDefaultMode:
    def test_required_structure(self):
        md = make_doc().to_markdown(self_check_mode="default")
        assert "## 📌 覆盖清单 (Coverage Index)" in md
        assert "## 📎 附录 (Appendix)" in md
        assert "### 📋 第1章自测" in md
        # Forbidden v2 markers must not appear.
        assert "**🧩 挑战" not in md
        assert "**✅ 自测（做完再看答案）**" not in md

    def test_code_only_in_appendix(self):
        md = make_doc().to_markdown(self_check_mode="default")
        appendix_at = md.find("## 📎 附录 (Appendix)")
        fence_at = md.find("```")
        assert fence_at > appendix_at > -1

    def test_coverage_lists_chapters_and_topics(self):
        md = make_doc().to_markdown(self_check_mode="default")
        coverage = md.split("## 📌 覆盖清单 (Coverage Index)")[1].split("##")[0]
        assert "- 第1章：基础概念" in coverage
        assert "- 梯度下降" in coverage

    def test_chapter_self_check_qa_pairs(self):
        md = make_doc().to_markdown(self_check_mode="default")
        assert "- Q1.1：为何用负梯度？" in md
        assert "- Q1.1 -> 答案：函数值下降最快。" in md


class TestLectureMode:
    def test_lecture_headings(self):
        md = make_doc().to_markdown(self_check_mode="lecture")
        for heading in [
            "## 核心概念图谱",
            "## 主题详解",
            "## 实战与代码",
            "## FAQ / 避坑指南",
            "## 📎 附录 (Appendix)",
            "### 术语表（Glossary）",
            "### 代码与伪代码",
        ]:
            assert heading in md, heading

    def test_concept_index_toggle(self):
        md_on = make_doc().to_markdown(
            self_check_mode="lecture", include_concept_index=True
        )
        md_off = make_doc().to_markdown(
            self_check_mode="lecture", include_concept_index=False
        )
        assert "### 概念索引（Concept Index）" in md_on
        assert "### 概念索引（Concept Index）" not in md_off

    def test_lecture_strips_timecodes_from_main_text(self):
        doc = make_doc()
        doc.deep_dive[0]["sections"][0]["explanation"] = "在 12:34 讲解了核心。"
        md = doc.to_markdown(self_check_mode="lecture")
        main_text = md.split("## 📎 附录 (Appendix)")[0]
        assert "12:34" not in main_text

    def test_exercises_rendered(self):
        md = make_doc().to_markdown(self_check_mode="lecture")
        assert "练习与答解：" in md
        assert "1. 什么是基础？" in md
        assert "答：基础是根基。" in md


class TestAnalysisResult:
    def test_from_api_response_roundtrip(self):
        data = {
            "title": "T",
            "one_sentence_summary": "S",
            "key_takeaways": ["k"],
            "deep_dive": [{"topic": "t", "explanation": "e"}],
            "glossary": {"g": "d"},
            "visual_schemas": [
                {"type": "overview", "description": "d", "schema": "s"}
            ],
        }
        result = AnalysisResult.from_api_response("v.mp4", data, {"duration": 10})
        assert result.title == "T"
        assert result.glossary == {"g": "d"}
        assert result.metadata["duration"] == 10
        assert result.knowledge_doc.visual_schemas[0].type == "overview"

    def test_missing_critical_field_raises(self):
        with pytest.raises(ValueError, match="deep_dive"):
            AnalysisResult.from_api_response(
                "v.mp4",
                {"title": "T", "one_sentence_summary": "S", "key_takeaways": []},
            )

    def test_legacy_single_visual_schema(self):
        data = {
            "title": "T",
            "one_sentence_summary": "S",
            "key_takeaways": ["k"],
            "deep_dive": [],
            "visual_schema": "legacy schema text",
        }
        result = AnalysisResult.from_api_response("v.mp4", data)
        schemas = result.knowledge_doc.visual_schemas
        assert len(schemas) == 1
        assert schemas[0].schema == "legacy schema text"
        assert schemas[0].description == "总览知识导图"

    def test_string_visual_schema_items(self):
        data = {
            "title": "T",
            "one_sentence_summary": "S",
            "key_takeaways": ["k"],
            "deep_dive": [],
            "visual_schemas": ["raw string schema"],
        }
        result = AnalysisResult.from_api_response("v.mp4", data)
        assert result.knowledge_doc.visual_schemas[0].schema == "raw string schema"

    def test_to_markdown_raises_on_stub_in_default_mode(self):
        doc = KnowledgeDocument(
            title="t",
            one_sentence_summary="",
            key_takeaways=[],
            deep_dive=[],
            glossary={},
        )
        result = AnalysisResult(video_path="v.mp4", knowledge_doc=doc)
        with pytest.raises(ValueError, match="Markdown 校验失败"):
            result.to_markdown(self_check_mode="default")

    def test_to_markdown_warns_in_legacy_mode(self):
        doc = KnowledgeDocument(
            title="t",
            one_sentence_summary="",
            key_takeaways=[],
            deep_dive=[],
            glossary={},
        )
        result = AnalysisResult(video_path="v.mp4", knowledge_doc=doc)
        with pytest.warns(UserWarning):
            result.to_markdown(self_check_mode="static")


class TestNormalization:
    def test_dict_example_renders_io_block(self):
        data = {
            "title": "T",
            "one_sentence_summary": "S",
            "key_takeaways": ["k"],
            "deep_dive": [
                {
                    "topic": "t",
                    "explanation": "e",
                    "example": {
                        "input": "x=1",
                        "steps": ["加一", "平方"],
                        "output": "4",
                    },
                }
            ],
        }
        result = AnalysisResult.from_api_response("v.mp4", data)
        example = result.knowledge_doc.deep_dive[0]["example"]
        assert "输入：x=1" in example
        assert "步骤：" in example
        assert "1. 加一" in example
        assert "输出：4" in example

    def test_list_explanation_becomes_bullets(self):
        data = {
            "title": "T",
            "one_sentence_summary": "S",
            "key_takeaways": ["k"],
            "deep_dive": [{"topic": "t", "explanation": ["第一点", "第二点"]}],
        }
        result = AnalysisResult.from_api_response("v.mp4", data)
        explanation = result.knowledge_doc.deep_dive[0]["explanation"]
        assert explanation == "- 第一点\n- 第二点"

    def test_string_connections_split_to_list(self):
        data = {
            "title": "T",
            "one_sentence_summary": "S",
            "key_takeaways": ["k"],
            "deep_dive": [{"topic": "t", "explanation": "e", "connections": "A\nB"}],
        }
        result = AnalysisResult.from_api_response("v.mp4", data)
        assert result.knowledge_doc.deep_dive[0]["connections"] == ["A", "B"]

    def test_millisecond_timestamps_normalized(self):
        doc = make_doc()
        doc.deep_dive[0]["sections"][0]["timestamp"] = {"start": 65000, "end": 125000}
        md = doc.to_markdown(self_check_mode="static")
        assert "(00:01:05–00:02:05)" in md
