"""Tests for the offline note linter, compressor, prompts, and CLI wiring."""

import pytest

from video_transformer_tpu.analyzer.prompts import load_prompts, render_prompt
from video_transformer_tpu.tools.validate_note import (
    detect_format,
    validate_file,
    validate_note,
)
from video_transformer_tpu.utils.compressor import compress_note, parse_topics


def lecture_note():
    return "\n".join(
        [
            "# 示例讲座",
            "",
            "## 核心概念图谱",
            "",
            "本讲概述。",
            "",
            "- 第1章：基础",
            "",
            "## 主题详解",
            "",
            "### 第1章：基础",
            "",
            "章节概述。",
            "",
            "内容串讲：",
            "",
            "- 要点一",
            "",
            "## 实战与代码",
            "",
            "本讲无可复用代码片段",
            "",
            "## FAQ / 避坑指南",
            "",
            "常见坑：",
            "",
            "- 坑一",
            "",
            "## 📎 附录 (Appendix)",
            "",
            "### 术语表（Glossary）",
            "",
            "- **术语**：定义",
            "",
        ]
    )


def legacy_note():
    return "\n".join(
        [
            "# 旧版笔记",
            "",
            "## 📝 关键结论 (Key Takeaways)",
            "",
            "- 结论",
            "",
            "## 🔍 深度解析 (Deep Dive)",
            "",
            "### 第1章：主题",
            "",
            "#### 1. 知识点A",
            "",
            "- 说明A",
            "",
            "#### 2. 知识点B",
            "",
            "- 说明B",
            "",
        ]
    )


def deep_note(missing_subsection: str | None = None, exercises: int = 3):
    """Reference-style deep-lecture note; optionally drop one subsection
    or shrink the exercise list below the minimum of 3."""
    chapter = [
        "### 第1章：核心主题",
        "",
        "#### 动机：为什么要学这个？",
        "",
        "动机说明。",
        "",
        "#### 直觉：用一句话抓住本质",
        "",
        "直觉说明。",
        "",
        "#### 推导/机制：用纯文本公式讲清楚",
        "",
        "y = w x + b",
        "",
        "#### 工程实践：怎么用、怎么调、怎么排查",
        "",
        "实践说明。",
        "",
        "#### 示例：输入→步骤→输出",
        "",
        "示例说明。",
        "",
        "#### 常见误区：错在哪里/怎么改",
        "",
        "误区说明。",
        "",
        "#### 本章练习",
        "",
        *[f"{i}. 练习{i}" for i in range(1, exercises + 1)],
        "",
        "#### 本章参考答案",
        "",
        "1. 答案一",
        "",
    ]
    if missing_subsection:
        chapter = [
            line for line in chapter if not line.startswith(missing_subsection)
        ]
    return "\n".join(
        [
            "# 深度讲义",
            "",
            "## 学习目标",
            "",
            "- 目标一",
            "",
            "## 先修知识与快速回顾",
            "",
            "- 先修一",
            "",
            "## 学习路线图（本讲你会走到哪里）",
            "",
            "- 路线一",
            "",
            "## 🔍 讲义正文",
            "",
            *chapter,
            "## 📌 覆盖清单 (Coverage Index)",
            "",
            "- 已覆盖",
            "",
            "## 📎 附录 (Appendix)",
            "",
            "- 附录内容",
            "",
        ]
    )


class TestValidateNote:
    def test_valid_lecture_passes(self):
        report = validate_note(lecture_note())
        assert report.format == "lecture"
        assert report.ok, report.errors

    def test_valid_deep_passes(self):
        report = validate_note(deep_note())
        assert report.format == "deep"
        assert report.ok, report.errors

    def test_deep_missing_subsection_flagged(self):
        report = validate_note(deep_note(missing_subsection="#### 直觉"))
        assert any("直觉" in e and "缺少必需小节" in e for e in report.errors)

    def test_deep_insufficient_exercises_flagged(self):
        report = validate_note(deep_note(exercises=2))
        assert any("练习数量不足" in e for e in report.errors)

    def test_deep_missing_chapter_flagged(self):
        note = deep_note().replace("### 第1章：核心主题", "### 主题")
        report = validate_note(note)
        assert any("缺少章节" in e for e in report.errors)

    def test_template_garbage_flagged(self):
        note = deep_note() + "\n完成关键计算或调用步骤\n"
        report = validate_note(note)
        assert any("垃圾输出" in e for e in report.errors)

    def test_timestamp_artifact_flagged(self):
        note = lecture_note() + "\n片段 :05-:30 出现异常\n"
        report = validate_note(note)
        assert any(":MM-:MM" in e for e in report.errors)

    def test_valid_legacy_passes(self):
        report = validate_note(legacy_note())
        assert report.format == "legacy"
        assert report.ok, report.errors

    def test_missing_title(self):
        report = validate_note("没有标题\n" + lecture_note())
        assert any("一级标题" in e for e in report.errors)

    def test_missing_section(self):
        broken = lecture_note().replace("## FAQ / 避坑指南", "## 其他")
        report = validate_note(broken)
        assert any("FAQ" in e for e in report.errors)

    def test_inline_latex_flagged(self):
        report = validate_note(lecture_note() + "\n公式 $x^2$ 在此\n")
        assert any("LaTeX" in e for e in report.errors)

    def test_display_math_profile_dependent(self):
        note = lecture_note() + "\n$$x^2$$\n"
        assert not validate_note(note, profile="default").ok
        assert validate_note(note, profile="pdf").ok

    def test_html_details_flagged(self):
        report = validate_note(lecture_note() + "\n<details>x</details>\n")
        assert any("details" in e for e in report.errors)

    def test_bare_timestamp_warning_in_main(self):
        note = lecture_note().replace("- 要点一", "- 在 12:34 讲了要点")
        report = validate_note(note)
        assert any("时间戳" in w for w in report.warnings)

    def test_unknown_format(self):
        report = validate_note("# 标题\n正文")
        assert not report.ok
        assert detect_format("# 标题\n正文") == "unknown"

    def test_validate_file(self, tmp_path):
        path = tmp_path / "n.md"
        path.write_text(lecture_note(), encoding="utf-8")
        report = validate_file(path)
        assert report.ok and report.path == str(path)


class TestCompressor:
    def test_parse_topics(self):
        topics = parse_topics(legacy_note())
        assert [t.title for t in topics] == ["知识点A", "知识点B"]
        assert topics[0].chapter == "主题"
        assert topics[0].bullets == ["说明A"]

    def test_compress_produces_digest(self):
        digest = compress_note(legacy_note(), max_lines=50)
        assert digest.startswith("# 旧版笔记（精简版）")
        assert "**知识点A**" in digest
        assert len(digest.splitlines()) <= 50

    def test_chapter_cap_merges_tail(self):
        sections = []
        for i in range(9):
            sections += [f"### 第{i + 1}章：章节{i + 1}", f"#### {i + 1}. 主题{i + 1}", ""]
        note = "# 多章\n\n## 🔍 深度解析 (Deep Dive)\n\n" + "\n".join(sections)
        digest = compress_note(note, max_chapters=6)
        chapter_lines = [
            ln for ln in digest.splitlines() if ln.startswith("## 第")
        ]
        assert len(chapter_lines) <= 6
        assert any("综合与补充" in ln for ln in chapter_lines)


class TestPrompts:
    def test_all_templates_load(self):
        prompts = load_prompts()
        for name in [
            "analysis", "segment_analysis", "visual_schema", "rewrite",
            "consolidate", "validator", "audit", "image_render",
        ]:
            assert name in prompts

    def test_render_substitution(self):
        text = render_prompt("analysis", {"duration_label": "00:10:00"})
        assert "00:10:00" in text

    def test_unknown_template_raises(self):
        with pytest.raises(KeyError):
            render_prompt("nope")

    def test_missing_variable_raises(self):
        with pytest.raises(KeyError):
            render_prompt("analysis", {})

    def test_compact_profile_selects_training_templates(self):
        """Distilled checkpoints must serve the exact templates they were
        trained on (round-2 originals): the compact profile maps analysis/
        segment_analysis to their _compact variants and leaves everything
        else (and the spec profile) untouched."""
        spec = render_prompt("analysis", {"duration_label": "00:10:00"})
        compact = render_prompt(
            "analysis", {"duration_label": "00:10:00"}, profile="compact"
        )
        assert compact != spec
        assert "knowledge-distillation assistant" in compact
        assert len(compact) < len(spec) / 5
        # Templates without a compact variant are shared across profiles.
        shared = render_prompt(
            "rewrite", {"schema": "s", "feedback": "f"}, profile="compact"
        )
        assert shared == render_prompt(
            "rewrite", {"schema": "s", "feedback": "f"}
        )

    def test_unknown_profile_rejected(self):
        with pytest.raises(ValueError):
            render_prompt(
                "analysis", {"duration_label": "x"}, profile="mystery"
            )

    def test_analyzer_config_profile_reaches_prompts(self):
        """analyzer.prompt_profile: compact flows into the rendered prompt
        (the out-of-box config serves the shipped distilled checkpoint)."""
        from video_transformer_tpu.analyzer.content_analyzer import (
            ContentAnalyzer,
        )
        from video_transformer_tpu.utils.counter import APICounter

        analyzer = ContentAnalyzer(
            {"analyzer": {"prompt_profile": "compact"}},
            APICounter(max_calls=1),
            engine=object(),
        )
        assert analyzer.prompt_profile == "compact"
        from video_transformer_tpu.utils.config import load_config

        assert load_config()["analyzer"]["prompt_profile"] == "compact"

    def test_absent_profile_key_defaults_compact(self):
        """A config dict with no prompt_profile key (every pre-round-3
        config file) must fall back to compact: the shipped default
        checkpoint is distilled, and serving it the spec prompt collapses
        grounding."""
        from video_transformer_tpu.analyzer.content_analyzer import (
            ContentAnalyzer,
        )
        from video_transformer_tpu.utils.counter import APICounter

        analyzer = ContentAnalyzer(
            {"analyzer": {}}, APICounter(max_calls=1), engine=object()
        )
        assert analyzer.prompt_profile == "compact"


class TestCLI:
    def test_parser_requires_source(self, capsys):
        from video_transformer_tpu.cli import build_parser

        with pytest.raises(SystemExit):
            build_parser().parse_args([])

    def test_url_and_batch_exclusive(self):
        from video_transformer_tpu.cli import build_parser

        with pytest.raises(SystemExit):
            build_parser().parse_args(["--url", "a", "--batch", "b"])

    def test_load_url_list(self, tmp_path):
        from video_transformer_tpu.cli import VideoTransformerCLI

        url_file = tmp_path / "URL.txt"
        url_file.write_text("# comment\nhttps://a\n\nhttps://b\n")
        assert VideoTransformerCLI._load_url_list(str(url_file)) == [
            "https://a",
            "https://b",
        ]
