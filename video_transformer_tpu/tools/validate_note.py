"""Offline note linter: pandoc/PDF-readiness checks over generated notes.

Capability parity with reference src/tools/validate_note.py: title check,
format detection (lecture vs legacy), required-section checks, chapter
structure, forbidden patterns (inline LaTeX / HTML details / placeholder
text / python dict-repr leaks), bare timestamps in main text — profile-aware
("pdf" allows display math and TikZ fences).

CLI: python -m video_transformer_tpu.tools.validate_note NOTE.md [--profile pdf]
"""

from __future__ import annotations

import argparse
import re
import sys
from dataclasses import dataclass, field
from pathlib import Path

__all__ = ["NoteReport", "validate_note", "validate_file", "main"]

LECTURE_REQUIRED_SECTIONS = (
    "## 核心概念图谱",
    "## 主题详解",
    "## 实战与代码",
    "## FAQ / 避坑指南",
    "## 📎 附录 (Appendix)",
)
LEGACY_REQUIRED_SECTIONS = (
    "## 📝 关键结论 (Key Takeaways)",
    "## 🔍 深度解析 (Deep Dive)",
)

# Patterns that should never appear in prose output.
_INLINE_MATH_RE = re.compile(r"(?<!\$)\$[^$\n]+\$(?!\$)")
_LATEX_PAREN_RE = re.compile(r"\\\([^)]*\\\)")
_HTML_DETAILS_RE = re.compile(r"</?(?:details|summary)>")
_DICT_REPR_RE = re.compile(r"\{'[^']+':")
_PLACEHOLDER_RE = re.compile(r"(?:TODO|FIXME|XXX|占位符|待补充)")
_BARE_TIMESTAMP_RE = re.compile(r"(?<![\d:])\b\d{1,2}:\d{2}(?::\d{2})?\b")
_TIKZ_FENCE_RE = re.compile(r"```\{=latex\}")
_DISPLAY_MATH_RE = re.compile(r"\$\$")


@dataclass
class NoteReport:
    path: str = ""
    format: str = "unknown"  # lecture | legacy | unknown
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.errors


def detect_format(markdown: str) -> str:
    if any(marker in markdown for marker in LECTURE_REQUIRED_SECTIONS[:2]):
        return "lecture"
    if any(marker in markdown for marker in LEGACY_REQUIRED_SECTIONS):
        return "legacy"
    return "unknown"


def _main_text(markdown: str) -> str:
    """Everything before the appendix (timestamps are allowed in appendix)."""
    idx = markdown.find("## 📎 附录 (Appendix)")
    return markdown if idx == -1 else markdown[:idx]


def _outside_code_fences(markdown: str) -> str:
    out: list[str] = []
    in_fence = False
    for line in markdown.splitlines():
        if line.strip().startswith("```"):
            in_fence = not in_fence
            continue
        if not in_fence:
            out.append(line)
    return "\n".join(out)


def validate_note(markdown: str, profile: str = "default") -> NoteReport:
    report = NoteReport()
    report.format = detect_format(markdown)

    lines = markdown.splitlines()
    if not lines or not lines[0].startswith("# ") or len(lines[0]) <= 2:
        report.errors.append("缺少一级标题 (# 标题)")

    required = (
        LECTURE_REQUIRED_SECTIONS
        if report.format == "lecture"
        else LEGACY_REQUIRED_SECTIONS
    )
    if report.format == "unknown":
        report.errors.append("无法识别笔记格式 (lecture / legacy)")
    else:
        for section in required:
            if section not in markdown:
                report.errors.append(f"缺少必需章节: {section}")

    if report.format == "lecture":
        chapters = re.findall(r"^### 第\d+章：", markdown, re.MULTILINE)
        if not chapters:
            report.errors.append("主题详解缺少章节 (### 第N章：)")

    prose = _outside_code_fences(markdown)

    if profile != "pdf":
        if _DISPLAY_MATH_RE.search(prose):
            report.errors.append("默认 profile 不允许 display math ($$)")
        if _TIKZ_FENCE_RE.search(markdown):
            report.errors.append("默认 profile 不允许 TikZ 代码块")
    if _INLINE_MATH_RE.search(prose):
        report.errors.append("正文包含内联 LaTeX 公式 ($...$)")
    if _LATEX_PAREN_RE.search(prose):
        report.errors.append("正文包含 \\(...\\) LaTeX 标记")
    if _HTML_DETAILS_RE.search(prose):
        report.errors.append("正文包含 HTML details/summary 标签")
    if _DICT_REPR_RE.search(prose):
        report.errors.append("正文疑似泄漏 Python dict 字面量")
    if _PLACEHOLDER_RE.search(prose):
        report.warnings.append("正文包含占位符文本")

    if report.format == "lecture":
        main_prose = _outside_code_fences(_main_text(markdown))
        stamps = _BARE_TIMESTAMP_RE.findall(main_prose)
        if stamps:
            report.warnings.append(
                f"主文包含 {len(stamps)} 个裸时间戳 (应只出现在附录)"
            )

    return report


def validate_file(path: str | Path, profile: str = "default") -> NoteReport:
    path = Path(path)
    report = validate_note(path.read_text(encoding="utf-8"), profile)
    report.path = str(path)
    return report


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="validate generated notes")
    parser.add_argument("paths", nargs="+", help="note markdown files")
    parser.add_argument("--profile", default="default", choices=["default", "pdf"])
    args = parser.parse_args(argv)

    failed = 0
    for path in args.paths:
        report = validate_file(path, args.profile)
        status = "PASS" if report.ok else "FAIL"
        print(f"[{status}] {path} (format={report.format})")
        for error in report.errors:
            print(f"  error: {error}")
        for warning in report.warnings:
            print(f"  warn:  {warning}")
        if not report.ok:
            failed += 1
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
