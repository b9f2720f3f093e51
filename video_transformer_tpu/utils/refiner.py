"""Deterministic note-length refinement.

Applies the duration-scaled line budget (refiner_contract.py: 400 lines/hour
clamped to [220, 900], ±10%) by trimming low-value content in priority order,
mirroring the reference's cascade (src/utils/note_refiner.py:295-451):

  1. second+ examples per chapter (实战与代码 section)
  2. long bullet lists (keep first 5 per block)
  3. FAQ/pitfall items beyond 4
  4. appendix code blocks beyond the first 2
  5. concept-index entries beyond 30

A note still over budget gets the ``<!-- BUDGET_EXCEEDED -->`` marker
appended rather than destructive cuts (coverage is a hard requirement; the
budget is a soft constraint — CoveragePolicy).
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from typing import Any, Callable

from .refiner_contract import (
    BudgetSpec,
    budget_for_duration,
    count_budget_lines,
    format_budget_warning,
)

__all__ = ["refine_note", "is_lecture_note"]

_HEADING_RE = re.compile(r"^(#{1,6})\s")

LECTURE_MARKERS = ("## 核心概念图谱", "## 主题详解")
TEXTBOOK_MARKERS = ("## 实战与代码", "## FAQ / 避坑指南")


def is_lecture_note(markdown: str) -> bool:
    return any(marker in markdown for marker in LECTURE_MARKERS)


def refine_note(
    markdown: str,
    duration_seconds: float,
    config: Mapping[str, Any] | None = None,
) -> str:
    """Trim the note toward its duration budget (soft constraint)."""
    config = dict(config or {})
    spec = BudgetSpec(
        lines_per_hour=int(config.get("lines_per_hour", 400)),
        min_cap=int(config.get("min_lines", 220)),
        max_cap=int(config.get("max_lines", 900)),
        tolerance_ratio=float(config.get("tolerance_ratio", 0.10)),
    )
    exclude_code = bool(config.get("exclude_code_from_budget", False))
    budget = budget_for_duration(duration_seconds, spec)

    def over_budget(text: str) -> bool:
        return count_budget_lines(text, exclude_code) > budget.max_lines

    if not over_budget(markdown):
        return markdown

    passes: list[Callable[[str], str]] = [
        _trim_extra_examples,
        lambda t: _trim_long_bullets(t, keep=5),
        lambda t: _trim_faq_items(t, keep=4),
        lambda t: _trim_appendix_code(t, keep=2),
        lambda t: _trim_concept_index(t, keep=30),
        lambda t: _trim_long_bullets(t, keep=3),
    ]
    text = markdown
    for trim in passes:
        text = trim(text)
        if not over_budget(text):
            return text

    actual = count_budget_lines(text, exclude_code)
    return text + "\n" + format_budget_warning(actual, budget.target_lines) + "\n"


# -- trimming passes -----------------------------------------------------------


def _split_sections(lines: list[str], level: int) -> list[tuple[str | None, list[str]]]:
    """Partition into (heading, body-lines) chunks at the given heading level."""
    chunks: list[tuple[str | None, list[str]]] = [(None, [])]
    prefix = "#" * level + " "
    for line in lines:
        if line.startswith(prefix):
            chunks.append((line, []))
        else:
            chunks[-1][1].append(line)
    return chunks


def _trim_extra_examples(markdown: str) -> str:
    """In 实战与代码, keep only 示例 1; drop later example subsections."""
    lines = markdown.splitlines()
    out: list[str] = []
    in_practice = False
    dropping = False
    for line in lines:
        if line.startswith("## "):
            in_practice = line.strip().startswith("## 实战与代码")
            dropping = False
        if in_practice and line.startswith("### 示例 "):
            match = re.match(r"### 示例 (\d+)", line)
            dropping = bool(match and int(match.group(1)) >= 2)
        if not dropping:
            out.append(line)
    return "\n".join(out)


def _trim_long_bullets(markdown: str, keep: int) -> str:
    """Cap consecutive bullet runs at ``keep`` items."""
    out: list[str] = []
    run = 0
    for line in markdown.splitlines():
        if re.match(r"^\s*[-*+]\s", line):
            run += 1
            if run > keep:
                continue
        else:
            # Indented continuations belong to the previous bullet.
            if not line.startswith("  ") or not line.strip():
                run = 0
        out.append(line)
    return "\n".join(out)


def _trim_faq_items(markdown: str, keep: int) -> str:
    """In FAQ / 避坑指南, cap 常见坑 bullets and exercise items."""
    lines = markdown.splitlines()
    out: list[str] = []
    in_faq = False
    bullet_count = 0
    exercise_count = 0
    answer_count = 0
    for line in lines:
        if line.startswith("## "):
            in_faq = line.strip().startswith("## FAQ")
            bullet_count = exercise_count = answer_count = 0
        if in_faq:
            if re.match(r"^\s*-\s", line):
                bullet_count += 1
                if bullet_count > keep:
                    continue
            elif re.match(r"^\d+\.\s", line):
                exercise_count += 1
                if exercise_count > keep:
                    continue
            elif line.startswith("答："):
                answer_count += 1
                if answer_count > keep:
                    continue
        out.append(line)
    return "\n".join(out)


def _trim_appendix_code(markdown: str, keep: int) -> str:
    """In 代码与伪代码, keep the first ``keep`` fenced blocks."""
    lines = markdown.splitlines()
    out: list[str] = []
    in_code_appendix = False
    block_count = 0
    dropping = False
    for line in lines:
        if line.startswith("### "):
            in_code_appendix = line.strip().startswith("### 代码与伪代码")
            dropping = False
        if in_code_appendix and line.strip().startswith("```"):
            if not dropping and line.strip() == "```python":
                block_count += 1
                if block_count > keep:
                    dropping = True
            elif dropping and line.strip() == "```":
                dropping = False
                continue
        if not dropping:
            out.append(line)
    return "\n".join(out)


def _trim_concept_index(markdown: str, keep: int) -> str:
    lines = markdown.splitlines()
    out: list[str] = []
    in_index = False
    count = 0
    for line in lines:
        if line.startswith("### "):
            in_index = line.strip().startswith("### 概念索引")
            count = 0
        if in_index and re.match(r"^\s*-\s", line):
            count += 1
            if count > keep:
                continue
        out.append(line)
    return "\n".join(out)
