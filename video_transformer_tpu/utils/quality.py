"""Pre-save quality gates over rendered notes.

Four deterministic scrubbing gates run before a note is written to disk:
placeholder line-by-line explanations, concept-index timestamp artifacts,
templated exercise answers, and duplicated chapter headings. Each emits a
machine-readable report merged into a QualityReport JSON artifact. Matches
reference src/utils/note_quality.py.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from typing import Any, TypedDict

__all__ = ["apply_quality_gates", "QualityReport", "GateReport"]

PLACEHOLDER_LINE_RE = re.compile(r"^\s*\d+[：:]\s*完成关键计算或调用步骤。?\s*$")
EXPLANATION_LINE_RE = re.compile(r"^\s*\d+[：:]")
CONCEPT_INDEX_HEADING_RE = re.compile(r"^###\s+概念索引")
TIMESTAMP_ARTIFACT_RE = re.compile(r":\d{2}-:\d{2}")
CHAPTER_HEADING_RE = re.compile(r"^###\s+第(\d+)章：(.+)$")
TEMPLATED_ANSWER_RE = re.compile(r"^答[:：]因为 .+ 直接影响核心流程的效果与可解释性。$")

PLACEHOLDER_RATIO_THRESHOLD = 0.7
PLACEHOLDER_MIN_LINES = 3
TEMPLATED_ANSWER_RATIO_THRESHOLD = 0.6
TEMPLATED_ANSWER_MIN_COUNT = 2


class GateReport(TypedDict):
    name: str
    triggered: bool
    found: dict[str, int]
    fixed: dict[str, int]
    sections_removed: list[str]
    sections_rewritten: list[str]
    lines_removed: int
    lines_rewritten: int
    blocks_removed: int
    blocks_rewritten: int
    headings_rewritten: int


class QualityReport(TypedDict):
    version: str
    gates_triggered: list[str]
    issues_found: dict[str, dict[str, int]]
    issues_fixed: dict[str, dict[str, int]]
    sections_removed: list[str]
    sections_rewritten: list[str]
    counts: dict[str, int]
    flags: dict[str, Any]


def apply_quality_gates(
    markdown: str,
    profile: str,
    config: Mapping[str, Any] | None,
) -> tuple[str, QualityReport]:
    """Run all gates over the markdown; returns (scrubbed text, report)."""
    report = _new_report(profile, config)
    if not markdown:
        return markdown, report

    lines = markdown.splitlines()
    for gate in (
        _gate_placeholder_explanations,
        _gate_concept_index_artifacts,
        _gate_templated_exercises,
        _gate_duplicated_chapters,
    ):
        lines, gate_report = gate(lines)
        if gate_report["triggered"]:
            _merge(report, gate_report)

    output = "\n".join(lines)
    if markdown.endswith("\n"):
        output += "\n"
    return output, report


def _new_report(profile: str, config: Mapping[str, Any] | None) -> QualityReport:
    enabled = bool(config.get("enabled", False)) if isinstance(config, Mapping) else False
    return {
        "version": "1.0",
        "gates_triggered": [],
        "issues_found": {},
        "issues_fixed": {},
        "sections_removed": [],
        "sections_rewritten": [],
        "counts": {
            "lines_removed": 0,
            "lines_rewritten": 0,
            "blocks_removed": 0,
            "blocks_rewritten": 0,
            "headings_rewritten": 0,
        },
        "flags": {
            "profile": profile,
            "enabled": enabled,
            "placeholder_ratio_threshold": PLACEHOLDER_RATIO_THRESHOLD,
            "templated_answer_ratio_threshold": TEMPLATED_ANSWER_RATIO_THRESHOLD,
        },
    }


def _merge(report: QualityReport, gate_report: GateReport) -> None:
    name = gate_report["name"]
    report["gates_triggered"].append(name)
    report["issues_found"][name] = gate_report["found"]
    report["issues_fixed"][name] = gate_report["fixed"]
    report["sections_removed"].extend(gate_report["sections_removed"])
    report["sections_rewritten"].extend(gate_report["sections_rewritten"])
    for key in report["counts"]:
        report["counts"][key] += gate_report[key]  # type: ignore[literal-required]


def _gate_result(
    name: str,
    *,
    triggered: bool,
    found: dict[str, int],
    fixed: dict[str, int],
    sections_removed: list[str] | None = None,
    sections_rewritten: list[str] | None = None,
    lines_removed: int = 0,
    lines_rewritten: int = 0,
    blocks_removed: int = 0,
    blocks_rewritten: int = 0,
    headings_rewritten: int = 0,
) -> GateReport:
    return {
        "name": name,
        "triggered": triggered,
        "found": found,
        "fixed": fixed,
        "sections_removed": sections_removed or [],
        "sections_rewritten": sections_rewritten or [],
        "lines_removed": lines_removed,
        "lines_rewritten": lines_rewritten,
        "blocks_removed": blocks_removed,
        "blocks_rewritten": blocks_rewritten,
        "headings_rewritten": headings_rewritten,
    }


def _gate_placeholder_explanations(lines: list[str]) -> tuple[list[str], GateReport]:
    """Remove 逐行说明 blocks where ≥70% of numbered lines are placeholders."""
    output: list[str] = []
    removed_lines = 0
    blocks_removed = 0
    found_placeholder = 0
    found_total = 0

    idx = 0
    while idx < len(lines):
        line = lines[idx]
        if line.strip() in {"逐行说明：", "逐行说明:"}:
            block_span = [idx]
            numbered: list[str] = []
            cursor = idx + 1
            while cursor < len(lines):
                stripped = lines[cursor].strip()
                if not stripped:
                    block_span.append(cursor)
                    cursor += 1
                    continue
                if EXPLANATION_LINE_RE.match(stripped):
                    block_span.append(cursor)
                    numbered.append(stripped)
                    cursor += 1
                    continue
                break

            total = len(numbered)
            placeholders = sum(1 for e in numbered if PLACEHOLDER_LINE_RE.match(e))
            found_placeholder += placeholders
            found_total += total

            ratio = placeholders / total if total >= PLACEHOLDER_MIN_LINES else 0.0
            if total >= PLACEHOLDER_MIN_LINES and ratio >= PLACEHOLDER_RATIO_THRESHOLD:
                removed_lines += len(block_span)
                blocks_removed += 1
                idx = cursor
                continue

        output.append(line)
        idx += 1

    triggered = blocks_removed > 0
    return output, _gate_result(
        "placeholder_explanations",
        triggered=triggered,
        found={
            "placeholder_lines": found_placeholder,
            "total_explanation_lines": found_total,
        },
        fixed={"blocks_removed": blocks_removed},
        sections_removed=["逐行说明"] if triggered else [],
        lines_removed=removed_lines,
        blocks_removed=blocks_removed,
    )


def _gate_concept_index_artifacts(lines: list[str]) -> tuple[list[str], GateReport]:
    """Drop timestamp ranges and gap notices from the concept index."""
    output: list[str] = []
    removed = 0
    inside_index = False

    for line in lines:
        stripped = line.strip()
        if CONCEPT_INDEX_HEADING_RE.match(stripped):
            inside_index = True
            output.append(line)
            continue
        if inside_index and (stripped.startswith("### ") or stripped.startswith("## ")):
            inside_index = False

        if inside_index:
            if TIMESTAMP_ARTIFACT_RE.search(stripped) or (
                "以下片段未覆盖或分析失败" in stripped
            ):
                removed += 1
                continue

        output.append(line)

    triggered = removed > 0
    return output, _gate_result(
        "concept_index_artifacts",
        triggered=triggered,
        found={"artifact_lines": removed},
        fixed={"lines_removed": removed},
        sections_rewritten=["概念索引（Concept Index）"] if triggered else [],
        lines_removed=removed,
        blocks_rewritten=1 if triggered else 0,
    )


_EXERCISE_REPLACEMENT = [
    "练习与答解：",
    "",
    "1. 计算 2 + 3 的结果。",
    "2. 计算 6 ÷ 2 的结果。",
    "3. 计算 7 - 4 的结果。",
    "答：5",
    "答：3",
    "答：3",
    "",
]


def _gate_templated_exercises(lines: list[str]) -> tuple[list[str], GateReport]:
    """Replace exercise blocks whose answers are ≥60% template boilerplate."""
    output: list[str] = []
    rewritten_lines = 0
    blocks_rewritten = 0
    found_templates = 0

    idx = 0
    while idx < len(lines):
        line = lines[idx]
        if line.strip() in {"练习与答解：", "练习与答解:"}:
            block: list[str] = []
            cursor = idx + 1
            while cursor < len(lines):
                stripped = lines[cursor].strip()
                if stripped.startswith("## ") or stripped.startswith("### "):
                    break
                block.append(lines[cursor])
                cursor += 1

            answers = [e.strip() for e in block if e.strip().startswith("答")]
            templated = sum(1 for e in answers if TEMPLATED_ANSWER_RE.match(e))
            found_templates += templated
            ratio = templated / len(answers) if answers else 0.0

            if (
                templated >= TEMPLATED_ANSWER_MIN_COUNT
                and ratio >= TEMPLATED_ANSWER_RATIO_THRESHOLD
            ):
                output.extend(_EXERCISE_REPLACEMENT)
                rewritten_lines += len(block) + 1
                blocks_rewritten += 1
                idx = cursor
                continue

        output.append(line)
        idx += 1

    triggered = blocks_rewritten > 0
    return output, _gate_result(
        "templated_exercises",
        triggered=triggered,
        found={"templated_answers": found_templates},
        fixed={"blocks_rewritten": blocks_rewritten},
        sections_rewritten=["练习与答解"] if triggered else [],
        lines_rewritten=rewritten_lines,
        blocks_rewritten=blocks_rewritten,
    )


def _chapter_base_key(title: str) -> str | None:
    if "（补充" in title or "(补充" in title:
        return None
    base = title
    for splitter in ("：", ":"):
        if splitter in title:
            candidate = title.split(splitter, 1)[0].strip()
            if candidate:
                base = candidate
            break
    normalized = re.sub(r"[^\w一-鿿]+", "", base)
    if len(normalized) < 2:
        return None
    return normalized


def _gate_duplicated_chapters(lines: list[str]) -> tuple[list[str], GateReport]:
    """Demote repeated chapter headings to `#### 补充：` sub-headings."""
    output = list(lines)
    seen: dict[str, int] = {}
    rewritten = 0
    duplicates = 0

    for idx, line in enumerate(lines):
        match = CHAPTER_HEADING_RE.match(line.strip())
        if not match:
            continue
        title = match.group(2).strip()
        key = _chapter_base_key(title)
        if not key:
            continue
        if key in seen:
            duplicates += 1
            output[idx] = f"#### 补充：{title}"
            rewritten += 1
        else:
            seen[key] = idx

    triggered = rewritten > 0
    return output, _gate_result(
        "duplicated_chapter_titles",
        triggered=triggered,
        found={"duplicate_titles": duplicates},
        fixed={"headings_rewritten": rewritten},
        sections_rewritten=["章节标题"] if triggered else [],
        headings_rewritten=rewritten,
    )
