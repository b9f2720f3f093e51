"""Markdown structure validation and stub-output detection.

The rendered note must satisfy a structural contract before it is saved
(required headings present, no v2 active-learning markers in default mode, no
code fences before the appendix). Matches reference
/root/reference/src/analyzer/validators.py.
"""

from __future__ import annotations

import re
from typing import Protocol

__all__ = [
    "APPENDIX_HEADING",
    "REQUIRED_HEADINGS_DEFAULT",
    "FORBIDDEN_PATTERNS_DEFAULT",
    "validate_markdown_structure",
    "detect_stub_output",
    "validate_knowledge_document",
]

APPENDIX_HEADING = "## 📎 附录 (Appendix)"
REQUIRED_HEADINGS_DEFAULT = [
    "## 📌 覆盖清单 (Coverage Index)",
    APPENDIX_HEADING,
]
FORBIDDEN_PATTERNS_DEFAULT = [
    "**🧩 挑战",
    "**✅ 自测（做完再看答案）**",
]

_HEADING_RE = re.compile(r"^#{1,6}\s+")
_QUOTE_PREFIX_RE = re.compile(r"^(\s*>+\s*)")
_BULLET_PREFIX_RE = re.compile(r"^(\s*[-*+]\s+)")
_ORDERED_PREFIX_RE = re.compile(r"^(\s*\d+\.\s+)")
_CONTENT_CHAR_RE = re.compile(r"[A-Za-z0-9一-鿿]")


def validate_markdown_structure(markdown: str, mode: str) -> tuple[bool, list[str]]:
    """Check structural rules for the given render mode.

    Only "default" mode has hard structural requirements; other modes always
    pass. Returns (ok, errors).
    """
    errors: list[str] = []
    normalized_mode = (mode or "").strip().lower()

    if normalized_mode == "default":
        for heading in REQUIRED_HEADINGS_DEFAULT:
            if heading not in markdown:
                errors.append(f"缺少必需标题: {heading}")
        for pattern in FORBIDDEN_PATTERNS_DEFAULT:
            if pattern in markdown:
                errors.append(f"禁用内容命中: {pattern}")
        appendix_at = markdown.find(APPENDIX_HEADING)
        fence_at = markdown.find("```")
        if appendix_at != -1 and fence_at != -1 and fence_at < appendix_at:
            errors.append("代码围栏出现在附录之前")

    return len(errors) == 0, errors


def detect_stub_output(markdown: str) -> bool:
    """Detect placeholder / empty generations ("final report", empty sections)."""
    if not markdown or not markdown.strip():
        return True

    normalized = " ".join(markdown.lower().split())
    if normalized in {"final report", "final report.", "final"}:
        return True
    if normalized.startswith("final report") and len(normalized) <= 30:
        return True

    lines = markdown.splitlines()
    if not _has_substantive_content(lines):
        return True
    if _has_empty_section(lines):
        return True
    return False


class _DocumentLike(Protocol):
    def to_markdown(
        self,
        image_paths: list[str] | None = None,
        self_check_mode: str = "static",
        include_concept_index: bool | None = None,
    ) -> str: ...


def validate_knowledge_document(
    doc: _DocumentLike, mode: str
) -> tuple[bool, list[str]]:
    """Render a document and run both stub detection and structure checks."""
    markdown = doc.to_markdown(self_check_mode=mode)
    errors: list[str] = []
    if detect_stub_output(markdown):
        errors.append("检测到疑似占位/空内容输出")
    _, structure_errors = validate_markdown_structure(markdown, mode)
    errors.extend(structure_errors)
    return len(errors) == 0, errors


def _has_substantive_content(lines: list[str]) -> bool:
    for line in lines:
        stripped = line.strip()
        if not stripped:
            continue
        if stripped.startswith("#") or stripped.startswith("```"):
            continue
        if stripped in {"---", "***"}:
            continue
        cleaned = _QUOTE_PREFIX_RE.sub("", stripped)
        cleaned = _BULLET_PREFIX_RE.sub("", cleaned)
        cleaned = _ORDERED_PREFIX_RE.sub("", cleaned)
        if _CONTENT_CHAR_RE.search(cleaned):
            return True
    return False


def _has_empty_section(lines: list[str]) -> bool:
    """A heading immediately followed by another heading marks an empty section."""
    for idx, line in enumerate(lines):
        if not _HEADING_RE.match(line.strip()):
            continue
        for next_line in lines[idx + 1 :]:
            next_stripped = next_line.strip()
            if not next_stripped:
                continue
            if _HEADING_RE.match(next_stripped):
                return True
            break
    return False
