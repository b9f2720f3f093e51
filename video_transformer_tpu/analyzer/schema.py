"""The knowledge-note output schema, compiled to a decoding DFA.

This is the executable form of the JSON contract that the reference specifies
in prose inside its prompts (reference config/prompts.yaml:111-152) and
enforces after the fact with required-field checks
(content_analyzer.py:1585-1603). Here the schema IS the decoder grammar:
every generation is valid JSON with exactly the required fields, so
``AnalysisResult.from_api_response`` can never reject engine output.

Field length budgets are in bytes (ASCII free-text alphabet). List/dict item
counts are model-chosen (>= 1 each) and bounded by the decode-token budget.
"""

from __future__ import annotations

import functools

from ..models.tokenizer import ByteTokenizer
from ..ops.constrained import DfaBuilder, JsonDfa

__all__ = ["note_dfa", "segment_note_dfa", "schema_dfa", "validator_dfa", "audit_dfa"]


def _scaled(scale: float, min_len: int, max_len: int) -> tuple[int, int]:
    lo = max(1, int(min_len * min(scale, 1.0)))
    hi = max(lo + 1, int(max_len * scale))
    return lo, hi


def _qa_item(b: DfaBuilder, s: float) -> None:
    b.literal('{"q": ').free_string(*_scaled(s, 5, 60))
    b.literal(', "a": ').free_string(*_scaled(s, 5, 60))
    b.literal("}")


def _section_item(b: DfaBuilder, s: float) -> None:
    b.literal('{"topic": ').free_string(*_scaled(s, 3, 40))
    b.literal(', "timestamp": ').timecode()
    b.literal(', "explanation": ').free_string(*_scaled(s, 10, 160))
    b.literal(', "example": ').free_string(*_scaled(s, 8, 120))
    b.literal(', "code": ').free_string(*_scaled(s, 4, 80))
    b.literal(', "common_mistakes": ').string_list(*_scaled(s, 5, 60))
    b.literal(', "connections": ').string_list(*_scaled(s, 3, 40))
    b.literal(', "self_check": ').loop_list(lambda bb: _qa_item(bb, s))
    b.literal("}")


def _chapter_item(b: DfaBuilder, s: float) -> None:
    b.literal('{"chapter_title": ').free_string(*_scaled(s, 4, 40))
    b.literal(', "chapter_summary": ').free_string(*_scaled(s, 8, 100))
    b.literal(', "chapter_self_check": ').loop_list(lambda bb: _qa_item(bb, s))
    b.literal(', "sections": ').loop_list(lambda bb: _section_item(bb, s))
    b.literal("}")


def _visual_schema_item(b: DfaBuilder, s: float) -> None:
    b.literal('{"type": "overview", "description": ').free_string(*_scaled(s, 5, 60))
    b.literal(', "schema": ').free_string(*_scaled(s, 10, 200))
    b.literal("}")


@functools.lru_cache(maxsize=8)
def note_dfa(
    vocab_size: int = 512, scale: float = 1.0, unicode_text: bool = True
) -> JsonDfa:
    """Full knowledge-note schema: the single-pass analysis grammar.

    ``scale`` multiplies all free-field length budgets (tests use compact
    grammars so untrained-model sampling terminates within small token caps).
    ``unicode_text`` admits well-formed CJK UTF-8 in free fields — the
    product's notes are Chinese (reference config/prompts.yaml) — while
    malformed byte sequences stay unreachable.
    """
    b = DfaBuilder(ByteTokenizer(vocab_size), unicode_text=unicode_text)
    b.literal('{"title": ').free_string(*_scaled(scale, 6, 60))
    b.literal(', "one_sentence_summary": ').free_string(*_scaled(scale, 10, 120))
    b.literal(', "key_takeaways": ').string_list(*_scaled(scale, 5, 80))
    b.literal(', "deep_dive": ').loop_list(lambda bb: _chapter_item(bb, scale))
    b.literal(', "glossary": ').string_dict(
        *_scaled(scale, 2, 24), *_scaled(scale, 5, 80)
    )
    b.literal(', "visual_schemas": ').loop_list(
        lambda bb: _visual_schema_item(bb, scale)
    )
    b.literal("}")
    return b.finish()


@functools.lru_cache(maxsize=8)
def segment_note_dfa(vocab_size: int = 512, scale: float = 1.0) -> JsonDfa:
    """Per-segment grammar: same note shape, kept separate so segment and
    consolidation budgets can diverge later."""
    return note_dfa(vocab_size, scale)


@functools.lru_cache(maxsize=8)
def schema_dfa(vocab_size: int = 512) -> JsonDfa:
    """Standalone visual-schema generation (fallback pass, reference
    content_analyzer.py:1233)."""
    b = DfaBuilder(ByteTokenizer(vocab_size))
    b.literal('{"visual_schemas": ').loop_list(
        lambda bb: _visual_schema_item(bb, 1.0)
    ).literal("}")
    return b.finish()


@functools.lru_cache(maxsize=8)
def validator_dfa(vocab_size: int = 512) -> JsonDfa:
    """Consistency-validator scoring grammar (reference rubric 40/30/20/10,
    consistency_validator.py:141-178)."""
    b = DfaBuilder(ByteTokenizer(vocab_size))
    b.literal('{"accuracy": ').quoted_pattern([tuple(range(0x30, 0x3A))] * 2)
    b.literal(', "completeness": ').quoted_pattern([tuple(range(0x30, 0x3A))] * 2)
    b.literal(', "visualization": ').quoted_pattern([tuple(range(0x30, 0x3A))] * 2)
    b.literal(', "logic": ').quoted_pattern([tuple(range(0x30, 0x3A))] * 2)
    b.literal(', "feedback": ').free_string(5, 160).literal("}")
    return b.finish()


@functools.lru_cache(maxsize=8)
def audit_dfa(vocab_size: int = 512) -> JsonDfa:
    """Image-audit grammar (reference quality_auditor.py:303-343 parses
    评分/反馈/通过 lines; here it is structured from the start)."""
    b = DfaBuilder(ByteTokenizer(vocab_size))
    b.literal('{"score": ').quoted_pattern([tuple(range(0x30, 0x3A))] * 2)
    b.literal(', "passed": ').choice(["true", "false"])
    b.literal(', "feedback": ').free_string(5, 160).literal("}")
    return b.finish()
