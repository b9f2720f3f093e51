"""Output-contract layer: pure-Python data model and renderers.

This package defines the JSON/Markdown contracts that the whole framework is
built around. It is deliberately free of JAX so it can be unit-tested anywhere.

Reference parity: /root/reference/src/analyzer/models.py and
/root/reference/src/analyzer/validators.py define the byte-level contract this
package reproduces (headings, orderings, normalization semantics).
"""

from .knowledge import AnalysisResult, KnowledgeDocument, VisualSchemaItem
from .results import BatchResult, ProcessResult
from .validators import (
    detect_stub_output,
    validate_knowledge_document,
    validate_markdown_structure,
)

__all__ = [
    "AnalysisResult",
    "KnowledgeDocument",
    "VisualSchemaItem",
    "ProcessResult",
    "BatchResult",
    "detect_stub_output",
    "validate_knowledge_document",
    "validate_markdown_structure",
]
