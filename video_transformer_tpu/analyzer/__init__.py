"""Analysis engine: the on-device replacement for the reference's cloud LLM.

Public surface mirrors the reference (src/analyzer/__init__.py):
ContentAnalyzer, AnalysisResult, KnowledgeDocument.
"""

from ..contracts import AnalysisResult, KnowledgeDocument
from .content_analyzer import ContentAnalyzer

__all__ = ["ContentAnalyzer", "AnalysisResult", "KnowledgeDocument"]
