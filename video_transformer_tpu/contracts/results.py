"""Orchestrator result records (per-video and batch).

Matches reference /root/reference/src/models.py:14-118.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

__all__ = ["ProcessResult", "BatchResult"]


@dataclass
class ProcessResult:
    """Result of processing a single video through the pipeline."""

    video_id: str
    url: str
    success: bool
    document_path: str | None = None
    blueprint_path: str | None = None
    api_calls_used: int = 0
    """Model-call budget consumed by this video (device generations count)."""
    error_message: str | None = None
    processing_time: float = 0.0
    validation_score: float = 0.0
    audit_score: float = 0.0

    def __str__(self) -> str:
        status = "✅ 成功" if self.success else "❌ 失败"
        return (
            f"{status} | {self.video_id} | "
            f"API调用: {self.api_calls_used} | "
            f"耗时: {self.processing_time:.1f}s"
        )


@dataclass
class BatchResult:
    """Aggregate result over a batch of videos."""

    total: int
    successful: int
    failed: int
    results: list[ProcessResult] = field(default_factory=list)
    total_api_calls: int = 0
    total_time: float = 0.0

    def add_result(self, result: ProcessResult) -> None:
        self.results.append(result)
        self.total_api_calls += result.api_calls_used
        self.total_time += result.processing_time

    def to_dict(self) -> dict[str, Any]:
        return {
            "total": self.total,
            "successful": self.successful,
            "failed": self.failed,
            "total_api_calls": self.total_api_calls,
            "total_time": self.total_time,
            "results": [
                {
                    "video_id": r.video_id,
                    "url": r.url,
                    "success": r.success,
                    "document_path": r.document_path,
                    "blueprint_path": r.blueprint_path,
                    "api_calls_used": r.api_calls_used,
                    "error_message": r.error_message,
                    "processing_time": r.processing_time,
                    "validation_score": r.validation_score,
                    "audit_score": r.audit_score,
                }
                for r in self.results
            ],
        }

    def __str__(self) -> str:
        success_rate = (self.successful / self.total * 100) if self.total > 0 else 0
        return (
            f"批量处理结果: {self.successful}/{self.total} 成功 "
            f"({success_rate:.1f}%) | "
            f"API调用: {self.total_api_calls} | "
            f"总耗时: {self.total_time:.1f}s"
        )
