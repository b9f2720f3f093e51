"""Batch-level checkpoint/resume: the progress file.

JSON format {processed: [...], failed: {id: {error, timestamp}},
last_updated} — identical to the reference's resume checkpoint
(src/utils/progress_tracker.py) so existing progress files keep working.
"""

from __future__ import annotations

import json
import logging
from datetime import datetime
from pathlib import Path
from typing import Any

__all__ = ["ProgressTracker"]


class ProgressTracker:
    """Tracks processed/failed video IDs across pipeline runs."""

    def __init__(self, progress_file: str | Path, logger: logging.Logger):
        self.progress_file = Path(progress_file)
        self.logger = logger
        self.progress_file.parent.mkdir(parents=True, exist_ok=True)
        self.data = self._load()

    def _load(self) -> dict[str, Any]:
        if self.progress_file.exists():
            try:
                with open(self.progress_file, "r", encoding="utf-8") as f:
                    data = json.load(f)
                self.logger.info(
                    f"已加载进度文件: {len(data.get('processed', []))} 个已处理, "
                    f"{len(data.get('failed', {}))} 个失败"
                )
                return data
            except Exception as exc:  # corrupt file: start fresh
                self.logger.warning(f"加载进度文件失败: {exc}, 使用空进度")

        data: dict[str, Any] = {"processed": [], "failed": {}, "last_updated": None}
        try:
            data["last_updated"] = datetime.now().isoformat()
            with open(self.progress_file, "w", encoding="utf-8") as f:
                json.dump(data, f, ensure_ascii=False, indent=2)
        except Exception as exc:
            self.logger.warning(f"创建进度文件失败: {exc}")
        return data

    def _save(self) -> None:
        try:
            self.data["last_updated"] = datetime.now().isoformat()
            with open(self.progress_file, "w", encoding="utf-8") as f:
                json.dump(self.data, f, ensure_ascii=False, indent=2)
            self.logger.debug(f"进度已保存到 {self.progress_file}")
        except Exception as exc:
            self.logger.error(f"保存进度失败: {exc}")

    def is_processed(self, video_id: str) -> bool:
        return video_id in self.data["processed"]

    def is_failed(self, video_id: str) -> bool:
        return video_id in self.data["failed"]

    def mark_processed(self, video_id: str) -> None:
        if video_id not in self.data["processed"]:
            self.data["processed"].append(video_id)
            self.data["failed"].pop(video_id, None)
            self._save()
            self.logger.info(f"已标记 {video_id} 为处理完成")

    def mark_failed(self, video_id: str, error_message: str) -> None:
        self.data["failed"][video_id] = {
            "error": error_message,
            "timestamp": datetime.now().isoformat(),
        }
        self._save()
        self.logger.warning(f"已标记 {video_id} 为处理失败: {error_message}")

    def get_failed_videos(self) -> dict[str, dict[str, str]]:
        return self.data["failed"]

    def filter_unprocessed(self, video_ids: list[str]) -> list[str]:
        unprocessed = [vid for vid in video_ids if not self.is_processed(vid)]
        if len(unprocessed) < len(video_ids):
            skipped = len(video_ids) - len(unprocessed)
            self.logger.info(f"跳过 {skipped} 个已处理视频")
        return unprocessed

    def reset(self) -> None:
        self.data = {"processed": [], "failed": {}, "last_updated": None}
        self._save()
        self.logger.info("进度已重置")

    def get_statistics(self) -> dict[str, int]:
        return {
            "processed_count": len(self.data["processed"]),
            "failed_count": len(self.data["failed"]),
        }
