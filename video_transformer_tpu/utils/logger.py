"""Logging setup: one named logger with file + stream handlers.

Structured ``event=`` log lines (video_start / video_complete / video_failed)
form a tested observability contract — see reference src/utils/logger.py and
the event emissions in src/pipeline.py:128,316,331.
"""

from __future__ import annotations

import logging
from pathlib import Path

__all__ = ["setup_logging", "LOGGER_NAME"]

LOGGER_NAME = "video_transformer"


def setup_logging(
    log_dir: str | Path, log_name: str = "run.log", level: int = logging.INFO
) -> logging.Logger:
    """Create (idempotently) the framework logger writing to log_dir/log_name."""
    log_path = Path(log_dir)
    log_path.mkdir(parents=True, exist_ok=True)

    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(level)
    if logger.handlers:
        return logger

    formatter = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")

    file_handler = logging.FileHandler(log_path / log_name, encoding="utf-8")
    file_handler.setFormatter(formatter)
    logger.addHandler(file_handler)

    stream_handler = logging.StreamHandler()
    stream_handler.setFormatter(formatter)
    logger.addHandler(stream_handler)

    logger.propagate = False
    return logger
