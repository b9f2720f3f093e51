"""Segment/budget planning for long-video analysis.

Given a video duration and a model-call budget, choose a segment length,
overlap, and segment count whose estimated call cost (1 analysis call per
segment + continuations + a consolidation pass + retry buffer) fits the
remaining budget. Degrades by dropping overlap first, then growing segment
length. Numeric behavior matches reference src/utils/budget_planner.py so the
planning tests carry over; on TPU the planned segments become one sharded
batch rather than a sequential loop.
"""

from __future__ import annotations

import math
from collections.abc import Mapping
from dataclasses import dataclass
from typing import Any

__all__ = ["SegmentPlan", "plan_segments_with_budget"]


@dataclass(frozen=True)
class SegmentPlan:
    segment_duration: int
    overlap: int
    num_segments: int
    estimated_calls: int
    available_calls: int
    hard_max_calls: int
    fits_budget: bool

    @property
    def empty(self) -> bool:
        return self.num_segments == 0


def _to_int(value: Any, default: int) -> int:
    if isinstance(value, (int, float, str)):
        try:
            return int(value)
        except ValueError:
            return default
    return default


def _to_bool(value: Any, default: bool) -> bool:
    if isinstance(value, bool):
        return value
    if isinstance(value, (int, float)):
        return bool(value)
    if isinstance(value, str):
        lowered = value.strip().lower()
        if lowered in {"true", "1", "yes", "y", "on"}:
            return True
        if lowered in {"false", "0", "no", "n", "off"}:
            return False
    return default


def _count_segments(duration: float, segment_duration: int, overlap: int) -> int:
    """Number of overlapping segments covering the duration."""
    if duration <= 0:
        return 0
    segment_duration = max(segment_duration, 1)
    overlap = max(min(overlap, segment_duration - 1), 0)
    if duration <= segment_duration:
        return 1
    stride = max(segment_duration - overlap, 1)
    return int(math.ceil((duration - segment_duration) / stride)) + 1


def _estimate_calls(
    num_segments: int, max_continuations: int, retry_buffer: int, extra_calls: int
) -> int:
    """Worst-case call count: per-segment analysis + continuations, one
    schema/merge call, optional consolidation, plus retry headroom."""
    if num_segments <= 0:
        return 0
    return (
        num_segments
        + 1
        + extra_calls
        + num_segments * max_continuations
        + retry_buffer
    )


def _unfit(available: int, hard_max: int) -> SegmentPlan:
    return SegmentPlan(
        segment_duration=0,
        overlap=0,
        num_segments=0,
        estimated_calls=0,
        available_calls=available,
        hard_max_calls=hard_max,
        fits_budget=False,
    )


def plan_segments_with_budget(
    duration: float,
    config: Mapping[str, Any],
    current_api_count: int,
) -> SegmentPlan:
    """Plan segmentation for ``duration`` seconds within the call budget."""
    analyzer_cfg = config.get("analyzer")
    analyzer_cfg = analyzer_cfg if isinstance(analyzer_cfg, dict) else {}
    lv_cfg = analyzer_cfg.get("long_video")
    lv_cfg = lv_cfg if isinstance(lv_cfg, dict) else {}

    default_segment = _to_int(lv_cfg.get("default_segment_seconds"), 480)
    overlap = _to_int(lv_cfg.get("overlap_seconds"), 20)
    min_segment = _to_int(lv_cfg.get("min_segment_seconds"), 90)
    hard_max_calls = _to_int(lv_cfg.get("hard_max_api_calls"), 50)
    max_continuations = _to_int(analyzer_cfg.get("max_continuations"), 3)
    retry_buffer = _to_int(analyzer_cfg.get("retry_times"), 0)
    duration_threshold = lv_cfg.get("duration_threshold_seconds")
    consolidate = _to_bool(lv_cfg.get("consolidate"), True)
    extra_calls = 1 if consolidate else 0

    duration = max(float(duration), 0.0)
    available = max(hard_max_calls - int(current_api_count), 0)
    if duration <= 0 or available == 0:
        return _unfit(available, hard_max_calls)

    threshold: float | None = None
    if isinstance(duration_threshold, (int, float, str)):
        try:
            threshold = float(duration_threshold)
        except ValueError:
            threshold = None

    if threshold is not None and duration < threshold:
        # Below the threshold: one segment spanning the whole video.
        segment_duration = max(int(math.ceil(duration)), 1)
        overlap = 0
    else:
        segment_duration = max(default_segment, min_segment, 1)
        overlap = max(min(overlap, segment_duration - 1), 0)

    num_segments = _count_segments(duration, segment_duration, overlap)
    estimated = _estimate_calls(num_segments, max_continuations, retry_buffer, extra_calls)

    # Degradation step 1: drop overlap.
    if estimated > available:
        overlap = 0
        num_segments = _count_segments(duration, segment_duration, overlap)
        estimated = _estimate_calls(
            num_segments, max_continuations, retry_buffer, extra_calls
        )

    # Degradation step 2: grow segment length until the call count fits.
    if estimated > available and available > 0:
        per_segment = 1 + max_continuations
        overhead = 1 + extra_calls + retry_buffer
        max_segments = (available - overhead) // per_segment
        if max_segments < 1:
            return _unfit(available, hard_max_calls)

        max_segments = max(int(max_segments), 1)
        segment_duration = max(int(math.ceil(duration / max_segments)), min_segment, 1)
        num_segments = _count_segments(duration, segment_duration, overlap)
        estimated = _estimate_calls(
            num_segments, max_continuations, retry_buffer, extra_calls
        )

        while estimated > available and max_segments > 1:
            max_segments -= 1
            segment_duration = max(
                int(math.ceil(duration / max_segments)), min_segment, 1
            )
            num_segments = _count_segments(duration, segment_duration, overlap)
            estimated = _estimate_calls(
                num_segments, max_continuations, retry_buffer, extra_calls
            )

        if estimated > available:
            return _unfit(available, hard_max_calls)

    return SegmentPlan(
        segment_duration=segment_duration,
        overlap=overlap,
        num_segments=num_segments,
        estimated_calls=estimated,
        available_calls=available,
        hard_max_calls=hard_max_calls,
        fits_budget=estimated <= available,
    )
