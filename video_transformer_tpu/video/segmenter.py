"""Long-video segmentation: planning, extraction, and the resume manifest.

Segments have core (effective) ranges plus ±overlap extraction ranges. The
JSON manifest — {version, video_id, created_at, segment_seconds,
overlap_seconds, segments: [{id, start, end, effective_start, effective_end,
file_path, status, attempts, error}]} — is the per-segment resume checkpoint;
the schema matches the reference (src/utils/video_segmenter.py:170-266) so
manifests interoperate.

On TPU the manifest doubles as the batch descriptor: pending segments are
decoded, padded to a fixed batch, and analyzed in one sharded forward instead
of the reference's sequential loop.
"""

from __future__ import annotations

import json
import logging
import shutil
import subprocess
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import TypedDict, cast


from .containers import probe_clip, read_frames, write_npzv

__all__ = [
    "SegmentInfo",
    "SegmentEntry",
    "SegmentManifest",
    "plan_segments",
    "extract_segment",
    "snap_to_keyframe",
    "get_segment_dir",
    "get_manifest_path",
    "create_manifest",
    "load_manifest",
    "save_manifest",
    "load_or_create_manifest",
    "pending_segments",
    "update_segment_status",
]


@dataclass(frozen=True)
class SegmentInfo:
    segment_id: int
    start: float
    end: float
    effective_start: float
    effective_end: float


class SegmentEntry(TypedDict):
    id: int
    start: float
    end: float
    effective_start: float
    effective_end: float
    file_path: str
    status: str  # pending -> processing -> completed / failed / skipped
    attempts: int
    error: str | None


class SegmentManifest(TypedDict):
    version: int
    video_id: str
    created_at: str
    segment_seconds: float
    overlap_seconds: float
    segments: list[SegmentEntry]


def plan_segments(
    duration: float, segment_seconds: float, overlap_seconds: float
) -> list[SegmentInfo]:
    """Tile [0, duration) into core ranges of segment_seconds, extracting
    ±overlap on interior boundaries."""
    if duration <= 0 or segment_seconds <= 0:
        return []

    overlap = max(0.0, overlap_seconds)
    segments: list[SegmentInfo] = []
    cursor = 0.0
    segment_id = 0

    while cursor < duration:
        core_start = cursor
        core_end = min(cursor + segment_seconds, duration)

        extract_start = 0.0 if core_start == 0 else max(0.0, core_start - overlap)
        extract_end = duration if core_end >= duration else min(duration, core_end + overlap)
        if extract_end <= extract_start:
            break

        segments.append(
            SegmentInfo(
                segment_id=segment_id,
                start=extract_start,
                end=extract_end,
                effective_start=core_start,
                effective_end=core_end,
            )
        )
        segment_id += 1
        cursor = core_end

    return segments


def extract_segment(
    input_path: str | Path,
    start: float,
    end: float,
    output_path: str | Path,
    stream_copy: bool = True,
) -> bool:
    """Materialize one segment clip on disk.

    Native containers are sliced in-process into an ``.npzv`` clip (exact,
    no re-encode); other containers use ffmpeg stream-copy with a re-encode
    fallback when available. Returns False on any failure.
    """
    duration = end - start
    if duration <= 0:
        return False

    input_path = Path(input_path)
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)

    meta = probe_clip(input_path)
    if meta is not None and meta.container in {"npzv", "y4m"}:
        try:
            fps = meta.fps if meta.fps > 0 else 30.0
            count = max(int(round(duration * fps)), 1)
            frames = read_frames(input_path, count, start=start, end=end)
            target = output_path
            if target.suffix.lower() not in {".npzv", ".npz"}:
                target = target.with_suffix(".npzv")
            write_npzv(target, frames, fps)
            if target != output_path:
                shutil.move(str(target), str(output_path))
            return output_path.exists() and output_path.stat().st_size > 0
        except (ValueError, OSError, RuntimeError):
            return False

    if shutil.which("ffmpeg") is None:
        return False
    return _ffmpeg_extract(input_path, start, duration, output_path, stream_copy)


def _ffmpeg_extract(
    input_path: Path, start: float, duration: float, output_path: Path, stream_copy: bool
) -> bool:
    def run(args: list[str]) -> bool:
        try:
            result = subprocess.run(args, capture_output=True, text=True, timeout=120)
        except (FileNotFoundError, OSError, subprocess.TimeoutExpired):
            return False
        if result.returncode != 0:
            return False
        return output_path.exists() and output_path.stat().st_size > 0

    base = [
        "ffmpeg", "-y", "-hide_banner", "-loglevel", "error",
        "-ss", f"{start:.3f}", "-i", str(input_path),
        "-t", f"{duration:.3f}", "-movflags", "+faststart",
    ]
    if stream_copy:
        if run(base + ["-c", "copy", str(output_path)]):
            return True
        if output_path.exists():
            output_path.unlink()
    return run(
        base
        + [
            "-c:v", "libx264", "-preset", "veryfast", "-crf", "23",
            "-c:a", "aac", "-b:a", "128k", str(output_path),
        ]
    )


def snap_to_keyframe(video_path: str | Path, timestamp: float) -> float:
    """Keyframe snapping hook (identity for native containers — every frame
    is independently addressable)."""
    _ = video_path
    return max(0.0, float(timestamp))


def get_segment_dir(video_id: str, temp_dir: str | Path) -> Path:
    return Path(temp_dir) / "segments" / video_id


def get_manifest_path(video_id: str, temp_dir: str | Path) -> Path:
    return get_segment_dir(video_id, temp_dir) / "manifest.json"


def create_manifest(
    *,
    video_id: str,
    duration: float,
    segment_seconds: float,
    overlap_seconds: float,
    temp_dir: str | Path,
) -> SegmentManifest:
    segment_dir = get_segment_dir(video_id, temp_dir)
    segment_dir.mkdir(parents=True, exist_ok=True)

    manifest: SegmentManifest = {
        "version": 1,
        "video_id": video_id,
        "created_at": datetime.now(timezone.utc).isoformat(),
        "segment_seconds": segment_seconds,
        "overlap_seconds": overlap_seconds,
        "segments": [
            {
                "id": seg.segment_id,
                "start": seg.start,
                "end": seg.end,
                "effective_start": seg.effective_start,
                "effective_end": seg.effective_end,
                "file_path": str(segment_dir / f"segment_{seg.segment_id:04d}.mp4"),
                "status": "pending",
                "attempts": 0,
                "error": None,
            }
            for seg in plan_segments(duration, segment_seconds, overlap_seconds)
        ],
    }
    save_manifest(get_manifest_path(video_id, temp_dir), manifest)
    return manifest


def load_manifest(manifest_path: str | Path) -> SegmentManifest:
    return cast(
        SegmentManifest, json.loads(Path(manifest_path).read_text(encoding="utf-8"))
    )


def save_manifest(manifest_path: str | Path, manifest: SegmentManifest) -> None:
    path = Path(manifest_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        json.dumps(manifest, indent=2, ensure_ascii=True), encoding="utf-8"
    )


def load_or_create_manifest(
    *,
    video_id: str,
    duration: float,
    segment_seconds: float,
    overlap_seconds: float,
    temp_dir: str | Path,
) -> SegmentManifest:
    manifest_path = get_manifest_path(video_id, temp_dir)
    if manifest_path.exists():
        return load_manifest(manifest_path)
    return create_manifest(
        video_id=video_id,
        duration=duration,
        segment_seconds=segment_seconds,
        overlap_seconds=overlap_seconds,
        temp_dir=temp_dir,
    )


def pending_segments(manifest: SegmentManifest) -> list[SegmentEntry]:
    return [s for s in manifest["segments"] if s["status"] != "completed"]


def update_segment_status(
    manifest: SegmentManifest,
    segment_id: int,
    status: str,
    *,
    error: str | None = None,
    increment_attempts: bool = False,
) -> None:
    for segment in manifest["segments"]:
        if segment["id"] == segment_id:
            segment["status"] = status
            if error is not None:
                segment["error"] = error
            if increment_attempts:
                segment["attempts"] = segment["attempts"] + 1
            return
    logging.getLogger(__name__).warning(
        "Segment id %s not found in manifest", segment_id
    )
