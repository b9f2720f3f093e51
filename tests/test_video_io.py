"""Tests for native video containers, probing, and segmentation."""

import numpy as np
import pytest

from video_transformer_tpu.video import (
    create_manifest,
    extract_segment,
    load_or_create_manifest,
    pending_segments,
    plan_segments,
    probe_duration,
    update_segment_status,
)
from video_transformer_tpu.video.containers import (
    probe_clip,
    read_frames,
    write_npzv,
    write_y4m,
)


def synth_frames(t=30, h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8)


class TestContainers:
    def test_npzv_roundtrip(self, tmp_path):
        frames = synth_frames()
        path = tmp_path / "clip.npzv"
        write_npzv(path, frames, fps=10.0)
        meta = probe_clip(path)
        assert meta is not None
        assert meta.num_frames == 30
        assert meta.fps == 10.0
        assert meta.duration == pytest.approx(3.0)
        out = read_frames(path, num_frames=30)
        np.testing.assert_array_equal(out, frames)

    def test_y4m_roundtrip_approximate(self, tmp_path):
        frames = synth_frames()
        path = tmp_path / "clip.y4m"
        write_y4m(path, frames, fps=10.0)
        meta = probe_clip(path)
        assert meta is not None
        assert meta.num_frames == 30
        assert meta.width == 48 and meta.height == 32
        out = read_frames(path, num_frames=30)
        assert out.shape == (30, 32, 48, 3)
        # YUV 4:2:0 is lossy; luma-dominant content should still be close.
        err = np.abs(out.astype(int) - frames.astype(int)).mean()
        assert err < 60  # random chroma is worst case for 4:2:0

    def test_time_range_sampling(self, tmp_path):
        # 30 frames at 10 fps = 3s. Sampling [1.0, 2.0) must hit frames 10..19.
        frames = np.arange(30, dtype=np.uint8)[:, None, None, None]
        frames = np.broadcast_to(frames, (30, 8, 8, 3)).copy()
        path = tmp_path / "c.npzv"
        write_npzv(path, frames, fps=10.0)
        out = read_frames(path, num_frames=4, start=1.0, end=2.0)
        vals = out[:, 0, 0, 0].tolist()
        assert all(10 <= v < 20 for v in vals)
        assert vals == sorted(vals)

    def test_static_shape_for_short_clip(self, tmp_path):
        frames = synth_frames(t=3)
        path = tmp_path / "c.npzv"
        write_npzv(path, frames, fps=10.0)
        out = read_frames(path, num_frames=8)
        assert out.shape[0] == 8  # frames repeat; shape stays static

    def test_probe_duration_fallback(self, tmp_path):
        assert probe_duration(tmp_path / "missing.mp4") == 0.0
        bad = tmp_path / "bad.y4m"
        bad.write_bytes(b"garbage")
        assert probe_duration(bad) == 0.0


class TestSegmentPlanning:
    def test_plan_basic(self):
        segs = plan_segments(1000, 480, 20)
        assert len(segs) == 3
        assert segs[0].effective_start == 0
        assert segs[0].start == 0
        assert segs[1].start == 460  # 480 - 20 overlap
        assert segs[-1].effective_end == 1000
        assert segs[-1].end == 1000

    def test_plan_short(self):
        segs = plan_segments(100, 480, 20)
        assert len(segs) == 1
        assert segs[0].end == 100

    def test_plan_invalid(self):
        assert plan_segments(0, 480, 20) == []
        assert plan_segments(100, 0, 20) == []


class TestManifest:
    def test_create_and_resume(self, tmp_path):
        manifest = create_manifest(
            video_id="vid",
            duration=1000,
            segment_seconds=480,
            overlap_seconds=20,
            temp_dir=tmp_path,
        )
        assert manifest["version"] == 1
        assert len(manifest["segments"]) == 3
        assert all(s["status"] == "pending" for s in manifest["segments"])

        update_segment_status(manifest, 0, "completed")
        from video_transformer_tpu.video import get_manifest_path, save_manifest

        save_manifest(get_manifest_path("vid", tmp_path), manifest)

        reloaded = load_or_create_manifest(
            video_id="vid",
            duration=1000,
            segment_seconds=480,
            overlap_seconds=20,
            temp_dir=tmp_path,
        )
        assert reloaded["segments"][0]["status"] == "completed"
        assert [s["id"] for s in pending_segments(reloaded)] == [1, 2]

    def test_status_lifecycle(self, tmp_path):
        manifest = create_manifest(
            video_id="v2",
            duration=500,
            segment_seconds=480,
            overlap_seconds=0,
            temp_dir=tmp_path,
        )
        update_segment_status(
            manifest, 0, "failed", error="boom", increment_attempts=True
        )
        seg = manifest["segments"][0]
        assert seg["status"] == "failed"
        assert seg["error"] == "boom"
        assert seg["attempts"] == 1

    def test_unknown_segment_id_warns(self, tmp_path, caplog):
        manifest = create_manifest(
            video_id="v3",
            duration=100,
            segment_seconds=480,
            overlap_seconds=0,
            temp_dir=tmp_path,
        )
        update_segment_status(manifest, 99, "completed")  # no raise


class TestExtractSegment:
    def test_native_extraction(self, tmp_path):
        frames = synth_frames(t=60)  # 6s at 10fps
        src = tmp_path / "src.npzv"
        write_npzv(src, frames, fps=10.0)
        out = tmp_path / "seg.npzv"
        assert extract_segment(src, 2.0, 4.0, out)
        meta = probe_clip(out)
        assert meta is not None
        assert meta.duration == pytest.approx(2.0, abs=0.2)

    def test_invalid_range(self, tmp_path):
        src = tmp_path / "src.npzv"
        write_npzv(src, synth_frames(), fps=10.0)
        assert not extract_segment(src, 5.0, 5.0, tmp_path / "o.npzv")
