"""Watch-folder service tests (stubbed pipeline)."""

import logging
from dataclasses import dataclass

import numpy as np

from video_transformer_tpu.contracts import ProcessResult
from video_transformer_tpu.pipeline.service import WatchService
from video_transformer_tpu.video.containers import write_npzv


@dataclass
class StubPipeline:
    fail_ids: tuple = ()

    def __post_init__(self):
        self.processed = []
        self.tracker = None

    def process_single_video(self, url):
        from pathlib import Path

        video_id = Path(url).stem
        self.processed.append(video_id)
        success = video_id not in self.fail_ids
        if self.tracker is not None and success:
            self.tracker.mark_processed(video_id)
        return ProcessResult(
            video_id=video_id, url=url, success=success,
            error_message=None if success else "boom",
        )


def make_service(tmp_path, pipeline):
    config = {"system": {"temp_dir": str(tmp_path / "temp"), "max_api_calls": 20}}
    logger = logging.getLogger("svc_test")
    service = WatchService(
        config, logger, tmp_path / "input", poll_interval=0.01, pipeline=pipeline
    )
    pipeline.tracker = service.tracker
    return service


def drop_clip(tmp_path, name, mtime=None):
    path = tmp_path / "input" / name
    path.parent.mkdir(parents=True, exist_ok=True)
    write_npzv(path, np.zeros((4, 8, 8, 3), np.uint8), fps=2.0)
    if mtime is not None:
        import os

        os.utime(path, (mtime, mtime))
    return path


class TestWatchService:
    def test_processes_new_videos_once(self, tmp_path):
        pipeline = StubPipeline()
        service = make_service(tmp_path, pipeline)
        drop_clip(tmp_path, "a.npzv", mtime=100)
        drop_clip(tmp_path, "b.npzv", mtime=200)

        processed = service.run(once=True)
        assert processed == 2
        assert pipeline.processed == ["a", "b"]  # mtime order

        # Second scan: nothing new.
        processed = service.run(once=True)
        assert processed == 0
        assert pipeline.processed == ["a", "b"]

    def test_new_arrival_picked_up(self, tmp_path):
        pipeline = StubPipeline()
        service = make_service(tmp_path, pipeline)
        drop_clip(tmp_path, "a.npzv")
        service.run(once=True)
        drop_clip(tmp_path, "c.npzv")
        service.run(once=True)
        assert pipeline.processed == ["a", "c"]

    def test_failures_not_marked_processed(self, tmp_path):
        pipeline = StubPipeline(fail_ids=("bad",))
        service = make_service(tmp_path, pipeline)
        drop_clip(tmp_path, "bad.npzv")
        processed = service.run(once=True)
        assert processed == 0
        assert not service.tracker.is_processed("bad")

    def test_non_video_files_ignored(self, tmp_path):
        pipeline = StubPipeline()
        service = make_service(tmp_path, pipeline)
        (tmp_path / "input").mkdir(parents=True, exist_ok=True)
        (tmp_path / "input" / "notes.txt").write_text("x")
        assert service.scan() == []

    def test_stop_flag(self, tmp_path):
        pipeline = StubPipeline()
        service = make_service(tmp_path, pipeline)
        service.stop()
        assert service.run() == 0  # returns immediately
