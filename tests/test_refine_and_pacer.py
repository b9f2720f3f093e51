"""Tests for note refinement, the inference pacer, and the downloader."""

import logging

import pytest

from video_transformer_tpu.pipeline.downloader import VideoDownloader
from video_transformer_tpu.utils.pacer import InferencePacer, RateLimitError
from video_transformer_tpu.utils.refiner import is_lecture_note, refine_note


def lecture_note(n_bullets=200, n_code_blocks=4):
    lines = ["# 长笔记", "", "## 核心概念图谱", "", "总述内容。", ""]
    lines += ["## 主题详解", "", "### 第1章：主题", ""]
    lines += [f"- 要点 {i}" for i in range(n_bullets)]
    lines += ["", "## 实战与代码", "", "### 示例 1：A", "", "代码：", "1. x = 1", ""]
    lines += ["### 示例 2：B", "", "代码：", "1. y = 2", ""]
    lines += ["## FAQ / 避坑指南", "", "常见坑：", ""]
    lines += [f"- 坑 {i}" for i in range(10)]
    lines += ["", "## 📎 附录 (Appendix)", "", "### 代码与伪代码", ""]
    for i in range(n_code_blocks):
        lines += [f"**块{i}**", "", "```python", f"print({i})", "```", ""]
    return "\n".join(lines)


class TestRefineNote:
    def test_under_budget_untouched(self):
        note = "# 短笔记\n\n正文。"
        assert refine_note(note, 3600, {"enabled": True}) == note

    def test_lecture_detection(self):
        assert is_lecture_note(lecture_note())
        assert not is_lecture_note("# 普通\n正文")

    def test_over_budget_trims(self):
        note = lecture_note(n_bullets=600)
        refined = refine_note(note, 60, {"min_lines": 100, "max_lines": 150})
        assert len(refined.splitlines()) < len(note.splitlines())
        # First example survives, second is dropped first.
        assert "### 示例 1：A" in refined
        assert "### 示例 2：B" not in refined

    def test_budget_warning_when_still_over(self):
        # Lecture note whose bulk is prose paragraphs (untouchable by the
        # trimming cascade): warning comment appended.
        note = lecture_note(n_bullets=3) + "\n" + "\n".join(
            f"第 {i} 段补充说明。" for i in range(400)
        )
        refined = refine_note(note, 60, {"min_lines": 100, "max_lines": 120})
        assert "<!-- BUDGET_EXCEEDED: actual=" in refined

    def test_legacy_over_budget_rebuilds(self):
        # Non-lecture notes over budget go through the contract rebuild.
        note = "# 旧笔记\n\n## 📝 关键结论 (Key Takeaways)\n\n- 结论\n\n" + "\n".join(
            f"#### {i}. 主题{i}\n**💡 原理解析**：\n解释。\n" for i in range(1, 200)
        )
        refined = refine_note(note, 60, {"min_lines": 100, "max_lines": 150})
        assert "## ⭐ 知识重点" in refined

    def test_bullet_cap(self):
        note = lecture_note(n_bullets=500)
        refined = refine_note(note, 60, {"min_lines": 100, "max_lines": 140})
        bullet_runs = [
            line for line in refined.splitlines() if line.startswith("- 要点")
        ]
        assert len(bullet_runs) <= 5


class TestInferencePacer:
    def test_min_interval_pacing(self):
        sleeps = []
        clock = iter([0.0, 0.0, 0.05, 0.1, 1.0, 1.0, 2.0, 2.0, 3.0]).__next__
        pacer = InferencePacer(
            min_interval=1.0, sleep=sleeps.append, clock=clock
        )
        pacer.wait_before_call()
        pacer.wait_before_call()
        assert sleeps and sleeps[0] > 0

    def test_non_rate_limit_raises_immediately(self):
        pacer = InferencePacer(sleep=lambda s: None)
        calls = []

        def boom():
            calls.append(1)
            raise ValueError("fatal")

        with pytest.raises(ValueError):
            pacer.call_with_retry(boom)
        assert len(calls) == 1

    def test_rate_limit_retries_then_succeeds(self):
        pacer = InferencePacer(max_retries=3, sleep=lambda s: None)
        attempts = []

        def flaky():
            attempts.append(1)
            if len(attempts) < 3:
                raise RateLimitError("429 slow down", retry_after=0.01)
            return "ok"

        assert pacer.call_with_retry(flaky) == "ok"
        assert len(attempts) == 3

    def test_retry_delay_extraction(self):
        exc = RuntimeError('429 {"retryDelay": "42s"}')
        assert InferencePacer.is_rate_limit_error(exc)
        assert InferencePacer.extract_retry_delay(exc) == 42.0

    def test_retry_budget_exhausted(self):
        pacer = InferencePacer(
            max_retries=5, max_total_wait=0.0, sleep=lambda s: None
        )

        def always_429():
            raise RateLimitError("429")

        with pytest.raises(RateLimitError):
            pacer.call_with_retry(always_429)


class TestDownloader:
    def config(self, tmp_path):
        return {
            "downloader": {"retry_times": 1},
            "system": {"temp_dir": str(tmp_path)},
        }

    def test_local_path_passthrough(self, tmp_path):
        clip = tmp_path / "local.npzv"
        clip.write_bytes(b"x" * 10)
        downloader = VideoDownloader(self.config(tmp_path))
        assert downloader.download_video(str(clip)) == clip

    def test_file_url_passthrough(self, tmp_path):
        clip = tmp_path / "c.y4m"
        clip.write_bytes(b"x")
        downloader = VideoDownloader(self.config(tmp_path))
        assert downloader.download_video(f"file://{clip}") == clip

    def test_missing_local_returns_none(self, tmp_path):
        downloader = VideoDownloader(self.config(tmp_path))
        assert downloader.download_video(str(tmp_path / "nope.npzv")) is None

    def test_validate_size_rules(self, tmp_path):
        downloader = VideoDownloader(self.config(tmp_path))
        small_mp4 = tmp_path / "small.mp4"
        small_mp4.write_bytes(b"x" * 1024)
        assert not downloader.validate_video(small_mp4)  # < 500KB
        native = tmp_path / "c.npzv"
        native.write_bytes(b"x")
        assert downloader.validate_video(native)

    def test_batch_from_file(self, tmp_path):
        clip = tmp_path / "a.npzv"
        clip.write_bytes(b"x")
        url_file = tmp_path / "URL.txt"
        url_file.write_text(f"# comment\n{clip}\n\n")
        downloader = VideoDownloader(self.config(tmp_path))
        assert downloader.download_from_file(url_file) == [clip]
