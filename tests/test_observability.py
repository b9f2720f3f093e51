"""Structured-logging and tracing contract tests.

Mirrors reference tests/test_structured_logging.py: the event= log lines
(video_start / video_complete / video_failed with video_id and elapsed_s
fields) are a tested observability contract.
"""

import logging
import re

import numpy as np
import pytest

from video_transformer_tpu.utils.tracing import Tracer


def test_pipeline_event_log_contract(tmp_path, monkeypatch, caplog):
    from tests.test_pipeline import (
        StubAnalyzer,
        StubAuditor,
        StubValidator,
        build_pipeline,
    )
    from video_transformer_tpu.video.containers import write_npzv

    clip = tmp_path / "vid.npzv"
    write_npzv(clip, np.zeros((8, 16, 16, 3), np.uint8), fps=4.0)

    pipeline, _ = build_pipeline(
        tmp_path, monkeypatch,
        validator=StubValidator([90]), auditor=StubAuditor(90),
    )
    with caplog.at_level(logging.INFO, logger="test_pipeline"):
        pipeline.process_single_video(str(clip))

    text = "\n".join(r.getMessage() for r in caplog.records)
    start = re.search(r"event=video_start video_id=(\S+)", text)
    complete = re.search(
        r"event=video_complete video_id=(\S+) elapsed_s=([\d.]+)", text
    )
    assert start and start.group(1) == "vid"
    assert complete and complete.group(1) == "vid"
    assert float(complete.group(2)) >= 0


def test_pipeline_failure_event(tmp_path, monkeypatch, caplog):
    from tests.test_pipeline import StubAnalyzer, build_pipeline
    from video_transformer_tpu.video.containers import write_npzv

    clip = tmp_path / "vid.npzv"
    write_npzv(clip, np.zeros((8, 16, 16, 3), np.uint8), fps=4.0)
    pipeline, _ = build_pipeline(
        tmp_path, monkeypatch, analyzer=StubAnalyzer(fail=True)
    )
    with caplog.at_level(logging.INFO, logger="test_pipeline"):
        pipeline.process_single_video(str(clip))
    text = "\n".join(r.getMessage() for r in caplog.records)
    assert re.search(r"event=video_failed video_id=vid elapsed_s=[\d.]+", text)


class TestTracer:
    def test_span_accumulation(self):
        tracer = Tracer(logging.getLogger("trace_test"))
        with tracer.span("phase_a"):
            pass
        with tracer.span("phase_a"):
            pass
        with tracer.span("phase_b", batch=4):
            pass
        summary = tracer.summary()
        assert summary["phase_a"]["count"] == 2
        assert summary["phase_b"]["count"] == 1
        assert summary["phase_a"]["total_s"] >= 0

    def test_span_logs_debug_line(self, caplog):
        tracer = Tracer(logging.getLogger("trace_test2"))
        with caplog.at_level(logging.DEBUG, logger="trace_test2"):
            with tracer.span("decode", tokens=128):
                pass
        assert any(
            "event=span name=decode" in r.getMessage() and "tokens=128" in r.getMessage()
            for r in caplog.records
        )

    def test_reset(self):
        tracer = Tracer()
        with tracer.span("x"):
            pass
        tracer.reset()
        assert tracer.summary() == {}

    def test_span_survives_exception(self):
        tracer = Tracer()
        with pytest.raises(ValueError):
            with tracer.span("boom"):
                raise ValueError("x")
        assert tracer.summary()["boom"]["count"] == 1


def test_add_p_params():
    from video_transformer_tpu.tools.add_p_params import add_part_numbers

    lines = [
        "https://www.bilibili.com/video/BV1",
        "# comment",
        "",
        "https://www.bilibili.com/video/BV1?t=5",
        "https://www.bilibili.com/video/BV1?p=9",
    ]
    out = add_part_numbers(lines)
    assert out[0].endswith("?p=1")
    assert out[1] == "# comment"
    assert out[3].endswith("&p=4")  # line-number semantics
    assert out[4].endswith("p=9")  # untouched
