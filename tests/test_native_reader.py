"""Native C++ frame-reader tests: build, parity with numpy path, pooling."""

import io

import numpy as np
import pytest

from video_transformer_tpu.video.containers import write_y4m
from video_transformer_tpu.video.native_reader import (
    native_available,
    y4m_decode_frames,
    y4m_meta,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native shim not buildable (no g++)"
)


def y4m_bytes(t=10, h=48, w=64, fps=10.0, seed=0):
    frames = np.random.default_rng(seed).integers(
        0, 255, (t, h, w, 3), dtype=np.uint8
    )
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        path = pathlib.Path(d) / "c.y4m"
        write_y4m(path, frames, fps=fps)
        return frames, path.read_bytes()


class TestNativeReader:
    def test_meta(self):
        _, data = y4m_bytes()
        assert y4m_meta(data) == (64, 48, 10.0)

    def test_decode_matches_python_fallback(self):
        frames, data = y4m_bytes()
        indices = np.array([0, 3, 9])
        native = y4m_decode_frames(data, indices)
        assert native is not None
        assert native.shape == (3, 48, 64, 3)

        # Python fallback on the same file.
        from video_transformer_tpu.video.containers import (
            _parse_y4m_header,
            _yuv420_to_rgb,
        )
        import tempfile, pathlib

        with tempfile.TemporaryDirectory() as d:
            path = pathlib.Path(d) / "c.y4m"
            path.write_bytes(data)
            layout = _parse_y4m_header(path)
            per_frame = 6 + layout.frame_size
            y_size = layout.width * layout.height
            c_size = y_size // 4
            for out_idx, frame_idx in enumerate(indices):
                offset = layout.header_len + int(frame_idx) * per_frame + 6
                payload = data[offset : offset + layout.frame_size]
                y = np.frombuffer(payload[:y_size], np.uint8).reshape(48, 64)
                u = np.frombuffer(
                    payload[y_size : y_size + c_size], np.uint8
                ).reshape(24, 32)
                v = np.frombuffer(payload[y_size + c_size :], np.uint8).reshape(
                    24, 32
                )
                expected = _yuv420_to_rgb(y, u, v)
                # Fixed-point vs float32: off-by-one rounding allowed.
                diff = np.abs(
                    native[out_idx].astype(int) - expected.astype(int)
                )
                assert diff.max() <= 1

    def test_pooled_decode(self):
        _, data = y4m_bytes(h=48, w=64)
        out = y4m_decode_frames(data, np.array([0, 1]), pooled=True)
        assert out is not None
        assert out.shape == (2, 24, 32, 3)

    def test_bad_index_returns_none(self):
        _, data = y4m_bytes(t=5)
        assert y4m_decode_frames(data, np.array([99])) is None

    def test_garbage_data(self):
        assert y4m_meta(b"not a y4m stream") is None
        assert y4m_decode_frames(b"junk", np.array([0])) is None

    def test_reader_integration(self, tmp_path):
        """containers.read_frames transparently uses the native path."""
        from video_transformer_tpu.video.containers import read_frames

        frames = np.random.default_rng(1).integers(
            0, 255, (20, 32, 32, 3), dtype=np.uint8
        )
        path = tmp_path / "clip.y4m"
        write_y4m(path, frames, fps=10.0)
        out = read_frames(path, num_frames=4, start=0.0, end=1.0)
        assert out.shape == (4, 32, 32, 3)
