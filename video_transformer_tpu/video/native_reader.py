"""ctypes binding for the native frame-decode shim (native/framereader.cpp).

Auto-builds ``libframereader.so`` with g++ on first use (cached); any build
or load failure falls back silently to the numpy decoder in containers.py —
the native path is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["native_available", "y4m_decode_frames", "y4m_meta"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libframereader.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> bool:
    source = _NATIVE_DIR / "framereader.cpp"
    if not source.exists():
        return False
    try:
        result = subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
                "-o", str(_LIB_PATH), str(source),
            ],
            capture_output=True,
            timeout=120,
        )
        return result.returncode == 0 and _LIB_PATH.exists()
    except (OSError, subprocess.TimeoutExpired):
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _LIB_PATH.exists() and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            _load_failed = True
            return None
        lib.y4m_parse_header.restype = ctypes.c_int
        lib.y4m_parse_header.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.y4m_decode_frames.restype = ctypes.c_int
        lib.y4m_decode_frames.argtypes = [
            # Input stream as a read-only uint8 view: accepts bytes AND
            # mmap-backed buffers (no whole-file copy into a bytes object).
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ]
        lib.y4m_decode_frames_pooled.restype = ctypes.c_int
        lib.y4m_decode_frames_pooled.argtypes = lib.y4m_decode_frames.argtypes
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def y4m_meta(data) -> tuple[int, int, float] | None:
    """(width, height, fps) from a Y4M buffer (bytes/mmap/view), or None."""
    lib = _load()
    if lib is None:
        return None
    # The header is tiny; a bytes copy of the first 4 KiB keeps the
    # c_char_p ABI while the frame payload stays zero-copy.
    head = bytes(memoryview(data)[:4096])
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    num = ctypes.c_int32()
    den = ctypes.c_int32()
    header = lib.y4m_parse_header(
        head, len(head), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(num), ctypes.byref(den),
    )
    if header < 0:
        return None
    return w.value, h.value, num.value / max(den.value, 1)


def y4m_decode_frames(
    data, indices: np.ndarray, pooled: bool = False
) -> np.ndarray | None:
    """Decode selected frames to RGB uint8; None when native path unusable.

    ``data`` is any buffer over the Y4M stream — bytes or an mmap view
    (the zero-copy path: only the pages of the selected frames are ever
    faulted in). pooled=True additionally 2x2-average-pools in the same
    pass (half resolution, 4x fewer host->device bytes).
    """
    lib = _load()
    if lib is None:
        return None
    meta = y4m_meta(data)
    if meta is None:
        return None
    width, height, _ = meta
    if pooled and (width % 2 or height % 2):
        pooled = False
    out_w, out_h = (width // 2, height // 2) if pooled else (width, height)

    buf = np.frombuffer(data, dtype=np.uint8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    out = np.empty((len(indices), out_h, out_w, 3), dtype=np.uint8)
    fn = lib.y4m_decode_frames_pooled if pooled else lib.y4m_decode_frames
    written = fn(buf, len(buf), indices, len(indices), out)
    if written != len(indices):
        return None
    return out
