"""Video decoding: ctypes bindings to the native libav decoder.

The native library (`native/video_decoder.cc`) replaces the reference's
one-ffmpeg-subprocess-per-frame decode (`HowTo100M.py:281-306`) with a
persistent demuxer/codec per clip, monotonic sweeps with keyframe seeks, and
swscale RGB conversion. ctypes releases the GIL during calls, so a Python
thread pool parallelizes across clips.

If the library is missing (not built), `VideoDecoder` raises at construction;
tests and synthetic pipelines use `SyntheticVideo` instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libgrove_video.so"),
    os.path.join(os.path.dirname(__file__), "libgrove_video.so"),
]

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            break
    else:
        # try building it
        native_dir = os.path.abspath(
            os.path.join(os.path.dirname(__file__), "..", "..", "native"))
        if os.path.exists(os.path.join(native_dir, "Makefile")):
            subprocess.run(["make", "-C", native_dir], check=False,
                           capture_output=True)
        p = os.path.join(native_dir, "libgrove_video.so")
        if not os.path.exists(p):
            raise RuntimeError("libgrove_video.so not built; run "
                               "`make -C native`")
        lib = ctypes.CDLL(p)

    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p]
    lib.vd_close.argtypes = [ctypes.c_void_p]
    lib.vd_info.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_double),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.vd_info.restype = ctypes.c_int
    lib.vd_decode_at.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_double]
    lib.vd_decode_at.restype = ctypes.c_int
    lib.vd_decode_fps.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.vd_decode_fps.restype = ctypes.c_int
    if hasattr(lib, "vd_decode_at_yuv"):
        lib.vd_decode_at_yuv.argtypes = lib.vd_decode_at.argtypes
        lib.vd_decode_at_yuv.restype = ctypes.c_int
    _lib = lib
    return lib


class VideoDecoder:
    """One decoder instance per clip (not thread-shared)."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.vd_open(path.encode())
        if not self._h:
            raise IOError(f"could not open video: {path}")
        dur = ctypes.c_double()
        fps = ctypes.c_double()
        w = ctypes.c_int()
        h = ctypes.c_int()
        self._lib.vd_info(self._h, ctypes.byref(dur), ctypes.byref(fps),
                          ctypes.byref(w), ctypes.byref(h))
        self.duration = dur.value
        self.fps = fps.value
        self.width = w.value
        self.height = h.value

    def decode_at(self, timestamps: Sequence[float],
                  out_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """Frames covering the given (ascending) timestamps -> (N, H, W, 3)."""
        ts = np.asarray(sorted(timestamps), np.float64)
        w, h = out_size if out_size else (self.width, self.height)
        out = np.zeros((len(ts), h, w, 3), np.uint8)
        n = self._lib.vd_decode_at(
            self._h, ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(ts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, 4.0)
        if n < len(ts):
            # EOF before the tail timestamps: repeat the last good frame
            # (reference pads short videos similarly, VidSTG.py:88-117)
            if n == 0:
                raise IOError("decoded zero frames")
            out[n:] = out[n - 1]
        return out

    def decode_at_yuv(self, timestamps: Sequence[float],
                      out_size: Optional[Tuple[int, int]] = None
                      ) -> np.ndarray:
        """Frames at the given timestamps as PACKED YUV420P:
        (N, 3H/2, W) uint8 — Y rows [0, H); U and V (H/2, W/2) side by
        side in rows [H, 3H/2). Skips the RGB conversion entirely (the
        stream is already 4:2:0) and ships HALF the bytes of RGB24 —
        host->device bandwidth is the e2e inference bottleneck
        (benchmarks/h2d_probe.py); the model converts + resizes
        in-graph (`GroveModel._norm_*` raw-YUV path, BT.601 limited
        range to mirror swscale's SD default)."""
        ts = np.asarray(sorted(timestamps), np.float64)
        w, h = out_size if out_size else (self.width, self.height)
        assert w % 2 == 0 and h % 2 == 0, (w, h)
        out = np.zeros((len(ts), 3 * h // 2, w), np.uint8)
        n = self._lib.vd_decode_at_yuv(
            self._h, ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            len(ts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, 4.0)
        if n < len(ts):
            if n <= 0:
                raise IOError("decoded zero frames")
            out[n:] = out[n - 1]
        return out

    def decode_fps(self, fps: float = 5.0,
                   out_size: Optional[Tuple[int, int]] = None,
                   max_frames: int = 2048) -> np.ndarray:
        """Whole-clip decode resampled at `fps` -> (N, H, W, 3)."""
        w, h = out_size if out_size else (self.width, self.height)
        out = np.zeros((max_frames, h, w, 3), np.uint8)
        n = self._lib.vd_decode_fps(
            self._h, fps, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w, h, max_frames)
        return out[:n].copy()

    def close(self):
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class SyntheticVideo:
    """Deterministic fake clip for tests/benchmarks (no file IO)."""

    def __init__(self, num_frames: int = 40, width: int = 64,
                 height: int = 48, fps: float = 5.0, seed: int = 0):
        self.fps = fps
        self.width = width
        self.height = height
        self.duration = num_frames / fps
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 255, size=(height, width, 3), dtype=np.uint8)
        self._frames = np.stack([
            np.roll(base, shift=3 * i, axis=1) for i in range(num_frames)])

    def decode_at(self, timestamps, out_size=None):
        idx = np.clip((np.asarray(timestamps) * self.fps).astype(int), 0,
                      len(self._frames) - 1)
        return self._frames[idx]

    def decode_at_yuv(self, timestamps, out_size=None):
        from .preprocess import rgb_to_yuv420
        return rgb_to_yuv420(self.decode_at(timestamps, out_size))

    def decode_fps(self, fps=5.0, out_size=None, max_frames=2048):
        step = max(int(round(self.fps / fps)), 1)
        return self._frames[::step][:max_frames]

    def close(self):
        pass
