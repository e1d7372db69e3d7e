"""Random-access video decoding on the host.

Decord-equivalent readers (reference uses decord.VideoReader with
``get_batch(indices)`` and optional decode-time resize;
run_video_CapFilt.py:38-45, data/video_pretrain_dataset.py):

* ``NativeVideoReader`` — the framework's own C++ FFmpeg decoder
  (native/video_decode.cpp, demux + decode + swscale bicubic resize)
  loaded via ctypes; used automatically when the built .so exists.
* ``Cv2VideoReader`` — OpenCV/FFmpeg fallback.

Both decode sequentially between requested indices (cheaper than repeated
seeks for the near-sorted index lists the samplers produce) and return
HWC RGB uint8 numpy arrays.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

_NATIVE_SO = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "build", "libvidil_decode.so")
_native_lib = None


def _load_native():
    global _native_lib
    if _native_lib is not None:
        return _native_lib
    if not os.path.exists(_NATIVE_SO) or os.environ.get("VIDIL_NO_NATIVE_DECODE"):
        _native_lib = False
        return False
    try:
        lib = ctypes.CDLL(_NATIVE_SO)
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [ctypes.c_char_p]
        lib.vd_len.restype = ctypes.c_long
        lib.vd_len.argtypes = [ctypes.c_void_p]
        lib.vd_fps.restype = ctypes.c_double
        lib.vd_fps.argtypes = [ctypes.c_void_p]
        lib.vd_get_batch.restype = ctypes.c_int
        lib.vd_get_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        try:
            lib.vd_get_batch_yuv.restype = ctypes.c_int
            lib.vd_get_batch_yuv.argtypes = lib.vd_get_batch.argtypes
        except AttributeError:  # pragma: no cover - stale .so without YUV
            pass
        _native_lib = lib
    except Exception:  # pragma: no cover
        _native_lib = False
    return _native_lib


class NativeVideoReader:
    """ctypes wrapper over native/video_decode.cpp."""

    def __init__(self, path: str, width: int | None = None, height: int | None = None):
        lib = _load_native()
        if not lib:
            raise RuntimeError("native decode library not built (tools/build_native.sh)")
        self._lib = lib
        self._h = lib.vd_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")
        self._len = int(lib.vd_len(self._h))
        self._width = width or 0
        self._height = height or 0

    def __len__(self) -> int:
        return self._len

    @property
    def fps(self) -> float:
        return float(self._lib.vd_fps(self._h))

    def get_batch(self, indices) -> np.ndarray:
        idx = np.clip(np.asarray(list(indices), np.int64), 0, self._len - 1)
        n = len(idx)
        natw = ctypes.c_int()
        nath = ctypes.c_int()
        if self._width and self._height:
            w, h = self._width, self._height
        else:
            # probe native resolution with a zero-frame call
            self._lib.vd_get_batch(self._h, (ctypes.c_long * 0)(), 0, 0, 0,
                                   (ctypes.c_uint8 * 0)(), ctypes.byref(natw), ctypes.byref(nath))
            w, h = natw.value, nath.value
        out = np.empty((n, h, w, 3), np.uint8)
        c_idx = (ctypes.c_long * n)(*idx.tolist())
        ret = self._lib.vd_get_batch(
            self._h, c_idx, n, w if (self._width and self._height) else 0,
            h if (self._width and self._height) else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(natw), ctypes.byref(nath))
        if ret != 0:
            raise IOError(f"native decode failed ({ret})")
        return out

    def get_batch_yuv(self, indices):
        """Decode + scale directly to planar full-range BT.601 YUV420
        (half the bytes of RGB24; convert on device with
        ops.image.yuv420_to_rgb). Requires decode-time width/height (even).
        Returns a YUV420Frames of numpy planes."""
        from vidil_tpu.ops.image import YUV420Frames

        if not (self._width and self._height) or (self._width & 1) or (self._height & 1):
            raise ValueError("get_batch_yuv needs even decode-time width/height")
        if not hasattr(self._lib, "vd_get_batch_yuv"):
            raise RuntimeError("native library built without vd_get_batch_yuv; rebuild")
        idx = np.clip(np.asarray(list(indices), np.int64), 0, self._len - 1)
        n = len(idx)
        w, h = self._width, self._height
        buf = np.empty((n, h * w * 3 // 2), np.uint8)
        natw = ctypes.c_int()
        nath = ctypes.c_int()
        c_idx = (ctypes.c_long * n)(*idx.tolist())
        ret = self._lib.vd_get_batch_yuv(
            self._h, c_idx, n, w, h,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(natw), ctypes.byref(nath))
        if ret != 0:
            raise IOError(f"native YUV decode failed ({ret})")
        y = buf[:, : h * w].reshape(n, h, w)
        u = buf[:, h * w : h * w + (h // 2) * (w // 2)].reshape(n, h // 2, w // 2)
        v = buf[:, h * w + (h // 2) * (w // 2) :].reshape(n, h // 2, w // 2)
        return YUV420Frames(y.copy(), u.copy(), v.copy())

    def release(self) -> None:
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


class Cv2VideoReader:
    """OpenCV-backed random-access frame reader with decord-like semantics."""

    def __init__(self, path: str, width: int | None = None, height: int | None = None):
        if not _HAS_CV2:
            raise RuntimeError("OpenCV not available; install opencv-python for video decode")
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise IOError(f"cannot open video: {path}")
        self._path = path
        self._width = width
        self._height = height
        self._len = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if self._len <= 0:
            # some containers misreport; count by scanning
            self._len = self._count_frames()
        self._next_idx = 0

    def _count_frames(self) -> int:
        n = 0
        cap = cv2.VideoCapture(self._path)
        while True:
            ok = cap.grab()
            if not ok:
                break
            n += 1
        cap.release()
        return n

    def __len__(self) -> int:
        return self._len

    @property
    def fps(self) -> float:
        return float(self._cap.get(cv2.CAP_PROP_FPS))

    def _read_at(self, idx: int):
        if idx < self._next_idx:
            # backward seek
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
            self._next_idx = idx
        # skip forward sequentially (fast path for sorted indices)
        while self._next_idx < idx:
            self._cap.grab()
            self._next_idx += 1
        ok, frame = self._cap.read()
        if not ok:
            raise IOError(f"failed to decode frame {idx} of {self._path}")
        self._next_idx = idx + 1
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if self._width and self._height:
            frame = cv2.resize(frame, (self._width, self._height), interpolation=cv2.INTER_CUBIC)
        return frame

    def get_batch(self, indices) -> np.ndarray:
        """(len(indices), H, W, 3) RGB uint8."""
        indices = [int(i) for i in indices]
        frames = {}
        for i in sorted(set(np.clip(indices, 0, self._len - 1))):
            frames[i] = self._read_at(i)
        out = [frames[int(np.clip(i, 0, self._len - 1))] for i in indices]
        return np.stack(out)

    def get_batch_yuv(self, indices):
        """Fallback YUV420 path: decode RGB then convert on the host
        (the native reader scales directly in YUV and skips the roundtrip)."""
        from vidil_tpu.ops.image import rgb_to_yuv420

        return rgb_to_yuv420(self.get_batch(indices))

    def release(self) -> None:
        self._cap.release()

    def __del__(self):
        try:
            self._cap.release()
        except Exception:
            pass


def VideoReader(path: str, width: int | None = None, height: int | None = None):
    """Factory: the native FFmpeg reader when built, else the cv2 fallback."""
    if _load_native():
        try:
            return NativeVideoReader(path, width=width, height=height)
        except Exception:
            pass
    return Cv2VideoReader(path, width=width, height=height)
