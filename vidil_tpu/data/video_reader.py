"""Random-access video decoding on the host.

Decord-equivalent reader (reference uses decord.VideoReader with
``get_batch(indices)`` and optional decode-time resize;
run_video_CapFilt.py:38-45, data/video_pretrain_dataset.py) built on
OpenCV's FFmpeg backend — the C++ decode path available in this image.

The reader decodes sequentially between requested indices (cheaper than
repeated seeks for the near-sorted index lists the samplers produce) and
returns HWC RGB uint8 numpy arrays.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


class VideoReader:
    """Random-access frame reader with decord-like semantics."""

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

    def release(self) -> None:
        self._cap.release()

    def __del__(self):
        try:
            self._cap.release()
        except Exception:
            pass
