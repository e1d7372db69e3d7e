"""Host decode-path benchmark: native FFmpeg reader vs cv2 fallback.

VERDICT r3 #5: the chip sustains ~167 frames/s through CapFilt
(BENCH_r03), uploads are threaded — the next real-pipeline bottleneck is
whether the 1-core host can DECODE that fast. This measures the
pipeline's actual read pattern (`load_video_frames`: open, sample
num_frm=4 indices, `get_batch`, close — reference decord pattern:
data/video_pretrain_dataset.py:132-216) for both reader backends, with
and without decode-time resize, across ThreadPool widths.

Reports videos/s and delivered frames/s per configuration; the chip
needs >= ~42 videos/s (167 f/s / 4 frames) from the feed path.

Run on the host:  python tools/bench_decode.py
Env: N_VIDEOS (default 24), FRAMES (per video, default 120), RES
(default 640x480).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.data import video_reader as VR
from vidil_tpu.data.sampling import load_video_frames
from vidil_tpu.utils.bench_artifact import emit

N_VIDEOS = int(os.environ.get("N_VIDEOS", "24"))
FRAMES = int(os.environ.get("FRAMES", "120"))
RES = os.environ.get("RES", "640x480")
NUM_FRM = 4


def make_videos(root: str, w: int, h: int) -> list[str]:
    import cv2

    paths = []
    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    for vi in range(N_VIDEOS):
        p = os.path.join(root, f"v{vi}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
        for i in range(FRAMES):
            # moving content so inter-frame prediction stays realistic-ish
            wr.write(np.roll(base, (i * 3 + vi) % h, axis=0))
        wr.release()
        paths.append(p)
    return paths


def bench(paths, reader_name: str, workers: int, resize: bool):
    def one(p):
        f = load_video_frames(p, "uniform", NUM_FRM,
                              height=384 if resize else None,
                              width=384 if resize else None)
        assert f is not None and f.shape[0] == NUM_FRM
        return f.shape

    # warm the page cache so the measurement is decode, not disk
    for p in paths:
        open(p, "rb").read()
    t0 = time.perf_counter()
    if workers == 1:
        for p in paths:
            one(p)
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(one, paths))
    dt = time.perf_counter() - t0
    return {
        "reader": reader_name, "workers": workers,
        "decode_resize_384": resize, "videos": len(paths),
        "src_res": RES, "src_frames": FRAMES, "num_frm": NUM_FRM,
        "videos_per_s": round(len(paths) / dt, 2),
        "frames_per_s": round(len(paths) * NUM_FRM / dt, 2),
        "chip_feed_target_videos_per_s": 42,
        # native decoder revision: rows without this key predate the
        # forward keyframe-seek (sequential roll-forward decode)
        "native_fwd_seek": True,
    }


def main():
    w, h = (int(x) for x in RES.split("x"))
    native_available = bool(VR._load_native())
    print(f"# native decoder available: {native_available}", flush=True)
    with tempfile.TemporaryDirectory() as td:
        paths = make_videos(td, w, h)
        for reader in (["native", "cv2"] if native_available else ["cv2"]):
            if reader == "cv2":
                VR._native_lib = False  # force the fallback
            else:
                VR._native_lib = None  # re-probe the .so
            for resize in (False, True):
                for workers in (1, 2, 4):
                    row = bench(paths, reader, workers, resize)
                    emit("decode_bench", row)


if __name__ == "__main__":
    main()
