"""Native FFmpeg decoder vs cv2 fallback: same frames, same metadata."""

import os

import numpy as np
import pytest

from vidil_tpu.data.video_reader import Cv2VideoReader, NativeVideoReader, _load_native


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("native") / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    rng = np.random.RandomState(0)
    for i in range(36):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, :, 0] = i * 7
        frame[:16, :, 1] = 255 - i * 5
        frame[:, :32, 2] = (i * 13) % 255
        w.write(frame)
    w.release()
    return path


needs_native = pytest.mark.skipif(not _load_native(), reason="native lib not built")


@needs_native
def test_native_matches_cv2(video):
    nat = NativeVideoReader(video)
    cv = Cv2VideoReader(video)
    assert len(nat) == len(cv) == 36
    assert abs(nat.fps - cv.fps) < 0.5
    idx = [0, 5, 6, 20, 35]
    a = nat.get_batch(idx)
    b = cv.get_batch(idx)
    assert a.shape == b.shape == (5, 48, 64, 3)
    # same decoder family (FFmpeg) → near-identical pixels
    assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 1.0


@needs_native
def test_native_backward_seek_and_repeat(video):
    nat = NativeVideoReader(video)
    fwd = nat.get_batch([30])
    back = nat.get_batch([2, 2, 10])  # backward seek + repeated index
    assert back.shape == (3, 48, 64, 3)
    np.testing.assert_array_equal(back[0], back[1])
    again = nat.get_batch([30])
    np.testing.assert_array_equal(fwd, again)


@needs_native
def test_native_decode_time_resize(video):
    nat = NativeVideoReader(video, width=32, height=24)
    out = nat.get_batch([0, 10])
    assert out.shape == (2, 24, 32, 3)


@needs_native
def test_native_bad_path():
    with pytest.raises(IOError):
        NativeVideoReader("/nonexistent/xyz.mp4")
