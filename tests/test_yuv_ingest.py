"""YUV420 transfer format: host converters, native decoder path, device op.

The YUV420 ingest halves host->device bytes (1.5 B/px vs RGB24's 3 B/px)
and fuses the colorspace conversion into the jitted encode program
(vidil_tpu/ops/image.py). Contract: full-range BT.601 planar I420.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vidil_tpu.data.video_reader import Cv2VideoReader, NativeVideoReader, _load_native
from vidil_tpu.ops.image import YUV420Frames, rgb_to_yuv420, yuv420_to_rgb


def test_roundtrip_gray_exact():
    # grayscale: Y == gray exactly (coefficients sum to 1), U == V == 128,
    # so the roundtrip is bit-exact
    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, size=(3, 16, 16, 1), dtype=np.uint8)
    rgb = np.repeat(g, 3, axis=-1)
    yuv = rgb_to_yuv420(rgb)
    assert yuv.y.shape == (3, 16, 16) and yuv.u.shape == (3, 8, 8)
    np.testing.assert_array_equal(np.asarray(yuv.u), 128)
    np.testing.assert_array_equal(np.asarray(yuv.v), 128)
    back = np.asarray(jnp.round(yuv420_to_rgb(*yuv))).astype(np.uint8)
    np.testing.assert_array_equal(back, rgb)


def test_roundtrip_smooth_color_tolerance():
    # smooth chroma gradients: the only loss is 2x2 chroma subsampling
    h = w = 32
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([
        40 + 4 * xx, 200 - 3 * yy, 80 + 2 * xx + 1 * yy
    ], axis=-1)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)[None]
    back = np.asarray(yuv420_to_rgb(*rgb_to_yuv420(rgb)))
    err = np.abs(back - rgb.astype(np.float32))
    assert err.max() <= 12.0, err.max()
    assert err.mean() <= 3.0, err.mean()


def test_num_frames_property():
    yuv = YUV420Frames(np.zeros((5, 4, 4), np.uint8),
                       np.zeros((5, 2, 2), np.uint8),
                       np.zeros((5, 2, 2), np.uint8))
    assert yuv.num_frames == 5


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("yuv") / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (64, 48))
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    for i in range(24):
        frame = np.clip(np.stack([
            40 + 2 * xx + 2 * i,
            180 - 2 * yy - 3 * i,
            60 + xx + yy,
        ], axis=-1), 0, 255).astype(np.uint8)
        w.write(frame)
    w.release()
    return path


def test_cv2_reader_yuv_shapes(video):
    r = Cv2VideoReader(video, width=32, height=24)
    yuv = r.get_batch_yuv([0, 5, 10])
    assert yuv.y.shape == (3, 24, 32)
    assert yuv.u.shape == yuv.v.shape == (3, 12, 16)
    # reconstruction close to the RGB decode of the same frames
    rgb = r.get_batch([0, 5, 10]).astype(np.float32)
    back = np.asarray(yuv420_to_rgb(*yuv))
    assert np.abs(back - rgb).mean() < 3.0


needs_native = pytest.mark.skipif(not _load_native(), reason="native lib not built")


@needs_native
def test_native_yuv_matches_rgb_decode(video):
    nat = NativeVideoReader(video, width=32, height=24)
    idx = [0, 7, 20]
    rgb = nat.get_batch(idx).astype(np.float32)
    yuv = nat.get_batch_yuv(idx)
    assert yuv.y.shape == (3, 24, 32) and yuv.u.shape == (3, 12, 16)
    back = np.asarray(yuv420_to_rgb(*yuv))
    # same decode + same scaler; differences come from the fixed-point
    # YUV->RGB in swscale vs our float conversion and chroma upsampling
    assert np.abs(back - rgb).mean() < 3.0, np.abs(back - rgb).mean()


@needs_native
def test_native_yuv_needs_even_size(video):
    nat = NativeVideoReader(video)  # no decode-time size
    with pytest.raises(ValueError):
        nat.get_batch_yuv([0])
    odd = NativeVideoReader(video, width=33, height=24)
    with pytest.raises(ValueError):
        odd.get_batch_yuv([0])
