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


def _pil_preprocess(rgb_u8, size):
    from PIL import Image

    from vidil_tpu.ops.image import CLIP_MEAN, CLIP_STD

    out = np.empty((len(rgb_u8), size, size, 3), np.float32)
    for i, frm in enumerate(rgb_u8):
        out[i] = np.asarray(
            Image.fromarray(frm).resize((size, size), Image.BICUBIC), np.float32)
    out = out / 255.0
    return (out - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)


@pytest.mark.parametrize("hw,size", [((24, 20), 32),   # upscale
                                     ((48, 64), 32)])  # downscale (antialias)
def test_preprocess_any_device_resize_matches_pil(hw, size):
    """resize_on_device ingest: jax bicubic (Keys a=-0.5, uint8-rounded)
    tracks PIL bicubic within 1 8-bit step on smooth (natural-image-like)
    content and p99 <= ~2 steps on pure noise (measured profile: smooth
    max 1 step; noise p99 2 steps with rare isolated outliers up to ~17 —
    PIL's fixed-point filter taps vs float). Close enough that the mode is
    usable, far enough that it stays opt-in (run_video_CapFilt.py
    resize_on_device)."""
    from PIL import Image

    from vidil_tpu.ops.image import CLIP_STD, preprocess_any

    rng = np.random.RandomState(3)
    step = np.asarray(CLIP_STD, np.float32) * 255.0  # normalized units -> 8-bit steps

    # smooth content: low-res random field bilinearly upsampled
    smooth = np.stack([
        np.asarray(Image.fromarray(rng.randint(0, 256, (6, 6, 3), dtype=np.uint8))
                   .resize((hw[1], hw[0]), Image.BILINEAR)) for _ in range(2)])
    dev = np.asarray(preprocess_any(jnp.asarray(smooth), size))
    ref = _pil_preprocess(smooth, size)
    assert dev.shape == ref.shape == (2, size, size, 3)
    assert (np.abs(dev - ref) * step).max() <= 1.5, (np.abs(dev - ref) * step).max()

    # adversarial content: uniform noise — p99 still within 3 steps
    noise = rng.randint(0, 256, size=(2,) + hw + (3,), dtype=np.uint8)
    dev = np.asarray(preprocess_any(jnp.asarray(noise), size))
    ref = _pil_preprocess(noise, size)
    assert np.percentile(np.abs(dev - ref) * step, 99) <= 3.0


def test_preprocess_any_native_yuv_resize():
    """Native-res YUV planes -> resized normalized tensor; same-resolution
    input goes through the classic no-resize path and matches exactly."""
    from vidil_tpu.ops.image import preprocess_any

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, size=(3, 24, 20, 3), dtype=np.uint8)
    yuv = rgb_to_yuv420(rgb)
    out = np.asarray(preprocess_any(YUV420Frames(*map(jnp.asarray, yuv)), 32))
    assert out.shape == (3, 32, 32, 3)
    # at-size input: preprocess_any == manual convert+normalize, bit-exact
    rgb32 = rng.randint(0, 256, size=(3, 32, 32, 3), dtype=np.uint8)
    from vidil_tpu.ops.image import CLIP_MEAN, CLIP_STD

    manual = (rgb32.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN, np.float32)) \
        / np.asarray(CLIP_STD, np.float32)
    np.testing.assert_allclose(
        np.asarray(preprocess_any(jnp.asarray(rgb32), 32)), manual, rtol=0, atol=1e-6)
