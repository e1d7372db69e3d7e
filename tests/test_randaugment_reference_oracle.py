"""RandAugment ops vs the LIVE reference transform/randaugment.py.

The reference implements its ops in cv2/numpy; ours use PIL. This suite
pins which ops are PIXEL-EXACT across the two idioms (identity,
autocontrast, equalize, solarize, brightness, sharpness<=1, translate),
bounds contrast at +/-1 LSB, and reproduces the reference's posterize
quirk: its np.uint8(255 << (8-bits)) mask wrapped (legacy numpy) to
PIL's mask for bits 1-4 and to 0 — full blackout — at bits 0; on this
env's numpy>=2 the reference op raises OverflowError outright, so the
posterize check emulates the legacy wrap. Ops that legitimately differ
(color's gray weights, rotate/shear interpolation; sign conventions are
coin-flipped so directions are distributionally identical) are recorded
in PARITY.md, not asserted here.
"""

import importlib.util
import os

import numpy as np
import pytest
from PIL import Image

REF = "/root/reference/transform/randaugment.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree not present")

from vidil_tpu.data.transforms import AUG_OPS, MAX_LEVEL, _posterize  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location("ref_randaugment", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def img():
    return np.random.RandomState(0).randint(0, 256, (48, 64, 3), np.uint8)


def _a(x):
    return np.asarray(x, dtype=np.uint8)


def test_identity_autocontrast_equalize_exact(ref, img):
    pil = Image.fromarray(img)
    np.testing.assert_array_equal(ref.identity_func(img), _a(AUG_OPS["Identity"](pil, 5)))
    np.testing.assert_array_equal(ref.autocontrast_func(img),
                                  _a(AUG_OPS["AutoContrast"](pil, 5)))
    np.testing.assert_array_equal(ref.equalize_func(img),
                                  _a(AUG_OPS["Equalize"](pil, 5)))


@pytest.mark.parametrize("level", [0, 3, 5, 8, 10])
def test_solarize_exact(ref, img, level):
    pil = Image.fromarray(img)
    thresh = int((level / MAX_LEVEL) * 256)
    np.testing.assert_array_equal(ref.solarize_func(img, thresh),
                                  _a(AUG_OPS["Solarize"](pil, level)))


@pytest.mark.parametrize("bits", [0, 1, 2, 3, 4])
def test_posterize_matches_legacy_numpy_wrap(ref, img, bits):
    # the reference's np.uint8(255 << (8-bits)) raises on numpy>=2;
    # emulate the legacy wrap it relied on
    mask = np.uint8((255 << (8 - bits)) & 0xFF)
    legacy = np.bitwise_and(img, mask)
    ours = _a(_posterize(Image.fromarray(img), bits))
    np.testing.assert_array_equal(legacy, ours)
    if bits == 0:
        assert ours.max() == 0  # level < 2.5 blacks the image out
    with pytest.raises(OverflowError):
        ref.posterize_func(img, bits)  # the reference op is dead on numpy>=2


@pytest.mark.parametrize("factor", [0.1, 0.55, 1.0, 1.9])
def test_brightness_exact_contrast_1lsb(ref, img, factor):
    from PIL import ImageEnhance

    pil = Image.fromarray(img)
    np.testing.assert_array_equal(
        ref.brightness_func(img, factor),
        _a(ImageEnhance.Brightness(pil).enhance(factor)))
    diff = np.abs(ref.contrast_func(img, factor).astype(int)
                  - _a(ImageEnhance.Contrast(pil).enhance(factor)).astype(int))
    assert diff.max() <= 1  # mean-gray rounding differs by at most 1 LSB


@pytest.mark.parametrize("factor", [0.1, 0.5, 1.0])
def test_sharpness_exact_below_one(ref, img, factor):
    # factor > 1 diverges at image borders (cv2.filter2D edge replication
    # vs PIL's SMOOTH kernel border pass-through) — interior-only op parity
    from PIL import ImageEnhance

    pil = Image.fromarray(img)
    np.testing.assert_array_equal(ref.sharpness_func(img, factor),
                                  _a(ImageEnhance.Sharpness(pil).enhance(factor)))


@pytest.mark.parametrize("offset", [-7, 0, 5])
def test_translate_exact(ref, img, offset):
    pil = Image.fromarray(img)
    ours_x = pil.transform(pil.size, Image.AFFINE, (1, 0, offset, 0, 1, 0),
                           resample=Image.BILINEAR, fillcolor=(0, 0, 0))
    np.testing.assert_array_equal(ref.translate_x_func(img, offset), _a(ours_x))
    ours_y = pil.transform(pil.size, Image.AFFINE, (1, 0, 0, 0, 1, offset),
                           resample=Image.BILINEAR, fillcolor=(0, 0, 0))
    np.testing.assert_array_equal(ref.translate_y_func(img, offset), _a(ours_y))
