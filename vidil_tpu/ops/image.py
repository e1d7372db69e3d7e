"""Image preprocessing as jittable JAX ops.

Replaces the reference's per-frame host-side torchvision pipeline
(ToPILImage -> Resize(bicubic) -> ToTensor -> Normalize; reference:
run_video_CapFilt.py:128-137) with a batched, fused, on-device program:
uint8 frames go to the device once; resize + quantize + normalize fuse
into the surrounding jit.

Numerical note: PIL's bicubic uses the Keys kernel (a=-0.5) with
antialiasing on downscale and rounds to uint8 afterwards; jax.image.resize
(method='bicubic', antialias=True) uses the same kernel family. We
replicate the uint8 rounding step so values match PIL up to kernel edge
handling (typically ±1/255).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

# CLIP normalization stats used by every BLIP pipeline in the reference
# (run_video_CapFilt.py:133, run_visual_tokenization.py:412, data/__init__.py)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_bicubic_uint8(frames, size: int):
    """(B, H, W, C) uint8 -> (B, size, size, C) uint8-quantized float32.

    Matches PIL Image.resize(..., BICUBIC) semantics: float filtering then
    round-to-nearest uint8.
    """
    x = frames.astype(jnp.float32)
    B, _, _, C = x.shape
    out = jax.image.resize(x, (B, size, size, C), method="bicubic", antialias=True)
    return jnp.clip(jnp.round(out), 0, 255)


def normalize(frames01, mean=CLIP_MEAN, std=CLIP_STD):
    """(..., C) in [0, 1] -> CLIP-normalized."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (frames01 - mean) / std


def preprocess_frames(frames, image_size: int, mean=CLIP_MEAN, std=CLIP_STD):
    """uint8 (B, H, W, C) -> normalized float32 (B, S, S, C), one fused op."""
    x = resize_bicubic_uint8(frames, image_size) / 255.0
    return normalize(x, mean, std)


def preprocess_video_batch(videos, image_size: int, mean=CLIP_MEAN, std=CLIP_STD):
    """uint8 (B, N, H, W, C) -> normalized (B, N, S, S, C)."""
    B, N = videos.shape[:2]
    flat = videos.reshape((B * N,) + videos.shape[2:])
    out = preprocess_frames(flat, image_size, mean, std)
    return out.reshape((B, N) + out.shape[1:])


# ---------------------------------------------------------------------------
# YUV420 transfer format
# ---------------------------------------------------------------------------
#
# Video decoders emit YUV420 natively (the reference's decord converts to
# RGB on the host, run_video_CapFilt.py:38-45 via decord/FFmpeg). Shipping
# the planar YUV420 representation to the device instead of RGB24 halves
# host->device transfer bytes (1.5 B/px vs 3 B/px) and fuses the colorspace
# conversion into the jitted program — a pure win on PCIe-attached TPUs and
# a 2x end-to-end win on transfer-bound links. Contract: full-range BT.601
# ("JPEG" matrix) planar I420; the native decoder forces this range in
# swscale, the host fallback computes it in numpy.

class YUV420Frames(NamedTuple):
    """Planar full-range BT.601 frames: y (F, H, W), u/v (F, H/2, W/2), uint8."""

    y: object
    u: object
    v: object

    @property
    def num_frames(self) -> int:
        return self.y.shape[0]


def yuv420_to_rgb(y, u, v):
    """uint8 planes (F, H, W) + 2x(F, H/2, W/2) -> float32 RGB (F, H, W, 3)
    in [0, 255]. Full-range BT.601; chroma upsampled by 2x2 replication
    (each chroma sample covers its 2x2 luma block). Jittable."""
    yf = y.astype(jnp.float32)
    # nearest 2x chroma upsample
    up = lambda c: jnp.repeat(jnp.repeat(c.astype(jnp.float32), 2, axis=1), 2, axis=2)
    d = up(u) - 128.0
    e = up(v) - 128.0
    r = yf + 1.402 * e
    g = yf - 0.344136 * d - 0.714136 * e
    b = yf + 1.772 * d
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def preprocess_any(frames, image_size: int, mean=CLIP_MEAN, std=CLIP_STD):
    """Jittable ingest: uint8 RGB (B, H, W, 3) or YUV420Frames planes ->
    CLIP-normalized float32 (B, S, S, 3).

    When the input's spatial dims already equal `image_size` this is the
    classic colorspace + normalize fuse (the host did the PIL resize, the
    reference's byte-parity contract: run_video_CapFilt.py:128-137). When
    they differ — the `resize_on_device` ingest mode, frames shipped at
    native decode resolution for ~2x fewer host->device bytes and no
    host-core PIL work — a bicubic resize with uint8 rounding (mirroring
    PIL's quantization) runs on device. Keys a=-0.5 kernel both places;
    divergence vs the PIL path is ~±1/255 per pixel, which is why the
    mode is opt-in rather than the parity default.
    """
    if isinstance(frames, YUV420Frames):
        x = yuv420_to_rgb(*frames)  # float32 [0, 255]
    else:
        x = frames.astype(jnp.float32)
    if x.shape[1:3] != (image_size, image_size):
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, x.shape[3]),
            method="bicubic", antialias=True)
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return normalize(x / 255.0, mean, std)


def rgb_to_yuv420(frames_u8: np.ndarray) -> YUV420Frames:
    """Host-side uint8 RGB (F, H, W, 3) -> full-range BT.601 I420 planes.

    Fallback for frame sources that hand us RGB (PIL-resized CapFilt frames,
    the cv2 reader); the native decoder scales directly in YUV and skips
    this. Chroma is 2x2 box-averaged. H and W must be even.
    """
    f = frames_u8.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    sub = lambda c: (c[:, 0::2, 0::2] + c[:, 1::2, 0::2] + c[:, 0::2, 1::2] + c[:, 1::2, 1::2]) * 0.25
    to_u8 = lambda c: np.clip(np.round(c), 0, 255).astype(np.uint8)
    return YUV420Frames(to_u8(y), to_u8(sub(u)), to_u8(sub(v)))
