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
