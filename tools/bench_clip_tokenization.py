"""Benchmark: CLIP visual-tokenization compute throughput (upload excluded).

The stage is one CLIP ViT-L/14 image encode per frame plus a cosine
matmul against the ~44k-text vg ontology embedding cache (reference:
run_visual_tokenization.py:276). The CLI's recorded 247 frames/s is
bounded by the dev tunnel's frame upload; this measures the chip-side
rate with frames device-resident — the number a PCIe-attached host sees.

Prints ONE JSON line. Env: FRAMES/batch (default 128), ITERS (6).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit

FRAMES = int(os.environ.get("FRAMES", 128))
ITERS = int(os.environ.get("ITERS", 6))
N_ONTOLOGY = 44437  # vendored vg ontology total (objects+attrs+scenes+verbs)
IMAGE_SIZE = 224
V5E_PEAK_BF16_TFLOPS = 197.0


def analytic_tflops_per_frame(cfg) -> float:
    """Analytic matmul FLOPs (2*m*n*k per GEMM, elementwise excluded) for
    one CLIP image-tower encode + the ontology cosine matmul: per layer
    24*N*D^2 (QKV/out/MLP GEMMs) + 4*N^2*D (scores + apply), plus the
    patch-embed conv and the projection/ontology dots. Same accounting as
    bench.py's CapFilt split (ARCHITECTURE.md "Measured")."""
    n = (cfg.image_size // cfg.patch_size) ** 2 + 1
    d = cfg.vision_hidden_size
    per_layer = 24 * n * d * d + 4 * n * n * d
    patch = 2 * (n - 1) * d * (3 * cfg.patch_size ** 2)
    proj = 2 * d * cfg.projection_dim
    ontology = 2 * N_ONTOLOGY * cfg.projection_dim
    return (cfg.vision_layers * per_layer + patch + proj + ontology) / 1e12


def log(msg):
    import sys

    print(f"[bench_clip_tok] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import CLIPConfig
    from vidil_tpu.models.clip import clip_image_embeds, init_clip

    cfg = CLIPConfig()  # ViT-L/14 defaults (the reference's CLIP)
    log(f"device: {jax.devices()[0]}; CLIP image tower "
        f"{cfg.vision_layers}L/{cfg.vision_hidden_size}d patch{cfg.patch_size}")

    shapes = jax.eval_shape(lambda: init_clip(jax.random.PRNGKey(0), cfg))
    from vidil_tpu.utils.synth import synth_tree

    params = jax.jit(lambda: synth_tree(shapes))()
    jax.block_until_ready(params)

    @jax.jit
    def synth_frames(salt):
        n = FRAMES * IMAGE_SIZE * IMAGE_SIZE * 3
        x = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.31 + salt) * 127 + 128
        return x.reshape(FRAMES, IMAGE_SIZE, IMAGE_SIZE, 3).astype(jnp.uint8)

    # ontology text embeddings are a precomputed cache in the real stage
    text_embeds = jax.jit(lambda: jnp.sin(
        jnp.arange(N_ONTOLOGY * cfg.projection_dim, dtype=jnp.float32) * 0.17)
        .reshape(N_ONTOLOGY, cfg.projection_dim))()

    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])

    @jax.jit
    def stage(params, frames_u8, text_embeds):
        x = (frames_u8.astype(jnp.float32) / 255.0 - mean) / std
        emb = clip_image_embeds(params, x, cfg, dtype=jnp.bfloat16)
        emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True)
        sims = jnp.dot(emb.astype(jnp.float32), text_embeds.T,
                       precision=jax.lax.Precision.HIGHEST)
        return sims

    a, b = synth_frames(jnp.float32(0)), synth_frames(jnp.float32(1))
    jax.block_until_ready((a, b))
    t = time.time()
    float(jnp.sum(stage(params, a, text_embeds)))
    log(f"warmup (compile): {time.time()-t:.1f}s")
    ts = []
    for it in range(ITERS):
        t0 = time.perf_counter()
        float(jnp.sum(stage(params, a if it % 2 == 0 else b, text_embeds)))
        ts.append(time.perf_counter() - t0)
        log(f"iter {it}: {ts[-1]*1e3:.0f} ms")
    dt = float(np.median(ts))
    fl = analytic_tflops_per_frame(cfg) * FRAMES
    emit("clip_tokenization", {
        "metric": "clip_tokenization_compute_throughput",
        "value": round(FRAMES / dt, 1),
        "unit": "frames/sec/chip",
        "frames_per_batch": FRAMES, "ontology_texts": N_ONTOLOGY,
        "s_per_batch": round(dt, 4),
        "tflops_per_batch": round(fl, 2),
        "mfu": round(fl / dt / V5E_PEAK_BF16_TFLOPS, 4),
        "mfu_note": "analytic matmul FLOPs vs bf16 peak; the fp32 "
                    "ontology cosine matmul (HIGHEST precision) is "
                    "counted at its nominal FLOPs",
        "note": "upload-excluded (device-resident frames); CLI end-to-end "
                "rate on the dev tunnel is transfer-bound",
        "device": str(jax.devices()[0]),
    })


if __name__ == "__main__":
    main()
