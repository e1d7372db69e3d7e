"""Bisect: WHICH input prologue makes the fused-ON ViT encode compile hang?

probe_fused_chunk_compile.py found the hang is already in STEP 1 — the
engine's `_encode` program (YUV420->RGB + CLIP normalize + fused Pallas
block scan in ONE jit) at 256 frames / 384px never returns from the
remote compile (>=12 min observed), while tools/ab_fused_block.py's
in-situ phase (bare float32 images -> the same fused scan) compiled fine
on prior days. This bisects the prologue in timeout-bounded arms:

  MODE=kernel  ONE fused_vit_block call, no scan, bf16 (Mosaic compile cost)
  MODE=scan12  the 12-layer lax.scan over the kernel, bare bf16 input
  MODE=f32   float32 images -> encode_images           (the A/B shape)
  MODE=rgb   uint8 RGB /255 -> normalize -> encode      (engine RGB path)
  MODE=yuv   YUV420 planes -> rgb -> norm -> encode     (engine YUV path)
  MODE=yuv_split  yuv->rgb->norm in jit #1, encode in jit #2 (candidate fix)

Run each arm as its own process under `timeout`; the arm that never logs
"compiled" names the trigger. JAX_COMPILATION_CACHE_DIR is DISABLED here
so every arm measures a cold compile.
"""

from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

MODE = _os.environ.get("MODE", "f32")
FRAMES = int(_os.environ.get("FRAMES", 256))
IMAGE_SIZE = 384


def log(msg):
    print(f"[bisect:{MODE}] {time.strftime('%H:%M:%S')} {msg}",
          file=sys.stderr, flush=True)


def main():
    # cold compile on purpose: no persistent cache
    _os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vidil_tpu.config import ViTConfig
    from vidil_tpu.models import blip as B
    from vidil_tpu.models.vit import init_vit
    from vidil_tpu.ops.image import CLIP_MEAN, CLIP_STD, YUV420Frames, yuv420_to_rgb

    vit_cfg = dataclasses.replace(ViTConfig.from_name("base", IMAGE_SIZE),
                                  use_fused_block=True)
    log(f"device: {jax.devices()[0]}; frames={FRAMES}")

    shapes = jax.eval_shape(lambda: init_vit(jax.random.PRNGKey(0), vit_cfg))
    from vidil_tpu.utils.synth import synth_tree
    params = jax.jit(lambda: synth_tree(shapes, 1.0))()
    jax.block_until_ready(params)
    log("params ready")

    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    S = IMAGE_SIZE

    def enc(p, x):
        return B.encode_images({"visual_encoder": p}, x, vit_cfg,
                               dtype=jnp.bfloat16)

    def _u8(n_elems, salt):
        i = jnp.arange(n_elems, dtype=jnp.uint32) + jnp.uint32(salt)
        v = i * jnp.uint32(2654435761)
        v = v ^ (v >> 15)
        return (v & jnp.uint32(0xFF)).astype(jnp.uint8)

    t0 = time.time()
    if MODE in ("kernel", "scan12"):
        import jax.numpy as jnp2  # noqa: F401
        from vidil_tpu.ops.fused_vit_block import fused_vit_block
        L = 577
        lp = 640
        x = jax.jit(lambda: jnp.sin(jnp.arange(FRAMES * lp * 768,
                                               dtype=jnp.float32)
                                    ).reshape(FRAMES, lp, 768).astype(jnp.bfloat16))()
        jax.block_until_ready(x)
        blocks = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                              if a.dtype == jnp.float32 else a, params["blocks"])
        jax.block_until_ready(blocks)
        log(f"input ready; compiling {MODE}")
        if MODE == "kernel":
            one = jax.tree.map(lambda a: a[0], blocks)

            def f(blk, h):
                return fused_vit_block(blk, h, vit_cfg.num_heads, 1e-6,
                                       true_len=L,
                                       frames_per_program=vit_cfg.fused_block_frames)
            out = jax.jit(f)(one, x)
        else:
            def f(blks, h):
                def body(c, blk):
                    return fused_vit_block(blk, c, vit_cfg.num_heads, 1e-6,
                                           true_len=L,
                                           frames_per_program=vit_cfg.fused_block_frames), None
                h, _ = jax.lax.scan(body, h, blks)
                return h
            out = jax.jit(f)(blocks, x)
    elif MODE == "f32":
        x = jax.jit(lambda: jnp.sin(jnp.arange(FRAMES * S * S * 3,
                                               dtype=jnp.float32)).reshape(FRAMES, S, S, 3))()
        jax.block_until_ready(x)
        log("input ready; compiling fused encode (f32 direct)")
        f = jax.jit(enc)
        out = f(params, x)
    elif MODE == "rgb":
        x = jax.jit(lambda: _u8(FRAMES * S * S * 3, 0).reshape(FRAMES, S, S, 3))()
        jax.block_until_ready(x)
        log("input ready; compiling uint8->norm->fused encode")

        @jax.jit
        def f(p, u8):
            h = u8.astype(jnp.float32) / 255.0
            h = (h - mean) / std
            return enc(p, h)
        out = f(params, x)
    elif MODE in ("yuv", "yuv_split"):
        @jax.jit
        def make():
            return YUV420Frames(
                _u8(FRAMES * S * S, 0).reshape(FRAMES, S, S),
                _u8(FRAMES * (S // 2) * (S // 2), 1).reshape(FRAMES, S // 2, S // 2),
                _u8(FRAMES * (S // 2) * (S // 2), 2).reshape(FRAMES, S // 2, S // 2))
        buf = make()
        jax.block_until_ready(buf)
        if MODE == "yuv":
            log("input ready; compiling yuv->rgb->norm->fused encode (ONE jit)")

            @jax.jit
            def f(p, b):
                h = yuv420_to_rgb(b.y, b.u, b.v) / 255.0
                h = (h - mean) / std
                return enc(p, h)
            out = f(params, buf)
        else:
            log("input ready; compiling yuv->rgb->norm (jit 1) + fused encode (jit 2)")

            @jax.jit
            def pre(b):
                h = yuv420_to_rgb(b.y, b.u, b.v) / 255.0
                return (h - mean) / std
            x = pre(buf)
            float(jnp.sum(x[:1, :1, :1]))
            log(f"prologue jit done {time.time()-t0:.1f}s")
            f = jax.jit(enc)
            out = f(params, x)
    else:
        raise SystemExit(f"unknown MODE={MODE}")

    float(jnp.sum(out[:1, :1, :1]))
    log(f"compiled+ran in {time.time()-t0:.1f}s -> {out.shape}")


if __name__ == "__main__":
    main()
