"""Probe: WHICH program hangs the fused-ON CapFilt chunk warmup-compile?

Round 4/5 history: `BENCH_FUSED_BLOCK=1` bench.py runs died in phase
'warmup-compile' twice (900 s and 2700 s budgets, benchmarks/capfilt.jsonl
degraded rows @ 2026-08-19T04:59/05:49), so the fused-ON arm of the chunk
A/B has never produced a number — the fused-block default was settled OFF
on cross-day datapoints instead. The encode-only in-situ A/B compiled and
ran the same kernel fine (benchmarks/fused_block_ab.jsonl), so the hang
lives in one of the OTHER chunk programs, or in this exact engine wrapping.

This probe builds the engine fused-ON exactly like bench.py (same shapes:
BENCH_VIDEOS x 4 frames @ 384px, bf16, beam_group_kv, early_exit=False)
and walks the chunk's device programs one at a time with wall-clock logs
between, so the hanging compile names itself in the log. Run under
`timeout` and watch stderr.
"""

from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

VIDEOS = int(_os.environ.get("BENCH_VIDEOS", 64))
NUM_FRM = 4
IMAGE_SIZE = 384


def log(msg):
    print(f"[probe-fused] {time.strftime('%H:%M:%S')} {msg}",
          file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
    from vidil_tpu.ops.image import YUV420Frames
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_bench_vocab
    from vidil_tpu.utils.synth import synth_tree

    vocab_path = _os.path.join(tempfile.gettempdir(), "bench_vocab_stable2.txt")
    write_bench_vocab(vocab_path)
    tok = BlipTokenizer(vocab_path)
    vit_cfg = dataclasses.replace(ViTConfig.from_name("base", IMAGE_SIZE),
                                  use_fused_block=True)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)
    log(f"device: {jax.devices()[0]}; use_fused_block=True")

    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))
    t = time.time()
    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, 1.0), synth_tree(fil_shapes, 2.0)))()
    jax.block_until_ready((cap, fil))
    log(f"param synth {time.time()-t:.1f}s")

    engine = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                           num_beams=3, max_length=20, min_length=5,
                           dtype=jnp.bfloat16, beam_group_kv=True,
                           early_exit=False)

    F_TOTAL = VIDEOS * NUM_FRM

    def _hash_noise_u8(n_elems, salt):
        i = jnp.arange(n_elems, dtype=jnp.uint32) + jnp.uint32(salt)
        v = i * jnp.uint32(2654435761)
        v = v ^ (v >> 15)
        v = v * jnp.uint32(2246822519)
        v = v ^ (v >> 13)
        return (v & jnp.uint32(0xFF)).astype(jnp.uint8)

    @jax.jit
    def make():
        def plane(n, h, w, s):
            return _hash_noise_u8(n * h * w, s).reshape(n, h, w)
        return YUV420Frames(
            plane(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE, 0),
            plane(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2, 1),
            plane(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2, 2),
        )

    buf = make()
    jax.block_until_ready(buf)
    log("frames synthesized on device")

    t = time.time()
    embeds = engine.encode_captioner(buf)
    float(jnp.sum(embeds[:1, :1, :1]))
    log(f"STEP 1 encode_captioner (fused ViT): {time.time()-t:.1f}s "
        f"-> {embeds.shape}")

    t = time.time()
    seqs = engine.generate_beam(embeds, jax.random.PRNGKey(0))
    float(jnp.sum(seqs))
    log(f"STEP 2 generate_beam: {time.time()-t:.1f}s")

    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=0.4,
                  filter_mode="max_filter", generation_mode="beam",
                  do_sentence_tokenization=False)

    def sl(i):
        s = slice(i * NUM_FRM, (i + 1) * NUM_FRM)
        return YUV420Frames(buf.y[s], buf.u[s], buf.v[s])

    chunk = [{"video_id": f"v{i}", "frames": sl(i), "text": []}
             for i in range(VIDEOS)]
    t = time.time()
    engine.run_chunk(chunk, config, rng=jax.random.PRNGKey(9))
    log(f"STEP 3 run_chunk (filter encode + ITM + the rest): "
        f"{time.time()-t:.1f}s")

    t = time.time()
    engine.run_chunk(chunk, config, rng=jax.random.PRNGKey(10))
    dt = time.time() - t
    log(f"STEP 4 warm run_chunk: {dt:.1f}s = {F_TOTAL/dt:.1f} f/s")
    log("probe complete — no hang at these shapes")


if __name__ == "__main__":
    main()
