"""A/B: bf16 vs int8-quantized cross-K/V in the CapFilt beam decode.

The decode loop's measured floor is re-reading the full grouped cross-K/V
every step (ARCHITECTURE.md decode trace: ~4.3 ms/step/einsum AT the HBM
roofline). ``cross_kv_int8`` stores that memory as per-row int8 + f32
scales, halving the bytes; this harness measures, interleaved in one
process on the same weights/frames:

  1. the isolated generate program (encode once, time K beam decodes
     closed by a scalar readback — block_until_ready is a no-op on axon);
  2. caption-token agreement between the two paths (parity cost);
  3. the full run_chunk rate with each setting (in-situ effect).

Writes one JSON line to benchmarks/decode_int8_ab.jsonl.
"""

from __future__ import annotations

import os as _os
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

VIDEOS = int(_os.environ.get("BENCH_VIDEOS", 64))
NUM_FRM = 4
IMAGE_SIZE = 384
ITERS = int(_os.environ.get("BENCH_ITERS", 4))
PHASES = int(_os.environ.get("BENCH_PHASES", 2))


def log(msg):
    print(f"[ab-int8] {msg}", file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_bench_vocab
    import tempfile

    vocab_path = _os.path.join(tempfile.gettempdir(), "bench_vocab_stable2.txt")
    write_bench_vocab(vocab_path)
    tok = BlipTokenizer(vocab_path)
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
    from vidil_tpu.utils.synth import synth_tree

    log(f"device: {jax.devices()[0]}")
    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))
    t = time.time()
    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, 1.0), synth_tree(fil_shapes, 2.0)))()
    jax.block_until_ready((cap, fil))
    log(f"param synth {time.time()-t:.1f}s")

    kw = dict(num_beams=3, max_length=20, min_length=5, dtype=jnp.bfloat16,
              beam_group_kv=True, early_exit=False)
    eng_fp = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg, **kw)
    eng_q8 = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg, cross_kv_int8=True, **kw)
    eng_dot = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg, cross_kv_int8="dot", **kw)

    F_TOTAL = VIDEOS * NUM_FRM
    from vidil_tpu.ops.image import YUV420Frames

    # on-device sin-fill synthesis: the two buffers total ~113 MB, the
    # exact device_put size CLAUDE.md warns can hang >15 min in a tunnel
    # stall trough — measurement tools must synthesize inputs on device
    def synth_planes(salt):
        def plane(n, h, w, s):
            v = jnp.sin(jnp.arange(n * h * w, dtype=jnp.float32) * 0.017 + s)
            return (v * 127 + 128).astype(jnp.uint8).reshape(n, h, w)
        return YUV420Frames(
            plane(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE, salt),
            plane(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2, salt + 1.0),
            plane(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2, salt + 2.0),
        )

    dev_a = jax.jit(lambda: synth_planes(0.0))()
    dev_b = jax.jit(lambda: synth_planes(3.0))()
    float(jnp.sum(dev_a.y[:1, :1, :4]) + jnp.sum(dev_b.y[:1, :1, :4]))
    log("frames synthesized on device")

    # ---- isolated generate program: encode once, reuse per-frame embeds
    # (CapFilt captions per FRAME: embeds (F_TOTAL, 577, D))
    embeds = eng_fp.encode_captioner(dev_a)
    float(jnp.sum(embeds[:1, :1, :1]))
    log(f"embeds ready: {embeds.shape}")

    def gen_once(engine, key):
        seqs = engine.generate_beam(embeds, jax.random.PRNGKey(key))
        return np.asarray(seqs)

    # warmup compiles + agreement check
    s_fp = gen_once(eng_fp, 0)
    s_q8 = gen_once(eng_q8, 0)
    s_dot = gen_once(eng_dot, 0)
    tok_agree = float(np.mean(s_fp == s_q8))
    row_agree = float(np.mean(np.all(s_fp == s_q8, axis=-1)))
    tok_agree_dot = float(np.mean(s_fp == s_dot))
    row_agree_dot = float(np.mean(np.all(s_fp == s_dot, axis=-1)))
    log(f"warmup done; token agreement int8 {tok_agree:.4f} (rows {row_agree:.4f}), "
        f"int8-dot {tok_agree_dot:.4f} (rows {row_agree_dot:.4f})")

    def time_generate(engine, k):
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            seqs = engine.generate_beam(embeds, jax.random.PRNGKey(100 * k + it))
            float(jnp.sum(seqs))  # host readback closes the timing
            ts.append(time.perf_counter() - t0)
        return ts

    def make_chunk(buf):
        def sl(i):
            s = slice(i * NUM_FRM, (i + 1) * NUM_FRM)
            return YUV420Frames(buf.y[s], buf.u[s], buf.v[s])
        return [{"video_id": f"v{i}", "frames": sl(i), "text": []}
                for i in range(VIDEOS)]

    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=0.4,
                  filter_mode="max_filter", generation_mode="beam",
                  do_sentence_tokenization=False)

    def time_chunk(engine, k):
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            engine.run_chunk(make_chunk(dev_a if it % 2 else dev_b), config,
                             rng=jax.random.PRNGKey(500 * k + it))
            ts.append(time.perf_counter() - t0)
        return ts

    # warm the chunk programs of all engines before timing
    eng_fp.run_chunk(make_chunk(dev_a), config, rng=jax.random.PRNGKey(9))
    eng_q8.run_chunk(make_chunk(dev_a), config, rng=jax.random.PRNGKey(9))
    eng_dot.run_chunk(make_chunk(dev_a), config, rng=jax.random.PRNGKey(9))
    log("chunk warmup done")

    gen_fp, gen_q8, gen_dot, chunk_fp, chunk_q8, chunk_dot = [], [], [], [], [], []
    for k in range(PHASES):
        log(f"phase {k}: generate fp")
        gen_fp += time_generate(eng_fp, k)
        log(f"  {[round(t,3) for t in gen_fp[-ITERS:]]}")
        log(f"phase {k}: generate int8")
        gen_q8 += time_generate(eng_q8, k)
        log(f"  {[round(t,3) for t in gen_q8[-ITERS:]]}")
        log(f"phase {k}: generate int8-dot")
        gen_dot += time_generate(eng_dot, k)
        log(f"  {[round(t,3) for t in gen_dot[-ITERS:]]}")
        log(f"phase {k}: chunk fp")
        chunk_fp += time_chunk(eng_fp, k)
        log(f"  {[round(t,3) for t in chunk_fp[-ITERS:]]}")
        log(f"phase {k}: chunk int8")
        chunk_q8 += time_chunk(eng_q8, k)
        log(f"  {[round(t,3) for t in chunk_q8[-ITERS:]]}")
        log(f"phase {k}: chunk int8-dot")
        chunk_dot += time_chunk(eng_dot, k)
        log(f"  {[round(t,3) for t in chunk_dot[-ITERS:]]}")

    med = lambda ts: float(np.median(ts))
    record = {
        "metric": "decode_cross_kv_int8_ab",
        "videos": VIDEOS, "num_frm": NUM_FRM, "iters_per_phase": ITERS,
        "phases": PHASES,
        "token_agreement": round(tok_agree, 4),
        "identical_caption_rows": round(row_agree, 4),
        "token_agreement_dot": round(tok_agree_dot, 4),
        "identical_caption_rows_dot": round(row_agree_dot, 4),
        "generate_fp_s_median": round(med(gen_fp), 3),
        "generate_int8_s_median": round(med(gen_q8), 3),
        "generate_speedup": round(med(gen_fp) / med(gen_q8), 3),
        "generate_dot_s_median": round(med(gen_dot), 3),
        "generate_dot_speedup": round(med(gen_fp) / med(gen_dot), 3),
        "chunk_fp_s_median": round(med(chunk_fp), 3),
        "chunk_int8_s_median": round(med(chunk_q8), 3),
        "chunk_speedup": round(med(chunk_fp) / med(chunk_q8), 3),
        "chunk_dot_s_median": round(med(chunk_dot), 3),
        "chunk_dot_speedup": round(med(chunk_fp) / med(chunk_dot), 3),
        "chunk_dot_fps": round(F_TOTAL / med(chunk_dot), 2),
        "chunk_fp_fps": round(F_TOTAL / med(chunk_fp), 2),
        "chunk_int8_fps": round(F_TOTAL / med(chunk_q8), 2),
        "generate_times_fp": [round(t, 3) for t in gen_fp],
        "generate_times_int8": [round(t, 3) for t in gen_q8],
        "chunk_times_fp": [round(t, 3) for t in chunk_fp],
        "chunk_times_int8": [round(t, 3) for t in chunk_q8],
        "generate_times_dot": [round(t, 3) for t in gen_dot],
        "chunk_times_dot": [round(t, 3) for t in chunk_dot],
        "note": "interleaved phases, one process, shared device weights; "
                "generate = encode-side embeds reused, beam decode timed "
                "with scalar-readback close; int8 = per-row symmetric "
                "quant of precomputed cross-K/V (quantize_cross_kv)",
        "device": str(jax.devices()[0]),
    }
    from vidil_tpu.utils.bench_artifact import emit

    emit("decode_int8_ab", record)


if __name__ == "__main__":
    main()
