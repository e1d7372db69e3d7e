"""A/B: decode-structure flags in the CapFilt beam decode.

The step isolation (benchmarks/capfilt_profile.jsonl, PROF_STEPX rows)
attributes ~2.9 ms/step to the layer scan re-stacking the whole self-K/V
cache through its ys and 2.3-2.8 ms/step to the physical beam reorder.
``decode_layer_unroll`` (per-layer cache arrays + python-unrolled layers)
and ``decode_lazy_reorder`` (ancestry-gather instead of permuting the
cache) remove those with BIT-IDENTICAL outputs (tests/test_generation.py).

This harness measures, interleaved in one process on the same synthesized
weights/frames:
  1. per-engine warmup/compile time (compile-time blowups are what sank
     the fused-block default — bench.py must stay inside its budget);
  2. exact token identity across all four flag combinations;
  3. the isolated generate program (encode embeds reused, scalar-readback
     close) for stock / unroll / lazy / both;
  4. the full run_chunk rate for stock vs the fastest variant.

Writes one JSON line to benchmarks/decode_struct_ab.jsonl.
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
    print(f"[ab-struct] {msg}", file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import tempfile

    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_bench_vocab
    from vidil_tpu.utils.synth import synth_tree

    vocab_path = _os.path.join(tempfile.gettempdir(), "bench_vocab_stable2.txt")
    write_bench_vocab(vocab_path)
    tok = BlipTokenizer(vocab_path)
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    log(f"device: {jax.devices()[0]}")
    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))
    t = time.time()
    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, 1.0), synth_tree(fil_shapes, 2.0)))()
    jax.block_until_ready((cap, fil))
    log(f"param synth {time.time()-t:.1f}s")

    kw = dict(num_beams=3, max_length=20, min_length=5, dtype=jnp.bfloat16,
              beam_group_kv=True, early_exit=False)
    engines = {
        "stock": CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg, **kw),
        "unroll": CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                                decode_layer_unroll=True, **kw),
        "lazy": CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                              decode_lazy_reorder=True, **kw),
        "both": CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                              decode_layer_unroll=True,
                              decode_lazy_reorder=True, **kw),
    }

    F_TOTAL = VIDEOS * NUM_FRM
    from vidil_tpu.ops.image import YUV420Frames

    # on-device sin-fill synthesis (a 113 MB device_put can hang >15 min
    # in a tunnel stall trough — see CLAUDE.md)
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

    embeds = engines["stock"].encode_captioner(dev_a)
    float(jnp.sum(embeds[:1, :1, :1]))
    log(f"embeds ready: {embeds.shape}")

    # --- warmup compiles (timed: compile blowups are a real failure mode
    # on the remote-compile service) + exact-identity check
    warm_s, seqs0 = {}, {}
    for name, eng in engines.items():
        t0 = time.perf_counter()
        seqs = eng.generate_beam(embeds, jax.random.PRNGKey(0))
        seqs0[name] = np.asarray(seqs)
        warm_s[name] = round(time.perf_counter() - t0, 1)
        log(f"warmup {name}: {warm_s[name]}s")
    identical = {n: bool(np.array_equal(seqs0["stock"], s))
                 for n, s in seqs0.items()}
    log(f"token identity vs stock: {identical}")
    # CPU compilations are bit-identical across all four variants
    # (tests/test_generation.py); on TPU the unrolled per-layer bodies can
    # fuse/tile differently in bf16 than the scanned body, flipping beam
    # ties — record how often
    tok_agree = {n: round(float(np.mean(seqs0["stock"] == s)), 4)
                 for n, s in seqs0.items()}
    row_agree = {n: round(float(np.mean(np.all(seqs0["stock"] == s, axis=-1))), 4)
                 for n, s in seqs0.items()}
    log(f"token agreement vs stock: {tok_agree}; identical rows: {row_agree}")

    def time_generate(eng, k):
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            seqs = eng.generate_beam(embeds, jax.random.PRNGKey(100 * k + it))
            float(jnp.sum(seqs))  # host readback closes the timing
            ts.append(time.perf_counter() - t0)
        return ts

    gen_times = {n: [] for n in engines}
    for k in range(PHASES):
        for name, eng in engines.items():
            gen_times[name] += time_generate(eng, k)
            log(f"phase {k} generate {name}: "
                f"{[round(t, 3) for t in gen_times[name][-ITERS:]]}")

    med = lambda ts: float(np.median(ts))
    gen_med = {n: round(med(ts), 3) for n, ts in gen_times.items()}
    best = min(gen_med, key=gen_med.get)
    log(f"generate medians {gen_med}; best={best}")

    # --- full chunk: stock vs best variant (skip if stock wins) ---
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

    def time_chunk(eng, k):
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            eng.run_chunk(make_chunk(dev_a if it % 2 else dev_b), config,
                          rng=jax.random.PRNGKey(500 * k + it))
            ts.append(time.perf_counter() - t0)
        return ts

    chunk_names = ["stock"] + ([best] if best != "stock" else [])
    chunk_warm_s, chunk_times = {}, {n: [] for n in chunk_names}
    for name in chunk_names:
        t0 = time.perf_counter()
        engines[name].run_chunk(make_chunk(dev_a), config,
                                rng=jax.random.PRNGKey(9))
        chunk_warm_s[name] = round(time.perf_counter() - t0, 1)
        log(f"chunk warmup {name}: {chunk_warm_s[name]}s")
    for k in range(PHASES):
        for name in chunk_names:
            chunk_times[name] += time_chunk(engines[name], k)
            log(f"phase {k} chunk {name}: "
                f"{[round(t, 3) for t in chunk_times[name][-ITERS:]]}")

    chunk_med = {n: round(med(ts), 3) for n, ts in chunk_times.items()}
    record = {
        "metric": "decode_struct_ab",
        "videos": VIDEOS, "num_frm": NUM_FRM, "iters_per_phase": ITERS,
        "phases": PHASES,
        "token_identical_vs_stock": identical,
        "token_agreement_vs_stock": tok_agree,
        "identical_rows_vs_stock": row_agree,
        "generate_warmup_s": warm_s,
        "generate_s_median": gen_med,
        "generate_speedup_vs_stock": {
            n: round(gen_med["stock"] / v, 3) for n, v in gen_med.items()},
        "best_variant": best,
        "chunk_warmup_s": chunk_warm_s,
        "chunk_s_median": chunk_med,
        "chunk_fps": {n: round(F_TOTAL / v, 2) for n, v in chunk_med.items()},
        "chunk_speedup_vs_stock": (
            round(chunk_med["stock"] / chunk_med[best], 3)
            if best in chunk_med else 1.0),
        "generate_times": {n: [round(t, 3) for t in ts]
                           for n, ts in gen_times.items()},
        "chunk_times": {n: [round(t, 3) for t in ts]
                        for n, ts in chunk_times.items()},
        "note": "interleaved phases, one process, shared device weights; "
                "unroll = decode_layer_unroll (per-layer cache arrays, no "
                "scan-ys restack), lazy = decode_lazy_reorder (ancestry "
                "gather, cache rows never move). Logic-identical (CPU f32 "
                "tests assert bit-equality for every combo); on TPU bf16 "
                "the unrolled bodies fuse/round differently than the "
                "scanned body and beam search amplifies ulp flips — see "
                "token_agreement_vs_stock. lazy stays bit-identical on "
                "TPU.",
        "device": str(jax.devices()[0]),
    }
    from vidil_tpu.utils.bench_artifact import emit

    emit("decode_struct_ab", record)


if __name__ == "__main__":
    main()
