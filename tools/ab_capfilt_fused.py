"""A/B/C: classic filter vs fused on-device ITM ids vs fused + in-flight.

The fused filter (pipeline/fused_filter.py) removes the host round trip
from the middle of every CapFilt chunk: the ITM text ids are built on
device from the generated sequences, so encode -> decode -> filter
encode -> ITM enqueue as one chain, and the caption/prob readbacks are
requested before any later work. That also changes the cross-chunk
calculus: with no mid-chunk host dependency, dispatching chunk i+1
before completing chunk i should let the host glue (detokenize, dedup,
verification re-tokenize, assembly) fully overlap device work — the
variant that measured a wash for the classic path
(benchmarks/capfilt_ab_pipeline.jsonl).

Phases interleave classic -> fused -> fused+inflight, twice, in one
process on the same weights/buffers. Writes one JSON line to
benchmarks/capfilt_ab_fused.jsonl.
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
    print(f"[ab] {msg}", file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_bench_vocab
    import tempfile

    # RETOK-STABLE synthetic vocab (see write_bench_vocab's docstring for
    # why the [unusedN] layout of write_test_vocab would force the fused
    # filter into permanent fallback and poison the A/B)
    vocab_path = _os.path.join(tempfile.gettempdir(), "bench_vocab_stable2.txt")
    write_bench_vocab(vocab_path)
    tok = BlipTokenizer(vocab_path)
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm

    log(f"device: {jax.devices()[0]}")
    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))


    t = time.time()
    from vidil_tpu.utils.synth import synth_tree

    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, 1.0), synth_tree(fil_shapes, 2.0)))()
    jax.block_until_ready((cap, fil))
    log(f"param synth {time.time()-t:.1f}s")

    engine = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                           num_beams=3, max_length=20, min_length=5,
                           dtype=jnp.bfloat16, beam_group_kv=True,
                           early_exit=False)

    F_TOTAL = VIDEOS * NUM_FRM
    rng = np.random.RandomState(0)
    from vidil_tpu.ops.image import YUV420Frames

    host = YUV420Frames(
        rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE), dtype=np.uint8),
        rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2), dtype=np.uint8),
        rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2), dtype=np.uint8),
    )
    dev_a = jax.device_put(host)
    dev_b = jax.device_put(YUV420Frames(host.y + np.uint8(3), host.u, host.v))
    jax.block_until_ready((dev_a, dev_b))
    log("frames uploaded")

    def slice_video(buf, i):
        s = slice(i * NUM_FRM, (i + 1) * NUM_FRM)
        return YUV420Frames(buf.y[s], buf.u[s], buf.v[s])

    def make_chunk(buf):
        return [{"video_id": f"v{i}", "frames": slice_video(buf, i), "text": []}
                for i in range(VIDEOS)]

    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=0.4,
                  filter_mode="max_filter", generation_mode="beam",
                  do_sentence_tokenization=False)

    # warmup both paths' compiles + pin identical outputs on-chip
    t = time.time()
    engine.fused_filter = False
    r_classic = engine.run_chunk(make_chunk(dev_a), config, rng=jax.random.PRNGKey(0))
    engine.fused_filter = True
    r_fused = engine.run_chunk(make_chunk(dev_a), config, rng=jax.random.PRNGKey(0))
    same = [(r.video_id, r.unfiltered_text, r.text) for r in r_classic] == \
           [(r.video_id, r.unfiltered_text, r.text) for r in r_fused]
    log(f"warmup {time.time()-t:.1f}s; fused==classic on-chip: {same}; "
        f"fallback {engine.fused_fallback_videos}/{engine.fused_total_videos}")

    def phase_seq(fused, k):
        engine.fused_filter = fused
        times = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            engine.run_chunk(make_chunk(dev_a if it % 2 else dev_b), config,
                             rng=jax.random.PRNGKey(1000 * k + it))
            times.append(time.perf_counter() - t0)
            log(f"  {'fused  ' if fused else 'classic'} iter {it}: {times[-1]:.3f}s")
        return times

    def phase_inflight(k):
        engine.fused_filter = True
        times = []
        in_flight = engine.dispatch_chunk(make_chunk(dev_a), config,
                                          rng=jax.random.PRNGKey(2000 * k))
        for it in range(ITERS):
            t0 = time.perf_counter()
            nxt = engine.dispatch_chunk(make_chunk(dev_a if it % 2 else dev_b),
                                        config, rng=jax.random.PRNGKey(2000 * k + it + 1))
            engine.complete_chunk(in_flight)
            in_flight = nxt
            times.append(time.perf_counter() - t0)
            log(f"  fused+if iter {it}: {times[-1]:.3f}s")
        engine.complete_chunk(in_flight)
        return times

    classic_t, fused_t, inflight_t = [], [], []
    for k in range(PHASES):
        log(f"phase {k}: classic")
        classic_t += phase_seq(False, k)
        log(f"phase {k}: fused sequential")
        fused_t += phase_seq(True, k)
        log(f"phase {k}: fused + one chunk in flight")
        inflight_t += phase_inflight(k)

    med = lambda ts: float(np.median(ts))
    record = {
        "metric": "capfilt_classic_vs_fused_filter",
        "videos": VIDEOS, "num_frm": NUM_FRM, "iters_per_phase": ITERS,
        "phases": PHASES,
        "outputs_identical_on_chip": bool(same),
        "fused_fallback_videos": engine.fused_fallback_videos,
        "fused_total_videos": engine.fused_total_videos,
        "classic_s_median": round(med(classic_t), 3),
        "fused_s_median": round(med(fused_t), 3),
        "fused_inflight_s_median": round(med(inflight_t), 3),
        "classic_fps": round(F_TOTAL / med(classic_t), 2),
        "fused_fps": round(F_TOTAL / med(fused_t), 2),
        "fused_inflight_fps": round(F_TOTAL / med(inflight_t), 2),
        "classic_times": [round(t, 3) for t in classic_t],
        "fused_times": [round(t, 3) for t in fused_t],
        "fused_inflight_times": [round(t, 3) for t in inflight_t],
        "note": "interleaved phases, one process, device-resident frames; "
                "fused = ITM ids built on device from generated seqs "
                "(host verify + classic fallback); inflight = dispatch "
                "chunk i+1 before completing chunk i",
        "device": str(jax.devices()[0]),
    }
    from vidil_tpu.utils.bench_artifact import emit

    emit("capfilt_ab_fused", record)


if __name__ == "__main__":
    main()
