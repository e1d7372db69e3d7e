"""A/B: sequential run_chunk vs cross-chunk pipelined dispatch, one session.

Settles whether enqueueing chunk i+1's programs before completing chunk i
(bench.py / run_video_CapFilt.py since commit 4d9e0c2) helps or hurts on
this backend. Phases alternate seq→pipe→seq→pipe within ONE process on the
same engine and device buffers, so chip/tunnel day-variance cannot confound
the comparison (r03 saw 125 f/s sequential at 11:46 vs 102 f/s pipelined at
12:58 — different runs, ambiguous).

Writes one JSON line to benchmarks/capfilt_ab_pipeline.jsonl.
"""

from __future__ import annotations

import json
import os as _os
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

VIDEOS = int(_os.environ.get("BENCH_VIDEOS", 64))
NUM_FRM = 4
IMAGE_SIZE = 384
ITERS = int(_os.environ.get("BENCH_ITERS", 4))   # per phase
PHASES = int(_os.environ.get("BENCH_PHASES", 2))  # seq+pipe pairs


def log(msg):
    print(f"[ab] {msg}", file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab
    import tempfile

    vocab_path = _os.path.join(tempfile.gettempdir(), "bench_vocab.txt")
    write_test_vocab(vocab_path, [f"tok{i}" for i in range(30418)])
    tok = BlipTokenizer(vocab_path)
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm

    log(f"device: {jax.devices()[0]}")
    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))

    from vidil_tpu.utils.synth import synth_tree

    t = time.time()
    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, salt=1.0),
                                synth_tree(fil_shapes, salt=2.0)))()
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

    t = time.time()
    engine.run_chunk(make_chunk(dev_a), config, rng=jax.random.PRNGKey(0))
    log(f"warmup {time.time()-t:.1f}s")

    def phase_seq(k):
        times = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            engine.run_chunk(make_chunk(dev_a if it % 2 else dev_b), config,
                             rng=jax.random.PRNGKey(1000 * k + it))
            times.append(time.perf_counter() - t0)
            log(f"  seq iter {it}: {times[-1]:.3f}s")
        return times

    def phase_pipe(k):
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
            log(f"  pipe iter {it}: {times[-1]:.3f}s")
        engine.complete_chunk(in_flight)
        return times

    seq_times, pipe_times = [], []
    for k in range(PHASES):
        log(f"phase {k}: sequential")
        seq_times += phase_seq(k)
        log(f"phase {k}: pipelined")
        pipe_times += phase_pipe(k)

    seq_med = float(np.median(seq_times))
    pipe_med = float(np.median(pipe_times))
    record = {
        "metric": "capfilt_seq_vs_pipelined_dispatch",
        "videos": VIDEOS, "num_frm": NUM_FRM, "iters_per_phase": ITERS,
        "phases": PHASES,
        "seq_s_median": round(seq_med, 3),
        "pipe_s_median": round(pipe_med, 3),
        "seq_fps": round(F_TOTAL / seq_med, 2),
        "pipe_fps": round(F_TOTAL / pipe_med, 2),
        "seq_times": [round(t, 3) for t in seq_times],
        "pipe_times": [round(t, 3) for t in pipe_times],
        "note": "interleaved phases, one process, device-resident frames; "
                "pipe = one chunk's dispatch in flight across complete_chunk",
        "device": str(jax.devices()[0]),
    }
    from vidil_tpu.utils.bench_artifact import emit

    emit("capfilt_ab_pipeline", record)


if __name__ == "__main__":
    main()
