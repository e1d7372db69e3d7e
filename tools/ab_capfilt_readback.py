"""A/B: early vs late caption-token readback request in CapFilt dispatch.

Hypothesis tested: if D2H transfers execute FIFO with programs on this
backend, requesting the caption-token copy only at complete_chunk time
(the natural np.asarray) makes it wait out the filter-side ViT encode
that dispatch_chunk enqueued after the decode (~0.47 s at batch 64),
while a copy_to_host_async requested BETWEEN the decode and the filter
encode (CapFiltEngine early_readback=True) would let the host glue
overlap the filter encode.

RESULT (2026-08-17, batch 64): neutral — late 2.093 s vs early 2.085 s
median, within noise. The backend evidently does not serialize the
readback behind the later-enqueued encode, so both schedules see the
same overlap. early_readback stays ON (free; can only help on hosts
with independent DMA).

Phases alternate late→early→late→early within one process on the same
engine weights and device buffers (only the flag flips), so day variance
cannot confound. Writes one JSON line to
benchmarks/capfilt_ab_readback.jsonl.
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

    def phase(flag, k):
        engine.early_readback = flag
        times = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            engine.run_chunk(make_chunk(dev_a if it % 2 else dev_b), config,
                             rng=jax.random.PRNGKey(1000 * k + it))
            times.append(time.perf_counter() - t0)
            log(f"  {'early' if flag else 'late '} iter {it}: {times[-1]:.3f}s")
        return times

    late_times, early_times = [], []
    for k in range(PHASES):
        log(f"phase {k}: late readback")
        late_times += phase(False, k)
        log(f"phase {k}: early readback")
        early_times += phase(True, k)

    late_med = float(np.median(late_times))
    early_med = float(np.median(early_times))
    record = {
        "metric": "capfilt_late_vs_early_readback",
        "videos": VIDEOS, "num_frm": NUM_FRM, "iters_per_phase": ITERS,
        "phases": PHASES,
        "late_s_median": round(late_med, 3),
        "early_s_median": round(early_med, 3),
        "late_fps": round(F_TOTAL / late_med, 2),
        "early_fps": round(F_TOTAL / early_med, 2),
        "late_times": [round(t, 3) for t in late_times],
        "early_times": [round(t, 3) for t in early_times],
        "note": "interleaved phases, one process, device-resident frames; "
                "early = copy_to_host_async on caption tokens before the "
                "filter encode enters the queue",
        "device": str(jax.devices()[0]),
    }
    from vidil_tpu.utils.bench_artifact import emit

    emit("capfilt_ab_readback", record)


if __name__ == "__main__":
    main()
