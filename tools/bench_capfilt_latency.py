"""Online-serving latency: one CapFilt request (a single video) end to end.

Throughput benches (bench.py) batch 64 videos/chunk; a serving deployment
also cares about the latency of ONE video (4 frames @384px): captioner
encode -> 3-beam 20-step decode -> filterer encode -> fused ITM, one
device chain + one readback. Measures steady-state wall latency per
request at batch sizes 1 / 4 / 8 (requests of a small queue batched
together), inputs synthesized on device. Emits one JSON line to
benchmarks/capfilt_latency.jsonl.
"""

from __future__ import annotations

import os as _os
import sys
import time

import numpy as np

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

NUM_FRM = 4
IMAGE_SIZE = 384
ITERS = int(_os.environ.get("BENCH_ITERS", 8))


def log(msg):
    print(f"[latency] {msg}", file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_bench_vocab
    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
    from vidil_tpu.utils.synth import synth_tree
    from vidil_tpu.ops.image import YUV420Frames
    import tempfile

    vocab_path = _os.path.join(tempfile.gettempdir(), "bench_vocab_stable2.txt")
    write_bench_vocab(vocab_path)
    tok = BlipTokenizer(vocab_path)
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)
    log(f"device: {jax.devices()[0]}")

    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))
    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, 1.0), synth_tree(fil_shapes, 2.0)))()
    jax.block_until_ready((cap, fil))

    engine = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                           num_beams=3, max_length=20, min_length=5,
                           dtype=jnp.bfloat16, beam_group_kv=True,
                           early_exit=False)

    def synth_frames(n_videos, salt):
        F = n_videos * NUM_FRM

        def plane(h, w, s):
            v = jnp.sin(jnp.arange(F * h * w, dtype=jnp.float32) * 0.019 + s)
            return (v * 127 + 128).astype(jnp.uint8).reshape(F, h, w)

        return YUV420Frames(plane(IMAGE_SIZE, IMAGE_SIZE, salt),
                            plane(IMAGE_SIZE // 2, IMAGE_SIZE // 2, salt + 1),
                            plane(IMAGE_SIZE // 2, IMAGE_SIZE // 2, salt + 2))

    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=0.4,
                  filter_mode="max_filter", generation_mode="beam",
                  do_sentence_tokenization=False)

    results = {}
    for n_videos in (1, 4, 8):
        bufs = [jax.jit(lambda s=s, n=n_videos: synth_frames(n, float(s)))()
                for s in (0, 3)]
        float(jnp.sum(bufs[0].y[:1, :1, :4]))

        def make_chunk(buf):
            def sl(i):
                s = slice(i * NUM_FRM, (i + 1) * NUM_FRM)
                return YUV420Frames(buf.y[s], buf.u[s], buf.v[s])
            return [{"video_id": f"v{i}", "frames": sl(i), "text": []}
                    for i in range(n_videos)]

        t = time.time()
        engine.run_chunk(make_chunk(bufs[0]), config, rng=jax.random.PRNGKey(0))
        log(f"batch {n_videos}: warmup (compile) {time.time()-t:.1f}s")
        ts = []
        for it in range(ITERS):
            t0 = time.perf_counter()
            engine.run_chunk(make_chunk(bufs[it % 2]), config,
                             rng=jax.random.PRNGKey(10 + it))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        results[n_videos] = {
            "latency_ms_median": round(med * 1e3, 1),
            "latency_ms_per_video": round(med * 1e3 / n_videos, 1),
            "times_ms": [round(t * 1e3, 1) for t in ts],
        }
        log(f"batch {n_videos}: median {med*1e3:.0f} ms "
            f"({med*1e3/n_videos:.0f} ms/video)")

    from vidil_tpu.utils.bench_artifact import emit

    emit("capfilt_latency", {
        "metric": "capfilt_single_request_latency",
        "value": results[1]["latency_ms_median"],
        "unit": "ms",
        "batches": results,
        "config": "BLIP-base 384px, 4 frm/video, 3-beam fixed 20-step "
                  "decode, fused ITM max_filter, bf16, grouped KV, "
                  "device-synth frames (no ingest), sequential run_chunk",
        "note": "steady-state request latency incl. the ~30 ms tunnel "
                "readback RTT; a PCIe-attached host sees less",
        "device": str(jax.devices()[0]),
    })


if __name__ == "__main__":
    main()
