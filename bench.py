"""Benchmark: CapFilt throughput (frames/sec/chip) on real hardware.

Measures the flagship path — BLIP ViT-B/384 frame captioning with
on-device beam search (beam=3, max_len=20, min_len=5) plus the ITM
filtering pass — at the reference's default CapFilt configuration
(reference: configs/pipeline_config/pipeline_config_msrvtt_train.yaml,
run_video_CapFilt.py:101): 4 frames/video, 384px, BLIP-base.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "compute_fps": N, ...}

value          — upload-excluded chip throughput (frames device-resident):
                 the number that transfers to a production TPU host, where
                 PCIe/DMA upload is hidden by the CLI's prefetch. Stable.
end_to_end_fps — pipelined rate including the host->device upload on THIS
                 dev machine; bounded by the tunnel's bandwidth
                 (~12-45 MB/s depending on time of day), so it swings 2x
                 between runs and under-represents a production host.

Determinism: the decode loop runs with early_exit=False so every iteration
executes all max_length steps — with synthetic weights an early EOS exit
would make the timing depend on where random logits fall.

Transfer: frames ship as planar YUV420 (1.5 B/px; BENCH_TRANSFER=rgb for
the 3 B/px uint8 RGB path), colorspace conversion fused into the encode
program — the production ingest the CLI exposes as transfer_format: yuv420.

vs_baseline: the reference repo publishes no throughput numbers
(BASELINE.md), so the baseline is the ESTIMATED reference rate of its
per-video loop on A100 (decode one video's 4 frames per step through HF
beam search + per-caption ITM loop) ~= 20 frames/s. Recorded explicitly
in the extra fields so the estimate is auditable.
"""

from __future__ import annotations

import json
import os as _os
import time

import numpy as np

BASELINE_FRAMES_PER_SEC_A100_ESTIMATE = 20.0

# v5e peak dense bf16 matmul throughput (one chip): 197 TFLOP/s.
V5E_PEAK_BF16_TFLOPS = 197.0


def analytic_tflops(F_frames: int, videos: int, num_frm: int,
                    itm_rows_per_video: int, itm_text_len: int,
                    image_size: int = 384, patch: int = 16, D: int = 768,
                    layers: int = 12, vocab: int = 30524, beams: int = 3,
                    dec_steps: int = 16, mlp_ratio: int = 4) -> dict:
    """Analytic matmul FLOPs of one CapFilt iteration (ViT-B/384 + MED-base).

    Counts 2*m*n*k per GEMM for the three programs the engine runs:
    encode (captioner ViT + filterer ViT), beam decode (grouped cross-KV:
    one copy per frame, beams share it), grouped ITM (per-frame cross-KV
    + per-(text,frame) text rows). Elementwise/LN/softmax FLOPs are
    excluded (they are bandwidth, not MXU work). Used to FLOP-normalize
    the measured rate into an MFU against the v5e bf16 peak.
    """
    P = (image_size // patch) ** 2 + 1
    d2 = D * D
    m = 4 * mlp_ratio  # MLP GEMM FLOP factor: 2 matmuls x 2mnk x ratio
    # ViT block: qkv+out projections (8PD^2) + attn logits/apply (4P^2D)
    # + MLP (2 * 2*P*D*ratio*D)
    vit_block = (8 + m) * P * d2 + 4 * P * P * D
    vit = 2 * P * D * (patch * patch * 3) + layers * vit_block
    encode = 2 * F_frames * vit  # captioner ViT + filterer ViT

    # beam decode, grouped cross-KV (beams share one copy per frame)
    cross_kv = F_frames * layers * 2 * 2 * P * d2
    per_step_per_seq = (
        layers * ((8 + 4 + m) * d2          # self qkv/out + cross q/out + MLP
                  + 4 * P * D               # cross-attn logits+apply
                  + 2 * dec_steps * D)      # self-attn over the cache (avg)
        + 2 * D * vocab                     # LM head
    )
    decode = cross_kv + F_frames * beams * dec_steps * per_step_per_seq

    # grouped ITM: per-frame cross-KV + (video*frame*text) text-side rows
    Lt = itm_text_len
    itm_kv = videos * num_frm * layers * 2 * 2 * P * d2
    itm_row = layers * ((8 + 4 + m) * Lt * d2 + 4 * Lt * Lt * D + 4 * Lt * P * D)
    itm = itm_kv + videos * num_frm * itm_rows_per_video * itm_row

    total = (encode + decode + itm) / 1e12
    return {
        "total": total,
        "encode": encode / 1e12,
        "decode": decode / 1e12,
        "itm": itm / 1e12,
    }

# 64-video batches measured consistently ~5-10%% faster per frame than 32
# within any one session (r02: 134.8 vs 128.2; r03 same-day: 105.4 vs 97.9
# — absolute rates swing by day with chip/tunnel state, the ordering holds)
VIDEOS_PER_BATCH = int(_os.environ.get("BENCH_VIDEOS", 64))
NUM_FRM = 4
IMAGE_SIZE = 384
ITERS = int(_os.environ.get("BENCH_ITERS", 6))
TRANSFER = _os.environ.get("BENCH_TRANSFER", "yuv420")  # yuv420 | rgb


def log(msg):
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    # persist compiled executables across runs (first compile of the beam
    # program is minutes; cached launches skip it entirely)
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                           _os.path.expanduser("~/.cache/vidil_tpu_jaxcache"))
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.ops.image import YUV420Frames
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer, write_bench_vocab

    # synthetic full-size RETOK-STABLE vocab (weights are random; throughput
    # only): plain-word entries so decode->retokenize is the identity and
    # the fused filter's verification takes its fast path, as it does with
    # a real checkpoint's natural-language captions (write_bench_vocab doc)
    import tempfile, os

    vocab_path = os.path.join(tempfile.gettempdir(), "bench_vocab_stable2.txt")
    write_bench_vocab(vocab_path)
    tok = BlipTokenizer(vocab_path)

    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    # A/B knob: BENCH_FUSED_BLOCK=0 forces the classic flash+XLA encode,
    # =1 forces the whole-layer Pallas kernel; unset = ViTConfig default.
    # Used to separate "the fused kernel regressed the chunk program" from
    # "the chip/tunnel was in a trough" within one session (canary-normalized).
    if _os.environ.get("BENCH_FUSED_BLOCK"):
        import dataclasses

        vit_cfg = dataclasses.replace(
            vit_cfg, use_fused_block=_os.environ["BENCH_FUSED_BLOCK"] == "1")
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm

    log(f"device: {jax.devices()[0]}")

    # chip-health canary: a fixed bf16 matmul chain whose TFLOP/s is
    # workload-independent. The tunnel chip's effective rate swings by
    # time of day (44-168 f/s observed on the SAME code); this field lets
    # any reader separate "the code got slower" from "the chip/tunnel was
    # in a trough when this line was recorded". This serialized
    # square-matmul chain measures ~74 TFLOP/s on a HEALTHY chip (each
    # step depends on the last, so there is no cross-step pipelining);
    # the absolute number is not peak MFU - only the RATIO across runs
    # matters.
    def _canary_tflops():
        K, REPS = 4096, 24

        @jax.jit
        def chain(x):
            def body(c, _):
                return (c @ c) * jnp.bfloat16(1e-3), ()
            out, _ = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(out[:8, :8]).astype(jnp.float32)

        x = jax.jit(lambda: (jnp.sin(jnp.arange(K * K, dtype=jnp.float32))
                             .reshape(K, K) * 1e-3).astype(jnp.bfloat16))()
        float(chain(x))  # compile + warm
        t0 = time.perf_counter()
        float(chain(x))
        dt = time.perf_counter() - t0
        return round(REPS * 2 * K**3 / dt / 1e12, 1)

    canary = _canary_tflops()
    log(f"chip-health canary: {canary} TFLOP/s (bf16 4096^3 chain; "
        f"v5e peak 197)")

    t = time.time()
    # weights are synthesized ON DEVICE by one cheap jitted program (no RNG,
    # no host->TPU transfer): the remote-TPU link's transfer bandwidth and
    # its RNG-program compile times both vary wildly; a sin-fill program
    # compiles and runs in seconds and gives well-conditioned weights
    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))

    from vidil_tpu.utils.synth import synth_tree

    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, salt=1.0),
                                synth_tree(fil_shapes, salt=2.0)))()
    jax.block_until_ready((cap, fil))
    log(f"on-device param synth: {time.time()-t:.1f}s")
    engine = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                           num_beams=3, max_length=20, min_length=5,
                           dtype=jnp.bfloat16,
                           beam_group_kv=_os.environ.get("BENCH_GROUP_KV", "1") == "1",
                           # deterministic step count: with synthetic weights
                           # an early EOS exit makes timing data-dependent
                           early_exit=False)

    F_TOTAL = VIDEOS_PER_BATCH * NUM_FRM
    rng = np.random.RandomState(0)
    if TRANSFER == "yuv420":
        host_frames = YUV420Frames(
            rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE), dtype=np.uint8),
            rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2), dtype=np.uint8),
            rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2), dtype=np.uint8),
        )
        upload_mb = sum(p.nbytes for p in host_frames) / 1e6

        def perturb(i):
            return YUV420Frames(host_frames.y + np.uint8(i % 7), host_frames.u, host_frames.v)

        def slice_video(buf, i):
            s = slice(i * NUM_FRM, (i + 1) * NUM_FRM)
            return YUV420Frames(buf.y[s], buf.u[s], buf.v[s])
    else:
        host_frames = rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8)
        upload_mb = host_frames.nbytes / 1e6

        def perturb(i):
            return host_frames + np.uint8(i % 7)

        def slice_video(buf, i):
            return buf[i * NUM_FRM:(i + 1) * NUM_FRM]

    def make_chunk(dev_frames):
        return [
            {"video_id": f"v{i}", "frames": slice_video(dev_frames, i), "text": []}
            for i in range(VIDEOS_PER_BATCH)
        ]

    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=0.4,
                  filter_mode="max_filter", generation_mode="beam",
                  do_sentence_tokenization=False)

    # warmup (compile); results feed the ITM row count of the FLOP model
    t = time.time()
    warm_results = engine.run_chunk(make_chunk(jax.device_put(perturb(0))), config,
                                    rng=jax.random.PRNGKey(0))
    log(f"warmup (compile): {time.time()-t:.1f}s")

    # analytic FLOPs of one iteration (for MFU): the ITM scores a padded
    # (V, T, F) grid where T is the per-video candidate count bucketed to 4
    from vidil_tpu.pipeline.capfilt import _round_up

    n_texts = [len(r.unfiltered_text) for r in warm_results]
    itm_rows = _round_up(max(n_texts, default=0), 4)
    fl = analytic_tflops(
        F_TOTAL, VIDEOS_PER_BATCH, NUM_FRM,
        # the fused filter runs its ITM rows at the TRIMMED text length
        # (bitwise-equal probs; capfilt.py itm_text_len_fused)
        itm_rows_per_video=itm_rows, itm_text_len=engine.itm_text_len_fused,
        image_size=IMAGE_SIZE, vocab=tok.vocab_size,
        dec_steps=20 - engine.prompt_length)

    # Pipelined steady state, as the CapFilt CLI runs it: the NEXT batch's
    # host->device transfer happens in a background thread while the current
    # batch computes (run_video_CapFilt.py decode-prefetch threads). On the
    # tunneled dev chip the upload dominates a serial iteration; on a real
    # TPU host it is negligible either way.
    import threading

    bufs: dict[int, object] = {}
    upload_times: list[float] = []

    def upload(i):
        # vary content per iter so no transfer/compute layer can cache
        t0 = time.perf_counter()
        buf = jax.device_put(perturb(i))
        jax.block_until_ready(buf)
        upload_times.append(time.perf_counter() - t0)
        bufs[i] = buf

    # Dispatch schedule matches the CapFilt CLI's fused in-flight path
    # (run_video_CapFilt.py): the fused filter removes the mid-chunk host
    # round trip, so keeping ONE chunk in flight (dispatch chunk i+1
    # before completing chunk i) overlaps chunk i's readback + host glue
    # with chunk i+1's device work (+27% on the classic sequential
    # schedule: benchmarks/capfilt_ab_fused.jsonl). With the CLASSIC
    # filter the same overlap measured a wash — the host dependency in
    # the middle of each chunk serializes any schedule — which is why
    # the CLI gates the in-flight schedule on the fused path.
    upload(0)
    iter_times = []
    in_flight = engine.dispatch_chunk(make_chunk(bufs.pop(0)), config,
                                      rng=jax.random.PRNGKey(0))
    upload(1)
    for it in range(ITERS):
        t0 = time.perf_counter()
        th = threading.Thread(target=upload, args=(it + 2,))
        th.start()
        nxt = engine.dispatch_chunk(make_chunk(bufs.pop(it + 1)), config,
                                    rng=jax.random.PRNGKey(it + 1))
        engine.complete_chunk(in_flight)
        in_flight = nxt
        th.join()
        iter_times.append(time.perf_counter() - t0)
        log(f"iter {it}: {iter_times[-1]:.2f}s (upload {upload_times[-1]:.2f}s)")
    engine.complete_chunk(in_flight)

    # compute-only: frames already device-resident (alternate two buffers),
    # same one-chunk-in-flight schedule, steady state (fill excluded)
    dev_a = bufs.pop(ITERS + 1)
    dev_b = jax.device_put(perturb(ITERS + 2))
    jax.block_until_ready((dev_a, dev_b))
    compute_times = []
    in_flight = engine.dispatch_chunk(make_chunk(dev_a), config,
                                      rng=jax.random.PRNGKey(100))
    for it in range(ITERS):
        t0 = time.perf_counter()
        nxt = engine.dispatch_chunk(make_chunk(dev_b if it % 2 == 0 else dev_a),
                                    config, rng=jax.random.PRNGKey(101 + it))
        engine.complete_chunk(in_flight)
        in_flight = nxt
        compute_times.append(time.perf_counter() - t0)
        log(f"compute-only iter {it}: {compute_times[-1]:.2f}s")
    engine.complete_chunk(in_flight)
    log(f"fused-filter fallbacks: {engine.fused_fallback_videos}/{engine.fused_total_videos} videos")

    # median: robust to host CPU-steal / tunnel-rate spikes on shared boxes
    dt = float(np.median(iter_times))
    dt_c = float(np.median(compute_times))
    dt_u = float(np.median(upload_times))
    fps_e2e = F_TOTAL / dt
    fps = F_TOTAL / dt_c
    mfu = fl["total"] / dt_c / V5E_PEAK_BF16_TFLOPS
    record = {
        # metric name carries the 'compute' qualifier: value is the
        # upload-excluded chip throughput (stable across the dev tunnel's
        # 3x time-of-day bandwidth swings, and the rate a PCIe-attached
        # production host sees end-to-end since prefetch hides its
        # upload). The tunnel-bound end-to-end rate is reported alongside
        # (end_to_end_fps). Rounds r01-r02 reported the metric under the
        # name capfilt_caption_filter_throughput (r01 value = end-to-end,
        # r02 value = compute) — renamed so the series isn't conflated.
        "metric": "capfilt_caption_filter_compute_throughput",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC_A100_ESTIMATE, 3),
        "tflops_per_iter": round(fl["total"], 2),
        "tflops_split": {k: round(v, 2) for k, v in fl.items() if k != "total"},
        "tflops_per_sec": round(fl["total"] / dt_c, 1),
        "mfu": round(mfu, 4),
        "mfu_note": f"analytic matmul FLOPs / measured compute time / v5e bf16 peak "
                    f"{V5E_PEAK_BF16_TFLOPS:.0f} TFLOP/s; elementwise excluded",
        "end_to_end_fps": round(fps_e2e, 2),
        "end_to_end_vs_baseline": round(fps_e2e / BASELINE_FRAMES_PER_SEC_A100_ESTIMATE, 3),
        "compute_s_median": round(dt_c, 3),
        "upload_s_median": round(dt_u, 3),
        "upload_mb": round(upload_mb, 1),
        "config": f"BLIP-base {IMAGE_SIZE}px, {NUM_FRM} frm/video, beam=3 fixed 20-step decode "
                  f"(early_exit off), ITM max_filter, bf16, batch={VIDEOS_PER_BATCH} videos, "
                  f"grouped-KV decode, {TRANSFER} ingest, pipelined upload, fused filter "
                  f"with one chunk in flight (the CLI's schedule; times are steady-state "
                  f"per-chunk, readback+glue overlapped with the next chunk's device work)",
        "fused_vit_block": vit_cfg.use_fused_block,
        "fused_fallback_videos": engine.fused_fallback_videos,
        "fused_total_videos": engine.fused_total_videos,
        "variance_note": "end_to_end_fps is bounded by the dev tunnel's host->device rate "
                         "(~5-45 MB/s by time of day; 44-151 f/s observed); value is the "
                         "upload-excluded chip throughput (98-135 f/s sequential-schedule "
                         "rounds 2-3; 155-168 with the fused in-flight schedule "
                         "(166-168 after the ITM text-length trim); swings "
                         "with chip/tunnel state by day, stable within a session)",
        "baseline_note": f"reference publishes no throughput; baseline = estimated A100 "
                         f"per-video-loop rate {BASELINE_FRAMES_PER_SEC_A100_ESTIMATE} frames/s",
        "chip_canary_tflops": canary,
        "chip_canary_note": "fixed bf16 4096^3 serialized matmul chain, "
                            "workload-independent; reads ~74 on a healthy "
                            "chip (chain is latency-bound by design, not "
                            "peak MFU), a chip/tunnel trough reads a "
                            "fraction - compare ACROSS runs to normalize",
        "device": str(jax.devices()[0]),
    }
    # stdout contract: exactly ONE JSON line; the artifact copy (stamped)
    # goes to benchmarks/capfilt.jsonl for round-over-round diffing
    from vidil_tpu.utils.bench_artifact import emit

    emit("capfilt", record, print_line=False)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
