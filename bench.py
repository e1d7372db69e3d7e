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

Un-timeout-able by construction (round-4 lesson: BENCH_r04.json was
rc=124 — a cold compile under the driver's wall clock converted the whole
round's headline into a timeout):
  * a watchdog thread emits the best-available record as the ONE JSON
    line and exits 0 when BENCH_TIME_BUDGET seconds (default 480) elapse
    — a hung compile or a tunnel stall degrades the record, never the
    emission;
  * the headline compute-only phase runs on frames SYNTHESIZED ON DEVICE
    (no host->device bulk transfer — the tunnel has multi-minute ~5 MB/s
    troughs), ordered FIRST;
  * the host-upload end-to-end phase runs only with budget to spare
    (skippable via BENCH_E2E=0), and iteration counts adapt to the
    remaining budget.

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
import threading
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
# Wall-clock budget: the watchdog emits whatever is measured so far and
# exits 0 at this deadline. Default is set well under any plausible
# driver timeout; a warm-cache run finishes in ~3-4 min.
TIME_BUDGET_S = float(_os.environ.get("BENCH_TIME_BUDGET", 480))

_T0 = time.time()
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def log(msg):
    import sys

    print(f"[bench] +{time.time()-_T0:5.1f}s {msg}", file=sys.stderr, flush=True)


def _emit_once(record: dict) -> None:
    """Print exactly ONE JSON line to stdout (stdout contract) and append
    the stamped copy to benchmarks/capfilt.jsonl. Safe to race: the
    watchdog and the main path both funnel through here."""
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    try:
        from vidil_tpu.utils.bench_artifact import emit

        emit("capfilt", record, print_line=False)
    except Exception:
        pass
    print(json.dumps(record), flush=True)
    import sys

    sys.stdout.flush()


def _arm_watchdog(shared: dict) -> None:
    """Emit `shared` (the progressively-updated record) and hard-exit 0 if
    the budget elapses before the main path emits. A blocked XLA compile
    or a stalled tunnel device_put cannot be interrupted from Python, so
    the only reliable guarantee is emit-then-_exit from a daemon thread."""

    def fire():
        deadline = _T0 + TIME_BUDGET_S
        while time.time() < deadline:
            if _EMITTED:
                return
            time.sleep(1.0)
        if _EMITTED:
            return
        rec = dict(shared)
        rec.setdefault("value", 0.0)
        rec.setdefault("vs_baseline", 0.0)
        rec["degraded"] = (f"watchdog: BENCH_TIME_BUDGET={TIME_BUDGET_S:.0f}s "
                           f"elapsed during phase '{rec.get('phase', '?')}'; "
                           f"emitting best-available record")
        log(f"WATCHDOG fired in phase {rec.get('phase')!r} — emitting partial "
            f"record and exiting 0")
        _emit_once(rec)
        _os._exit(0)

    threading.Thread(target=fire, daemon=True, name="bench-watchdog").start()


def _remaining() -> float:
    return _T0 + TIME_BUDGET_S - time.time()


def main():
    # persist compiled executables across runs (first compile of the beam
    # program is minutes; cached launches skip it). NOTE: must go through
    # jax.config.update — this jax build IGNORES the env var (see
    # vidil_tpu/utils/jaxcache.py; the setdefault we used through r4 was a
    # silent no-op and every bench run cold-compiled everything).
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    # the base record the watchdog emits if a phase hangs; updated in place
    shared: dict = {
        "metric": "capfilt_caption_filter_compute_throughput",
        "value": 0.0,
        "unit": "frames/sec/chip",
        "vs_baseline": 0.0,
        "phase": "import",
        "time_budget_s": TIME_BUDGET_S,
    }
    _arm_watchdog(shared)

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
    fused_env = _os.environ.get("BENCH_FUSED_BLOCK")
    if fused_env is not None and fused_env != "":
        if fused_env not in ("0", "1"):
            raise SystemExit(
                f"BENCH_FUSED_BLOCK={fused_env!r} — must be '0' or '1' "
                f"(anything else would silently run fused-OFF and mislabel "
                f"the A/B)")
        import dataclasses

        vit_cfg = dataclasses.replace(vit_cfg, use_fused_block=fused_env == "1")
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm

    dev0 = jax.devices()[0]
    log(f"device: {dev0}")
    shared["device"] = str(dev0)
    # the EFFECTIVE encode dispatch, not just the config flag: the gate in
    # models/vit.py:158 self-disables under remat / non-128-multiple
    # hidden / off-TPU, so the config flag alone could mislabel the run
    fused_effective = (vit_cfg.use_fused_block and not vit_cfg.remat
                       and vit_cfg.hidden_size % 128 == 0
                       and dev0.platform == "tpu")
    shared["fused_vit_block"] = vit_cfg.use_fused_block
    shared["fused_vit_block_effective"] = fused_effective

    # chip-health canary: a fixed bf16 matmul chain whose TFLOP/s is
    # workload-independent. The tunnel chip's effective rate swings by
    # time of day (44-168 f/s observed on the SAME code); this field lets
    # any reader separate "the code got slower" from "the chip/tunnel was
    # in a trough when this line was recorded". This serialized
    # square-matmul chain measures ~74 TFLOP/s on a HEALTHY chip (each
    # step depends on the last, so there is no cross-step pipelining);
    # the absolute number is not peak MFU - only the RATIO across runs
    # matters.
    shared["phase"] = "canary"

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
    shared["chip_canary_tflops"] = canary

    shared["phase"] = "param-synth"
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

    # ---- frame buffers -------------------------------------------------
    # The HEADLINE phase runs on frames synthesized ON DEVICE: a 57-113 MB
    # host upload over the dev tunnel can stall >15 min in a bandwidth
    # trough (CLAUDE.md), which round 4 learned converts the round's
    # number into rc=124. Host buffers are built lazily, only for the
    # budget-gated end-to-end phase.
    shared["phase"] = "frame-synth"

    # Uniform pseudo-random bytes via a multiply-xorshift hash — NOT a sin
    # fill: structured (sinusoidal) frames made the synthetic captions trip
    # the fused-filter host-verify fallback 6x more often than the random
    # host frames the committed baselines used (20/512 vs 3/960 videos),
    # which serializes host work into the chunk chain and cost ~15% on the
    # measured rate. Hash noise reproduces the random-frame behavior with
    # zero host->device transfer.
    def _hash_noise_u8(n_elems: int, salt: int):
        i = jnp.arange(n_elems, dtype=jnp.uint32) + jnp.uint32(salt)
        v = i * jnp.uint32(2654435761)
        v = v ^ (v >> 15)
        v = v * jnp.uint32(2246822519)
        v = v ^ (v >> 13)
        return (v & jnp.uint32(0xFF)).astype(jnp.uint8)

    def synth_dev_frames(salt: int):
        if TRANSFER == "yuv420":
            @jax.jit
            def make():
                def plane(n, h, w, s):
                    return _hash_noise_u8(n * h * w, s).reshape(n, h, w)

                return YUV420Frames(
                    plane(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE, salt),
                    plane(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2, salt + 1),
                    plane(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2, salt + 2),
                )

            buf = make()
            jax.block_until_ready(buf)
            return buf

        @jax.jit
        def make_rgb():
            return _hash_noise_u8(F_TOTAL * IMAGE_SIZE * IMAGE_SIZE * 3,
                                  salt).reshape(
                F_TOTAL, IMAGE_SIZE, IMAGE_SIZE, 3)

        buf = make_rgb()
        jax.block_until_ready(buf)
        return buf

    if TRANSFER == "yuv420":
        upload_mb = F_TOTAL * IMAGE_SIZE * IMAGE_SIZE * 1.5 / 1e6

        def host_frames_and_tools():
            rng = np.random.RandomState(0)
            host = YUV420Frames(
                rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE), dtype=np.uint8),
                rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2), dtype=np.uint8),
                rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE // 2, IMAGE_SIZE // 2), dtype=np.uint8),
            )

            def perturb(i):
                return YUV420Frames(host.y + np.uint8(i % 7), host.u, host.v)

            return perturb

        def slice_video(buf, i):
            s = slice(i * NUM_FRM, (i + 1) * NUM_FRM)
            return YUV420Frames(buf.y[s], buf.u[s], buf.v[s])
    else:
        upload_mb = F_TOTAL * IMAGE_SIZE * IMAGE_SIZE * 3 / 1e6

        def host_frames_and_tools():
            rng = np.random.RandomState(0)
            host = rng.randint(0, 256, size=(F_TOTAL, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8)

            def perturb(i):
                return host + np.uint8(i % 7)

            return perturb

        def slice_video(buf, i):
            return buf[i * NUM_FRM:(i + 1) * NUM_FRM]

    dev_a = synth_dev_frames(0)
    dev_b = synth_dev_frames(3 * F_TOTAL * IMAGE_SIZE * IMAGE_SIZE)
    log("on-device frame synth done (no host upload in the headline phase)")

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
    shared["phase"] = "warmup-compile"
    t = time.time()
    warm_results = engine.run_chunk(make_chunk(dev_a), config,
                                    rng=jax.random.PRNGKey(0))
    warmup_s = time.time() - t
    log(f"warmup (compile): {warmup_s:.1f}s")
    shared["warmup_s"] = round(warmup_s, 1)

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
    shared["tflops_per_iter"] = round(fl["total"], 2)

    # ---- HEADLINE: compute-only, frames device-resident ----------------
    # Same one-chunk-in-flight schedule as the CLI's fused path (dispatch
    # chunk i+1 before completing chunk i: readback+glue of i overlaps
    # i+1's device work, +27% vs sequential). Iteration count adapts to
    # the remaining budget so the watchdog never truncates mid-phase.
    #
    # Timing is AGGREGATE steady-state — (last chunk done − first chunk
    # done) / chunks completed in between — NOT a per-iter median: on axon
    # dispatch returns at enqueue-ack, so per-iteration host timestamps
    # alternate bimodally (~2x chunk, ~0) as the host thread runs ahead of
    # the device chain; a median over few such samples lands anywhere
    # between the modes. complete_chunk closes each timestamp with a real
    # host readback, so the phase endpoints are honest.
    shared["phase"] = "compute-only"
    compute_times = []
    in_flight = engine.dispatch_chunk(make_chunk(dev_a), config,
                                      rng=jax.random.PRNGKey(100))
    t_fill_done = None
    steady_chunks = 0
    for it in range(ITERS):
        t0 = time.perf_counter()
        nxt = engine.dispatch_chunk(make_chunk(dev_b if it % 2 == 0 else dev_a),
                                    config, rng=jax.random.PRNGKey(101 + it))
        engine.complete_chunk(in_flight)
        if t_fill_done is None:
            t_fill_done = time.perf_counter()  # pipeline fill excluded
        else:
            steady_chunks += 1
        in_flight = nxt
        compute_times.append(time.perf_counter() - t0)
        log(f"compute-only iter {it}: {compute_times[-1]:.2f}s")
        # leave room for one more iter + the final drain + emit overhead
        est = ((time.perf_counter() - t_fill_done) / max(steady_chunks, 1)
               if steady_chunks else compute_times[-1])
        if _remaining() < 3.0 * est + 20.0:
            log(f"budget: stopping compute-only after {it+1}/{ITERS} iters")
            break
    engine.complete_chunk(in_flight)
    steady_chunks += 1  # the drained chunk closes after t_fill_done too
    t_steady = time.perf_counter() - t_fill_done
    log(f"fused-filter fallbacks: {engine.fused_fallback_videos}/{engine.fused_total_videos} videos")

    dt_c = t_steady / steady_chunks
    fps = F_TOTAL / dt_c
    mfu = fl["total"] / dt_c / V5E_PEAK_BF16_TFLOPS
    shared.update({
        "value": round(fps, 2),
        "vs_baseline": round(fps / BASELINE_FRAMES_PER_SEC_A100_ESTIMATE, 3),
        "tflops_per_sec": round(fl["total"] / dt_c, 1),
        "mfu": round(mfu, 4),
        "compute_s_per_chunk": round(dt_c, 3),
        "compute_steady_chunks": steady_chunks,
    })
    log(f"headline: {fps:.1f} frames/s/chip (mfu {mfu:.3f}, "
        f"{dt_c:.3f}s/chunk over {steady_chunks} steady chunks)")

    # ---- optional: pipelined host-upload end-to-end phase ---------------
    # Matches the CLI's steady state (prefetch thread uploads batch i+1
    # while batch i computes). Gated on remaining budget: a tunnel trough
    # can stall one 57 MB device_put for minutes, and this phase only
    # feeds the contextual end_to_end_fps field, not the headline.
    fps_e2e = None
    dt_u = None
    e2e_iters = 0
    # budget estimate: first upload is unpipelined + per-iter ~max(compute,
    # upload); assume upload <= 3x compute on a mid tunnel, keep 30s slack
    want_e2e = (_os.environ.get("BENCH_E2E", "1") == "1"
                and _remaining() > (ITERS + 2) * 3.0 * dt_c + 45.0)
    if want_e2e:
        shared["phase"] = "end-to-end-upload"
        perturb = host_frames_and_tools()
        bufs: dict[int, object] = {}
        upload_times: list[float] = []

        def upload(i):
            # vary content per iter so no transfer/compute layer can cache
            t0 = time.perf_counter()
            buf = jax.device_put(perturb(i))
            jax.block_until_ready(buf)
            upload_times.append(time.perf_counter() - t0)
            bufs[i] = buf

        upload(0)
        iter_times = []
        in_flight = engine.dispatch_chunk(make_chunk(bufs.pop(0)), config,
                                          rng=jax.random.PRNGKey(0))
        upload(1)
        for it in range(ITERS):
            t0 = time.perf_counter()
            th = threading.Thread(target=upload, args=(it + 2,), daemon=True)
            th.start()
            nxt = engine.dispatch_chunk(make_chunk(bufs.pop(it + 1)), config,
                                        rng=jax.random.PRNGKey(it + 1))
            engine.complete_chunk(in_flight)
            in_flight = nxt
            th.join()
            iter_times.append(time.perf_counter() - t0)
            log(f"e2e iter {it}: {iter_times[-1]:.2f}s (upload {upload_times[-1]:.2f}s)")
            if _remaining() < 2.5 * iter_times[-1] + 20.0:
                log(f"budget: stopping e2e after {it+1}/{ITERS} iters")
                break
        engine.complete_chunk(in_flight)
        e2e_iters = len(iter_times)
        if iter_times:
            fps_e2e = F_TOTAL / float(np.median(iter_times))
            dt_u = float(np.median(upload_times))
    else:
        log("budget/env: skipping the end-to-end upload phase")

    shared["phase"] = "emit"
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
        "end_to_end_fps": round(fps_e2e, 2) if fps_e2e else None,
        "end_to_end_vs_baseline": (round(fps_e2e / BASELINE_FRAMES_PER_SEC_A100_ESTIMATE, 3)
                                   if fps_e2e else None),
        "end_to_end_iters": e2e_iters,
        "compute_s_per_chunk": round(dt_c, 3),
        "compute_steady_chunks": steady_chunks,
        "timing_note": "aggregate steady-state: (last chunk readback - first "
                       "chunk readback) / chunks in between; per-iter medians "
                       "are bimodal on axon (dispatch returns at enqueue-ack)",
        "upload_s_median": round(dt_u, 3) if dt_u else None,
        "upload_mb": round(upload_mb, 1),
        "warmup_s": round(warmup_s, 1),
        "time_budget_s": TIME_BUDGET_S,
        "config": f"BLIP-base {IMAGE_SIZE}px, {NUM_FRM} frm/video, beam=3 fixed 20-step decode "
                  f"(early_exit off), ITM max_filter, bf16, batch={VIDEOS_PER_BATCH} videos, "
                  f"grouped-KV decode, {TRANSFER} ingest, on-device frame synth for the "
                  f"headline compute phase, fused filter with one chunk in flight (the "
                  f"CLI's schedule; times are steady-state per-chunk, readback+glue "
                  f"overlapped with the next chunk's device work)",
        "fused_vit_block": vit_cfg.use_fused_block,
        "fused_vit_block_effective": fused_effective,
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
        "device": str(dev0),
    }
    # regression tripwire: compare against the best committed row
    # (canary-normalized) and warn in the log — would have caught the
    # fused-ON chunk regression the day it shipped
    try:
        from tools.bench_check import check_regression

        warn = check_regression(record)
        if warn:
            log(f"REGRESSION WARNING: {warn}")
            record["regression_warning"] = warn
    except Exception as e:
        log(f"bench_check skipped: {e}")
    _emit_once(record)


if __name__ == "__main__":
    main()
