"""Per-program time/MFU split of one CapFilt iteration on the real chip.

The headline bench (bench.py) reports one whole-iteration MFU; this tool
breaks the iteration into its three device programs — ViT encode, beam
decode, grouped ITM — times each with the readback-close pattern (axon's
block_until_ready returns at enqueue-ack; only a host readback closes a
timing), and FLOP-normalizes each against the v5e bf16 peak. Results go
to benchmarks/capfilt_profile.jsonl.

Env: PROF_VIDEOS (default 64), PROF_ITERS (default 5).
Optionally PROF_TRACE=/path captures a jax.profiler trace of one full
iteration for offline inspection.
"""

from __future__ import annotations

import os
import time

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import V5E_PEAK_BF16_TFLOPS, analytic_tflops

VIDEOS = int(os.environ.get("PROF_VIDEOS", 64))
NUM_FRM = 4
IMAGE_SIZE = 384
ITERS = int(os.environ.get("PROF_ITERS", 5))


def log(msg):
    import sys

    print(f"[profile] {msg}", file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/vidil_tpu_jaxcache"))
    import tempfile

    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
    from vidil_tpu.pipeline.capfilt import CapFiltEngine, _round_up
    from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab
    from vidil_tpu.utils.bench_artifact import emit

    vocab_path = os.path.join(tempfile.gettempdir(), "bench_vocab.txt")
    write_test_vocab(vocab_path, [f"tok{i}" for i in range(30418)])
    tok = BlipTokenizer(vocab_path)
    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)
    log(f"device: {jax.devices()[0]}")

    # on-device sin-fill param synthesis (see bench.py for rationale)
    cap_shapes = jax.eval_shape(lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
    fil_shapes = jax.eval_shape(lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg))

    from vidil_tpu.utils.synth import synth_tree

    t = time.time()
    cap, fil = jax.jit(lambda: (synth_tree(cap_shapes, salt=1.0),
                                synth_tree(fil_shapes, salt=2.0)))()
    jax.block_until_ready((cap, fil))
    log(f"param synth: {time.time()-t:.1f}s")

    engine = CapFiltEngine(cap, fil, tok, vit_cfg, med_cfg,
                           num_beams=3, max_length=20, min_length=5,
                           dtype=jnp.bfloat16, beam_group_kv=True,
                           early_exit=False)

    F = VIDEOS * NUM_FRM
    # frames are synthesized ON DEVICE (a 113 MB RGB upload takes many
    # minutes on a slow-tunnel day and is irrelevant to compute timings)
    t = time.time()
    frames = jax.jit(lambda: (
        (jnp.sin(jnp.arange(F * IMAGE_SIZE * IMAGE_SIZE * 3, dtype=jnp.float32)
                 * 0.7311) * 127.0 + 128.0)
        .astype(jnp.uint8).reshape(F, IMAGE_SIZE, IMAGE_SIZE, 3)))()
    _ = float(jnp.sum(frames[0].astype(jnp.float32)))
    log(f"on-device frame synth: {time.time()-t:.1f}s")

    def timed(fn, close, label):
        close(fn())  # warmup/compile
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            close(fn())
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        log(f"{label}: {dt*1e3:.0f} ms (iters {[round(x*1e3) for x in ts]})")
        return dt

    # --- program 1: one ViT-B/384 encode pass (the iteration runs two) ---
    def run_encode():
        return engine.encode_filter_frames(frames, NUM_FRM)

    t_encode = timed(run_encode,
                     lambda out: float(jnp.sum(out[:1, :1, :1, :8].astype(jnp.float32))),
                     "vit_encode(1x)")

    # --- encode + beam decode (captioning); decode = this minus encode ---
    def run_caption():
        return engine.caption_frames(frames, rng=jax.random.PRNGKey(0))

    t_caption = timed(run_caption, lambda out: None, "encode+decode")
    t_decode = max(t_caption - t_encode, 0.0)

    # --- grouped ITM filter on device-resident embeds ---
    embeds = engine.encode_filter_frames(frames, NUM_FRM)
    captions = run_caption()
    texts = [[c for c in dict.fromkeys(captions[v * NUM_FRM:(v + 1) * NUM_FRM])]
             for v in range(VIDEOS)]
    itm_rows = _round_up(max(len(t) for t in texts), 4)

    def run_itm():
        return engine.filter_captions_batch(embeds, texts, threshold=0.4)

    t_itm = timed(run_itm, lambda out: None, "itm_filter")

    # --- fused ITM (the CLI path: ids built on device at the TRIMMED
    # text length itm_text_len_fused) on the same embeds/seqs ---
    cap_embeds = engine.encode_captioner(frames)
    seqs_dev = engine.generate_beam(cap_embeds, jax.random.PRNGKey(0))

    def run_itm_fused():
        return engine._itm_fused(embeds, seqs_dev)

    t_itm_fused = timed(
        run_itm_fused,
        lambda out: float(jnp.sum(out.astype(jnp.float32))),  # readback closes
        "itm_filter_fused")
    fl_fused = analytic_tflops(F, VIDEOS, NUM_FRM,
                               itm_rows_per_video=_round_up(NUM_FRM, 4),
                               itm_text_len=engine.itm_text_len_fused,
                               image_size=IMAGE_SIZE, vocab=tok.vocab_size,
                               dec_steps=20 - engine.prompt_length)

    fl = analytic_tflops(F, VIDEOS, NUM_FRM, itm_rows_per_video=itm_rows,
                         itm_text_len=engine.itm_max_text_len,
                         image_size=IMAGE_SIZE, vocab=tok.vocab_size,
                         dec_steps=20 - engine.prompt_length)

    if os.environ.get("PROF_DECODE") == "1":
        _decode_probe(engine, cap, fil, tok, vit_cfg, med_cfg, cap_embeds,
                      timed)

    if os.environ.get("PROF_TRACE"):
        with __import__("jax").profiler.trace(os.environ["PROF_TRACE"]):
            run_caption()
            run_itm()
        log(f"trace written to {os.environ['PROF_TRACE']}")

    total_t = 2 * t_encode + t_decode + t_itm
    programs = {
        "vit_encode_x2": {"s": round(2 * t_encode, 3), "tflops": round(fl["encode"], 2),
                          "mfu": round(fl["encode"] / (2 * t_encode) / V5E_PEAK_BF16_TFLOPS, 4)},
        "beam_decode": {"s": round(t_decode, 3), "tflops": round(fl["decode"], 2),
                        "mfu": round(fl["decode"] / max(t_decode, 1e-9) / V5E_PEAK_BF16_TFLOPS, 4)},
        "itm_filter": {"s": round(t_itm, 3), "tflops": round(fl["itm"], 2),
                       "mfu": round(fl["itm"] / t_itm / V5E_PEAK_BF16_TFLOPS, 4)},
        "itm_filter_fused": {"s": round(t_itm_fused, 3),
                             "tflops": round(fl_fused["itm"], 2),
                             "mfu": round(fl_fused["itm"] / t_itm_fused
                                          / V5E_PEAK_BF16_TFLOPS, 4),
                             "text_len": engine.itm_text_len_fused},
    }
    emit("capfilt_profile", {
        "metric": "capfilt_per_program_profile",
        "videos": VIDEOS, "num_frm": NUM_FRM, "image_size": IMAGE_SIZE,
        "programs": programs,
        "sum_s": round(total_t, 3),
        "sum_tflops": round(fl["total"], 2),
        "sum_mfu": round(fl["total"] / total_t / V5E_PEAK_BF16_TFLOPS, 4),
        "note": "vit_encode timed as one pass and doubled (captioner+filterer "
                "passes are the same program shape); decode = caption minus "
                "encode; readback-closed timings on the axon tunnel",
    })


def _decode_probe(engine, cap, fil, tok, vit_cfg, med_cfg, cap_embeds, timed):
    """PROF_DECODE=1: split the beam-decode phase (the second-largest
    program after encode) into named per-step shares.

    (a) step slope: a second engine at max_length=12 reuses the same
        params; both dialects run a FIXED step count here (early_exit
        off), so slope = (t20 - t12) / (steps20 - steps12) is the cost of
        one decode step and fixed = t20 - steps20*slope is prefill +
        final gather/readback glue.
    (b) bare component programs at the exact step shapes, each timed with
        the data-dependent chained-reps pattern (tools/bench_attention.py
        rationale: axon readback RTT ~30 ms must be amortized): the
        LM-head GEMM (rows x D @ D x vocab — reference models/med.py's
        cls head at vocab 30524), the fp32 log_softmax over the vocab,
        and the (B, nb*V) -> 2nb top_k beam select.
    residual = step - (lm_head + log_softmax + top_k) is the cached
    transformer step (self-attn append + cross-attn over the 577-patch
    memory + MLP) plus beam bookkeeping. Emits one capfilt_decode_probe
    row naming the dominant share."""
    import jax
    import jax.numpy as jnp

    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.utils.bench_artifact import emit

    nb = engine.gen_beam.num_beams
    L20 = engine.gen_beam.max_length
    L12 = 12
    steps20 = L20 - engine.prompt_length
    steps12 = L12 - engine.prompt_length
    B_seq = int(cap_embeds.shape[0])        # sequences (one per frame)
    rows = B_seq * nb                        # beam-flattened rows
    D = med_cfg.hidden_size
    V = tok.vocab_size

    log("decode probe: building max_length=12 twin engine (shared params)")
    engine12 = CapFiltEngine(
        cap, fil, tok, vit_cfg, med_cfg, num_beams=nb, max_length=L12,
        min_length=min(engine.gen_beam.min_length, L12 - engine.prompt_length - 1),
        dtype=engine.dtype, beam_group_kv=True, early_exit=False)

    rng = jax.random.PRNGKey(0)
    close = lambda out: float(jnp.sum(out[0].astype(jnp.float32)))
    t20 = timed(lambda: engine.generate_beam(cap_embeds, rng), close,
                f"generate_beam(L={L20})")
    t12 = timed(lambda: engine12.generate_beam(cap_embeds, rng), close,
                f"generate_beam(L={L12})")
    slope = max(t20 - t12, 0.0) / max(steps20 - steps12, 1)
    fixed = max(t20 - steps20 * slope, 0.0)

    # --- bare per-step components, chained-reps timing ------------------
    CH = 20

    def rtt_ms():
        one = jnp.zeros((), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        float(f(one))
        import time as _time

        ts = []
        for _ in range(7):
            t0 = _time.perf_counter()
            float(f(one))
            ts.append(_time.perf_counter() - t0)
        return float(np.median(ts))

    rtt = rtt_ms()
    log(f"decode probe: readback rtt {rtt*1e3:.1f} ms")

    def chained_ms(make_body, x0, label):
        import time as _time

        @jax.jit
        def run(x):
            def body(c, _):
                return make_body(c), ()

            out, _ = jax.lax.scan(body, x, None, length=CH)
            return jnp.sum(
                out.astype(jnp.float32) if out.dtype != jnp.float32 else out)

        float(run(x0))
        reps = []
        for _ in range(5):
            t0 = _time.perf_counter()
            float(run(x0))
            reps.append((_time.perf_counter() - t0 - rtt) / CH)
        ms = max(float(np.median(reps)) * 1e3, 1e-3)
        log(f"{label}: {ms:.3f} ms/step")
        return ms

    # on-device synth inputs (no host upload; see bench.py rationale)
    def synth(shape, dtype=jnp.bfloat16, salt=1.0):
        n = int(np.prod(shape))
        return jax.jit(lambda: (jnp.sin(
            jnp.arange(n, dtype=jnp.float32) * 0.7311 * salt) * 0.02)
            .astype(dtype).reshape(shape))()

    w_head = synth((D, V), salt=1.3)
    h_step = synth((rows, D), salt=0.7)
    lm_head_ms = chained_ms(
        lambda h: jnp.dot(h, w_head,
                          preferred_element_type=jnp.float32)[:, :D]
        .astype(jnp.bfloat16),
        h_step, "lm_head_gemm")

    logits0 = synth((rows, V), jnp.float32, salt=0.9)
    softmax_ms = chained_ms(
        lambda lg: jax.nn.log_softmax(lg, axis=-1) + 1e-6,
        logits0, "log_softmax_fp32")

    scores0 = synth((B_seq, nb * V), jnp.float32, salt=1.7)
    def topk_body(s):
        top, _ = jax.lax.top_k(s, 2 * nb)
        return s.at[:, : 2 * nb].add(top * 1e-9)

    topk_ms = chained_ms(topk_body, scores0, "top_k_2nb")

    step_ms = slope * 1e3
    residual_ms = max(step_ms - lm_head_ms - softmax_ms - topk_ms, 0.0)
    shares = {
        "lm_head_gemm": lm_head_ms,
        "log_softmax_fp32": softmax_ms,
        "top_k_beam_select": topk_ms,
        "transformer_step_plus_bookkeeping": residual_ms,
    }
    bottleneck = max(shares, key=shares.get)
    emit("capfilt_profile", {
        "metric": "capfilt_decode_phase_probe",
        "videos": VIDEOS, "num_frm": NUM_FRM, "image_size": IMAGE_SIZE,
        "rows": rows, "beam_size": nb, "vocab": V, "hidden": D,
        "t_generate_L20_s": round(t20, 3), "t_generate_L12_s": round(t12, 3),
        "decode_steps": steps20,
        "per_step_ms": round(step_ms, 3),
        "fixed_overhead_ms": round(fixed * 1e3, 1),
        "per_step_shares_ms": {k: round(v, 3) for k, v in shares.items()},
        "bottleneck_after_encode": bottleneck,
        "note": "slope from two fixed-step generate programs (early_exit "
                "off); bare components timed data-dependent-chained with "
                "rtt subtracted; residual = cached transformer step "
                "(self-attn append + cross-attn over patch memory + MLP) "
                "+ beam bookkeeping (gathers, penalties)",
    })


if __name__ == "__main__":
    main()
