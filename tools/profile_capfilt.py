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

PROF_STEPX=1 runs ONLY the decode-step isolation (skips the standard
program timings): times med_decode_step chained at the exact CapFilt
step shapes, plus ablations (no cross-attn, cross bias dropped) and the
pure cross-K/V HBM-read floor, to locate where the 22-ms residual of the
decode step (capfilt_decode_phase_probe) actually goes.
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
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
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

    if os.environ.get("PROF_STEPX") == "1":
        cap_embeds = engine.encode_captioner(frames)
        jax.block_until_ready(cap_embeds)
        # free what the isolation never touches (filterer params, frames):
        # the production shapes put ~5.4 GB of cross-K/V on a 16 GB chip
        for leaf in jax.tree.leaves(fil):
            leaf.delete()
        frames.delete()
        _step_isolation(engine, cap, tok, med_cfg, cap_embeds)
        return

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


def _step_isolation(engine, cap, tok, med_cfg, cap_embeds):
    """PROF_STEPX=1: where does the decode step's 22-ms residual go?

    The phase probe (capfilt_decode_phase_probe) leaves one opaque share:
    'transformer_step_plus_bookkeeping'. This isolates it further by timing
    med_decode_step ALONE (no beam bookkeeping) chained data-dependently,
    then ablating:
      * step_nocross — cross_k/v/bias = None (decoder-only step): the
        difference is the grouped cross-attention's full cost;
      * step_nobias  — cross bias dropped (it is identically zero for the
        unpadded patch memory, but blip_generate_ids materializes and adds
        it in fp32 every layer);
      * kv_read_floor — a carry-dependent sum over the full cross-K/V
        (dynamic-slice start defeats loop-invariant hoisting): the pure
        HBM-read time of the bytes the cross-attention MUST touch.
    achieved_gbs = cross bytes / cross time says how far the XLA einsum
    chain sits from the read floor — the go/no-go number for a Pallas
    flash-decode kernel. Emits one capfilt_decode_step_isolation row.
    """
    import jax
    import jax.numpy as jnp

    from vidil_tpu.models import med as M
    from vidil_tpu.utils.bench_artifact import emit

    nb = engine.gen_beam.num_beams
    maxlen = engine.gen_beam.max_length
    dtype = engine.dtype
    B = int(cap_embeds.shape[0])
    Lk = int(cap_embeds.shape[1])
    rows = B * nb
    dec_tree = cap["text_decoder"]

    log(f"stepx: B={B} Lk={Lk} rows={rows} maxlen={maxlen} nb={nb}")
    ck, cv = jax.jit(
        lambda p, e: M.precompute_cross_kv(p, e, med_cfg, dtype=dtype)
    )(dec_tree, cap_embeds)
    jax.block_until_ready((ck, cv))
    cap_embeds.delete()  # only needed to project K/V
    cb = jax.jit(
        lambda: M.invert_attention_mask(jnp.ones((B, Lk), jnp.int32)))()
    cache0 = jax.jit(
        lambda: M.init_self_cache(med_cfg, rows, maxlen, dtype=dtype))()
    toks0 = jnp.full((rows,), 5, jnp.int32)
    kv_bytes = 2 * ck.size * ck.dtype.itemsize  # K + V, all layers

    import time as _time

    one = jnp.zeros((), jnp.float32)
    fid = jax.jit(lambda x: x + 1.0)
    float(fid(one))
    rtts = []
    for _ in range(7):
        t0 = _time.perf_counter()
        float(fid(one))
        rtts.append(_time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    log(f"stepx: readback rtt {rtt*1e3:.1f} ms")

    CH = 12

    def chained(run, args, label):
        float(run(*args))  # warmup/compile
        reps = []
        for _ in range(5):
            t0 = _time.perf_counter()
            float(run(*args))
            reps.append((_time.perf_counter() - t0 - rtt) / CH)
        ms = max(float(np.median(reps)) * 1e3, 1e-3)
        log(f"{label}: {ms:.3f} ms/step")
        return ms

    def make_step_run(with_cross: bool, with_bias: bool):
        @jax.jit
        def run(dec, cache, k, v, b, toks):
            def body(carry, _):
                toks, cache = carry
                logits, cache = M.med_decode_step(
                    dec, toks, 10, cache, k, v, b, med_cfg,
                    dtype=dtype, beam_size=nb)
                # cheap data dependence: next tokens from a logit slice
                toks = (jnp.argmax(logits[:, :8], axis=-1) + 5).astype(jnp.int32)
                return (toks, cache), ()

            (toks, _), _ = jax.lax.scan(body, (toks, cache), None, length=CH)
            return jnp.sum(toks.astype(jnp.float32))

        if with_cross:
            args = (dec_tree, cache0, ck, cv, cb if with_bias else None, toks0)
        else:
            args = (dec_tree, cache0, None, None, None, toks0)
        return run, args

    run_full, a_full = make_step_run(True, True)
    ms_full = chained(run_full, a_full, "step_full")
    run_nobias, a_nobias = make_step_run(True, False)
    ms_nobias = chained(run_nobias, a_nobias, "step_nobias")
    run_nocross, a_nocross = make_step_run(False, False)
    ms_nocross = chained(run_nocross, a_nocross, "step_nocross")

    @jax.jit
    def run_read(k, v):
        Bk = k.shape[1]

        def masked_sum(x, r):
            # carry-dependent mask on the ORIGINAL shape (any reshape here
            # forces a physical re-layout copy of the 2.7 GB operand — both
            # an astype-then-scale variant and a 2-D-reshape variant OOMed);
            # the select fuses into the reduction and the r-dependence
            # defeats loop-invariant hoisting of the big read
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (1, Bk, 1, 1, 1), 1)
            zero = jnp.zeros((), x.dtype)
            return jnp.sum(jnp.where(rows_i >= r, x, zero)
                           .astype(jnp.float32) * 1e-20)

        def body(c, _):
            r = (c.astype(jnp.int32) % 2)
            tot = masked_sum(k, r) + masked_sum(v, r)
            return c + tot, ()

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=CH)
        return c

    ms_read = chained(run_read, (ck, cv), "kv_read_floor")

    if os.environ.get("PROF_STEPV") == "1":
        _step_variants(engine, dec_tree, med_cfg, ck, cv, cb, cache0, toks0,
                       chained, CH)

    # --- beam bookkeeping isolation: beam_search slope with a toy step_fn
    # (base logits + tiny token/cache dependence), so the L20-L12 slope is
    # the pure per-step beam logic: log_softmax + min-length mask + score
    # add + (B, nb*V) reshape + top_k + process_batch + seqs/cache reorder.
    # A reorder_fn=identity variant splits out the cache-gather share.
    import dataclasses

    from vidil_tpu.ops.generation import beam_search

    V = int(tok.vocab_size)
    Lp = 4
    base_logits = jax.jit(lambda: (jnp.sin(
        jnp.arange(rows * V, dtype=jnp.float32) * 1.7)
        .reshape(rows, V)))()
    prompt = jnp.full((B, Lp), 7, jnp.int32)

    def bookkeeping_ms(real_reorder: bool, label: str):
        def mk_run(maxlen):
            gen = dataclasses.replace(
                engine.gen_beam, max_length=maxlen, early_exit=False,
                min_length=5)

            @jax.jit
            def run(base, prompt_ids, cache):
                def prefill_fn(ids, c):
                    lg = base + ids[:, -1:].astype(jnp.float32) * 1e-9
                    return lg, c

                def step_fn(tokens, idx, c):
                    # tiny cache read keeps the reorder gather alive
                    lg = (base + tokens[:, None].astype(jnp.float32) * 1e-9
                          + jnp.sum(c["k"][0, :, 0, :8], axis=-1,
                                    keepdims=True).astype(jnp.float32) * 1e-20)
                    return lg, c

                def reorder_fn(c, idx):
                    if real_reorder:
                        return jax.tree.map(lambda x: x[:, idx], c)
                    return c

                seqs_out, _ = beam_search(prompt_ids, cache, prefill_fn,
                                          step_fn, reorder_fn, gen)
                return jnp.sum(seqs_out.astype(jnp.float32))

            return run

        def t_of(maxlen):
            run = mk_run(maxlen)
            cache = jax.jit(lambda: M.init_self_cache(
                med_cfg, rows, maxlen, dtype=dtype))()
            float(run(base_logits, prompt, cache))  # warmup
            ts = []
            for _ in range(5):
                t0 = _time.perf_counter()
                float(run(base_logits, prompt, cache))
                ts.append(_time.perf_counter() - t0)
            return float(np.median(ts))

        t20 = t_of(maxlen)
        t12 = t_of(12)
        ms = max(t20 - t12, 0.0) / max(maxlen - 12, 1) * 1e3
        log(f"{label}: {ms:.3f} ms/step (t20 {t20*1e3:.0f} ms, t12 {t12*1e3:.0f} ms)")
        return ms

    bk_ms = bookkeeping_ms(True, "beam_bookkeeping")
    bk_noreorder_ms = bookkeeping_ms(False, "beam_bookkeeping_noreorder")

    cross_ms = max(ms_full - ms_nocross, 1e-3)
    row = {
        "metric": "capfilt_decode_step_isolation",
        "B": B, "Lk": Lk, "rows": rows, "beam_size": nb,
        "hidden": med_cfg.hidden_size, "layers": med_cfg.num_layers,
        "chain_len": CH,
        "step_full_ms": round(ms_full, 3),
        "step_nobias_ms": round(ms_nobias, 3),
        "step_nocross_ms": round(ms_nocross, 3),
        "cross_attn_ms": round(cross_ms, 3),
        "bias_add_ms": round(ms_full - ms_nobias, 3),
        "kv_read_floor_ms": round(ms_read, 3),
        "beam_bookkeeping_ms": round(bk_ms, 3),
        "beam_bookkeeping_noreorder_ms": round(bk_noreorder_ms, 3),
        "cache_reorder_ms": round(bk_ms - bk_noreorder_ms, 3),
        "cross_kv_gb": round(kv_bytes / 1e9, 2),
        "cross_achieved_gbs": round(kv_bytes / 1e9 / (cross_ms / 1e3), 1),
        "floor_achieved_gbs": round(kv_bytes / 1e9 / (ms_read / 1e3), 1),
        "note": "med_decode_step chained data-dependently (no beam "
                "bookkeeping); cross cost = full - nocross; read floor = "
                "carry-dependent sum over the full cross-K/V; achieved_gbs "
                "charges ALL cross time to the K/V bytes",
    }
    emit("capfilt_profile", row)


def _step_variants(engine, dec_tree, med_cfg, ck, cv, cb, cache0, toks0,
                   chained, CH):
    """PROF_STEPV=1: ablate the decode step's structure to locate the
    non-cross overhead (measured 5.4 ms vs ~1.5 ms analytic floor).

    Variants (timing-only reimplementation of med_decode_step):
      reimpl_scan      — sanity: should match step_full;
      scan_nowrite     — self-K/V cache NOT updated: isolates the cost of
                         the functional cache rewrite through the layer
                         scan's ys (a full 452 MB/step copy if XLA doesn't
                         update in place);
      scan_noself      — self-attention block removed;
      scan_nomlp       — MLP block removed;
      unrolled_listkv  — python-unrolled layers, cache as 12 per-layer
                         arrays (no stacked ys at all): scan + stacked-
                         cache overhead together.
    """
    import math

    import jax
    import jax.numpy as jnp

    from vidil_tpu.models import med as M

    dt = engine.dtype
    nb = engine.gen_beam.num_beams
    H = med_cfg.num_heads
    Dh = med_cfg.hidden_size // H
    eps = med_cfg.layer_norm_eps
    nl = med_cfg.num_layers
    scale = 1.0 / math.sqrt(Dh)

    def layer_body(x, layer, k_cache, v_cache, ckl, cvl, step_bias, B,
                   max_len, write_cache, do_self, do_cross, do_mlp):
        if do_self:
            q = M.split_heads(M.linear(layer["self_attn"]["query"], x, dtype=dt), H)
            k_new = M.linear(layer["self_attn"]["key"], x, dtype=dt)
            v_new = M.linear(layer["self_attn"]["value"], x, dtype=dt)
            if write_cache:
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_new.astype(k_cache.dtype), (0, 10, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_new.astype(v_cache.dtype), (0, 10, 0))
            k4 = k_cache.reshape(B, max_len, H, Dh).astype(q.dtype)
            v4 = v_cache.reshape(B, max_len, H, Dh).astype(q.dtype)
            lg = jnp.einsum("bhqd,bkhd->bhqk", q, k4,
                            preferred_element_type=jnp.float32) * scale
            pr = jax.nn.softmax(lg + step_bias, axis=-1)
            ctx = M.merge_heads(jnp.einsum("bhqk,bkhd->bhqd",
                                           pr.astype(v4.dtype), v4))
            h = M.linear(layer["self_attn"]["out"], ctx, dtype=dt)
            x = M.layer_norm(layer["self_attn"]["norm"], h + x, eps)
        if do_cross:
            x = M._attn_block_precomputed_kv(
                layer["cross_attn"], x, ckl, cvl, cb_arg[0], H, eps, dt,
                beam_size=nb)
        if do_mlp:
            x = M._ffn_block(layer, x, med_cfg, dtype=dt)
        return x, k_cache, v_cache

    cb_arg = [None]  # set per-run (closure over small bias is fine)

    def make_scan_run(write_cache=True, do_self=True, do_cross=True,
                      do_mlp=True):
        @jax.jit
        def run(dec, cache, k_all, v_all, bias, toks):
            cb_arg[0] = bias

            def one_step(toks, cache):
                B = toks.shape[0]
                max_len = cache["k"].shape[2]
                x = M.med_embeddings(dec, toks[:, None], med_cfg,
                                     position_offset=10, dtype=dt)
                pos = jnp.arange(max_len)
                step_bias = jnp.where(pos <= 10, 0.0,
                                      M.NEG_INF)[None, None, None, :]

                def body(carry, scanned):
                    layer, kc, vc, ckl, cvl = scanned
                    x = carry
                    x, kc, vc = layer_body(x, layer, kc, vc, ckl, cvl,
                                           step_bias, B, max_len,
                                           write_cache, do_self, do_cross,
                                           do_mlp)
                    return x, (kc, vc)

                x, (nk, nv) = jax.lax.scan(
                    body, x, (dec["layers"], cache["k"], cache["v"],
                              k_all, v_all))
                logits = M.med_lm_logits(dec, x[:, 0, :], med_cfg, dtype=dt)
                return logits.astype(jnp.float32), {"k": nk, "v": nv}

            def sbody(carry, _):
                toks, cache = carry
                logits, cache = one_step(toks, cache)
                toks = (jnp.argmax(logits[:, :8], axis=-1) + 5).astype(jnp.int32)
                return (toks, cache), ()

            (toks, _), _ = jax.lax.scan(sbody, (toks, cache), None, length=CH)
            return jnp.sum(toks.astype(jnp.float32))

        return run

    args = (dec_tree, cache0, ck, cv, cb, toks0)
    chained(make_scan_run(), args, "v:reimpl_scan")
    chained(make_scan_run(write_cache=False), args, "v:scan_nowrite")
    chained(make_scan_run(do_self=False), args, "v:scan_noself")
    chained(make_scan_run(do_mlp=False), args, "v:scan_nomlp")

    # unrolled layers + per-layer cache arrays (no stacked scan ys)
    cache_list0 = tuple(
        (jax.jit(lambda: jnp.zeros_like(cache0["k"][0]))(),
         jax.jit(lambda: jnp.zeros_like(cache0["v"][0]))())
        for _ in range(nl))

    @jax.jit
    def run_unrolled(dec, cache_list, k_all, v_all, bias, toks):
        cb_arg[0] = bias

        def one_step(toks, cache_list):
            B = toks.shape[0]
            max_len = cache_list[0][0].shape[1]
            x = M.med_embeddings(dec, toks[:, None], med_cfg,
                                 position_offset=10, dtype=dt)
            pos = jnp.arange(max_len)
            step_bias = jnp.where(pos <= 10, 0.0,
                                  M.NEG_INF)[None, None, None, :]
            new_list = []
            for i in range(nl):
                layer = jax.tree.map(lambda p: p[i], dec["layers"])
                kc, vc = cache_list[i]
                x, kc, vc = layer_body(x, layer, kc, vc, k_all[i], v_all[i],
                                       step_bias, B, max_len, True, True,
                                       True, True)
                new_list.append((kc, vc))
            logits = M.med_lm_logits(dec, x[:, 0, :], med_cfg, dtype=dt)
            return logits.astype(jnp.float32), tuple(new_list)

        def sbody(carry, _):
            toks, cache_list = carry
            logits, cache_list = one_step(toks, cache_list)
            toks = (jnp.argmax(logits[:, :8], axis=-1) + 5).astype(jnp.int32)
            return (toks, cache_list), ()

        (toks, _), _ = jax.lax.scan(sbody, (toks, cache_list), None,
                                    length=CH)
        return jnp.sum(toks.astype(jnp.float32))

    chained(run_unrolled, (dec_tree, cache_list0, ck, cv, cb, toks0),
            "v:unrolled_listkv")


if __name__ == "__main__":
    main()
