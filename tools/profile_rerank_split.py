"""Phase-split profile of the retrieval-eval ITM rerank (VERDICT r4 #3).

The rerank sits at 11.9% MFU (benchmarks/retrieval_eval.jsonl) and the
artifact note blames cross-K/V materializations — but analytically K/V is
only ~13% of the rerank FLOPs. This tool times the rerank's three compute
phases as ISOLATED jit programs at the real msrvtt rerank shapes (R=8
rows x SB=8 blocks per dispatch, k_test=128, L=16 trimmed text,
M=8*197=1576 memory tokens):

  full       one _itm_v2t_blocks dispatch (the real program)
  text_self  the text tower WITHOUT cross-attention (mode="text"
             med_forward) over the same R*SB*k text rows — isolates the
             per-text self-attention whose score/apply GEMMs are
             (16x16x64) — far below the 128-lane MXU tile
  cross_kv   the 12-layer K/V projections over R*SB memories — the part
             the old note blamed

cross-attention + head time ~= full - text_self - cross_kv.

Each phase times N sequential dispatches, each closed by a host scalar
readback (axon: block_until_ready is a no-op). Prints one JSON line;
artifact benchmarks/rerank_split.jsonl.

Env: REPS (default 4), ROWS (8), BLOCKS (8), K_TEST (128), NUM_FRM (8).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit

REPS = int(os.environ.get("REPS", 4))
ROWS = int(os.environ.get("ROWS", 8))
BLOCKS = int(os.environ.get("BLOCKS", 8))
K_TEST = int(os.environ.get("K_TEST", 128))
NUM_FRM = int(os.environ.get("NUM_FRM", 8))
L_TEXT = 16
IMAGE_SIZE = 224
V5E_PEAK_BF16_TFLOPS = 197.0


def log(msg):
    print(f"[rerank_split] {msg}", file=sys.stderr, flush=True)


def main():
    from vidil_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()  # jax ignores the env var; see jaxcache.py
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models import med as MED
    from vidil_tpu.models.blip import blip_itm_scores, init_blip_itm
    from vidil_tpu.utils.synth import synth_tree

    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=30524)
    M = NUM_FRM * ((IMAGE_SIZE // 16) ** 2 + 1)
    D = med_cfg.hidden_size
    N_VID = ROWS * BLOCKS          # memories per dispatch
    N_TXT = N_VID * K_TEST         # text rows per dispatch

    log(f"device: {jax.devices()[0]}; dispatch = {N_VID} videos x "
        f"k={K_TEST} texts, L={L_TEXT}, M={M}")
    shapes = jax.eval_shape(
        lambda: init_blip_itm(jax.random.PRNGKey(0), vit_cfg, med_cfg,
                              embed_dim=256))
    params = jax.jit(lambda: synth_tree(shapes))()
    jax.block_until_ready(params)

    @jax.jit
    def synth_inputs():
        vf = (jnp.sin(jnp.arange(N_VID * M * D, dtype=jnp.float32) * 0.7)
              .reshape(N_VID, M, D) * 0.05).astype(jnp.bfloat16)
        ids = (jnp.arange(N_TXT * L_TEXT, dtype=jnp.int32).reshape(
            N_TXT, L_TEXT) % 29000) + 1000
        mask = jnp.ones((N_TXT, L_TEXT), jnp.int32)
        return vf, ids, mask

    vf, ids, mask = synth_inputs()
    jax.block_until_ready((vf, ids, mask))

    # ---- phase programs --------------------------------------------------
    @jax.jit
    def full(params, vf, ids, mask):
        logits = blip_itm_scores(params, vf, ids, mask, med_cfg,
                                 dtype=jnp.bfloat16, group_size=K_TEST)
        return jnp.sum(logits.astype(jnp.float32))

    @jax.jit
    def text_self(params, ids, mask):
        hidden = MED.med_forward(params["text_encoder"], ids, mask,
                                 cfg=med_cfg, mode="text",
                                 dtype=jnp.bfloat16)
        return jnp.sum(hidden.astype(jnp.float32))

    @jax.jit
    def cross_kv(params, vf):
        # the 12 layers' cross K/V projections over every memory, scanned
        # like the real tower (vidil_tpu/models/med.py layer stack layout)
        layers = params["text_encoder"]["layers"]["cross_attn"]

        def body(carry, lp):
            k = jnp.dot(vf.astype(jnp.bfloat16),
                        lp["key"]["kernel"].astype(jnp.bfloat16))
            v = jnp.dot(vf.astype(jnp.bfloat16),
                        lp["value"]["kernel"].astype(jnp.bfloat16))
            return carry + jnp.sum(k.astype(jnp.float32)) + jnp.sum(
                v.astype(jnp.float32)), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), layers)
        return out

    def timed(name, fn, *args):
        t = time.time()
        float(fn(*args))  # compile + first run
        log(f"{name}: warmup {time.time()-t:.1f}s")
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(*args))  # scalar fetch closes the timing
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        log(f"{name}: {dt*1e3:.0f} ms/dispatch (reps {['%.3f' % t for t in ts]})")
        return dt

    t_full = timed("full", full, params, vf, ids, mask)
    t_text = timed("text_self", text_self, params, ids, mask)
    t_kv = timed("cross_kv", cross_kv, params, vf)

    n_scorings = N_TXT
    # analytic FLOPs for the pieces (2*m*n*k per GEMM)
    I = med_cfg.intermediate_size
    fl_text = med_cfg.num_layers * N_TXT * (
        8 * L_TEXT * D * D + 4 * L_TEXT * D * I + 4 * L_TEXT * L_TEXT * D) / 1e12
    fl_kv = med_cfg.num_layers * N_VID * 4 * M * D * D / 1e12
    fl_cross = med_cfg.num_layers * N_TXT * (
        4 * L_TEXT * D * D + 4 * L_TEXT * M * D) / 1e12
    fl_full = fl_text + fl_kv + fl_cross
    rec = {
        "metric": "rerank_split_full_dispatch",
        "value": round(t_full, 4),
        "unit": "s/dispatch",
        "vs_baseline": 1.0,
        "n_videos_per_dispatch": N_VID, "k_test": K_TEST,
        "text_len": L_TEXT, "memory_tokens": M,
        "scorings_per_dispatch": n_scorings,
        "scorings_per_sec": round(n_scorings / t_full, 1),
        "t_text_self_s": round(t_text, 4),
        "t_cross_kv_s": round(t_kv, 4),
        "t_cross_attn_residual_s": round(t_full - t_text - t_kv, 4),
        "mfu_full": round(fl_full / t_full / V5E_PEAK_BF16_TFLOPS, 4),
        "mfu_text_self": round(fl_text / t_text / V5E_PEAK_BF16_TFLOPS, 4),
        "mfu_cross_kv": round(fl_kv / t_kv / V5E_PEAK_BF16_TFLOPS, 4),
        "tflops": {"text_self": round(fl_text, 2), "cross_kv": round(fl_kv, 2),
                   "cross_attn": round(fl_cross, 2)},
        "note": "isolated jit programs at the v2t dispatch shape; "
                "cross_attn residual = full - text_self - cross_kv "
                "(approximate: XLA fuses differently in isolation)",
        "device": str(jax.devices()[0]),
    }
    emit("rerank_split", rec)


if __name__ == "__main__":
    main()
