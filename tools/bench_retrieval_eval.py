"""Benchmark: retrieval evaluation at the reference's msrvtt scale.

Runs the full evaluation path of train_retrieval_video.py:83-192 — text
features, video features, sims matmul, k_test ITM rerank in BOTH
directions, R@k — at the reference's default scale (reference:
configs/train_blip_video_retrieval_msrvtt*.yaml: num_frm_test 8,
image_size 224; run at k_test=128 per VERDICT r1 item 8; the yaml default
is 64) on N_VIDEOS videos x N_VIDEOS texts.

Weights and frames are synthesized on device (tunnel-transfer-free, same
rationale as bench.py); text tokens are tiny and upload normally. The
number that matters is ITM rerank scorings/sec at the 8-frame
(8*197+... = 1577-token) cross-attention memory, 2 * N * k_test scorings
total.

Prints ONE JSON line. Env knobs: N_VIDEOS (default 1000), K_TEST (128),
ROWS (rows per rerank block, default 8).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vidil_tpu.utils.bench_artifact import emit

N_VIDEOS = int(os.environ.get("N_VIDEOS", 1000))
K_TEST = int(os.environ.get("K_TEST", 128))
ROWS = int(os.environ.get("ROWS", 8))
SELF_FOLD = int(os.environ.get("SELF_FOLD", 8))
T2V_GROUP = int(os.environ.get("T2V_GROUP", 64))  # texts per block-diagonal
# self-attention fold in the grouped rerank (1 = the pre-fold layout)
NUM_FRM = 8
IMAGE_SIZE = 224
V5E_PEAK_BF16_TFLOPS = 197.0


def rerank_tflops(n: int, k: int, L: int, M: int, med_cfg,
                  g: int | None = None) -> float:
    """Analytic matmul FLOPs (2*m*n*k per GEMM) for the two-direction
    k_test rerank: per scoring per layer 12*L*D^2 (self QKVO + cross
    Q/out) + 4*L*D*I (MLP) + 4*L^2*D + 4*L*M*D (scores+apply), times
    2*n*k scorings; plus the shared cross-K/V projection 4*M*D^2 per
    memory materialization — once per video in v2t (grouped rows), and
    ~ceil(n*k/G) bucket materializations in t2v (G = the evaluator's
    t2v_group, full-bucket approximation of _rerank_t2v_bucketed)."""
    D, I = med_cfg.hidden_size, med_cfg.intermediate_size
    per_scoring = (12 * L * D * D + 4 * L * D * I + 4 * L * L * D
                   + 4 * L * M * D)
    g = g or min(32, k)
    kv_mats = n + (n * k + g - 1) // g
    return med_cfg.num_layers * (kv_mats * 4 * M * D * D
                                 + 2 * n * k * per_scoring) / 1e12


def log(msg):
    import sys

    print(f"[bench_retrieval] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.evals.retrieval import RetrievalEvaluator, itm_eval
    from vidil_tpu.models.blip import init_blip_itm
    from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

    import tempfile

    vocab_path = os.path.join(tempfile.gettempdir(), "bench_vocab.txt")
    write_test_vocab(vocab_path, [f"tok{i}" for i in range(30418)])
    tok = BlipTokenizer(vocab_path)

    vit_cfg = ViTConfig.from_name("base", IMAGE_SIZE)
    med_cfg = MedConfig(vocab_size=tok.vocab_size)

    log(f"device: {jax.devices()[0]}; {N_VIDEOS} videos x {NUM_FRM} frm, k_test={K_TEST}")
    t = time.time()
    shapes = jax.eval_shape(
        lambda: init_blip_itm(jax.random.PRNGKey(0), vit_cfg, med_cfg, embed_dim=256))

    from vidil_tpu.utils.synth import synth_tree

    params = jax.jit(lambda: synth_tree(shapes))()
    jax.block_until_ready(params)
    log(f"on-device param synth: {time.time()-t:.1f}s")

    ev = RetrievalEvaluator(params, vit_cfg, med_cfg, tok, k_test=K_TEST,
                            rows_per_batch=ROWS, self_fold=SELF_FOLD,
                            t2v_group=T2V_GROUP)

    # --- text side (1 caption per video, reference identity maps) ---
    rng = np.random.RandomState(0)
    texts = [" ".join(f"tok{j}" for j in rng.randint(0, 30000, size=9))
             for _ in range(N_VIDEOS)]
    t = time.time()
    text_embeds, text_ids, text_atts = ev.compute_text_features(texts)
    t_text = time.time() - t
    log(f"text features: {N_VIDEOS} texts in {t_text:.1f}s")

    # --- video side: frames synthesized on device, chunked ---
    CHUNK = 25  # 25 videos x 8 frames = 200 frames per ViT dispatch

    @jax.jit
    def synth_frames(salt):
        n = CHUNK * NUM_FRM * IMAGE_SIZE * IMAGE_SIZE * 3
        x = jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.71 + salt)
        return x.reshape(CHUNK, NUM_FRM, IMAGE_SIZE, IMAGE_SIZE, 3)

    # warm the video-side compile out of the timing (remote compiles are
    # tens of seconds; the steady-state rate is what the eval pays per chunk)
    ev.compute_video_features([synth_frames(jnp.float32(999))])

    t = time.time()

    def batches():
        for i in range(N_VIDEOS // CHUNK):
            yield synth_frames(jnp.float32(i))

    video_feats, video_embeds = ev.compute_video_features(batches())
    t_video = time.time() - t
    log(f"video features: {N_VIDEOS * NUM_FRM} frames in {t_video:.1f}s "
        f"({N_VIDEOS * NUM_FRM / t_video:.0f} f/s)")

    # --- rerank both directions ---
    t = time.time()
    score_v2t, score_t2v = ev.score_matrices(video_feats, video_embeds,
                                             text_embeds, text_ids, text_atts)
    t_rerank = time.time() - t
    n_scorings = 2 * N_VIDEOS * min(K_TEST, N_VIDEOS)
    log(f"rerank: {n_scorings} ITM scorings in {t_rerank:.1f}s "
        f"= {n_scorings / t_rerank:.0f}/s")

    metrics = itm_eval(score_v2t, score_t2v,
                       txt2vid=list(range(N_VIDEOS)), vid2txt=list(range(N_VIDEOS)))

    L = int(np.asarray(text_ids).shape[1])  # trimmed pad length
    M = NUM_FRM * ((IMAGE_SIZE // 16) ** 2 + 1)
    fl = rerank_tflops(N_VIDEOS, min(K_TEST, N_VIDEOS), L, M, med_cfg,
                       g=min(T2V_GROUP, K_TEST, N_VIDEOS))
    emit("retrieval_eval", {
        "metric": "retrieval_eval_itm_rerank_throughput",
        "value": round(n_scorings / t_rerank, 1),
        "unit": "ITM scorings/sec/chip",
        "n_videos": N_VIDEOS, "k_test": K_TEST, "num_frm": NUM_FRM,
        "image_size": IMAGE_SIZE, "text_len_trimmed": L,
        "self_fold": SELF_FOLD, "t2v_group": T2V_GROUP,
        "rerank_tflops": round(fl, 2),
        "rerank_mfu": round(fl / t_rerank / V5E_PEAK_BF16_TFLOPS, 4),
        "mfu_note": "analytic matmul FLOPs vs bf16 peak; cross-K/V "
                    "materializations counted once per video (v2t) + "
                    "ceil(n*k/32) buckets (t2v full-bucket approx)",
        "cross_attn_memory_tokens": M,
        "rerank_s": round(t_rerank, 1),
        "video_feature_fps": round(N_VIDEOS * NUM_FRM / t_video, 1),
        # ViT-B/224 encode: per frame per layer 24*N*D^2 + 4*N^2*D,
        # N = 197 tokens (same accounting as bench.py)
        "video_feature_mfu": round(
            vit_cfg.num_layers
            * (24 * 197 * vit_cfg.hidden_size ** 2
               + 4 * 197 * 197 * vit_cfg.hidden_size)
            * N_VIDEOS * NUM_FRM / 1e12 / t_video / V5E_PEAK_BF16_TFLOPS, 4),
        "text_feature_s": round(t_text, 1),
        "r_mean_sanity": round(metrics["r_mean"], 2),
        "device": str(jax.devices()[0]),
    })


if __name__ == "__main__":
    main()
