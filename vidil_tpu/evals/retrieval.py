"""Video-text retrieval evaluation: full sims matrix + k_test ITM rerank.

Reference: train_retrieval_video.py:83-237. TPU-first changes: the per-row
python rerank loop becomes batched jitted ITM calls (rows × k_test pairs
per program), with the same score = itm_logit + topk_sim at the top-k
positions and -100 elsewhere; the reference's rank-sharded loop +
all_reduce is kept at the host level for multi-host runs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import blip as B
from vidil_tpu.models import med as M
from vidil_tpu.models.layers import linear
from vidil_tpu.utils import get_rank, get_world_size, shard_range


def build_t2v_buckets(topk, start: int, end: int, G: int):
    """Vectorized per-video text buckets for the t2v rerank.

    topk: (end - start, k) video ids per text row, rank order. Returns
    (bucket_vid (nb,), bucket_txt (nb, G), bucket_real (nb,)): for each
    video (ascending id), its texts in insertion order (text-row order,
    since each text lists a video at most once) chunked into buckets of
    G, padded with each chunk's last real element. Exactly equal to the
    loop formulation it replaced — a stable argsort of the row-major
    (text, rank) pairs by video id preserves the per-video insertion
    order (fuzz-pinned in tests/test_evals.py); bucket layout determines
    the compiled block shapes, so equality here is load-bearing."""
    k = topk.shape[1]
    cols = topk.reshape(-1).astype(np.int64)
    rows = np.repeat(np.arange(start, end, dtype=np.int64), k)
    order = np.argsort(cols, kind="stable")
    cols_s, rows_s = cols[order], rows[order]
    uniq, starts_u, counts = np.unique(cols_s, return_index=True,
                                       return_counts=True)
    nb_per = -(-counts // G)  # buckets per video
    vid_idx = np.repeat(np.arange(len(uniq)), nb_per)
    within = np.concatenate([np.arange(n) for n in nb_per])
    bucket_real = np.minimum(counts[vid_idx] - within * G, G)
    base = starts_u[vid_idx] + within * G
    gather = base[:, None] + np.minimum(np.arange(G)[None, :],
                                        (bucket_real - 1)[:, None])
    return uniq[vid_idx], rows_s[gather], bucket_real


class RetrievalEvaluator:
    def __init__(self, params, vit_cfg: ViTConfig, med_cfg: MedConfig, tokenizer,
                 k_test: int = 64, dtype=jnp.bfloat16, rows_per_batch: int = 8,
                 mesh=None, blocks_per_dispatch: int = 8, self_fold: int = 8,
                 t2v_group: int | None = None):
        # mesh: optional ('data',...) Mesh — params replicated, batch inputs
        # sharded over 'data', one SPMD program over all local chips
        # self_fold: texts folded per block-diagonal self-attention sequence
        # in the grouped ITM rerank (exact — med_forward docstring; 8*16
        # trimmed tokens = one 128-lane MXU tile; the unfolded per-text
        # (16,16,64) score einsums ran the rerank at 11.9% MFU)
        self.mesh = mesh
        if mesh is not None:
            from vidil_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
        self.params = params
        self.vit_cfg = vit_cfg
        self.med_cfg = med_cfg
        self.tok = tokenizer
        self.k_test = k_test
        self.rows_per_batch = rows_per_batch
        self.blocks_per_dispatch = blocks_per_dispatch
        # t2v_group: texts per shared-video-memory bucket in the t2v
        # rerank. Bigger buckets amortize the (Lk, D) cross-K/V
        # materialization over more texts (the t2v direction's cost is
        # dominated by it — v2t shares one memory across all k=128 of a
        # row's texts and runs ~2x the blended rate) at the price of more
        # tail padding per video bucket. Exact for any value (padding is
        # masked out of the scatter). None -> min(64, k_test): on chip
        # the 1000x1000 k=128 eval reads 13.7k scorings/s at G=64 and
        # 14.3k at G=128 on near-uniform buckets (vs 6.6k at the old
        # G=32; benchmarks/retrieval_eval.jsonl) — 64 is kept as the
        # default because real corpora skew bucket sizes and padding
        # waste grows with G.
        self.t2v_group = t2v_group

        # params are explicit jit arguments (closure-captured trees get
        # serialized into remotely-compiled modules)
        @jax.jit
        def _text_side(params, ids, mask):
            # NO self_fold here: the feature pass is 256 rows x 35 tokens —
            # already MXU-shaped — and ran 7.6-14.9s warm pre-fold
            # (benchmarks/retrieval_eval.jsonl); with the fold wired in it
            # read ~700s in both 2026-08-19 runs (the folded 280-token text
            # program compiles freshly/pathologically on this backend for
            # zero compute benefit). The fold stays where it pays: the
            # rerank's (16-token, per-pair) text rows.
            hidden = M.med_forward(params["text_encoder"], ids, mask, cfg=med_cfg,
                                   mode="text", dtype=dtype)
            feat = linear(params["text_proj"], hidden[:, 0, :], dtype=dtype)
            return (feat / jnp.linalg.norm(feat.astype(jnp.float32), axis=-1, keepdims=True).astype(feat.dtype)).astype(jnp.float32)

        @jax.jit
        def _video_side(params, video):
            Bv, N = video.shape[:2]
            flat = video.reshape((Bv * N,) + video.shape[2:])
            feats = B.encode_images(params, flat, vit_cfg, dtype=dtype)
            emb = linear(params["vision_proj"], feats[:, 0, :], dtype=dtype)
            emb = emb.reshape(Bv, N, -1).mean(axis=1)
            emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True).astype(emb.dtype)
            video_feats = feats.reshape(Bv, N * feats.shape[1], feats.shape[2])
            return video_feats, emb.astype(jnp.float32)

        # Both rerank directions keep ALL video features and text ids
        # device-resident (uploaded once per eval, or left on device by
        # compute_video_features); per block only tiny (R,) / (R, k) index
        # arrays cross the host boundary.
        #
        # v2t: each video row scores k candidate texts against ONE video
        # memory — grouped cross-attention (blip_itm_scores group_size=k)
        # shares the (Lk, D) memory across the k texts, so the k-fold
        # feature expansion never materializes (at msrvtt scale that
        # expansion is R*k*1577*768 ≈ 2.5 GB per block and was the HBM
        # peak). t2v pairs each text with k DIFFERENT videos, so the
        # gather is unavoidable there and block rows are bounded instead.
        @jax.jit
        def _itm_v2t(params, video_feats, text_ids, text_atts, rows, topk):
            R, k = topk.shape
            flat = topk.reshape(-1)
            logits = B.blip_itm_scores(params, video_feats[rows],
                                       text_ids[flat], text_atts[flat],
                                       med_cfg, dtype=dtype, group_size=k,
                                       self_fold=self_fold)
            return logits[:, 1].reshape(R, k)

        @jax.jit
        def _itm_t2v(params, video_feats, text_ids, text_atts, rows, topk):
            R, k = topk.shape
            img = video_feats[topk.reshape(-1)]
            ids = jnp.repeat(text_ids[rows], k, axis=0)
            mask = jnp.repeat(text_atts[rows], k, axis=0)
            logits = B.blip_itm_scores(params, img, ids, mask, med_cfg, dtype=dtype)
            return logits[:, 1].reshape(R, k)

        # t2v, bucketed: the (text, video) pairs of this direction are
        # regrouped BY VIDEO so each bucket's texts share one video memory
        # via grouped cross-attention — same trick as v2t, recovered from
        # an inverted index instead of the row structure.
        @jax.jit
        def _itm_t2v_grouped(params, video_feats, text_ids, text_atts, vids, txts):
            R, G = txts.shape
            flat = txts.reshape(-1)
            logits = B.blip_itm_scores(params, video_feats[vids],
                                       text_ids[flat], text_atts[flat],
                                       med_cfg, dtype=dtype, group_size=G,
                                       self_fold=self_fold)
            return logits[:, 1].reshape(R, G)

        @jax.jit
        def _itm_t2v_grouped_blocks(params, video_feats, text_ids, text_atts,
                                    vids_b, txts_b):
            return jax.lax.scan(
                lambda _, vt: (None, _itm_t2v_grouped(params, video_feats, text_ids,
                                                      text_atts, vt[0], vt[1])),
                None, (vids_b, txts_b))[1]

        # all row-blocks of one direction in a single scanned program —
        # one dispatch per direction instead of one per R-row block
        @jax.jit
        def _itm_v2t_blocks(params, video_feats, text_ids, text_atts, rows_b, topk_b):
            return jax.lax.scan(
                lambda _, rt: (None, _itm_v2t(params, video_feats, text_ids,
                                              text_atts, rt[0], rt[1])),
                None, (rows_b, topk_b))[1]

        @jax.jit
        def _itm_t2v_blocks(params, video_feats, text_ids, text_atts, rows_b, topk_b):
            return jax.lax.scan(
                lambda _, rt: (None, _itm_t2v(params, video_feats, text_ids,
                                              text_atts, rt[0], rt[1])),
                None, (rows_b, topk_b))[1]

        self._text_side = lambda ids, mask: _text_side(self.params, ids, mask)
        self._video_side = lambda video: _video_side(self.params, video)
        self._itm_v2t = lambda *a: _itm_v2t(self.params, *a)
        self._itm_t2v = lambda *a: _itm_t2v(self.params, *a)
        self._itm_v2t_blocks = lambda *a: _itm_v2t_blocks(self.params, *a)
        self._itm_t2v_blocks = lambda *a: _itm_t2v_blocks(self.params, *a)
        self._itm_t2v_grouped_blocks = lambda *a: _itm_t2v_grouped_blocks(self.params, *a)

    def _put(self, x):
        if self.mesh is None:
            return jnp.asarray(x)
        from vidil_tpu.parallel.mesh import batch_put

        return batch_put(self.mesh, np.asarray(x))

    def compute_text_features(self, texts: list[str], batch_size: int = 256):
        """reference :93-112 (text_bs=256, [ENC] substituted after encoding)."""
        embeds, ids, atts = [], [], []
        for i in range(0, len(texts), batch_size):
            enc = self.tok(texts[i : i + batch_size], padding="max_length",
                           truncation=True, max_length=35)
            embeds.append(np.asarray(self._text_side(self._put(enc.input_ids),
                                                     self._put(enc.attention_mask))))
            ids.append(enc.input_ids)
            atts.append(enc.attention_mask)
        text_ids = np.concatenate(ids)
        text_ids[:, 0] = self.tok.enc_token_id
        text_atts = np.concatenate(atts)
        # Trim the fixed 35-pad (reference :45 contract) to the corpus's
        # true max token count (tokenizer.trimmed_pad_len): bitwise-neutral
        # for the rerank (test_retrieval_eval_trimmed_bitwise) while the
        # per-(text, video) MED rows — all proportional to L — shrink.
        # One corpus -> one trimmed shape -> one compile.
        from vidil_tpu.tokenizer import trimmed_pad_len

        L = trimmed_pad_len(text_atts)
        return (np.concatenate(embeds),
                np.ascontiguousarray(text_ids[:, :L]),
                np.ascontiguousarray(text_atts[:, :L]))

    def compute_video_features(self, video_batches):
        """video_batches: iterable of (B, N, S, S, C) normalized arrays.

        Returns (video_feats [device array], video_embeds [host np]).
        Features stay DEVICE-RESIDENT — the reference keeps them on-GPU
        too (train_retrieval_video.py:114-133); pulling them to host and
        re-uploading costs 2×~2.4 GB of link traffic at msrvtt scale."""
        feats, embeds = [], []
        for video in video_batches:
            f, e = self._video_side(self._put(video))
            feats.append(f)
            embeds.append(np.asarray(e))
        return jnp.concatenate(feats), np.concatenate(embeds)

    def _rerank_rows(self, sims, itm_blocks_fn, rows_per_batch=None):
        """k_test rerank over this rank's row shard: host argsort picks each
        row's top-k (np.argsort[::-1], exact reference ordering,
        train_retrieval_video.py:146-180), then ALL R-row blocks run in one
        scanned device program. ``itm_blocks_fn(rows_b, topk_b) ->
        (n_blocks, R, k)``."""
        n_rows, n_cols = sims.shape
        k = min(self.k_test, n_cols)
        R = max(1, rows_per_batch if rows_per_batch is not None else self.rows_per_batch)
        scores = np.full(sims.shape, -100.0, np.float32)
        start, end = shard_range(n_rows)
        rows_list, topk_list, reals = [], [], []
        for block_start in range(start, end, R):
            rows = list(range(block_start, min(end, block_start + R)))
            reals.append(len(rows))
            while len(rows) < R:  # pad to keep one compiled shape
                rows.append(rows[-1])
            rows_arr = np.asarray(rows, np.int32)
            rows_list.append(rows_arr)
            topk_list.append(np.argsort(sims[rows_arr], axis=1)[:, ::-1][:, :k].astype(np.int32))
        if not rows_list:
            return scores
        itm = self._dispatch_blocks(itm_blocks_fn,
                                    np.stack(rows_list), np.stack(topk_list))
        # vectorized scatter (a per-row python loop measured as real host
        # time at msrvtt scale on a 1-core host); padded rows masked out
        rows_mat, topk_mat = np.stack(rows_list), np.stack(topk_list)
        valid = np.arange(R)[None, :] < np.asarray(reals)[:, None]
        rr = rows_mat[valid]                          # (m,)
        cc = topk_mat[valid]                          # (m, k)
        scores[rr[:, None], cc] = itm[valid] + sims[rr[:, None], cc]
        return scores

    def _dispatch_blocks(self, blocks_fn, *stacked):
        """Run stacked rerank blocks in bounded dispatches of
        ``blocks_per_dispatch`` (last chunk padded by repetition, extra
        results dropped). One scanned program over ALL blocks is a single
        minutes-long device execution — long enough to trip worker
        watchdogs at msrvtt scale — and a per-block dispatch pays one
        host round-trip each; fixed-size chunks keep one compiled shape
        with ~seconds-long executions.

        One dispatch is kept in flight: the next chunk is ENQUEUED before
        the previous chunk's result is read back, so the device never
        drains between chunks. The phase-split measured the isolated
        dispatch at 2x the serial evaluator's rate — the other half was
        this dispatch→readback→dispatch gap (benchmarks/rerank_split.jsonl;
        same pattern as the CapFilt fused-filter chunk overlap)."""
        n_blocks = stacked[0].shape[0]
        SB = max(1, self.blocks_per_dispatch)
        outs = []
        pending = None  # (device_result, n_real_blocks)
        for off in range(0, n_blocks, SB):
            chunk = [a[off:off + SB] for a in stacked]
            real = chunk[0].shape[0]
            if real < SB:
                chunk = [np.concatenate([c, np.repeat(c[-1:], SB - real, axis=0)])
                         for c in chunk]
            dev = blocks_fn(*(jnp.asarray(c) for c in chunk))  # enqueue only
            if pending is not None:
                out, preal = pending
                outs.append(np.asarray(out)[:preal])  # readback overlaps `dev`
            pending = (dev, real)
        if pending is not None:
            out, preal = pending
            outs.append(np.asarray(out)[:preal])
        return np.concatenate(outs)

    def _rerank_t2v_bucketed(self, sims, vf, tids, tatts):
        """t2v rerank with pairs regrouped by video: invert each text row's
        top-k video list into per-video text buckets, pad buckets to a
        fixed group size, and score every bucket with grouped
        cross-attention (one shared video memory per bucket). Identical
        scores to the row-major t2v rerank — same pairs, same
        itm_logit + sim formula — but the k-fold gather of (Lk, D) video
        memories never materializes.

        Bucket construction and score scatter are vectorized numpy (the
        n·k python pair loops measured as real host time at msrvtt scale
        on a 1-core host): `build_t2v_buckets` reproduces the
        insertion-ordered loop formulation exactly (fuzz-pinned in
        tests/test_evals.py), and the scatter uses masked fancy
        indexing."""
        n_rows, n_cols = sims.shape  # rows = texts, cols = videos
        k = min(self.k_test, n_cols)
        G = max(1, min(self.t2v_group or 64, k))
        R = max(1, self.rows_per_batch)
        scores = np.full(sims.shape, -100.0, np.float32)
        start, end = shard_range(n_rows)
        if start >= end:
            return scores
        topk = np.argsort(sims[start:end], axis=1)[:, ::-1][:, :k]
        bucket_vid, bucket_txt, bucket_real = build_t2v_buckets(
            topk, start, end, G)
        nb = len(bucket_vid)
        pad = (-nb) % R
        if pad:
            bucket_vid = np.concatenate([bucket_vid,
                                         np.repeat(bucket_vid[-1:], pad)])
            bucket_txt = np.concatenate([bucket_txt,
                                         np.repeat(bucket_txt[-1:], pad, axis=0)])
        vids_b = bucket_vid.astype(np.int32).reshape(-1, R)
        txts_b = bucket_txt.astype(np.int32).reshape(-1, R, G)
        itm = self._dispatch_blocks(
            lambda v, t: self._itm_t2v_grouped_blocks(vf, tids, tatts, v, t),
            vids_b, txts_b)
        flat = itm.reshape(-1, G)[:nb]
        valid = np.arange(G)[None, :] < bucket_real[:, None]
        rr = bucket_txt[:nb][valid]
        cc = np.repeat(bucket_vid[:nb], bucket_real)
        scores[rr, cc] = flat[valid] + sims[rr, cc]
        return scores

    def score_matrices(self, video_feats, video_embeds, text_embeds, text_ids, text_atts):
        """Full v2t / t2v score matrices (reference :135-186)."""
        sims = np.asarray(video_embeds) @ np.asarray(text_embeds).T

        # features + text ids live on device for the whole rerank
        vf = video_feats if isinstance(video_feats, jax.Array) else \
            self._put(np.asarray(video_feats))
        tids = self._put(np.asarray(text_ids))
        tatts = self._put(np.asarray(text_atts))

        score_v2t = self._rerank_rows(
            sims, lambda rows_b, topk_b: self._itm_v2t_blocks(vf, tids, tatts, rows_b, topk_b))
        score_t2v = self._rerank_t2v_bucketed(sims.T, vf, tids, tatts)

        if get_world_size() > 1:
            from jax.experimental import multihost_utils

            score_v2t = multihost_utils.process_allgather(score_v2t).sum(axis=0) + 100.0 * (get_world_size() - 1)
            score_t2v = multihost_utils.process_allgather(score_t2v).sum(axis=0) + 100.0 * (get_world_size() - 1)
        return score_v2t, score_t2v


def itm_eval(scores_v2t, scores_t2v, txt2vid, vid2txt) -> dict:
    """R@1/5/10 + median rank (reference :195-237)."""
    ranks = np.zeros(scores_v2t.shape[0])
    for index, score in enumerate(scores_v2t):
        inds = np.argsort(score)[::-1]
        ranks[index] = np.where(inds == vid2txt[index])[0][0]
    tr1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    tr5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    tr10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)

    ranks = np.zeros(scores_t2v.shape[0])
    for index, score in enumerate(scores_t2v):
        inds = np.argsort(score)[::-1]
        ranks[index] = np.where(inds == txt2vid[index])[0][0]
    mdR = np.median(ranks + 1)
    vr1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    vr5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    vr10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)

    tr_mean = (tr1 + tr5 + tr10) / 3
    vr_mean = (vr1 + vr5 + vr10) / 3
    return {
        "txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10, "txt_r_mean": tr_mean,
        "vid_r1": vr1, "vid_r5": vr5, "vid_r10": vr10, "vid_r_mean": vr_mean,
        "vid_mdR": mdR, "r_mean": (tr_mean + vr_mean) / 2,
    }
