"""Visual tokenization: zero-shot frame tagging against ontologies.

TPU-first redesign of the reference driver (reference:
run_visual_tokenization.py). The stage is, at its core, ONE large cosine
matmul per ontology category: (all frame embeddings) x (ontology text
embeddings)^T, followed by per-frame top-k and a frequency vote
(:276,301-312). Here:

* ontology text embeddings are computed once in batches of 512
  (:84-96, EMBBDING_BATCH_LIMIT_TEXT=512) and can be cached to disk —
  the ontology never changes between runs;
* the scoring matmul runs on TPU in fp32 (``Precision.HIGHEST``) so the
  top-k ordering matches the reference's fp32 torch matmul;
* frames of many videos are embedded in one batched ViT call;
* per-frame ``np.argsort(frm_score)[::-1][:topk]`` and the frequency
  aggregation stay in exact reference form on the host (:173-187,301-308).

Supports both encoder versions: 'clip' (cosine only) and 'blip'
(cosine + per-frame ITM rerank of the top k_test texts, :277-293).
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from vidil_tpu.config import CLIPConfig, MedConfig, ViTConfig
from vidil_tpu.models import blip as BLIP
from vidil_tpu.models import med as M
from vidil_tpu.models.clip import clip_image_embeds, clip_text_embeds
from vidil_tpu.models.layers import linear
from vidil_tpu.ops.image import CLIP_MEAN, CLIP_STD

# reference: run_visual_tokenization.py:471-472
OMIT_KEYWORDS = [
    "media player", "video", "playing video", "audio", "sound", "taking video",
    "water mark", "water marked", "watermark", "watermarks", "for sale in",
    "sold from", "stock", "sold on", "by viewers", "are provided by",
    "are posted on", "for more", "tag with", "stream from", "viewed from",
    "showing video of", "are on at", "shuttlecock", "shutter",
    "shutter is white", "shutters have bones", "tape is looped",
    "bliss wants you", "thumbnail", "technique",
]

EMBEDDING_BATCH_LIMIT_TEXT = 512  # reference :470


def get_prefix_prompt_functions(version: str) -> dict:
    """reference :56-80 — v0: identity; v1: 'A photo of {x}'."""
    if version == "v0":
        fn = lambda x: x
    elif version == "v1":
        fn = lambda x: f"A photo of {x}"
    else:
        raise ValueError(f"unknown prompt version {version}")
    return {"objects": fn, "attributes": fn, "scenes": fn, "verbs": fn}


def load_ontology(paths: dict, omit_keywords=OMIT_KEYWORDS) -> dict:
    """Load + filter ontology term lists with the reference's exact
    (order-preserving, iterate-while-removing) semantics (:383-406)."""
    import json

    def load(p):
        with open(p) as f:
            return json.load(f)

    object_texts = load(paths["objects"])
    attribute_texts = load(paths["attributes"])
    scene_texts = load(paths["scenes"])
    verb_texts = load(paths["verbs"])
    if isinstance(verb_texts, dict):
        verb_texts = list(verb_texts.keys())
    # NOTE: the reference mutates the list while iterating it (:389-391),
    # which skips the element after each removal — replicated exactly.
    for key in attribute_texts:
        if key in object_texts:
            attribute_texts.remove(key)
    for key in omit_keywords:
        if key in object_texts:
            object_texts.remove(key)
        if key in attribute_texts:
            attribute_texts.remove(key)
        if key in scene_texts:
            scene_texts.remove(key)
        if key in verb_texts:
            verb_texts.remove(key)
    return {
        "objects": object_texts,
        "attributes": attribute_texts,
        "scenes": scene_texts,
        "verbs": verb_texts,
    }


def ontology_paths(ontology: str, root: str) -> dict:
    """reference :369-381 — file layout of the vg / vg_tencent ontologies."""
    import os

    if ontology == "vg":
        return {
            "objects": os.path.join(root, "vg/openimage_classes_all_cleaned_fictional_characters.json"),
            "attributes": os.path.join(root, "vg/vg_original_attributes_synsets_keys_cleaned_remove_similar0.9.json"),
            "scenes": os.path.join(root, "vg/place365_ontology.json"),
            "verbs": os.path.join(root, "vg/vg_srl_selected_object_synsets_keys_remove_similar0.9.json"),
        }
    if ontology == "vg_tencent":
        return {
            "objects": os.path.join(root, "vg_tencent/tencent_ml_images_objects.json"),
            "attributes": os.path.join(root, "vg_tencent/vg_original_attributes_synsets_keys_cleaned_remove_similar0.9.json"),
            "scenes": os.path.join(root, "vg/place365_ontology.json"),
            "verbs": os.path.join(root, "vg_tencent/vg_srl_selected_object_synsets_keys_remove_similar0.9.json"),
        }
    raise ValueError(f"unknown ontology {ontology}")


def aggregate_frame_tokens(frame_tokens: list[dict]) -> dict:
    """Frequency vote over per-frame top-k lists (reference :173-187)."""
    keys = frame_tokens[0].keys()
    aggregated = {key: [] for key in keys}
    topk = len(frame_tokens[0]["objects"])
    num_frm = len(frame_tokens)
    for key in keys:
        if frame_tokens[0][key] == []:
            continue
        count_dict = defaultdict(int)
        for j in range(topk):
            for i in range(num_frm):
                count_dict[frame_tokens[i][key][j]] += 1
        candidates = sorted(count_dict.items(), key=lambda x: x[1], reverse=True)
        aggregated[key] = [t for t, _ in candidates[:topk]]
    return aggregated


# ---------------------------------------------------------------------------
# CLIP image preprocessing (CLIPProcessor parity: shortest-side resize +
# center crop + normalize)
# ---------------------------------------------------------------------------

def clip_preprocess_pil(frames_u8: np.ndarray, size: int = 224) -> np.ndarray:
    """(F, H, W, C) uint8 -> (F, size, size, C) uint8 via PIL bicubic
    shortest-side resize + center crop (HF CLIPImageProcessor defaults)."""
    out = np.empty((len(frames_u8), size, size, 3), np.uint8)
    for i, frm in enumerate(frames_u8):
        img = Image.fromarray(frm)
        w, h = img.size
        short, long = (w, h) if w <= h else (h, w)
        new_short = size
        new_long = int(size * long / short)
        nw, nh = (new_short, new_long) if w <= h else (new_long, new_short)
        img = img.resize((nw, nh), Image.BICUBIC)
        left = (nw - size) // 2
        top = (nh - size) // 2
        out[i] = np.asarray(img.crop((left, top, left + size, top + size)))
    return out


# ---------------------------------------------------------------------------
# engines
# ---------------------------------------------------------------------------

class ClipTokenizationEngine:
    """encoder_version='clip': cosine scoring only (reference :295-296)."""

    def __init__(self, clip_params, clip_cfg: CLIPConfig, clip_tokenizer, dtype=None,
                 mesh=None):
        # mesh: optional Mesh with a 'data' axis — params replicated once,
        # batch inputs sharded, so one engine serves all local chips SPMD
        self.mesh = mesh
        if mesh is not None:
            from vidil_tpu.parallel.mesh import replicated

            clip_params = jax.device_put(clip_params, replicated(mesh))
        self.params = clip_params
        self.cfg = clip_cfg
        self.tok = clip_tokenizer
        mean = np.asarray(CLIP_MEAN, np.float32)
        std = np.asarray(CLIP_STD, np.float32)

        # params are explicit jit arguments (closure-captured trees get
        # serialized into remotely-compiled modules)
        @jax.jit
        def _embed_texts(params, ids):
            return clip_text_embeds(params, ids, clip_cfg, dtype=dtype)

        @jax.jit
        def _embed_texts_blocks(params, ids_blocks):
            """(n_blocks, bs, L) -> (n_blocks, bs, D): all ontology blocks
            in ONE program via lax.scan — one dispatch instead of ~87
            sequential jit calls for a 44k-text ontology (dispatch latency
            dominates on remote backends). Same block size as the
            reference (512), so numerics are identical per block."""
            return jax.lax.scan(
                lambda _, ids: (None, clip_text_embeds(params, ids, clip_cfg, dtype=dtype)),
                None, ids_blocks)[1]

        @jax.jit
        def _embed_frames(params, frames_u8):
            x = (frames_u8.astype(jnp.float32) / 255.0 - mean) / std
            return clip_image_embeds(params, x, clip_cfg, dtype=dtype)

        @jax.jit
        def _pool_frames(params, frames_u8):
            # vision pooler_output (post_layernorm CLS, BEFORE the visual
            # projection) — what the reference's clip-kmeans frame selector
            # clusters (reference: data/video_pretrain_dataset.py:199-202)
            from vidil_tpu.models.clip import clip_vision_forward

            x = (frames_u8.astype(jnp.float32) / 255.0 - mean) / std
            return clip_vision_forward(params, x, clip_cfg, dtype=dtype)[1]

        @jax.jit
        def _sims(img, txt):
            return jnp.dot(img, txt.T, precision=jax.lax.Precision.HIGHEST)

        self._embed_texts = lambda ids: _embed_texts(self.params, ids)
        self._embed_texts_blocks = lambda ids: _embed_texts_blocks(self.params, ids)
        self._embed_frames = lambda frames: _embed_frames(self.params, frames)
        self._pool_frames = lambda frames: _pool_frames(self.params, frames)
        self._sims = _sims

    def _put(self, x):
        if isinstance(x, jax.Array):
            return x  # already device-resident (e.g. embed_frames output)
        if self.mesh is None:
            return jnp.asarray(x)
        from vidil_tpu.parallel.mesh import batch_put

        return batch_put(self.mesh, x)

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        """Batched text embedding (batch 512, reference :84-96). Multi-block
        inputs (ontologies) run all blocks in one scanned program."""
        bs = EMBEDDING_BATCH_LIMIT_TEXT
        n = len(texts)
        if n <= bs:
            enc = self.tok(texts, padding="max_length",
                           truncation=True, max_length=self.cfg.max_text_len)
            return np.asarray(self._embed_texts(self._put(enc.input_ids)))
        enc = self.tok(texts, padding="max_length",
                       truncation=True, max_length=self.cfg.max_text_len)
        ids = enc.input_ids
        if n % bs:
            pad = np.tile(ids[-1:], (bs - n % bs, 1))
            ids = np.concatenate([ids, pad], axis=0)
        blocks = ids.reshape(-1, bs, ids.shape[1])
        emb = np.asarray(self._embed_texts_blocks(jnp.asarray(blocks)))
        return emb.reshape(-1, emb.shape[-1])[:n]

    def embed_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        """(F, S, S, C) uint8 (already CLIP-preprocessed) -> (F, D)."""
        return np.asarray(self._embed_frames(self._put(frames_u8)))

    def pool_frames(self, frames_u8: np.ndarray) -> np.ndarray:
        """Vision pooler_output (F, D_vision) — pre-projection CLS states,
        the reference's clip-kmeans clustering feature."""
        return np.asarray(self._pool_frames(self._put(frames_u8)))

    def score(self, image_embeds: np.ndarray, text_embeds: np.ndarray) -> np.ndarray:
        return np.asarray(self._sims(jnp.asarray(image_embeds), jnp.asarray(text_embeds)))


class BlipTokenizationEngine:
    """encoder_version='blip': cosine + per-frame ITM rerank (reference
    :113-133,277-293). Uses BLIP retrieval-style params (blip_itm layout)."""

    def __init__(self, params, vit_cfg: ViTConfig, med_cfg: MedConfig, tokenizer,
                 k_test: int = 128, dtype=None, mesh=None):
        self.mesh = mesh
        if mesh is not None:
            from vidil_tpu.parallel.mesh import replicated

            params = jax.device_put(params, replicated(mesh))
        self.params = params
        self.vit_cfg = vit_cfg
        self.med_cfg = med_cfg
        self.tok = tokenizer
        self.k_test = k_test
        mean = np.asarray(CLIP_MEAN, np.float32)
        std = np.asarray(CLIP_STD, np.float32)

        # params are explicit jit arguments (closure-captured trees get
        # serialized into remotely-compiled modules)
        @jax.jit
        def _embed_texts(params, ids, mask):
            hidden = M.med_forward(params["text_encoder"], ids, mask, cfg=med_cfg,
                                   mode="text", dtype=dtype)
            feat = linear(params["text_proj"], hidden[:, 0, :], dtype=dtype)
            return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

        @jax.jit
        def _embed_texts_blocks(params, ids_blocks, mask_blocks):
            """(n_blocks, bs, L) -> (n_blocks, bs, D) in one scanned program
            (one dispatch for a whole ontology instead of one per block)."""
            return jax.lax.scan(
                lambda _, im: (None, _embed_texts(params, im[0], im[1])),
                None, (ids_blocks, mask_blocks))[1]

        @jax.jit
        def _embed_frames(params, frames_u8):
            x = (frames_u8.astype(jnp.float32) / 255.0 - mean) / std
            feats = BLIP.encode_images(params, x, vit_cfg, dtype=dtype)
            emb = linear(params["vision_proj"], feats[:, 0, :], dtype=dtype)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            return feats, emb

        @jax.jit
        def _itm(params, image_feats, ids, mask):
            """image_feats (R, P, D), ids/mask (R*k, L): each frame's k
            candidate texts share ONE frame memory via grouped
            cross-attention (blip_itm_scores group_size=k) — the k-fold
            feature expansion never materializes, on host or device."""
            k = ids.shape[0] // image_feats.shape[0]
            logits = BLIP.blip_itm_scores(params, image_feats, ids, mask, med_cfg,
                                          dtype=dtype, group_size=k)
            return logits[:, 1]

        def _itm_core(params, image_feats, ids, mask):
            k = ids.shape[0] // image_feats.shape[0]
            logits = BLIP.blip_itm_scores(params, image_feats, ids, mask, med_cfg,
                                          dtype=dtype, group_size=k)
            return logits[:, 1]

        @jax.jit
        def _itm_blocks(params, image_feats_all, idxs, ids, mask):
            """Scanned multi-block rerank: idxs (nb, R) frame-row indices
            into image_feats_all (N, P, D); ids/mask (nb, R*k, L). One
            dispatch + one readback for nb blocks instead of one blocking
            round trip per block (the per-block host RTT was ~25% of the
            rerank wall clock at bench shapes)."""
            def body(_, im):
                i, d, m = im
                return None, _itm_core(params, image_feats_all[i], d, m)

            return jax.lax.scan(body, None, (idxs, ids, mask))[1]

        self._embed_texts = lambda ids, mask: _embed_texts(self.params, ids, mask)
        self._embed_texts_blocks = lambda ids, mask: _embed_texts_blocks(self.params, ids, mask)
        self._embed_frames_j = lambda frames: _embed_frames(self.params, frames)
        self._itm = lambda *a: _itm(self.params, *a)
        self._itm_blocks = lambda *a: _itm_blocks(self.params, *a)

    def _put(self, x):
        if isinstance(x, jax.Array):
            return x  # already device-resident (e.g. embed_frames output)
        if self.mesh is None:
            return jnp.asarray(x)
        from vidil_tpu.parallel.mesh import batch_put

        return batch_put(self.mesh, x)

    def embed_texts(self, texts: list[str]):
        """Returns (text_embeds, text_ids, text_atts); ids get [ENC] at pos 0
        for the ITM rerank (reference :114-133). Multi-block inputs run all
        512-text blocks in one scanned program."""
        bs = EMBEDDING_BATCH_LIMIT_TEXT
        n = len(texts)
        enc = self.tok(texts, padding="max_length", truncation=True, max_length=35)
        # Trim the fixed max_length=35 padding (reference :122 contract) to
        # the batch's true max token count (tokenizer.trimmed_pad_len):
        # bitwise-neutral (masked pads contribute exactly 0 — pinned in
        # test_blip_tokenization.py::test_trimmed_padding_bitwise_equal)
        # while the text-side rerank FLOPs — the per-(frame,candidate)
        # MED rows, all proportional to L — drop by ~35/L. The ontology is
        # fixed per run, so the trimmed shape compiles once.
        from vidil_tpu.tokenizer import trimmed_pad_len

        L = trimmed_pad_len(enc.attention_mask)
        enc.input_ids = np.ascontiguousarray(np.asarray(enc.input_ids)[:, :L])
        enc.attention_mask = np.ascontiguousarray(np.asarray(enc.attention_mask)[:, :L])
        if n <= bs:
            embeds = np.asarray(self._embed_texts(self._put(enc.input_ids),
                                                  self._put(enc.attention_mask)))
        else:
            ids, mask = enc.input_ids, enc.attention_mask
            if n % bs:
                pad = bs - n % bs
                ids = np.concatenate([ids, np.tile(ids[-1:], (pad, 1))], axis=0)
                mask = np.concatenate([mask, np.tile(mask[-1:], (pad, 1))], axis=0)
            L = ids.shape[1]
            emb = np.asarray(self._embed_texts_blocks(
                jnp.asarray(ids.reshape(-1, bs, L)), jnp.asarray(mask.reshape(-1, bs, L))))
            embeds = emb.reshape(-1, emb.shape[-1])[:n]
        text_ids = enc.input_ids.copy()
        text_ids[:, 0] = self.tok.enc_token_id
        return embeds, text_ids, enc.attention_mask

    def embed_frames(self, frames_u8: np.ndarray):
        """Returns (feats [DEVICE array], embeds [host np]). Features stay
        device-resident for the rerank — pulling the (F, 577, 768) tensors
        to host and re-uploading them per rerank block costs ~14 MB per
        8-frame block per ontology category on the ingest link."""
        feats, emb = self._embed_frames_j(self._put(frames_u8))
        return feats, np.asarray(emb)

    def score(self, image_embeds, text_embeds):
        return image_embeds @ text_embeds.T

    def rerank(self, sims_row, image_feat, text_ids, text_atts):
        """ITM rerank of the top k_test texts for one frame (reference
        :277-293): score = itm_logit[:, 1] + topk_sim at the topk indices,
        -100 elsewhere."""
        return self.rerank_block(sims_row[None], image_feat[None], text_ids, text_atts)[0]

    def rerank_block(self, sims_rows, image_feats, text_ids, text_atts):
        """Batched ITM rerank: R frames' top-k_test texts scored in ONE
        program (the reference loops per frame, :281-293).

        sims_rows: (R, n_texts); image_feats: (R, P, D). Returns (R, n_texts)
        with -100 outside each row's top-k.
        """
        R, n_texts = sims_rows.shape
        k = min(self.k_test, n_texts)
        topk_idx = np.argsort(sims_rows, axis=1)[:, ::-1][:, :k]  # (R, k)
        flat = topk_idx.reshape(-1)
        scores = np.asarray(self._itm(
            self._put(image_feats), self._put(text_ids[flat]),
            self._put(text_atts[flat])
        )).reshape(R, k)
        out = np.full(sims_rows.shape, -100.0, np.float32)
        for r in range(R):
            out[r, topk_idx[r]] = scores[r] + sims_rows[r][topk_idx[r]]
        return out

    def rerank_all(self, sims, image_feats, text_ids, text_atts,
                   rows_per_block: int = 4, blocks_per_dispatch: int = 16):
        """ITM rerank of EVERY frame row in scanned multi-block programs.

        sims: (N, n_texts) host; image_feats: (N, P, D) device (may hold
        padded rows past N — never gathered). Same math as rerank_block
        over ceil(N / rows_per_block) blocks, but blocks run
        `blocks_per_dispatch` at a time inside one lax.scan program — one
        dispatch + one readback per dispatch-group instead of one
        blocking host round trip per block. Bounded dispatches keep each
        device execution seconds-long (single multi-minute programs trip
        worker watchdogs; see evals/retrieval.py _dispatch_blocks).
        """
        N, n_texts = sims.shape
        k = min(self.k_test, n_texts)
        R = rows_per_block
        if self.mesh is not None:
            # data-parallel mesh: the scanned program's leading axis is the
            # BLOCK axis, which lax.scan slices away per step — sharding it
            # would replicate each step's ITM work on every chip. The
            # per-block path shards the (R*k, L) ITM batch over 'data'
            # (rerank_block._put), so each chip scores a slice; keep it.
            outs = []
            for s in range(0, N, R):
                e = min(N, s + R)
                rows = sims[s:e]
                idx = list(range(s, e)) + [e - 1] * (R - (e - s))
                feats = image_feats[np.asarray(idx, np.int32)]
                if e - s < R:
                    rows = np.concatenate([rows, np.repeat(rows[-1:], R - (e - s), axis=0)])
                outs.append(self.rerank_block(rows, feats, text_ids, text_atts)[: e - s])
            return np.concatenate(outs)
        nb = -(-N // R)
        topk_idx = np.argsort(sims, axis=1)[:, ::-1][:, :k]  # (N, k)
        # pad rows to nb*R by repeating the last row (results dropped)
        pad = nb * R - N
        row_idx = np.concatenate([np.arange(N), np.full(pad, N - 1)]).astype(np.int32)
        ids_all = text_ids[topk_idx[row_idx].reshape(-1)]      # (nb*R*k, L)
        atts_all = text_atts[topk_idx[row_idx].reshape(-1)]
        L = ids_all.shape[1]
        idxs = row_idx.reshape(nb, R)
        ids_b = ids_all.reshape(nb, R * k, L)
        atts_b = atts_all.reshape(nb, R * k, L)

        feats_dev = self._put(image_feats)
        # clamp to the real block count: padding a SHORT dispatch up to
        # blocks_per_dispatch computes the pad blocks for real (measured
        # 1.5x slower than per-block calls when nb=8 padded to 16)
        SB = max(1, min(blocks_per_dispatch, nb))
        outs = []
        for off in range(0, nb, SB):
            ch_i, ch_d, ch_m = (a[off:off + SB] for a in (idxs, ids_b, atts_b))
            real = ch_i.shape[0]
            if real < SB:  # pad to one compiled shape; extra results dropped
                ch_i, ch_d, ch_m = (
                    np.concatenate([c, np.repeat(c[-1:], SB - real, axis=0)])
                    for c in (ch_i, ch_d, ch_m))
            out = np.asarray(self._itm_blocks(
                feats_dev, self._put(ch_i), self._put(ch_d), self._put(ch_m)))
            outs.append(out[:real])
        itm = np.concatenate(outs).reshape(nb * R, k)[:N]
        scores = np.full(sims.shape, -100.0, np.float32)
        rows = np.arange(N)[:, None]
        scores[rows, topk_idx] = itm + sims[rows, topk_idx]
        return scores


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def predict_videos(
    engine,
    video_frames: dict,
    captions: dict,
    visual_token_texts: dict,
    prompt_functions: dict,
    topk_visualize: int = 5,
    text_cache: dict | None = None,
    pad_to_videos: int = 0,
) -> dict:
    """Score every frame of every video against every ontology category.

    video_frames: {video_id: (F, S, S, C) uint8 preprocessed frames} —
    values may be host numpy OR device arrays (the CLI device_puts them
    from its decode threads so the upload overlaps the previous chunk's
    compute).
    captions: {video_id: caption str}
    pad_to_videos: pad the frame batch to this many videos by repeating
    the last video so tail chunks reuse the full chunk's compiled program
    (fresh per-shape compiles are minutes on remote-compile backends);
    padded rows are computed and discarded. Per-frame outputs are
    row-independent within a program, so the padding rows' CONTENT never
    affects real rows; reruns with the same chunking are byte-identical
    (the determinism contract the exact-match parity gate needs).
    Returns the reference's videoid_2_visual_tokens structure (:268-314).
    """
    blip_mode = isinstance(engine, BlipTokenizationEngine)
    video_ids = list(video_frames.keys())
    num_frm = next(iter(video_frames.values())).shape[0]

    # frame side: the WHOLE chunk in one batched program (one dispatch +
    # one readback instead of one per video — per-video calls serialized
    # upload -> compute -> readback V times per chunk)
    frames_list = [video_frames[v] for v in video_ids]
    if pad_to_videos and len(video_ids) < pad_to_videos:
        frames_list = frames_list + [frames_list[-1]] * (pad_to_videos - len(video_ids))
    if any(not isinstance(f, np.ndarray) for f in frames_list):
        import jax.numpy as jnp

        all_frames = jnp.concatenate([jnp.asarray(f) for f in frames_list])
        if getattr(engine, "mesh", None) is not None:
            # the CLI's decode threads committed the frames to the default
            # device; reshard the batch over the mesh (engine._put passes
            # jax.Arrays through untouched)
            from vidil_tpu.parallel.mesh import batch_put

            all_frames = batch_put(engine.mesh, all_frames)
    else:
        all_frames = np.concatenate(frames_list)
    n_real = len(video_ids) * num_frm
    # image_embeds keeps its PADDED rows through the scoring (and, in
    # blip mode, rerank) stages so tail chunks run the full chunk's
    # compiled program shapes end-to-end; the pad rows are sliced off
    # only at the final host-side `score[:n_real]`
    if blip_mode:
        image_feats, image_embeds = engine.embed_frames(all_frames)
    else:
        image_embeds = engine.embed_frames(all_frames)

    result = {
        vid: {"frame_tokens": [defaultdict(list) for _ in range(num_frm)], "caption": captions[vid]}
        for vid in video_ids
    }

    for key in visual_token_texts.keys():
        texts = [prompt_functions[key](t) for t in visual_token_texts[key]]
        if text_cache is not None and key in text_cache:
            text_side = text_cache[key]
        else:
            text_side = engine.embed_texts(texts)
            if text_cache is not None:
                text_cache[key] = text_side
        if blip_mode:
            text_embeds, text_ids, text_atts = text_side
        else:
            text_embeds = text_side

        sims = engine.score(image_embeds, text_embeds)  # (n_frames_padded, n_texts)
        if blip_mode:
            # all frames' top-k_test reranks in scanned multi-block
            # programs (one dispatch per 16 blocks of 4 rows instead of
            # one blocking round trip per block); padded rows rerank too
            # — same compiled shapes for tail chunks — and are dropped
            score = engine.rerank_all(sims, image_feats, text_ids, text_atts,
                                      rows_per_block=getattr(engine, "rerank_rows", 4))
        else:
            score = sims

        score = score[:n_real].reshape(len(video_ids), num_frm, -1)
        for j, vid in enumerate(video_ids):
            for frm_idx in range(num_frm):
                frm_score = score[j][frm_idx]
                inds = np.argsort(frm_score)[::-1][:topk_visualize]
                result[vid]["frame_tokens"][frm_idx][key] = [visual_token_texts[key][ii] for ii in inds]

    for vid, obj in result.items():
        obj["frame_tokens"] = [dict(ft) for ft in obj["frame_tokens"]]
        obj["aggregated_tokens"] = aggregate_frame_tokens(obj["frame_tokens"])
    return result


def make_clip_kmeans_selector(engine: ClipTokenizationEngine, downsample_ratio: int = 2):
    """clip-kmeans frame selection (reference:
    data/video_pretrain_dataset.py:189-216): embed every `downsample_ratio`-th
    frame with CLIP, KMeans into num_frm clusters, sample one frame per
    cluster with np.random. Clusters the vision pooler_output (pre-
    projection post-layernorm CLS), matching the reference's
    `outputs.pooler_output` feature choice (:199-202)."""
    from sklearn.cluster import KMeans

    def selector(vr, num_frm: int):
        vlen = len(vr)
        downsampled = np.arange(vlen, step=downsample_ratio, dtype=int)
        frames = vr.get_batch(downsampled)
        pre = clip_preprocess_pil(frames, engine.cfg.image_size)
        emb = engine.pool_frames(pre)
        kmeans = KMeans(n_clusters=num_frm, random_state=0).fit(emb)
        labels = kmeans.labels_
        out = []
        for i in range(num_frm):
            masked = np.where(labels == i)[0]
            out.append(downsampled[np.random.choice(masked)])
        return sorted(out)

    return selector
