"""BLIP model assemblies: caption decoder (image + video), ITM scorer, base.

Functional equivalents of the reference BLIP models (reference:
models/blip.py, models/blip_itm.py), built from the ViT and MED cores:

* ``BLIP_Decoder``       -> blip_caption_loss / blip_generate
* ``BLIP_Video_Decoder`` -> video_embeds via frame-concat ("concat_frame"
  late fusion: B×N frames -> ViT -> (B, N*P, D); reference blip.py:196-231)
* ``BLIP_ITM``           -> blip_itm_scores / blip_itc_sim

All compute paths are jittable; strings stay on the host (tokenizer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.layers import init_linear, linear
from vidil_tpu.models.vit import init_vit, vit_forward
from vidil_tpu.ops.generation import GenerationConfig, beam_search, nucleus_sample


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_blip_decoder(key, vit_cfg: ViTConfig, med_cfg: MedConfig):
    k1, k2 = jax.random.split(key)
    return {
        "visual_encoder": init_vit(k1, vit_cfg),
        "text_decoder": M.init_med(k2, med_cfg, with_lm_head=True),
    }


def init_blip_itm(key, vit_cfg: ViTConfig, med_cfg: MedConfig, embed_dim: int = 256):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "visual_encoder": init_vit(k1, vit_cfg),
        "text_encoder": M.init_med(k2, med_cfg),
        "vision_proj": init_linear(k3, vit_cfg.hidden_size, embed_dim),
        "text_proj": init_linear(k4, med_cfg.hidden_size, embed_dim),
        "itm_head": init_linear(k5, med_cfg.hidden_size, 2),
    }


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def encode_images(params, images, vit_cfg: ViTConfig, dtype=None):
    """images (B, H, W, C) -> (B, P+1, D)."""
    return vit_forward(params["visual_encoder"], images, vit_cfg, dtype=dtype)


def encode_video_frames(params, video, vit_cfg: ViTConfig, dtype=None):
    """Concat-frame late fusion (reference: models/blip.py:196-201).

    video: (B, N, H, W, C) -> (B, N*(P+1), D) — all frames batched through
    the ViT in one MXU-friendly call, then flattened along the token axis.
    """
    B, N = video.shape[:2]
    flat = video.reshape((B * N,) + video.shape[2:])
    embeds = vit_forward(params["visual_encoder"], flat, vit_cfg, dtype=dtype)
    return embeds.reshape(B, N * embeds.shape[1], embeds.shape[2])


# ---------------------------------------------------------------------------
# caption training loss
# ---------------------------------------------------------------------------

def blip_caption_loss(
    params, image_embeds, input_ids, attention_mask, med_cfg: MedConfig,
    prompt_length: int, dtype=None,
):
    """LM loss with prompt + pad masking (reference: models/blip.py:104-125).

    input_ids must already start with the [DEC] bos token; targets mask the
    first prompt_length tokens and pad positions with -100.
    """
    labels = jnp.where(attention_mask == 1, input_ids, -100)
    pos = jnp.arange(input_ids.shape[1])
    labels = jnp.where(pos[None, :] < prompt_length, -100, labels)
    hidden = M.med_forward(
        params["text_decoder"], input_ids, attention_mask,
        encoder_hidden_states=image_embeds, cfg=med_cfg,
        mode="multimodal", is_decoder=True, dtype=dtype,
    )
    logits = M.med_lm_logits(params["text_decoder"], hidden, med_cfg, dtype=dtype)
    return M.med_lm_loss(logits, labels, label_smoothing=med_cfg.label_smoothing)


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def make_decoder_closures(params, cross_k, cross_v, cross_bias, med_cfg: MedConfig, dtype=None,
                          beam_size: int = 1, int8_dot: bool = False):
    dec = params["text_decoder"]

    def prefill_fn(ids, cache):
        h, cache = M.med_decode_prefill(dec, ids, cache, cross_k, cross_v, cross_bias, med_cfg,
                                        dtype=dtype, beam_size=beam_size, int8_dot=int8_dot)
        return M.med_lm_logits(dec, h[:, -1], med_cfg, dtype=dtype).astype(jnp.float32), cache

    def step_fn(tokens, idx, cache):
        return M.med_decode_step(dec, tokens, idx, cache, cross_k, cross_v, cross_bias, med_cfg,
                                 dtype=dtype, beam_size=beam_size, int8_dot=int8_dot)

    def reorder_fn(cache, idx):
        if "anc" in cache:
            # lazy reorder: permute ONLY the (B, L) int32 ancestry matrix;
            # the K/V rows never move (the decode step gathers through anc
            # — the bytes the attention already reads). Replaces the
            # 2.3-2.8 ms/step physical cache permutation at the CapFilt
            # shapes (benchmarks/capfilt_profile.jsonl stepx rows).
            return dict(cache, anc=cache["anc"][idx])
        if isinstance(cache["k"], tuple):  # unrolled per-layer layout
            return jax.tree.map(lambda x: x[idx], cache)
        return jax.tree.map(lambda x: x[:, idx], cache)

    return prefill_fn, step_fn, reorder_fn


def blip_generate_ids(
    params, image_embeds, prompt_ids, med_cfg: MedConfig, gen: GenerationConfig,
    sample: bool = False, rng_key=None, dtype=None, cache_dtype=None,
    beam_group_kv: bool = False, cross_kv_int8: bool | str = False,
    decode_layer_unroll: bool = False, decode_lazy_reorder: bool = False,
):
    """Generate token ids from encoded images/video.

    image_embeds: (B, Lk, D) — NOT yet beam-expanded; prompt_ids: (B, Lp)
    starting with [DEC] and WITHOUT the trailing [SEP] (reference:
    models/blip.py:135-138 cuts the last token).
    """
    B = image_embeds.shape[0]
    # beam_group_kv=True keeps cross K/V at batch B (beams of one item share
    # the memory on-chip) — 2x faster decode steady-state (HBM-bound on the
    # N*(P+1)-token video memory) but compiles slowly on remote-compiled
    # backends; default is the replicated layout (reference semantics,
    # repeat_interleave at blip.py:130). Token outputs are identical (tested).
    expand = 1 if sample else gen.num_beams
    beam_size = expand if beam_group_kv else 1
    batch = B * expand
    kv_src = image_embeds if beam_group_kv or sample else jnp.repeat(image_embeds, expand, axis=0)
    cross_k, cross_v = M.precompute_cross_kv(params["text_decoder"], kv_src, med_cfg, dtype=dtype)
    if cross_kv_int8:
        # halve the decode loop's dominant HBM read (the per-step re-read of
        # the full cross-K/V); parity-affecting opt-in — see quantize_cross_kv.
        # 'dot' additionally quantizes q/probs per row so the attention dots
        # run int8 x int8 on the MXU (no materialized bf16 dequant copy).
        # NOTE: 'dot' requires the beam-grouped layout — with beam_size==1
        # (beam_group_kv=False, or sample mode) the attention block has no
        # int8-dot kernel and degrades to the int8-store dequant path.
        cross_k, cross_v = M.quantize_cross_kv(cross_k, cross_v)
    cross_bias = M.invert_attention_mask(jnp.ones(kv_src.shape[:2], jnp.int32))
    # decode_layer_unroll / decode_lazy_reorder: logic-identical decode
    # restructurings (see init_self_cache docstring for the measured costs
    # they remove; CPU tests assert bit-equality). Caveat: on TPU bf16 the
    # unrolled per-layer bodies fuse/round differently than the scanned
    # body, and beam search amplifies ulp flips — measured 73% token
    # agreement vs stock for a 1.08x generate / 1.03x chunk speedup
    # (benchmarks/decode_struct_ab.jsonl), hence OFF by default. Lazy
    # reorder stays bit-identical on TPU but measured slower (0.90x) —
    # also opt-in. Lazy only exists on the beam path: sampling never
    # permutes the cache, so the anc gather would be pure overhead.
    cache = M.init_self_cache(med_cfg, batch, gen.max_length,
                              dtype=cache_dtype or dtype or jnp.float32,
                              unrolled=decode_layer_unroll,
                              lazy_reorder=decode_lazy_reorder and not sample)
    prefill_fn, step_fn, reorder_fn = make_decoder_closures(
        params, cross_k, cross_v, cross_bias, med_cfg, dtype=dtype, beam_size=beam_size,
        int8_dot=(cross_kv_int8 == "dot"),
    )
    if sample:
        assert rng_key is not None
        return nucleus_sample(prompt_ids, cache, prefill_fn, step_fn, gen, rng_key)
    seqs, _ = beam_search(prompt_ids, cache, prefill_fn, step_fn, reorder_fn, gen)
    return seqs


def decode_captions(tokenizer, sequences, prompt: str) -> list[str]:
    """Token ids -> caption strings, stripping the text prompt
    (reference: models/blip.py:163-167)."""
    out = []
    for row in sequences:
        text = tokenizer.decode(row, skip_special_tokens=True)
        out.append(text[len(prompt):])
    return out


def init_blip_base(key, vit_cfg: ViTConfig, med_cfg: MedConfig):
    """BLIP_Base feature extractor (reference: models/blip.py:22-73)."""
    k1, k2 = jax.random.split(key)
    return {
        "visual_encoder": init_vit(k1, vit_cfg),
        "text_encoder": M.init_med(k2, med_cfg),
    }


def blip_base_features(params, mode: str, vit_cfg: ViTConfig, med_cfg: MedConfig,
                       images=None, text_ids=None, text_mask=None,
                       enc_token_id: int | None = None, dtype=None):
    """Feature modes (reference: models/blip.py:45-73).

    mode='image': ViT embeddings; 'text': text-encoder hidden states;
    'multimodal': text over image cross-attention ([ENC] substituted at
    position 0 when enc_token_id is given, reference :66).
    """
    assert mode in ("image", "text", "multimodal")
    if mode == "image":
        return encode_images(params, images, vit_cfg, dtype=dtype)
    if mode == "text":
        return M.med_forward(params["text_encoder"], text_ids, text_mask,
                             cfg=med_cfg, mode="text", dtype=dtype)
    image_embeds = encode_images(params, images, vit_cfg, dtype=dtype)
    if enc_token_id is not None:
        text_ids = text_ids.at[:, 0].set(enc_token_id)
    return M.med_forward(params["text_encoder"], text_ids, text_mask,
                         encoder_hidden_states=image_embeds,
                         cfg=med_cfg, mode="multimodal", dtype=dtype)


# ---------------------------------------------------------------------------
# ITM / ITC (the CapFilt Filter; reference models/blip_itm.py:41-67)
# ---------------------------------------------------------------------------

def blip_itm_scores(params, image_embeds, text_ids, text_mask, med_cfg: MedConfig,
                    dtype=None, group_size: int = 1, self_fold: int = 1):
    """ITM head logits over [CLS] of the multimodal encoding.

    image_embeds: (N, Lk, D) paired 1:1 with text rows (N, L) — or, with
    group_size=G, (N, Lk, D) paired with (N*G, L) text rows where each
    group of G consecutive texts scores against one image memory without
    replicating it (grouped rerank; the k_test expansion stays virtual).
    self_fold folds that many consecutive texts into one block-diagonal
    self-attention sequence (exact; MXU-shaped score GEMMs — see
    med_forward). Returns (N[*G], 2) logits; softmax[:, 1] is the match
    probability.
    """
    hidden = M.med_forward(
        params["text_encoder"], text_ids, text_mask,
        encoder_hidden_states=image_embeds, cfg=med_cfg, mode="multimodal",
        dtype=dtype, group_size=group_size, self_fold=self_fold,
    )
    return linear(params["itm_head"], hidden[:, 0, :], dtype=dtype).astype(jnp.float32)


def blip_itc_features(params, image_embeds, text_ids, text_mask, med_cfg: MedConfig, dtype=None):
    """Projected, normalized [CLS] features for contrastive similarity."""
    image_feat = linear(params["vision_proj"], image_embeds[:, 0, :], dtype=dtype)
    image_feat = image_feat / jnp.linalg.norm(image_feat, axis=-1, keepdims=True)
    text_hidden = M.med_forward(
        params["text_encoder"], text_ids, text_mask, cfg=med_cfg, mode="text", dtype=dtype
    )
    text_feat = linear(params["text_proj"], text_hidden[:, 0, :], dtype=dtype)
    text_feat = text_feat / jnp.linalg.norm(text_feat, axis=-1, keepdims=True)
    return image_feat, text_feat
