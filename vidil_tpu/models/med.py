"""MED: BERT encoder/decoder with cross-attention ("Mixture of Encoder-Decoder").

Functional TPU-first re-design of the reference MED (reference:
models/med.py — a BERT-base with optional cross-attention to a vision
encoder and a causal-LM head; configs/med_config.json: 12L/768d, vocab
30524, post-LN, absolute positions, no token-type embeddings).

Modes (reference: models/med.py:670+, 358-370):
  * ``mode='text'``       — bidirectional self-attention only.
  * ``mode='multimodal'``  — bidirectional self-attn + cross-attn over
    encoder (image/video) states.
  * ``is_decoder=True``   — causal self-attn (+ cross-attn), used for LM
    training and generation.

TPU-first choices vs the reference:
  * layers stacked on a leading axis and run with ``lax.scan``;
  * generation uses a **preallocated fixed-shape KV cache** (no growing
    tuple-of-tensors as in HF; reference: models/med.py:164-175) so the
    decode step is a single compiled program;
  * cross-attention K/V are **projected once** per generation and reused
    every step — the reference re-projects the full N*P-token video
    memory every decoded token (models/med.py:160-163);
  * fp32 softmax/LN, bf16 matmuls when ``dtype=jnp.bfloat16``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig
from vidil_tpu.models.layers import (
    ACT2FN,
    dot_product_attention,
    embedding_lookup,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
    merge_heads,
    mlp_auto,
    split_heads,
)

NEG_INF = -10000.0  # additive-mask value, matching reference models/med.py:667


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_med_layer(key, cfg: MedConfig):
    ks = jax.random.split(key, 9)
    d = cfg.hidden_size
    layer = {
        "self_attn": {
            "query": init_linear(ks[0], d, d),
            "key": init_linear(ks[1], d, d),
            "value": init_linear(ks[2], d, d),
            "out": init_linear(ks[3], d, d),
            "norm": init_layer_norm(d),
        },
        "mlp": {
            "fc1": init_linear(ks[4], d, cfg.intermediate_size),
            "fc2": init_linear(ks[5], cfg.intermediate_size, d),
        },
        "mlp_norm": init_layer_norm(d),
    }
    if cfg.add_cross_attention:
        layer["cross_attn"] = {
            "query": init_linear(ks[6], d, d),
            "key": init_linear(ks[7], cfg.encoder_width, d),
            "value": init_linear(ks[8], cfg.encoder_width, d),
            "out": init_linear(jax.random.fold_in(ks[6], 1), d, d),
            "norm": init_layer_norm(d),
        }
    return layer


def init_med(key, cfg: MedConfig, with_lm_head: bool = False, with_pooler: bool = False):
    kw, kp, kl, kh = jax.random.split(key, 4)
    layer_keys = jax.random.split(kl, cfg.num_layers)
    layers = [init_med_layer(layer_keys[i], cfg) for i in range(cfg.num_layers)]
    params: dict[str, Any] = {
        "embeddings": {
            "word": init_embedding(kw, cfg.vocab_size, cfg.hidden_size),
            "position": init_embedding(kp, cfg.max_position_embeddings, cfg.hidden_size),
            "norm": init_layer_norm(cfg.hidden_size),
        },
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }
    if with_pooler:
        params["pooler"] = init_linear(jax.random.fold_in(kh, 2), cfg.hidden_size, cfg.hidden_size)
    if with_lm_head:
        # decoder weight is tied to the word embedding (HF tie_weights);
        # only the transform + output bias are separate parameters.
        params["cls"] = {
            "transform": {
                "dense": init_linear(kh, cfg.hidden_size, cfg.hidden_size),
                "norm": init_layer_norm(cfg.hidden_size),
            },
            "bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        }
    return params


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def extended_attention_mask(attention_mask, is_decoder: bool):
    """Build the additive self-attention bias (reference: models/med.py:609-668).

    attention_mask: (B, L) {0,1}. Returns (B, 1, Lq, L) additive bias.
    For decoders a causal mask is AND-ed in.
    """
    B, L = attention_mask.shape
    if is_decoder:
        seq_ids = jnp.arange(L)
        causal = (seq_ids[None, None, :] <= seq_ids[None, :, None]).astype(jnp.float32)
        causal = jnp.broadcast_to(causal, (B, L, L))
        mask = causal * attention_mask[:, None, :].astype(jnp.float32)
        mask = mask[:, None, :, :]
    else:
        mask = attention_mask[:, None, None, :].astype(jnp.float32)
    return (1.0 - mask) * NEG_INF


def invert_attention_mask(encoder_attention_mask):
    """(B, Lk) {0,1} -> (B, 1, 1, Lk) additive bias for cross-attention."""
    m = encoder_attention_mask[:, None, None, :].astype(jnp.float32)
    return (1.0 - m) * NEG_INF


# ---------------------------------------------------------------------------
# embeddings / head
# ---------------------------------------------------------------------------

def med_embeddings(params, input_ids, cfg: MedConfig, position_offset=0, dtype=None):
    """Word + absolute position embeddings, LayerNorm (reference: med.py:52-94)."""
    emb = embedding_lookup(params["embeddings"]["word"], input_ids)
    L = input_ids.shape[-1]
    positions = jnp.arange(L) + position_offset
    emb = emb + embedding_lookup(params["embeddings"]["position"], positions)
    if "type_bias" in params["embeddings"]:
        # constant token-type-0 term from HF-style checkpoints (tests only;
        # BLIP/MED checkpoints have no token-type embeddings)
        emb = emb + params["embeddings"]["type_bias"]
    emb = layer_norm(params["embeddings"]["norm"], emb, cfg.layer_norm_eps)
    if dtype is not None:
        emb = emb.astype(dtype)
    return emb


def med_lm_logits(params, hidden, cfg: MedConfig, dtype=None):
    """LM head: transform -> tied-embedding decoder + bias (reference: med.py:518-535)."""
    h = linear(params["cls"]["transform"]["dense"], hidden, dtype=dtype)
    h = ACT2FN[cfg.hidden_act](h)
    h = layer_norm(params["cls"]["transform"]["norm"], h, cfg.layer_norm_eps)
    decoder_kernel = params["embeddings"]["word"]["embedding"].T
    if dtype is not None:
        decoder_kernel = decoder_kernel.astype(dtype)
        h = h.astype(dtype)
    logits = jnp.dot(h, decoder_kernel) + params["cls"]["bias"].astype(h.dtype)
    return logits


def med_pooler(params, hidden, dtype=None):
    """Tanh pooler over the first token (reference: med.py:486-498)."""
    return jnp.tanh(linear(params["pooler"], hidden[:, 0], dtype=dtype))


# ---------------------------------------------------------------------------
# attention sub-blocks (post-LN, BERT style)
# ---------------------------------------------------------------------------

def _grouped_attention(q, k, v, bias, group_size: int):
    """Attention where ``group_size`` query rows share one K/V batch row.

    q: (B*G, H, L, Dh), k/v: (B, H, Lk, Dh). Queries fold into a broadcast
    dim of the batched einsums (contiguous reshape, no transpose), so the
    large K/V memory is never replicated per query row — the full-sequence
    analogue of the grouped-KV beam decode.

    With no bias, the fold is plain attention with a (G*L)-long query
    axis, so it routes through attention_auto — the Pallas flash kernel
    picks it up when the fp32 logits would spill VMEM (the k_test=128
    rerank shapes), avoiding the HBM round-trip of the score tensor."""
    Bn, H, L, Dh = q.shape
    B = Bn // group_size
    if bias is None:
        from vidil_tpu.ops.flash_attention import attention_auto

        qf = (q.reshape(B, group_size, H, L, Dh)
              .transpose(0, 2, 1, 3, 4).reshape(B, H, group_size * L, Dh))
        ctx = attention_auto(qf, k, v)
        return (ctx.reshape(B, H, group_size, L, Dh)
                .transpose(0, 2, 1, 3, 4).reshape(Bn, H, L, Dh))
    q5 = q.reshape(B, group_size, H, L, Dh)
    scale = 1.0 / math.sqrt(Dh)
    logits = jnp.einsum("bnhqd,bhkd->bnhqk", q5, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[:, None].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bnhqk,bhkd->bnhqd", probs.astype(v.dtype), v)
    return ctx.reshape(Bn, H, L, Dh)


def _attn_block(p, x, kv_states, bias, num_heads: int, eps: float, dtype=None,
                group_size: int = 1):
    """Project q from x, k/v from kv_states; attend; residual + LN.

    group_size > 1 (cross-attention only): x has batch B*group_size while
    kv_states has batch B — each group of ``group_size`` query rows attends
    the SAME memory without replicating it (see _grouped_attention)."""
    q = split_heads(linear(p["query"], x, dtype=dtype), num_heads)
    k = split_heads(linear(p["key"], kv_states, dtype=dtype), num_heads)
    v = split_heads(linear(p["value"], kv_states, dtype=dtype), num_heads)
    if group_size > 1:
        ctx = merge_heads(_grouped_attention(q, k, v, bias, group_size))
    else:
        ctx = merge_heads(dot_product_attention(q, k, v, bias=bias))
    out = linear(p["out"], ctx, dtype=dtype)
    return layer_norm(p["norm"], out + x, eps)


def _attn_block_precomputed_kv(p, x, k, v, bias, num_heads: int, eps: float,
                               dtype=None, beam_size: int = 1,
                               int8_dot: bool = False):
    """Cross-attention with precomputed K/V.

    beam_size > 1: x has batch B*beam_size but k/v have batch B — all beams
    of one item attend the SAME memory, so queries are folded into the
    sequence axis instead of replicating the (large) K/V tensors per beam.
    Cuts cross-attention HBM traffic by beam_size (the dominant decode cost
    for the N*(P+1)-token video memory).

    k/v may be per-row int8 dicts from ``quantize_cross_kv`` — the decode
    loop is HBM-bound on re-reading this memory every step, so halving its
    bytes halves the dominant read. Per-row symmetric scales factor out of
    BOTH matmuls exactly: logits_k = (q · K8_k) * s_k and
    ctx = Σ_k (p_k s_k) · V8_k, so the only approximation is the int8
    rounding of the K/V entries themselves.
    """
    q = split_heads(linear(p["query"], x, dtype=dtype), num_heads)  # (B*nb, H, L, Dh)
    k_quant = isinstance(k, dict)
    if beam_size > 1:
        Bn, H, L, Dh = q.shape
        B = Bn // beam_size
        # contiguous reshape only (no transposes): beams become a broadcast
        # dim of the batched attention einsums
        q5 = q.reshape(B, beam_size, H, L, Dh)
        scale = 1.0 / math.sqrt(Dh)
        if k_quant and int8_dot:
            # native int8 x int8 MXU dots: quantize q (and scale-folded
            # probs below) per row so BOTH operands are int8 and the K/V
            # HBM reads stay 1 byte/entry — the astype-to-bf16 variant
            # measured SLOWER because XLA materializes the converted copy
            # (benchmarks/decode_int8_ab.jsonl)
            qs = jnp.maximum(jnp.max(jnp.abs(q5), axis=-1, keepdims=True)
                             .astype(jnp.float32), 1e-12) / 127.0
            q8 = jnp.clip(jnp.round(q5.astype(jnp.float32) / qs),
                          -127, 127).astype(jnp.int8)
            logits = jnp.einsum("bnhqd,bhkd->bnhqk", q8, k["q8"],
                                preferred_element_type=jnp.int32)
            logits = logits.astype(jnp.float32) * (qs * scale) \
                * k["scale"][:, None, :, None, :, 0]
        else:
            k_mat = k["q8"].astype(q.dtype) if k_quant else k
            logits = jnp.einsum("bnhqd,bhkd->bnhqk", q5, k_mat,
                                preferred_element_type=jnp.float32) * scale
            if k_quant:
                # s_k broadcast over (beams, heads-q rows): (B, H, Lk) -> k
                logits = logits * k["scale"][:, None, :, None, :, 0]
        if bias is not None:
            logits = logits + bias[:, None].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        if k_quant and int8_dot:
            # fold the per-row V scales into probs BEFORE quantizing so the
            # int8 dot's row sums carry them exactly: ctx = (p8 . V8) * sp
            pv = probs * v["scale"][:, None, :, None, :, 0]
            ps = jnp.maximum(jnp.max(pv, axis=-1, keepdims=True), 1e-20) / 127.0
            p8 = jnp.clip(jnp.round(pv / ps), -127, 127).astype(jnp.int8)
            ctx = jnp.einsum("bnhqk,bhkd->bnhqd", p8, v["q8"],
                             preferred_element_type=jnp.int32)
            ctx = (ctx.astype(jnp.float32) * ps).astype(q.dtype)
        elif k_quant:
            v_mat = v["q8"].astype(q.dtype)
            probs = probs * v["scale"][:, None, :, None, :, 0]
            ctx = jnp.einsum("bnhqk,bhkd->bnhqd", probs.astype(v_mat.dtype), v_mat)
        else:
            ctx = jnp.einsum("bnhqk,bhkd->bnhqd", probs.astype(v.dtype), v)
        ctx = merge_heads(ctx.reshape(Bn, H, L, Dh))
    else:
        if k_quant:
            # dequant in fp32 then cast once, so the fp32 scales are not
            # themselves rounded to bf16 (keeps this branch's numerics
            # consistent with the grouped branch, which applies scales to
            # fp32 logits exactly); int8_dot has no beam-size-1 kernel —
            # it degrades to this dequant path (see blip_generate_ids)
            k = (k["q8"].astype(jnp.float32) * k["scale"]).astype(q.dtype)
            v = (v["q8"].astype(jnp.float32) * v["scale"]).astype(q.dtype)
        ctx = merge_heads(dot_product_attention(q, k, v, bias=bias))
    out = linear(p["out"], ctx, dtype=dtype)
    return layer_norm(p["norm"], out + x, eps)


def _ffn_block(layer, x, cfg: MedConfig, dtype=None):
    # mlp_auto dispatches exact-GELU MLPs with >=2048 flattened rows to the
    # fused Pallas kernel on TPU (ITM text towers: 1.48x measured); decode
    # steps (B*beams rows) and non-gelu acts stay on the XLA chain.
    h = mlp_auto(layer["mlp"], x, act=ACT2FN[cfg.hidden_act], dtype=dtype,
                 use_fused=cfg.use_fused_mlp)
    return layer_norm(layer["mlp_norm"], h + x, cfg.layer_norm_eps)


def med_layer_forward(
    layer, x, self_bias, cfg: MedConfig,
    encoder_hidden_states=None, cross_bias=None, dtype=None, group_size: int = 1,
):
    """One MED layer: self-attn [-> cross-attn] -> FFN (reference: med.py:320-383)."""
    x = _attn_block(layer["self_attn"], x, x, self_bias, cfg.num_heads, cfg.layer_norm_eps, dtype)
    if encoder_hidden_states is not None:
        x = _attn_block(
            layer["cross_attn"], x, encoder_hidden_states, cross_bias,
            cfg.num_heads, cfg.layer_norm_eps, dtype, group_size=group_size,
        )
    return _ffn_block(layer, x, cfg, dtype)


# ---------------------------------------------------------------------------
# full-sequence forward (encoder modes + decoder training)
# ---------------------------------------------------------------------------

def med_forward(
    params,
    input_ids,
    attention_mask=None,
    encoder_hidden_states=None,
    encoder_attention_mask=None,
    *,
    cfg: MedConfig,
    mode: str = "multimodal",
    is_decoder: bool = False,
    inputs_embeds=None,
    dtype=None,
    group_size: int = 1,
    self_fold: int = 1,
):
    """BertModel.forward equivalent (reference: models/med.py:670-807).

    group_size > 1: input_ids has batch B*group_size while
    encoder_hidden_states has batch B — groups of query rows share one
    cross-attention memory without replicating it (grouped ITM scoring).

    self_fold=F > 1 (encoder modes only): fold F consecutive text rows
    into one sequence of F*L tokens with a block-diagonal self-attention
    bias. Numerically EXACT (out-of-block scores carry the NEG_INF
    additive mask, whose softmax weight underflows to exactly 0.0 in
    fp32, so per-block probs, denominators and contexts are bitwise those
    of the unfolded run) while turning the per-text (L x L x Dh)
    self-attention einsums — L=16-35 rows, far below the 128-lane MXU
    tile — into (F*L x F*L x Dh) MXU-shaped batches. Everything else in
    the tower is token-rowwise (LN, projections, MLP) and the grouped
    cross-attention already folds its group into the query axis, so only
    the self-attention bias changes. F is clamped to gcd(F, group_size)
    (each fold must stay inside one cross-attention group) and to a
    divisor of B.

    Returns the last hidden state (B, L, D).
    """
    if inputs_embeds is None:
        x = med_embeddings(params, input_ids, cfg, dtype=dtype)
        B, L = input_ids.shape
    else:
        x = inputs_embeds if dtype is None else inputs_embeds.astype(dtype)
        B, L = inputs_embeds.shape[:2]

    if attention_mask is None:
        attention_mask = jnp.ones((B, L), jnp.int32)

    fold = 1
    has_cross = mode == "multimodal" and encoder_hidden_states is not None
    if self_fold > 1 and not is_decoder:
        import math as _math

        if has_cross:
            # each fold must sit inside ONE cross-attention group (the
            # grouped fold re-derives the same query axis); ungrouped
            # cross (group_size=1, 1:1 text<->memory rows) cannot fold
            fold = _math.gcd(self_fold, group_size)
        else:
            fold = self_fold
        while fold > 1 and B % fold:
            fold -= 1
    if fold > 1:
        Bf, Lf = B // fold, fold * L
        x = x.reshape(Bf, Lf, x.shape[-1])
        att_f = attention_mask.reshape(Bf, Lf)
        key_bias = (1.0 - att_f[:, None, None, :].astype(jnp.float32)) * NEG_INF
        blk = jnp.arange(Lf) // L
        diag = jnp.where(blk[:, None] == blk[None, :], 0.0, NEG_INF)
        self_bias = key_bias + diag[None, None]
        group_size = group_size // fold if group_size > 1 else 1
    else:
        self_bias = extended_attention_mask(attention_mask, is_decoder)

    use_cross = mode == "multimodal" and encoder_hidden_states is not None
    if use_cross:
        # no mask given = attend the whole memory: keep the bias literally
        # None (an all-zeros bias is semantically identical but blocks the
        # flash-attention dispatch on the grouped ITM path)
        cross_bias = (None if encoder_attention_mask is None
                      else invert_attention_mask(encoder_attention_mask))
        enc = encoder_hidden_states if dtype is None else encoder_hidden_states.astype(dtype)
    else:
        cross_bias = None
        enc = None

    def body(carry, layer):
        def run(layer, carry):
            return med_layer_forward(
                layer, carry, self_bias, cfg,
                encoder_hidden_states=enc, cross_bias=cross_bias, dtype=dtype,
                group_size=group_size,
            )
        if cfg.remat:
            # recompute the layer in the backward instead of saving its
            # activations — the all-layer (L, B, Lq, D) stacks the scan
            # otherwise saves are what blow HBM at large train batches
            from .layers import remat_policy

            run = jax.checkpoint(run, policy=remat_policy(cfg.remat_policy))
        out = run(layer, carry)
        return out, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    if fold > 1:
        x = x.reshape(B, L, x.shape[-1])
    return x


def med_lm_loss(logits, labels, label_smoothing: float = 0.1, reduction: str = "mean"):
    """Shifted next-token CE with label smoothing (reference: med.py:909-917).

    labels: int array with -100 = ignore. Matches torch CrossEntropyLoss
    (label_smoothing=eps): loss = (1-eps)*nll + eps*mean_j(-log p_j).
    """
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    per_tok = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    per_tok = jnp.where(valid, per_tok, 0.0)
    if reduction == "mean":
        return per_tok.sum() / jnp.maximum(valid.sum(), 1)
    if reduction == "none":
        return per_tok.sum(axis=-1)  # per-sample sum (reference: med.py:916-917)
    raise ValueError(reduction)


# ---------------------------------------------------------------------------
# generation: fixed-shape KV cache
# ---------------------------------------------------------------------------

def precompute_cross_kv(params, encoder_hidden_states, cfg: MedConfig, dtype=None):
    """Project cross-attention K/V for all layers once per generation.

    Returns (k, v) each (num_layers, B, H, Lk, Dh). The reference
    re-projects these every decode step (models/med.py:160-163); on TPU we
    hoist the projection out of the decode loop entirely.
    """
    enc = encoder_hidden_states if dtype is None else encoder_hidden_states.astype(dtype)

    def per_layer(layer):
        k = split_heads(linear(layer["cross_attn"]["key"], enc, dtype=dtype), cfg.num_heads)
        v = split_heads(linear(layer["cross_attn"]["value"], enc, dtype=dtype), cfg.num_heads)
        return k, v

    ks, vs = jax.vmap(per_layer)(params["layers"])
    return ks, vs


def quantize_cross_kv(k, v):
    """Per-row symmetric int8 quantization of precomputed cross-K/V.

    Each (..., Dh) row gets one absmax/127 float32 scale, so the quantized
    pair {q8, scale} is an exact drop-in for the bf16 tensors in
    ``_attn_block_precomputed_kv`` (scales factor out of both attention
    matmuls). Rationale: the beam decode re-reads the full cross-K/V every
    step (2 x layers x B x Lk x D bytes — the measured HBM floor of the
    decode program); int8 halves that traffic at ~0.4% per-row relative
    rounding error. Opt-in via cross_kv_int8 (parity-affecting: logits
    perturbations can flip beam ties; agreement measured in
    tools/ab_decode_int8.py and tests).
    """

    def q(x):
        s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
        s = jnp.maximum(s, 1e-12)
        q8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return {"q8": q8, "scale": s}

    return q(k), q(v)


def init_self_cache(cfg: MedConfig, batch: int, max_len: int, dtype=jnp.float32,
                    *, unrolled: bool = False, lazy_reorder: bool = False):
    """Fixed-shape self-attention KV cache, heads folded into the feature
    axis: (layers, batch, max_len, H*Dh).

    The folded layout makes the per-step single-token write ONE
    row-contiguous (1, D)-slab per (layer, row) instead of H strided
    128-byte chunks, and the per-step beam-reorder gather moves the same
    bytes in 12x larger pieces — measured 1.8x faster reorder+update at
    the CapFilt decode shapes (384 rows x 12 layers x 20 slots) than the
    (layers, B, H, L, Dh) layout. Heads are re-split view-only at
    attention time.

    unrolled=True stores per-layer arrays (tuples of num_layers
    (batch, max_len, H*Dh) arrays) instead of one stacked (layers, ...)
    array, and med_decode_step runs a python-unrolled layer loop over
    them: a lax.scan over layers re-stacks the WHOLE cache through its ys
    every step — a pure functional-copy cost measured at 2.9 ms/step
    (452 MB) at the CapFilt shapes (benchmarks/capfilt_profile.jsonl
    stepx rows). Measured A/B (benchmarks/decode_struct_ab.jsonl):
    1.08x generate / 1.03x full-chunk — but on TPU bf16 the unrolled
    bodies fuse/round differently than the scanned body and beam search
    amplifies the ulp flips (73% token agreement vs stock; CPU f32 is
    bit-identical), so it stays opt-in.

    lazy_reorder=True adds an int32 'anc' ancestry matrix (batch,
    max_len): beam reorders then gather ONLY this matrix instead of
    physically permuting the K/V cache (2.3-2.8 ms/step at the CapFilt
    shapes), and the decode step reads the cache through it
    (take_along_axis). anc[r, t] = the flat row whose slot-t entry is in
    row r's beam history, so the gathered values are exactly the
    physically-reordered ones — token outputs are bit-identical (tested).
    """
    shape = (batch, max_len, cfg.hidden_size)
    if unrolled:
        cache = {
            "k": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
            "v": tuple(jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)),
        }
    else:
        full = (cfg.num_layers,) + shape
        cache = {"k": jnp.zeros(full, dtype), "v": jnp.zeros(full, dtype)}
    if lazy_reorder:
        cache["anc"] = jnp.broadcast_to(
            jnp.arange(batch, dtype=jnp.int32)[:, None], (batch, max_len))
    return cache


def _fold_heads(x):
    """(B, H, L, Dh) -> (B, L, H*Dh) (cache storage layout)."""
    B, H, L, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * Dh)


def med_decode_prefill(
    params, input_ids, cache, cross_k, cross_v, cross_bias, cfg: MedConfig, dtype=None,
    beam_size: int = 1, int8_dot: bool = False,
):
    """Run the prompt through the decoder, filling cache[:, :, :Lp, :].

    Returns (hidden (B, Lp, D), cache). Assumes the prompt is unpadded and
    identical length across the batch (true for BLIP's fixed prompts).
    """
    B, Lp = input_ids.shape
    x = med_embeddings(params, input_ids, cfg, dtype=dtype)
    seq = jnp.arange(Lp)
    causal_bias = jnp.where(seq[None, :] <= seq[:, None], 0.0, NEG_INF)[None, None]

    def body(carry, scanned):
        layer, ck, cv = scanned
        x = carry
        q = split_heads(linear(layer["self_attn"]["query"], x, dtype=dtype), cfg.num_heads)
        k = split_heads(linear(layer["self_attn"]["key"], x, dtype=dtype), cfg.num_heads)
        v = split_heads(linear(layer["self_attn"]["value"], x, dtype=dtype), cfg.num_heads)
        ctx = merge_heads(dot_product_attention(q, k, v, bias=causal_bias))
        h = linear(layer["self_attn"]["out"], ctx, dtype=dtype)
        x = layer_norm(layer["self_attn"]["norm"], h + x, cfg.layer_norm_eps)
        if cross_k is not None:
            x = _attn_block_precomputed_kv(
                layer["cross_attn"], x, ck, cv, cross_bias, cfg.num_heads,
                cfg.layer_norm_eps, dtype, beam_size=beam_size, int8_dot=int8_dot,
            )
        x = _ffn_block(layer, x, cfg, dtype=dtype)
        return x, (k, v)

    scanned = (params["layers"], cross_k, cross_v)
    x, (ks, vs) = jax.lax.scan(body, x, scanned)
    # fold heads into the cache storage layout (layers, B, Lp, H*Dh)
    ks = jax.vmap(_fold_heads)(ks)
    vs = jax.vmap(_fold_heads)(vs)
    if isinstance(cache["k"], tuple):  # unrolled per-layer layout
        kd = cache["k"][0].dtype
        new = dict(
            cache,
            k=tuple(jax.lax.dynamic_update_slice(c, ks[i].astype(kd), (0, 0, 0))
                    for i, c in enumerate(cache["k"])),
            v=tuple(jax.lax.dynamic_update_slice(c, vs[i].astype(kd), (0, 0, 0))
                    for i, c in enumerate(cache["v"])),
        )
        return x, new
    cache = dict(
        cache,
        k=jax.lax.dynamic_update_slice(cache["k"], ks.astype(cache["k"].dtype), (0, 0, 0, 0)),
        v=jax.lax.dynamic_update_slice(cache["v"], vs.astype(cache["v"].dtype), (0, 0, 0, 0)),
    )
    return x, cache


def med_decode_step(
    params, token_ids, step_index, cache, cross_k, cross_v, cross_bias, cfg: MedConfig, dtype=None,
    beam_size: int = 1, int8_dot: bool = False,
):
    """Decode one token for the whole batch.

    Args:
      token_ids: (B,) current input token ids.
      step_index: scalar int — absolute position of this token; cache slots
        [0, step_index) are valid.
    Returns (logits (B, V), new_cache).
    """
    B = token_ids.shape[0]
    unrolled = isinstance(cache["k"], tuple)
    max_len = (cache["k"][0] if unrolled else cache["k"]).shape[-2]
    H = cfg.num_heads
    Dh = cfg.hidden_size // H
    x = med_embeddings(params, token_ids[:, None], cfg, position_offset=step_index, dtype=dtype)

    # attend over cache slots <= step_index
    pos = jnp.arange(max_len)
    step_bias = jnp.where(pos <= step_index, 0.0, NEG_INF)[None, None, None, :]
    scale = 1.0 / math.sqrt(Dh)

    # lazy beam reorder: rows never move; this step's own K/V belongs to
    # this row, so stamp anc[:, step] = arange before the gathers below
    anc = cache.get("anc")
    if anc is not None:
        anc = jax.lax.dynamic_update_slice(
            anc, jnp.arange(B, dtype=jnp.int32)[:, None], (0, step_index))

    def layer_step(layer, k_cache, v_cache, ck, cv, x):
        q = split_heads(linear(layer["self_attn"]["query"], x, dtype=dtype), cfg.num_heads)
        # single-token K/V: (B, 1, H*Dh) row-contiguous with the folded
        # cache layout — one slab write per row instead of H strided ones
        k_new = linear(layer["self_attn"]["key"], x, dtype=dtype)
        v_new = linear(layer["self_attn"]["value"], x, dtype=dtype)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_new.astype(k_cache.dtype), (0, step_index, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_new.astype(v_cache.dtype), (0, step_index, 0)
        )
        if anc is not None:
            # read through the ancestry permutation — same values a
            # physical reorder would have produced, bit-identical outputs
            k_read = jnp.take_along_axis(k_cache, anc[:, :, None], axis=0)
            v_read = jnp.take_along_axis(v_cache, anc[:, :, None], axis=0)
        else:
            k_read, v_read = k_cache, v_cache
        # attention reads re-split heads view-only: (B, L, H, Dh)
        k4 = k_read.reshape(B, max_len, H, Dh).astype(q.dtype)
        v4 = v_read.reshape(B, max_len, H, Dh).astype(q.dtype)
        logits = jnp.einsum("bhqd,bkhd->bhqk", q, k4,
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits + step_bias, axis=-1)
        ctx = merge_heads(jnp.einsum("bhqk,bkhd->bhqd", probs.astype(v4.dtype), v4))
        h = linear(layer["self_attn"]["out"], ctx, dtype=dtype)
        x = layer_norm(layer["self_attn"]["norm"], h + x, cfg.layer_norm_eps)
        if ck is not None:
            x = _attn_block_precomputed_kv(
                layer["cross_attn"], x, ck, cv, cross_bias, cfg.num_heads,
                cfg.layer_norm_eps, dtype, beam_size=beam_size, int8_dot=int8_dot,
            )
        x = _ffn_block(layer, x, cfg, dtype=dtype)
        return x, k_cache, v_cache

    if unrolled:
        # python-unrolled layer loop over per-layer cache arrays: avoids
        # re-stacking the whole cache through a scan's ys every step
        # (2.9 ms/step of pure copy at the CapFilt decode shapes —
        # benchmarks/capfilt_profile.jsonl stepx rows)
        new_k, new_v = [], []
        for i in range(cfg.num_layers):
            layer = jax.tree.map(lambda p: p[i], params["layers"])
            # tree.map handles both plain arrays and int8 {q8, scale} dicts
            ck = None if cross_k is None else jax.tree.map(lambda t: t[i], cross_k)
            cv = None if cross_v is None else jax.tree.map(lambda t: t[i], cross_v)
            x, kc, vc = layer_step(layer, cache["k"][i], cache["v"][i], ck, cv, x)
            new_k.append(kc)
            new_v.append(vc)
        new_cache = dict(cache, k=tuple(new_k), v=tuple(new_v))
    else:
        def body(carry, scanned):
            layer, k_cache, v_cache, ck, cv = scanned
            x = carry
            x, k_cache, v_cache = layer_step(layer, k_cache, v_cache, ck, cv, x)
            return x, (k_cache, v_cache)

        scanned = (params["layers"], cache["k"], cache["v"], cross_k, cross_v)
        x, (new_k, new_v) = jax.lax.scan(body, x, scanned)
        new_cache = dict(cache, k=new_k, v=new_v)
    if anc is not None:
        new_cache["anc"] = anc
    logits = med_lm_logits(params, x[:, 0, :], cfg, dtype=dtype)
    return logits.astype(jnp.float32), new_cache
