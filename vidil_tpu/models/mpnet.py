"""MPNet sentence encoder (SBERT 'all-mpnet-base-v2') on TPU.

The reference runs SentenceTransformer('all-mpnet-base-v2') on GPU for
in-context example selection and QA/VLEP answer mapping (reference:
generate_prompts_random_prefix_in_context_selection.py:175-179,
eval_video_qa_result.py:165-170, eval_vlep.py). This module implements
the MPNet architecture (post-LN transformer with shared bucketed
relative-position attention bias, HF MPNetModel semantics) plus SBERT
mean pooling + L2 normalization, with a converter from the
sentence-transformers torch state dict — so selection/eval embeddings run
as one jitted TPU program.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vidil_tpu.models.layers import (
    embedding_lookup,
    gelu,
    layer_norm,
    linear,
    merge_heads,
    split_heads,
)


class MPNetConfig:
    def __init__(self, vocab_size=30527, hidden_size=768, num_layers=12, num_heads=12,
                 intermediate_size=3072, max_position_embeddings=514,
                 relative_attention_num_buckets=32, layer_norm_eps=1e-12,
                 pad_token_id=1):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.intermediate_size = intermediate_size
        self.max_position_embeddings = max_position_embeddings
        self.relative_attention_num_buckets = relative_attention_num_buckets
        self.layer_norm_eps = layer_norm_eps
        self.pad_token_id = pad_token_id


def relative_position_bucket(relative_position, num_buckets: int = 32,
                             max_distance: int = 128):
    """HF MPNet bucketing (T5-style, bidirectional)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    num_buckets //= 2
    ret = ret + (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def compute_position_bias(rel_bias_embedding, seq_len: int, num_buckets: int = 32):
    """(H, L, L) additive attention bias from the shared bucket embedding."""
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    buckets = relative_position_bucket(mem - ctx, num_buckets=num_buckets)
    values = rel_bias_embedding[buckets]  # (L, L, H)
    return values.transpose(2, 0, 1)[None]  # (1, H, L, L)


def mpnet_forward(params, input_ids, attention_mask, cfg: MPNetConfig, dtype=None):
    """MPNetModel.forward -> last hidden state (B, L, D)."""
    # RoBERTa-style position ids: pad stays at pad_idx, others count from pad_idx+1
    mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    position_ids = jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id

    x = embedding_lookup(params["word_embeddings"], input_ids)
    x = x + embedding_lookup(params["position_embeddings"], position_ids)
    x = layer_norm(params["emb_norm"], x, cfg.layer_norm_eps)
    if dtype is not None:
        x = x.astype(dtype)

    L = input_ids.shape[1]
    pos_bias = compute_position_bias(params["relative_attention_bias"], L,
                                     cfg.relative_attention_num_buckets)
    attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0
    bias = pos_bias + attn_bias
    scale = 1.0 / math.sqrt(cfg.hidden_size // cfg.num_heads)

    def body(x, layer):
        q = split_heads(linear(layer["q"], x, dtype=dtype), cfg.num_heads)
        k = split_heads(linear(layer["k"], x, dtype=dtype), cfg.num_heads)
        v = split_heads(linear(layer["v"], x, dtype=dtype), cfg.num_heads)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale + bias
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v))
        h = linear(layer["o"], ctx, dtype=dtype)
        x = layer_norm(layer["attn_norm"], h + x, cfg.layer_norm_eps)
        h = linear(layer["fc1"], x, dtype=dtype)
        h = gelu(h)
        h = linear(layer["fc2"], h, dtype=dtype)
        return layer_norm(layer["out_norm"], h + x, cfg.layer_norm_eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def sbert_embed(params, input_ids, attention_mask, cfg: MPNetConfig, dtype=None):
    """Sentence embedding: mean pooling over the mask + L2 normalize
    (the all-mpnet-base-v2 pooling recipe)."""
    hidden = mpnet_forward(params, input_ids, attention_mask, cfg, dtype=dtype).astype(jnp.float32)
    m = attention_mask[:, :, None].astype(jnp.float32)
    pooled = (hidden * m).sum(axis=1) / jnp.clip(m.sum(axis=1), 1e-9)
    return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)


def convert_mpnet(sd: dict, cfg: MPNetConfig, prefix: str = "") -> dict:
    """HF MPNetModel (or sentence-transformers '0_MPNet') state dict -> pytree."""

    def np_(x):
        return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)

    def lin(p):
        return {"kernel": jnp.asarray(np_(sd[p + ".weight"]).T), "bias": jnp.asarray(np_(sd[p + ".bias"]))}

    def ln(p):
        return {"scale": jnp.asarray(np_(sd[p + ".weight"])), "bias": jnp.asarray(np_(sd[p + ".bias"]))}

    layers = []
    for i in range(cfg.num_layers):
        b = f"{prefix}encoder.layer.{i}."
        layers.append({
            "q": lin(b + "attention.attn.q"), "k": lin(b + "attention.attn.k"),
            "v": lin(b + "attention.attn.v"), "o": lin(b + "attention.attn.o"),
            "attn_norm": ln(b + "attention.LayerNorm"),
            "fc1": lin(b + "intermediate.dense"), "fc2": lin(b + "output.dense"),
            "out_norm": ln(b + "output.LayerNorm"),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "word_embeddings": {"embedding": jnp.asarray(np_(sd[prefix + "embeddings.word_embeddings.weight"]))},
        "position_embeddings": {"embedding": jnp.asarray(np_(sd[prefix + "embeddings.position_embeddings.weight"]))},
        "emb_norm": ln(prefix + "embeddings.LayerNorm"),
        "relative_attention_bias": jnp.asarray(np_(sd[prefix + "encoder.relative_attention_bias.weight"])),
        "layers": stacked,
    }


def make_tpu_sbert_encoder(params, cfg: MPNetConfig, tokenizer, max_length: int = 128,
                           batch_size: int = 64, dtype=jnp.bfloat16):
    """list[str] -> (n, D) numpy — drop-in for the evals' `encoder` hooks."""

    @jax.jit
    def _embed(params, ids, mask):
        return sbert_embed(params, ids, mask, cfg, dtype=dtype)

    def encode(texts):
        out = []
        for i in range(0, len(texts), batch_size):
            enc = tokenizer(texts[i : i + batch_size], padding="max_length",
                            truncation=True, max_length=max_length)
            out.append(np.asarray(_embed(params, jnp.asarray(enc.input_ids),
                                         jnp.asarray(enc.attention_mask))))
        return np.concatenate(out)

    return encode
