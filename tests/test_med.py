"""MED parity vs HF BertModel/BertLMHeadModel built offline from config.

HF's BERT (which med.py derives from) is the numerical oracle: same
post-LN blocks, cross-attention wiring, causal masking, and LM-head
transform. The converter folds HF's token-type row-0 embedding into the
word embedding (MED has no token types — reference models/med.py:52-66).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.convert import convert_med

CFG = MedConfig(
    vocab_size=99,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    encoder_width=32,
)


def hf_config(is_decoder=False, add_cross=True):
    from transformers import BertConfig

    return BertConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        is_decoder=is_decoder,
        add_cross_attention=add_cross,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )


@pytest.fixture(scope="module")
def hf_encoder():
    from transformers import BertModel

    torch.manual_seed(0)
    # modern HF requires is_decoder=True to *construct* cross-attn layers;
    # flip it back afterwards so forward() uses a bidirectional mask (MED's
    # multimodal-encoder mode).
    m = BertModel(hf_config(is_decoder=True, add_cross=True), add_pooling_layer=False)
    m.config.is_decoder = False
    m.eval()
    return m


@pytest.fixture(scope="module")
def hf_decoder():
    from transformers import BertLMHeadModel

    torch.manual_seed(1)
    m = BertLMHeadModel(hf_config(is_decoder=True, add_cross=True))
    m.eval()
    return m


def to_jax_params(hf_model, prefix="", lm_head_prefix=None):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return convert_med(sd, CFG, prefix=prefix, lm_head_prefix=lm_head_prefix)


def rand_batch(B=2, L=7, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, CFG.vocab_size, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.int32)
    mask[1, L - 2 :] = 0  # padding on second sample
    return ids, mask


def test_text_mode_parity(hf_encoder):
    params = to_jax_params(hf_encoder)
    ids, mask = rand_batch()
    with torch.no_grad():
        ref = hf_encoder(
            torch.tensor(ids, dtype=torch.long), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        M.med_forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg=CFG, mode="text")
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_multimodal_mode_parity(hf_encoder):
    params = to_jax_params(hf_encoder)
    ids, mask = rand_batch()
    enc = np.random.RandomState(3).randn(2, 5, CFG.encoder_width).astype(np.float32)
    with torch.no_grad():
        ref = hf_encoder(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
        ).last_hidden_state.numpy()
    got = np.asarray(
        M.med_forward(
            params, jnp.asarray(ids), jnp.asarray(mask),
            encoder_hidden_states=jnp.asarray(enc), cfg=CFG, mode="multimodal",
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_decoder_logits_parity(hf_decoder):
    params = to_jax_params(hf_decoder, prefix="bert.", lm_head_prefix="")
    ids, mask = rand_batch(seed=5)
    enc = np.random.RandomState(6).randn(2, 5, CFG.encoder_width).astype(np.float32)
    with torch.no_grad():
        ref = hf_decoder(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
        ).logits.numpy()
    hidden = M.med_forward(
        params, jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=jnp.asarray(enc), cfg=CFG, mode="multimodal", is_decoder=True,
    )
    got = np.asarray(M.med_lm_logits(params, hidden, CFG))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_lm_loss_matches_torch(hf_decoder):
    params = to_jax_params(hf_decoder, prefix="bert.", lm_head_prefix="")
    ids, mask = rand_batch(seed=7)
    enc = np.random.RandomState(8).randn(2, 5, CFG.encoder_width).astype(np.float32)
    labels = ids.copy().astype(np.int64)
    labels[mask == 0] = -100
    labels[:, :2] = -100  # prompt masking as in BLIP_Decoder.forward

    hidden = M.med_forward(
        params, jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=jnp.asarray(enc), cfg=CFG, mode="multimodal", is_decoder=True,
    )
    logits = M.med_lm_logits(params, hidden, CFG)
    got = float(M.med_lm_loss(logits, jnp.asarray(labels), label_smoothing=0.1))

    with torch.no_grad():
        t_logits = hf_decoder(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
        ).logits
        shifted = t_logits[:, :-1, :].contiguous()
        t_labels = torch.tensor(labels)[:, 1:].contiguous()
        loss_fct = torch.nn.CrossEntropyLoss(label_smoothing=0.1)
        ref = float(loss_fct(shifted.view(-1, CFG.vocab_size), t_labels.view(-1)))
    assert abs(got - ref) < 1e-4

    # 'none' reduction = per-sample sum (reference med.py:916-917)
    per_sample = M.med_lm_loss(logits, jnp.asarray(labels), reduction="none")
    assert per_sample.shape == (2,)


def test_kv_cache_decode_matches_full_forward(hf_decoder):
    """Incremental decode with the fixed-shape cache must equal full forward."""
    params = to_jax_params(hf_decoder, prefix="bert.", lm_head_prefix="")
    B, Lp, total = 2, 3, 8
    rng = np.random.RandomState(9)
    ids = rng.randint(5, CFG.vocab_size, size=(B, total)).astype(np.int32)
    enc = rng.randn(B, 5, CFG.encoder_width).astype(np.float32)
    enc_j = jnp.asarray(enc)

    # full forward logits
    hidden = M.med_forward(
        params, jnp.asarray(ids), jnp.ones((B, total), jnp.int32),
        encoder_hidden_states=enc_j, cfg=CFG, mode="multimodal", is_decoder=True,
    )
    full_logits = np.asarray(M.med_lm_logits(params, hidden, CFG))

    # incremental: prefill Lp tokens then step one at a time
    cross_k, cross_v = M.precompute_cross_kv(params, enc_j, CFG)
    cross_bias = M.invert_attention_mask(jnp.ones((B, 5), jnp.int32))
    cache = M.init_self_cache(CFG, B, total)
    h, cache = M.med_decode_prefill(
        params, jnp.asarray(ids[:, :Lp]), cache, cross_k, cross_v, cross_bias, CFG
    )
    pre_logits = np.asarray(M.med_lm_logits(params, h, CFG))
    np.testing.assert_allclose(pre_logits, full_logits[:, :Lp], atol=3e-5)

    for t in range(Lp, total):
        logits, cache = M.med_decode_step(
            params, jnp.asarray(ids[:, t]), t, cache, cross_k, cross_v, cross_bias, CFG
        )
        np.testing.assert_allclose(np.asarray(logits), full_logits[:, t], atol=3e-5)


def test_grouped_cross_attention_matches_repeated(hf_encoder):
    """med_forward(group_size=G) over a shared memory must equal the
    ungrouped forward over the G-fold repeated memory (grouped ITM
    rerank; vidil_tpu/models/med.py:_grouped_attention)."""
    params = to_jax_params(hf_encoder)
    B, G, L, Lk = 2, 3, 7, 5
    rng = np.random.RandomState(11)
    ids = rng.randint(5, CFG.vocab_size, size=(B * G, L)).astype(np.int32)
    mask = np.ones((B * G, L), np.int32)
    mask[:, -2:] = 0
    enc = rng.randn(B, Lk, CFG.encoder_width).astype(np.float32)

    grouped = np.asarray(M.med_forward(
        params, jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=jnp.asarray(enc), cfg=CFG, mode="multimodal",
        group_size=G))
    repeated = np.asarray(M.med_forward(
        params, jnp.asarray(ids), jnp.asarray(mask),
        encoder_hidden_states=jnp.asarray(np.repeat(enc, G, axis=0)),
        cfg=CFG, mode="multimodal"))
    np.testing.assert_allclose(grouped, repeated, atol=2e-5, rtol=2e-5)
