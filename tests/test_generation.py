"""Generation parity: vidil_tpu beam search vs HF `generate`.

Beam-search *bookkeeping* (scores, hypothesis store, length handling,
min-length masking, finalization) is verified token-identically against HF
generate on a causal-only BertLMHeadModel. Cross-attention numerics are
covered separately in test_med.py (stepwise logits + KV-cache parity), so
the composition (beam search over a cross-attending decoder) is covered.
Modern transformers' BertModel no longer supports encoder_hidden_states
through generate(), which is why the oracle here is causal-only.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.convert import convert_med
from vidil_tpu.ops.generation import GenerationConfig, beam_search, nucleus_sample

CFG = MedConfig(
    vocab_size=61,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    encoder_width=32,
    add_cross_attention=False,
)
CFG_CROSS = MedConfig(
    vocab_size=61, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64, encoder_width=32,
)
EOS = 5
PAD = 0


@pytest.fixture(scope="module")
def hf_decoder():
    from transformers import BertConfig, BertLMHeadModel

    cfg = BertConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        is_decoder=True,
        add_cross_attention=False,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
        pad_token_id=PAD,
    )
    torch.manual_seed(7)
    m = BertLMHeadModel(cfg)
    m.eval()
    return m


def make_closures(params, cfg, B_total, max_length, enc=None):
    if enc is not None:
        cross_k, cross_v = M.precompute_cross_kv(params, enc, cfg)
        cross_bias = M.invert_attention_mask(jnp.ones(enc.shape[:2], jnp.int32))
    else:
        cross_k = cross_v = cross_bias = None
    cache = M.init_self_cache(cfg, B_total, max_length)

    def prefill_fn(ids, cache):
        h, cache = M.med_decode_prefill(params, ids, cache, cross_k, cross_v, cross_bias, cfg)
        return M.med_lm_logits(params, h[:, -1], cfg), cache

    def step_fn(tokens, idx, cache):
        return M.med_decode_step(params, tokens, idx, cache, cross_k, cross_v, cross_bias, cfg)

    def reorder_fn(cache, idx):
        return jax.tree.map(lambda x: x[:, idx], cache)

    return cache, prefill_fn, step_fn, reorder_fn


@pytest.mark.parametrize("seed,max_len,min_len", [(0, 16, 5), (1, 12, 8), (2, 24, 5), (3, 16, 5)])
def test_beam_search_matches_hf(hf_decoder, seed, max_len, min_len):
    params = convert_med(
        {k: v.numpy() for k, v in hf_decoder.state_dict().items()}, CFG,
        prefix="bert.", lm_head_prefix="",
    )
    rng = np.random.RandomState(seed)
    B, Lp = 3, 4
    prompt = rng.randint(6, CFG.vocab_size, size=(B, Lp)).astype(np.int32)

    with torch.no_grad():
        ref = hf_decoder.generate(
            input_ids=torch.tensor(prompt, dtype=torch.long),
            max_length=max_len, min_length=min_len, num_beams=3,
            eos_token_id=EOS, pad_token_id=PAD,
        ).numpy()

    gen = GenerationConfig(max_length=max_len, min_length=min_len, num_beams=3,
                           eos_token_id=EOS, pad_token_id=PAD, length_norm="modern")
    cache, prefill_fn, step_fn, reorder_fn = make_closures(params, CFG, B * 3, max_len)
    got, scores = beam_search(jnp.asarray(prompt), cache, prefill_fn, step_fn, reorder_fn, gen)
    got = np.asarray(got)

    ref_padded = np.full((B, max_len), PAD, ref.dtype)
    ref_padded[:, : ref.shape[1]] = ref
    np.testing.assert_array_equal(got, ref_padded)


def test_beam_search_legacy_invariants(hf_decoder):
    """Legacy (v4.15) dialect: structural invariants — prompt preserved,
    eos-terminated or max-length, pad after eos, scores finite."""
    params = convert_med(
        {k: v.numpy() for k, v in hf_decoder.state_dict().items()}, CFG,
        prefix="bert.", lm_head_prefix="",
    )
    rng = np.random.RandomState(11)
    B, Lp, max_len = 3, 4, 16
    prompt = rng.randint(6, CFG.vocab_size, size=(B, Lp)).astype(np.int32)
    gen = GenerationConfig(max_length=max_len, min_length=5, num_beams=3,
                           eos_token_id=EOS, pad_token_id=PAD, length_norm="legacy")
    cache, prefill_fn, step_fn, reorder_fn = make_closures(params, CFG, B * 3, max_len)
    seqs, scores = beam_search(jnp.asarray(prompt), cache, prefill_fn, step_fn, reorder_fn, gen)
    seqs = np.asarray(seqs)
    assert np.isfinite(np.asarray(scores)).all()
    np.testing.assert_array_equal(seqs[:, :Lp], prompt)
    for row in seqs:
        eos_pos = np.where(row == EOS)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1 :] == PAD).all()
            assert eos_pos[0] >= 5  # min_length respected (full-length count)


def test_beam_search_with_cross_attention_smoke():
    """Beam search over a cross-attending decoder: runs jitted, output
    depends on the encoder states, eos/pad structure is well-formed."""
    params = M.init_med(jax.random.PRNGKey(0), CFG_CROSS, with_lm_head=True)
    B, Lp, nb, max_len = 2, 3, 3, 14
    prompt = jnp.asarray(np.random.RandomState(0).randint(6, 61, size=(B, Lp)), jnp.int32)
    gen = GenerationConfig(max_length=max_len, min_length=5, num_beams=nb,
                           eos_token_id=EOS, pad_token_id=PAD)
    score_outs = []
    for s in (1, 2):
        enc = jax.random.normal(jax.random.PRNGKey(s), (B * nb, 5, CFG_CROSS.encoder_width))
        cache, prefill_fn, step_fn, reorder_fn = make_closures(params, CFG_CROSS, B * nb, max_len, enc=enc)
        seqs, scores = beam_search(prompt, cache, prefill_fn, step_fn, reorder_fn, gen)
        score_outs.append(np.asarray(scores))
        np.testing.assert_array_equal(np.asarray(seqs)[:, :Lp], np.asarray(prompt))
    # cross-attention must influence the scores (tokens may coincide with
    # tiny random-init weights, but the accumulated log-probs cannot)
    assert not np.allclose(score_outs[0], score_outs[1])


def test_beam_grouped_cross_attention_matches_replicated():
    """blip_generate_ids shares cross K/V across beams (beam-grouped path);
    must be token-identical to replicating the memory per beam."""
    from vidil_tpu.models.blip import blip_generate_ids

    params = M.init_med(jax.random.PRNGKey(3), CFG_CROSS, with_lm_head=True)
    B, Lp, nb, max_len = 2, 3, 3, 14
    rng = np.random.RandomState(5)
    prompt = jnp.asarray(rng.randint(6, 61, size=(B, Lp)), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(9), (B, 5, CFG_CROSS.encoder_width))
    gen = GenerationConfig(max_length=max_len, min_length=5, num_beams=nb,
                           eos_token_id=EOS, pad_token_id=PAD)

    grouped = blip_generate_ids({"text_decoder": params}, enc, prompt, CFG_CROSS, gen, beam_group_kv=True)

    enc_rep = jnp.repeat(enc, nb, axis=0)
    cache, prefill_fn, step_fn, reorder_fn = make_closures(params, CFG_CROSS, B * nb, max_len, enc=enc_rep)
    replicated, _ = beam_search(prompt, cache, prefill_fn, step_fn, reorder_fn, gen)

    np.testing.assert_array_equal(np.asarray(grouped), np.asarray(replicated))


@pytest.mark.parametrize("unroll,lazy", [(True, False), (False, True), (True, True)])
def test_decode_restructure_flags_bit_identical(unroll, lazy):
    """decode_layer_unroll / decode_lazy_reorder are pure decode-structure
    changes (per-layer cache arrays instead of a scanned stack; ancestry-
    gather beam reorder instead of physically permuting the K/V cache) —
    token outputs must be BIT-identical to the stock path on every
    beam_group_kv x cross_kv_int8 combination (see med.init_self_cache
    for the measured per-step costs each flag removes)."""
    from vidil_tpu.models.blip import blip_generate_ids

    params = M.init_med(jax.random.PRNGKey(3), CFG_CROSS, with_lm_head=True)
    B, Lp, nb, max_len = 2, 3, 3, 14
    prompt = jnp.asarray(np.random.RandomState(5).randint(6, 61, size=(B, Lp)), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(9), (B, 5, CFG_CROSS.encoder_width))
    gen = GenerationConfig(max_length=max_len, min_length=5, num_beams=nb,
                           eos_token_id=EOS, pad_token_id=PAD)
    for group, int8 in ((False, False), (True, False), (True, True)):
        stock = blip_generate_ids(
            {"text_decoder": params}, enc, prompt, CFG_CROSS, gen,
            beam_group_kv=group, cross_kv_int8=int8)
        opt = blip_generate_ids(
            {"text_decoder": params}, enc, prompt, CFG_CROSS, gen,
            beam_group_kv=group, cross_kv_int8=int8,
            decode_layer_unroll=unroll, decode_lazy_reorder=lazy)
        np.testing.assert_array_equal(np.asarray(stock), np.asarray(opt))


def test_decode_restructure_sample_path_bit_identical():
    """Nucleus sampling with decode_layer_unroll must match stock exactly
    (lazy reorder is a beam-only concept — blip_generate_ids drops it on
    the sample path, where nothing ever permutes the cache)."""
    from vidil_tpu.models.blip import blip_generate_ids

    params = M.init_med(jax.random.PRNGKey(1), CFG_CROSS, with_lm_head=True)
    B, Lp, max_len = 4, 3, 18
    prompt = jnp.asarray(np.random.RandomState(4).randint(6, 61, size=(B, Lp)), jnp.int32)
    enc = jax.random.normal(jax.random.PRNGKey(2), (B, 5, CFG_CROSS.encoder_width))
    gen = GenerationConfig(max_length=max_len, min_length=8, eos_token_id=EOS,
                           pad_token_id=PAD, repetition_penalty=1.1, top_p=0.9)
    stock = blip_generate_ids({"text_decoder": params}, enc, prompt, CFG_CROSS,
                              gen, sample=True, rng_key=jax.random.PRNGKey(0))
    opt = blip_generate_ids({"text_decoder": params}, enc, prompt, CFG_CROSS,
                            gen, sample=True, rng_key=jax.random.PRNGKey(0),
                            decode_layer_unroll=True, decode_lazy_reorder=True)
    np.testing.assert_array_equal(np.asarray(stock), np.asarray(opt))


def test_nucleus_sample_shape_and_eos():
    params = M.init_med(jax.random.PRNGKey(1), CFG_CROSS, with_lm_head=True)
    rng = np.random.RandomState(4)
    B, Lp, max_len = 4, 3, 18
    prompt = rng.randint(6, CFG_CROSS.vocab_size, size=(B, Lp)).astype(np.int32)
    enc = jax.random.normal(jax.random.PRNGKey(2), (B, 5, CFG_CROSS.encoder_width))
    cache, prefill_fn, step_fn, _ = make_closures(params, CFG_CROSS, B, max_len, enc=enc)

    gen = GenerationConfig(max_length=max_len, min_length=8, eos_token_id=EOS,
                           pad_token_id=PAD, repetition_penalty=1.1, top_p=0.9)
    seqs = np.asarray(nucleus_sample(jnp.asarray(prompt), cache, prefill_fn, step_fn, gen, jax.random.PRNGKey(0)))
    assert seqs.shape == (B, max_len)
    np.testing.assert_array_equal(seqs[:, :Lp], prompt)
    assert not (seqs[:, Lp:8] == EOS).any()  # min_length respected
    for row in seqs:
        eos_pos = np.where(row[Lp:] == EOS)[0]
        if len(eos_pos):
            tail = row[Lp + eos_pos[0] + 1 :]
            assert (tail == PAD).all()


def test_top_p_filter_matches_hf_warper():
    from transformers.generation.logits_process import TopPLogitsWarper
    from vidil_tpu.ops.generation import _top_p_filter

    rng = np.random.RandomState(0)
    logits = rng.randn(4, 61).astype(np.float32) * 2
    ref = TopPLogitsWarper(top_p=0.9)(None, torch.tensor(logits)).numpy()
    got = np.asarray(_top_p_filter(jnp.asarray(logits), 0.9))
    # same kept-set (-inf pattern) and same surviving values
    np.testing.assert_array_equal(np.isinf(got), np.isinf(ref))
    np.testing.assert_allclose(np.where(np.isinf(got), 0, got), np.where(np.isinf(ref), 0, ref), atol=1e-6)
