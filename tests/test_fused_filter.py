"""Fused CapFilt filter path: device-built ITM ids from generated seqs.

Pins that the fused path (vidil_tpu/pipeline/fused_filter.py +
CapFiltEngine._itm_fused) produces EXACTLY the classic path's results —
same filtered caption lists, derived from the same per-(text, frame) ITM
probabilities — and that the host verification falls back to the classic
path when re-tokenization would not reproduce the device-scored ids.
"""

import numpy as np
import pytest

import jax

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
from vidil_tpu.pipeline import capfilt as capfilt_mod
from vidil_tpu.pipeline.capfilt import CapFiltEngine
from vidil_tpu.pipeline.fused_filter import (
    fused_applicable, itm_ids_from_seqs, itm_ids_from_seqs_np,
)
from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

VIT = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
MED = MedConfig(vocab_size=137, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=64, encoder_width=32)

WORDS = ["a", "picture", "of", "video", "man", "dog", "cat", "runs", "plays",
         "beach", "park", "the", "on", "in", "guitar", "ball", "red", "blue",
         "big", "small", "walks", "jumps", "sits", "eats", "food", "water",
         "tree", "house", "car", "street", "sky"]


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    # A RETOK-STABLE vocab: write_test_vocab's canonical layout puts
    # [unusedN] at ids 1-99, and a random-weight decoder happily
    # generates those — but "[unused27]" decodes to a bracketed string
    # that re-tokenizes as '[', 'unused27', ']' (BasicTokenizer splits
    # punctuation), i.e. every caption would fail verification and the
    # fused fast path would never be exercised. Fill ids 1-99 with plain
    # words instead so generated captions round-trip through
    # decode->tokenize exactly (the situation of a real BLIP checkpoint,
    # whose captions are natural words).
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    base = ["[PAD]"] + [f"word{i}" for i in range(99)] + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    with open(p, "w", encoding="utf-8") as f:
        f.write("\n".join(base + WORDS) + "\n")
    return BlipTokenizer(str(p))


@pytest.fixture(scope="module")
def engine(tokenizer):
    cap = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    fil = init_blip_itm(jax.random.PRNGKey(1), VIT, MED)
    return CapFiltEngine(cap, fil, tokenizer, VIT, MED,
                         num_beams=3, max_length=16, min_length=5, dtype=None)


@pytest.fixture()
def frames():
    rng = np.random.RandomState(7)
    # 3 videos x 2 frames of 32x32 uint8
    return [rng.randint(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
            for _ in range(3)]


def _chunk(frames):
    return [{"video_id": f"v{i}", "frames": f, "text": [f"original caption {i}"]}
            for i, f in enumerate(frames)]


# ---------------------------------------------------------------------------
# transform unit tests
# ---------------------------------------------------------------------------

def _mk_seqs(tok, engine, rows):
    """rows: list of (caption word list, close) -> (N, Lgen) like the
    generation output: [prompt ids..., caption ids..., [SEP] if close,
    pad...]."""
    Lgen = 16
    out = []
    for words, close in rows:
        ids = list(engine.prompt_ids)
        ids += [tok.vocab[w] for w in words]
        if close and len(ids) < Lgen:
            ids.append(tok.sep_token_id)
        ids += [tok.pad_token_id] * (Lgen - len(ids))
        out.append(ids[:Lgen])
    return np.asarray(out, np.int32)


def test_transform_np_vs_jnp_and_tokenizer(tokenizer, engine):
    tok = tokenizer
    Lfill = 16 - len(engine.prompt_ids)
    rows = [
        (["dog", "runs", "on", "the", "beach"], True),   # normal
        ([], True),                                       # empty caption
        (["cat"] * Lfill, False),                         # max-length, no SEP fit
        (["man", "plays", "guitar"], True),
    ]
    seqs = _mk_seqs(tok, engine, rows)
    L = engine.itm_max_text_len
    ids_np, mask_np = itm_ids_from_seqs_np(
        seqs, len(engine.prompt_ids), tok.cls_token_id, tok.sep_token_id,
        tok.pad_token_id, L)
    ids_j, mask_j = itm_ids_from_seqs(
        seqs, len(engine.prompt_ids), tok.cls_token_id, tok.sep_token_id,
        tok.pad_token_id, L)
    np.testing.assert_array_equal(ids_np, np.asarray(ids_j))
    np.testing.assert_array_equal(mask_np, np.asarray(mask_j))

    # matches the classic tokenize(decode(seq)) for retok-stable rows
    from vidil_tpu.models.blip import decode_captions

    caps = decode_captions(tok, seqs, engine.prompt)
    enc = tok(caps, padding="max_length", truncation=True, max_length=L)
    np.testing.assert_array_equal(enc.input_ids, ids_np)
    np.testing.assert_array_equal(enc.attention_mask, mask_np)


def test_transform_pads_after_eos_ignored(tokenizer, engine):
    tok = tokenizer
    seqs = _mk_seqs(tok, engine, [(["dog"], True)])
    # tokens after the first SEP must not leak into the ITM ids
    sep_pos = len(engine.prompt_ids) + 1
    seqs[0, sep_pos + 1] = tok.vocab["cat"]
    ids_np, _ = itm_ids_from_seqs_np(
        seqs, len(engine.prompt_ids), tok.cls_token_id, tok.sep_token_id,
        tok.pad_token_id, engine.itm_max_text_len)
    expect = [tok.cls_token_id, tok.vocab["dog"], tok.sep_token_id]
    np.testing.assert_array_equal(ids_np[0, :3], expect)
    assert (ids_np[0, 3:] == tok.pad_token_id).all()


def test_fused_applicable_matrix():
    base = dict(filter=True, caption=True)
    assert fused_applicable({**base, "filter_generated_only": True,
                             "keep_original_caption": True})
    assert fused_applicable({**base, "filter_generated_only": False,
                             "keep_original_caption": False})
    assert not fused_applicable({**base, "filter_generated_only": False,
                                 "keep_original_caption": True})
    assert not fused_applicable({**base, "caption": False})
    assert not fused_applicable({**base, "filter": False})


# ---------------------------------------------------------------------------
# engine-level: fused == classic, exactly
# ---------------------------------------------------------------------------

CONFIGS = [
    dict(caption=True, filter=True, filter_generated_only=True,
         keep_original_caption=False, threshold=0.5, filter_mode="max_filter",
         generation_mode="beam", do_sentence_tokenization=False),
    dict(caption=True, filter=True, filter_generated_only=True,
         keep_original_caption=True, threshold=0.5, filter_mode="avg_filter",
         generation_mode="beam", do_sentence_tokenization=False),
    dict(caption=True, filter=True, filter_generated_only=False,
         keep_original_caption=False, threshold=0.4, filter_mode="max_filter",
         generation_mode="beam", do_sentence_tokenization=False),
    dict(caption=True, filter=True, filter_generated_only=True,
         keep_original_caption=False, threshold=0.5, filter_mode="max_filter",
         generation_mode="nucleus", do_sentence_tokenization=False),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_fused_matches_classic(engine, frames, cfg):
    rng = jax.random.PRNGKey(11)
    engine.fused_filter = False
    classic = engine.run_chunk(_chunk(frames), cfg, rng=rng)
    engine.fused_filter = True
    before = engine.fused_fallback_videos
    d = engine.dispatch_chunk(_chunk(frames), cfg, rng=rng)
    assert d.itm_probs is not None, "fused path should engage for this config"
    fused = engine.complete_chunk(d)
    # the fast path itself must be exercised: these captions round-trip
    # decode->tokenize exactly, so no video may have fallen back
    assert engine.fused_fallback_videos == before
    assert [(r.video_id, r.unfiltered_text, r.text) for r in classic] == \
           [(r.video_id, r.unfiltered_text, r.text) for r in fused]


def test_fused_not_engaged_when_originals_filtered(engine, frames):
    cfg = dict(caption=True, filter=True, filter_generated_only=False,
               keep_original_caption=True, threshold=0.5, filter_mode="max_filter",
               generation_mode="beam", do_sentence_tokenization=False)
    engine.fused_filter = True
    d = engine.dispatch_chunk(_chunk(frames), cfg, rng=jax.random.PRNGKey(11))
    assert d.itm_probs is None  # classic path: originals only exist on host
    engine.complete_chunk(d)


@pytest.mark.parametrize("poison", [[0], [0, 2], [0, 1, 2]])
def test_fused_fallback_on_retok_mismatch(engine, frames, monkeypatch, poison):
    """When host re-tokenization does not reproduce the device-scored ids
    for some video's rows, exactly those videos are re-scored in one
    batched classic call and the results still equal the classic path."""
    cfg = CONFIGS[0]
    F = frames[0].shape[0]
    rng = jax.random.PRNGKey(11)
    engine.fused_filter = False
    classic = engine.run_chunk(_chunk(frames), cfg, rng=rng)

    # poison the verification mirror for the chosen videos' rows only
    def bad_ids(seqs, *a, **k):
        ids, mask = itm_ids_from_seqs_np(seqs, *a, **k)
        for v in poison:
            ids[v * F:(v + 1) * F] += 1
        return ids, mask

    monkeypatch.setattr(capfilt_mod, "itm_ids_from_seqs_np", bad_ids)
    calls = []
    orig = engine.filter_captions_batch

    def spy(*a, **k):
        calls.append((a, k))
        return orig(*a, **k)

    monkeypatch.setattr(engine, "filter_captions_batch", spy)
    engine.fused_filter = True
    before = engine.fused_fallback_videos
    fused = engine.run_chunk(_chunk(frames), cfg, rng=rng)
    assert len(calls) == 1  # ONE batched re-score of just the poisoned videos
    assert len(calls[0][0][1]) == len(poison)
    assert engine.fused_fallback_videos - before == len(poison)
    assert [(r.video_id, r.unfiltered_text, r.text) for r in classic] == \
           [(r.video_id, r.unfiltered_text, r.text) for r in fused]


def test_fused_text_len_trim_bound(engine, tokenizer):
    """The fused ITM text length trims from itm_max_text_len=35 to
    roundup(max_length - prompt_len + 2, 8) — generated captions cannot
    overflow it, and the parity tests above all run through the trimmed
    program (max_length=16, prompt 4 ids -> bound 16 < 35)."""
    assert engine.itm_text_len_fused == 16 < engine.itm_max_text_len
    # a full-length generated row still fits: caption tokens <= 12 -> 14 used
    Lcap_max = 16 - len(engine.prompt_ids)
    assert Lcap_max + 2 <= engine.itm_text_len_fused


def test_fused_fallback_on_retok_expansion(engine, frames, monkeypatch):
    """A caption whose host re-tokenization EXPANDS past the fused bound
    (non-pad tokens beyond itm_text_len_fused in the 35-pad encoding) must
    fail verification and re-score through the classic 35-pad path."""
    long_ids = engine.tok(["dog " * 30], padding="max_length", truncation=True,
                          max_length=engine.itm_max_text_len)
    assert (np.asarray(long_ids.input_ids)[0][engine.itm_text_len_fused:]
            != engine.tok.pad_token_id).any()

    orig_tok = engine.tok.__call__

    def expanding_tok(texts, **kw):
        # make every caption re-tokenize to an over-bound row
        return orig_tok(["dog " * 30 for _ in texts], **kw)

    before = engine.fused_fallback_videos
    monkeypatch.setattr(type(engine.tok), "__call__",
                        lambda self, texts, **kw: expanding_tok(texts, **kw))
    cfg = dict(caption=True, filter=True, filter_generated_only=True,
               keep_original_caption=False, threshold=-10.0,
               filter_mode="max_filter", generation_mode="beam",
               do_sentence_tokenization=False)
    res = engine.run_chunk(_chunk(frames), cfg, rng=jax.random.PRNGKey(0))
    monkeypatch.undo()
    assert engine.fused_fallback_videos > before  # verification rejected rows
    assert all(isinstance(r.text, list) for r in res)


def test_fused_counters_exclude_chunk_padding(engine, frames):
    """Tail-chunk pad videos (the CLI pads with copies of chunk[0]) must
    not inflate fused_total_videos/fused_fallback_videos — the counters
    report the fallback RATE over real videos."""
    cfg = dict(caption=True, filter=True, filter_generated_only=True,
               keep_original_caption=False, threshold=-10.0,
               filter_mode="max_filter", generation_mode="beam",
               do_sentence_tokenization=False)
    chunk = _chunk(frames)
    padded = chunk + [{**chunk[0]} for _ in range(3)]  # 3 real + 3 pads
    before = engine.fused_total_videos
    d = engine.dispatch_chunk(padded, cfg, rng=jax.random.PRNGKey(2),
                              n_real=len(chunk))
    res = engine.complete_chunk(d)
    assert len(res) == len(padded)  # outputs still cover the padded chunk
    assert engine.fused_total_videos - before == len(chunk)
