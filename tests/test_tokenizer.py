"""Tokenizer parity: BlipTokenizer vs HF BertTokenizer from the same vocab."""

import numpy as np
import pytest

from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

WORDS = [
    "a", "picture", "of", "video", "the", "man", "is", "playing", "guitar",
    "##ing", "##s", "play", "dog", "cat", "run", "##ning", "on", "beach",
    "two", "people", "talk", "##ed", "in", "kitchen", "cook", "food",
    ".", ",", "!", "?", "'", "s", "n", "t", "##'", "##t",
]

SENTENCES = [
    "a picture of a man playing guitar",
    "The dog is RUNNING on the beach!",
    "two people talked, in a kitchen.",
    "cooking food?  a cat plays",
    "unknownword here",
    "café au lait",  # accent stripping
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    write_test_vocab(str(p), WORDS)
    return str(p)


@pytest.fixture(scope="module")
def hf_tok(vocab_file):
    from transformers import BertTokenizer

    t = BertTokenizer(vocab_file=vocab_file)
    t.add_special_tokens({"bos_token": "[DEC]"})
    t.add_special_tokens({"additional_special_tokens": ["[ENC]"]})
    return t


@pytest.fixture(scope="module")
def our_tok(vocab_file):
    return BlipTokenizer(vocab_file)


@pytest.mark.parametrize("text", [s for s in SENTENCES if s])
def test_tokenize_parity(text, hf_tok, our_tok):
    assert our_tok.tokenize(text) == hf_tok.tokenize(text)


@pytest.mark.parametrize("text", [s for s in SENTENCES if s])
def test_encode_parity(text, hf_tok, our_tok):
    assert our_tok.encode(text) == hf_tok.encode(text)


def test_special_token_ids(hf_tok, our_tok):
    assert our_tok.bos_token_id == hf_tok.bos_token_id
    assert our_tok.enc_token_id == hf_tok.additional_special_tokens_ids[0]
    assert our_tok.pad_token_id == hf_tok.pad_token_id == 0
    assert our_tok.sep_token_id == hf_tok.sep_token_id
    assert our_tok.cls_token_id == hf_tok.cls_token_id
    assert our_tok.vocab_size == len(hf_tok)


def test_batch_encode_padding_longest(hf_tok, our_tok):
    texts = SENTENCES[:4]
    ref = hf_tok(texts, padding="longest", return_tensors="np")
    got = our_tok(texts, padding="longest")
    np.testing.assert_array_equal(got.input_ids, ref["input_ids"])
    np.testing.assert_array_equal(got.attention_mask, ref["attention_mask"])


def test_batch_encode_max_length_truncation(hf_tok, our_tok):
    texts = SENTENCES[:4]
    ref = hf_tok(texts, padding="max_length", truncation=True, max_length=8, return_tensors="np")
    got = our_tok(texts, padding="max_length", truncation=True, max_length=8)
    np.testing.assert_array_equal(got.input_ids, ref["input_ids"])
    np.testing.assert_array_equal(got.attention_mask, ref["attention_mask"])


@pytest.mark.parametrize("text", [s for s in SENTENCES if s])
def test_decode_parity(text, hf_tok, our_tok):
    ids = hf_tok(text).input_ids
    assert our_tok.decode(ids) == hf_tok.decode(ids, skip_special_tokens=True)


def test_decode_skips_blip_specials(hf_tok, our_tok):
    ids = [our_tok.bos_token_id] + our_tok.encode("a picture of", add_special_tokens=False) + [our_tok.sep_token_id]
    assert our_tok.decode(ids) == hf_tok.decode(ids, skip_special_tokens=True)


def test_fuzz_encode_decode_parity(hf_tok, our_tok):
    """500 random strings over a nasty alphabet (subword-forcing pieces,
    punctuation, accents, unicode, casing, whitespace runs): tokenize,
    encode and decode must all be identical to HF built from the same
    vocab — the tokenizer feeds every byte-sensitive path (ITM ids,
    prompts, caption decode), so set-piece cases are not enough."""
    import random

    atoms = ["play", "playing", "run", "running", "talked", "dog", "cat",
             "guitar", "beach", "kitchen", "unknownword", "café", "naïve",
             "a", "the", "of", ".", ",", "!", "?", "'", "'s", "n't",
             "UPPER", "MiXeD", "日本語", "1", "23", "  ", "\t", "-", "--"]
    rng = random.Random(99)
    for _ in range(500):
        s = " ".join(rng.choice(atoms) for _ in range(rng.randint(1, 12)))
        if not s.strip():
            continue
        assert our_tok.tokenize(s) == hf_tok.tokenize(s), repr(s)
        ours = our_tok.encode(s)
        theirs = hf_tok.encode(s)
        assert ours == theirs, repr(s)
        assert (our_tok.decode(np.asarray(ours), skip_special_tokens=True)
                == hf_tok.decode(theirs, skip_special_tokens=True)), repr(s)
