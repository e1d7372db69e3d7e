"""CLIP parity: model vs HF CLIPModel (random init), tokenizer vs HF CLIPTokenizer."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vidil_tpu.config import CLIPConfig
from vidil_tpu.models.clip import clip_image_embeds, clip_text_embeds, init_clip
from vidil_tpu.models.convert import convert_clip
from vidil_tpu.tokenizer import ClipBPETokenizer, write_test_clip_bpe

CFG = CLIPConfig(
    image_size=28, patch_size=14, vision_hidden_size=32, vision_layers=2,
    vision_heads=4, vision_intermediate_size=64,
    vocab_size=512, text_hidden_size=32, text_layers=2, text_heads=4,
    text_intermediate_size=64, max_text_len=16, projection_dim=24,
)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel
    from transformers import CLIPTextConfig, CLIPVisionConfig

    text_cfg = CLIPTextConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.text_hidden_size,
        intermediate_size=CFG.text_intermediate_size, num_hidden_layers=CFG.text_layers,
        num_attention_heads=CFG.text_heads, max_position_embeddings=CFG.max_text_len,
        hidden_act="quick_gelu", attention_dropout=0.0,
        # eot = highest vocab id, as in the real CLIP vocab; with tokenizer
        # output the first-eos and argmax pooling dialects coincide
        bos_token_id=CFG.vocab_size - 2, eos_token_id=CFG.vocab_size - 1,
    )
    vision_cfg = CLIPVisionConfig(
        hidden_size=CFG.vision_hidden_size, intermediate_size=CFG.vision_intermediate_size,
        num_hidden_layers=CFG.vision_layers, num_attention_heads=CFG.vision_heads,
        image_size=CFG.image_size, patch_size=CFG.patch_size,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    cfg = HFCLIPConfig.from_text_vision_configs(text_cfg, vision_cfg, projection_dim=CFG.projection_dim)
    torch.manual_seed(3)
    m = CLIPModel(cfg)
    m.eval()
    return m


def test_clip_image_embeds_parity(hf_clip):
    params = convert_clip({k: v.numpy() for k, v in hf_clip.state_dict().items()}, CFG)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, CFG.image_size, CFG.image_size).astype(np.float32)
    with torch.no_grad():
        ref = hf_clip.get_image_features(pixel_values=torch.tensor(x)).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(clip_image_embeds(params, jnp.asarray(x.transpose(0, 2, 3, 1)), CFG))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_clip_text_embeds_parity(hf_clip):
    params = convert_clip({k: v.numpy() for k, v in hf_clip.state_dict().items()}, CFG)
    rng = np.random.RandomState(1)
    # eot = largest id, placed at the end (argmax pooling position)
    ids = rng.randint(1, CFG.vocab_size - 2, size=(3, 9)).astype(np.int32)
    ids[:, 0] = CFG.vocab_size - 2
    ids[:, -1] = CFG.vocab_size - 1
    with torch.no_grad():
        ref = hf_clip.get_text_features(input_ids=torch.tensor(ids, dtype=torch.long)).numpy()
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    got = np.asarray(clip_text_embeds(params, jnp.asarray(ids), CFG))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_clip_init_shapes():
    params = init_clip(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, CFG.image_size, CFG.image_size, 3))
    emb = clip_image_embeds(params, x, CFG)
    assert emb.shape == (2, CFG.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

WORDS = ["a", "photo", "of", "dog", "cat", "running", "beach", "guitar", "man"]
TEXTS = [
    "A photo of dog",
    "a photo of cat running",
    "the beach!  guitar's man",
    "unknown-word photo",
]


@pytest.fixture(scope="module")
def clip_tok_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clipbpe")
    vocab, merges = str(d / "vocab.json"), str(d / "merges.txt")
    write_test_clip_bpe(vocab, merges, WORDS + ["the", "unknown", "word"])
    return vocab, merges


@pytest.mark.parametrize("text", TEXTS)
def test_clip_tokenizer_parity(text, clip_tok_files):
    from transformers import CLIPTokenizer

    vocab, merges = clip_tok_files
    hf = CLIPTokenizer(vocab_file=vocab, merges_file=merges)
    ours = ClipBPETokenizer(vocab, merges)
    assert ours.tokenize(text) == hf.tokenize(text)
    assert ours.encode(text) == hf(text).input_ids


def test_clip_tokenizer_batch(clip_tok_files):
    from transformers import CLIPTokenizer

    vocab, merges = clip_tok_files
    hf = CLIPTokenizer(vocab_file=vocab, merges_file=merges)
    ours = ClipBPETokenizer(vocab, merges)
    ref = hf(TEXTS, padding="longest", return_tensors="np")
    got = ours(TEXTS, padding="longest")
    np.testing.assert_array_equal(got.input_ids, ref["input_ids"])
    np.testing.assert_array_equal(got.attention_mask, ref["attention_mask"])


def test_clip_vision_pooler_parity(hf_clip):
    """clip_vision_forward's pooled output must equal HF's
    vision_model(...).pooler_output — the feature the reference's
    clip-kmeans frame selector clusters (reference:
    data/video_pretrain_dataset.py:199-202)."""
    from vidil_tpu.models.clip import clip_vision_forward

    params = convert_clip({k: v.numpy() for k, v in hf_clip.state_dict().items()}, CFG)
    rng = np.random.RandomState(1)
    x = rng.randn(3, 3, CFG.image_size, CFG.image_size).astype(np.float32)
    with torch.no_grad():
        ref = hf_clip.vision_model(pixel_values=torch.tensor(x)).pooler_output.numpy()
    got = np.asarray(clip_vision_forward(params, jnp.asarray(x.transpose(0, 2, 3, 1)), CFG)[1])
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_clip_tokenizer_fuzz(clip_tok_files):
    """500 random strings (BPE-splitting fragments, punctuation, casing,
    unicode, whitespace runs) must tokenize and encode identically to HF
    CLIPTokenizer built from the same vocab/merges."""
    import random

    from transformers import CLIPTokenizer

    vocab, merges = clip_tok_files
    hf = CLIPTokenizer(vocab_file=vocab, merges_file=merges)
    ours = ClipBPETokenizer(vocab, merges)
    atoms = ["photo", "dog", "cat", "photos", "dogs", "unknown", "word",
             "the", "a", "of", "UPPER", "MiXeD", "ph", "oto", "d", "og",
             ".", ",", "!", "?", "'s", "-", "--", "café", "日本", "1", "42",
             "  ", "\t"]
    rng = random.Random(31)
    for _ in range(500):
        s = " ".join(rng.choice(atoms) for _ in range(rng.randint(1, 10)))
        if not s.strip():
            continue
        assert ours.tokenize(s) == hf.tokenize(s), repr(s)
        assert ours.encode(s) == hf(s).input_ids, repr(s)
