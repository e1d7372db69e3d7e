"""End-to-end CapFilt engine tests: synthetic video -> captions -> filter."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
from vidil_tpu.pipeline.capfilt import CapFiltEngine, original_caption_sentences, preprocess_frames_pil
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
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    write_test_vocab(str(p), WORDS)
    tok = BlipTokenizer(str(p))
    assert tok.vocab_size == MED.vocab_size, f"vocab {tok.vocab_size} != {MED.vocab_size}"
    return tok


@pytest.fixture(scope="module")
def synthetic_video(tmp_path_factory):
    import cv2

    path = str(tmp_path_factory.mktemp("videos") / "vid0001.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    assert w.isOpened()
    for i in range(40):
        frame = np.zeros((48, 64, 3), np.uint8)
        frame[:, :, 0] = (i * 6) % 255
        frame[:, : i + 10, 1] = 200
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def engine(tokenizer):
    cap = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    fil = init_blip_itm(jax.random.PRNGKey(1), VIT, MED)
    return CapFiltEngine(cap, fil, tokenizer, VIT, MED,
                         num_beams=3, max_length=16, min_length=5, dtype=None)


def test_video_reader_and_sampling(synthetic_video):
    from vidil_tpu.data.sampling import load_video_frames, sample_frame_indices
    from vidil_tpu.data.video_reader import VideoReader

    vr = VideoReader(synthetic_video)
    assert len(vr) == 40
    batch = vr.get_batch([0, 10, 20, 39])
    assert batch.shape == (4, 48, 64, 3)
    # frames must differ (moving gradient)
    assert not np.array_equal(batch[0], batch[3])

    idx = sample_frame_indices(40, 4, "uniform")
    np.testing.assert_array_equal(idx, np.arange(0, 40, 10, dtype=int))

    import random
    random.seed(42)
    ht1 = sample_frame_indices(40, 4, "headtail")
    random.seed(42)
    ht2 = sample_frame_indices(40, 4, "headtail")
    np.testing.assert_array_equal(ht1, ht2)
    assert (ht1[:2] < 20).all() and (ht1[2:] >= 20).all()

    frames = load_video_frames(synthetic_video, "uniform", 4)
    assert frames.shape == (4, 48, 64, 3)
    assert load_video_frames("/nonexistent/x.mp4", "uniform", 4) is None


def test_preprocess_frames_pil(synthetic_video):
    from vidil_tpu.data.sampling import load_video_frames

    frames = load_video_frames(synthetic_video, "uniform", 4)
    out = preprocess_frames_pil(frames, 32)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8


def test_caption_frames(engine, synthetic_video):
    from vidil_tpu.data.sampling import load_video_frames

    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    caps = engine.caption_frames(frames)
    assert len(caps) == 4
    assert all(isinstance(c, str) for c in caps)
    # deterministic beam search
    assert caps == engine.caption_frames(frames)


def test_filter_thresholds(engine, synthetic_video):
    from vidil_tpu.data.sampling import load_video_frames

    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    embeds = engine.encode_filter_frames(frames, 4)  # (1, F, P, D) device array
    texts = [["a dog runs", "a cat plays", "water"]]
    keep_all = engine.filter_captions_batch(embeds, texts, threshold=-1.0)
    assert keep_all[0] == texts[0]
    keep_none = engine.filter_captions_batch(embeds, texts, threshold=2.0)
    assert keep_none[0] == []
    # max_filter >= avg_filter survivor count
    mx = engine.filter_captions_batch(embeds, texts, threshold=0.4, mode="max_filter")
    av = engine.filter_captions_batch(embeds, texts, threshold=0.4, mode="avg_filter")
    assert set(av[0]) <= set(mx[0])


def test_run_chunk_structure(engine, synthetic_video):
    from vidil_tpu.data.sampling import load_video_frames

    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    chunk = [
        {"video_id": "vid0001", "frames": frames, "text": ["a dog runs. a cat plays"]},
        {"video_id": "vid0002", "frames": frames[::-1].copy(), "text": ["water on the beach"]},
    ]
    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=-1.0, filter_mode="max_filter",
                  generation_mode="beam", do_sentence_tokenization=True)
    results = engine.run_chunk(chunk, config)
    assert [r.video_id for r in results] == ["vid0001", "vid0002"]
    for r in results:
        assert len(r.unfiltered_text) >= 1
        assert r.text == r.unfiltered_text  # threshold -1 keeps all generated

    # keep_original_caption=True: raw originals stay in text, sentences in unfiltered
    config2 = {**config, "keep_original_caption": True}
    results2 = engine.run_chunk(chunk, config2)
    assert results2[0].text[: 1] == ["a dog runs. a cat plays"]
    assert "a dog runs." in results2[0].unfiltered_text

    # caption=False passes original sentences through
    config3 = {**config, "caption": False, "filter": False}
    results3 = engine.run_chunk(chunk, config3)
    assert results3[0].text == ["a dog runs.", "a cat plays"]


def test_run_chunk_yuv_identical_on_gray(engine, synthetic_video):
    """YUV420 ingest == RGB ingest when the roundtrip is lossless (gray
    frames): identical captions and filter decisions."""
    from vidil_tpu.ops.image import rgb_to_yuv420

    rng = np.random.RandomState(7)
    gray = np.repeat(rng.randint(0, 256, size=(4, 32, 32, 1), dtype=np.uint8), 3, axis=-1)
    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=False, threshold=-1.0, filter_mode="max_filter",
                  generation_mode="beam", do_sentence_tokenization=False)
    chunk_rgb = [{"video_id": "v", "frames": gray, "text": ["a dog"]}]
    chunk_yuv = [{"video_id": "v", "frames": rgb_to_yuv420(gray), "text": ["a dog"]}]
    res_rgb = engine.run_chunk(chunk_rgb, config)
    res_yuv = engine.run_chunk(chunk_yuv, config)
    assert res_rgb[0].unfiltered_text == res_yuv[0].unfiltered_text
    assert res_rgb[0].text == res_yuv[0].text


def test_engine_early_exit_off_identical(engine, tokenizer, synthetic_video):
    """early_exit=False runs all decode steps; outputs are bit-identical."""
    from vidil_tpu.data.sampling import load_video_frames

    fixed = CapFiltEngine(engine.captioner_params, engine.filterer_params,
                          tokenizer, VIT, MED, num_beams=3, max_length=16,
                          min_length=5, dtype=None, early_exit=False)
    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    assert engine.caption_frames(frames) == fixed.caption_frames(frames)


def test_original_caption_sentences():
    out = original_caption_sentences(["one sentence here. second one!\nthird line"], True)
    assert out == ["one sentence here.", "second one!. third line"] or len(out) >= 2
    out2 = original_caption_sentences(["keep\nas is"], False)
    assert out2 == ["keep. as is"]


def test_engine_beam_group_kv_identical(engine, tokenizer, synthetic_video):
    """beam_group_kv=True (beams share one cross-K/V copy) must produce
    the SAME captions as the default expanded-KV engine."""
    from vidil_tpu.data.sampling import load_video_frames

    cap = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    fil = init_blip_itm(jax.random.PRNGKey(1), VIT, MED)
    grouped = CapFiltEngine(cap, fil, tokenizer, VIT, MED,
                            num_beams=3, max_length=16, min_length=5,
                            dtype=None, beam_group_kv=True)
    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    assert grouped.caption_frames(frames) == engine.caption_frames(frames)


def test_engine_cross_kv_int8_runs(engine, tokenizer, synthetic_video):
    """cross_kv_int8=True (per-row int8 cross-K/V, opt-in HBM optimization)
    must produce well-formed captions; token-level behavior is pinned in
    test_cross_kv_int8.py, measured parity in tools/ab_decode_int8.py."""
    from vidil_tpu.data.sampling import load_video_frames

    cap = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    fil = init_blip_itm(jax.random.PRNGKey(1), VIT, MED)
    q8 = CapFiltEngine(cap, fil, tokenizer, VIT, MED,
                       num_beams=3, max_length=16, min_length=5,
                       dtype=None, beam_group_kv=True, cross_kv_int8=True)
    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    caps = q8.caption_frames(frames)
    base = engine.caption_frames(frames)
    assert len(caps) == len(base) and all(isinstance(c, str) for c in caps)


def test_engine_mesh_sharded_matches_single(engine, tokenizer, synthetic_video):
    """CapFiltEngine(mesh=...) shards batches over the 'data' axis of a
    device mesh; results must be identical to the meshless engine."""
    from jax.sharding import Mesh
    from vidil_tpu.data.sampling import load_video_frames

    devs = np.array(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, ("data",))
    cap = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    fil = init_blip_itm(jax.random.PRNGKey(1), VIT, MED)
    meshed = CapFiltEngine(cap, fil, tokenizer, VIT, MED,
                           num_beams=3, max_length=16, min_length=5,
                           dtype=None, mesh=mesh)

    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    chunk = [{"video_id": f"v{i}", "frames": np.roll(frames, i, axis=0),
              "text": ["a green gradient video"]} for i in range(4)]
    config = dict(caption=True, filter=True, filter_generated_only=False,
                  keep_original_caption=True, threshold=0.0,
                  filter_mode="max_filter", generation_mode="beam",
                  do_sentence_tokenization=False)
    a = engine.run_chunk(chunk, config)
    b = meshed.run_chunk(chunk, config)
    for ra, rb in zip(a, b):
        assert ra == rb


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("torchvision") is None,
    reason="torchvision not installed (preprocess is the same PIL resize call the reference's torchvision Compose delegates to)")
def test_preprocess_matches_torchvision():
    """preprocess_frames_pil must match the reference's torchvision
    Compose(ToPILImage, Resize((S,S), BICUBIC), ToTensor, Normalize)
    (reference: run_video_CapFilt.py:127-137)."""
    from torchvision import transforms
    from torchvision.transforms import InterpolationMode

    from vidil_tpu.ops.image import CLIP_MEAN, CLIP_STD

    S = 48
    t = transforms.Compose([
        transforms.ToPILImage(),
        transforms.Resize((S, S), interpolation=InterpolationMode.BICUBIC),
        transforms.ToTensor(),
        transforms.Normalize(CLIP_MEAN, CLIP_STD),
    ])
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, size=(2, 60, 90, 3)).astype(np.uint8)
    ref = np.stack([t(f).numpy() for f in frames])  # (2, 3, S, S)
    got_u8 = preprocess_frames_pil(frames, S)
    got = ((got_u8.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN))
           / np.asarray(CLIP_STD)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_grouped_filter_matches_pair_scoring(engine):
    """The grouped ITM filter (texts of a video share each frame's memory)
    must reproduce the per-pair scoring path's probabilities."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    V, F = 3, 4
    frames = rng.randint(0, 256, size=(V * F, 32, 32, 3)).astype(np.uint8)
    fe = engine.encode_filter_frames(frames, F)  # (V, F, P, D)

    texts = [["a dog", "original caption 0"], ["a cat"], ["a bird", "a dog", "a cat"]]
    n_texts = [len(t) for t in texts]
    flat = [t for ts in texts for t in ts]
    enc = engine.tok(flat, padding="max_length", truncation=True,
                     max_length=engine.itm_max_text_len)
    vid_idx = np.repeat(np.arange(V), n_texts).astype(np.int32)
    mask = enc.attention_mask.copy()
    mask[:, 0] = 1
    pair_probs = np.asarray(engine._itm_pairs(
        fe, jnp.asarray(vid_idx), jnp.asarray(enc.input_ids), jnp.asarray(mask)))

    grouped = engine.filter_captions_batch(fe, texts, threshold=-1.0)
    assert grouped == texts  # threshold -1 keeps everything

    # compare the aggregated max probs against a thresholded rerun
    agg = pair_probs.max(axis=1)
    thresh = float(np.median(agg))
    expect = []
    pos = 0
    for v, ts in enumerate(texts):
        keep = [t for j, t in enumerate(ts) if agg[pos + j] > thresh]
        expect.append(keep)
        pos += len(ts)
    got = engine.filter_captions_batch(fe, texts, threshold=thresh)
    assert got == expect


def test_dispatch_complete_split_matches_run_chunk(engine, synthetic_video):
    """dispatch_chunk/complete_chunk composed out of line (another chunk
    dispatched in between) matches back-to-back run_chunk calls — the
    split API tolerates interleaved dispatches even though the CLI and
    bench complete sequentially (cross-chunk pipelining was measured a
    wash and removed; see dispatch_chunk's docstring)."""
    from vidil_tpu.data.sampling import load_video_frames

    frames = preprocess_frames_pil(load_video_frames(synthetic_video, "uniform", 4), 32)
    rng = np.random.RandomState(3)
    chunks = []
    for c in range(2):
        chunks.append([
            {"video_id": f"v{c}_{i}",
             "frames": np.clip(frames.astype(np.int32) + rng.randint(-30, 30), 0, 255).astype(np.uint8),
             "text": [f"a dog runs in chunk {c}"]}
            for i in range(2)
        ])
    config = dict(caption=True, filter=True, filter_generated_only=True,
                  keep_original_caption=True, threshold=0.5, filter_mode="max_filter",
                  generation_mode="beam", do_sentence_tokenization=False)
    seq = [engine.run_chunk(list(c), config) for c in chunks]
    d0 = engine.dispatch_chunk(list(chunks[0]), config)
    d1 = engine.dispatch_chunk(list(chunks[1]), config)
    inter = [engine.complete_chunk(d0), engine.complete_chunk(d1)]
    for rs, rp in zip(seq, inter):
        assert [(r.video_id, r.unfiltered_text, r.text) for r in rs] == \
               [(r.video_id, r.unfiltered_text, r.text) for r in rp]
