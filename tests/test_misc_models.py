"""NLVR, BLIP embedding, frame-sentence selection, dataset factory."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip_embedding import blip_embedding_forward, init_blip_embedding
from vidil_tpu.models.blip_nlvr import init_blip_nlvr, nlvr_forward, nlvr_loss

VIT = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
MED = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=64, encoder_width=32)


def test_nlvr_forward_and_loss():
    params = init_blip_nlvr(jax.random.PRNGKey(0), VIT, MED, fusion_layer=1)
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    img1 = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(4, 64, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    logits = nlvr_forward(params, img0, img1, ids, mask, VIT, MED, fusion_layer=1)
    assert logits.shape == (2, 2)
    loss = nlvr_loss(logits, jnp.asarray([0, 1]))
    assert np.isfinite(float(loss))
    # both images must matter
    logits2 = nlvr_forward(params, img1, img0, ids, mask, VIT, MED, fusion_layer=1)
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))


def test_blip_embedding_modes():
    params = init_blip_embedding(jax.random.PRNGKey(1), VIT, MED, embed_dim=8)
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(3, 32, 32, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(4, 64, (2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.int32)
    itm = blip_embedding_forward(params, imgs[:2], ids, mask, VIT, MED, match_head="itm")
    assert itm.shape == (2, 2)
    image_feat, text_feat, sim = blip_embedding_forward(params, imgs, ids, mask, VIT, MED, match_head="itc")
    assert image_feat.shape == (3, 8) and text_feat.shape == (2, 8) and sim.shape == (3, 2)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(image_feat), axis=-1), 1.0, atol=1e-5)


def test_frame_sentence_selection(tmp_path):
    from vidil_tpu.models.blip import init_blip_itm
    from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab
    from vidil_tpu.train.frame_selection import select_frame_and_sentence, sentence_tokenization

    assert sentence_tokenization("first part. second part here") == ["first part.", "second part here"]
    assert sentence_tokenization("x") == ["x"]

    vocab = str(tmp_path / "v.txt")
    write_test_vocab(vocab, ["first", "part", "second", "here", "."])
    tok = BlipTokenizer(vocab)
    med = MedConfig(vocab_size=tok.vocab_size, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64, encoder_width=32)
    params = init_blip_itm(jax.random.PRNGKey(2), VIT, med)
    frames = np.random.RandomState(2).randn(3, 32, 32, 3).astype(np.float32)
    frame, sent = select_frame_and_sentence(params, frames, "first part. second part here",
                                            tok, VIT, med)
    assert frame.shape == (32, 32, 3)
    assert sent in ["first part.", "second part here"]


def test_dataset_factory(tmp_path):
    import cv2

    from vidil_tpu.data.factory import create_dataset, create_loader, create_sampler

    videos = tmp_path / "videos"
    videos.mkdir()
    for vi in range(2):
        w = cv2.VideoWriter(str(videos / f"v{vi}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
        for i in range(12):
            w.write(np.full((48, 48, 3), i * 20, np.uint8))
        w.release()
    jsonl = tmp_path / "ann.jsonl"
    with open(jsonl, "w") as f:
        for i in range(3):
            f.write(json.dumps({"caption": f"cap {i}", "clip_name": f"v{i % 2}", "sen_id": i}) + "\n")

    config = dict(video_root=str(videos), train_ann_jsonl=str(jsonl),
                  val_ann_jsonl=str(jsonl), test_ann_jsonl=str(jsonl),
                  num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
                  height=None, width=None, start_time=None, end_time=None, fps=-1,
                  image_size=32)
    train, val, test = create_dataset("caption_msrvtt", config)
    assert len(train) == 3 and len(val) == 2
    bounds = create_sampler([train, val], [True, False], 2, 0)
    assert bounds[0][0] == 0
    loaders = create_loader([train, val], bounds, [2, 2], [1, 1], [True, False], [None, None])
    videos_b, caps = next(iter(loaders[0]))
    assert videos_b.shape == (2, 2, 32, 32, 3)


def test_video_to_captions_dataset(tmp_path):
    import cv2

    from vidil_tpu.data.datasets import VideoToCaptionsDataset

    videos = tmp_path / "videos"
    videos.mkdir()
    w = cv2.VideoWriter(str(videos / "v0.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 48))
    for i in range(12):
        w.write(np.full((48, 48, 3), i * 20, np.uint8))
    w.release()
    ann = tmp_path / "ann.json"
    json.dump({"v0": ["caption a", "caption b"], "missing": ["x"]}, open(ann, "w"))
    ds = VideoToCaptionsDataset(dict(video_roots=str(videos), train_ann_jsons=str(ann),
                                     video_formats="mp4", num_frm_train=2,
                                     frm_sampling_strategy="uniform", height=None, width=None,
                                     start_time=None, end_time=None, fps=-1, image_size=32))
    assert len(ds) == 1
    video, captions = ds[0]
    assert video.shape == (2, 32, 32, 3)
    assert captions == ["caption a", "caption b"]
