"""BLIP-mode visual tokenization (encoder_version='blip'): engine + CLI."""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.testing import make_blip_itm_ckpt, save_torch_ckpt
from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

VIT_KW = dict(patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
IMAGE_SIZE = 32


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("blip_tok")
    videos = root / "videos"
    videos.mkdir()
    ann = {}
    for vi in range(2):
        w = cv2.VideoWriter(str(videos / f"vid{vi}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(20):
            frame = np.zeros((48, 64, 3), np.uint8)
            frame[:, :, vi] = (i * 11 + vi * 70) % 255
            w.write(frame)
        w.release()
        ann[f"vid{vi}"] = [f"caption {vi}"]
    ann_path = str(root / "ann.json")
    json.dump(ann, open(ann_path, "w"))

    vocab_path = str(root / "vocab.txt")
    write_test_vocab(vocab_path, ["a", "photo", "of", "dog", "cat", "bird", "red",
                                  "blue", "shiny", "beach", "park", "kitchen",
                                  "running", "sitting", "eating", "caption", "0", "1"])
    vocab_size = BlipTokenizer(vocab_path).vocab_size
    med_cfg_path = str(root / "med.json")
    json.dump({"vocab_size": vocab_size, "hidden_size": 32, "num_hidden_layers": 2,
               "num_attention_heads": 4, "intermediate_size": 64,
               "max_position_embeddings": 64, "encoder_width": 32,
               "add_cross_attention": True}, open(med_cfg_path, "w"))

    vit_cfg = ViTConfig(image_size=IMAGE_SIZE, **VIT_KW)
    med_cfg = MedConfig.from_json(med_cfg_path)
    ckpt = str(root / "retrieval.pth")
    save_torch_ckpt(make_blip_itm_ckpt(vit_cfg, med_cfg, embed_dim=8), ckpt)

    onto = root / "onto"
    onto.mkdir()
    json.dump(["dog", "cat", "bird"], open(onto / "objects.json", "w"))
    json.dump(["red", "blue", "shiny"], open(onto / "attributes.json", "w"))
    json.dump(["beach", "park", "kitchen"], open(onto / "scenes.json", "w"))
    json.dump(["running", "sitting", "eating"], open(onto / "verbs.json", "w"))

    config = dict(
        video_roots=str(videos), video_formats="mp4", train_ann_jsons=ann_path,
        frm_sampling_strategy="uniform", height=None, width=None,
        start_time=None, end_time=None, fps=-1,
        num_frm_visual_tokenization=2,
        blip_model_visual_tokenization=ckpt,
        vit="tiny", vit_config=VIT_KW, image_size=IMAGE_SIZE,
        med_config=med_cfg_path, bert_vocab=vocab_path,
        ontology="custom",
        ontology_paths={k: str(onto / f"{k}.json") for k in
                        ["objects", "attributes", "scenes", "verbs"]},
        topk_visualize=2, prompt_version_visual_tokenization="v1",
        save_frames=False, early_stop_step=-1, videos_per_batch=2, k_test=2,
    )
    return types.SimpleNamespace(root=root, config=config)


def test_blip_mode_cli(workdir):
    import run_visual_tokenization as cli

    out_dir = str(workdir.root / "out")
    args = types.SimpleNamespace(output_dir=out_dir, seed=42, world_size=1,
                                 dist_url="env://", distributed=False,
                                 device="cpu", encoder_version="blip")
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(workdir.config))

    tokens = json.load(open(os.path.join(out_dir, "visual_tokens.json")))
    assert set(tokens.keys()) == {"vid0", "vid1"}
    for vid, obj in tokens.items():
        assert len(obj["frame_tokens"]) == 2
        for ft in obj["frame_tokens"]:
            assert len(ft["objects"]) == 2
            assert set(ft["objects"]) <= {"dog", "cat", "bird"}
        assert len(obj["aggregated_tokens"]["verbs"]) == 2


def test_blip_rerank_scores_structure(workdir):
    """ITM rerank: -100 outside the top-k_test, itm+sim inside (reference
    run_visual_tokenization.py:277-293)."""
    import run_visual_tokenization as cli

    engine = cli.build_blip_engine(dict(workdir.config))
    texts = ["A photo of dog", "A photo of cat", "A photo of bird", "A photo of beach"]
    text_embeds, text_ids, text_atts = engine.embed_texts(texts)
    assert text_ids[0, 0] == engine.tok.enc_token_id
    frames = np.random.RandomState(0).randint(0, 256, (2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8)
    feats, embeds = engine.embed_frames(frames)
    sims = engine.score(embeds, text_embeds)
    assert sims.shape == (2, 4)
    row = engine.rerank(sims[0], feats[0], text_ids, text_atts)
    assert row.shape == (4,)
    assert (row == -100.0).sum() == 2  # k_test=2 -> 2 scored, 2 at -100


def test_trimmed_padding_bitwise_equal(workdir):
    """embed_texts trims the reference's fixed max_length=35 padding to the
    batch's true (rounded) max token count — masked pad positions underflow
    exp() to exactly 0.0, so text embeds AND ITM rerank scores must be
    BITWISE identical to the untrimmed 35-pad contract."""
    import run_visual_tokenization as cli

    engine = cli.build_blip_engine(dict(workdir.config))
    texts = ["A photo of dog", "A photo of cat running", "A photo of beach"]
    text_embeds, text_ids, text_atts = engine.embed_texts(texts)
    assert text_ids.shape[1] < 35  # the trim actually engaged

    # untrimmed 35-pad arrays: embeds use the raw [CLS] ids (as embed_texts
    # does), the rerank ids get the [ENC] substitution
    enc = engine.tok(texts, padding="max_length", truncation=True, max_length=35)
    raw35 = np.asarray(enc.input_ids)
    atts35 = np.asarray(enc.attention_mask)
    emb35 = np.asarray(engine._embed_texts(raw35, atts35))
    np.testing.assert_array_equal(text_embeds, emb35)
    ids35 = raw35.copy()
    ids35[:, 0] = engine.tok.enc_token_id

    frames = np.random.RandomState(3).randint(
        0, 256, (2, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8)
    feats, embeds = engine.embed_frames(frames)
    sims = engine.score(embeds, text_embeds)
    trimmed = engine.rerank_block(sims, feats, text_ids, text_atts)
    full = engine.rerank_block(sims, feats, ids35, atts35)
    np.testing.assert_array_equal(trimmed, full)


def test_rerank_all_matches_blocked_rerank(workdir):
    """rerank_all (scanned multi-block programs, bounded dispatches) must
    produce exactly the per-block rerank_block results row for row —
    including tail-row padding and the -100 outside-top-k fill."""
    import run_visual_tokenization as cli

    engine = cli.build_blip_engine(dict(workdir.config))
    texts = ["A photo of dog", "A photo of cat", "A photo of bird",
             "A photo of beach", "A photo of park"]
    text_embeds, text_ids, text_atts = engine.embed_texts(texts)
    # 5 frames: not a multiple of rows_per_block=2 -> exercises row padding;
    # blocks_per_dispatch=2 over 3 blocks -> exercises dispatch padding
    frames = np.random.RandomState(1).randint(
        0, 256, (5, IMAGE_SIZE, IMAGE_SIZE, 3)).astype(np.uint8)
    feats, embeds = engine.embed_frames(frames)
    sims = engine.score(embeds, text_embeds)

    fast = engine.rerank_all(sims, feats, text_ids, text_atts,
                             rows_per_block=2, blocks_per_dispatch=2)

    R = 2
    blocks = []
    for s in range(0, sims.shape[0], R):
        e = min(sims.shape[0], s + R)
        rows = sims[s:e]
        idx = list(range(s, e)) + [e - 1] * (R - (e - s))
        f = feats[np.asarray(idx, np.int32)]
        if e - s < R:
            rows = np.concatenate([rows, np.repeat(rows[-1:], R - (e - s), axis=0)])
        blocks.append(engine.rerank_block(rows, f, text_ids, text_atts)[: e - s])
    slow = np.concatenate(blocks)
    np.testing.assert_allclose(fast, slow, rtol=0, atol=1e-5)
    assert (fast == -100.0).sum() == 5 * (len(texts) - engine.k_test)


def test_blip_predict_videos_padding_row_independent(workdir):
    """BLIP mode keeps PADDED frame rows through scoring AND the ITM
    rerank (so tail chunks reuse the full chunk's compiled scan shapes
    end-to-end); the pad rows are sliced off only at the final
    score[:n_real], so real rows must be bitwise-unaffected."""
    import run_visual_tokenization as cli
    from vidil_tpu.pipeline.visual_tokenization import (
        get_prefix_prompt_functions,
        load_ontology,
        predict_videos,
    )

    engine = cli.build_blip_engine(dict(workdir.config))
    onto = load_ontology(workdir.config["ontology_paths"])
    fns = get_prefix_prompt_functions("v1")
    rng = np.random.RandomState(3)
    frames = {f"v{i}": rng.randint(0, 256, size=(2, IMAGE_SIZE, IMAGE_SIZE, 3),
                                   dtype=np.uint8) for i in range(2)}
    caps = {k: [f"caption {k}"] for k in frames}
    out_padded = predict_videos(engine, dict(frames), caps, onto, fns,
                                topk_visualize=2, pad_to_videos=5)
    out_plain = predict_videos(engine, dict(frames), caps, onto, fns,
                               topk_visualize=2, pad_to_videos=0)
    assert out_padded == out_plain
    assert sorted(out_padded.keys()) == ["v0", "v1"]


def test_blip_cli_data_parallel_matches(workdir):
    """data_parallel=true (BLIP mode) shards the ITM rerank batch over the
    local 'data' mesh via the per-block path (the scanned block axis must
    NOT be sharded — lax.scan slices it away per step, which would
    replicate each step's work on every chip); visual_tokens.json must be
    byte-identical to the unsharded run."""
    import run_visual_tokenization as cli

    outs = []
    for run, dp in enumerate([False, True]):
        out_dir = str(workdir.root / f"dp{run}")
        args = types.SimpleNamespace(output_dir=out_dir, seed=42, world_size=1,
                                     dist_url="env://", distributed=False,
                                     device="cpu", encoder_version="blip")
        os.makedirs(out_dir, exist_ok=True)
        cli.main(args, dict(workdir.config, data_parallel=dp))
        outs.append(open(os.path.join(out_dir, "visual_tokens.json")).read())
    assert outs[0] == outs[1]
