"""Visual tokenization tests: ontology semantics, aggregation, full CLI."""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidil_tpu.pipeline.visual_tokenization import (
    aggregate_frame_tokens,
    get_prefix_prompt_functions,
    load_ontology,
)


def test_prompt_functions():
    fns = get_prefix_prompt_functions("v1")
    assert fns["objects"]("dog") == "A photo of dog"
    fns0 = get_prefix_prompt_functions("v0")
    assert fns0["scenes"]("beach") == "beach"


def test_load_ontology_replicates_reference_quirk(tmp_path):
    # the reference removes attribute terms found in objects while iterating
    # the live list, skipping the successor of each removed element
    objects = ["red", "blue", "dog"]
    attributes = ["red", "blue", "shiny", "video"]
    for name, data in [("o.json", objects), ("a.json", attributes),
                       ("s.json", ["beach"]), ("v.json", {"running": 1})]:
        json.dump(data, open(tmp_path / name, "w"))
    out = load_ontology({
        "objects": str(tmp_path / "o.json"), "attributes": str(tmp_path / "a.json"),
        "scenes": str(tmp_path / "s.json"), "verbs": str(tmp_path / "v.json"),
    })
    # reference loop: removes 'red', skips 'blue' (iterator advance), keeps it
    assert out["attributes"] == ["blue", "shiny"]  # 'video' in OMIT_KEYWORDS
    assert out["objects"] == ["red", "blue", "dog"]
    assert out["verbs"] == ["running"]


def test_aggregate_frame_tokens():
    frame_tokens = [
        {"objects": ["dog", "cat"], "attributes": [], "scenes": ["beach", "park"], "verbs": ["run", "sit"]},
        {"objects": ["dog", "bird"], "attributes": [], "scenes": ["park", "beach"], "verbs": ["run", "eat"]},
    ]
    agg = aggregate_frame_tokens(frame_tokens)
    assert agg["objects"][0] == "dog"  # count 2 beats 1
    assert len(agg["objects"]) == 2
    assert set(agg["scenes"]) == {"beach", "park"}
    assert agg["attributes"] == []


@pytest.fixture(scope="module")
def clip_workdir(tmp_path_factory):
    import cv2
    import torch
    import yaml
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel, CLIPTextConfig, CLIPVisionConfig

    from vidil_tpu.tokenizer import write_test_clip_bpe

    root = tmp_path_factory.mktemp("vistok_cli")
    videos = root / "videos"
    videos.mkdir()
    ann = {}
    for vi in range(3):
        path = str(videos / f"vid{vi}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(24):
            frame = np.zeros((48, 64, 3), np.uint8)
            frame[:, :, vi % 3] = (i * 9 + vi * 60) % 255
            w.write(frame)
        w.release()
        ann[f"vid{vi}"] = [f"caption for video {vi}"]
    ann_path = str(root / "ann.json")
    json.dump(ann, open(ann_path, "w"))

    # tiny CLIP
    words = ["a", "photo", "of", "dog", "cat", "bird", "red", "blue", "shiny",
             "beach", "park", "kitchen", "running", "sitting", "eating"]
    vocab_path, merges_path = str(root / "vocab.json"), str(root / "merges.txt")
    write_test_clip_bpe(vocab_path, merges_path, words)
    vocab_size = len(json.load(open(vocab_path)))

    text_cfg = CLIPTextConfig(vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              max_position_embeddings=16, hidden_act="quick_gelu",
                              bos_token_id=vocab_size - 2, eos_token_id=vocab_size - 1)
    vision_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                                  num_attention_heads=4, image_size=28, patch_size=14,
                                  hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPModel(HFCLIPConfig.from_text_vision_configs(text_cfg, vision_cfg, projection_dim=24))
    ckpt_path = str(root / "clip.pth")
    torch.save(hf.state_dict(), ckpt_path)

    # tiny ontology
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
        num_frm_visual_tokenization=4,
        clip_config=dict(image_size=28, patch_size=14, vision_hidden_size=32,
                         vision_layers=2, vision_heads=4, vision_intermediate_size=64,
                         vocab_size=vocab_size, text_hidden_size=32, text_layers=2,
                         text_heads=4, text_intermediate_size=64, max_text_len=16,
                         projection_dim=24),
        clip_ckpt=ckpt_path, clip_vocab=vocab_path, clip_merges=merges_path,
        ontology="custom",
        ontology_paths={
            "objects": str(onto / "objects.json"), "attributes": str(onto / "attributes.json"),
            "scenes": str(onto / "scenes.json"), "verbs": str(onto / "verbs.json"),
        },
        topk_visualize=2, prompt_version_visual_tokenization="v1",
        save_frames=False, early_stop_step=-1, videos_per_batch=2,
    )
    return types.SimpleNamespace(root=root, config=config, ann=ann)


def test_cli_clip_end_to_end(clip_workdir):
    import run_visual_tokenization as cli

    out_dir = str(clip_workdir.root / "out")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu", encoder_version="clip",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(clip_workdir.config))

    tokens = json.load(open(os.path.join(out_dir, "visual_tokens.json")))
    assert set(tokens.keys()) == {"vid0", "vid1", "vid2"}
    for vid, obj in tokens.items():
        assert obj["caption"] == clip_workdir.ann[vid]
        assert len(obj["frame_tokens"]) == 4
        for ft in obj["frame_tokens"]:
            for key, vocab in [("objects", {"dog", "cat", "bird"}),
                               ("attributes", {"red", "blue", "shiny"}),
                               ("scenes", {"beach", "park", "kitchen"}),
                               ("verbs", {"running", "sitting", "eating"})]:
                assert len(ft[key]) == 2
                assert set(ft[key]) <= vocab
        agg = obj["aggregated_tokens"]
        assert set(agg.keys()) == {"objects", "attributes", "scenes", "verbs"}
        assert len(agg["objects"]) == 2
    assert not os.path.exists(os.path.join(out_dir, "tmp"))


def test_cli_deterministic(clip_workdir):
    """Same inputs -> byte-identical visual_tokens.json (required for the
    exact-match parity gate)."""
    import run_visual_tokenization as cli

    outs = []
    for run in range(2):
        out_dir = str(clip_workdir.root / f"det{run}")
        args = types.SimpleNamespace(output_dir=out_dir, seed=42, world_size=1,
                                     dist_url="env://", distributed=False,
                                     device="cpu", encoder_version="clip")
        os.makedirs(out_dir, exist_ok=True)
        cli.main(args, dict(clip_workdir.config))
        outs.append(open(os.path.join(out_dir, "visual_tokens.json")).read())
    assert outs[0] == outs[1]


def test_cli_data_parallel_matches(clip_workdir):
    """data_parallel=true shards frame/text batches over the local device
    mesh; visual_tokens.json must be byte-identical."""
    import run_visual_tokenization as cli

    outs = []
    for run, dp in enumerate([False, True]):
        out_dir = str(clip_workdir.root / f"dp{run}")
        args = types.SimpleNamespace(output_dir=out_dir, seed=42, world_size=1,
                                     dist_url="env://", distributed=False,
                                     device="cpu", encoder_version="clip")
        os.makedirs(out_dir, exist_ok=True)
        cli.main(args, dict(clip_workdir.config, data_parallel=dp))
        outs.append(open(os.path.join(out_dir, "visual_tokens.json")).read())
    assert outs[0] == outs[1]


def test_vendored_vg_ontology_counts():
    """The repo vendors the reference's ontology term lists (data assets,
    reference run_visual_tokenization.py:369-381); post-filter counts are
    pinned so a corrupted/missing vendored file fails loudly."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from vidil_tpu.pipeline.visual_tokenization import ontology_paths

    vg = load_ontology(ontology_paths("vg", os.path.join(repo, "visual_token_ontology")))
    assert {k: len(v) for k, v in vg.items()} == {
        "objects": 19958, "attributes": 15026, "scenes": 365, "verbs": 7410}
    tc = load_ontology(ontology_paths("vg_tencent", os.path.join(repo, "visual_token_ontology")))
    assert {k: len(v) for k, v in tc.items()} == {
        "objects": 11163, "attributes": 15157, "scenes": 365, "verbs": 7410}


def test_vendored_youcook2_ontology_counts():
    """The youcook2 ontology term lists are vendored byte-identical from the
    reference's visual_token_ontology/youcook2/. NOTE: the reference CLI has
    no 'youcook2' branch in its ontology loader (run_visual_tokenization.py:
    369-381 only handles vg/vg_tencent; the youcook2 configs select
    ontology: 'vg' with 'youcook2' commented out), so these are raw data
    assets — pin their raw lengths so corruption fails loudly."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(repo, "visual_token_ontology", "youcook2")
    counts = {f: len(json.load(open(os.path.join(root, f + ".json"))))
              for f in ["cooking_vocabulary_nouns", "cooking_vocabulary_verbs",
                        "openimage_relation_triples",
                        "vg_srl_selected_object_synsets_keys_remove_similar0.9"]}
    assert counts == {
        "cooking_vocabulary_nouns": 1208,
        "cooking_vocabulary_verbs": 504,
        "openimage_relation_triples": 1466,
        "vg_srl_selected_object_synsets_keys_remove_similar0.9": 7414,
    }


def test_cli_youcook2_yaml_end_to_end(clip_workdir, monkeypatch):
    """Drive the ACTUAL configs/pipeline_config/pipeline_config_youcook2_train.yaml
    (value-parity with the reference yaml) end-to-end, overriding only the
    offline-unavailable keys (video/ann paths, checkpoints -> the tiny CLIP).
    Proves every youcook2 config key is accepted and the vg ontology it
    selects runs zero-setup."""
    import yaml

    import run_visual_tokenization as cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = yaml.safe_load(open(os.path.join(
        repo, "configs", "pipeline_config", "pipeline_config_youcook2_train.yaml")))
    assert config["ontology"] == "vg" and config["frm_sampling_strategy"] == "headtail"
    # offline overrides: tiny CLIP + local synthetic videos; everything else
    # (sampling strategy, ontology, topk, prompt version) is the yaml's own.
    for k in ("clip_config", "clip_ckpt", "clip_vocab", "clip_merges"):
        config[k] = clip_workdir.config[k]
    ann = {"vid0": clip_workdir.ann["vid0"]}
    ann_path = str(clip_workdir.root / "ann_yc2.json")
    json.dump(ann, open(ann_path, "w"))
    config["train_ann_jsons"] = ann_path
    config["video_roots"] = str(clip_workdir.root / "videos")
    config["ontology_root"] = os.path.join(repo, "visual_token_ontology")
    config["videos_per_batch"] = 1
    config["num_frm_visual_tokenization"] = 4

    out_dir = str(clip_workdir.root / "out_yc2")
    args = types.SimpleNamespace(output_dir=out_dir, seed=42, world_size=1,
                                 dist_url="env://", distributed=False,
                                 device="cpu", encoder_version="clip")
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, config)

    tokens = json.load(open(os.path.join(out_dir, "visual_tokens.json")))
    assert set(tokens.keys()) == {"vid0"}
    for ft in tokens["vid0"]["frame_tokens"]:
        for key in ("objects", "attributes", "scenes", "verbs"):
            assert len(ft[key]) == config["topk_visualize"]


@pytest.mark.slow
def test_cli_vg_ontology_end_to_end(clip_workdir, monkeypatch):
    """ontology: vg runs out of the box on the vendored real term lists —
    including from a non-repo cwd (repo-root fallback for ontology_root)."""
    import run_visual_tokenization as cli

    out_dir = str(clip_workdir.root / "out_vg")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu", encoder_version="clip",
    )
    os.makedirs(out_dir, exist_ok=True)
    monkeypatch.chdir(clip_workdir.root)
    config = {k: v for k, v in clip_workdir.config.items() if k != "ontology_paths"}
    config["ontology"] = "vg"
    # one video is plenty: the point is embedding all 42,759 real terms
    ann = {"vid0": clip_workdir.ann["vid0"]}
    ann_path = str(clip_workdir.root / "ann_vg.json")
    json.dump(ann, open(ann_path, "w"))
    config["train_ann_jsons"] = ann_path
    cli.main(args, config)

    tokens = json.load(open(os.path.join(out_dir, "visual_tokens.json")))
    assert set(tokens.keys()) == {"vid0"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from vidil_tpu.pipeline.visual_tokenization import ontology_paths

    vg = load_ontology(ontology_paths("vg", os.path.join(repo, "visual_token_ontology")))
    for ft in tokens["vid0"]["frame_tokens"]:
        for key in ("objects", "attributes", "scenes", "verbs"):
            assert len(ft[key]) == 2
            assert all(t in vg[key] for t in ft[key]), (key, ft[key])


def test_clip_preprocess_matches_hf_processor():
    """clip_preprocess_pil must match HF CLIPImageProcessor (shortest-side
    bicubic resize + center crop + CLIP stats) — visual-token exact-match
    depends on it."""
    from transformers import CLIPImageProcessor

    from vidil_tpu.ops.image import CLIP_MEAN, CLIP_STD
    from vidil_tpu.pipeline.visual_tokenization import clip_preprocess_pil

    proc = CLIPImageProcessor()
    rng = np.random.RandomState(0)
    for shape in [(300, 480), (480, 300), (224, 224), (100, 90)]:
        frames = rng.randint(0, 256, size=(2, *shape, 3)).astype(np.uint8)
        ref = proc(images=[f for f in frames], return_tensors="np")["pixel_values"]
        got_u8 = clip_preprocess_pil(frames, 224)
        got = ((got_u8.astype(np.float32) / 255.0 - np.asarray(CLIP_MEAN))
               / np.asarray(CLIP_STD)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_embed_texts_blocked_scan_matches(monkeypatch, clip_workdir):
    """The one-program scanned block path must equal per-block calls."""
    import run_visual_tokenization as cli
    from vidil_tpu.pipeline import visual_tokenization as vt

    engine = cli.build_clip_engine(dict(clip_workdir.config))
    texts = [f"a photo of dog {i}" for i in range(10)]
    ref = engine.embed_texts(texts)  # single-block path (10 <= 512)
    monkeypatch.setattr(vt, "EMBEDDING_BATCH_LIMIT_TEXT", 4)
    got = engine.embed_texts(texts)  # 3 blocks of 4 (last padded), scanned
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_clip_kmeans_selector(clip_workdir):
    """clip-kmeans frame selection (reference
    data/video_pretrain_dataset.py:189-216): embeds every 2nd frame with
    the CLIP vision pooler, clusters into num_frm groups, returns one
    sorted index per cluster; deterministic under a fixed np.random seed."""
    from run_visual_tokenization import build_clip_engine
    from vidil_tpu.data.video_reader import VideoReader
    from vidil_tpu.pipeline.visual_tokenization import make_clip_kmeans_selector

    engine = build_clip_engine(clip_workdir.config)
    selector = make_clip_kmeans_selector(engine, downsample_ratio=2)
    vr = VideoReader(str(clip_workdir.root / "videos" / "vid0.mp4"))
    num_frm = 3
    np.random.seed(11)
    idx = selector(vr, num_frm)
    assert len(idx) == num_frm
    assert idx == sorted(idx)
    assert all(0 <= i < len(vr) for i in idx)
    assert all(i % 2 == 0 for i in idx)  # drawn from the downsampled grid
    np.random.seed(11)
    assert selector(vr, num_frm) == idx


def test_predict_videos_padding_row_independent(clip_workdir):
    """pad_to_videos pads tail chunks with copies of the last video so the
    full chunk's compiled program is reused; real rows must be unaffected
    by the padding (row-independent per-frame forward). On CPU the padded
    and unpadded programs produce bitwise-equal real-row outputs, so the
    whole result dict must match exactly."""
    import run_visual_tokenization as cli
    from vidil_tpu.pipeline.visual_tokenization import (
        get_prefix_prompt_functions,
        load_ontology,
        predict_videos,
    )

    engine = cli.build_clip_engine(dict(clip_workdir.config))
    onto = load_ontology(clip_workdir.config["ontology_paths"])
    fns = get_prefix_prompt_functions("v1")
    rng = np.random.RandomState(7)
    frames = {f"v{i}": rng.randint(0, 256, size=(4, 28, 28, 3), dtype=np.uint8)
              for i in range(2)}
    caps = {k: [f"caption {k}"] for k in frames}
    out_padded = predict_videos(engine, dict(frames), caps, onto, fns,
                                topk_visualize=2, pad_to_videos=5)
    out_plain = predict_videos(engine, dict(frames), caps, onto, fns,
                               topk_visualize=2, pad_to_videos=0)
    assert out_padded == out_plain
    assert sorted(out_padded.keys()) == ["v0", "v1"]
