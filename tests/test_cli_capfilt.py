"""Full-CLI CapFilt test: fake torch checkpoints + synthetic videos ->
run_video_CapFilt.main -> merged JSON outputs with the reference contract."""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidil_tpu.models.testing import make_blip_decoder_ckpt, make_blip_itm_ckpt, save_torch_ckpt
from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.tokenizer import write_test_vocab

VIT_KW = dict(patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
IMAGE_SIZE = 32


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    import cv2
    import yaml

    root = tmp_path_factory.mktemp("capfilt_cli")
    videos = root / "videos"
    videos.mkdir()
    ann = {}
    for vi in range(3):
        path = str(videos / f"video{vi}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(30):
            frame = np.zeros((48, 64, 3), np.uint8)
            frame[:, :, vi % 3] = (i * 7 + vi * 50) % 255
            w.write(frame)
        w.release()
        ann[f"video{vi}"] = [f"original caption {vi}. second sentence {vi}"]
    ann["missing_video"] = ["should be skipped"]
    ann_path = str(root / "ann.json")
    json.dump(ann, open(ann_path, "w"))

    vocab_path = str(root / "vocab.txt")
    write_test_vocab(vocab_path, [
        "a", "picture", "of", "original", "caption", "second", "sentence",
        "video", "0", "1", "2", ".", "man", "dog", "cat",
    ])
    from vidil_tpu.tokenizer import BlipTokenizer

    vocab_size = BlipTokenizer(vocab_path).vocab_size

    med_cfg_path = str(root / "med_config.json")
    json.dump({
        "vocab_size": vocab_size, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "encoder_width": 32, "add_cross_attention": True,
    }, open(med_cfg_path, "w"))

    vit_cfg = ViTConfig(image_size=IMAGE_SIZE, **VIT_KW)
    med_cfg = MedConfig.from_json(med_cfg_path)
    cap_ckpt = str(root / "captioner.pth")
    fil_ckpt = str(root / "filterer.pth")
    save_torch_ckpt(make_blip_decoder_ckpt(vit_cfg, med_cfg), cap_ckpt)
    save_torch_ckpt(make_blip_itm_ckpt(vit_cfg, med_cfg), fil_ckpt)

    config = dict(
        video_roots=str(videos), video_formats="mp4", train_ann_jsons=ann_path,
        frm_sampling_strategy="uniform", height=None, width=None,
        start_time=None, end_time=None, fps=-1,
        caption=True, filter=True, filter_generated_only=True,
        keep_original_caption=False, filter_mode="max_filter",
        generation_mode="beam", threshold=-1.0, num_frm_CapFilt=4,
        do_sentence_tokenization=True,
        vit="tiny", vit_config=VIT_KW, image_size=IMAGE_SIZE,
        med_config=med_cfg_path, bert_vocab=vocab_path, videos_per_batch=2,
        caption_model_ckpt=cap_ckpt, filterer_model_ckpt=fil_ckpt,
    )
    config_path = str(root / "config.yaml")
    yaml.safe_dump(config, open(config_path, "w"))
    return types.SimpleNamespace(root=root, config=config, config_path=config_path, ann=ann)


def test_cli_end_to_end(workdir):
    import run_video_CapFilt as cli

    out_dir = str(workdir.root / "out")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(workdir.config))

    capfilt = json.load(open(os.path.join(out_dir, "video_text_CapFilt.json")))
    cap = json.load(open(os.path.join(out_dir, "video_text_Cap.json")))
    # 3 real videos; missing_video skipped
    assert set(cap.keys()) == {"video0", "video1", "video2"}
    # threshold=-1 keeps every generated caption -> all videos present
    assert set(capfilt.keys()) == set(cap.keys())
    for vid, texts in capfilt.items():
        assert isinstance(texts, list) and len(texts) >= 1
        assert all(isinstance(t, str) for t in texts)
    # tmp dir removed after merge (reference behavior)
    assert not os.path.exists(os.path.join(out_dir, "tmp"))
    # unfiltered = generated (keep_original_caption=False)
    assert capfilt["video0"] == cap["video0"]


def test_cli_transfer_format_yuv420(workdir):
    """transfer_format: yuv420 ships half the bytes to the device; output
    contract (file tree, key sets) is unchanged. Caption strings may differ
    from the RGB run only by the BT.601 roundtrip on chroma."""
    import run_video_CapFilt as cli

    out_dir = str(workdir.root / "out_yuv")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(workdir.config, transfer_format="yuv420"))

    capfilt = json.load(open(os.path.join(out_dir, "video_text_CapFilt.json")))
    cap = json.load(open(os.path.join(out_dir, "video_text_Cap.json")))
    assert set(cap.keys()) == {"video0", "video1", "video2"}
    assert set(capfilt.keys()) == set(cap.keys())
    for texts in capfilt.values():
        assert texts and all(isinstance(t, str) for t in texts)
    assert not os.path.exists(os.path.join(out_dir, "tmp"))


def test_cli_data_parallel_matches(workdir):
    """data_parallel=true shards batches over the local device mesh and
    produces byte-identical output files."""
    import run_video_CapFilt as cli

    out_dir = str(workdir.root / "out_dp")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(workdir.config, data_parallel=True))

    ref_dir = str(workdir.root / "out")
    for name in ("video_text_CapFilt.json", "video_text_Cap.json"):
        got = json.load(open(os.path.join(out_dir, name)))
        ref = json.load(open(os.path.join(ref_dir, name)))
        assert got == ref


def test_cli_youcook2_yaml_end_to_end(workdir):
    """Drive the ACTUAL configs/pipeline_config/pipeline_config_youcook2_train.yaml
    (value-parity with the reference yaml: threshold 0.5, headtail sampling,
    max_filter, filter_generated_only) end-to-end, overriding only the
    offline-unavailable model keys (vit/med/ckpts -> the tiny fixtures).
    Proves the reference youcook2 pipeline config runs zero-setup."""
    import yaml

    import run_video_CapFilt as cli

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    config = yaml.safe_load(open(os.path.join(
        repo, "configs", "pipeline_config", "pipeline_config_youcook2_train.yaml")))
    assert config["threshold"] == 0.5 and config["frm_sampling_strategy"] == "headtail"
    # offline model overrides; every capfilt *behavior* key stays the yaml's.
    config.update(
        video_roots=workdir.config["video_roots"],
        train_ann_jsons=workdir.config["train_ann_jsons"],
        vit="tiny", vit_config=VIT_KW, image_size=IMAGE_SIZE,
        med_config=workdir.config["med_config"],
        bert_vocab=workdir.config["bert_vocab"],
        caption_model_ckpt=workdir.config["caption_model_ckpt"],
        filterer_model_ckpt=workdir.config["filterer_model_ckpt"],
        videos_per_batch=2,
    )

    out_dir = str(workdir.root / "out_yc2")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, config)

    cap = json.load(open(os.path.join(out_dir, "video_text_Cap.json")))
    capfilt = json.load(open(os.path.join(out_dir, "video_text_CapFilt.json")))
    assert set(cap.keys()) == {"video0", "video1", "video2"}
    # threshold=0.5 on an untrained tiny ITM may drop any caption; the
    # filtered dict must stay a subset with string entries.
    assert set(capfilt.keys()) <= set(cap.keys())
    for texts in capfilt.values():
        assert all(isinstance(t, str) for t in texts)
    assert not os.path.exists(os.path.join(out_dir, "tmp"))


def test_cli_synthetic_weights(workdir):
    """synthetic_weights: true builds the engine with on-device-synthesized
    full-shape params (no .pth load) and runs the identical pipeline —
    the benchmarking affordance behind benchmarks/capfilt_from_disk.jsonl."""
    import run_video_CapFilt as cli

    out_dir = str(workdir.root / "out_synth")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cfg = dict(workdir.config, synthetic_weights=True)
    del cfg["caption_model_ckpt"], cfg["filterer_model_ckpt"]  # must not be read
    cli.main(args, cfg)

    cap = json.load(open(os.path.join(out_dir, "video_text_Cap.json")))
    capfilt = json.load(open(os.path.join(out_dir, "video_text_CapFilt.json")))
    assert set(cap.keys()) == {"video0", "video1", "video2"}
    assert set(capfilt.keys()) == set(cap.keys())


def test_cli_resize_on_device(workdir):
    """resize_on_device: frames ship at native decode resolution (48x64
    here) and the engine bicubic-resizes to image_size on device. Output
    contract (file tree, key sets) unchanged; caption strings may differ
    from the PIL run only by the resize-kernel numerics."""
    import run_video_CapFilt as cli

    out_dir = str(workdir.root / "out_devresize")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(workdir.config, resize_on_device=True,
                        transfer_format="yuv420"))

    capfilt = json.load(open(os.path.join(out_dir, "video_text_CapFilt.json")))
    cap = json.load(open(os.path.join(out_dir, "video_text_Cap.json")))
    assert set(cap.keys()) == {"video0", "video1", "video2"}
    assert set(capfilt.keys()) == set(cap.keys())
    for texts in capfilt.values():
        assert texts and all(isinstance(t, str) for t in texts)
    assert not os.path.exists(os.path.join(out_dir, "tmp"))


def test_cli_resize_on_device_offspec_fallback(workdir, capsys):
    """Declared native_height/width different from the actual decode size:
    every video takes the off-spec host-resample path (one PIL resize to
    the declared native size, then the device resize) and the run still
    completes with the full output contract."""
    import run_video_CapFilt as cli

    out_dir = str(workdir.root / "out_devresize_offspec")
    args = types.SimpleNamespace(
        output_dir=out_dir, seed=42, world_size=1, dist_url="env://",
        distributed=False, device="cpu",
    )
    os.makedirs(out_dir, exist_ok=True)
    cli.main(args, dict(workdir.config, resize_on_device=True,
                        native_height=24, native_width=40))
    captured = capsys.readouterr().out
    assert "host-resampling off-spec videos to the chunk-native 24x40" in captured

    cap = json.load(open(os.path.join(out_dir, "video_text_Cap.json")))
    assert set(cap.keys()) == {"video0", "video1", "video2"}
