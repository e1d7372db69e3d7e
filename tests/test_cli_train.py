"""Train CLI smoke tests: tiny configs, 1 epoch, end-to-end through main()."""

import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vidil_tpu.models.testing import make_blip_decoder_ckpt, make_blip_itm_ckpt, save_torch_ckpt
from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

VIT_KW = dict(patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
IMAGE_SIZE = 32

pytestmark = pytest.mark.slow  # every test here spawns full CLI mains (51-159s each, /tmp/pytest_durations.log)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("train_cli")
    videos = root / "videos"
    videos.mkdir()
    for vi in range(4):
        w = cv2.VideoWriter(str(videos / f"video{vi}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(20):
            frame = np.full((48, 64, 3), (i * 9 + vi * 30) % 255, np.uint8)
            w.write(frame)
        w.release()

    def write_jsonl(path, n_per_video=2):
        with open(path, "w") as f:
            k = 0
            for vi in range(4):
                for j in range(n_per_video):
                    f.write(json.dumps({"caption": f"a test caption {vi} {j}",
                                        "clip_name": f"video{vi}", "sen_id": k}) + "\n")
                    k += 1

    write_jsonl(root / "train.jsonl")
    write_jsonl(root / "val.jsonl", 1)
    write_jsonl(root / "test.jsonl", 1)

    vocab_path = str(root / "vocab.txt")
    write_test_vocab(vocab_path, ["a", "test", "caption", "video", "of",
                                  "0", "1", "2", "3"])
    vocab_size = BlipTokenizer(vocab_path).vocab_size

    med_cfg_path = str(root / "med_config.json")
    json.dump({"vocab_size": vocab_size, "hidden_size": 32, "num_hidden_layers": 2,
               "num_attention_heads": 4, "intermediate_size": 64,
               "max_position_embeddings": 64, "encoder_width": 32,
               "add_cross_attention": True}, open(med_cfg_path, "w"))

    vit_cfg = ViTConfig(image_size=IMAGE_SIZE, **VIT_KW)
    med_cfg = MedConfig.from_json(med_cfg_path)
    ckpt = str(root / "decoder.pth")
    save_torch_ckpt(make_blip_decoder_ckpt(vit_cfg, med_cfg), ckpt)
    fil_ckpt = str(root / "filterer.pth")
    save_torch_ckpt(make_blip_itm_ckpt(vit_cfg, med_cfg), fil_ckpt)

    return types.SimpleNamespace(root=root, videos=videos, vocab=vocab_path,
                                 med=med_cfg_path, ckpt=ckpt, fil_ckpt=fil_ckpt)


def test_train_caption_cli(workdir):
    import train_caption_video as cli

    root = workdir.root
    config = dict(
        video_root=str(workdir.videos),
        train_ann_jsonl=str(root / "train.jsonl"),
        val_ann_jsonl=str(root / "val.jsonl"),
        test_ann_jsonl=str(root / "test.jsonl"),
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="concat_frame",
        pretrained=workdir.ckpt, bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        train_batch_size=2, test_batch_size=2, init_lr=1e-4,
        image_size=IMAGE_SIZE, max_length=12, min_length=2, num_beams=2,
        prompt="a video of ", weight_decay=0.05, min_lr=0, max_epoch=1,
    )
    out_dir = str(root / "cap_out")
    result_dir = os.path.join(out_dir, "result")
    os.makedirs(result_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, result_dir=result_dir,
                                 evaluate=False, seed=42, world_size=1,
                                 dist_url="env://", distributed=False, device="cpu")
    cli.main(args, config)

    assert os.path.exists(os.path.join(out_dir, "checkpoint_best.npz"))
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert "test_CIDEr" in log[-1]
    results = json.load(open(os.path.join(result_dir, "test_epoch0.json")))
    assert {r["video_id"] for r in results} == {f"video{i}" for i in range(4)}

    # checkpoint roundtrip
    from vidil_tpu.utils.checkpoint import load_checkpoint

    params, meta = load_checkpoint(os.path.join(out_dir, "checkpoint_best.npz"))
    assert meta["epoch"] == 0
    assert "visual_encoder" in params and "text_decoder" in params


def test_train_retrieval_cli(workdir):
    import train_retrieval_video as cli

    root = workdir.root
    config = dict(
        dataset="msrvtt",
        train_video_root=str(workdir.videos),
        train_ann_jsonl=str(root / "train.jsonl"),
        eval_video_root=str(workdir.videos),
        val_ann_jsonl=str(root / "val.jsonl"),
        test_ann_jsonl=str(root / "test.jsonl"),
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="concat_frame",
        pretrained="", bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        batch_size_train=4, batch_size_test=2, init_lr=1e-5,
        image_size=IMAGE_SIZE, queue_size=16, alpha=0.4, k_test=3,
        negative_all_rank=True, weight_decay=0.05, min_lr=0, max_epoch=1,
    )
    out_dir = str(root / "ret_out")
    os.makedirs(out_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, evaluate=False, seed=42,
                                 world_size=1, dist_url="env://",
                                 distributed=False, device="cpu")
    cli.main(args, config)
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert "val_r_mean" in log[-1] and "test_r_mean" in log[-1]
    assert 0 <= log[-1]["val_r_mean"] <= 100


def test_train_caption_single_frame(workdir):
    """'single_frame' representation: ITM-selected best frame per caption
    (reference: train_caption_video.py:30-36,137-143)."""
    import train_caption_video as cli

    root = workdir.root
    config = dict(
        video_root=str(workdir.videos),
        train_ann_jsonl=str(root / "train.jsonl"),
        val_ann_jsonl=str(root / "val.jsonl"),
        test_ann_jsonl=str(root / "test.jsonl"),
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="single_frame",
        pretrained=workdir.ckpt, filterer_model_ckpt=workdir.fil_ckpt,
        bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        train_batch_size=2, test_batch_size=2, init_lr=1e-4,
        image_size=IMAGE_SIZE, max_length=12, min_length=2, num_beams=2,
        prompt="a video of ", weight_decay=0.05, min_lr=0, max_epoch=1,
        skip_val=True,
    )
    out_dir = str(root / "cap_sf_out")
    result_dir = os.path.join(out_dir, "result")
    os.makedirs(result_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, result_dir=result_dir,
                                 evaluate=False, seed=42, world_size=1,
                                 dist_url="env://", distributed=False, device="cpu")
    cli.main(args, config)
    assert os.path.exists(os.path.join(out_dir, "checkpoint_best.npz"))
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert "test_CIDEr" in log[-1]

def test_train_retrieval_resume(workdir):
    """checkpoint_last is a full train state; resuming from it skips the
    completed epochs and continues (optimizer moments + queues restored)."""
    import train_retrieval_video as cli

    root = workdir.root
    out_dir = str(root / "ret_out")
    last = os.path.join(out_dir, "checkpoint_last.npz")
    assert os.path.exists(last)  # written by test_train_retrieval_cli

    config = dict(
        dataset="msrvtt",
        train_video_root=str(workdir.videos),
        train_ann_jsonl=str(root / "train.jsonl"),
        eval_video_root=str(workdir.videos),
        val_ann_jsonl=str(root / "val.jsonl"),
        test_ann_jsonl=str(root / "test.jsonl"),
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="concat_frame",
        pretrained="", bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        batch_size_train=4, batch_size_test=2, init_lr=1e-5,
        image_size=IMAGE_SIZE, queue_size=16, alpha=0.4, k_test=3,
        negative_all_rank=True, weight_decay=0.05, min_lr=0, max_epoch=2,
        resume=last,
    )
    out_dir2 = str(root / "ret_out_resume")
    os.makedirs(out_dir2, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir2, evaluate=False, seed=42,
                                 world_size=1, dist_url="env://",
                                 distributed=False, device="cpu")
    cli.main(args, config)
    log = [json.loads(l) for l in open(os.path.join(out_dir2, "log.txt"))]
    # only epoch 1 ran (epoch 0 restored from the checkpoint)
    assert [l["epoch"] for l in log] == [1]

def test_train_retrieval_spmd_mesh(workdir):
    """data_parallel/model_parallel config keys train over a local mesh."""
    import train_retrieval_video as cli

    root = workdir.root
    config = dict(
        dataset="msrvtt",
        train_video_root=str(workdir.videos),
        train_ann_jsonl=str(root / "train.jsonl"),
        eval_video_root=str(workdir.videos),
        val_ann_jsonl=str(root / "val.jsonl"),
        test_ann_jsonl=str(root / "test.jsonl"),
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="concat_frame",
        pretrained="", bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        batch_size_train=4, batch_size_test=2, init_lr=1e-5,
        image_size=IMAGE_SIZE, queue_size=16, alpha=0.4, k_test=3,
        negative_all_rank=True, weight_decay=0.05, min_lr=0, max_epoch=1,
        data_parallel=2, model_parallel=2,
        optimizer_sharding="zero1",  # ZeRO-1 moments over 'data'
    )
    out_dir = str(root / "ret_out_spmd")
    os.makedirs(out_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, evaluate=False, seed=42,
                                 world_size=1, dist_url="env://",
                                 distributed=False, device="cpu")
    cli.main(args, config)
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert "val_r_mean" in log[-1] and 0 <= log[-1]["val_r_mean"] <= 100

@pytest.fixture(scope="module")
def qa_jsonl(workdir):
    root = workdir.root
    path = root / "qa.jsonl"
    with open(path, "w") as f:
        k = 0
        for vi in range(4):
            f.write(json.dumps({"video_id": f"video{vi}", "question": f"what is video {vi}?",
                                "answer": "a test", "question_id": k}) + "\n")
            k += 1
    return str(path)


def test_train_vqa_cli_spmd(workdir, qa_jsonl):
    """VQA trainer end-to-end with an SPMD mesh (ragged answers replicated,
    dp-divisible tensors sharded)."""
    import train_vqa_video as cli

    root = workdir.root
    config = dict(
        video_root=str(workdir.videos), video_fmt=".mp4",
        train_ann_jsonl=qa_jsonl, test_ann_jsonl=qa_jsonl,
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        pretrained="", bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        batch_size_train=4, batch_size_test=2, init_lr=1e-5,
        image_size=IMAGE_SIZE, weight_decay=0.05, min_lr=0, max_epoch=1,
        inference="generate", data_parallel=2, model_parallel=2,
    )
    out_dir = str(root / "vqa_out")
    result_dir = os.path.join(out_dir, "result")
    os.makedirs(result_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, result_dir=result_dir,
                                 evaluate=False, seed=42, world_size=1,
                                 dist_url="env://", distributed=False, device="cpu")
    cli.main(args, config)
    results = json.load(open(os.path.join(result_dir, "vqa_result_epoch0.json")))
    assert {r["question_id"] for r in results} == {0, 1, 2, 3}
    assert all(isinstance(r["answer"], str) for r in results)
    assert os.path.exists(os.path.join(out_dir, "checkpoint_last.npz"))


def test_pretrain_cli_spmd(workdir):
    """Pretrain trainer (ITA+ITM+LM, momentum, queue) end-to-end on a mesh."""
    import pretrain_video as cli

    root = workdir.root
    config = dict(
        dataset="pretrain",
        train_video_root=str(workdir.videos),
        train_ann_jsonl=str(root / "train.jsonl"),
        num_frm_train=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="concat_frame",
        bert_vocab=workdir.vocab,
        vit="tiny", vit_config=VIT_KW, med_config=workdir.med,
        batch_size=4, init_lr=1e-5, warmup_lr=1e-6, warmup_steps=1,
        lr_decay_rate=0.9, queue_size=16, alpha=0.4,
        image_size=IMAGE_SIZE, weight_decay=0.05, min_lr=1e-6, max_epoch=1,
        data_parallel=2, model_parallel=2,
    )
    out_dir = str(root / "pretrain_out")
    os.makedirs(out_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, evaluate=False, seed=42,
                                 world_size=1, dist_url="env://",
                                 distributed=False, device="cpu")
    cli.main(args, config)
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert all(np.isfinite(log[-1][k]) for k in ("loss_ita", "loss_itm", "loss_lm"))
    assert os.path.exists(os.path.join(out_dir, "checkpoint_00.npz"))
    assert os.path.exists(os.path.join(out_dir, "checkpoint_last.npz"))
