"""Data layer tests: text cleanups, transforms, datasets, prefetch loader."""

import json
import os

import numpy as np
import pytest

from vidil_tpu.data.datasets import (
    CaptionEvalDataset,
    PrefetchLoader,
    RetrievalEvalDataset,
    RetrievalTrainDataset,
    VQADataset,
    vqa_collate,
)
from vidil_tpu.data.text_utils import pre_caption, pre_caption_minimum, pre_question
from vidil_tpu.data.transforms import RandomAugment, TestTransform, TrainTransform


def test_pre_caption():
    assert pre_caption("A Dog! Runs. (fast)") == "a dog runs fast"
    assert pre_caption("many   spaces\n") == "many spaces"
    assert pre_caption("one two three four", max_words=2) == "one two"
    assert pre_caption_minimum("Keep. Punct!") == "Keep. Punct!"
    assert pre_question("What is IT? doing.") == "what is it? doing"


def test_transforms_shapes():
    frame = np.random.RandomState(0).randint(0, 256, (48, 64, 3)).astype(np.uint8)
    tr = TrainTransform(32)
    out = tr(frame)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    te = TestTransform(32)
    out2 = te(frame)
    assert out2.shape == (32, 32, 3)
    # randaugment runs every op without error
    from PIL import Image

    from vidil_tpu.data.transforms import AUG_OPS

    img = Image.fromarray(frame)
    for name, op in AUG_OPS.items():
        res = op(img, 5)
        assert res.size == img.size, name


def test_invert_cutout_ops_exist_but_not_default():
    """Invert/Cutout are available ops but excluded from the default pool,
    matching the reference (cutout_func sits outside its arg_dict:
    transform/randaugment.py:194-205,306-308)."""
    from PIL import Image

    from vidil_tpu.data.transforms import AUG_OPS, REFERENCE_OP_POOL, RandomAugment

    assert "Invert" in AUG_OPS and "Cutout" in AUG_OPS
    assert "Invert" not in REFERENCE_OP_POOL and "Cutout" not in REFERENCE_OP_POOL
    assert set(RandomAugment().augs) == set(REFERENCE_OP_POOL)
    assert len(REFERENCE_OP_POOL) == 14  # the reference arg_dict's op count

    img = Image.fromarray(np.full((20, 20, 3), 100, np.uint8))
    inv = np.array(AUG_OPS["Invert"](img, 5))
    assert (inv == 155).all()
    np.random.seed(0)
    cut = np.array(AUG_OPS["Cutout"](img, 10))  # level 10 -> pad 10, box <=10x10
    assert (cut == 0).any() and (cut == 100).any()
    assert ((cut == 0) | (cut == 100)).all()


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("data_tree")
    videos = root / "videos"
    videos.mkdir()
    for vi in range(3):
        w = cv2.VideoWriter(str(videos / f"video{vi}.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(20):
            frame = np.full((48, 64, 3), (i * 10 + vi * 40) % 255, np.uint8)
            w.write(frame)
        w.release()
    # retrieval/caption jsonl
    ret_jsonl = root / "train.jsonl"
    with open(ret_jsonl, "w") as f:
        for i in range(4):
            vid = f"video{i % 3}"
            f.write(json.dumps({"caption": f"caption number {i}", "clip_name": vid, "sen_id": i}) + "\n")
        f.write(json.dumps({"caption": "missing", "clip_name": "video99", "sen_id": 99}) + "\n")
    # qa jsonl
    qa_jsonl = root / "qa.jsonl"
    with open(qa_jsonl, "w") as f:
        for i in range(3):
            f.write(json.dumps({"question": f"what is {i}?", "answer": f"ans{i}",
                                "video_id": f"video{i}"}) + "\n")
    return root


def test_retrieval_train_dataset(video_tree):
    config = dict(video_root=str(video_tree / "videos"),
                  train_ann_jsonl=str(video_tree / "train.jsonl"),
                  frm_sampling_strategy="uniform", num_frm_train=2,
                  height=None, width=None, start_time=None, end_time=None,
                  fps=-1, image_size=32)
    ds = RetrievalTrainDataset(config)
    assert len(ds) == 4  # missing video skipped
    video, caption, idx = ds[0]
    assert video.shape == (2, 32, 32, 3)
    assert caption == "caption number 0"
    assert isinstance(idx, int)
    # idx labels: same video -> same idx
    _, _, idx0 = ds[0]
    _, _, idx3 = ds[3]
    assert idx0 == idx3  # items 0 and 3 are both video0


def test_retrieval_eval_dataset(video_tree):
    ds = RetrievalEvalDataset(str(video_tree / "videos"), str(video_tree / "train.jsonl"),
                              num_frm=2, frm_sampling_strategy="uniform", max_img_size=32)
    assert len(ds) == 4
    assert len(ds.text) == 4
    video, index = ds[1]
    assert video.shape == (2, 32, 32, 3) and index == 1
    assert ds.txt2video == ds.video2txt == [0, 1, 2, 3]


def test_caption_eval_dataset_groups_refs(video_tree):
    ds = CaptionEvalDataset(str(video_tree / "videos"), str(video_tree / "train.jsonl"),
                            num_frm=2, frm_sampling_strategy="uniform", max_img_size=32)
    assert len(ds) == 3
    assert len(ds.gt["video0"]) == 2  # sen_id 0 and 3


def test_vqa_dataset_and_collate(video_tree):
    config = dict(video_root=str(video_tree / "videos"),
                  train_ann_jsonl=str(video_tree / "qa.jsonl"),
                  frm_sampling_strategy="uniform", num_frm_train=2, num_frm_test=2,
                  height=None, width=None, start_time=None, end_time=None,
                  fps=-1, image_size=32)
    ds = VQADataset(config, split="train")
    video, question, answers, weights = ds[0]
    assert question == "what is 0?"
    assert answers == ["ans0"] and weights == [0.2]
    videos, questions, ans, w, n = vqa_collate([ds[0], ds[1]])
    assert videos.shape == (2, 2, 32, 32, 3)
    assert n == [1, 1] and list(w) == [0.2, 0.2]


def test_prefetch_loader(video_tree):
    config = dict(video_root=str(video_tree / "videos"),
                  train_ann_jsonl=str(video_tree / "train.jsonl"),
                  frm_sampling_strategy="uniform", num_frm_train=2,
                  height=None, width=None, start_time=None, end_time=None,
                  fps=-1, image_size=32)
    ds = RetrievalTrainDataset(config)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    videos, captions, idxs = batches[0]
    assert videos.shape == (2, 2, 32, 32, 3)
    assert len(captions) == 2
    # deterministic shuffle per epoch
    loader.set_epoch(0)
    again = list(loader)
    np.testing.assert_array_equal(batches[0][2], again[0][2])
