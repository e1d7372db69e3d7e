"""Visual tokenization (CLIP/BLIP zero-shot frame tagging) — TPU-native CLI.

Drop-in equivalent of the reference entry point (reference:
run_visual_tokenization.py): same argparse surface, config keys and
output tree (output_dir/tmp/{rank}.json + rank-0 merged
visual_tokens.json).

Extra config keys vs the reference (offline environments):
  clip_ckpt / clip_vocab / clip_merges : local CLIP weights + BPE files
  bert_vocab                           : bert vocab.txt (blip mode)
  ontology_root                        : ontology dir (default
                                         'visual_token_ontology')
  videos_per_batch                     : videos per embedding chunk
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time
from pathlib import Path

import numpy as np



def _local_mesh(config):
    """data_parallel: one SPMD engine over all local chips (batch sharded
    over a 'data' mesh axis)."""
    if not config.get("data_parallel", False):
        return None
    import jax

    devs = jax.local_devices()
    if len(devs) < 2:
        return None
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs), ("data",))


def _compute_dtype(config, dtype):
    from vidil_tpu.config import compute_dtype_from_config

    return compute_dtype_from_config(config, dtype)


def build_clip_engine(config, dtype=None):
    from vidil_tpu.config import CLIPConfig
    from vidil_tpu.models.convert import convert_clip, load_torch_state_dict
    from vidil_tpu.pipeline.visual_tokenization import ClipTokenizationEngine
    from vidil_tpu.tokenizer import ClipBPETokenizer

    dtype = _compute_dtype(config, dtype)

    if "clip_config" in config:
        clip_cfg = CLIPConfig(**config["clip_config"])
    else:
        name = config.get("clip_model_visual_tokenization", "openai/clip-vit-large-patch14")
        clip_cfg = CLIPConfig.vit_l_14() if "large" in name else CLIPConfig.vit_b_32()
    sd = load_torch_state_dict(config["clip_ckpt"])
    params = convert_clip(sd, clip_cfg)
    tok = ClipBPETokenizer(config["clip_vocab"], config["clip_merges"],
                           max_len=clip_cfg.max_text_len)
    return ClipTokenizationEngine(params, clip_cfg, tok, dtype=dtype,
                                  mesh=_local_mesh(config))


def build_blip_engine(config, dtype=None):
    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.convert import convert_blip_retrieval, load_torch_state_dict
    from vidil_tpu.pipeline.visual_tokenization import BlipTokenizationEngine
    from vidil_tpu.tokenizer import BlipTokenizer

    dtype = _compute_dtype(config, dtype)
    if "vit_config" in config:
        vit_cfg = ViTConfig(image_size=config["image_size"], **config["vit_config"])
    else:
        vit_cfg = ViTConfig.from_name(config["vit"], config["image_size"])
    med_cfg_path = config.get("med_config", os.path.join(os.path.dirname(__file__), "configs/med_config.json"))
    med_cfg = MedConfig.from_json(med_cfg_path, encoder_width=vit_cfg.hidden_size)
    tok = BlipTokenizer(config["bert_vocab"])
    sd = load_torch_state_dict(config["blip_model_visual_tokenization"])
    params = convert_blip_retrieval(sd, vit_cfg, med_cfg, with_momentum=False)
    return BlipTokenizationEngine(params, vit_cfg, med_cfg, tok,
                                  k_test=config.get("k_test", 128), dtype=dtype,
                                  mesh=_local_mesh(config))


def load_annotations(config) -> list[dict]:
    """reference: data/video_pretrain_dataset.py:397-443 — list or dict ann
    jsons -> [{'video': path, 'video_id': id, 'caption': [texts]}]."""
    ann_jsons = config["train_ann_jsons"]
    video_roots = config["video_roots"]
    video_formats = config["video_formats"]
    if isinstance(ann_jsons, str):
        ann_jsons, video_roots, video_formats = [ann_jsons], [video_roots], [video_formats]
    annotation: dict = {}
    skipped = 0
    for ann_path, video_dir, fmt in zip(ann_jsons, video_roots, video_formats):
        ann = json.load(open(ann_path))
        if isinstance(ann, list):
            for obj in ann:
                vid = obj["video_id"]
                path = os.path.join(video_dir, f"{vid}.{fmt}")
                if not os.path.exists(path):
                    print(f"ERROR: video file not found, skipped:{path}")
                    skipped += 1
                    continue
                if vid not in annotation:
                    annotation[vid] = {"video": path, "video_id": vid, "caption": []}
                annotation[vid]["caption"] += obj["texts"]
        else:
            for vid, texts in ann.items():
                path = os.path.join(video_dir, f"{vid}.{fmt}")
                if not os.path.exists(path):
                    print(f"ERROR: video file not found, skipped:{path}")
                    skipped += 1
                    continue
                annotation[vid] = {"video": path, "video_id": vid, "caption": texts}
    print("num of video skipped:", skipped)
    print("num of video considering:", len(annotation))
    return list(annotation.values())


def main(args, config):
    from vidil_tpu import utils
    from vidil_tpu.data.sampling import load_video_frames
    from vidil_tpu.pipeline.capfilt import preprocess_frames_pil
    from vidil_tpu.pipeline.visual_tokenization import (
        clip_preprocess_pil,
        get_prefix_prompt_functions,
        load_ontology,
        ontology_paths,
        predict_videos,
    )

    tmp_dir = os.path.join(args.output_dir, "tmp")
    os.makedirs(tmp_dir, exist_ok=True)

    utils.init_distributed_mode(args)
    utils.seed_everything(args.seed)
    rank = utils.get_rank()
    num_tasks = utils.get_world_size()

    if args.encoder_version == "clip":
        engine = build_clip_engine(config)
        image_size = getattr(engine.cfg, "image_size", 224)
        preprocess = lambda frames: clip_preprocess_pil(frames, image_size)
    elif args.encoder_version == "blip":
        engine = build_blip_engine(config)
        preprocess = lambda frames: preprocess_frames_pil(frames, config["image_size"])
    else:
        raise ValueError(f"unknown encoder_version {args.encoder_version}")

    prompt_functions = get_prefix_prompt_functions(config["prompt_version_visual_tokenization"])
    onto_root = config.get("ontology_root", "visual_token_ontology")
    if not os.path.isabs(onto_root) and not os.path.isdir(onto_root):
        # fall back to the ontology term lists vendored with the repo
        # (reference data assets, run_visual_tokenization.py:369-381) so the
        # default configs run with zero setup from any working directory
        vendored = os.path.join(os.path.dirname(os.path.abspath(__file__)), onto_root)
        if os.path.isdir(vendored):
            onto_root = vendored
    if "ontology_paths" in config:
        paths = config["ontology_paths"]
    else:
        paths = ontology_paths(config["ontology"], onto_root)
    visual_token_texts = load_ontology(paths)
    for k in ("objects", "attributes", "verbs"):
        print(f"num of {k}:", len(visual_token_texts[k]))

    annotation = load_annotations(config)
    start, end = utils.shard_range(len(annotation))
    print(f"rank{rank}:start-{start}:end-{end}")
    shard = annotation[start:end]

    num_frm = config["num_frm_visual_tokenization"]
    chunk_size = int(config.get("videos_per_batch", 16))
    early_stop = config.get("early_stop_step", -1)

    text_cache: dict = {}
    videoid_2_visual_tokens: dict = {}
    t0 = time.time()
    n_frames = 0

    video_frames, captions = {}, {}
    def flush():
        nonlocal video_frames, captions, n_frames
        if not video_frames:
            return
        out = predict_videos(
            engine, video_frames, captions, visual_token_texts, prompt_functions,
            topk_visualize=config["topk_visualize"], text_cache=text_cache,
            pad_to_videos=chunk_size,
        )
        videoid_2_visual_tokens.update(out)
        n_frames += len(video_frames) * num_frm
        video_frames, captions = {}, {}

    def decode_one(ann):
        frames = load_video_frames(
            ann["video"], config["frm_sampling_strategy"], num_frm,
            height=config.get("height"), width=config.get("width"),
            start_time=config.get("start_time"), end_time=config.get("end_time"),
            fps=config.get("fps", -1),
        )
        if frames is None:
            return None
        # device_put from the worker thread: the host->device upload of
        # chunk i+1 overlaps chunk i's compute (same structure as
        # run_video_CapFilt.py's decode threads; the upload was serial
        # with compute before and dominated end-to-end on slow links)
        import jax

        return jax.device_put(preprocess(frames))

    # bounded decode prefetch: host decodes ahead while the TPU scores
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    work = shard if early_stop < 0 else shard[:early_stop]
    if early_stop >= 0:
        print(f"early stop at {early_stop}")
    with ThreadPoolExecutor(max_workers=int(config.get("decode_workers", 4))) as pool:
        pending = deque()
        it = iter(work)

        def top_up():
            while len(pending) < 2 * chunk_size:
                ann = next(it, None)
                if ann is None:
                    return
                pending.append((ann, pool.submit(decode_one, ann)))

        top_up()
        while pending:
            ann, fut = pending.popleft()
            frames = fut.result()
            top_up()
            video_name = os.path.basename(ann["video"])[:-4]
            if frames is None:
                print("skip video that cannot be loaded:", video_name)
                continue
            video_frames[video_name] = frames
            captions[video_name] = ann["caption"]
            if len(video_frames) == chunk_size:
                flush()
    flush()

    dt = time.time() - t0
    if n_frames:
        print(f"rank{rank}: {n_frames} frames in {dt:.1f}s = {n_frames/dt:.2f} frames/s")

    with open(os.path.join(tmp_dir, f"{rank}.json"), "w") as out:
        json.dump(videoid_2_visual_tokens, out, indent=4)

    utils.barrier()

    if utils.is_main_process():
        merged = {}
        for r in range(num_tasks):
            merged.update(json.load(open(os.path.join(tmp_dir, f"{r}.json"))))
        with open(os.path.join(args.output_dir, "visual_tokens.json"), "w") as out:
            json.dump(merged, out, indent=4)
        shutil.rmtree(tmp_dir)


if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/pipeline_config/pipeline_config_msrvtt_train.yaml")
    parser.add_argument("--output_dir", default="visual_token_generation/output/tmp")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--dist_url", default="env://")
    parser.add_argument("--distributed", default=True, type=bool)
    parser.add_argument("--encoder_version", default="clip")
    args = parser.parse_args()

    config = yaml.safe_load(open(args.config))
    config["num_frm_train"] = config["num_frm_visual_tokenization"]
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(config, open(os.path.join(args.output_dir, "config.yaml"), "w"))
    main(args, config)
