"""Frame captioning + ITM filtering (CapFilt) — TPU-native CLI.

Drop-in equivalent of the reference entry point (reference:
run_video_CapFilt.py): same argparse surface, same yaml config keys, same
output tree (output_dir/tmp/{rank}_filtered.json + rank-0 merged
video_text_CapFilt.json / video_text_Cap.json), but the compute path runs
batched over many videos per device program.

Extra config keys vs the reference:
  bert_vocab:       path to a bert-base-uncased vocab.txt (offline envs)
  videos_per_batch: videos per compiled step (default 8; the chunk pads
                    to this size so the compiled program is reused — for
                    large datasets set 64, the measured-optimal chip
                    batch: ~5-10% more frames/s than 32, see bench.py)
  beam_group_kv:    grouped-KV beam decode, ~1.9x faster (default true)
  data_parallel:    shard batches over all local chips SPMD (default false)
  transfer_format:  'rgb' (default) or 'yuv420' — ship planar YUV420 to the
                    device (half the host->device bytes) and fuse the
                    colorspace conversion into the encode program. Pixel
                    values differ from the RGB path by the BT.601 roundtrip
                    (<=1/255 on gray, small on chroma edges), so the default
                    stays 'rgb' for byte-parity with the reference.
  synthetic_weights: benchmarking only — synthesize full-size params on
                    device instead of loading the .pth checkpoints
                    (captions are meaningless; path/schedule identical).
  resize_on_device: ship frames at native decode resolution and run the
                    bicubic resize to image_size ON DEVICE (default
                    false). ~2x fewer host->device bytes for sub-384
                    sources AND no per-frame PIL work on the host core.
                    All videos of a run must share one native resolution
                    (inferred from the first video, or set native_height/
                    native_width); off-spec videos get one host resample
                    to that size. Resize numerics differ from PIL by
                    ~±1/255 (same Keys a=-0.5 kernel, float vs PIL's
                    fixed-point), so the parity default stays off.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time
from pathlib import Path

import numpy as np


def build_engine(config, dtype=None):
    import jax

    from vidil_tpu.config import MedConfig, ViTConfig, compute_dtype_from_config
    from vidil_tpu.models import convert
    from vidil_tpu.pipeline.capfilt import CapFiltEngine
    from vidil_tpu.tokenizer import BlipTokenizer

    # data_parallel: one SPMD engine over all local chips (batch sharded
    # over a 'data' mesh axis) instead of the reference's
    # one-process-per-GPU sharding
    mesh = None
    if config.get("data_parallel", False) and len(jax.local_devices()) > 1:
        from jax.sharding import Mesh

        devs = jax.local_devices()
        mesh = Mesh(np.asarray(devs), ("data",))

    if "vit_config" in config:  # custom architecture (tests / non-standard sizes)
        vit_cfg = ViTConfig(image_size=config["image_size"], **config["vit_config"])
    else:
        vit_cfg = ViTConfig.from_name(config["vit"], config["image_size"])
    med_cfg_path = config.get("med_config", os.path.join(os.path.dirname(__file__), "configs/med_config.json"))
    med_cfg = MedConfig.from_json(med_cfg_path, encoder_width=vit_cfg.hidden_size)

    tokenizer = BlipTokenizer(config["bert_vocab"])

    if config.get("synthetic_weights", False):
        # Benchmarking affordance (not in the reference): synthesize
        # full-size params ON DEVICE instead of loading + uploading a
        # .pth — a BLIP-base pair is ~400 MB, which the dev tunnel moves
        # in tens of minutes. Captions are meaningless; the compute path,
        # shapes and schedule are the production ones. Used by the
        # from-disk end-to-end benchmark (benchmarks/capfilt_from_disk.jsonl).
        from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
        from vidil_tpu.utils.synth import synth_tree

        cap_shapes = jax.eval_shape(
            lambda: init_blip_decoder(jax.random.PRNGKey(0), vit_cfg, med_cfg))
        fil_shapes = jax.eval_shape(
            lambda: init_blip_itm(jax.random.PRNGKey(1), vit_cfg, med_cfg,
                                  embed_dim=256))
        captioner = jax.jit(lambda: synth_tree(cap_shapes))()
        filterer = jax.jit(lambda: synth_tree(fil_shapes))()
    else:
        cap_sd = convert.load_torch_state_dict(config["caption_model_ckpt"])
        captioner = convert.convert_blip_decoder(cap_sd, vit_cfg, med_cfg)
        fil_sd = convert.load_torch_state_dict(config["filterer_model_ckpt"])
        filterer = convert.convert_blip_itm(fil_sd, vit_cfg, med_cfg)

    return CapFiltEngine(
        captioner, filterer, tokenizer, vit_cfg, med_cfg,
        num_beams=3, max_length=20, min_length=5,  # reference run_video_CapFilt.py:101
        dtype=compute_dtype_from_config(config, dtype),
        # beams share one cross-K/V copy: ~1.9x decode throughput on TPU,
        # token-identical captions (tests/test_capfilt.py); costs a slower
        # one-time compile, so it is config-disableable
        beam_group_kv=config.get("beam_group_kv", True),
        # fused filter: ITM text ids built on device from the generated
        # sequences (host-verified, classic fallback; results always
        # equal the classic path) — removes the mid-chunk host round
        # trip so the in-flight chunk overlap below actually pays
        # (+27% measured: benchmarks/capfilt_ab_fused.jsonl)
        fused_filter=config.get("fused_filter", True),
        mesh=mesh,
    )


def main(args, config):
    import jax

    from PIL import Image

    from vidil_tpu import utils
    from vidil_tpu.data.sampling import load_video_frames
    from vidil_tpu.pipeline.capfilt import preprocess_frames_pil

    video_format = config["video_formats"]
    video_dir = config["video_roots"]
    video_2_text_original = json.load(open(config["train_ann_jsons"]))
    data = []
    for key, text in video_2_text_original.items():
        video_path = os.path.join(video_dir, f"{key}.{video_format}")
        if os.path.exists(video_path):
            data.append({"video_path": video_path, "text": text, "video_id": key})
        else:
            print(f"skip: {key}")
    print("number of existing videos:", len(data))

    tmp_dir = os.path.join(args.output_dir, "tmp")
    os.makedirs(tmp_dir, exist_ok=True)

    utils.init_distributed_mode(args)
    utils.seed_everything(args.seed)

    rank = utils.get_rank()
    num_tasks = utils.get_world_size()
    start, end = utils.shard_range(len(data))
    print(f"rank{rank}:start-{start}:end-{end}")
    shard = data[start:end]

    engine = build_engine(config)
    chunk_size = int(config.get("videos_per_batch", 8))
    num_frm = config["num_frm_CapFilt"]
    image_size = config["image_size"]

    video_text_CapFilt = {}
    video_text_Cap_unfiltered = {}
    t0 = time.time()
    n_frames = 0
    t_steady = None       # set when the first chunk completes (post-compile)
    n_frames_steady = 0

    resize_dev = bool(config.get("resize_on_device", False))
    # native (H, W) the chunk programs are compiled for: explicit config
    # keys, else inferred from the first decoded video (even dims for I420)
    import threading

    _native_hw = [None]
    if config.get("native_height") and config.get("native_width"):
        _native_hw[0] = (int(config["native_height"]) & ~1,
                         int(config["native_width"]) & ~1)
    _native_lock = threading.Lock()
    _offspec_warned = [False]

    def decode_item(item):
        """Host-side decode (+ PIL resize unless resize_on_device) of one
        video (thread-parallel)."""
        frames = load_video_frames(
            item["video_path"], config["frm_sampling_strategy"], num_frm,
            height=config.get("height"), width=config.get("width"),
            start_time=config.get("start_time"), end_time=config.get("end_time"),
            fps=config.get("fps", -1),
        )
        if frames is None:
            return None
        if resize_dev:
            # ship native-resolution frames; the engine's encode program
            # runs the bicubic to image_size on device. One shared native
            # shape keeps every chunk on the same compiled program.
            with _native_lock:
                if _native_hw[0] is None:
                    _native_hw[0] = (frames.shape[1] & ~1, frames.shape[2] & ~1)
            h, w = _native_hw[0]
            if frames.shape[1:3] != (h, w):
                if not _offspec_warned[0]:
                    _offspec_warned[0] = True
                    print(f"resize_on_device: video {item['video_id']} decodes "
                          f"at {frames.shape[1]}x{frames.shape[2]}, host-resampling "
                          f"off-spec videos to the chunk-native {h}x{w}")
                pre = np.empty((len(frames), h, w, 3), np.uint8)
                for i, frm in enumerate(frames):
                    pre[i] = np.asarray(Image.fromarray(frm).resize((w, h), Image.BICUBIC))
            else:
                pre = frames[:, :h, :w]
        else:
            pre = preprocess_frames_pil(frames, image_size)
        if config.get("transfer_format", "rgb") == "yuv420":
            from vidil_tpu.ops.image import rgb_to_yuv420

            pre = rgb_to_yuv420(pre)  # 1.5 B/px across the link instead of 3
        return {
            "video_id": item["video_id"],
            # device_put from the worker thread: the host->TPU transfer
            # overlaps the previous chunk's device compute
            "frames": jax.device_put(pre),
            "text": item["text"],
        }

    # Dispatch schedule, evidence-driven (benchmarks/capfilt_ab_*.jsonl):
    # with the CLASSIC filter, a cross-chunk in-flight variant measured a
    # wash (the mid-chunk caption readback -> re-tokenize -> ITM dispatch
    # host dependency serializes regardless of schedule), so classic
    # chunks complete sequentially. The FUSED filter removes that
    # dependency (ITM ids built on device), and there one chunk in
    # flight is worth +27% (161.5 vs 127 f/s) — so the in-flight overlap
    # is applied exactly when the fused path engages.
    from vidil_tpu.pipeline.fused_filter import fused_applicable

    keep_in_flight = engine.fused_filter and fused_applicable(config)
    in_flight = None  # (dispatch, meta, real)

    def drain_chunk(d, meta, real):
        nonlocal n_frames, t_steady, n_frames_steady
        results = engine.complete_chunk(d)
        if t_steady is None:
            # first chunk carries the one-time program compile; the
            # steady-state rate print below excludes it
            t_steady, n_frames_steady = time.time(), n_frames + real * num_frm
        for item, res in zip(meta, results[:real]):
            video_text_Cap_unfiltered[res.video_id] = res.unfiltered_text
            if res.text != []:
                video_text_CapFilt[res.video_id] = res.text
            else:
                print("filter out video:", res.video_id)
        n_frames += real * num_frm

    def flush_in_flight():
        nonlocal in_flight
        if in_flight is not None:
            d, meta, real = in_flight
            in_flight = None
            drain_chunk(d, meta, real)

    def run_chunk(chunk, meta):
        nonlocal in_flight
        real = len(chunk)
        # pad the chunk to a fixed size so the compiled program is reused
        while len(chunk) < chunk_size:
            chunk.append({**chunk[0]})
        d = engine.dispatch_chunk(chunk, config, rng=jax.random.PRNGKey(args.seed),
                                  n_real=real)
        if keep_in_flight:
            flush_in_flight()
            in_flight = (d, meta, real)
        else:
            drain_chunk(d, meta, real)

    # host decode runs in a thread pool AHEAD of the device: while the TPU
    # works on chunk i, the host decodes chunk i+1 (the reference decodes
    # and computes strictly serially, run_video_CapFilt.py:155-204).
    # Bounded prefetch: at most 2 chunks of decoded frames in flight.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=int(config.get("decode_workers", 4))) as pool:
        pending: deque = deque()
        it = iter(shard)

        def top_up():
            while len(pending) < 2 * chunk_size:
                item = next(it, None)
                if item is None:
                    return
                pending.append((item, pool.submit(decode_item, item)))

        top_up()
        chunk, meta = [], []
        while pending:
            item, fut = pending.popleft()
            dec = fut.result()
            top_up()
            if dec is None:
                print(f'skip video that cannot be loaded: {item["video_path"]}')
                continue
            chunk.append(dec)
            meta.append(item)
            if len(chunk) == chunk_size:
                run_chunk(chunk, meta)
                chunk, meta = [], []
        if chunk:
            run_chunk(chunk, meta)
        flush_in_flight()

    dt = time.time() - t0
    if n_frames:
        print(f"rank{rank}: {n_frames} frames in {dt:.1f}s = {n_frames/dt:.2f} frames/s")
    if t_steady is not None and n_frames > n_frames_steady:
        ds, fs = time.time() - t_steady, n_frames - n_frames_steady
        print(f"rank{rank}: steady-state (first chunk's compile excluded): "
              f"{fs} frames in {ds:.1f}s = {fs/ds:.2f} frames/s")

    with open(os.path.join(tmp_dir, f"{rank}_filtered.json"), "w") as out:
        json.dump(video_text_CapFilt, out, indent=4)
    with open(os.path.join(tmp_dir, f"{rank}_unfiltered.json"), "w") as out:
        json.dump(video_text_Cap_unfiltered, out, indent=4)

    utils.barrier()

    if utils.is_main_process():
        merged_filtered = {}
        merged_unfiltered = {}
        for r in range(num_tasks):
            merged_filtered.update(json.load(open(os.path.join(tmp_dir, f"{r}_filtered.json"))))
            merged_unfiltered.update(json.load(open(os.path.join(tmp_dir, f"{r}_unfiltered.json"))))
        print("filtered video number:", len(merged_filtered))
        print("unfiltered video number:", len(merged_unfiltered))
        with open(os.path.join(args.output_dir, "video_text_CapFilt.json"), "w") as out:
            json.dump(merged_filtered, out, indent=4)
        with open(os.path.join(args.output_dir, "video_text_Cap.json"), "w") as out:
            json.dump(merged_unfiltered, out, indent=4)
        shutil.rmtree(tmp_dir)


if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="none")
    parser.add_argument("--output_dir", default="output/video_CapFilt")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--dist_url", default="env://")
    parser.add_argument("--distributed", default=True, type=bool)
    args = parser.parse_args()

    config = yaml.safe_load(open(args.config))
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(config, open(os.path.join(args.output_dir, "config.yaml"), "w"))
    main(args, config)
