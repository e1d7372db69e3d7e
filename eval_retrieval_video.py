"""Standalone retrieval evaluation — TPU-native CLI (drop-in for the
reference eval_retrieval_video.py: same evaluation as the trainer's)."""

import argparse
import json
import os
from pathlib import Path

if __name__ == "__main__":
    import yaml

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="configs/train_blip_video_retrieval_msrvtt_pseudo.yaml")
    parser.add_argument("--output_dir", default="output/retrieval_eval")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--seed", default=42, type=int)
    parser.add_argument("--world_size", default=1, type=int)
    parser.add_argument("--dist_url", default="env://")
    parser.add_argument("--distributed", default=True, type=bool)
    args = parser.parse_args()
    args.evaluate = True

    config = yaml.safe_load(open(args.config))
    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    yaml.safe_dump(config, open(os.path.join(args.output_dir, "config.yaml"), "w"))

    import train_retrieval_video

    train_retrieval_video.main(args, config)
