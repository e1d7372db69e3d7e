#!/usr/bin/env bash
# BLIP video captioning fine-tune (one process drives all local TPU chips;
# multi-host: set RANK/WORLD_SIZE/MASTER_ADDR per host).
set -e
CONFIG=${1:-configs/train_blip_video_captioning_msrvtt.yaml}
OUTPUT_DIR=${2:-output/caption_video}
python train_caption_video.py --config "$CONFIG" --output_dir "$OUTPUT_DIR"
