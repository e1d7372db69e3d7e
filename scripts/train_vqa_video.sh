#!/usr/bin/env bash
set -e
CONFIG=${1:-configs/train_blip_video_vqa_msrvtt.yaml}
OUTPUT_DIR=${2:-output/vqa_video}
python train_vqa_video.py --config "$CONFIG" --output_dir "$OUTPUT_DIR"
