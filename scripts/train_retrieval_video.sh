#!/usr/bin/env bash
set -e
CONFIG=${1:-configs/train_blip_video_retrieval_msrvtt_pseudo.yaml}
OUTPUT_DIR=${2:-output/retrieval_video}
python train_retrieval_video.py --config "$CONFIG" --output_dir "$OUTPUT_DIR"
