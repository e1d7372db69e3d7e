#!/usr/bin/env bash
# Stage 1+2: visual tokenization + CapFilt frame captioning.
# TPU-native equivalent of the reference pipeline script: same positional
# args, output tree and stage-skip idempotence guards; one python process
# drives all local TPU chips (no torch.distributed.run); multi-host runs
# set RANK/WORLD_SIZE/MASTER_ADDR (or COORDINATOR_ADDRESS) per host.
set -e

DATASET=$1
SPLIT=$2
OUTPUT_ROOT_DIR=$3
SHARED_DATASETS="shared_datasets"

echo "running pipeline on dataset: $DATASET, ${SPLIT}"
echo "output root dir: $OUTPUT_ROOT_DIR"

OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_${SPLIT}"
CONFIG="configs/pipeline_config/pipeline_config_${DATASET}_${SPLIT}.yaml"
VISUAL_TOKENIZATION_ENCODER="clip" # "blip"

VISUAL_TOKENIZATION_OUTPUT_DIR="$OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER"
FRAME_CAPTION_OUTPUT_DIR="$OUTPUT_DIR/frame_caption"

mkdir -p "$OUTPUT_DIR" "$VISUAL_TOKENIZATION_OUTPUT_DIR" "$FRAME_CAPTION_OUTPUT_DIR"

if test -f "$VISUAL_TOKENIZATION_OUTPUT_DIR/visual_tokens.json"; then
    echo "visual tokens exist"
else
    echo "run visual tokenization..."
    python run_visual_tokenization.py \
        --config "$CONFIG" \
        --output_dir "$VISUAL_TOKENIZATION_OUTPUT_DIR" \
        --encoder_version "$VISUAL_TOKENIZATION_ENCODER"
fi

if test -f "$FRAME_CAPTION_OUTPUT_DIR/video_text_CapFilt.json"; then
    echo "frame captions exist"
else
    echo "run frame captioning..."
    python run_video_CapFilt.py \
        --config "$CONFIG" \
        --output_dir "$FRAME_CAPTION_OUTPUT_DIR"
fi
