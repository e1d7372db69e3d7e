#!/usr/bin/env bash
# Stage 3 (caption task, fixed prefix + ASR subtitle section).
set -e
DATASET=$1
OUTPUT_ROOT_DIR=$2
SHARED_DATASETS=${3:-shared_datasets}
SPLIT=${4:-test}
PROMPT_PREFIX="pipeline/prompt_prefix/caption_default.txt"

OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_${SPLIT}"
VISUAL_TOKENIZATION_ENCODER="clip"

python generate_prompts_fixed_prefix.py \
    --prompt_task caption \
    --visual_tokens_dir "$OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER" \
    --frame_captions_dir "$OUTPUT_DIR/frame_caption" \
    --asr_path "$SHARED_DATASETS/${DATASET}/ann/video_2_asr_${SPLIT}.json" \
    --add_ASR \
    --prompt_prefix "$PROMPT_PREFIX" \
    --output_dir "$OUTPUT_DIR/input_prompts" \
    --output_name "caption_${DATASET}_${SPLIT}_fixed_prompt_asr.jsonl"
