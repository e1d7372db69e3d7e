#!/usr/bin/env bash
# Stage 3 (QA task, fixed prompt prefix txt): prompts jsonl.
set -e
DATASET=$1
OUTPUT_ROOT_DIR=$2
SHARED_DATASETS=${3:-shared_datasets}
SPLIT=${4:-test}
PROMPT_PREFIX="pipeline/prompt_prefix/qa_default.txt"

OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_${SPLIT}"
VISUAL_TOKENIZATION_ENCODER="clip"

python generate_prompts_fixed_prefix.py \
    --prompt_task qa \
    --visual_tokens_dir "$OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER" \
    --frame_captions_dir "$OUTPUT_DIR/frame_caption" \
    --question_answer_path "$SHARED_DATASETS/${DATASET}/ann/video_2_question_answer_${SPLIT}.json" \
    --prompt_prefix "$PROMPT_PREFIX" \
    --output_dir "$OUTPUT_DIR/input_prompts" \
    --output_name "qa_${DATASET}_${SPLIT}_fixed_prompt.jsonl"
