#!/usr/bin/env bash
# Stage 3 (caption task, SBERT in-context selection + ASR; comparing on caption_asr).
set -e
DATASET=$1
SPLIT=$2
OUTPUT_ROOT_DIR=$3
SHOT=$4
RANDOM_SEED=$5
N=$6
COMPARING_TARGET=${7:-caption_asr}
SHARED_DATASETS="shared_datasets"

OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_${SPLIT}"
TRAIN_OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_train"
VISUAL_TOKENIZATION_ENCODER="clip"
INSTRUCTION_LINE="Generate a video caption based on the objects, attributes, frame captions and subtitle."

python generate_prompts_random_prefix_in_context_selection.py \
    --prompt_task caption \
    --visual_tokens_dir "$OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER" \
    --frame_captions_dir "$OUTPUT_DIR/frame_caption" \
    --asr_path "$SHARED_DATASETS/${DATASET}/ann/video_2_asr_${SPLIT}.json" \
    --add_ASR \
    --output_dir "$OUTPUT_DIR/input_prompts" \
    --output_name "caption_${DATASET}_${SPLIT}_shot${SHOT}_seed${RANDOM_SEED}_N${N}_selection_asr.jsonl" \
    --trainset_json_ann "$SHARED_DATASETS/${DATASET}/ann/video_2_text_original_train.json" \
    --train_dataset_visual_tokens_dir "$TRAIN_OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER" \
    --train_dataset_frame_captions_dir "$TRAIN_OUTPUT_DIR/frame_caption" \
    --instruction_line "$INSTRUCTION_LINE" \
    --shot "$SHOT" --seed "$RANDOM_SEED" --N "$N" \
    --comparing_target "$COMPARING_TARGET"
