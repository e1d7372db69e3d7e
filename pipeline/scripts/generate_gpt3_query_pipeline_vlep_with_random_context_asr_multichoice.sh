#!/usr/bin/env bash
# Stage 3 (VLEP multichoice, random few-shot prefix + ASR dialogue).
set -e

DATASET=${1:-vlep}
SPLIT=$2
OUTPUT_ROOT_DIR=$3
SHOT=$4
RANDOM_SEED=$5
SHARED_DATASETS="shared_datasets"

OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_${SPLIT}"
TRAIN_OUTPUT_DIR="$OUTPUT_ROOT_DIR/${DATASET}_train"
VISUAL_TOKENIZATION_ENCODER="clip"

INSTRUCTION_LINE="Predict what is more likely to happen next based on the dialogue and frame captions."

python generate_prompts_random_prefix_vlep_multichoice.py \
    --prompt_task vlep \
    --visual_tokens_dir "$OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER" \
    --frame_captions_dir "$OUTPUT_DIR/frame_caption" \
    --asr_path "$SHARED_DATASETS/VLEP/ann/video_2_asr.json" \
    --add_ASR \
    --output_dir "$OUTPUT_DIR/input_prompts" \
    --output_name "vlep_${DATASET}_${SPLIT}_shot${SHOT}_seed${RANDOM_SEED}_multichoice.jsonl" \
    --trainset_json_ann "$SHARED_DATASETS/VLEP/ann/example_id_2_events_answer_train.json" \
    --target_json_ann "$SHARED_DATASETS/VLEP/ann/example_id_2_events_answer_${SPLIT}.json" \
    --train_dataset_visual_tokens_dir "$TRAIN_OUTPUT_DIR/visual_tokenization_$VISUAL_TOKENIZATION_ENCODER" \
    --train_dataset_frame_captions_dir "$TRAIN_OUTPUT_DIR/frame_caption" \
    --instruction_line "$INSTRUCTION_LINE" \
    --shot "$SHOT" --seed "$RANDOM_SEED"
