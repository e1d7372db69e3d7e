#!/usr/bin/env bash
# Score a raw GPT-3 caption response against gt, e.g.:
#   bash scripts/evaluation/eval_caption_from_gpt3_response.sh \
#     out/msrvtt_test/gpt3_response/temp_0.0_x.jsonl \
#     out/msrvtt_test/input_prompts/temp_0.0_x__idx_2_videoid.json \
#     shared_datasets/MSRVTT_caption/ann/test_caption.jsonl out/msrvtt_test/eval
set -e
python eval_video_captioning_results.py \
  --gpt3_response_file "$1" --idx_2_videoid_json "$2" --gt_jsonl "$3" --output_dir "$4"
