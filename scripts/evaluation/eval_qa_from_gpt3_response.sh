#!/usr/bin/env bash
# Map raw GPT-3 QA responses to the closed answer list and score accuracy.
set -e
python eval_video_qa_result.py \
  --pred_jsonl "$1" --idx_2_video_id "$2" --gt "$3" --answer_list_json "$4" \
  --setting generation_gpt3_raw
