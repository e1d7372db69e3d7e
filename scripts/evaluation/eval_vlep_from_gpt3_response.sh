#!/usr/bin/env bash
# Map processed GPT-3 VLEP responses to CodaLab submission jsonl.
set -e
python eval_vlep.py --gpt3_processed_response "$1" --output_path "$2" \
  --example_id_2_data "${3:-shared_datasets/VLEP/ann/example_id_2_events_answer_test.json}"
