"""VLEP eval CLI (drop-in for the reference eval_vlep.py)."""

import argparse
import json
import os

from vidil_tpu.evals.vlep import eval_multichoice, eval_openended, vlep_accuracy  # noqa: F401

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--gpt3_processed_response", default="")
    parser.add_argument("--output_path", default="")
    parser.add_argument("--example_id_2_data",
                        default="shared_datasets/VLEP/ann/example_id_2_events_answer_test.json")
    args = parser.parse_args()

    example_id_2_data = json.load(open(args.example_id_2_data))
    results = json.load(open(args.gpt3_processed_response))
    result_file_name = os.path.basename(args.gpt3_processed_response)
    if "multichoice" in result_file_name:
        lines = eval_multichoice(results, example_id_2_data, args.output_path)
    else:
        lines = eval_openended(results, example_id_2_data, args.output_path)
    acc = vlep_accuracy(lines, example_id_2_data)
    if acc:
        print("accuracy (where gt available):", acc)
