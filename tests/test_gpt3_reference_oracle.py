"""GPT-3 response processing output files vs the LIVE reference modules.

process_gpt3_response (response jsonl + idx map -> videoid->captions
json) and video_level_only (processed json -> pseudo-label ann jsonl)
define the pseudo-label files the trainers consume. clean_text is
already oracle-pinned; these tests compare the WHOLE output files
byte-for-byte against the reference utils_gpt3 modules run side-by-side,
including multi-choice responses, discarded (None) cleanings, empty
caption lists, and the selected_ids filter.
Ref: utils_gpt3/process_gpt3_response.py:37-60,
utils_gpt3/gpt3_response_to_jsonl.py:6-29.
"""

import importlib.util
import json
import os
import random

import pytest

REF_PROC = "/root/reference/utils_gpt3/process_gpt3_response.py"
REF_TOJL = "/root/reference/utils_gpt3/gpt3_response_to_jsonl.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_PROC),
                                reason="reference tree not present")

from vidil_tpu.pipeline.gpt3 import process_gpt3_response, video_level_only  # noqa: E402


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_proc():
    return _load(REF_PROC, "ref_gpt3_proc")


@pytest.fixture(scope="module")
def ref_tojl():
    return _load(REF_TOJL, "ref_gpt3_tojl")


TEXTS = [
    "a man is playing guitar.",
    "\n\na dog runs. second sentence here.",
    "answer\n\nObjects: cat, dog",
    "first\n\nFrame Captions: x",
    "  whitespace padded  ",
    "",
    "word word word word word word word word word",  # 9x repeat -> discarded
    "the the the the the the the the fine",
    "no trailing period",
]


def test_process_gpt3_response_files_match(ref_proc, tmp_path):
    rng = random.Random(7)
    n = 12
    idx_map = {str(i): f"vid{i}" for i in range(n)}
    responses = []
    for i in range(n):
        choices = [{"text": rng.choice(TEXTS)} for _ in range(rng.randint(1, 3))]
        responses.append({"choices": choices})

    idx_path = str(tmp_path / "q__idx_2_videoid.json")
    resp_path = str(tmp_path / "q.jsonl")
    json.dump(idx_map, open(idx_path, "w"))
    with open(resp_path, "w") as f:
        for r in responses:
            f.write(json.dumps(r) + "\n")

    out_ref = str(tmp_path / "ref.json")
    out_our = str(tmp_path / "our.json")
    ref_proc.process_gpt3_response(idx_path, resp_path, out_ref)
    process_gpt3_response(idx_path, resp_path, out_our)
    assert open(out_our).read() == open(out_ref).read()


def test_video_level_only_files_match(ref_tojl, tmp_path):
    processed = {
        "vidA": ["caption one", " padded caption "],
        "vidB": ["only one"],
        "vidC": ["skipped by filter"],
    }
    in_path = str(tmp_path / "processed_q.json")
    json.dump(processed, open(in_path, "w"))

    d_ref = str(tmp_path / "ref_out")
    d_our = str(tmp_path / "our_out")
    selected = ["vidA", "vidB"]  # vidC filtered out, as with training_ann keys
    ref_tojl.video_level_only(in_path, d_ref, selected_ids=selected)
    video_level_only(in_path, d_our, selected_ids=selected)

    fname = "processed_q.jsonl"
    assert open(os.path.join(d_our, fname)).read() == \
        open(os.path.join(d_ref, fname)).read()

    # and the no-filter path
    ref_tojl.video_level_only(in_path, d_ref + "2")
    video_level_only(in_path, d_our + "2")
    assert open(os.path.join(d_our + "2", fname)).read() == \
        open(os.path.join(d_ref + "2", fname)).read()
