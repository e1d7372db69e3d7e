"""Few-shot prefix assembly vs the LIVE reference generator script.

get_prompt_prefix decides the few-shot examples' bytes and ordering
(shot sampling by rejection, filtered→unfiltered fallback, ASR joining +
the VLEP 1024-char truncation, QA pair choice, permutate shuffling) —
all RNG-call-order-sensitive. The reference
generate_prompts_random_prefix.py is loaded standalone (its ruamel.yaml
main-only import stubbed) and both sides run under the same seed on
randomized synthetic train sets; prefixes and the __chosen_samples.json
side file must match byte-for-byte.
Ref: generate_prompts_random_prefix.py:16-123.
"""

import importlib.util
import json
import os
import random
import sys
import types

import pytest

REF = "/root/reference/generate_prompts_random_prefix.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference tree not present")

from vidil_tpu.pipeline.generate_prompts import get_prompt_prefix  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    import importlib.machinery

    for name in ("ruamel", "ruamel.yaml"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.__path__ = []
            stub.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = stub
    sys.modules["ruamel"].yaml = sys.modules["ruamel.yaml"]
    sys.path.insert(0, "/root/reference")  # visual_token_generation.prompts
    spec = importlib.util.spec_from_file_location("ref_gen_rp", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_train_data(rng, n_videos, num_frm=4):
    objects = ["dog", "cat", "ball", "tree", "car"]
    attrs = ["red", "big", "shiny", "old"]
    scenes = ["beach", "park", "street"]
    verbs = ["running", "jumping", "sitting"]
    vt, filtered, unfiltered, qa, asr = {}, {}, {}, {}, {}
    ids = [f"vid{i}" for i in range(n_videos)]
    for v in ids:
        vt[v] = {"frame_tokens": [
            {"objects": rng.sample(objects, 4), "attributes": rng.sample(attrs, 3),
             "scenes": rng.sample(scenes, 2), "verbs": rng.sample(verbs, 3)}
            for _ in range(num_frm)], "caption": f"gt caption for {v}"}
        caps = [f"frame cap {j} of {v}." for j in range(num_frm)]
        unfiltered[v] = caps
        if rng.random() < 0.7:  # some videos missing from filtered
            filtered[v] = caps[: max(1, num_frm - 1)]
        qa[v] = [{"question": f"what happens in {v}?", "answer": f"answer {v}"},
                 {"question": f"who is in {v}?", "answer": "a person"}]
        r = rng.random()
        asr[v] = ([] if r < 0.2
                  else [f"sub one of {v}", f"sub two, longer piece of {v}!"]
                  if r < 0.8 else [f"single sub {v}"])
    return vt, filtered, unfiltered, ids, qa, asr


def _config(task, permutate, tmpdir, caption_all):
    return dict(
        prompt_task=task, add_objects=True, add_events=True,
        add_attributes=True, add_scenes=True, add_original_caption=(task == "caption"),
        add_frame_captions=True, add_ASR=True, add_answer=True,
        prompt_temporal_template="temporal_natural",
        visual_token_aggregation_version="v2", topk=3,
        caption_all_video=caption_all, permutate=permutate,
        output_path=os.path.join(tmpdir, "out.jsonl"),
    )


@pytest.mark.parametrize("task", ["caption", "qa", "vlep"])
@pytest.mark.parametrize("permutate", [-1, 2])
@pytest.mark.parametrize("seed", [3, 11])
def test_prefix_matches_reference(ref, tmp_path, task, permutate, seed):
    rng = random.Random(seed * 131)
    vt, filtered, unfiltered, ids, qa, asr = _make_train_data(rng, 8)

    ref_dir = tmp_path / f"ref_{task}_{permutate}_{seed}"
    our_dir = tmp_path / f"our_{task}_{permutate}_{seed}"
    ref_dir.mkdir()
    our_dir.mkdir()

    expected = ref.get_prompt_prefix(
        vt, filtered, unfiltered, ids, "Instruction.\n",
        _config(task, permutate, str(ref_dir), caption_all=True),
        qa, asr, shot=3, seed=seed)
    got = get_prompt_prefix(
        vt, filtered, unfiltered, ids, "Instruction.\n",
        _config(task, permutate, str(our_dir), caption_all=True),
        qa, asr, shot=3, seed=seed)[0]  # ours also returns examples/chosen

    assert got == expected
    ref_side = json.load(open(ref_dir / "out__chosen_samples.json"))
    our_side = json.load(open(our_dir / "out__chosen_samples.json"))
    assert our_side == ref_side


def test_prefix_fuzz_many_seeds(ref, tmp_path):
    for i in range(25):
        rng = random.Random(9000 + i)
        vt, filtered, unfiltered, ids, qa, asr = _make_train_data(
            rng, rng.randint(4, 10), num_frm=rng.choice([1, 4]))
        task = rng.choice(["caption", "qa", "vlep"])
        d1 = tmp_path / f"r{i}"
        d2 = tmp_path / f"o{i}"
        d1.mkdir()
        d2.mkdir()
        shot = rng.randint(1, 3)
        caption_all = rng.random() < 0.5
        expected = ref.get_prompt_prefix(
            vt, filtered, unfiltered, ids, "Instr.\n",
            _config(task, -1, str(d1), caption_all=caption_all),
            qa, asr, shot=shot, seed=i)
        got = get_prompt_prefix(
            vt, filtered, unfiltered, ids, "Instr.\n",
            _config(task, -1, str(d2), caption_all=caption_all),
            qa, asr, shot=shot, seed=i)[0]
        assert got == expected, (i, task, shot)
