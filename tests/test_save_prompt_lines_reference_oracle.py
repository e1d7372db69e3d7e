"""save_prompt_lines vs BOTH live reference generator variants.

The output jsonl lines ARE the GPT-3 request bodies — the pipeline's
external contract. The fixed_prefix and random_prefix scripts carry
subtly different ASR handling (fixed: plain join + ''->'no subtitle.'
check; random: VLEP 1024-char truncation, no empty-string check); our
single parameterized implementation must reproduce each variant's files
byte-for-byte (queries jsonl + __idx_2_videoid.json), including the QA
per-pair expansion and the filtered->unfiltered fallback.
Ref: generate_prompts_fixed_prefix.py:15-90,
generate_prompts_random_prefix.py:125-205.
"""

import importlib.util
import os
import random
import sys
import types

import pytest

REF_FIXED = "/root/reference/generate_prompts_fixed_prefix.py"
REF_RANDOM = "/root/reference/generate_prompts_random_prefix.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_FIXED),
                                reason="reference tree not present")

from vidil_tpu.pipeline.generate_prompts import save_prompt_lines  # noqa: E402
from vidil_tpu.pipeline.prompts import Prompt  # noqa: E402


def _load(path, name):
    import importlib.machinery

    for mod in ("ruamel", "ruamel.yaml"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            stub.__path__ = []
            stub.__spec__ = importlib.machinery.ModuleSpec(mod, loader=None)
            sys.modules[mod] = stub
    sys.modules["ruamel"].yaml = sys.modules["ruamel.yaml"]
    sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def refs():
    return {"fixed": _load(REF_FIXED, "ref_gen_fixed"),
            "random": _load(REF_RANDOM, "ref_gen_random2")}


def _data(rng, n=6, with_empty_asr=True):
    objects = ["dog", "cat", "ball", "tree"]
    attrs = ["red", "big", "shiny"]
    scenes = ["beach", "park"]
    verbs = ["running", "jumping", "sitting"]
    vt, filtered, unfiltered, qa, asr = {}, {}, {}, {}, {}
    for i in range(n):
        v = f"vid{i}"
        vt[v] = {"frame_tokens": [
            {"objects": rng.sample(objects, 3), "attributes": rng.sample(attrs, 3),
             "scenes": rng.sample(scenes, 2), "verbs": rng.sample(verbs, 3)}
            for _ in range(4)], "caption": f"gt {v}"}
        caps = [f"cap {j} {v}." for j in range(4)]
        unfiltered[v] = caps
        if i % 3 != 2:
            filtered[v] = caps[:3]
        if i % 4 != 3:
            qa[v] = [{"question": f"q1 {v}?", "answer": f"a1 {v}"},
                     {"question": f"q2 {v}?", "answer": "a2"}]
        choices = [[], [f"sub {v} one", f"longer subtitle {v} two!"],
                   ["x " * 700]]  # >1024 chars to hit the vlep truncation
        if with_empty_asr:
            choices.append([""])  # '' join -> the fixed-variant quirk
        asr[v] = rng.choice(choices)
    return vt, filtered, unfiltered, qa, asr


def _cfg(task, tmpdir):
    return dict(
        prompt_task=task, add_objects=True, add_events=True,
        add_attributes=True, add_scenes=True,
        add_original_caption=(task == "caption"), add_frame_captions=True,
        add_ASR=True, add_answer=True,
        prompt_temporal_template="temporal_natural",
        visual_token_aggregation_version="v2", topk=3,
        caption_all_video=True,
        request_body={"engine": "text-davinci-002", "max_tokens": 40},
        output_path=os.path.join(tmpdir, "q.jsonl"),
    )


@pytest.mark.parametrize("variant,kw", [
    ("fixed", dict(asr_empty_values=("",), vlep_truncate=False)),
    ("random", dict(asr_empty_values=(), vlep_truncate=True)),
])
@pytest.mark.parametrize("task", ["caption", "qa", "vlep"])
@pytest.mark.parametrize("seed", [1, 5])
def test_save_prompt_lines_matches_variant(refs, tmp_path, variant, kw, task, seed):
    rng = random.Random(seed * 977)
    vt, filtered, unfiltered, qa, asr = _data(rng)
    d_ref = tmp_path / f"ref_{variant}_{task}_{seed}"
    d_our = tmp_path / f"our_{variant}_{task}_{seed}"
    d_ref.mkdir()
    d_our.mkdir()

    ref_mod = refs[variant]
    ref_mod.save_prompt_lines(vt, filtered, unfiltered,
                              ref_mod.Prompt("Instr.\n\n", seed=3),
                              _cfg(task, str(d_ref)), qa, asr)
    save_prompt_lines(vt, filtered, unfiltered, Prompt("Instr.\n\n", seed=3),
                      _cfg(task, str(d_our)), qa, asr, **kw)

    for fname in ("q.jsonl", "q__idx_2_videoid.json"):
        ours = open(d_our / fname).read()
        theirs = open(d_ref / fname).read()
        assert ours == theirs, (variant, task, fname)
