"""Prompt layer parity vs the reference implementation itself.

visual_token_generation/prompts.py and utils_gpt3/process_gpt3_response.py
are pure Python (stdlib + numpy), so the strongest possible test is
string-identical comparison against the reference modules imported from
/root/reference (read-only oracle; no reference code is shipped).
"""

import importlib.util
import json
import os
import random
import sys

import numpy as np
import pytest

from vidil_tpu.pipeline.gpt3 import clean_text, process_gpt3_response, video_level_only
from vidil_tpu.pipeline.prompts import Prompt

REF_PROMPTS = "/root/reference/visual_token_generation/prompts.py"
REF_GPT3 = "/root/reference/utils_gpt3/process_gpt3_response.py"


def load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


ref_prompts = pytest.importorskip("numpy") and (
    load_ref_module(REF_PROMPTS, "ref_prompts") if os.path.exists(REF_PROMPTS) else None
)


def make_visual_tokens(seed=0, num_frm=8, caption="a ground truth caption"):
    rng = random.Random(seed)
    objects = ["dog", "cat", "ball", "tree", "car", "house"]
    attrs = ["red", "big", "shiny", "old", "small"]
    scenes = ["beach", "park", "street"]
    verbs = ["running.", "jumping", "sitting", "eating"]
    frame_tokens = []
    for _ in range(num_frm):
        frame_tokens.append({
            "objects": rng.sample(objects, 5),
            "attributes": rng.sample(attrs, 5),
            "scenes": rng.sample(scenes, 3),
            "verbs": rng.sample(verbs, 4),
        })
    return {"frame_tokens": frame_tokens, "caption": caption}


def base_config(**kw):
    cfg = dict(
        prompt_task="caption", add_objects=True, add_events=True,
        add_attributes=True, add_scenes=True, add_original_caption=True,
        add_frame_captions=True, add_ASR=True, add_answer=True,
        prompt_temporal_template="temporal_natural",
        visual_token_aggregation_version="v2", topk=4,
    )
    cfg.update(kw)
    return cfg


FRAME_CAPTIONS = {
    "vidA": ["a dog runs.", "a cat sits", "trees in a park.", "a red ball", "extra one.", "sixth"],
    "vidB": ["one caption"],
    "vidC": ["c1.", "c2", "c3"],
}


@pytest.mark.skipif(ref_prompts is None, reason="reference not mounted")
@pytest.mark.parametrize("template", ["temporal_natural", "temporal_index", "static"])
@pytest.mark.parametrize("agg", ["v2", "v3"])
@pytest.mark.parametrize("task", ["caption", "qa", "vlep"])
@pytest.mark.parametrize("vid", ["vidA", "vidB", "vidC"])
def test_construct_prompt_parity(template, agg, task, vid):
    vt = make_visual_tokens(seed=hash((template, agg, vid)) % 1000)
    cfg = base_config(prompt_temporal_template=template,
                      visual_token_aggregation_version=agg, prompt_task=task)
    q = "what is happening?" if task == "qa" else None
    a = "a dog" if task == "qa" else None

    ours = Prompt("Instruction line.\n\n", seed=7)
    ref = ref_prompts.Prompt("Instruction line.\n\n", seed=7)
    got = ours.construct_prompt(vid, vt, FRAME_CAPTIONS, cfg, q, a, asr="hello there.")
    # reconstruct reference with same RNG stream (construct_prompt may shuffle)
    random.seed(7)
    expected = ref.construct_prompt(vid, json.loads(json.dumps(vt)), FRAME_CAPTIONS, cfg, q, a, asr="hello there.")
    # re-run ours with reseeded RNG for a fair shuffle comparison
    random.seed(7)
    got = ours.construct_prompt(vid, json.loads(json.dumps(vt)), FRAME_CAPTIONS, cfg, q, a, asr="hello there.")
    assert got == expected


@pytest.mark.skipif(ref_prompts is None, reason="reference not mounted")
def test_construct_prompt_parity_list_caption_shuffle():
    """Original caption as a list -> seeded random.shuffle must align."""
    vt = make_visual_tokens(seed=3, caption=["cap one", "cap two", "cap three"])
    cfg = base_config()
    random.seed(11)
    ref = ref_prompts.Prompt("", seed=11).construct_prompt(
        "vidA", json.loads(json.dumps(vt)), FRAME_CAPTIONS, cfg, None, None, None)
    random.seed(11)
    got = Prompt("", seed=11).construct_prompt(
        "vidA", json.loads(json.dumps(vt)), FRAME_CAPTIONS, cfg, None, None, None)
    assert got == ref


@pytest.mark.skipif(ref_prompts is None, reason="reference not mounted")
def test_vlep_multichoice_parity():
    vt = make_visual_tokens(seed=5)
    cfg = base_config(prompt_task="vlep")
    ex = {"events": ["the dog barks", "the cat leaves"], "answer": "A"}
    got = Prompt("P.\n\n", seed=1).construct_prompt(
        "vidA", vt, FRAME_CAPTIONS, cfg, None, None, "some dialogue.", vlep_example=ex)
    ref = ref_prompts.Prompt("P.\n\n", seed=1).construct_prompt(
        "vidA", vt, FRAME_CAPTIONS, cfg, None, None, "some dialogue.", vlep_example=ex)
    assert got == ref


def test_generator_end_to_end(tmp_path):
    """save_prompt_lines + get_prompt_prefix produce the reference file set."""
    from vidil_tpu.pipeline.generate_prompts import (
        get_prompt_prefix,
        save_prompt_lines,
    )

    visual_tokens = {v: make_visual_tokens(seed=i) for i, v in enumerate(["vidA", "vidB", "vidC"])}
    filtered = {"vidA": FRAME_CAPTIONS["vidA"], "vidC": FRAME_CAPTIONS["vidC"]}
    unfiltered = FRAME_CAPTIONS
    out_path = str(tmp_path / "temp_0.0_q.jsonl")
    cfg = base_config(add_ASR=False, add_original_caption=False, add_answer=False)
    cfg.update(output_path=out_path, caption_all_video=True, permutate=-1,
               request_body={"engine": "text-davinci-002", "prompt": "", "temperature": 0.0,
                             "max_tokens": 64, "top_p": 1, "frequency_penalty": 0, "presence_penalty": 0})

    cfg_prefix = dict(cfg, add_original_caption=True, add_answer=True)
    prefixes, examples, chosen = get_prompt_prefix(
        visual_tokens, filtered, unfiltered, sorted(visual_tokens.keys()),
        "Instruction.", cfg_prefix, None, None, shot=2, seed=42)
    assert len(prefixes) == 1 and len(examples) == 2
    assert os.path.exists(str(tmp_path / "temp_0.0_q__chosen_samples.json"))
    # determinism
    prefixes2, _, _ = get_prompt_prefix(
        visual_tokens, filtered, unfiltered, sorted(visual_tokens.keys()),
        "Instruction.", cfg_prefix, None, None, shot=2, seed=42)
    assert prefixes == prefixes2

    save_prompt_lines(visual_tokens, filtered, unfiltered, Prompt(prefixes[0], seed=42),
                      cfg, None, None)
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) == 3  # caption_all_video=True covers vidB via fallback
    assert all(l["engine"] == "text-davinci-002" for l in lines)
    assert all(l["prompt"].startswith("Instruction.") for l in lines)
    assert all(l["prompt"].rstrip().endswith("Video Caption:") for l in lines)
    idx_map = json.load(open(str(tmp_path / "temp_0.0_q__idx_2_videoid.json")))
    assert idx_map == {"0": "vidA", "1": "vidB", "2": "vidC"}


def test_in_context_selection(tmp_path):
    from vidil_tpu.pipeline.generate_prompts import (
        save_prompt_lines_with_in_context_selection,
    )

    visual_tokens = {v: make_visual_tokens(seed=i) for i, v in enumerate(["vidA", "vidB"])}
    out_path = str(tmp_path / "temp_0.0_sel.jsonl")
    cfg = base_config(add_ASR=False, add_original_caption=False, add_answer=False)
    cfg.update(output_path=out_path, caption_all_video=True,
               request_body={"engine": "text-davinci-002", "prompt": "", "n": 1,
                             "temperature": 0.0, "max_tokens": 64, "top_p": 1,
                             "frequency_penalty": 0, "presence_penalty": 0})

    examples = [
        "Frame Captions: First, a dog runs.\nVideo Caption: dog running",
        "Frame Captions: First, a cat sits.\nVideo Caption: cat sitting",
        "Frame Captions: First, a car drives.\nVideo Caption: car driving",
    ]

    def fake_encoder(texts):
        # deterministic hash embedding
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.RandomState(abs(hash(t)) % (2**31))
            out[i] = rng.randn(16)
        return out

    save_prompt_lines_with_in_context_selection(
        visual_tokens, FRAME_CAPTIONS, FRAME_CAPTIONS, 2, "Instruction.",
        examples, cfg, None, None, comparing_target="caption", encoder=fake_encoder)
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) == 2
    for l in lines:
        # exactly 2 selected examples + query
        assert l["prompt"].count("Video Caption:") == 3


def test_gpt3_processing_roundtrip(tmp_path):
    idx_map = {"0": "vidA", "1": "vidB"}
    responses = [
        {"choices": [{"text": "\n a dog runs on the beach\n\nObjects: junk"}]},
        {"choices": [{"text": "cats sitting\n\nFrame Captions: junk"}, {"text": "  "}]},
    ]
    idx_path = str(tmp_path / "idx.json")
    resp_path = str(tmp_path / "resp.jsonl")
    json.dump(idx_map, open(idx_path, "w"))
    with open(resp_path, "w") as f:
        for r in responses:
            f.write(json.dumps(r) + "\n")
    out_path = str(tmp_path / "processed.json")
    process_gpt3_response(idx_path, resp_path, out_path)
    out = json.load(open(out_path))
    assert out == {"vidA": ["a dog runs on the beach"], "vidB": ["cats sitting"]}

    jsonl_path = video_level_only(out_path, str(tmp_path / "pseudo"))
    lines = [json.loads(l) for l in open(jsonl_path)]
    assert lines == [
        {"caption": "a dog runs on the beach", "clip_name": "vidA", "sen_id": 0},
        {"caption": "cats sitting", "clip_name": "vidB", "sen_id": 1},
    ]


@pytest.mark.skipif(not os.path.exists(REF_GPT3), reason="reference not mounted")
@pytest.mark.parametrize("text", [
    "\n\nhello world", "result\n\nObjects: a. b.", "cap\n\nFrame Captions: x",
    "  padded  ", "a a a a a a a a a repeated",
])
def test_clean_text_parity(text):
    ref_gpt3 = load_ref_module(REF_GPT3, "ref_gpt3")
    assert clean_text(text) == ref_gpt3.clean_text(text)
    assert clean_text(text, True) == ref_gpt3.clean_text(text, True)


def test_fixed_prefix_cli_subprocess(tmp_path):
    """The root generate_prompts_fixed_prefix.py CLI end-to-end (argparse
    wiring, file IO contract)."""
    import subprocess
    import sys

    vt_dir = tmp_path / "vt"
    fc_dir = tmp_path / "fc"
    out_dir = tmp_path / "out"
    vt_dir.mkdir(); fc_dir.mkdir()
    visual_tokens = {v: make_visual_tokens(seed=i) for i, v in enumerate(["vidA", "vidB"])}
    json.dump(visual_tokens, open(vt_dir / "visual_tokens.json", "w"))
    json.dump(FRAME_CAPTIONS, open(fc_dir / "video_text_CapFilt.json", "w"))
    json.dump(FRAME_CAPTIONS, open(fc_dir / "video_text_Cap.json", "w"))
    prefix = tmp_path / "prefix.txt"
    prefix.write_text("Instruction: describe the video.\n")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "generate_prompts_fixed_prefix.py"),
         "--visual_tokens_dir", str(vt_dir), "--frame_captions_dir", str(fc_dir),
         "--output_dir", str(out_dir), "--prompt_prefix", str(prefix),
         "--prompt_task", "caption"],
        capture_output=True, text=True, env=env, timeout=240)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [json.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    assert len(lines) == 2
    assert all(l["prompt"].startswith("Instruction: describe the video.") for l in lines)
    idx = json.load(open(out_dir / "temp_0.0_gpt3_queries__idx_2_videoid.json"))
    assert set(idx.values()) == {"vidA", "vidB"}


def _run_cli(script, args_list, timeout=240):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    proc = subprocess.run([sys.executable, os.path.join(repo, script)] + args_list,
                          capture_output=True, text=True, env=env, timeout=timeout)
    assert proc.returncode == 0, f"{script}: {proc.stderr[-3000:]}"
    return proc


def _write_stage(d, vids):
    d.mkdir()
    json.dump({v: make_visual_tokens(seed=i) for i, v in enumerate(vids)},
              open(d / "visual_tokens.json", "w"))
    caps = {v: [f"frame caption for {v}"] for v in vids}
    json.dump(caps, open(d / "video_text_CapFilt.json", "w"))
    json.dump(caps, open(d / "video_text_Cap.json", "w"))


def test_random_prefix_cli_subprocess(tmp_path):
    test_stage, train_stage = tmp_path / "test_stage", tmp_path / "train_stage"
    _write_stage(test_stage, ["q1", "q2"])
    _write_stage(train_stage, ["t1", "t2", "t3"])
    json.dump({v: [] for v in ["t1", "t2", "t3"]}, open(tmp_path / "ann.json", "w"))
    out_dir = tmp_path / "out"
    _run_cli("generate_prompts_random_prefix.py", [
        "--prompt_task", "caption",
        "--visual_tokens_dir", str(test_stage), "--frame_captions_dir", str(test_stage),
        "--train_dataset_visual_tokens_dir", str(train_stage),
        "--train_dataset_frame_captions_dir", str(train_stage),
        "--trainset_json_ann", str(tmp_path / "ann.json"),
        "--output_dir", str(out_dir),
        "--instruction_line", "Instruction: caption it.",
        "--shot", "2", "--seed", "42"])
    lines = [json.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    assert len(lines) == 2
    assert all(l["prompt"].startswith("Instruction: caption it.") for l in lines)


def test_vlep_multichoice_cli_subprocess(tmp_path):
    test_stage, train_stage = tmp_path / "test_stage", tmp_path / "train_stage"
    _write_stage(test_stage, ["v1", "v2"])
    _write_stage(train_stage, ["t1", "t2", "t3"])
    train_ann = {f"ex{i}": {"video_id": f"t{i+1}", "events": ["one thing", "another"],
                            "answer": "one thing"} for i in range(3)}
    target_ann = {"q0": {"video_id": "v1", "events": ["a", "b"]},
                  "q1": {"video_id": "v2", "events": ["c", "d"]}}
    json.dump(train_ann, open(tmp_path / "train_ann.json", "w"))
    json.dump(target_ann, open(tmp_path / "target_ann.json", "w"))
    out_dir = tmp_path / "out"
    _run_cli("generate_prompts_random_prefix_vlep_multichoice.py", [
        "--prompt_task", "vlep",
        "--visual_tokens_dir", str(test_stage), "--frame_captions_dir", str(test_stage),
        "--train_dataset_visual_tokens_dir", str(train_stage),
        "--train_dataset_frame_captions_dir", str(train_stage),
        "--trainset_json_ann", str(tmp_path / "train_ann.json"),
        "--target_json_ann", str(tmp_path / "target_ann.json"),
        "--output_dir", str(out_dir),
        "--instruction_line", "Instruction: pick A or B.",
        "--shot", "2", "--seed", "42"])
    lines = [json.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    assert len(lines) == 2
    assert all("A:" in l["prompt"] and "B:" in l["prompt"] for l in lines)
    idx = json.load(open(out_dir / "temp_0.0_gpt3_queries__idx_2_example_id.json"))
    assert set(idx.values()) == {"q0", "q1"}


@pytest.mark.skipif(ref_prompts is None, reason="reference not mounted")
def test_construct_prompt_fuzz_configs():
    """Randomized sweep over the add_* flag combinations, topk, frame
    counts and asr/question variants — the parametrized grid above covers
    template x aggregation x task but holds the 8 boolean flags fixed;
    200 random configs close that gap against the live reference module."""
    rng = random.Random(4242)
    flags = ["add_objects", "add_events", "add_attributes", "add_scenes",
             "add_original_caption", "add_frame_captions", "add_ASR",
             "add_answer"]
    for i in range(200):
        cfg = base_config(
            prompt_temporal_template=rng.choice(
                ["temporal_natural", "temporal_index", "static"]),
            visual_token_aggregation_version=rng.choice(["v2", "v3"]),
            prompt_task=rng.choice(["caption", "qa", "vlep"]),
            topk=rng.choice([1, 3, 4, 6]),
        )
        for f in flags:
            cfg[f] = rng.random() < 0.5
        vid = rng.choice(list(FRAME_CAPTIONS))
        vt = make_visual_tokens(seed=i, num_frm=rng.choice([1, 4, 8]),
                                caption=rng.choice(
                                    ["a ground truth caption",
                                     ["list cap one", "list cap two"]]))
        q = "what is happening?" if cfg["prompt_task"] == "qa" else None
        a = "a dog" if cfg["prompt_task"] == "qa" else None
        asr = rng.choice(["hello there.", "", None])

        ours = Prompt("Instruction line.\n\n", seed=7)
        ref = ref_prompts.Prompt("Instruction line.\n\n", seed=7)
        # some combos are OUT OF the reference's contract: an empty
        # aggregated category hits its fixed-arity TEMPLATE_FUNC table
        # (KeyError at prompts.py:147-157). There parity is not string
        # equality — our general template functions degrade gracefully
        # (documented divergence: ours produces a well-formed prompt where
        # the reference would crash); in-contract inputs must be
        # string-identical.
        random.seed(1000 + i)
        try:
            expected = ref.construct_prompt(vid, json.loads(json.dumps(vt)),
                                            FRAME_CAPTIONS, cfg, q, a, asr=asr)
        except (KeyError, IndexError):
            # reference crash on a degenerate (empty) category: KeyError
            # from TEMPLATE_FUNC[0], IndexError from scenes[0]
            expected = None
        random.seed(1000 + i)
        got = ours.construct_prompt(vid, json.loads(json.dumps(vt)),
                                    FRAME_CAPTIONS, cfg, q, a, asr=asr)
        assert isinstance(got, str) and got.startswith("Instruction line.")
        if expected is not None:
            assert got == expected, (i, cfg)
