"""Full-pipeline integration: every stage's OUTPUT feeds the next stage's
INPUT, through the real CLIs, over one shared workspace.

The per-CLI tests validate each stage against its own contract; this
chain validates the INTER-stage contracts — the thing the reference's
`output_example/` tree is the de-facto fixture for (SURVEY.md §4):

  videos + ann ─► run_video_CapFilt ─► video_text_Cap[Filt].json
             └─► run_visual_tokenization ─► visual_tokens.json
  both ─► generate_prompts_random_prefix ─► queries.jsonl + idx map
  (fake GPT-3) ─► utils_gpt3 processing ─► processed json
  processed + gt ─► eval_video_captioning_results ─► metric.json
"""

import json
import os
import subprocess
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.testing import make_blip_decoder_ckpt, make_blip_itm_ckpt, save_torch_ckpt
from vidil_tpu.tokenizer import BlipTokenizer, write_test_clip_bpe, write_test_vocab

VIT_KW = dict(patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
IMAGE_SIZE = 32
VIDS = ["video0", "video1", "video2"]


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    import cv2
    import torch
    import yaml
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel, CLIPTextConfig, CLIPVisionConfig

    root = tmp_path_factory.mktemp("full_chain")
    videos = root / "videos"
    videos.mkdir()
    ann = {}
    for vi, vid in enumerate(VIDS):
        path = str(videos / f"{vid}.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
        for i in range(30):
            frame = np.zeros((48, 64, 3), np.uint8)
            frame[:, :, vi % 3] = (i * 7 + vi * 50) % 255
            w.write(frame)
        w.release()
        ann[vid] = [f"a dog runs in video {vi}. a cat sits"]
    ann_path = str(root / "ann.json")
    json.dump(ann, open(ann_path, "w"))

    # --- BLIP side (CapFilt) ---
    vocab_path = str(root / "vocab.txt")
    write_test_vocab(vocab_path, [
        "a", "picture", "of", "dog", "runs", "in", "video", "0", "1", "2",
        "cat", "sits", ".", "man", "plays",
    ])
    vocab_size = BlipTokenizer(vocab_path).vocab_size
    med_cfg_path = str(root / "med_config.json")
    json.dump({
        "vocab_size": vocab_size, "hidden_size": 32, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 64,
        "max_position_embeddings": 64, "encoder_width": 32, "add_cross_attention": True,
    }, open(med_cfg_path, "w"))
    vit_cfg = ViTConfig(image_size=IMAGE_SIZE, **VIT_KW)
    med_cfg = MedConfig.from_json(med_cfg_path)
    cap_ckpt = str(root / "captioner.pth")
    fil_ckpt = str(root / "filterer.pth")
    save_torch_ckpt(make_blip_decoder_ckpt(vit_cfg, med_cfg), cap_ckpt)
    save_torch_ckpt(make_blip_itm_ckpt(vit_cfg, med_cfg), fil_ckpt)

    # --- CLIP side (visual tokenization) ---
    clip_vocab, clip_merges = str(root / "clip_vocab.json"), str(root / "merges.txt")
    write_test_clip_bpe(clip_vocab, clip_merges,
                        ["a", "photo", "of", "dog", "cat", "red", "blue",
                         "beach", "park", "running", "sitting"])
    clip_vocab_size = len(json.load(open(clip_vocab)))
    text_cfg = CLIPTextConfig(vocab_size=clip_vocab_size, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=4, max_position_embeddings=16,
                              hidden_act="quick_gelu",
                              bos_token_id=clip_vocab_size - 2,
                              eos_token_id=clip_vocab_size - 1)
    vision_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                  num_hidden_layers=2, num_attention_heads=4,
                                  image_size=28, patch_size=14, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPModel(HFCLIPConfig.from_text_vision_configs(text_cfg, vision_cfg,
                                                         projection_dim=24))
    clip_ckpt = str(root / "clip.pth")
    torch.save(hf.state_dict(), clip_ckpt)
    onto = root / "onto"
    onto.mkdir()
    json.dump(["dog", "cat"], open(onto / "objects.json", "w"))
    json.dump(["red", "blue"], open(onto / "attributes.json", "w"))
    json.dump(["beach", "park"], open(onto / "scenes.json", "w"))
    json.dump(["running", "sitting"], open(onto / "verbs.json", "w"))

    # ONE config.yaml drives both model stages (the reference's pipeline
    # yamls do the same)
    config = dict(
        video_roots=str(videos), video_formats="mp4", train_ann_jsons=ann_path,
        frm_sampling_strategy="uniform", height=None, width=None,
        start_time=None, end_time=None, fps=-1,
        # CapFilt keys
        caption=True, filter=True, filter_generated_only=True,
        keep_original_caption=False, filter_mode="max_filter",
        generation_mode="beam", threshold=-1.0, num_frm_CapFilt=4,
        do_sentence_tokenization=True,
        vit="tiny", vit_config=VIT_KW, image_size=IMAGE_SIZE,
        med_config=med_cfg_path, bert_vocab=vocab_path, videos_per_batch=2,
        caption_model_ckpt=cap_ckpt, filterer_model_ckpt=fil_ckpt,
        # tokenization keys
        num_frm_visual_tokenization=4,
        clip_config=dict(image_size=28, patch_size=14, vision_hidden_size=32,
                         vision_layers=2, vision_heads=4, vision_intermediate_size=64,
                         vocab_size=clip_vocab_size, text_hidden_size=32,
                         text_layers=2, text_heads=4, text_intermediate_size=64,
                         max_text_len=16, projection_dim=24),
        clip_ckpt=clip_ckpt, clip_vocab=clip_vocab, clip_merges=clip_merges,
        ontology="custom",
        ontology_paths={
            "objects": str(onto / "objects.json"),
            "attributes": str(onto / "attributes.json"),
            "scenes": str(onto / "scenes.json"),
            "verbs": str(onto / "verbs.json"),
        },
        topk_visualize=2, prompt_version_visual_tokenization="v1",
        save_frames=False, early_stop_step=-1,
    )
    return types.SimpleNamespace(root=root, config=config, ann=ann, ann_path=ann_path)


def _cli_args(out_dir):
    return types.SimpleNamespace(output_dir=str(out_dir), seed=42, world_size=1,
                                 dist_url="env://", distributed=False, device="cpu",
                                 encoder_version="clip")


def test_full_chain(ws):
    import run_video_CapFilt as capfilt_cli
    import run_visual_tokenization as vt_cli

    # ---- stage 1: CapFilt ----
    fc_dir = ws.root / "frame_caption"
    os.makedirs(fc_dir, exist_ok=True)
    capfilt_cli.main(_cli_args(fc_dir), dict(ws.config))
    capfilt = json.load(open(fc_dir / "video_text_CapFilt.json"))
    cap = json.load(open(fc_dir / "video_text_Cap.json"))
    assert set(cap) == set(VIDS)
    assert set(capfilt) == set(VIDS)  # threshold=-1 keeps everything

    # ---- stage 2: visual tokenization ----
    vt_dir = ws.root / "visual_tokenization_clip"
    os.makedirs(vt_dir, exist_ok=True)
    vt_cli.main(_cli_args(vt_dir), dict(ws.config))
    tokens = json.load(open(vt_dir / "visual_tokens.json"))
    assert set(tokens) == set(VIDS)
    for obj in tokens.values():
        assert {"aggregated_tokens", "frame_tokens"} <= set(obj)
        assert {"objects", "attributes", "scenes", "verbs"} <= set(obj["aggregated_tokens"])

    # ---- stage 3: prompt generation consumes stages 1+2 ----
    out_dir = ws.root / "input_prompts"
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "generate_prompts_random_prefix.py"),
         "--prompt_task", "caption",
         "--visual_tokens_dir", str(vt_dir), "--frame_captions_dir", str(fc_dir),
         "--train_dataset_visual_tokens_dir", str(vt_dir),
         "--train_dataset_frame_captions_dir", str(fc_dir),
         "--trainset_json_ann", ws.ann_path,
         "--output_dir", str(out_dir),
         "--instruction_line", "Instruction: caption the video.",
         "--shot", "2", "--seed", "42"],
        capture_output=True, text=True, env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    queries = [json.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    idx_map = json.load(open(out_dir / "temp_0.0_gpt3_queries__idx_2_videoid.json"))
    assert len(queries) == len(idx_map) == len(VIDS)
    assert set(idx_map.values()) == set(VIDS)
    for q in queries:
        assert q["prompt"].startswith("Instruction: caption the video.")
        # the prompt embeds the ACTUAL stage-2 tokens and stage-1 captions
        assert "Objects:" in q["prompt"] and "Frame Captions:" in q["prompt"]

    # ---- stage 4: fake GPT-3 responses -> processing ----
    resp_path = ws.root / "gpt3_response.jsonl"
    with open(resp_path, "w") as f:
        for i in range(len(queries)):
            f.write(json.dumps({"choices": [
                {"text": f"\na dog runs in video {i}\n\nObjects: junk"}]}) + "\n")
    from vidil_tpu.pipeline.gpt3 import process_gpt3_response

    processed_path = str(ws.root / "processed.json")
    process_gpt3_response(str(out_dir / "temp_0.0_gpt3_queries__idx_2_videoid.json"),
                          str(resp_path), processed_path)
    processed = json.load(open(processed_path))
    assert set(processed) == set(VIDS)
    assert all(isinstance(v, list) and v for v in processed.values())

    # ---- stage 5: caption eval on the processed responses ----
    gt_jsonl = [{"clip_name": vid, "caption": ws.ann[vid][0]} for vid in VIDS]
    from vidil_tpu.evals.caption import video_caption_eval

    metric_path = str(ws.root / "metric.json")
    results = [{"video_id": k, "caption": v} for k, v in processed.items()]
    scores = video_caption_eval(gt_jsonl, results, output_path=metric_path)
    saved = json.load(open(metric_path))
    for n in range(1, 5):
        assert isinstance(scores[f"Bleu_{n}"], float)
    assert 0.0 < scores["Bleu_1"] <= 1.0  # 'a dog runs in video' overlaps gt
    assert saved["CIDEr"] is not None and saved["ROUGE_L"] is not None
    # offline METEOR is an explicit null in the written file, never absent
    assert "METEOR" in saved


def test_full_chain_qa(ws):
    """QA-task chain: the same stage-1/2 outputs feed --prompt_task qa
    prompt generation (per-question expansion, idx -> [video, qidx] map),
    fake sampled GPT-3 answers, and the SBERT answer-mapping eval."""
    import run_video_CapFilt as capfilt_cli
    import run_visual_tokenization as vt_cli

    fc_dir = ws.root / "frame_caption"
    vt_dir = ws.root / "visual_tokenization_clip"
    if not os.path.exists(fc_dir / "video_text_CapFilt.json"):
        os.makedirs(fc_dir, exist_ok=True)
        capfilt_cli.main(_cli_args(fc_dir), dict(ws.config))
    if not os.path.exists(vt_dir / "visual_tokens.json"):
        os.makedirs(vt_dir, exist_ok=True)
        vt_cli.main(_cli_args(vt_dir), dict(ws.config))

    # two questions for video0, one each for the others
    qa = {
        "video0": [{"question": "what runs?", "answer": "dog"},
                   {"question": "what sits?", "answer": "cat"}],
        "video1": [{"question": "what runs?", "answer": "dog"}],
        "video2": [{"question": "what sits?", "answer": "cat"}],
    }
    qa_path = str(ws.root / "qa.json")
    json.dump(qa, open(qa_path, "w"))

    out_dir = ws.root / "input_prompts_qa"
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "generate_prompts_random_prefix.py"),
         "--prompt_task", "qa", "--question_answer_path", qa_path,
         "--visual_tokens_dir", str(vt_dir), "--frame_captions_dir", str(fc_dir),
         "--train_dataset_visual_tokens_dir", str(vt_dir),
         "--train_dataset_frame_captions_dir", str(fc_dir),
         "--trainset_json_ann", ws.ann_path,
         "--output_dir", str(out_dir),
         "--instruction_line", "Instruction: answer the question.",
         "--shot", "2", "--seed", "42"],
        capture_output=True, text=True, env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    queries = [json.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    idx_map = json.load(open(out_dir / "temp_0.0_gpt3_queries__idx_2_videoid.json"))
    assert len(queries) == 4  # one prompt per (video, question) pair
    assert all(q["prompt"].rstrip().endswith("Answer:") for q in queries)
    # idx -> [video_id, qidx] (the QA remap contract)
    assert idx_map["0"][0] == "video0" and idx_map["1"][0] == "video0"
    assert [v[0] for v in idx_map.values()].count("video0") == 2

    # fake GPT-3: answer 'dog' for what-runs, 'cat' for what-sits
    resp_path = ws.root / "gpt3_qa_response.jsonl"
    with open(resp_path, "w") as f:
        for i in range(len(queries)):
            ans = "a dog" if "runs" in queries[i]["prompt"].rsplit("Question:", 1)[-1] else "a cat"
            f.write(json.dumps({"choices": [{"text": f"\n{ans}\n\nObjects: junk"}]}) + "\n")

    from vidil_tpu.evals.qa import (
        evaluate_generation_result_jsonl,
        process_gpt3_response_jsonl,
    )

    qa_out = ws.root / "qa_processed"
    os.makedirs(qa_out, exist_ok=True)
    pred_jsonl = process_gpt3_response_jsonl(str(resp_path), str(qa_out))
    gt_jsonl = str(ws.root / "qa_gt.jsonl")
    with open(gt_jsonl, "w") as f:
        for vid, pairs in qa.items():
            for p in pairs:
                f.write(json.dumps({"video_id": vid, "question": p["question"],
                                    "answer": p["answer"]}) + "\n")

    def fake_encoder(texts):
        # deterministic: map dog-ish and cat-ish strings to orthogonal axes
        out = np.zeros((len(texts), 4), np.float32)
        for i, t in enumerate(texts):
            out[i, 0 if "dog" in t else 1] = 1.0
        return out

    acc = evaluate_generation_result_jsonl(
        pred_jsonl, gt_jsonl, ["dog", "cat"], idx_map, encoder=fake_encoder)
    assert acc == 1.0  # every faked answer maps to the right closed answer


def test_full_chain_vlep(ws):
    """VLEP multichoice chain: stage-1/2 outputs + example-id-keyed anns
    feed the VLEP prompt CLI, fake GPT-3 picks, the nearest-event mapping
    eval, and dev accuracy."""
    import run_video_CapFilt as capfilt_cli
    import run_visual_tokenization as vt_cli

    fc_dir = ws.root / "frame_caption"
    vt_dir = ws.root / "visual_tokenization_clip"
    if not os.path.exists(fc_dir / "video_text_CapFilt.json"):
        os.makedirs(fc_dir, exist_ok=True)
        capfilt_cli.main(_cli_args(fc_dir), dict(ws.config))
    if not os.path.exists(vt_dir / "visual_tokens.json"):
        os.makedirs(vt_dir, exist_ok=True)
        vt_cli.main(_cli_args(vt_dir), dict(ws.config))

    # train ann answers are the EVENT STRINGS (the prompt embeds them,
    # reference prompts.py:309 calls .strip()); the target/dev ann answers
    # are INT indices (eval_vlep.py accuracy does int(ann['answer']))
    train_ann = {str(i): {"video_id": vid, "events": ["the dog runs", "the cat sits"],
                          "answer": ["the dog runs", "the cat sits"][i % 2]}
                 for i, vid in enumerate(VIDS)}
    target_ann = {"10": {"video_id": "video0", "events": ["the dog runs", "the cat sits"],
                         "answer": 0},
                  "11": {"video_id": "video1", "events": ["the dog runs", "the cat sits"],
                         "answer": 1}}
    train_path = str(ws.root / "vlep_train_ann.json")
    target_path = str(ws.root / "vlep_target_ann.json")
    json.dump(train_ann, open(train_path, "w"))
    json.dump(target_ann, open(target_path, "w"))

    out_dir = ws.root / "input_prompts_vlep"
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "generate_prompts_random_prefix_vlep_multichoice.py"),
         "--prompt_task", "vlep",
         "--visual_tokens_dir", str(vt_dir), "--frame_captions_dir", str(fc_dir),
         "--train_dataset_visual_tokens_dir", str(vt_dir),
         "--train_dataset_frame_captions_dir", str(fc_dir),
         "--trainset_json_ann", train_path, "--target_json_ann", target_path,
         "--output_dir", str(out_dir),
         "--instruction_line", "Instruction: what happens next? Pick A or B.",
         "--shot", "2", "--seed", "42"],
        capture_output=True, text=True, env=env, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    queries = [json.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    idx_map = json.load(open(out_dir / "temp_0.0_gpt3_queries__idx_2_example_id.json"))
    assert len(queries) == 2
    assert set(idx_map.values()) == {"10", "11"}
    assert all("A:" in q["prompt"] and "B:" in q["prompt"] for q in queries)

    # fake GPT-3 answers: example 10 -> the A event, example 11 -> the B event
    results = {"10": "the dog runs", "11": "the cat sits"}

    from vidil_tpu.evals.vlep import eval_multichoice, vlep_accuracy

    def fake_encoder(texts):
        out = np.zeros((len(texts), 4), np.float32)
        for i, t in enumerate(texts):
            out[i, 0 if "dog" in t else 1] = 1.0
        return out

    pred_path = str(ws.root / "vlep_preds.jsonl")
    lines = eval_multichoice(results, target_ann, pred_path, encoder=fake_encoder)
    assert {l["example_id"]: l["pred_ans"] for l in lines} == {10: 0, 11: 1}
    assert vlep_accuracy(lines, target_ann) == 1.0
    # CodaLab submission jsonl written
    assert [json.loads(l)["example_id"] for l in open(pred_path)] == [10, 11]


@pytest.mark.slow
def test_full_chain_pseudo_label_training(ws):
    """Closes the last inter-stage contract: processed GPT-3 responses ->
    pseudo-label jsonl (utils_gpt3 video_level_only) -> retrieval
    fine-tuning CLI consuming that exact jsonl (VidIL's secondary
    capability, reference README.md:57-73 + gpt3_response_to_jsonl)."""
    import train_retrieval_video as train_cli

    processed_path = str(ws.root / "processed.json")
    if not os.path.exists(processed_path):
        # stage 4 output from test_full_chain; regenerate standalone
        json.dump({vid: [f"a dog runs in video {i}"] for i, vid in enumerate(VIDS)},
                  open(processed_path, "w"))

    from vidil_tpu.pipeline.gpt3 import video_level_only

    pseudo_jsonl = video_level_only(processed_path, str(ws.root / "pseudo_label_ann"))
    lines = [json.loads(l) for l in open(pseudo_jsonl)]
    assert {l["clip_name"] for l in lines} == set(VIDS)
    assert [l["sen_id"] for l in lines] == list(range(len(lines)))

    config = dict(
        dataset="msrvtt",
        train_video_root=str(ws.root / "videos"),
        train_ann_jsonl=pseudo_jsonl,
        eval_video_root=str(ws.root / "videos"),
        val_ann_jsonl=pseudo_jsonl, test_ann_jsonl=pseudo_jsonl,
        num_frm_train=2, num_frm_test=2, frm_sampling_strategy="uniform",
        height=None, width=None, start_time=None, end_time=None, fps=-1,
        video_representation="concat_frame",
        pretrained="", bert_vocab=str(ws.root / "vocab.txt"),
        vit="tiny", vit_config=VIT_KW, med_config=str(ws.root / "med_config.json"),
        batch_size_train=3, batch_size_test=3, init_lr=1e-5,
        image_size=IMAGE_SIZE, queue_size=6, alpha=0.4, k_test=2,
        negative_all_rank=True, weight_decay=0.05, min_lr=0, max_epoch=1,
    )
    out_dir = str(ws.root / "pseudo_train_out")
    os.makedirs(out_dir, exist_ok=True)
    args = types.SimpleNamespace(output_dir=out_dir, evaluate=False, seed=42,
                                 world_size=1, dist_url="env://",
                                 distributed=False, device="cpu")
    train_cli.main(args, config)
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert "train_loss" in log[-1] or "val_r_mean" in log[-1]
