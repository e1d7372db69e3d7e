"""MPNet/SBERT parity vs HF MPNetModel built from config."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vidil_tpu.models.mpnet import (
    MPNetConfig,
    convert_mpnet,
    mpnet_forward,
    sbert_embed,
)

CFG = MPNetConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                  intermediate_size=64, max_position_embeddings=64)


@pytest.fixture(scope="module")
def hf_mpnet():
    from transformers import MPNetConfig as HFCfg
    from transformers import MPNetModel

    cfg = HFCfg(vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
                num_hidden_layers=CFG.num_layers, num_attention_heads=CFG.num_heads,
                intermediate_size=CFG.intermediate_size,
                max_position_embeddings=CFG.max_position_embeddings,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    m = MPNetModel(cfg, add_pooling_layer=False)
    m.eval()
    return m


def test_mpnet_forward_parity(hf_mpnet):
    params = convert_mpnet({k: v for k, v in hf_mpnet.state_dict().items()}, CFG)
    rng = np.random.RandomState(0)
    ids = rng.randint(4, CFG.vocab_size, size=(2, 9)).astype(np.int32)
    ids[1, 7:] = 1  # pad
    mask = (ids != 1).astype(np.int32)
    with torch.no_grad():
        ref = hf_mpnet(torch.tensor(ids, dtype=torch.long),
                       attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(mpnet_forward(params, jnp.asarray(ids), jnp.asarray(mask), CFG))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_sbert_embed_normalized(hf_mpnet):
    params = convert_mpnet({k: v for k, v in hf_mpnet.state_dict().items()}, CFG)
    rng = np.random.RandomState(1)
    ids = rng.randint(4, CFG.vocab_size, size=(3, 8)).astype(np.int32)
    mask = np.ones_like(ids)
    emb = np.asarray(sbert_embed(params, jnp.asarray(ids), jnp.asarray(mask), CFG))
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)
    # mean pooling respects the mask
    mask2 = mask.copy()
    mask2[:, 4:] = 0
    emb2 = np.asarray(sbert_embed(params, jnp.asarray(ids), jnp.asarray(mask2), CFG))
    assert not np.allclose(emb, emb2)


def _write_mpnet_vocab(path):
    words = ["<s>", "<pad>", "</s>", "<unk>", "[UNK]",
             "a", "video", "of", "cat", "##s", "dog", "running", "the",
             "person", "play", "##ing", "!", "<mask>"]
    with open(path, "w") as f:
        f.write("\n".join(words) + "\n")
    return words


def test_mpnet_tokenizer_hf_parity(tmp_path):
    from transformers import MPNetTokenizer as HFTok

    from vidil_tpu.tokenizer import MPNetTokenizer

    vocab = str(tmp_path / "vocab.txt")
    _write_mpnet_vocab(vocab)
    ours = MPNetTokenizer(vocab)
    hf = HFTok(vocab_file=vocab)

    texts = ["a video of cats", "the dog running!", "person playing",
             "A Video OF unknownword dogs"]
    got = ours(texts, padding="max_length", truncation=True, max_length=12)
    ref = hf(texts, padding="max_length", truncation=True, max_length=12)
    np.testing.assert_array_equal(got.input_ids, np.asarray(ref["input_ids"], np.int32))
    np.testing.assert_array_equal(got.attention_mask, np.asarray(ref["attention_mask"], np.int32))
    assert ours.pad_token_id == hf.pad_token_id == 1
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id


def test_make_sbert_encoder_local_dir(tmp_path, hf_mpnet):
    """make_sbert_encoder(<local HF snapshot dir>) runs the TPU-native
    MPNet path and matches torch MPNetModel + mean-pool + L2-normalize."""
    import json

    from transformers import MPNetTokenizer as HFTok

    from vidil_tpu.pipeline.generate_prompts import make_sbert_encoder

    root = tmp_path / "snap"
    root.mkdir()
    _write_mpnet_vocab(str(root / "vocab.txt"))
    json.dump({"vocab_size": CFG.vocab_size, "hidden_size": CFG.hidden_size,
               "num_hidden_layers": CFG.num_layers,
               "num_attention_heads": CFG.num_heads,
               "intermediate_size": CFG.intermediate_size,
               "max_position_embeddings": CFG.max_position_embeddings},
              open(root / "config.json", "w"))
    torch.save(hf_mpnet.state_dict(), str(root / "pytorch_model.bin"))

    enc = make_sbert_encoder(str(root), max_length=12)
    texts = ["a video of cats", "the dog running!"]
    got = enc(texts)
    assert got.shape == (2, CFG.hidden_size)

    hf_tok = HFTok(vocab_file=str(root / "vocab.txt"))
    batch = hf_tok(texts, padding="max_length", truncation=True, max_length=12,
                   return_tensors="pt")
    with torch.no_grad():
        hidden = hf_mpnet(batch["input_ids"], attention_mask=batch["attention_mask"]).last_hidden_state
    m = batch["attention_mask"][:, :, None].float()
    pooled = (hidden * m).sum(1) / m.sum(1)
    ref = (pooled / pooled.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-2)  # bf16 matmuls
    # cosine agreement must be essentially exact
    assert float((got * ref).sum(-1).min()) > 0.999


def test_in_context_selection_cli_with_local_sbert(tmp_path, hf_mpnet):
    """Drive generate_prompts_random_prefix_in_context_selection.py as a
    subprocess with --sbert_model pointing at a LOCAL MPNet snapshot —
    the full TPU-native in-context-selection chain."""
    import json as J
    import os
    import random
    import subprocess
    import sys

    # local MPNet snapshot
    snap = tmp_path / "mpnet"
    snap.mkdir()
    _write_mpnet_vocab(str(snap / "vocab.txt"))
    J.dump({"vocab_size": CFG.vocab_size, "hidden_size": CFG.hidden_size,
            "num_hidden_layers": CFG.num_layers,
            "num_attention_heads": CFG.num_heads,
            "intermediate_size": CFG.intermediate_size,
            "max_position_embeddings": CFG.max_position_embeddings},
           open(snap / "config.json", "w"))
    torch.save(hf_mpnet.state_dict(), str(snap / "pytorch_model.bin"))

    def make_vt(seed):
        rng = random.Random(seed)
        fts = [{"objects": rng.sample(["dog", "cat", "ball"], 2),
                "attributes": rng.sample(["red", "big"], 2),
                "scenes": ["park"], "verbs": rng.sample(["running", "sitting"], 2)}
               for _ in range(3)]
        return {"frame_tokens": fts, "caption": [f"a video of cats {seed}"]}

    def write_stage(d, vids):
        d.mkdir()
        J.dump({v: make_vt(i) for i, v in enumerate(vids)}, open(d / "visual_tokens.json", "w"))
        caps = {v: [f"the dog running {v}"] for v in vids}
        J.dump(caps, open(d / "video_text_CapFilt.json", "w"))
        J.dump(caps, open(d / "video_text_Cap.json", "w"))

    write_stage(tmp_path / "test_stage", ["q1", "q2"])
    write_stage(tmp_path / "train_stage", ["t1", "t2", "t3"])
    J.dump({v: [] for v in ["t1", "t2", "t3"]}, open(tmp_path / "train_ann.json", "w"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=repo)
    out_dir = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "generate_prompts_random_prefix_in_context_selection.py"),
         "--prompt_task", "caption",
         "--visual_tokens_dir", str(tmp_path / "test_stage"),
         "--frame_captions_dir", str(tmp_path / "test_stage"),
         "--train_dataset_visual_tokens_dir", str(tmp_path / "train_stage"),
         "--train_dataset_frame_captions_dir", str(tmp_path / "train_stage"),
         "--trainset_json_ann", str(tmp_path / "train_ann.json"),
         "--output_dir", str(out_dir),
         "--instruction_line", "Instruction: describe.",
         "--shot", "2", "--N", "1", "--comparing_target", "caption",
         "--sbert_model", str(snap)],
        capture_output=True, text=True, env=env, timeout=480)
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [J.loads(l) for l in open(out_dir / "temp_0.0_gpt3_queries.jsonl")]
    assert len(lines) == 2
    # each prompt = instruction + 1 selected in-context example + query
    assert all(l["prompt"].startswith("Instruction: describe.") for l in lines)
    idx = J.load(open(out_dir / "temp_0.0_gpt3_queries__idx_2_videoid.json"))
    assert set(idx.values()) == {"q1", "q2"}
