"""Caption / VQA / pretrain train steps: run, update, stay finite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models.blip import init_blip_decoder, init_blip_itm
from vidil_tpu.models.blip_vqa import init_blip_vqa, rank_answer, vqa_generate_ids
from vidil_tpu.train.caption import (
    create_caption_train_state,
    make_caption_train_step,
    select_frame_itm,
)
from vidil_tpu.train.pretrain import create_pretrain_state, make_pretrain_step
from vidil_tpu.train.retrieval import make_optimizer
from vidil_tpu.train.vqa import create_vqa_train_state, make_vqa_train_step

VIT = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
MED = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=64, encoder_width=32)


class FakeTok:
    bos_token_id = 1
    sep_token_id = 5
    pad_token_id = 0
    enc_token_id = 3


def test_caption_train_step():
    opt = make_optimizer(1e-4)
    params = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    state = create_caption_train_state(params, opt)
    step = jax.jit(make_caption_train_step(VIT, MED, opt, prompt_length=3))
    rng = np.random.RandomState(0)
    batch = {
        "video": rng.randn(2, 2, 32, 32, 3).astype(np.float32) * 0.1,
        "input_ids": rng.randint(6, 64, size=(2, 12)).astype(np.int32),
        "attention_mask": np.ones((2, 12), np.int32),
    }
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # overfits a fixed tiny batch


@pytest.mark.slow
def test_caption_train_step_remat_policy_variants_agree():
    """remat policy is scheduling only: the caption step's first-step loss
    and updated params must match across full-recompute / 'dots' /
    remat-off (fp32, tiny config — exercises MedConfig.remat_policy via
    training_cfgs, complementing the ViT-only test in test_vit.py)."""
    import dataclasses

    opt = make_optimizer(1e-4)
    params = init_blip_decoder(jax.random.PRNGKey(0), VIT, MED)
    rng = np.random.RandomState(0)
    batch = {
        "video": rng.randn(2, 2, 32, 32, 3).astype(np.float32) * 0.1,
        "input_ids": rng.randint(6, 64, size=(2, 12)).astype(np.int32),
        "attention_mask": np.ones((2, 12), np.int32),
    }

    def one_step(vit_cfg, med_cfg, med_remat):
        state = create_caption_train_state(params, opt)
        step = jax.jit(make_caption_train_step(vit_cfg, med_cfg, opt,
                                               prompt_length=3, med_remat=med_remat))
        state, m = step(state, batch)
        return float(m["loss"]), state.params

    ref_loss, ref_params = one_step(dataclasses.replace(VIT, remat=True), MED, True)
    for vit_cfg, med_cfg, med_remat in [
        (dataclasses.replace(VIT, remat=True, remat_policy="dots"),
         dataclasses.replace(MED, remat_policy="dots"), True),
        (VIT, MED, False),
    ]:
        loss, new_params = one_step(vit_cfg, med_cfg, med_remat)
        np.testing.assert_allclose(loss, ref_loss, rtol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                     ref_params, new_params)


def test_select_frame_itm():
    params = init_blip_itm(jax.random.PRNGKey(1), VIT, MED)
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.randn(3, 32, 32, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(6, 64, size=(8,)).astype(np.int32))
    mask = jnp.ones((8,), jnp.int32)
    idx = int(select_frame_itm(params, frames, ids, mask, VIT, MED))
    assert 0 <= idx < 3


@pytest.mark.slow
def test_vqa_train_step_and_inference():
    opt = make_optimizer(1e-4)
    params = init_blip_vqa(jax.random.PRNGKey(2), VIT, MED)
    state = create_vqa_train_state(params, opt)
    step = jax.jit(make_vqa_train_step(VIT, MED, opt))
    rng = np.random.RandomState(2)
    B, A = 2, 3  # 2 questions, 3 answers total (ragged: 2 + 1)
    batch = {
        "video": rng.randn(B, 2, 32, 32, 3).astype(np.float32) * 0.1,
        "question_ids": rng.randint(6, 64, size=(B, 9)).astype(np.int32),
        "question_mask": np.ones((B, 9), np.int32),
        "answer_ids": rng.randint(6, 64, size=(A, 5)).astype(np.int32),
        "answer_mask": np.ones((A, 5), np.int32),
        "answer_question_index": np.array([0, 0, 1], np.int32),
        "weights": np.array([0.2, 0.2, 0.2], np.float32),
    }
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    # inference paths
    from vidil_tpu.models.blip import encode_video_frames

    embeds = encode_video_frames(state.params, jnp.asarray(batch["video"]), VIT)
    seqs = vqa_generate_ids(state.params, embeds, jnp.asarray(batch["question_ids"]),
                            jnp.asarray(batch["question_mask"]), MED, FakeTok, max_length=8)
    assert seqs.shape == (B, 8)
    assert (np.asarray(seqs)[:, 0] == FakeTok.bos_token_id).all()
    # grouped cross-KV beam decode must produce identical answers
    seqs_g = vqa_generate_ids(state.params, embeds, jnp.asarray(batch["question_ids"]),
                              jnp.asarray(batch["question_mask"]), MED, FakeTok,
                              max_length=8, beam_group_kv=True)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(seqs_g))

    answers = rng.randint(6, 64, size=(10, 4)).astype(np.int32)
    answers[:, 0] = FakeTok.bos_token_id
    ranked = rank_answer(state.params, embeds, jnp.asarray(batch["question_ids"]),
                         jnp.asarray(batch["question_mask"]), jnp.asarray(answers),
                         jnp.ones((10, 4), jnp.int32), k=4, med_cfg=MED, tokenizer=FakeTok)
    assert ranked.shape == (B,)
    assert ((0 <= np.asarray(ranked)) & (np.asarray(ranked) < 10)).all()


def test_pretrain_step_and_weight_tying():
    opt = make_optimizer(1e-3)
    state = create_pretrain_state(jax.random.PRNGKey(3), VIT, MED, opt,
                                  embed_dim=8, queue_size=16)
    step = jax.jit(make_pretrain_step(VIT, MED, opt))
    rng = np.random.RandomState(3)
    B = 4
    ids = rng.randint(6, 64, size=(B, 10)).astype(np.int32)
    enc, dec = ids.copy(), ids.copy()
    enc[:, 0] = 3
    dec[:, 0] = 1
    batch = {
        "video": rng.randn(B, 2, 32, 32, 3).astype(np.float32) * 0.1,
        "text_ids": ids, "enc_ids": enc, "dec_ids": dec,
        "text_mask": np.ones((B, 10), np.int32),
    }
    s0 = state
    state, m = step(state, batch, 0.4, jax.random.PRNGKey(0))
    for k in ("loss", "loss_ita", "loss_itm", "loss_lm"):
        assert np.isfinite(float(m[k])), k
    assert int(state.queue.ptr) == B
    # tying: the LM loss must produce gradients in the (shared) encoder FFN
    ffn0 = np.asarray(s0.params["text_encoder"]["layers"]["mlp"]["fc1"]["kernel"])
    ffn1 = np.asarray(state.params["text_encoder"]["layers"]["mlp"]["fc1"]["kernel"])
    assert not np.allclose(ffn0, ffn1)
    # decoder-owned attention also updated
    a0 = np.asarray(s0.params["decoder_attn"]["self_attn"]["query"]["kernel"])
    a1 = np.asarray(state.params["decoder_attn"]["self_attn"]["query"]["kernel"])
    assert not np.allclose(a0, a1)


def test_training_cfgs_flash_survives_fused_mlp_cleared():
    """Under autodiff: MED remat forced on, fused-MLP forced off (its VJP
    recomputes through XLA), but flash attention KEEPS its configured
    value — the Pallas backward kernel makes it profitable where the
    forward gate fires (384px), and the gate keeps 224px on XLA anyway."""
    import dataclasses

    from vidil_tpu.train.common import training_cfgs

    vit = dataclasses.replace(VIT, use_flash=True, use_fused_mlp=True)
    med = dataclasses.replace(MED, use_fused_mlp=True, remat=False)
    vit2, med2 = training_cfgs(vit, med)
    assert vit2.use_flash
    assert not vit2.use_fused_mlp
    assert not med2.use_fused_mlp
    assert med2.remat
    vit3, _ = training_cfgs(dataclasses.replace(VIT, use_flash=False), MED)
    assert not vit3.use_flash


def test_training_cfgs_strips_fused_block(monkeypatch):
    """The whole-layer fused ViT kernel is opt-in (default OFF: it wins
    encode-only A/Bs but loses the full CapFilt chunk program ~13%
    canary-normalized — config.py:78) and in any case inference-only: a
    measured 6-7% NEGATIVE inside the autodiff train step
    (misc_train_steps.jsonl remat=fusedblock rows), so training_cfgs
    strips it even when a caller opts in — unless the re-measurement env
    override is set."""
    import dataclasses

    from vidil_tpu.config import ViTConfig
    from vidil_tpu.train.common import training_cfgs

    assert not ViTConfig().use_fused_block  # default OFF (config.py:78)
    monkeypatch.delenv("VIDIL_TPU_TRAIN_FUSED_BLOCK", raising=False)
    vit = dataclasses.replace(VIT, use_fused_block=True)
    vit2, _ = training_cfgs(vit, MED)
    assert not vit2.use_fused_block
    monkeypatch.setenv("VIDIL_TPU_TRAIN_FUSED_BLOCK", "1")
    vit3, _ = training_cfgs(vit, MED)
    assert vit3.use_fused_block


def test_resolve_train_batch_prefers_tpu_key(capsys):
    """Shipped train yamls carry a TPU-tuned '<key>_tpu' batch next to the
    untouched reference key (reference batches starve the chip —
    ARCHITECTURE.md); the helper prefers it, announces the divergence, and
    falls back silently when absent/equal (VERDICT r3 #7)."""
    from vidil_tpu.train.common import resolve_train_batch

    assert resolve_train_batch({"batch_size": 8}, "batch_size") == 8
    assert capsys.readouterr().out == ""
    assert resolve_train_batch({"batch_size": 8, "batch_size_tpu": 8},
                               "batch_size") == 8
    assert capsys.readouterr().out == ""
    assert resolve_train_batch({"batch_size": 8, "batch_size_tpu": 64},
                               "batch_size") == 64
    assert "init_lr" in capsys.readouterr().out
    assert resolve_train_batch({}, "batch_size", 16) == 16


def test_shipped_train_yamls_carry_tuned_tpu_batch():
    """Every shipped train yaml keeps the reference batch key AND a tuned
    _tpu key, so reference hyperparameters stay one deletion away."""
    import glob
    import os

    import yaml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pairs = {"train_blip_video_captioning_*.yaml": ("train_batch_size", 64),
             "train_blip_video_retrieval_*.yaml": ("batch_size_train", 32),
             "train_blip_video_vqa_*.yaml": ("batch_size_train", 64),
             "pretrain_video.yaml": ("batch_size", 64)}
    for pattern, (key, tuned) in pairs.items():
        files = glob.glob(os.path.join(repo, "configs", pattern))
        assert files, pattern
        for f in files:
            cfg = yaml.safe_load(open(f))
            assert key in cfg, (f, key)
            assert cfg.get(f"{key}_tpu") == tuned, (f, key)
