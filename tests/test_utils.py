"""Utility layer: schedules, shard/merge contract, checkpointing, logging."""

import json
import os

import numpy as np
import pytest

from vidil_tpu.utils import (
    MetricLogger,
    SmoothedValue,
    cosine_lr_schedule,
    merge_rank_jsons,
    shard_range,
    step_lr_schedule,
    warmup_lr_schedule,
)
from vidil_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_lr_schedules():
    assert cosine_lr_schedule(0, 10, 1e-4, 0) == pytest.approx(1e-4)
    assert cosine_lr_schedule(10, 10, 1e-4, 1e-6) == pytest.approx(1e-6)
    mid = cosine_lr_schedule(5, 10, 1e-4, 0)
    assert 0 < mid < 1e-4
    assert warmup_lr_schedule(0, 100, 1e-6, 1e-4) == pytest.approx(1e-6)
    assert warmup_lr_schedule(100, 100, 1e-6, 1e-4) == pytest.approx(1e-4)
    assert warmup_lr_schedule(1000, 100, 1e-6, 1e-4) == pytest.approx(1e-4)
    assert step_lr_schedule(0, 1e-4, 1e-6, 0.9) == pytest.approx(1e-4)
    assert step_lr_schedule(100, 1e-4, 1e-6, 0.9) == pytest.approx(1e-6)


def test_shard_range_reference_arithmetic():
    # reference: run_video_CapFilt.py:239-241 (step = n//world + 1)
    assert shard_range(10, rank=0, world_size=3) == (0, 4)
    assert shard_range(10, rank=1, world_size=3) == (4, 8)
    assert shard_range(10, rank=2, world_size=3) == (8, 10)
    assert shard_range(10, rank=0, world_size=1) == (0, 10)
    # covers all items exactly once
    covered = []
    for r in range(4):
        s, e = shard_range(13, rank=r, world_size=4)
        covered += list(range(s, e))
    assert covered == list(range(13))


def test_merge_rank_jsons(tmp_path):
    tmp = tmp_path / "tmp"
    tmp.mkdir()
    json.dump({"a": 1}, open(tmp / "0.json", "w"))
    out = str(tmp_path / "merged.json")
    merged = merge_rank_jsons(str(tmp), out)
    assert merged == {"a": 1}
    assert json.load(open(out)) == {"a": 1}


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3),
                    "c": np.ones((4,), np.int32)},
              "d": np.float32(0.07)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, meta={"epoch": 3, "note": "x"})
    loaded, meta = load_checkpoint(path)
    assert meta == {"epoch": 3, "note": "x"}
    np.testing.assert_array_equal(loaded["a"]["b"], params["a"]["b"])
    np.testing.assert_array_equal(loaded["a"]["c"], params["a"]["c"])
    assert float(loaded["d"]) == pytest.approx(0.07)


def test_metric_logger():
    logger = MetricLogger()
    for v in [1.0, 2.0, 3.0]:
        logger.update(loss=v)
    assert logger.loss.global_avg == pytest.approx(2.0)
    assert logger.loss.max == 3.0
    assert "loss" in str(logger)
    sv = SmoothedValue(window_size=2)
    for v in [1, 2, 3]:
        sv.update(v)
    assert sv.avg == pytest.approx(2.5)  # window keeps last 2
    assert sv.global_avg == pytest.approx(2.0)


def test_blip_base_features():
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.models.blip import blip_base_features, init_blip_base

    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
    med = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64, encoder_width=32)
    params = init_blip_base(jax.random.PRNGKey(0), vit, med)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    ids = jnp.asarray(rng.randint(4, 64, (2, 7)).astype(np.int32))
    mask = jnp.ones((2, 7), jnp.int32)
    img_feat = blip_base_features(params, "image", vit, med, images=images)
    assert img_feat.shape == (2, vit.seq_len, 32)
    txt_feat = blip_base_features(params, "text", vit, med, text_ids=ids, text_mask=mask)
    assert txt_feat.shape == (2, 7, 32)
    mm = blip_base_features(params, "multimodal", vit, med, images=images,
                            text_ids=ids, text_mask=mask, enc_token_id=3)
    assert mm.shape == (2, 7, 32)
    assert not np.allclose(np.asarray(mm), np.asarray(txt_feat))


def test_compute_dtype_from_config():
    """Shared CLI compute-dtype mapping: bf16 default, fp32 opt-out,
    explicit override wins, unknown names fail with the accepted values."""
    import jax.numpy as jnp

    from vidil_tpu.config import compute_dtype_from_config

    assert compute_dtype_from_config({}) == jnp.bfloat16
    assert compute_dtype_from_config({"compute_dtype": "float32"}) is None
    assert compute_dtype_from_config({"compute_dtype": "float32"},
                                     override=jnp.bfloat16) == jnp.bfloat16
    with pytest.raises(ValueError, match="bfloat16.*float32|float32.*bfloat16"):
        compute_dtype_from_config({"compute_dtype": "bf16"})
