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
