"""Block-diagonal self-attention fold (med_forward self_fold) parity.

The grouped ITM rerank runs texts of 16-35 tokens: per-text self-attention
score einsums are (L, L, 64) — far below the MXU tile — and measured
11.9% MFU at msrvtt scale. self_fold=F folds F consecutive texts into one
F*L sequence with a block-diagonal additive mask; out-of-block softmax
weights underflow to exactly 0.0, so scores must match the unfolded run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidil_tpu.config import MedConfig, ViTConfig
from vidil_tpu.models import med as M
from vidil_tpu.models.blip import blip_itm_scores, init_blip_itm

CFG = MedConfig(vocab_size=1000, hidden_size=64, num_layers=2, num_heads=4,
                intermediate_size=128, encoder_width=64)


def _inputs(n_mem, G, L, Lk, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(4, 900, size=(n_mem * G, L)).astype(np.int32)
    mask = np.ones((n_mem * G, L), np.int32)
    # ragged padding exercises the key-side mask inside folds
    for i in range(0, n_mem * G, 3):
        mask[i, L - 2:] = 0
    mem = rng.randn(n_mem, Lk, 64).astype(np.float32) * 0.3
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(mem)


@pytest.fixture(scope="module")
def params():
    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                    num_layers=2, num_heads=4)
    return init_blip_itm(jax.random.PRNGKey(0), vit,
                         CFG, embed_dim=32)


@pytest.mark.parametrize("fold", [2, 4, 8])
def test_grouped_itm_scores_match_unfolded(params, fold):
    ids, mask, mem = _inputs(n_mem=3, G=8, L=12, Lk=20)
    base = blip_itm_scores(params, mem, ids, mask, CFG, group_size=8)
    folded = blip_itm_scores(params, mem, ids, mask, CFG, group_size=8,
                             self_fold=fold)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_fold_clamps_to_group_divisor(params):
    # group_size=6, self_fold=4 -> gcd 2; must still match unfolded
    ids, mask, mem = _inputs(n_mem=2, G=6, L=12, Lk=20, seed=1)
    base = blip_itm_scores(params, mem, ids, mask, CFG, group_size=6)
    folded = blip_itm_scores(params, mem, ids, mask, CFG, group_size=6,
                             self_fold=4)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(base),
                               atol=1e-5, rtol=1e-5)


def test_text_mode_fold_matches(params):
    ids, mask, _ = _inputs(n_mem=4, G=2, L=12, Lk=20, seed=2)
    base = M.med_forward(params["text_encoder"], ids, mask, cfg=CFG,
                         mode="text")
    folded = M.med_forward(params["text_encoder"], ids, mask, cfg=CFG,
                           mode="text", self_fold=4)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(base),
                               atol=1e-5, rtol=1e-5)
    assert folded.shape == base.shape


def test_ungrouped_cross_never_folds(params):
    # 1:1 text<->memory rows (group_size=1): folding would break the
    # pairing — must silently stay unfolded and still be correct
    ids, mask, mem = _inputs(n_mem=8, G=1, L=12, Lk=20, seed=3)
    base = blip_itm_scores(params, mem, ids, mask, CFG)
    folded = blip_itm_scores(params, mem, ids, mask, CFG, self_fold=4)
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(base))


def test_retrieval_evaluator_scores_invariant_to_fold():
    """Full evaluator rerank (both directions) with self_fold on vs off."""
    from vidil_tpu.evals.retrieval import RetrievalEvaluator
    from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

    import tempfile, os

    vocab = os.path.join(tempfile.gettempdir(), "fold_vocab.txt")
    write_test_vocab(vocab, [f"tok{i}" for i in range(120)])
    tok = BlipTokenizer(vocab)
    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=64,
                    num_layers=2, num_heads=4)
    params = init_blip_itm(jax.random.PRNGKey(1), vit, CFG, embed_dim=32)
    rng = np.random.RandomState(4)
    n = 12
    texts = [" ".join(f"tok{j}" for j in rng.randint(0, 100, size=6))
             for _ in range(n)]
    videos = rng.randn(n, 2, 32, 32, 3).astype(np.float32) * 0.2

    def run(fold):
        ev = RetrievalEvaluator(params, vit, CFG, tok, k_test=8,
                                dtype=jnp.float32, rows_per_batch=4,
                                self_fold=fold)
        te, tids, tatts = ev.compute_text_features(texts)
        vf, ve = ev.compute_video_features([videos])
        return ev.score_matrices(vf, ve, te, tids, tatts)

    v2t_a, t2v_a = run(1)
    v2t_b, t2v_b = run(8)
    np.testing.assert_allclose(v2t_b, v2t_a, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(t2v_b, t2v_a, atol=1e-5, rtol=1e-5)
