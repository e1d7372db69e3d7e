"""Eval suite tests: caption metrics sanity, QA/VLEP mapping with a fake
encoder, retrieval itm_eval."""

import json

import numpy as np
import pytest

from vidil_tpu.evals.caption import video_caption_eval
from vidil_tpu.evals.caption_metrics import bleu, cider, compute_caption_scores, ptb_tokenize, rouge_l
from vidil_tpu.evals.qa import (
    clean_text_qa,
    evaluate_generation_result_jsonl,
    evaluate_ranking_result,
    process_gpt3_response_jsonl,
    question_aware_post_processing,
)
from vidil_tpu.evals.retrieval import itm_eval
from vidil_tpu.evals.vlep import eval_multichoice, vlep_accuracy


def fake_encoder(texts):
    out = np.zeros((len(texts), 24), np.float32)
    for i, t in enumerate(texts):
        rng = np.random.RandomState(abs(hash(t.lower().strip())) % (2**31))
        out[i] = rng.randn(24)
    return out


def test_bleu_perfect_match():
    gts = {"a": [ptb_tokenize("a dog runs on the beach")]}
    res = {"a": [ptb_tokenize("a dog runs on the beach")]}
    scores = bleu(gts, res)
    assert all(s > 0.999 for s in scores)


def test_bleu_orders():
    gts = {"a": [ptb_tokenize("the quick brown fox jumps over the lazy dog")]}
    res = {"a": [ptb_tokenize("the quick brown fox sleeps near the lazy dog")]}
    b = bleu(gts, res)
    assert 1 > b[0] > b[1] > b[2] > b[3] > 0


def test_rouge_and_cider():
    gts = {
        "a": [ptb_tokenize("a man is playing a guitar"), ptb_tokenize("someone plays guitar")],
        "b": [ptb_tokenize("a dog runs in the park")],
    }
    res_good = {"a": [ptb_tokenize("a man is playing a guitar")], "b": [ptb_tokenize("a dog runs in the park")]}
    res_bad = {"a": [ptb_tokenize("completely unrelated words here")], "b": [ptb_tokenize("nothing matches at all")]}
    assert rouge_l(gts, res_good) > rouge_l(gts, res_bad)
    assert cider(gts, res_good) > cider(gts, res_bad)
    assert rouge_l(gts, res_good) > 0.99


def test_video_caption_eval_end_to_end(tmp_path):
    gt = [
        {"caption": "a dog runs on the beach", "clip_name": "v1", "sen_id": 0},
        {"caption": "a dog is running", "clip_name": "v1", "sen_id": 1},
        {"caption": "a man plays guitar", "clip_name": "v2", "sen_id": 2},
        {"caption": "unseen video", "clip_name": "v3", "sen_id": 3},
    ]
    results = {"v1": ["a dog runs on the beach"], "v2": ["a man plays a guitar"]}
    res_path = str(tmp_path / "res.json")
    json.dump(results, open(res_path, "w"))
    out = video_caption_eval(gt, res_path, output_path=str(tmp_path / "metric.json"))
    assert set(out) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"}
    assert 0 <= out["Bleu_4"] <= 1
    assert json.load(open(tmp_path / "metric.json")) == out


def test_qa_clean_and_postprocessing():
    assert clean_text_qa("a cat. extra sentence") == "a cat"
    assert clean_text_qa("ans\n\nObjects: x") == "ans"
    assert question_aware_post_processing("what is he doing?", "not sure") == "talk"
    assert question_aware_post_processing("who is there", "There is no one") == "person"
    assert question_aware_post_processing("what color?", "red") == "red"


def test_qa_ranking_and_generation(tmp_path):
    gt_path = str(tmp_path / "gt.jsonl")
    with open(gt_path, "w") as f:
        for i, (q, a, vid) in enumerate([("what is it?", "dog", "v1"), ("who?", "cat", "v1"),
                                         ("where?", "beach", "v2")]):
            f.write(json.dumps({"question": q, "answer": a, "video_id": vid}) + "\n")

    preds = [{"question_id": 0, "answer": "dog"}, {"question_id": 1, "answer": "cat"},
             {"question_id": 2, "answer": "park"}]
    acc = evaluate_ranking_result(preds, gt_path)
    assert abs(acc - 2 / 3) < 1e-9

    # gpt3 jsonl flow: raw responses -> tmp.jsonl -> mapped accuracy
    raw_path = str(tmp_path / "raw.jsonl")
    with open(raw_path, "w") as f:
        for ans in ["dog.", "cat. and more", "beach"]:
            f.write(json.dumps({"choices": [{"text": ans}]}) + "\n")
    tmp_jsonl = process_gpt3_response_jsonl(raw_path, str(tmp_path))
    idx_2_video_id = {"0": ["v1", 0], "1": ["v1", 1], "2": ["v2", 0]}
    answer_list = str(tmp_path / "answers.json")
    json.dump(["dog", "cat", "beach", "park"], open(answer_list, "w"))
    acc = evaluate_generation_result_jsonl(tmp_jsonl, gt_path, answer_list,
                                           idx_2_video_id, encoder=fake_encoder)
    assert acc == 1.0  # identical strings map to themselves with any encoder


def test_vlep_multichoice(tmp_path):
    example_id_2_data = {
        "0": {"video_id": "v1", "events": ["the dog barks", "the cat leaves"], "answer": 0},
        "1": {"video_id": "v2", "events": ["he falls", "he jumps"], "answer": 1},
    }
    results = {"0": "the dog barks", "1": "he jumps"}
    out_path = str(tmp_path / "sub.jsonl")
    lines = eval_multichoice(results, example_id_2_data, out_path, encoder=fake_encoder)
    assert [l["pred_ans"] for l in lines] == [0, 1]
    assert vlep_accuracy(lines, example_id_2_data) == 1.0
    written = [json.loads(l) for l in open(out_path)]
    assert written == lines


def test_itm_eval_perfect_and_random():
    n = 20
    perfect = np.eye(n) * 10 + np.random.RandomState(0).randn(n, n) * 0.01
    metrics = itm_eval(perfect, perfect, list(range(n)), list(range(n)))
    assert metrics["txt_r1"] == 100.0 and metrics["vid_r1"] == 100.0
    assert metrics["vid_mdR"] == 1.0
    rnd = np.random.RandomState(1).randn(n, n)
    m2 = itm_eval(rnd, rnd, list(range(n)), list(range(n)))
    assert m2["r_mean"] < metrics["r_mean"]


@pytest.mark.slow
def test_score_matrices_matches_bruteforce():
    """RetrievalEvaluator's blocked on-device rerank must equal a
    per-pair brute-force ITM computation."""
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.evals.retrieval import RetrievalEvaluator
    from vidil_tpu.models import blip as B
    from vidil_tpu.models.blip import init_blip_itm

    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
    med = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64, encoder_width=32)
    params = init_blip_itm(jax.random.PRNGKey(0), vit, med)

    class FakeTok:
        enc_token_id = 3

        def __call__(self, texts, **kw):
            raise NotImplementedError

    ev = RetrievalEvaluator(params, vit, med, FakeTok(), k_test=3,
                            rows_per_batch=2, dtype=None)

    n_vid, n_txt, Lk, L = 5, 7, 10, 9
    rng = np.random.RandomState(0)
    video_feats = rng.randn(n_vid, Lk, 32).astype(np.float32) * 0.2
    video_embeds = rng.randn(n_vid, 8).astype(np.float32)
    text_embeds = rng.randn(n_txt, 8).astype(np.float32)
    text_ids = rng.randint(4, 64, size=(n_txt, L)).astype(np.int32)
    text_ids[:, 0] = 3
    text_atts = np.ones((n_txt, L), np.int32)

    v2t, t2v = ev.score_matrices(video_feats, video_embeds, text_embeds, text_ids, text_atts)

    import jax.numpy as jnp

    def itm_one(feat, ids, mask):
        logits = B.blip_itm_scores(params, jnp.asarray(feat[None]), jnp.asarray(ids[None]),
                                   jnp.asarray(mask[None]), med, dtype=None)
        return float(logits[0, 1])

    sims = video_embeds @ text_embeds.T
    ref_v2t = np.full_like(sims, -100.0)
    for i in range(n_vid):
        topk = np.argsort(sims[i])[::-1][:3]
        for j in topk:
            ref_v2t[i, j] = itm_one(video_feats[i], text_ids[j], text_atts[j]) + sims[i, j]
    np.testing.assert_allclose(v2t, ref_v2t, atol=2e-4)

    sims_t = sims.T
    ref_t2v = np.full_like(sims_t, -100.0)
    for i in range(n_txt):
        topk = np.argsort(sims_t[i])[::-1][:3]
        for j in topk:
            ref_t2v[i, j] = itm_one(video_feats[j], text_ids[i], text_atts[i]) + sims_t[i, j]
    np.testing.assert_allclose(t2v, ref_t2v, atol=2e-4)


def test_score_matrices_chunked_dispatch_matches():
    """blocks_per_dispatch=1 (max chunking, exercises the padded final
    chunk and per-chunk repetition) must give identical score matrices."""
    import jax

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.evals.retrieval import RetrievalEvaluator
    from vidil_tpu.models.blip import init_blip_itm

    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
    med = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64, encoder_width=32)
    params = init_blip_itm(jax.random.PRNGKey(0), vit, med)

    class FakeTok:
        enc_token_id = 3

        def __call__(self, texts, **kw):
            raise NotImplementedError

    rng = np.random.RandomState(0)
    n_vid, n_txt, Lk, L = 6, 9, 10, 9
    video_feats = rng.randn(n_vid, Lk, 32).astype(np.float32) * 0.2
    video_embeds = rng.randn(n_vid, 8).astype(np.float32)
    text_embeds = rng.randn(n_txt, 8).astype(np.float32)
    text_ids = rng.randint(4, 64, size=(n_txt, L)).astype(np.int32)
    text_ids[:, 0] = 3
    text_atts = np.ones((n_txt, L), np.int32)

    outs = []
    for bpd in (1, 64):
        ev = RetrievalEvaluator(params, vit, med, FakeTok(), k_test=4,
                                rows_per_batch=4, dtype=None, blocks_per_dispatch=bpd)
        outs.append(ev.score_matrices(video_feats, video_embeds, text_embeds,
                                      text_ids, text_atts))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)


def test_t2v_bucket_construction_matches_loop_formulation():
    """The PRODUCTION vectorized bucket construction
    (evals.retrieval.build_t2v_buckets: stable argsort of row-major
    (text, rank) pairs by video id, chunked by G, padded with each
    chunk's last real element) must reproduce the loop formulation it
    replaced EXACTLY — bucket order, membership, padding — since bucket
    layout determines the compiled block shapes and the score scatter.
    Fuzz over random shard/shape/G combinations."""
    from collections import defaultdict

    from vidil_tpu.evals.retrieval import build_t2v_buckets

    def loop_buckets(topk, start, end, G):
        per_video = defaultdict(list)
        for i, r in enumerate(range(start, end)):
            for c in topk[i]:
                per_video[int(c)].append(r)
        bv, bt, br = [], [], []
        for c in sorted(per_video):
            rows = per_video[c]
            for off in range(0, len(rows), G):
                chunk = rows[off:off + G]
                br.append(len(chunk))
                bv.append(c)
                bt.append(chunk + [chunk[-1]] * (G - len(chunk)))
        return np.array(bv), np.array(bt), np.array(br)

    rng = np.random.RandomState(11)
    for _ in range(100):
        n_txt, n_vid = rng.randint(1, 40), rng.randint(1, 30)
        k = rng.randint(1, min(n_vid, 9) + 1)
        G = rng.randint(1, 7)
        start = rng.randint(0, n_txt)
        end = rng.randint(start + 1, n_txt + 1)
        sims = rng.randn(n_txt, n_vid)
        topk = np.argsort(sims[start:end], axis=1)[:, ::-1][:, :k]
        for a, b in zip(loop_buckets(topk, start, end, G),
                        build_t2v_buckets(topk, start, end, G)):
            assert a.shape == b.shape and (a == b).all()


def test_t2v_bucketed_matches_row_major():
    """The video-bucketed t2v rerank must equal the row-major t2v rerank
    (same pairs, same itm+sim formula, different grouping)."""
    import jax
    import jax.numpy as jnp

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.evals.retrieval import RetrievalEvaluator
    from vidil_tpu.models.blip import init_blip_itm

    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
    med = MedConfig(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64, encoder_width=32)
    params = init_blip_itm(jax.random.PRNGKey(0), vit, med)

    class FakeTok:
        enc_token_id = 3

        def __call__(self, texts, **kw):
            raise NotImplementedError

    ev = RetrievalEvaluator(params, vit, med, FakeTok(), k_test=3,
                            rows_per_batch=2, dtype=None)
    rng = np.random.RandomState(7)
    n_vid, n_txt, Lk, L = 5, 8, 10, 9
    video_feats = jnp.asarray(rng.randn(n_vid, Lk, 32).astype(np.float32) * 0.2)
    sims = rng.randn(n_txt, n_vid).astype(np.float32)
    text_ids = rng.randint(4, 64, size=(n_txt, L)).astype(np.int32)
    text_ids[:, 0] = 3
    text_atts = np.ones((n_txt, L), np.int32)
    tids, tatts = jnp.asarray(text_ids), jnp.asarray(text_atts)

    bucketed = ev._rerank_t2v_bucketed(sims, video_feats, tids, tatts)
    row_major = ev._rerank_rows(
        sims, lambda rows_b, topk_b: ev._itm_t2v_blocks(video_feats, tids, tatts,
                                                        rows_b, topk_b))
    np.testing.assert_allclose(bucketed, row_major, atol=1e-5)


def test_retrieval_eval_trimmed_bitwise(tmp_path):
    """compute_text_features trims the 35-pad rerank ids to the corpus's
    true max (rounded to 8); score matrices must be BITWISE identical to
    running the rerank on the untrimmed 35-pad arrays (masked pads
    contribute exactly 0)."""
    import jax

    from vidil_tpu.config import MedConfig, ViTConfig
    from vidil_tpu.evals.retrieval import RetrievalEvaluator
    from vidil_tpu.models.blip import init_blip_itm
    from vidil_tpu.tokenizer import BlipTokenizer, write_test_vocab

    vocab = str(tmp_path / "vocab.txt")
    write_test_vocab(vocab, ["a", "dog", "runs", "on", "the", "beach",
                             "cat", "sits", "man", "plays", "guitar"])
    tok = BlipTokenizer(vocab)
    vit = ViTConfig(image_size=32, patch_size=16, hidden_size=32, num_layers=2, num_heads=4)
    med = MedConfig(vocab_size=tok.vocab_size, hidden_size=32, num_layers=2,
                    num_heads=4, intermediate_size=64,
                    max_position_embeddings=64, encoder_width=32)
    params = init_blip_itm(jax.random.PRNGKey(0), vit, med)
    ev = RetrievalEvaluator(params, vit, med, tok, k_test=2, rows_per_batch=2,
                            dtype=None)

    texts = ["a dog runs on the beach", "a cat sits", "a man plays guitar"]
    text_embeds, text_ids, text_atts = ev.compute_text_features(texts)
    assert text_ids.shape[1] < 35  # trim engaged

    enc = tok(texts, padding="max_length", truncation=True, max_length=35)
    ids35 = np.asarray(enc.input_ids).copy()
    ids35[:, 0] = tok.enc_token_id
    atts35 = np.asarray(enc.attention_mask)
    # embeds must equal the untrimmed-path embeds (computed pre-trim)
    emb35 = np.asarray(ev._text_side(enc.input_ids, enc.attention_mask))
    np.testing.assert_array_equal(text_embeds, emb35)

    rng = np.random.RandomState(1)
    video_feats = rng.randn(4, 5, 32).astype(np.float32) * 0.2
    video_embeds = rng.randn(4, text_embeds.shape[1]).astype(np.float32)

    v2t_t, t2v_t = ev.score_matrices(video_feats, video_embeds, text_embeds,
                                     text_ids, text_atts)
    v2t_f, t2v_f = ev.score_matrices(video_feats, video_embeds, text_embeds,
                                     ids35, atts35)
    np.testing.assert_array_equal(v2t_t, v2t_f)
    np.testing.assert_array_equal(t2v_t, t2v_f)
