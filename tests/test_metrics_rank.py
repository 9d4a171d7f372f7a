"""Parity tests: vectorized CMC/mAP vs straight-loop oracles of the
reference semantics."""

import numpy as np
import pytest

from agrl_tpu.metrics import accuracy, compute_distance_matrix
from agrl_tpu.metrics.rank import eval_market1501, evaluate_mars, evaluate_rank

from .oracles import make_reid_problem, market1501_eval_loop, mars_eval_loop


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mars_parity(seed):
    rng = np.random.RandomState(seed)
    dist, qp, gp, qc, gc = make_reid_problem(rng)
    cmc_v, map_v = evaluate_mars(dist, qp, gp, qc, gc, max_rank=50)
    cmc_o, map_o = mars_eval_loop(dist, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(cmc_v, cmc_o, atol=1e-12)
    np.testing.assert_allclose(map_v, map_o, atol=1e-12)


def test_mars_with_junk_pids():
    rng = np.random.RandomState(7)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_g=200)
    gp = gp.copy()
    gp[rng.rand(len(gp)) < 0.1] = -1  # distractor tracklets
    cmc_v, map_v = evaluate_mars(dist, qp, gp, qc, gc, max_rank=50)
    cmc_o, map_o = mars_eval_loop(dist, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(cmc_v, cmc_o, atol=1e-12)
    np.testing.assert_allclose(map_v, map_o, atol=1e-12)


def test_mars_small_gallery_no_good_query_keeps_cmc_zero():
    """num_g < max_rank regression: a query with NO cross-camera match must
    contribute an all-zero CMC row — the sentinel must be >= max_rank, not
    the truncated length R (round-1 bug: cmc flipped to 1 past R)."""
    # query 0: pid 0 only appears same-camera (junk) -> no good match at all
    # query 1: perfect match at rank 0
    dist = np.array([[0.1, 0.5, 0.6], [0.9, 0.1, 0.8]])
    qp = np.array([0, 1])
    gp = np.array([0, 1, 2])
    qc = np.array([0, 0])
    gc = np.array([0, 1, 1])
    max_rank = 10  # > num_g = 3
    cmc, mAP = evaluate_mars(dist, qp, gp, qc, gc, max_rank=max_rank)
    cmc_o, map_o = mars_eval_loop(dist, qp, gp, qc, gc, max_rank=max_rank)
    np.testing.assert_allclose(cmc, cmc_o, atol=1e-12)
    np.testing.assert_allclose(mAP, map_o, atol=1e-12)
    # query 0 contributes zeros everywhere, query 1 contributes ones -> 0.5
    np.testing.assert_allclose(cmc, np.full(max_rank, 0.5))


def test_mars_small_gallery_random_parity():
    rng = np.random.RandomState(11)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=20, num_g=12, num_pids=30)
    cmc_v, map_v = evaluate_mars(dist, qp, gp, qc, gc, max_rank=50)
    cmc_o, map_o = mars_eval_loop(dist, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(cmc_v, cmc_o, atol=1e-12)
    np.testing.assert_allclose(map_v, map_o, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_market1501_parity(seed):
    rng = np.random.RandomState(seed)
    dist, qp, gp, qc, gc = make_reid_problem(rng)
    cmc_v, map_v = eval_market1501(dist, qp, gp, qc, gc, max_rank=50)
    cmc_o, map_o = market1501_eval_loop(dist, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(cmc_v, cmc_o, atol=1e-6)
    np.testing.assert_allclose(map_v, map_o, atol=1e-12)


def test_perfect_ranking_gives_perfect_metrics():
    # 2 queries, 4 gallery; matches ranked first, all cross-camera
    dist = np.array([[0.1, 0.2, 0.9, 0.8], [0.9, 0.8, 0.1, 0.2]])
    qp = np.array([0, 1])
    gp = np.array([0, 0, 1, 1])
    qc = np.array([0, 0])
    gc = np.array([1, 1, 1, 1])
    cmc, mAP = evaluate_mars(dist, qp, gp, qc, gc, max_rank=4)
    assert cmc[0] == 1.0
    assert mAP == pytest.approx(1.0)
    cmc_m, map_m = eval_market1501(dist, qp, gp, qc, gc, max_rank=4)
    assert cmc_m[0] == 1.0
    assert map_m == pytest.approx(1.0)


def test_evaluate_rank_dispatch():
    rng = np.random.RandomState(0)
    dist, qp, gp, qc, gc = make_reid_problem(rng)
    cmc, mAP = evaluate_rank(dist, qp, gp, qc, gc, use_metric_mars=True)
    assert cmc.shape == (50,)
    assert 0.0 <= mAP <= 1.0
    cmc, mAP = evaluate_rank(dist, qp, gp, qc, gc, use_metric_market1501=True)
    assert 0.0 <= mAP <= 1.0
    with pytest.raises(ValueError):
        evaluate_rank(dist, qp, gp, qc, gc)


def test_distance_matrix_euclidean_cosine():
    rng = np.random.RandomState(0)
    a = rng.randn(5, 8)
    b = rng.randn(7, 8)
    d = compute_distance_matrix(a, b, "euclidean")
    brute = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, brute, atol=1e-9)
    dc = compute_distance_matrix(a, b, "cosine")
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(dc, 1 - an @ bn.T, atol=1e-9)


def test_accuracy_multi_head():
    logits = np.array([[5.0, 1.0, 0.0], [0.0, 5.0, 1.0], [0.0, 1.0, 5.0]])
    target = np.array([0, 1, 1])
    (res,) = accuracy(logits, target, topk=(1, 2))
    assert res[0] == pytest.approx(2 / 3)
    assert res[1] == pytest.approx(1.0)
    res2 = accuracy([logits, logits], target, topk=(1,))
    assert len(res2) == 2
