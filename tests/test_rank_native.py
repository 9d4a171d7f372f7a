"""Native C++ ranking extension parity + speed sanity vs NumPy oracles."""

import time

import numpy as np
import pytest

from agrl_tpu.metrics.rank import eval_market1501, evaluate_mars, evaluate_rank
from agrl_tpu.metrics import rank_native

from .oracles import make_reid_problem

pytestmark = pytest.mark.skipif(
    not rank_native.IS_NATIVE_AVAILABLE,
    reason="librank_eval.so not built (make -C native)",
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mars_native_parity(seed):
    rng = np.random.RandomState(seed)
    dist, qp, gp, qc, gc = make_reid_problem(rng)
    cmc_n, map_n = rank_native.evaluate_mars_native(dist, qp, gp, qc, gc, 50)
    cmc_o, map_o = evaluate_mars(dist, qp, gp, qc, gc, 50)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-6)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)


def test_mars_native_with_junk():
    rng = np.random.RandomState(7)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_g=250)
    gp = gp.copy()
    gp[rng.rand(len(gp)) < 0.1] = -1
    cmc_n, map_n = rank_native.evaluate_mars_native(dist, qp, gp, qc, gc, 50)
    cmc_o, map_o = evaluate_mars(dist, qp, gp, qc, gc, 50)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-6)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_market1501_native_parity(seed):
    rng = np.random.RandomState(seed)
    dist, qp, gp, qc, gc = make_reid_problem(rng)
    cmc_n, map_n = rank_native.evaluate_market1501_native(dist, qp, gp, qc, gc, 50)
    cmc_o, map_o = eval_market1501(dist, qp, gp, qc, gc, 50)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-6)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)


def test_dispatcher_prefers_native():
    rng = np.random.RandomState(0)
    dist, qp, gp, qc, gc = make_reid_problem(rng)
    cmc_a, map_a = evaluate_rank(dist, qp, gp, qc, gc, use_metric_mars=True, use_native=True)
    cmc_b, map_b = evaluate_rank(dist, qp, gp, qc, gc, use_metric_mars=True, use_native=False)
    np.testing.assert_allclose(cmc_a, cmc_b, atol=1e-6)
    np.testing.assert_allclose(map_a, map_b, atol=1e-6)


def test_mars_scale_speed():
    """MARS-size ranking (1980 x 9330) should beat the reference's ~4 s."""
    rng = np.random.RandomState(0)
    dist = rng.rand(1980, 9330).astype(np.float32)
    qp = rng.randint(0, 625, 1980)
    gp = rng.randint(0, 625, 9330)
    qc = rng.randint(0, 6, 1980)
    gc = rng.randint(0, 6, 9330)
    t0 = time.perf_counter()
    rank_native.evaluate_mars_native(dist, qp, gp, qc, gc, 50)
    dt = time.perf_counter() - t0
    assert dt < 2.0, f"native mars ranking took {dt:.2f}s"


def test_mars_native_distractor_query_matches_oracle():
    """A pid == -1 QUERY against -1 gallery entries: such rows are both
    'good' (pid match, cam differs) and 'junk' (pid == -1); the oracle's
    `good &= keep` masks them, and the native path must agree instead of
    scoring CMC off a junk row."""
    rng = np.random.RandomState(11)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_g=120)
    qp = qp.copy()
    gp = gp.copy()
    qp[:4] = -1
    gp[rng.rand(len(gp)) < 0.2] = -1
    cmc_n, map_n = rank_native.evaluate_mars_native(dist, qp, gp, qc, gc, 50)
    cmc_o, map_o = evaluate_mars(dist, qp, gp, qc, gc, 50)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-6)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_cuhk03_native_draw_for_draw_vs_numpy(seed):
    """The native cuhk03 path must consume the global np.random stream
    exactly like the numpy path (which is itself draw-for-draw with the
    imported reference, tests/test_reference_parity.py) -> identical
    seeding gives bit-equal CMC, and the deterministic mAP matches."""
    from agrl_tpu.metrics.rank import eval_cuhk03

    rng = np.random.RandomState(seed)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=15, num_g=120, num_pids=12)
    np.random.seed(777 + seed)
    cmc_n, map_n = rank_native.evaluate_cuhk03_native(dist, qp, gp, qc, gc, 10)
    np.random.seed(777 + seed)
    cmc_o, map_o = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=10)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-7)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)


def test_cuhk03_native_pad_with_last_below_group_count():
    """max_rank above the per-query pid-group count: rows extend with the
    final CMC value (=1), matching the numpy path's padding."""
    from agrl_tpu.metrics.rank import eval_cuhk03

    rng = np.random.RandomState(3)
    # 4 pids total -> ~4 kept groups per query, max_rank 20 >> groups
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=8, num_g=30, num_pids=4)
    np.random.seed(42)
    cmc_n, map_n = rank_native.evaluate_cuhk03_native(dist, qp, gp, qc, gc, 20)
    np.random.seed(42)
    cmc_o, map_o = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=20)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-7)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)
    assert cmc_n[-1] == pytest.approx(1.0)


def test_cuhk03_native_with_invalid_queries():
    """Queries whose pid never appears in the kept gallery are skipped
    WITHOUT consuming any draws (reference `continue` before sampling)."""
    from agrl_tpu.metrics.rank import eval_cuhk03

    rng = np.random.RandomState(9)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=10, num_g=60, num_pids=8)
    qp = qp.copy()
    qp[::3] = 999  # never in gallery -> invalid
    np.random.seed(5)
    cmc_n, map_n = rank_native.evaluate_cuhk03_native(dist, qp, gp, qc, gc, 10)
    np.random.seed(5)
    cmc_o, map_o = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=10)
    np.testing.assert_allclose(cmc_n, cmc_o, atol=1e-7)
    np.testing.assert_allclose(map_n, map_o, atol=1e-6)


def test_dispatcher_routes_cuhk03_native():
    from agrl_tpu.metrics.rank import evaluate_rank

    rng = np.random.RandomState(0)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=10, num_g=80, num_pids=8)
    np.random.seed(11)
    cmc_a, map_a = evaluate_rank(
        dist, qp, gp, qc, gc, use_metric_cuhk03=True, use_native=True
    )
    np.random.seed(11)
    cmc_b, map_b = evaluate_rank(
        dist, qp, gp, qc, gc, use_metric_cuhk03=True, use_native=False
    )
    np.testing.assert_allclose(cmc_a, cmc_b, atol=1e-7)
    np.testing.assert_allclose(map_a, map_b, atol=1e-6)
