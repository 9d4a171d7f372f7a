"""Device ranking parity vs the NumPy metric implementations."""

import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.metrics.distance import compute_distance_matrix
from agrl_tpu.metrics.rank import eval_market1501, evaluate_mars
from agrl_tpu.ops.rank import (
    evaluate_mars_device,
    market1501_cmc_map,
    streaming_topk,
)


def make_features(rng, num_q=25, num_g=310, num_pids=15, num_cams=4, dim=32):
    centers = rng.randn(num_pids, dim) * 3
    q_pids = rng.randint(0, num_pids, num_q)
    g_pids = rng.randint(0, num_pids, num_g)
    q_cams = rng.randint(0, num_cams, num_q)
    g_cams = rng.randint(0, num_cams, num_g)
    qf = (centers[q_pids] + rng.randn(num_q, dim)).astype(np.float32)
    gf = (centers[g_pids] + rng.randn(num_g, dim)).astype(np.float32)
    return qf, gf, q_pids, g_pids, q_cams, g_cams


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_streaming_topk_matches_argsort(metric, rng):
    qf, gf, *_ = make_features(rng)
    dists, idx = streaming_topk(qf, gf, k=20, tile=64, metric=metric)
    dm = compute_distance_matrix(qf, gf, metric)
    want_idx = np.argsort(dm, axis=1)[:, :20]
    want_d = np.take_along_axis(dm, want_idx, axis=1)
    # distances must match; indices may differ on exact ties only
    np.testing.assert_allclose(np.asarray(dists), want_d, rtol=1e-4, atol=1e-4)
    agree = (np.asarray(idx) == want_idx).mean()
    assert agree > 0.99


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_mars_device_parity(seed, metric):
    rng = np.random.RandomState(seed)
    qf, gf, qp, gp, qc, gc = make_features(rng)
    cmc_d, map_d = evaluate_mars_device(
        jnp.asarray(qf), jnp.asarray(gf), qp, gp, qc, gc,
        max_rank=50, metric=metric, tile=128,
    )
    dm = compute_distance_matrix(qf, gf, metric)
    cmc_o, map_o = evaluate_mars(dm, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_o, atol=1e-6)
    np.testing.assert_allclose(float(map_d), map_o, atol=1e-6)


def test_mars_device_with_junk_pids():
    rng = np.random.RandomState(5)
    qf, gf, qp, gp, qc, gc = make_features(rng, num_g=200)
    gp = gp.copy()
    gp[rng.rand(len(gp)) < 0.15] = -1
    cmc_d, map_d = evaluate_mars_device(
        jnp.asarray(qf), jnp.asarray(gf), qp, gp, qc, gc, metric="euclidean", tile=64
    )
    dm = compute_distance_matrix(qf, gf, "euclidean")
    cmc_o, map_o = evaluate_mars(dm, qp, gp, qc, gc)
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_o, atol=1e-6)
    np.testing.assert_allclose(float(map_d), map_o, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
def test_market1501_device_parity(seed):
    rng = np.random.RandomState(seed)
    qf, gf, qp, gp, qc, gc = make_features(rng)
    dm = compute_distance_matrix(qf, gf, "euclidean").astype(np.float32)
    cmc_d, map_d = market1501_cmc_map(jnp.asarray(dm), qp, gp, qc, gc, max_rank=50)
    cmc_o, map_o = eval_market1501(dm, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_o, atol=1e-5)
    np.testing.assert_allclose(float(map_d), map_o, atol=1e-6)


def test_mars_device_small_gallery_no_good_query():
    """num_g < max_rank: device path must keep CMC=0 past R for queries with
    no good match (sentinel >= max_rank regression, mirrors the NumPy test)."""
    qf = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    gf = np.array([[1.0, 0.1], [0.1, 1.0], [-1.0, -1.0]], np.float32)
    qp = np.array([0, 1])
    gp = np.array([0, 1, 2])
    qc = np.array([0, 0])
    gc = np.array([0, 1, 1])  # query 0's only pid match is same-cam -> junk
    max_rank = 10
    cmc_d, map_d = evaluate_mars_device(
        jnp.asarray(qf), jnp.asarray(gf), qp, gp, qc, gc,
        max_rank=max_rank, metric="euclidean", tile=8,
    )
    dm = compute_distance_matrix(qf, gf, "euclidean")
    cmc_o, map_o = evaluate_mars(dm, qp, gp, qc, gc, max_rank=max_rank)
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_o, atol=1e-6)
    np.testing.assert_allclose(float(map_d), map_o, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cmc_d), np.full(max_rank, 0.5))


class TestCuhk03Device:
    """Device cuhk03 (ops.rank.cuhk03_cmc_map) vs the NumPy path."""

    def _problem(self, seed, **kw):
        from .oracles import make_reid_problem

        return make_reid_problem(np.random.RandomState(seed), **kw)

    def test_ap_and_validity_exact(self):
        """AP ignores the resampling -> must match NumPy exactly."""
        from agrl_tpu.metrics.rank import eval_cuhk03
        from agrl_tpu.ops.rank import cuhk03_cmc_map
        import jax

        dist, qp, gp, qc, gc = self._problem(0, num_q=15, num_g=120, num_pids=12)
        np.random.seed(0)
        _, map_np = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=10)
        _, map_d = cuhk03_cmc_map(
            dist, qp, gp, qc, gc, jax.random.PRNGKey(0), max_rank=10
        )
        np.testing.assert_allclose(float(map_d), map_np, atol=1e-6)

    def test_single_slot_per_pid_is_deterministic_and_exact(self):
        """Every gallery pid appears once -> sampling has one outcome; the
        device CMC must equal the NumPy CMC bitwise."""
        from agrl_tpu.metrics.rank import eval_cuhk03
        from agrl_tpu.ops.rank import cuhk03_cmc_map
        import jax

        rng = np.random.RandomState(3)
        num_pids = 40
        gp = np.arange(num_pids)
        qp = rng.randint(0, num_pids, 12)
        qc = np.zeros(12, np.int64)
        gc = np.ones(num_pids, np.int64)
        dist = rng.rand(12, num_pids)
        np.random.seed(0)
        cmc_np, map_np = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=10)
        cmc_d, map_d = cuhk03_cmc_map(
            dist, qp, gp, qc, gc, jax.random.PRNGKey(1), max_rank=10
        )
        np.testing.assert_allclose(np.asarray(cmc_d), cmc_np, atol=1e-6)
        np.testing.assert_allclose(float(map_d), map_np, atol=1e-6)

    def test_cmc_statistical_parity(self):
        """With many repeats both samplers converge to the same expected
        CMC curve (different RNGs -> statistical, not bitwise, agreement)."""
        from agrl_tpu.metrics.rank import eval_cuhk03
        from agrl_tpu.ops.rank import cuhk03_cmc_map
        import jax

        dist, qp, gp, qc, gc = self._problem(7, num_q=25, num_g=150, num_pids=10)
        np.random.seed(123)
        cmc_np, _ = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=8, num_repeats=200)
        cmc_d, _ = cuhk03_cmc_map(
            dist, qp, gp, qc, gc, jax.random.PRNGKey(5), max_rank=8, num_repeats=200
        )
        np.testing.assert_allclose(np.asarray(cmc_d), cmc_np, atol=0.03)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dukev_device_matches_host(seed):
    """Device duke-protocol scorer vs the host sklearn loop AND its
    vectorized closed form."""
    from agrl_tpu.metrics.rank import evaluate_dukev, evaluate_dukev_fast
    from agrl_tpu.ops.rank import dukev_cmc_map

    from .oracles import make_reid_problem

    rng = np.random.RandomState(seed)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=12, num_g=150, num_pids=10)
    cmc_h, map_h = evaluate_dukev(dist, qp, gp, qc, gc)
    cmc_f, map_f = evaluate_dukev_fast(dist, qp, gp, qc, gc)
    cmc_d, map_d = dukev_cmc_map(
        jnp.asarray(dist, jnp.float32), jnp.asarray(qp), jnp.asarray(gp),
        jnp.asarray(qc), jnp.asarray(gc),
    )
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_f, atol=1e-5)
    np.testing.assert_allclose(float(map_d), map_f, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_h, atol=1e-5)
    np.testing.assert_allclose(float(map_d), map_h, atol=1e-5)


def test_dukev_device_invalid_queries():
    from agrl_tpu.metrics.rank import evaluate_dukev_fast
    from agrl_tpu.ops.rank import dukev_cmc_map

    from .oracles import make_reid_problem

    rng = np.random.RandomState(5)
    dist, qp, gp, qc, gc = make_reid_problem(rng, num_q=10, num_g=120, num_pids=8)
    qp = qp.copy()
    qp[::3] = 777
    cmc_f, map_f = evaluate_dukev_fast(dist, qp, gp, qc, gc)
    cmc_d, map_d = dukev_cmc_map(
        jnp.asarray(dist, jnp.float32), jnp.asarray(qp), jnp.asarray(gp),
        jnp.asarray(qc), jnp.asarray(gc),
    )
    np.testing.assert_allclose(np.asarray(cmc_d), cmc_f, atol=1e-5)
    np.testing.assert_allclose(float(map_d), map_f, atol=1e-5)
