"""Device distmat parity vs the NumPy oracle, incl. gallery sharding."""

import jax
import numpy as np

from agrl_tpu.metrics.distance import compute_distance_matrix
from agrl_tpu.ops.distmat import (
    compute_distmat,
    cosine_distmat,
    euclidean_sq_distmat,
    sharded_distmat,
)
from agrl_tpu.parallel import make_mesh


def test_euclidean_parity(rng):
    qf = rng.randn(17, 64).astype(np.float32)
    gf = rng.randn(33, 64).astype(np.float32)
    got = np.asarray(jax.jit(euclidean_sq_distmat)(qf, gf))
    want = compute_distance_matrix(qf, gf, "euclidean")
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_cosine_parity(rng):
    qf = rng.randn(17, 64).astype(np.float32)
    gf = rng.randn(33, 64).astype(np.float32)
    got = np.asarray(jax.jit(cosine_distmat)(qf, gf))
    want = compute_distance_matrix(qf, gf, "cosine")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_gallery_matches_replicated(rng):
    mesh = make_mesh(dp=8, mp=1)
    qf = rng.randn(16, 32).astype(np.float32)
    gf = rng.randn(64, 32).astype(np.float32)
    for metric in ("euclidean", "cosine"):
        with mesh:
            got = np.asarray(sharded_distmat(mesh, qf, gf, metric))
        want = np.asarray(compute_distmat(qf, gf, metric))
        np.testing.assert_allclose(got, want, atol=1e-4)
