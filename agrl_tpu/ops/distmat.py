"""Q x G distance matrices on device.

Replaces the reference's torch addmm/matmul path
(torchreid/metrics/distance.py:59-89) with jitted XLA matmuls; on TPU the
(Q, D) x (D, G) contraction is a single MXU-tiled matmul — the elementwise
norm terms fuse into it. For multi-chip eval the GALLERY axis is sharded
over the mesh's 'dp' axis: each chip computes its (Q, G/n) stripe and the
result stays sharded for the subsequent top-k/argsort (SURVEY.md §2.8).

Conventions match the oracle in agrl_tpu.metrics.distance:
  * euclidean -> SQUARED distances
  * cosine    -> 1 - <q_hat, g_hat>
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def euclidean_sq_distmat(qf: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
    """(Q, D), (G, D) -> (Q, G) squared euclidean distances."""
    q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)  # (Q, 1)
    g_sq = jnp.sum(gf * gf, axis=1, keepdims=True).T  # (1, G)
    cross = jnp.dot(
        qf, gf.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return q_sq + g_sq - 2.0 * cross


def cosine_distmat(qf: jnp.ndarray, gf: jnp.ndarray) -> jnp.ndarray:
    """(Q, D), (G, D) -> (Q, G) cosine distances (1 - cos)."""
    qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
    gn = gf / jnp.maximum(jnp.linalg.norm(gf, axis=1, keepdims=True), 1e-12)
    return 1.0 - jnp.dot(
        qn, gn.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def compute_distmat(qf, gf, metric: str = "euclidean") -> jnp.ndarray:
    if metric == "euclidean":
        return euclidean_sq_distmat(qf, gf)
    if metric == "cosine":
        return cosine_distmat(qf, gf)
    raise ValueError(f"Unknown distance metric: {metric}")


from functools import lru_cache


@lru_cache(maxsize=8)
def _sharded_distmat_fn(mesh: Mesh, metric: str):
    # cached per (mesh, metric): a fresh jit-wrapped lambda per call would
    # miss jax's executable cache (keyed by function identity) and pay a
    # full XLA compile at every evaluation
    return jax.jit(
        lambda q, g: compute_distmat(q, g, metric),
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("dp", None)),
        ),
        out_shardings=NamedSharding(mesh, P(None, "dp")),
    )


def sharded_distmat(
    mesh: Mesh, qf, gf, metric: str = "euclidean"
) -> jnp.ndarray:
    """Distance matrix with the gallery axis sharded over 'dp'.

    Queries replicate; each chip owns a gallery stripe; the output (Q, G)
    is sharded on its gallery axis — XLA inserts no gather unless the
    caller requests a replicated result."""
    return _sharded_distmat_fn(mesh, metric)(qf, gf)
