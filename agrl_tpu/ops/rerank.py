"""k-reciprocal re-ranking on device — the TPU-native replacement for the
host loop implementation.

Behavioral parity with reference torchreid/utils/re_ranking.py:30-95 (and
agrl_tpu.metrics.rerank, which is oracle-tested against it). The public
algorithm is a chain of ragged per-row set operations; on TPU every set
becomes a boolean membership matrix and the set algebra becomes matmuls
on the MXU:

  * top-(k+1) neighbor sets          -> one-hot scatter of lax.top_k
    indices: F[i, j] = "j is in i's top-(k+1)"
  * k-reciprocal sets                -> R = F & F.T
  * candidate-expansion overlap test -> |R(i) n Rh(c)| = (R @ Rh.T)[i, c]
    (0/1 matmul; bf16 inputs are exact, f32 accumulation)
  * union of accepted half-sets      -> (cond @ Rh) > 0
  * local query expansion (k2-NN mean of membership rows)
                                     -> top-k2 indicator matmul
  * Jaccard min-sum  sum_c min(V[q,c], V[j,c])
                                     -> tiled min-plus reduction on the
    VPU (lax.scan over gallery-row tiles; the (Q, T, N) broadcast-minimum
    fuses into its reduction, nothing is materialized)

At MARS scale (Q+G = 11,310) the whole re-rank is a few N^2/N^3 device
ops instead of an O(N) Python loop over rows; the host path takes tens
of seconds, the device path well under a second.

Sampling-free and deterministic: results match the host implementation
to float tolerance (tie-breaks inside lax.top_k vs np.argsort can differ
on exactly-equal distances, which never occurs for real features).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _membership(idx: jnp.ndarray, k: int, n: int) -> jnp.ndarray:
    """Boolean (N, N): True where column j is among row i's k nearest.

    `idx` is one (N, kmax) top-k index table sorted by distance, so every
    smaller-k membership is a column slice of it; k clamps to N like the
    host path's `rank[i, :k]` slice does."""
    cols = idx[:, : min(k, n)]
    return jnp.zeros((n, n), bool).at[jnp.arange(n)[:, None], cols].set(True)


def _bool_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact 0/1-count matmul: bf16 operands (0/1 exact), f32 accumulate."""
    return jnp.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _min_sum(vq: jnp.ndarray, v: jnp.ndarray, tile: int = 64) -> jnp.ndarray:
    """(Q, N), (N, N) -> (Q, N): ms[q, j] = sum_c min(vq[q, c], v[j, c]).

    Min-plus "distance matrix" over membership rows — the dominant cost
    of device re-ranking. On TPU this dispatches to the Pallas min-plus
    kernel (ops/minsum.py; 0.13 s vs 1.19 s for the scan at MARS scale,
    ~VPU speed-of-light); elsewhere a lax.scan over gallery-row tiles
    whose broadcast-minimum fuses into its reduction."""
    if jax.default_backend() == "tpu":
        from agrl_tpu.ops.minsum import min_sum_pallas

        return min_sum_pallas(vq, v)

    q, n = vq.shape
    pad = (-v.shape[0]) % tile
    v_tiles = jnp.pad(v, ((0, pad), (0, 0))).reshape(-1, tile, n)

    def step(_, vt):
        # (Q, 1, N) min (1, T, N) -> sum over N = (Q, T); fused reduce
        ms = jnp.sum(jnp.minimum(vq[:, None, :], vt[None, :, :]), axis=-1)
        return None, ms.T  # (T, Q)

    _, out = jax.lax.scan(step, None, v_tiles)
    return out.reshape(-1, q)[: v.shape[0]].T


@partial(jax.jit, static_argnames=("k1", "k2", "tile"))
def re_ranking_device(
    q_g_dist: jnp.ndarray,
    q_q_dist: jnp.ndarray,
    g_g_dist: jnp.ndarray,
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
    tile: int = 64,
) -> jnp.ndarray:
    """Returns the re-ranked (Q, G) distance matrix as a device array."""
    num_q = q_g_dist.shape[0]
    top = jnp.concatenate([q_q_dist, q_g_dist], axis=1)
    bottom = jnp.concatenate([q_g_dist.T, g_g_dist], axis=1)
    dist = jnp.concatenate([top, bottom], axis=0).astype(jnp.float32) ** 2
    # per-column max normalization, then transpose (matches public impl)
    dist = (dist / dist.max(axis=0)).T
    n = dist.shape[0]
    half_k = int(round(k1 / 2))

    # ONE top-k pass serves all three neighbor sets (k1+1, half_k+1, k2):
    # lax.top_k returns indices sorted by distance, so the smaller sets
    # are column slices
    kmax = min(max(k1 + 1, half_k + 1, k2), n)
    _, nn_idx = jax.lax.top_k(-dist, kmax)

    # k-reciprocal membership at k1 and k1/2
    f_full = _membership(nn_idx, k1 + 1, n)
    r_full = f_full & f_full.T
    f_half = _membership(nn_idx, half_k + 1, n)
    r_half = f_half & f_half.T

    # candidate expansion: for each candidate c in R(i), adopt Rh(c) when
    # |Rh(c) n R(i)| > 2/3 |Rh(c)|  (reference re_ranking.py:52-57).
    # 3*overlap > 2*|Rh| — the exact-integer form of the reference's f64
    # `len(inter) > 2./3*len(Rh)`: verified empirically that the f64 (and
    # f32) product lands exactly on the integer for |Rh| divisible by 3,
    # so strict > rejects equality there, and equality is impossible
    # otherwise — the integer comparison reproduces it with no float
    # threshold at all
    overlap = _bool_matmul(r_full, r_half.T)  # (i, c) -> |R(i) n Rh(c)|
    rh_size = jnp.sum(r_half, axis=1).astype(jnp.float32)  # |Rh(c)|
    cond = r_full & (3.0 * overlap > 2.0 * rh_size[None, :])
    expanded = r_full | (_bool_matmul(cond, r_half) > 0)

    # soft membership: Gaussian weight over the expanded set, row-normalized
    w = jnp.where(expanded, jnp.exp(-dist), 0.0)
    v = w / jnp.sum(w, axis=1, keepdims=True)  # i in R(i) => row sum > 0

    # local query expansion: mean membership over the k2 nearest neighbors
    # — k2 row gathers (k2 * N^2 reads) instead of an (N, N) x (N, N)
    # indicator matmul (N^3 flops)
    if k2 != 1:
        k2 = min(k2, n)
        v = sum(v[nn_idx[:, k], :] for k in range(k2)) / k2

    min_sum = _min_sum(v[:num_q], v, tile=tile)  # (Q, N)
    jaccard = 1.0 - min_sum / (2.0 - min_sum)
    final = jaccard * (1.0 - lambda_value) + dist[:num_q] * lambda_value
    return final[:, num_q:]


def re_ranking_from_features(
    qf: jnp.ndarray,
    gf: jnp.ndarray,
    metric: str = "euclidean",
    k1: int = 20,
    k2: int = 6,
    lambda_value: float = 0.3,
) -> jnp.ndarray:
    """Device re-ranking straight from feature matrices (no host matrix).

    Computes the three distance blocks on device (same conventions the
    evaluator feeds the host path: squared euclidean / 1-cos) and returns
    the re-ranked (Q, G) distance as a device array."""
    from agrl_tpu.ops.distmat import compute_distmat

    q_g = compute_distmat(qf, gf, metric)
    q_q = compute_distmat(qf, qf, metric)
    g_g = compute_distmat(gf, gf, metric)
    return re_ranking_device(q_g, q_q, g_g, k1=k1, k2=k2, lambda_value=lambda_value)
