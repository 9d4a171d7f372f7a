"""On-device CMC/mAP ranking — the TPU-native replacement for rank_cylib.

The reference accelerates its per-query CMC/AP loops with a generated-C
Cython extension (torchreid/metrics/rank_cylib/rank_cy.pyx:24-249). The
TPU equivalent reorganizes the math so queries become a batch axis:

  * MARS protocol (evaluate_mars, rank.py:160-212) truncates the ranking
    to max_rank BEFORE scoring, so only a top-k is needed: the distance
    matrix is consumed in gallery tiles with a streaming top-k merge —
    the full (Q, G) matrix never needs a device-wide argsort, and with a
    sharded gallery each chip merges its own stripe's top-k before one
    small all-gather.
  * The per-query walk (junk skipping, trapezoid AP, first-good CMC)
    becomes masked cumulative sums over the top-k axis (same formulation
    as the vectorized NumPy oracle in agrl_tpu.metrics.rank, which these
    kernels are tested against).
  * market1501 protocol needs full-ranking cumsums -> one device argsort.

Everything here is jit-compatible and returns device arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "tile", "metric"))
def streaming_topk(
    qf: jnp.ndarray, gf: jnp.ndarray, k: int = 50, tile: int = 2048, metric: str = "cosine"
):
    """Top-k smallest distances without materializing (Q, G).

    qf: (Q, D), gf: (G, D) -> (dists (Q, k), indices (Q, k)).
    Gallery is processed in `tile`-column blocks; per block the current
    best-k merges with the block's k via lax.top_k (scan over blocks)."""
    Q, D = qf.shape
    G = gf.shape[0]
    n_tiles = -(-G // tile)
    G_pad = n_tiles * tile

    if metric == "cosine":
        qn = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
        gn = gf / jnp.maximum(jnp.linalg.norm(gf, axis=1, keepdims=True), 1e-12)
    else:
        qn, gn = qf, gf

    pad = G_pad - G
    g_padded = jnp.concatenate([gn, jnp.zeros((pad, D), gn.dtype)]) if pad else gn
    g_tiles = g_padded.reshape(n_tiles, tile, D)

    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    def block_dist(g_block):
        if metric == "cosine":
            return 1.0 - jnp.dot(
                qn, g_block.T, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        sq_q = jnp.sum(qn * qn, axis=1, keepdims=True)
        sq_g = jnp.sum(g_block * g_block, axis=1)[None, :]
        return sq_q + sq_g - 2.0 * jnp.dot(
            qn, g_block.T, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    def step(carry, inp):
        best_d, best_i = carry
        t, g_block = inp
        d = block_dist(g_block)  # (Q, tile)
        col = t * tile + jnp.arange(tile)[None, :]
        d = jnp.where(col < G, d, big)  # mask padding columns
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(col, d.shape)], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        return (-neg_top, jnp.take_along_axis(cat_i, arg, axis=1)), None

    # initializer slots carry an OUT-OF-RANGE index (G): when k > G the
    # surviving fillers must not alias gallery entry 0
    init = (jnp.full((Q, k), big), jnp.full((Q, k), G, jnp.int32))
    (dists, idx), _ = jax.lax.scan(
        step, init, (jnp.arange(n_tiles), g_tiles)
    )
    return dists, idx


def mars_cmc_map_from_topk(
    topk_idx: jnp.ndarray,
    q_pids: jnp.ndarray,
    g_pids: jnp.ndarray,
    q_camids: jnp.ndarray,
    g_camids: jnp.ndarray,
    max_rank: int = 50,
):
    """MARS CMC/mAP from top-k gallery indices (top-k >= max_rank).

    Same cumulative-sum trapezoid formulation as the NumPy oracle
    (agrl_tpu.metrics.rank.evaluate_mars)."""
    G = g_pids.shape[0]
    R = min(max_rank, topk_idx.shape[1])
    idx = topk_idx[:, :R]
    in_range = idx < G  # small galleries: top-k slots may be padding
    g_pid_s = g_pids[jnp.clip(idx, 0, G - 1)]
    g_cam_s = g_camids[jnp.clip(idx, 0, G - 1)]
    good = (g_pid_s == q_pids[:, None]) & (g_cam_s != q_camids[:, None]) & in_range
    junk = ~in_range | (g_pid_s == -1) | (
        (g_pid_s == q_pids[:, None]) & (g_cam_s == q_camids[:, None])
    )
    keep = ~junk
    good = good & keep

    ngood = (
        (g_pids[None, :] == q_pids[:, None]) & (g_camids[None, :] != q_camids[:, None])
    ).sum(axis=1)

    j = jnp.cumsum(keep, axis=1)
    cs = jnp.cumsum(good, axis=1)
    prec = jnp.where(good, cs / jnp.maximum(j, 1), 0.0)
    old_prec = jnp.where(good & (j > 1), (cs - 1) / jnp.maximum(j - 1, 1), 1.0)
    old_prec = jnp.where(good, old_prec, 0.0)
    ap = ((prec + old_prec) / 2.0 * good).sum(axis=1) / jnp.maximum(ngood, 1)
    ap = jnp.where(ngood > 0, ap, 0.0)

    # no-good sentinel must be >= max_rank (not R): with num_g < max_rank a
    # sentinel of R would flip CMC to 1 past R for queries with no match
    first_good = jnp.where(good, j - 1, max_rank).min(axis=1)
    cmc = (jnp.arange(max_rank)[None, :] >= first_good[:, None]).astype(jnp.float32)
    return cmc.mean(axis=0), ap.mean()


@partial(jax.jit, static_argnames=("max_rank",))
def market1501_cmc_map(
    distmat, q_pids, g_pids, q_camids, g_camids, max_rank: int = 50
):
    """market1501 protocol fully on device (full-gallery sort + cumsums)."""
    distmat = jnp.asarray(distmat)
    Q, G = distmat.shape
    indices = jnp.argsort(distmat, axis=1)
    g_pid_s = g_pids[indices]
    g_cam_s = g_camids[indices]
    match = g_pid_s == q_pids[:, None]
    keep = ~(match & (g_cam_s == q_camids[:, None]))
    good = match & keep

    j = jnp.cumsum(keep, axis=1)
    cs = jnp.cumsum(good, axis=1)
    num_rel = good.sum(axis=1)
    valid = num_rel > 0

    prec = jnp.where(good, cs / jnp.maximum(j, 1), 0.0)
    ap = prec.sum(axis=1) / jnp.maximum(num_rel, 1)

    first_good = jnp.where(good, j - 1, G).min(axis=1)
    cmc_rows = (jnp.arange(max_rank)[None, :] >= first_good[:, None]).astype(jnp.float32)

    n_valid = jnp.maximum(valid.sum(), 1)
    cmc = (cmc_rows * valid[:, None]).sum(axis=0) / n_valid
    mAP = (ap * valid).sum() / n_valid
    return cmc, mAP


@partial(jax.jit, static_argnames=("max_rank",))
def dukev_cmc_map(
    distmat, q_pids, g_pids, q_camids, g_camids, max_rank: int = 50
):
    """Duke video protocol fully on device: the closed-form sklearn PR-AUC
    (trapezoid against the appended (recall=0, precision=1) endpoint —
    same formulation as metrics.rank.evaluate_dukev_fast, exact for
    tie-free distances) + first-match-break CMC over
    topk = max(100, max_rank) kept ranks (reference rank.py:330-343)."""
    topk = max(100, max_rank)
    distmat = jnp.asarray(distmat)
    Q, G = distmat.shape
    indices = jnp.argsort(distmat, axis=1)
    g_pid_s = g_pids[indices]
    g_cam_s = g_camids[indices]
    match = g_pid_s == q_pids[:, None]
    keep = ~(match & (g_cam_s == q_camids[:, None]))
    good = match & keep

    j = jnp.cumsum(keep, axis=1)
    cs = jnp.cumsum(good, axis=1)
    num_rel = good.sum(axis=1)
    valid = num_rel > 0

    prec = jnp.where(good, cs / jnp.maximum(j, 1), 0.0)
    old_prec = jnp.where(good & (j > 1), (cs - 1) / jnp.maximum(j - 1, 1), 1.0)
    old_prec = jnp.where(good, old_prec, 0.0)
    ap = ((prec + old_prec) / 2.0 * good).sum(axis=1) / jnp.maximum(num_rel, 1)

    first_good = jnp.where(good, j - 1, G).min(axis=1)
    cmc_rows = (jnp.arange(topk)[None, :] >= first_good[:, None]).astype(jnp.float32)

    n_valid = jnp.maximum(valid.sum(), 1)
    cmc = (cmc_rows * valid[:, None]).sum(axis=0) / n_valid
    mAP = (ap * valid).sum() / n_valid
    return cmc, mAP


@partial(jax.jit, static_argnames=("max_rank",))
def mars_cmc_map_from_distmat(
    distmat, q_pids, g_pids, q_camids, g_camids, max_rank: int = 50
):
    """MARS protocol from an explicit (Q, G) distance matrix (e.g. the
    re-ranked one): device top-k then the masked-cumsum scorer."""
    k = min(max_rank, distmat.shape[1])
    _, idx = jax.lax.top_k(-jnp.asarray(distmat, jnp.float32), k)
    return mars_cmc_map_from_topk(
        idx, jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=max_rank,
    )


@partial(jax.jit, static_argnames=("max_rank", "metric", "tile"))
def evaluate_mars_device(
    qf, gf, q_pids, g_pids, q_camids, g_camids,
    max_rank: int = 50, metric: str = "cosine", tile: int = 2048,
):
    """Feature matrices in, (CMC curve, mAP) out — one XLA program."""
    _, idx = streaming_topk(qf, gf, k=max_rank, tile=tile, metric=metric)
    return mars_cmc_map_from_topk(
        idx, jnp.asarray(q_pids), jnp.asarray(g_pids),
        jnp.asarray(q_camids), jnp.asarray(g_camids), max_rank=max_rank,
    )


@partial(jax.jit, static_argnames=("max_rank", "num_repeats"))
def cuhk03_cmc_map(
    distmat,
    q_pids,
    g_pids,
    q_camids,
    g_camids,
    key,
    max_rank: int = 50,
    num_repeats: int = 10,
):
    """cuhk03 protocol fully on device (reference rank.py:22-92 and
    rank_cylib/rank_cy.pyx:35-151).

    The protocol's per-query single-gallery-shot resampling — one random
    kept slot per distinct gallery pid, `num_repeats` times — vectorizes
    as a sort-based segmented argmin: draw iid uniforms per slot, sort
    each query's kept slots by the composite key (pid + u), and the first
    slot of every pid segment is that pid's sample. The masked CMC then
    collapses to `rank >= r0` where r0 counts chosen slots that precede
    the query pid's chosen slot in the original ranking.

    Sampling uses the JAX PRNG (`key`): statistically identical to the
    reference's np.random.choice but not draw-for-draw reproducible
    against it; the deterministic parts (AP, keep/valid logic, and the
    one-slot-per-pid degenerate case) match the NumPy path exactly.
    """
    distmat = jnp.asarray(distmat)
    q_pids = jnp.asarray(q_pids)
    g_pids = jnp.asarray(g_pids)
    q_camids = jnp.asarray(q_camids)
    g_camids = jnp.asarray(g_camids)
    Q, G = distmat.shape

    indices = jnp.argsort(distmat, axis=1)
    g_pid_s = g_pids[indices]
    g_cam_s = g_camids[indices]
    match = g_pid_s == q_pids[:, None]
    keep = ~(match & (g_cam_s == q_camids[:, None]))
    good = match & keep

    # kept-rank (0-based position among kept slots) of every sorted slot
    j = jnp.cumsum(keep, axis=1)
    pos = j - 1

    # ---- AP over the full kept ranking (deterministic, = market1501) ----
    cs = jnp.cumsum(good, axis=1)
    num_rel = good.sum(axis=1)
    valid = num_rel > 0
    prec = jnp.where(good, cs / jnp.maximum(j, 1), 0.0)
    ap = prec.sum(axis=1) / jnp.maximum(num_rel, 1)

    # ---- single-gallery-shot CMC, num_repeats vectorized rounds ----
    # sample one slot per pid segment: random permutation (argsort of iid
    # uniforms) then STABLE sort by pid — the first slot of each pid
    # segment is a uniform draw from that pid's kept slots. Exact integer
    # keys: no composite-float precision traps. Non-kept slots sink to a
    # sentinel pid segment at the end.
    sentinel = jnp.iinfo(jnp.int32).max
    pid_keyed = jnp.where(keep, g_pid_s.astype(jnp.int64), sentinel)
    ranks = jnp.arange(max_rank)

    def one_round(carry, rk):
        u = jax.random.uniform(rk, (Q, G))
        ord_u = jnp.argsort(u, axis=1)  # random permutation per query
        pid_perm = jnp.take_along_axis(pid_keyed, ord_u, axis=1)
        ord_pid = jnp.argsort(pid_perm, axis=1, stable=True)
        order2 = jnp.take_along_axis(ord_u, ord_pid, axis=1)
        pid_sorted = jnp.take_along_axis(g_pid_s, order2, axis=1)
        keep_sorted = jnp.take_along_axis(keep, order2, axis=1)
        pos_sorted = jnp.take_along_axis(pos, order2, axis=1)
        first = jnp.concatenate(
            [
                jnp.ones((Q, 1), bool),
                pid_sorted[:, 1:] != pid_sorted[:, :-1],
            ],
            axis=1,
        )
        chosen = first & keep_sorted  # one slot per distinct kept pid
        # the query pid's chosen slot position in the kept ranking
        is_q = chosen & (pid_sorted == q_pids[:, None])
        pos_star = jnp.where(is_q, pos_sorted, 0).sum(axis=1)
        # #other pids whose chosen slot precedes it
        r0 = (chosen & (pos_sorted < pos_star[:, None])).sum(axis=1)
        cmc_round = (ranks[None, :] >= r0[:, None]).astype(jnp.float32)
        return carry + cmc_round, None

    keys = jax.random.split(key, num_repeats)
    cmc_sum, _ = jax.lax.scan(one_round, jnp.zeros((Q, max_rank), jnp.float32), keys)
    cmc_rows = cmc_sum / num_repeats

    n_valid = jnp.maximum(valid.sum(), 1)
    cmc = (cmc_rows * valid[:, None]).sum(axis=0) / n_valid
    mAP = (ap * valid).sum() / n_valid
    return cmc, mAP
