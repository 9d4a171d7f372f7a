"""Straight per-query-loop oracles transcribing the reference metric
semantics (torchreid/metrics/rank.py). These intentionally mirror the
reference's control flow so the framework's vectorized implementations can
be tested for exact numerical parity."""

from __future__ import annotations

import numpy as np


def mars_ap_cmc_single(good_image, junk_image, index):
    """Reference Compute_AP (rank.py:180-212): trapezoid AP + CMC for one
    query over a (possibly truncated) ranked index list."""
    cmc = np.zeros(len(index))
    ngood = len(good_image)
    old_recall = 0.0
    old_precision = 1.0
    ap = 0.0
    intersect_size = 0
    j = 0
    good_now = 0
    njunk = 0
    for n in range(len(index)):
        flag = 0
        if np.any(good_image == index[n]):
            cmc[n - njunk:] = 1
            flag = 1
            good_now += 1
        if np.any(junk_image == index[n]):
            njunk += 1
            continue
        if flag == 1:
            intersect_size += 1
        recall = intersect_size / ngood
        precision = intersect_size / (j + 1)
        ap += (recall - old_recall) * (old_precision + precision) / 2
        old_recall = recall
        old_precision = precision
        j += 1
        if good_now == ngood:
            return ap, cmc
    return ap, cmc


def mars_eval_loop(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    """Reference evaluate_mars (rank.py:160-177)."""
    num_q, _ = distmat.shape
    cmc = np.zeros((num_q, max_rank))
    ap = np.zeros(num_q)
    for k in range(num_q):
        good_idx = np.where((q_pids[k] == g_pids) & (q_camids[k] != g_camids))[0]
        junk_mask1 = g_pids == -1
        junk_mask2 = (q_pids[k] == g_pids) & (q_camids[k] == g_camids)
        junk_idx = np.where(junk_mask1 | junk_mask2)[0]
        sort_idx = np.argsort(distmat[k, :])[:max_rank]
        ap[k], cmc[k, :] = mars_ap_cmc_single(good_idx, junk_idx, sort_idx)
    return np.mean(cmc, axis=0), float(np.mean(ap))


def market1501_eval_loop(distmat, q_pids, g_pids, q_camids, g_camids, max_rank=50):
    """Reference eval_market1501 (rank.py:95-150)."""
    num_q, num_g = distmat.shape
    if num_g < max_rank:
        max_rank = num_g
    indices = np.argsort(distmat, axis=1)
    matches = (g_pids[indices] == q_pids[:, None]).astype(np.int32)
    all_cmc, all_ap = [], []
    num_valid_q = 0.0
    for q_idx in range(num_q):
        order = indices[q_idx]
        remove = (g_pids[order] == q_pids[q_idx]) & (g_camids[order] == q_camids[q_idx])
        keep = np.invert(remove)
        raw_cmc = matches[q_idx][keep]
        if not np.any(raw_cmc):
            continue
        cmc = raw_cmc.cumsum()
        cmc[cmc > 1] = 1
        all_cmc.append(cmc[:max_rank])
        num_valid_q += 1.0
        num_rel = raw_cmc.sum()
        tmp_cmc = raw_cmc.cumsum()
        tmp_cmc = [x / (i + 1.0) for i, x in enumerate(tmp_cmc)]
        tmp_cmc = np.asarray(tmp_cmc) * raw_cmc
        all_ap.append(tmp_cmc.sum() / num_rel)
    assert num_valid_q > 0
    all_cmc = np.asarray(all_cmc).astype(np.float32).sum(0) / num_valid_q
    return all_cmc, float(np.mean(all_ap))


def make_reid_problem(rng, num_q=30, num_g=300, num_pids=20, num_cams=4, dim=16):
    """Synthetic re-id ranking problem with clustered features so metrics
    are non-degenerate."""
    centers = rng.randn(num_pids, dim) * 3
    q_pids = rng.randint(0, num_pids, size=num_q)
    g_pids = rng.randint(0, num_pids, size=num_g)
    q_camids = rng.randint(0, num_cams, size=num_q)
    g_camids = rng.randint(0, num_cams, size=num_g)
    qf = centers[q_pids] + rng.randn(num_q, dim)
    gf = centers[g_pids] + rng.randn(num_g, dim)
    dist = ((qf[:, None, :] - gf[None, :, :]) ** 2).sum(-1)
    return dist, q_pids, g_pids, q_camids, g_camids
