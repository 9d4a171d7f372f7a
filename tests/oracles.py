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
    if ngood == 0:
        # the reference divides by zero here (recall = .../ngood); real MARS
        # queries always have a cross-camera match. Extension: AP=0, CMC=0.
        return 0.0, cmc
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
        ap[k], row = mars_ap_cmc_single(good_idx, junk_idx, sort_idx)
        # num_g < max_rank: the reference's cmc[k, :] assignment would
        # broadcast-error; define the extension as pad-with-last-value
        # (1 past the first good, 0 if no good was found)
        cmc[k, : len(row)] = row
        if len(row) < max_rank and len(row) > 0:
            cmc[k, len(row):] = row[-1]
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


# ---------------------------------------------------------------------------
# Graph-builder oracle: transcription of the reference's set/bisect/
# permutations pipeline (dataset_loader.py:218-404)
# ---------------------------------------------------------------------------

from bisect import bisect_right
from collections import defaultdict
from itertools import permutations


def graph_oracle(poses, heights, num_split, num_scale, pyramid_part,
                 threshold=0.1, method="same"):
    part_names = ["head", "body", "leg"]
    body_id_dict = {
        "head": [0, 1, 14, 15, 16, 17],
        "body": [2, 3, 4, 5, 6, 7],
        "leg": [8, 9, 10, 11, 12, 13],
    }
    part_contain_list = []
    for pose, H in zip(poses, heights):
        splits = np.arange(0, H + 1, H / num_split)
        part_contain = defaultdict(set)
        for part_name, part_ids in body_id_dict.items():
            for p_id in part_ids:
                if pose[p_id, 2] > threshold:
                    loc = bisect_right(list(splits), pose[p_id, 1])
                    loc = min(num_split, max(1, loc))
                    part_contain[part_name].add(loc)
        for part_name in list(part_contain.keys()):
            s = part_contain[part_name]
            if len(s) > 1:
                part_contain[part_name] = set(range(min(s), max(s) + 1)) | s
        part_contain_list.append(part_contain)

    seq_len = len(part_contain_list)
    from agrl_tpu.utils.reidtools import calc_splits
    num_total_splits = sum(calc_splits(num_split)) if pyramid_part else num_split

    if pyramid_part:
        k = int(np.log2(num_split))
        new_list = []
        for part_contain in part_contain_list:
            new_pc = {}
            for part_name, cur_set in part_contain.items():
                new_set = set(cur_set)
                for split_id in cur_set:
                    new_set.update(
                        int(np.ceil(split_id / np.power(2, i)))
                        + (np.power(2, k + 1) - np.power(2, k + 1 - i))
                        for i in range(1, k + 1)
                    )
                new_pc[part_name] = new_set
            new_list.append(defaultdict(set, new_pc))
        part_contain_list = new_list

    adj = np.zeros((num_total_splits * seq_len, num_total_splits * seq_len))
    pairs = [[i, i] for i in range(3)]
    if method == "adjacent":
        pairs += [[i, i + 1] for i in range(2)]
    name_pairs = [(part_names[a], part_names[b]) for a, b in pairs]
    for n0, n1 in name_pairs:
        related = set()
        for seq_id in range(seq_len):
            related.update(
                sid + seq_id * num_total_splits
                for sid in part_contain_list[seq_id][n0]
            )
            if n0 != n1:
                related.update(
                    sid + seq_id * num_total_splits
                    for sid in part_contain_list[seq_id][n1]
                )
        for a, b in permutations(related, 2):
            adj[a - 1, b - 1] = 1

    if num_scale > 1:
        size = adj.shape[0]
        big = np.zeros((num_scale * size, num_scale * size))
        eye = np.eye(size)
        for si in range(num_scale):
            for sj in range(num_scale):
                big[si*size:(si+1)*size, sj*size:(sj+1)*size] = adj if si == sj else eye
        adj = big
    return adj.astype(np.float32)
