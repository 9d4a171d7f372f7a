"""k-reciprocal re-ranking parity vs a transcription of the public
reference algorithm (utils/re_ranking.py), plus behavioral checks."""

import numpy as np
import pytest

from agrl_tpu.metrics.rerank import re_ranking


def reference_re_ranking(q_g_dist, q_q_dist, g_g_dist, k1=20, k2=6, lambda_value=0.3):
    """Oracle: direct transcription of the public k-reciprocal algorithm
    (Zhong et al. CVPR'17 release, as vendored by the reference)."""
    original_dist = np.concatenate(
        [np.concatenate([q_q_dist, q_g_dist], axis=1),
         np.concatenate([q_g_dist.T, g_g_dist], axis=1)], axis=0)
    original_dist = np.power(original_dist, 2).astype(np.float32)
    original_dist = np.transpose(1.0 * original_dist / np.max(original_dist, axis=0))
    V = np.zeros_like(original_dist).astype(np.float32)
    initial_rank = np.argsort(original_dist).astype(np.int32)
    query_num = q_g_dist.shape[0]
    all_num = q_g_dist.shape[0] + q_g_dist.shape[1]

    for i in range(all_num):
        forward = initial_rank[i, : k1 + 1]
        backward = initial_rank[forward, : k1 + 1]
        fi = np.where(backward == i)[0]
        k_recip = forward[fi]
        expansion = k_recip
        for cand in k_recip:
            cf = initial_rank[cand, : int(np.around(k1 / 2)) + 1]
            cb = initial_rank[cf, : int(np.around(k1 / 2)) + 1]
            fic = np.where(cb == cand)[0]
            ckr = cf[fic]
            if len(np.intersect1d(ckr, k_recip)) > 2.0 / 3 * len(ckr):
                expansion = np.append(expansion, ckr)
        expansion = np.unique(expansion)
        weight = np.exp(-original_dist[i, expansion])
        V[i, expansion] = weight / np.sum(weight)

    original_dist = original_dist[:query_num, :]
    if k2 != 1:
        V_qe = np.zeros_like(V, dtype=np.float32)
        for i in range(all_num):
            V_qe[i, :] = np.mean(V[initial_rank[i, :k2], :], axis=0)
        V = V_qe
    invIndex = [np.where(V[:, i] != 0)[0] for i in range(all_num)]
    jaccard = np.zeros_like(original_dist, dtype=np.float32)
    for i in range(query_num):
        temp_min = np.zeros((1, all_num), dtype=np.float32)
        nz = np.where(V[i, :] != 0)[0]
        for j, ind in enumerate(nz):
            temp_min[0, invIndex[ind]] += np.minimum(V[i, ind], V[invIndex[ind], ind])
        jaccard[i] = 1 - temp_min / (2.0 - temp_min)
    final = jaccard * (1 - lambda_value) + original_dist * lambda_value
    return final[:, query_num:]


def make_dists(rng, num_q=12, num_g=40, num_pids=8, dim=16):
    centers = rng.randn(num_pids, dim) * 3
    qp = rng.randint(0, num_pids, num_q)
    gp = rng.randint(0, num_pids, num_g)
    qf = centers[qp] + rng.randn(num_q, dim) * 0.7
    gf = centers[gp] + rng.randn(num_g, dim) * 0.7

    def d(a, b):
        return ((a[:, None] - b[None]) ** 2).sum(-1) ** 0.5

    return d(qf, gf), d(qf, qf), d(gf, gf), qp, gp


@pytest.mark.parametrize("seed", [0, 1])
def test_rerank_matches_public_reference(seed):
    rng = np.random.RandomState(seed)
    qg, qq, gg, _, _ = make_dists(rng)
    got = re_ranking(qg, qq, gg, k1=8, k2=3)
    want = reference_re_ranking(qg, qq, gg, k1=8, k2=3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rerank_improves_or_preserves_rank1():
    rng = np.random.RandomState(3)
    qg, qq, gg, qp, gp = make_dists(rng, num_q=20, num_g=60)
    before = (gp[np.argmin(qg, axis=1)] == qp).mean()
    rr = re_ranking(qg, qq, gg, k1=8, k2=3)
    after = (gp[np.argmin(rr, axis=1)] == qp).mean()
    assert rr.shape == qg.shape
    assert after >= before - 0.1  # sanity: re-ranking should not collapse


# ---- device (TPU-native) re-ranking: ops/rerank.py ----


@pytest.mark.parametrize("seed,k1,k2", [(0, 8, 3), (1, 8, 3), (2, 6, 1), (3, 10, 4)])
def test_rerank_device_matches_host(seed, k1, k2):
    import numpy as np

    from agrl_tpu.ops.rerank import re_ranking_device

    rng = np.random.RandomState(seed)
    qg, qq, gg, _, _ = make_dists(rng, num_q=15, num_g=45)
    got = np.asarray(re_ranking_device(qg, qq, gg, k1=k1, k2=k2))
    want = re_ranking(qg, qq, gg, k1=k1, k2=k2)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rerank_device_from_features():
    import numpy as np

    from agrl_tpu.ops.rerank import re_ranking_from_features

    rng = np.random.RandomState(4)
    qf = rng.randn(12, 16).astype(np.float32)
    gf = rng.randn(40, 16).astype(np.float32)

    def d2(a, b):  # squared euclidean, like the evaluator's host path
        return ((a[:, None] - b[None]) ** 2).sum(-1)

    got = np.asarray(re_ranking_from_features(qf, gf, metric="euclidean", k1=8, k2=3))
    want = re_ranking(d2(qf, gf), d2(qf, qf), d2(gf, gf), k1=8, k2=3)
    np.testing.assert_allclose(got, want, atol=2e-4)
