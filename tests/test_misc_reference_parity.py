"""Distance matrix, accuracy, k-reciprocal re-ranking, and calc_splits
tested directly against the imported reference implementations."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _ref(module):
    import importlib
    import types

    # torchreid.metrics.__init__ imports rank.py, which wants the
    # pre-0.24 sklearn.metrics.base module
    if "sklearn.metrics.base" not in sys.modules:
        from sklearn.metrics import _base as _sk_base

        shim = types.ModuleType("sklearn.metrics.base")
        shim._average_binary_score = _sk_base._average_binary_score
        sys.modules["sklearn.metrics.base"] = shim
    sys.path.insert(0, REF)
    try:
        return importlib.import_module(module)
    finally:
        sys.path.remove(REF)


@pytest.mark.parametrize("metric", ["euclidean", "cosine"])
def test_compute_distance_matrix_vs_reference(metric):
    from agrl_tpu.metrics.distance import compute_distance_matrix

    ref = _ref("torchreid.metrics.distance")
    rng = np.random.RandomState(0)
    qf = rng.randn(7, 16).astype(np.float32)
    gf = rng.randn(11, 16).astype(np.float32)
    want = ref.compute_distance_matrix(
        torch.tensor(qf), torch.tensor(gf), metric=metric
    ).numpy()
    got = compute_distance_matrix(qf, gf, metric)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_accuracy_vs_reference():
    """topk=(1,) only: the reference's correct[:k].view() crashes on
    modern torch for k>1 (non-contiguous view) — its own latent bug."""
    from agrl_tpu.metrics.accuracy import accuracy

    ref = _ref("torchreid.metrics.accuracy")
    rng = np.random.RandomState(1)
    logits = rng.randn(16, 9).astype(np.float32)
    labels = rng.randint(0, 9, 16)
    want = ref.accuracy(torch.tensor(logits), torch.tensor(labels), topk=(1,))
    got = accuracy(logits, labels, topk=(1,))
    np.testing.assert_allclose(got[0][0], float(want[0][0]), atol=1e-6)
    # multi-head: per-head rows match
    want_mh = ref.accuracy(
        [torch.tensor(logits), -torch.tensor(logits)], torch.tensor(labels), topk=(1,)
    )
    got_mh = accuracy([logits, -logits], labels, topk=(1,))
    np.testing.assert_allclose(
        [h[0] for h in got_mh], want_mh[:, 0], atol=1e-6
    )


def test_re_ranking_vs_reference():
    from agrl_tpu.metrics.rerank import re_ranking

    ref = _ref("torchreid.utils.re_ranking")
    rng = np.random.RandomState(2)
    q, g, d = 12, 30, 8
    qf = rng.randn(q, d)
    gf = rng.randn(g, d)

    def sqdist(a, b):
        return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)

    qg, qq, gg = sqdist(qf, gf), sqdist(qf, qf), sqdist(gf, gf)
    want = ref.re_ranking(qg, qq, gg, k1=6, k2=3, lambda_value=0.3)
    got = re_ranking(qg, qq, gg, k1=6, k2=3, lambda_value=0.3)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_calc_splits_vs_reference():
    from agrl_tpu.utils.reidtools import calc_splits

    ref = _ref("torchreid.utils.reidtools")
    for n in (1, 2, 4, 8):
        assert calc_splits(n) == ref.calc_splits(n), n


@pytest.mark.parametrize("pyramid_part,num_scale", [(True, 1), (False, 1), (True, 2)])
def test_graph_builder_vs_reference_generate_graph(pyramid_part, num_scale):
    """The pose->adjacency builder vs the reference's own generate_graph
    (dataset_loader.py:218-342): same stripes, contiguity fill, pyramid
    expansion, same-part cliques and multiscale blocks — incl. missing
    poses and sub-threshold keypoints."""
    import types

    if "torchvision" not in sys.modules or not hasattr(
        sys.modules.get("torchvision", None), "transforms"
    ):
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace()
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.functional = types.ModuleType(
            "torchvision.transforms.functional"
        )
        # the reference transforms.py star-imports and subclasses these;
        # generate_graph never touches them, so empty shells suffice
        for cls in ("ToPILImage", "Resize", "RandomHorizontalFlip",
                    "ToTensor", "Normalize", "Compose"):
            setattr(tv.transforms, cls, type(cls, (), {}))
        tv.transforms.__all__ = ["ToPILImage", "Resize", "RandomHorizontalFlip",
                                 "ToTensor", "Normalize", "Compose"]
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.transforms.functional"] = tv.transforms.functional
    ref_dl = _ref("torchreid.dataset_loader")

    from agrl_tpu.data.graph import GraphBuilder

    rng = np.random.RandomState(int(pyramid_part) * 10 + num_scale)
    S, W, H = 4, 64, 128
    names = [f"{i:04d}C1T0001F{i:03d}.jpg" for i in range(S)]
    paths = [f"data/mars/bbox_train/0001/{n}" for n in names]
    sizes = [(W, H)] * S

    poses = {}
    poses_arr = np.zeros((S, 18, 3))
    for i, n in enumerate(names):
        if i == 2:
            continue  # frame with no detected pose -> empty part sets
        kp = np.zeros((18, 3))
        kp[:, 0] = rng.rand(18) * W
        kp[:, 1] = rng.rand(18) * H
        kp[:, 2] = rng.rand(18)  # some below the 0.1 threshold
        poses[n] = kp
        poses_arr[i] = kp

    want = np.asarray(
        ref_dl.generate_graph(
            [None] * S, paths, sizes, poses, num_split=4, num_parts=3,
            num_scale=num_scale, pyramid_part=pyramid_part,
        )
    )
    gb = GraphBuilder(
        num_split=4, num_parts=3, num_scale=num_scale,
        pyramid_part=pyramid_part, enable_pose=True,
    )
    got = np.asarray(gb(poses_arr, np.full(S, float(H))))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# duke-protocol eval (sklearn interpolated mAP + first-match-break CMC)
# ---------------------------------------------------------------------------


def _duke_problem(seed, num_q=15, num_g=120, num_pids=12):
    from .oracles import make_reid_problem

    return make_reid_problem(np.random.RandomState(seed), num_q=num_q, num_g=num_g, num_pids=num_pids)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluate_dukev_vs_reference(seed, monkeypatch):
    from agrl_tpu.metrics.rank import evaluate_dukev

    if not hasattr(np, "bool"):
        monkeypatch.setattr(np, "bool", np.bool_, raising=False)
    ref = _ref("torchreid.metrics.rank")
    dist, qp, gp, qc, gc = _duke_problem(seed)
    cmc_r, map_r = ref.evaluate_dukev(dist, qp, gp, qc, gc)
    cmc_v, map_v = evaluate_dukev(dist, qp, gp, qc, gc)
    np.testing.assert_allclose(cmc_v, cmc_r, atol=1e-9)
    np.testing.assert_allclose(map_v, map_r, atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_evaluate_dukev_fast_equals_sklearn_path(seed):
    """The vectorized trapezoid/cumsum formulation must reproduce the
    sklearn-based per-query loop exactly on tie-free distances."""
    from agrl_tpu.metrics.rank import evaluate_dukev, evaluate_dukev_fast

    dist, qp, gp, qc, gc = _duke_problem(seed, num_q=25, num_g=200, num_pids=15)
    cmc_s, map_s = evaluate_dukev(dist, qp, gp, qc, gc)
    cmc_f, map_f = evaluate_dukev_fast(dist, qp, gp, qc, gc)
    np.testing.assert_allclose(cmc_f, cmc_s, atol=1e-9)
    np.testing.assert_allclose(map_f, map_s, atol=1e-9)


def test_evaluate_dukev_fast_skips_invalid_queries():
    from agrl_tpu.metrics.rank import evaluate_dukev, evaluate_dukev_fast

    dist, qp, gp, qc, gc = _duke_problem(7)
    qp = qp.copy()
    qp[::4] = 999  # no gallery match -> excluded from both averages
    cmc_s, map_s = evaluate_dukev(dist, qp, gp, qc, gc)
    cmc_f, map_f = evaluate_dukev_fast(dist, qp, gp, qc, gc)
    np.testing.assert_allclose(cmc_f, cmc_s, atol=1e-9)
    np.testing.assert_allclose(map_f, map_s, atol=1e-9)


def test_evaluate_rank_dukev_tie_detection():
    """The dispatcher must route tied distance matrices (plausible after
    k-reciprocal re-ranking: quantized Jaccard blends) to the literal
    sklearn walk — the trapezoid closed form is exact only tie-free."""
    from agrl_tpu.metrics.rank import (
        evaluate_dukev,
        evaluate_rank,
    )

    dist, qp, gp, qc, gc = _duke_problem(3, num_q=15, num_g=80, num_pids=8)
    dist = np.round(dist * 4) / 4  # quantize -> ties within rows
    assert (np.sort(dist, 1)[:, 1:] == np.sort(dist, 1)[:, :-1]).any()
    cmc_d, map_d = evaluate_rank(dist, qp, gp, qc, gc, use_metric_dukev=True)
    cmc_s, map_s = evaluate_dukev(dist, qp, gp, qc, gc)
    np.testing.assert_allclose(cmc_d, cmc_s, atol=1e-12)
    assert map_d == map_s

    # tie-free input still takes the fast path (same answer by parity)
    dist2, qp2, gp2, qc2, gc2 = _duke_problem(4, num_q=15, num_g=80, num_pids=8)
    cmc_f, map_f = evaluate_rank(dist2, qp2, gp2, qc2, gc2, use_metric_dukev=True)
    cmc_s2, map_s2 = evaluate_dukev(dist2, qp2, gp2, qc2, gc2)
    np.testing.assert_allclose(cmc_f, cmc_s2, atol=1e-9)
    np.testing.assert_allclose(map_f, map_s2, atol=1e-9)
