"""Fixed-shape bucketing for `--test-sample all` eval.

The reference runs whole tracklets at native length
(dataset_loader.py:115-119); under XLA that is one compilation per
distinct length. The bucketed path pads to a geometric ~1.25x ladder of
multiple-of-8 frame counts with a frame mask the model honors exactly —
these tests pin (a) feature equivalence vs the unbucketed forward and
(b) the O(log) compile count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.engine.evaluator import Evaluator
from agrl_tpu.models import init_params
from agrl_tpu.models.vmgn import VMGN


@pytest.fixture(scope="module")
def tiny():
    model = VMGN(num_classes=4, layers=(1, 1, 1, 1), num_split=4,
                 pyramid_part=True, num_gb=2)
    variables = init_params(
        model, jax.random.PRNGKey(0), seq_len=4, height=32, width=16, batch_size=2
    )
    return model, variables


def _tracklet_batches(model, lengths, H=32, W=16, seed=0):
    """'all'-sampling loader batches: one tracklet per batch,
    imgs (1, num, H, W, 3) uint8 + adj (1, V, V) with V = num*split."""
    r = np.random.RandomState(seed)
    out = []
    for t, num in enumerate(lengths):
        V = num * model.total_split
        imgs = (r.rand(1, num, H, W, 3) * 255).astype(np.uint8)
        adj = (r.rand(1, V, V) > 0.5).astype(np.float32)
        out.append((imgs, np.asarray([t % 3]), np.asarray([t % 2]), adj))
    return out


def test_bucket_len():
    # geometric ~1.25x ladder on multiples of 8: 8,16,24,32,40,56,72,96,
    # 120,152,192,240,304,384,480,600,752,944,1184,...
    assert Evaluator._bucket_len(1) == 8
    assert Evaluator._bucket_len(8) == 8
    assert Evaluator._bucket_len(9) == 16
    assert Evaluator._bucket_len(17) == 24
    assert Evaluator._bucket_len(33) == 40
    assert Evaluator._bucket_len(54) == 56
    assert Evaluator._bucket_len(100) == 120
    assert Evaluator._bucket_len(1000) == 1184
    # monotone, >= num, multiple of 8, ladder is stable on its own points
    prev = 0
    for n in range(1, 1201):
        b = Evaluator._bucket_len(n)
        assert b >= n and b % 8 == 0 and b >= prev
        assert Evaluator._bucket_len(b) == b
        prev = b


@pytest.mark.heavy
def test_masked_forward_equals_unpadded(tiny):
    """Model-level: padding frames + frame_mask reproduces the unpadded
    feature to numerical precision (masked mean / graph rows / attention)."""
    model, variables = tiny
    r = np.random.RandomState(1)
    for num, Sp in [(3, 8), (5, 8), (11, 16)]:
        V, Vp = num * model.total_split, Sp * model.total_split
        x = r.rand(2, num, 32, 16, 3).astype(np.float32)
        adj = (r.rand(2, V, V) > 0.4).astype(np.float32)
        want = model.apply(variables, x, adj, train=False)

        xp = np.zeros((2, Sp, 32, 16, 3), np.float32)
        xp[:, :num] = x
        adjp = np.zeros((2, Vp, Vp), np.float32)
        adjp[:, :V, :V] = adj
        fmask = np.zeros((2, Sp), np.float32)
        fmask[:, :num] = 1.0
        got = model.apply(variables, xp, adjp, train=False, frame_mask=fmask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_all_ones_mask_matches_plain_forward(tiny):
    model, variables = tiny
    r = np.random.RandomState(2)
    num = 6
    V = num * model.total_split
    x = r.rand(1, num, 32, 16, 3).astype(np.float32)
    adj = (r.rand(1, V, V) > 0.5).astype(np.float32)
    plain = model.apply(variables, x, adj, train=False)
    masked = model.apply(
        variables, x, adj, train=False, frame_mask=np.ones((1, num), np.float32)
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(plain), atol=1e-5)


def test_bucketed_extract_equals_unbucketed(tiny):
    """Evaluator-level: the bucketed `all` path returns the same features,
    pids and camids as running each tracklet unpadded."""
    model, variables = tiny
    lengths = [3, 8, 9, 13, 4]
    batches = _tracklet_batches(model, lengths)

    ev = Evaluator(model, test_sample="all")
    assert ev._fwd_masked is not None
    feats, pids, camids, _ = ev.extract(variables, batches, "query")

    # ground truth: plain forward at native length through the same jit
    for (imgs, bpid, bcam, adj), got in zip(batches, feats):
        want = np.asarray(ev._fwd(variables, imgs, adj))[0]
        np.testing.assert_allclose(got, want, atol=2e-4)
    assert list(pids) == [t % 3 for t in range(len(lengths))]
    assert list(camids) == [t % 2 for t in range(len(lengths))]


def test_bucketed_compile_count(tiny):
    """7 distinct tracklet lengths must funnel into <= 3 bucket shapes."""
    model, variables = tiny
    lengths = [3, 5, 7, 9, 11, 16, 17]
    batches = _tracklet_batches(model, lengths)
    ev = Evaluator(model, test_sample="all")

    shapes = []
    inner = ev._fwd_masked

    def counting(v, x, a, m):
        shapes.append(x.shape)
        return inner(v, x, a, m)

    ev._fwd_masked = counting
    feats, pids, _, _ = ev.extract(variables, batches, "query")
    # same-bucket tracklets batch together: one call per bucket here
    assert len(shapes) == 3
    distinct = {s[1] for s in shapes}
    assert distinct == {8, 16, 24}  # buckets, not native lengths
    assert feats.shape[0] == len(lengths)


def test_bucketed_batching_preserves_order_and_features(tiny):
    """Cross-tracklet same-bucket batching returns rows in input order,
    equal to per-tracklet forwards."""
    model, variables = tiny
    lengths = [9, 3, 12, 5, 10, 4]  # interleaved buckets 16/8
    batches = _tracklet_batches(model, lengths, seed=7)
    ev = Evaluator(model, test_sample="all", clip_batch=1)  # tiny budget
    feats, pids, camids, _ = ev.extract(variables, batches, "query")
    for (imgs, bpid, bcam, adj), got in zip(batches, feats):
        want = np.asarray(ev._fwd(variables, imgs, adj))[0]
        np.testing.assert_allclose(got, want, atol=2e-4)
    assert list(pids) == [t % 3 for t in range(len(lengths))]


@pytest.mark.heavy
def test_bucketed_all_under_mesh(tiny):
    """The bucketed path shards its batches over the mesh's dp axis and
    matches the single-device result."""
    from agrl_tpu.parallel import make_mesh

    model, variables = tiny
    lengths = [3, 9, 5, 4, 11, 6]
    batches = _tracklet_batches(model, lengths, seed=9)
    ev = Evaluator(model, test_sample="all")
    f0, *_ = ev.extract(variables, batches, "query")
    mesh = make_mesh(dp=4, mp=2)
    with mesh:
        f1, *_ = ev.extract(variables, batches, "query", mesh=mesh)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-4)


@pytest.mark.heavy
def test_evaluate_end_to_end_all_bucketed(tiny):
    """Full evaluate() through the device-ranking path with 'all'."""
    model, variables = tiny
    ev = Evaluator(model, test_sample="all")
    rank1, mAP = ev.evaluate(
        variables,
        _tracklet_batches(model, [3, 9, 5], seed=3),
        _tracklet_batches(model, [4, 12, 6, 8], seed=4),
        dist_metric="cosine",
        metric_protocol="mars",
    )
    assert np.isfinite(rank1) and np.isfinite(mAP)


def test_unsupported_model_falls_back(tiny):
    """Models without frame-mask support keep the plain dynamic-shape
    path (no masked jit is built)."""
    model, variables = tiny

    class NoMask:
        total_split = model.total_split

        def apply(self, *a, **k):
            return model.apply(*a, **k)

    ev = Evaluator(NoMask(), test_sample="all")
    assert ev._fwd_masked is None


def _assert_masked_equals_unpadded(model, variables, num, Sp, H, W, seed, atol=2e-4):
    """Padded forward + frame_mask must equal the unpadded forward."""
    ts = getattr(model, "total_split", 1)
    r = np.random.RandomState(seed)
    V, Vp = num * ts, Sp * ts
    x = r.rand(2, num, H, W, 3).astype(np.float32)
    adj = (r.rand(2, V, V) > 0.4).astype(np.float32)
    want = model.apply(variables, x, adj, train=False)

    xp = np.zeros((2, Sp, H, W, 3), np.float32)
    xp[:, :num] = x
    adjp = np.zeros((2, Vp, Vp), np.float32)
    adjp[:, :V, :V] = adj
    fmask = np.zeros((2, Sp), np.float32)
    fmask[:, :num] = 1.0
    got = model.apply(variables, xp, adjp, train=False, frame_mask=fmask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


def _masked_model_cases():
    from agrl_tpu.models.ganet import GANet
    from agrl_tpu.models.res50tp import ResNet50S1, ResNet50TP
    from agrl_tpu.models.sta import STA

    # ganet/sta need h = H/16 >= num_split/parts for their stripe slicing
    return [
        ("ganet", GANet(num_classes=4, layers=(1, 1, 1, 1), num_split=4,
                        pyramid_part=True, num_gb=2), 64, 32),
        ("sta", STA(num_classes=4, layers=(1, 1, 1, 1)), 64, 32),
        ("simple_sta", STA(num_classes=4, layers=(1, 1, 1, 1), simple=True), 64, 32),
        ("res50tp", ResNet50TP(num_classes=4, layers=(1, 1, 1, 1)), 32, 16),
        ("resnet50_s1", ResNet50S1(num_classes=4, layers=(1, 1, 1, 1)), 32, 16),
    ]


@pytest.mark.parametrize("name,model,H,W", _masked_model_cases(),
                         ids=[c[0] for c in _masked_model_cases()])
@pytest.mark.heavy
def test_masked_forward_equals_unpadded_all_archs(name, model, H, W):
    """Every factory arch except msppn/msppgn implements the frame-mask
    contract (those two keep the dynamic path: split-major 3-scale
    vertices can't trailing-pad their adjacency)."""
    assert model.supports_frame_mask
    variables = init_params(
        model, jax.random.PRNGKey(5), seq_len=4, height=H, width=W, batch_size=2
    )
    for num, Sp in [(3, 8), (11, 16)]:
        _assert_masked_equals_unpadded(model, variables, num, Sp, H, W, seed=num)


def _msppn_cases():
    from agrl_tpu.models.graphnet import msppgn, msppn

    return [
        ("msppn", msppn(num_classes=4, num_split=4, layers=(1, 1, 1, 1))),
        ("msppgn", msppgn(num_classes=4, num_split=2, num_gb=2,
                          layers=(1, 1, 1, 1))),
        ("msppgn_pose_only", msppgn(num_classes=4, num_split=2, num_gb=1,
                                    learn_graph=False, layers=(1, 1, 1, 1))),
    ]


@pytest.mark.parametrize("name,model", _msppn_cases(),
                         ids=[c[0] for c in _msppn_cases()])
@pytest.mark.heavy
def test_msppn_masked_forward_equals_unpadded(name, model):
    """msppn/msppgn vertices are SPLIT-MAJOR over 3 feature scales: the
    model owns its adjacency padding (pad_eval_adjacency scatters entries
    to post-pad flat positions) and the GraphBlock's softmax affinity
    masks by -1e9 logits. Padded forward must equal unpadded exactly."""
    assert model.supports_frame_mask
    H, W = 64, 32
    variables = init_params(
        model, jax.random.PRNGKey(3), seq_len=4, height=H, width=W, batch_size=2
    )
    ts = model.total_split
    r = np.random.RandomState(11)
    for num, Sp in [(3, 8), (11, 16)]:
        V = 3 * num * ts  # num_scale=3 adjacency (scale-frame-major)
        x = r.rand(2, num, H, W, 3).astype(np.float32)
        adj = (r.rand(2, V, V) > 0.4).astype(np.float32)
        want = model.apply(variables, x, adj, train=False)

        xp = np.zeros((2, Sp, H, W, 3), np.float32)
        xp[:, :num] = x
        adjp = np.stack([model.pad_eval_adjacency(a, num, Sp) for a in adj])
        fmask = np.zeros((2, Sp), np.float32)
        fmask[:, :num] = 1.0
        got = model.apply(variables, xp, adjp, train=False, frame_mask=fmask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.heavy
def test_msppgn_bucketed_extract_equals_unbucketed():
    """Evaluator-level: the bucketed 'all' path routes msppgn adjacency
    padding through the model hook and matches per-tracklet forwards."""
    from agrl_tpu.models.graphnet import msppgn

    model = msppgn(num_classes=4, num_split=2, num_gb=1, layers=(1, 1, 1, 1))
    variables = init_params(
        model, jax.random.PRNGKey(4), seq_len=4, height=64, width=32, batch_size=2
    )
    ts = model.total_split
    r = np.random.RandomState(12)
    lengths = [3, 9, 5, 12]
    batches = []
    for t, num in enumerate(lengths):
        V = 3 * num * ts
        imgs = (r.rand(1, num, 64, 32, 3) * 255).astype(np.uint8)
        adj = (r.rand(1, V, V) > 0.5).astype(np.float32)
        batches.append((imgs, np.asarray([t % 3]), np.asarray([t % 2]), adj))

    ev = Evaluator(model, test_sample="all")
    assert ev._fwd_masked is not None
    feats, pids, camids, _ = ev.extract(variables, batches, "query")
    for (imgs, bpid, bcam, adj), got in zip(batches, feats):
        want = np.asarray(ev._fwd(variables, imgs, adj))[0]
        np.testing.assert_allclose(got, want, atol=2e-4)
    assert list(pids) == [t % 3 for t in range(len(lengths))]


@pytest.mark.heavy
def test_bucketed_extract_without_total_split_attr():
    """Archs that ignore the adjacency (no model.total_split) also run the
    bucketed 'all' path: the vertex count is inferred from the adjacency."""
    from agrl_tpu.models.sta import STA

    model = STA(num_classes=4, layers=(1, 1, 1, 1), simple=True)
    variables = init_params(
        model, jax.random.PRNGKey(6), seq_len=4, height=64, width=32, batch_size=2
    )
    r = np.random.RandomState(8)
    lengths = [3, 9, 5, 12]
    batches = []
    for t, num in enumerate(lengths):
        imgs = (r.rand(1, num, 64, 32, 3) * 255).astype(np.uint8)
        adj = np.ones((1, num, num), np.float32)  # ts=1 (use_pose off)
        batches.append((imgs, np.asarray([t % 3]), np.asarray([t % 2]), adj))

    ev = Evaluator(model, test_sample="all")
    assert ev._fwd_masked is not None
    feats, pids, camids, _ = ev.extract(variables, batches, "query")
    for (imgs, bpid, bcam, adj), got in zip(batches, feats):
        want = np.asarray(ev._fwd(variables, imgs, adj))[0]
        np.testing.assert_allclose(got, want, atol=2e-4)
    assert list(pids) == [t % 3 for t in range(len(lengths))]


def test_gsta_masked_forward_equals_unpadded():
    """GSTA also supports frame_mask: padded forward == unpadded."""
    from agrl_tpu.models.gsta import GSTA

    model = GSTA(num_classes=4, layers=(1, 1, 1, 1), num_split=4,
                 pyramid_part=True, num_gb=2)
    variables = init_params(
        model, jax.random.PRNGKey(1), seq_len=4, height=32, width=16, batch_size=2
    )
    assert model.supports_frame_mask
    r = np.random.RandomState(4)
    num, Sp = 5, 8
    V, Vp = num * model.total_split, Sp * model.total_split
    x = r.rand(2, num, 32, 16, 3).astype(np.float32)
    adj = (r.rand(2, V, V) > 0.4).astype(np.float32)
    want = model.apply(variables, x, adj, train=False)

    xp = np.zeros((2, Sp, 32, 16, 3), np.float32)
    xp[:, :num] = x
    adjp = np.zeros((2, Vp, Vp), np.float32)
    adjp[:, :V, :V] = adj
    fmask = np.zeros((2, Sp), np.float32)
    fmask[:, :num] = 1.0
    got = model.apply(variables, xp, adjp, train=False, frame_mask=fmask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.heavy
def test_msppn_bucketed_eval_ignores_graph_layout():
    """msppn never reads the adjacency, so the bucketed 'all' path must run
    with ANY data-side graph layout — e.g. a graph built WITHOUT
    --pyramid-part (per-frame part count != the model's pooled parts). The
    pad hook used to assert the split-major layout and crash mid-eval; it
    now pads to the model's own fixed shape. Lengths include an exact
    bucket length so the no-padding case lands on the same shape too."""
    from agrl_tpu.models.graphnet import msppn

    model = msppn(num_classes=4, num_split=2, layers=(1, 1, 1, 1))
    variables = init_params(
        model, jax.random.PRNGKey(9), seq_len=4, height=64, width=32, batch_size=2
    )
    r = np.random.RandomState(13)
    lengths = [3, 8, 5]  # 8 = already a bucket length (no frame padding)
    batches = []
    data_split = 2  # != model.total_split (=3 for num_split=2 pyramid)
    assert data_split != model.total_split
    for t, num in enumerate(lengths):
        V = num * data_split  # a non-pyramid, single-scale graph layout
        imgs = (r.rand(1, num, 64, 32, 3) * 255).astype(np.uint8)
        adj = (r.rand(1, V, V) > 0.5).astype(np.float32)
        batches.append((imgs, np.asarray([t % 3]), np.asarray([t % 2]), adj))

    ev = Evaluator(model, test_sample="all")
    feats, pids, camids, _ = ev.extract(variables, batches, "query")
    # features equal a direct forward (any adjacency gives the same answer
    # for an adjacency-ignoring model)
    for (imgs, bpid, bcam, adj), got in zip(batches, feats):
        num = imgs.shape[1]
        Vm = 3 * model.total_split * num
        dummy = np.ones((1, Vm, Vm), np.float32)
        want = np.asarray(ev._fwd(variables, imgs, dummy))[0]
        np.testing.assert_allclose(got, want, atol=2e-4)
    assert list(pids) == [t % 3 for t in range(len(lengths))]


@pytest.mark.heavy
def test_msppgn_learned_graph_bucketed_ignores_layout():
    """msppgn with learn_graph and no pose never reads the adjacency either
    — its pad hook must not assert the split-major layout."""
    from agrl_tpu.models.graphnet import msppgn

    model = msppgn(
        num_classes=4, num_split=2, num_gb=1, layers=(1, 1, 1, 1),
        use_pose=False, learn_graph=True,
    )
    assert model.expected_adj_scales is None
    variables = init_params(
        model, jax.random.PRNGKey(10), seq_len=4, height=64, width=32, batch_size=2
    )
    r = np.random.RandomState(14)
    imgs = (r.rand(1, 5, 64, 32, 3) * 255).astype(np.uint8)
    adj = np.ones((1, 5, 5), np.float32)  # ts=1 layout (no pose graph)
    ev = Evaluator(model, test_sample="all")
    feats, _, _, _ = ev.extract(
        variables, [(imgs, np.asarray([0]), np.asarray([0]), adj)], "query"
    )
    Vm = 3 * model.total_split * 5
    want = np.asarray(
        ev._fwd(variables, imgs, np.ones((1, Vm, Vm), np.float32))
    )[0]
    np.testing.assert_allclose(feats[0], want, atol=2e-4)
