"""Cross-tracklet dense-eval packing: the packed fixed-batch extraction
must pool to the same tracklet features as a straight per-tracklet loop
(the reference's semantics, train_vidreid_xent_htri.py:461-476)."""

import jax
import numpy as np
import pytest

from agrl_tpu.data.transforms import preprocess_clips
from agrl_tpu.engine.evaluator import Evaluator
from agrl_tpu.models import init_model, init_params


class FakeDenseLoader:
    """Yields (imgs (1, n, S, H, W, 3) u8, pids, camids, adjs (1, n, V, V))
    with varying clip counts n, like ClipLoader in dense mode (batch 1)."""

    def __init__(self, rng, n_clips_list, S=4, H=32, W=16, V=28):
        self.items = []
        for i, n in enumerate(n_clips_list):
            imgs = rng.randint(0, 256, (1, n, S, H, W, 3)).astype(np.uint8)
            adjs = (rng.rand(1, n, V, V) + np.eye(V)).astype(np.float32)
            self.items.append((imgs, np.asarray([i % 5]), np.asarray([i % 3]), adjs))

    def __iter__(self):
        return iter(self.items)


@pytest.fixture(scope="module")
def setup():
    model = init_model(
        "vmgn_tiny", num_classes=5, loss={"xent", "htri"}, num_split=4,
        pyramid_part=True, num_gb=1, use_pose=True, learn_graph=True,
    )
    variables = init_params(
        model, jax.random.PRNGKey(0), seq_len=4, height=32, width=16, batch_size=1
    )
    return model, {"params": variables["params"], "batch_stats": variables["batch_stats"]}


@pytest.mark.parametrize("pool", ["avg", "max"])
@pytest.mark.heavy
def test_packed_dense_matches_per_tracklet_loop(setup, pool):
    model, variables = setup
    rng = np.random.RandomState(0)
    # straddling sizes: 3+5 fills one batch of 8 exactly; 7 straddles; 1 tail
    loader = FakeDenseLoader(rng, n_clips_list=[3, 5, 7, 2, 1])

    ev = Evaluator(model, test_sample="dense", pool=pool, clip_batch=8)
    feats, pids, camids, _ = ev.extract(variables, loader, "query")

    # oracle: per-tracklet forward + pool (the reference's fold)
    zero_key = jax.random.PRNGKey(0)

    def fwd(x, a):
        x = preprocess_clips(x, zero_key)
        return np.asarray(model.apply(variables, x, a, train=False))

    want = []
    for imgs, _, _, adjs in loader:
        f = fwd(imgs[0], adjs[0])
        want.append(f.mean(axis=0) if pool == "avg" else f.max(axis=0))
    want = np.stack(want)

    assert feats.shape == want.shape
    np.testing.assert_allclose(feats, want, atol=2e-5, rtol=1e-5)
    assert pids.tolist() == [0, 1, 2, 3, 4]
    assert camids.tolist() == [0, 1, 2, 0, 1]


def test_packed_dense_single_big_tracklet(setup):
    model, variables = setup
    rng = np.random.RandomState(1)
    loader = FakeDenseLoader(rng, n_clips_list=[19])  # 2 full batches + tail
    ev = Evaluator(model, test_sample="dense", pool="avg", clip_batch=8)
    feats, *_ = ev.extract(variables, loader, "query")
    assert feats.shape[0] == 1 and np.isfinite(feats).all()


class FakeEvenLoader:
    """(imgs (B, S, H, W, 3) u8, pids, camids, adjs (B, V, V)) batches."""

    def __init__(self, rng, n_items=12, B=4, S=4, H=32, W=16, V=28, num_pids=5):
        self.batches = []
        for start in range(0, n_items, B):
            n = min(B, n_items - start)
            imgs = rng.randint(0, 256, (n, S, H, W, 3)).astype(np.uint8)
            adjs = (rng.rand(n, V, V) + np.eye(V)).astype(np.float32)
            ids = np.arange(start, start + n)
            self.batches.append((imgs, ids % num_pids, ids % 3, adjs))

    def __iter__(self):
        return iter(self.batches)


@pytest.mark.parametrize("protocol", ["mars", "market1501", "cuhk03"])
def test_device_protocol_paths_match_host(setup, protocol, capsys):
    """Every protocol's on-device ranking (with device-resident features)
    must reproduce the host NumPy path."""
    model, variables = setup
    rng = np.random.RandomState(4)
    qloader = FakeEvenLoader(rng, n_items=8)
    gloader = FakeEvenLoader(rng, n_items=16)

    ev = Evaluator(model, test_sample="evenly", pool="avg")
    if protocol == "cuhk03":
        # sampling RNGs differ between device and host paths; just check
        # the device path runs and yields sane values
        rank1, mAP = ev.evaluate(
            variables, qloader, gloader, metric_protocol=protocol,
            device_rank=True,
        )
        assert 0.0 <= float(rank1) <= 1.0 and 0.0 <= float(mAP) <= 1.0
        return
    r_dev = ev.evaluate(
        variables, qloader, gloader, metric_protocol=protocol, device_rank=True
    )
    r_host = ev.evaluate(
        variables, qloader, gloader, metric_protocol=protocol, device_rank=False
    )
    np.testing.assert_allclose(float(r_dev[0]), float(r_host[0]), atol=1e-5)
    np.testing.assert_allclose(float(r_dev[1]), float(r_host[1]), atol=1e-5)
