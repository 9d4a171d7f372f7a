"""Multi-chip evaluation: gallery-sharded distmat through the Evaluator
equals the single-device result (8 virtual CPU devices)."""

import pytest

import jax
import numpy as np

from agrl_tpu.data.datasets import init_vidreid_dataset
from agrl_tpu.data.loader import ClipLoader, VideoClipDataset
from agrl_tpu.engine.evaluator import Evaluator
from agrl_tpu.models import init_params, init_model
from agrl_tpu.parallel import make_mesh


@pytest.mark.heavy
def test_evaluator_sharded_vs_single(tmp_path):
    ds = init_vidreid_dataset(
        "synthetic", root=str(tmp_path / "d"), num_pids=3, tracklets_per_pid=2,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )
    kw = dict(seq_len=4, sample="evenly", height=64, width=32,
              pose_info=ds.process_poses, num_split=4, pyramid_part=True)
    qloader = ClipLoader(VideoClipDataset(ds.query, **kw), batch_size=6, num_workers=2)
    gloader = ClipLoader(VideoClipDataset(ds.gallery, **kw), batch_size=6, num_workers=2)

    model = init_model("vmgn_tiny", num_classes=3, loss={"xent", "htri"},
                       num_split=4, pyramid_part=True, num_gb=1,
                       use_pose=True, learn_graph=True)
    variables = init_params(model, jax.random.PRNGKey(0), seq_len=4, height=64, width=32)
    ev = Evaluator(model, test_sample="evenly")

    r1_single, map_single = ev.evaluate(
        variables, qloader, gloader, dist_metric="cosine", device_rank=False
    )
    mesh = make_mesh(dp=2, mp=1)  # gallery=6 shards over 2
    r1_shard, map_shard = ev.evaluate(
        variables, qloader, gloader, dist_metric="cosine", device_rank=False, mesh=mesh
    )
    np.testing.assert_allclose(r1_single, r1_shard, atol=1e-5)
    np.testing.assert_allclose(map_single, map_shard, atol=1e-5)

    # device-rank fast path agrees too
    r1_dev, map_dev = ev.evaluate(
        variables, qloader, gloader, dist_metric="cosine", device_rank=True
    )
    np.testing.assert_allclose(r1_single, r1_dev, atol=1e-5)
    np.testing.assert_allclose(map_single, map_dev, atol=1e-5)


@pytest.mark.heavy
def test_evaluator_max_pool_dense(tmp_path):
    """dense sampling with --pool max runs and pools per tracklet."""
    ds = init_vidreid_dataset(
        "synthetic", root=str(tmp_path / "d2"), num_pids=2, tracklets_per_pid=2,
        frames_per_tracklet=(5, 9), height=64, width=32, verbose=False,
    )
    kw = dict(seq_len=4, sample="dense", height=64, width=32,
              pose_info=ds.process_poses, num_split=4, pyramid_part=True)
    qloader = ClipLoader(VideoClipDataset(ds.query, **kw), batch_size=1, num_workers=2)
    gloader = ClipLoader(VideoClipDataset(ds.gallery, **kw), batch_size=1, num_workers=2)
    model = init_model("vmgn_tiny", num_classes=2, loss={"xent", "htri"},
                       num_split=4, pyramid_part=True, num_gb=1,
                       use_pose=True, learn_graph=True)
    variables = init_params(model, jax.random.PRNGKey(0), seq_len=4, height=64, width=32)
    ev = Evaluator(model, test_sample="dense", pool="max")
    r1, mAP = ev.evaluate(variables, qloader, gloader, dist_metric="cosine")
    assert 0.0 <= float(mAP) <= 1.0


@pytest.mark.heavy
def test_mesh_sharded_extraction_matches_single(tmp_path):
    """Batch-sharded ('dp') feature extraction — incl. a ragged tail batch
    padded to the dp multiple — equals single-device extraction, and the
    full device-ranked evaluate(mesh=...) equals evaluate(mesh=None)."""
    ds = init_vidreid_dataset(
        "synthetic", root=str(tmp_path / "d"), num_pids=3, tracklets_per_pid=2,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )
    kw = dict(seq_len=4, sample="evenly", height=64, width=32,
              pose_info=ds.process_poses, num_split=4, pyramid_part=True)
    # batch 5 over 6 query tracklets -> ragged tail of 1 (pads to dp=4... )
    qloader = ClipLoader(VideoClipDataset(ds.query, **kw), batch_size=5, num_workers=1)
    gloader = ClipLoader(VideoClipDataset(ds.gallery, **kw), batch_size=5, num_workers=1)

    model = init_model("vmgn_tiny", num_classes=3, loss={"xent", "htri"},
                       num_split=4, pyramid_part=True, num_gb=1,
                       use_pose=True, learn_graph=True)
    variables = init_params(model, jax.random.PRNGKey(0), seq_len=4, height=64, width=32)
    ev = Evaluator(model, test_sample="evenly")
    mesh = make_mesh(dp=4, mp=2)

    f_single, *_ = ev.extract(variables, qloader, "query")
    f_mesh, *_ = ev.extract(variables, qloader, "query", mesh=mesh)
    np.testing.assert_allclose(np.asarray(f_mesh), f_single, atol=2e-5, rtol=1e-5)

    r1_s, map_s = ev.evaluate(variables, qloader, gloader, metric_protocol="mars")
    r1_m, map_m = ev.evaluate(
        variables, qloader, gloader, metric_protocol="mars", mesh=mesh
    )
    np.testing.assert_allclose(float(r1_m), float(r1_s), atol=1e-6)
    np.testing.assert_allclose(float(map_m), float(map_s), atol=1e-6)


@pytest.mark.heavy
def test_evaluator_rerank_device_matches_host(tmp_path):
    """--re-ranking through the device path (ops/rerank.py) equals the
    host k-reciprocal implementation end to end."""
    ds = init_vidreid_dataset(
        "synthetic", root=str(tmp_path / "drr"), num_pids=4, tracklets_per_pid=3,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )
    kw = dict(seq_len=4, sample="evenly", height=64, width=32,
              pose_info=ds.process_poses, num_split=4, pyramid_part=True)
    qloader = ClipLoader(VideoClipDataset(ds.query, **kw), batch_size=6, num_workers=1)
    gloader = ClipLoader(VideoClipDataset(ds.gallery, **kw), batch_size=6, num_workers=1)
    model = init_model("vmgn_tiny", num_classes=4, loss={"xent", "htri"},
                       num_split=4, pyramid_part=True, num_gb=1,
                       use_pose=True, learn_graph=True)
    variables = init_params(model, jax.random.PRNGKey(0), seq_len=4, height=64, width=32)
    ev = Evaluator(model, test_sample="evenly")

    for protocol in ("mars", "market1501"):
        r1_host, map_host = ev.evaluate(
            variables, qloader, gloader, dist_metric="cosine",
            re_rank=True, device_rank=False, metric_protocol=protocol,
        )
        r1_dev, map_dev = ev.evaluate(
            variables, qloader, gloader, dist_metric="cosine",
            re_rank=True, device_rank=True, metric_protocol=protocol,
        )
        np.testing.assert_allclose(r1_host, r1_dev, atol=1e-5)
        np.testing.assert_allclose(map_host, map_dev, atol=1e-5)


def test_device_rank_raises_on_no_valid_query():
    """The jitted scorers clamp their valid-query denominator (a traced
    value cannot raise), so the Evaluator pre-checks validity on host —
    an all-invalid query set (every match same-camera) must raise like
    the host paths do, not print 0% scores."""
    import pytest

    model = init_model("vmgn_tiny", num_classes=2, loss={"xent", "htri"},
                       num_split=4, pyramid_part=True, num_gb=1,
                       use_pose=True, learn_graph=True)
    variables = init_params(model, jax.random.PRNGKey(1), seq_len=4, height=64, width=32)
    r = np.random.RandomState(0)
    V = 4 * model.total_split

    def batches(pids, cams):
        imgs = (r.rand(len(pids), 4, 64, 32, 3) * 255).astype(np.uint8)
        adj = np.ones((len(pids), V, V), np.float32)
        return [(imgs, np.asarray(pids), np.asarray(cams), adj)]

    ev = Evaluator(model, test_sample="evenly")
    with pytest.raises(RuntimeError, match="No valid query"):
        ev.evaluate(
            variables,
            batches([0, 1], [0, 0]),  # queries: pids 0,1 cam 0
            batches([0, 1], [0, 0]),  # gallery: same pids, SAME cam only
            dist_metric="cosine", device_rank=True,
        )
