"""Training dynamics: the full paper loss configuration (consistent loss,
label smoothing, soft-margin triplet, warmup schedule) must actually learn
— xent drops substantially over a few epochs on the synthetic dataset and
retrieval stays perfect.

Plus the DISCRIMINATIVE benchmark (VERDICT r03 weak #3): the MARS-layout
fixture (datasets/synthetic_mars.py) is confusable by construction
(shared palette bands + camera nuisance), so a converged tiny model lands
in an informative mAP band instead of saturating at 100% — a
ranking-quality regression of a few mAP points FAILS the floor assert,
and the packed/bucketed eval paths are held to the same band on the same
trained weights."""

import jax
import numpy as np
import pytest

from agrl_tpu.data.datasets import init_vidreid_dataset
from agrl_tpu.data.loader import ClipLoader, VideoClipDataset
from agrl_tpu.data.samplers import init_sampler
from agrl_tpu.engine import create_train_state, make_train_step
from agrl_tpu.models import init_model
from agrl_tpu.optim import init_optim, per_step, warmup_multistep_lr


@pytest.mark.slow
def test_paper_config_training_learns(tmp_path):
    ds = init_vidreid_dataset(
        "synthetic", root=str(tmp_path / "d"), num_pids=4, tracklets_per_pid=3,
        frames_per_tracklet=(6, 10), height=64, width=32, verbose=False,
    )
    S, H, W = 5, 64, 32  # consistent loss needs seq_len >= 5
    train_ds = VideoClipDataset(
        ds.train, seq_len=S, sample="restricted", height=H, width=W,
        pose_info=ds.process_poses, num_split=4, pyramid_part=True,
        enable_pose=True,
    )
    sampler = init_sampler("RandomIdentitySamplerV1", ds.train, 4, 2, seed=0)
    loader = ClipLoader(train_ds, batch_size=4, sampler=sampler,
                        drop_last=True, num_workers=1, seed=0)

    model = init_model(
        "vmgn_tiny", num_classes=ds.num_train_pids, loss={"xent", "htri"},
        num_split=4, pyramid_part=True, num_gb=1, use_pose=True,
        learn_graph=True, consistent_loss=True,
    )
    lr_fn = per_step(
        warmup_multistep_lr(1e-3, [100], warmup_factor=0.01, warmup_iters=2),
        steps_per_epoch=max(1, len(loader)),
    )
    tx = init_optim("adam", lr_fn, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=S, height=H, width=W, batch_size=2
    )
    step = make_train_step(
        model, tx, label_smooth=True, soft_margin=True,
        aug=dict(flip_aug=True), donate=False,
    )

    key = jax.random.PRNGKey(1)
    epoch_xent = []
    for epoch in range(12):
        vals = []
        for imgs, pids, _, adjs in loader:
            key, sk = jax.random.split(key)
            state, metrics = step(state, imgs, pids.astype(np.int32), adjs, sk)
            vals.append(float(metrics["xent_loss"]))
        epoch_xent.append(float(np.mean(vals)))

    assert all(np.isfinite(epoch_xent)), epoch_xent
    # learned: late-training xent well under the from-scratch start (the
    # per-epoch curve is noisy at 2 batches/epoch, so compare 3-epoch means)
    start = float(np.mean(epoch_xent[:3]))
    end = float(np.mean(epoch_xent[-3:]))
    assert end < 0.7 * start, epoch_xent


@pytest.fixture(scope="module")
def trained_on_discriminative(tmp_path_factory):
    """Train the tiny VMGN on the discriminative MARS-layout fixture and
    return (model, variables, dataset, geometry). Module-scoped in-process;
    DISK-cached across runs keyed by the training-path source files
    (tests/fixture_cache.py) — an unchanged tree skips the ~3-min training,
    any train-path edit re-trains."""
    from agrl_tpu.data.datasets.synthetic_mars import materialize_mars_layout

    from .fixture_cache import TRAIN_PATH_KEYS, disk_cached

    root = str(tmp_path_factory.mktemp("disc"))
    materialize_mars_layout(
        root, num_train_pids=6, num_test_pids=8, num_cams=2,
        tracklets_per_cam=2, frames_range=(6, 12),
        height=128, width=64, seed=3,
    )
    ds = init_vidreid_dataset("mars", root=root, use_pose=True, verbose=False)

    S, H, W = 4, 64, 32
    model = init_model(
        "vmgn_tiny", num_classes=ds.num_train_pids, loss={"xent", "htri"},
        num_split=4, pyramid_part=True, num_gb=1, use_pose=True,
        learn_graph=True,
    )

    def build():
        kw = dict(height=H, width=W, pose_info=ds.process_poses, num_split=4,
                  pyramid_part=True, enable_pose=True)
        train_ds = VideoClipDataset(ds.train, seq_len=S, sample="restricted", **kw)
        sampler = init_sampler("RandomIdentitySamplerV1", ds.train, 8, 2, seed=0)
        loader = ClipLoader(train_ds, batch_size=8, sampler=sampler,
                            drop_last=True, num_workers=1, seed=0)
        tx = init_optim("adam", lambda step: 1e-3, weight_decay=5e-4)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0), seq_len=S, height=H, width=W,
            batch_size=2,
        )
        step = make_train_step(
            model, tx, label_smooth=True, soft_margin=True,
            aug=dict(flip_aug=True), donate=False,
        )
        key = jax.random.PRNGKey(1)
        for epoch in range(10):
            for imgs, pids, _, adjs in loader:
                key, sk = jax.random.split(key)
                state, metrics = step(state, imgs, pids.astype(np.int32), adjs, sk)
        assert np.isfinite(float(metrics["xent_loss"]))
        return jax.tree.map(
            np.asarray, {"params": state.params, "batch_stats": state.batch_stats}
        )

    variables = disk_cached(
        "disc_vmgn_tiny", TRAIN_PATH_KEYS,
        tag="v1-pids6x8-s4h64w32-ep10-seed0", builder=build,
    )
    return model, variables, ds, (S, H, W)


def _loaders(ds, sample, S, H, W):
    kw = dict(height=H, width=W, pose_info=ds.process_poses, num_split=4,
              pyramid_part=True, enable_pose=True)
    bs = 1 if sample in ("dense", "skipdense", "all") else 8
    q = ClipLoader(VideoClipDataset(ds.query, seq_len=S, sample=sample, **kw),
                   batch_size=bs, num_workers=1)
    g = ClipLoader(VideoClipDataset(ds.gallery, seq_len=S, sample=sample, **kw),
                   batch_size=bs, num_workers=1)
    return q, g


@pytest.mark.slow
def test_discriminative_fixture_informative_band(trained_on_discriminative):
    """The converged score sits in an INFORMATIVE band: well above chance
    (the fixture is learnable) and below saturation (identities share
    palette bands, cameras differ in gain — ties and near-misses exist).
    The floor is the regression tripwire: a loss mis-wiring, BN-stat bug,
    or attention off-by-one that costs a few mAP points fails here, which
    the old 100%-Rank-1 fixtures could not detect."""
    from agrl_tpu.engine.evaluator import Evaluator

    model, variables, ds, (S, H, W) = trained_on_discriminative
    q, g = _loaders(ds, "evenly", S, H, W)
    ev = Evaluator(model, test_sample="evenly")
    rank1, mAP = ev.evaluate(variables, q, g, dist_metric="cosine",
                             metric_protocol="mars")
    print(f"[discriminative] evenly rank1={float(rank1):.3f} mAP={float(mAP):.3f}")
    # regression floor + saturation ceiling (tuned on seeds 0/3; the band
    # is wide enough for seed noise, tight enough to catch real quality
    # bugs)
    assert 0.55 < float(mAP) < 0.995, float(mAP)
    assert float(rank1) >= 0.5, float(rank1)


@pytest.mark.slow
def test_eval_paths_agree_in_informative_band(trained_on_discriminative):
    """packed dense + bucketed `all` on the same trained weights: both
    must land in the same informative band as `evenly` (paths see
    different frame subsets, so equality is not expected — but a padding/
    masking/pooling bug in either packer now shifts a MID-RANGE score,
    where it is visible, instead of a saturated one, where it was not)."""
    from agrl_tpu.engine.evaluator import Evaluator

    model, variables, ds, (S, H, W) = trained_on_discriminative
    scores = {}
    for sample in ("evenly", "dense", "all"):
        q, g = _loaders(ds, sample, S, H, W)
        ev = Evaluator(model, test_sample=sample, clip_batch=8)
        _, mAP = ev.evaluate(variables, q, g, dist_metric="cosine",
                             metric_protocol="mars")
        scores[sample] = float(mAP)
    print(f"[discriminative] eval-path mAPs: {scores}")
    for sample, mAP in scores.items():
        assert mAP > 0.55, (sample, scores)
    assert abs(scores["dense"] - scores["evenly"]) < 0.2, scores
    assert abs(scores["all"] - scores["evenly"]) < 0.2, scores
