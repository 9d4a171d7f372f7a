"""Measure the discriminative fixture's converged-mAP seed band and prove
the regression tripwire's sensitivity (VERDICT r04 weak #2 / item 2).

Runs the EXACT training recipe of tests/test_convergence.py's
`trained_on_discriminative` fixture across N seeds (model-init + train-rng
seeds vary; the dataset fixture is pinned at seed 3 like the test), scores
each with the evenly/dense/all evaluators, and additionally trains one
INJECTED-BUG variant per seed-0 weights:

  * `no_htri`   — lambda_htri=0 (the triplet term silently dropped: the
                  canonical loss mis-wiring the floor must catch;
                  reference loss wiring train_vidreid_xent_htri.py:400-408)

Prints one JSON object with per-seed scores, the seed mean/sigma, the
measured eval-path deltas, and the injected-bug scores — committed
alongside as tools/convergence_band.json, from which
tests/test_convergence.py derives its asserts. NOTE the design the
measurement forced: the cross-seed spread (sigma=0.126; seed 4 converges
to 0.627) is WIDER than the injected bug's effect (0.621), so a
mean±k*sigma band can never be a tripwire. The test instead anchors on
the PINNED seed-0 golden score (the fixture recipe is seeded end-to-end,
so one substrate reproduces it near-exactly) minus a small
substrate-reproducibility margin; the committed JSON carries the seed
spread as evidence for why, and the injected score as the sensitivity
proof.

Run on the 8-virtual-device CPU rig (same substrate as the tests):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/measure_convergence_band.py
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from agrl_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

from agrl_tpu.data.datasets import init_vidreid_dataset  # noqa: E402
from agrl_tpu.data.loader import ClipLoader, VideoClipDataset  # noqa: E402
from agrl_tpu.data.samplers import init_sampler  # noqa: E402
from agrl_tpu.engine import create_train_state, make_train_step  # noqa: E402
from agrl_tpu.engine.evaluator import Evaluator  # noqa: E402
from agrl_tpu.models import init_model  # noqa: E402
from agrl_tpu.optim import init_optim  # noqa: E402

S, H, W = 4, 64, 32


def build_fixture(root):
    from agrl_tpu.data.datasets.synthetic_mars import materialize_mars_layout

    # num_test_pids=16 (was 8): 8 test ids saturated on some seeds
    # (measured: seed 0 mAP 0.9115, seed 1 mAP 1.0) — 16 ids quadruple the
    # shared-palette confuser pairs and double the query count, so every
    # seed lands mid-band and the mAP granularity is fine enough to trip on
    materialize_mars_layout(
        root, num_train_pids=6, num_test_pids=16, num_cams=2,
        tracklets_per_cam=2, frames_range=(6, 12),
        height=128, width=64, seed=3,
    )
    return init_vidreid_dataset("mars", root=root, use_pose=True, verbose=False)


def train_once(ds, seed, lambda_htri=1.0):
    kw = dict(height=H, width=W, pose_info=ds.process_poses, num_split=4,
              pyramid_part=True, enable_pose=True)
    train_ds = VideoClipDataset(ds.train, seq_len=S, sample="restricted", **kw)
    sampler = init_sampler("RandomIdentitySamplerV1", ds.train, 8, 2, seed=seed)
    loader = ClipLoader(train_ds, batch_size=8, sampler=sampler,
                        drop_last=True, num_workers=1, seed=seed)
    model = init_model(
        "vmgn_tiny", num_classes=ds.num_train_pids, loss={"xent", "htri"},
        num_split=4, pyramid_part=True, num_gb=1, use_pose=True,
        learn_graph=True,
    )
    tx = init_optim("adam", lambda step: 1e-3, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(seed), seq_len=S, height=H, width=W,
        batch_size=2,
    )
    step = make_train_step(
        model, tx, label_smooth=True, soft_margin=True,
        lambda_htri=lambda_htri, aug=dict(flip_aug=True), donate=False,
    )
    key = jax.random.PRNGKey(seed + 1)
    for epoch in range(10):
        for imgs, pids, _, adjs in loader:
            key, sk = jax.random.split(key)
            state, metrics = step(state, imgs, pids.astype(np.int32), adjs, sk)
    assert np.isfinite(float(metrics["xent_loss"]))
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def score(model, variables, ds, sample):
    kw = dict(height=H, width=W, pose_info=ds.process_poses, num_split=4,
              pyramid_part=True, enable_pose=True)
    bs = 1 if sample in ("dense", "skipdense", "all") else 8
    q = ClipLoader(VideoClipDataset(ds.query, seq_len=S, sample=sample, **kw),
                   batch_size=bs, num_workers=1)
    g = ClipLoader(VideoClipDataset(ds.gallery, seq_len=S, sample=sample, **kw),
                   batch_size=bs, num_workers=1)
    ev = Evaluator(model, test_sample=sample, clip_batch=8)
    rank1, mAP = ev.evaluate(variables, q, g, dist_metric="cosine",
                             metric_protocol="mars")
    return float(rank1), float(mAP)


def main():
    seeds = [int(s) for s in (sys.argv[1:] or ["0", "1", "2", "4"])]
    root = tempfile.mkdtemp(prefix="band_")
    ds = build_fixture(osp.join(root, "d"))

    out = {"seeds": {}, "injected": {}}
    for seed in seeds:
        t0 = time.monotonic()
        model, variables = train_once(ds, seed)
        rec = {}
        for sample in ("evenly", "dense", "all"):
            r1, mAP = score(model, variables, ds, sample)
            rec[sample] = {"rank1": round(r1, 4), "mAP": round(mAP, 4)}
        rec["train_s"] = round(time.monotonic() - t0, 1)
        out["seeds"][seed] = rec
        print(f"[band] seed {seed}: {rec}", flush=True)

    # injected loss mis-wiring: triplet term dropped, same seed-0 recipe
    t0 = time.monotonic()
    model, variables = train_once(ds, seeds[0], lambda_htri=0.0)
    r1, mAP = score(model, variables, ds, "evenly")
    out["injected"]["no_htri"] = {
        "rank1": round(r1, 4), "mAP": round(mAP, 4),
        "train_s": round(time.monotonic() - t0, 1),
    }
    print(f"[band] injected no_htri: {out['injected']['no_htri']}", flush=True)

    maps = np.array([out["seeds"][s]["evenly"]["mAP"] for s in seeds])
    deltas_dense = [abs(out["seeds"][s]["dense"]["mAP"]
                        - out["seeds"][s]["evenly"]["mAP"]) for s in seeds]
    deltas_all = [abs(out["seeds"][s]["all"]["mAP"]
                      - out["seeds"][s]["evenly"]["mAP"]) for s in seeds]
    out["summary"] = {
        "evenly_mAP_mean": round(float(maps.mean()), 4),
        "evenly_mAP_sigma": round(float(maps.std(ddof=1)), 4),
        "evenly_mAP_min": round(float(maps.min()), 4),
        "evenly_mAP_max": round(float(maps.max()), 4),
        "dense_vs_evenly_max_delta": round(float(max(deltas_dense)), 4),
        "all_vs_evenly_max_delta": round(float(max(deltas_all)), 4),
    }
    print(json.dumps(out, indent=1))
    with open(osp.join(osp.dirname(osp.abspath(__file__)),
                       "convergence_band.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
