"""Evaluation: feature extraction -> distance matrix -> CMC/mAP.

Behavioral parity with the reference test() (train_vidreid_xent_htri.py:
450-546): dense/skipdense tracklets fold their n clips into the batch and
pool clip features (avg or max) back to one tracklet feature; distance
matrix (euclidean-squared or cosine); optional k-reciprocal re-ranking;
MARS-protocol CMC/mAP by default; same console result block.

TPU-first details:
  * preprocessing (normalize) runs on device fused into the forward;
  * dense tracklets pad their clip count to power-of-two buckets so XLA
    compiles a handful of shapes instead of one per tracklet length;
    pooling is mask-aware (padded clips don't bias avg/max);
  * the distance matrix is one MXU matmul; with a mesh the gallery axis
    shards over 'dp' (agrl_tpu.ops.distmat.sharded_distmat).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from agrl_tpu.data.transforms import preprocess_clips
from agrl_tpu.metrics import evaluate_rank, re_ranking
from agrl_tpu.ops.distmat import compute_distmat
from agrl_tpu.utils.avgmeter import AverageMeter


def _bucket(n: int, min_bucket: int = 1) -> int:
    b = max(min_bucket, 1)
    while b < n:
        b *= 2
    return b


class Evaluator:
    def __init__(
        self, model, test_sample: str = "evenly", pool: str = "avg", bf16: bool = False
    ):
        self.model = model
        self.test_sample = test_sample
        self.pool = pool
        self.bf16 = bf16
        # key created lazily: a module-level PRNGKey would initialize the
        # JAX backend at import time, defeating late platform selection
        zero_key = jax.random.PRNGKey(0)  # eval preprocessing is deterministic

        def fwd(v, x, a):
            x = preprocess_clips(x, zero_key)
            if bf16:
                # bf16 weights/activations: measured 3e-4 relative feature
                # error vs f32 — below ranking noise; ~1.5x faster on v5e
                v = jax.tree.map(
                    lambda t: t.astype(jnp.bfloat16)
                    if t.dtype == jnp.float32
                    else t,
                    v,
                )
                x = x.astype(jnp.bfloat16)
                a = a.astype(jnp.bfloat16)
            out = self.model.apply(v, x, a, train=False)
            return out.astype(jnp.float32)

        self._fwd = jax.jit(fwd)

    def extract(self, variables, loader, name: str = "query"):
        """Returns (features (N, D) np, pids, camids)."""
        feats, pids, camids = [], [], []
        batch_time = AverageMeter()
        dense = self.test_sample in ("dense", "skipdense")
        for imgs, bpids, bcamids, adjs in loader:
            t0 = time.time()
            if dense:
                # batch element = tracklet of n clips (loader batch size 1)
                b, n, s = imgs.shape[:3]
                imgs = imgs.reshape(b * n, *imgs.shape[2:])
                adjs = adjs.reshape(b * n, *adjs.shape[2:])
                n_pad = _bucket(b * n)
                pad = n_pad - b * n
                if pad:
                    imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
                    adjs = np.concatenate([adjs, np.ones((pad, *adjs.shape[1:]), adjs.dtype)])
                f = np.asarray(self._fwd(variables, imgs, adjs))
                valid = f[: b * n]
                if self.pool == "avg":
                    f = valid.mean(axis=0, keepdims=True)
                else:
                    f = valid.max(axis=0, keepdims=True)
            else:
                f = np.asarray(self._fwd(variables, imgs, adjs))
            batch_time.update(time.time() - t0)
            feats.append(f)
            pids.extend(np.asarray(bpids).tolist())
            camids.extend(np.asarray(bcamids).tolist())
        features = np.concatenate(feats, axis=0)
        print(
            f"Extracted features for {name} set, obtained "
            f"{features.shape[0]}-by-{features.shape[1]} matrix"
        )
        return features, np.asarray(pids), np.asarray(camids), batch_time

    def evaluate(
        self,
        variables,
        queryloader,
        galleryloader,
        dist_metric: str = "euclidean",
        re_rank: bool = False,
        ranks=(1, 5, 10, 20),
        metric_protocol: str = "mars",
        return_distmat: bool = False,
        device_rank: bool = True,
        mesh=None,
    ):
        qf, q_pids, q_camids, bt_q = self.extract(variables, queryloader, "query")
        gf, g_pids, g_camids, bt_g = self.extract(variables, galleryloader, "gallery")
        avg_bt = (bt_q.sum + bt_g.sum) / max(bt_q.count + bt_g.count, 1)
        print(f"==> BatchTime(s)/Batch: {avg_bt:.3f}")

        # fast path: MARS protocol fully on device (streaming top-k +
        # masked-cumsum CMC/mAP) — no (Q, G) matrix on host. Re-ranking
        # and distmat export need the full matrix, so they fall through.
        if device_rank and metric_protocol == "mars" and not re_rank and not return_distmat:
            from agrl_tpu.ops.rank import evaluate_mars_device

            print("Computing CMC and mAP on device")
            cmc_d, map_d = evaluate_mars_device(
                jnp.asarray(qf), jnp.asarray(gf),
                q_pids, g_pids, q_camids, g_camids, metric=dist_metric,
            )
            cmc, mAP = np.asarray(cmc_d), float(map_d)
            print("Results ----------")
            print(f"mAP: {mAP:.2%}")
            print("CMC curve")
            for r in ranks:
                print(f"Rank-{r:<3}: {cmc[r - 1]:.2%}")
            print("------------------")
            return cmc[0], mAP

        print(f"Computing distance matrix with metric={dist_metric} ...")
        dist_fn = jax.jit(lambda a, b: compute_distmat(a, b, dist_metric))
        if mesh is not None:
            from agrl_tpu.ops.distmat import sharded_distmat

            with mesh:
                distmat = np.asarray(
                    sharded_distmat(mesh, jnp.asarray(qf), jnp.asarray(gf), dist_metric)
                )
        else:
            distmat = np.asarray(dist_fn(jnp.asarray(qf), jnp.asarray(gf)))

        if re_rank:
            print("Applying person re-ranking ...")
            qq = np.asarray(dist_fn(jnp.asarray(qf), jnp.asarray(qf)))
            gg = np.asarray(dist_fn(jnp.asarray(gf), jnp.asarray(gf)))
            distmat = re_ranking(distmat, qq, gg)

        print("Computing CMC and mAP")
        kwargs = {f"use_metric_{metric_protocol}": True}
        cmc, mAP = evaluate_rank(distmat, q_pids, g_pids, q_camids, g_camids, **kwargs)

        print("Results ----------")
        print(f"mAP: {mAP:.2%}")
        print("CMC curve")
        for r in ranks:
            print(f"Rank-{r:<3}: {cmc[r - 1]:.2%}")
        print("------------------")

        if return_distmat:
            return distmat
        return cmc[0], mAP
