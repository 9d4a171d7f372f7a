"""Evaluation: feature extraction -> distance matrix -> CMC/mAP.

Behavioral parity with the reference test() (train_vidreid_xent_htri.py:
450-546): dense/skipdense tracklets fold their n clips into the batch and
pool clip features (avg or max) back to one tracklet feature; distance
matrix (euclidean-squared or cosine); optional k-reciprocal re-ranking;
MARS-protocol CMC/mAP by default; same console result block.

TPU-first details:
  * preprocessing (normalize) runs on device fused into the forward;
  * dense tracklets pack their clip streams ACROSS tracklets into one
    fixed (clip_batch, ...) device shape (one XLA compilation, full
    batches); pooling accumulates per tracklet as slices arrive;
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

# module-level jit: a per-evaluate() lambda would re-trace and re-compile
# the same distance computation every evaluation epoch
_distmat_jit = jax.jit(compute_distmat, static_argnames=("metric",))


def make_eval_forward(model, bf16: bool = False):
    """The jitted eval forward: on-device preprocess (normalize) + optional
    bf16 cast of weights/activations + model apply, returning f32 features.

    Returns (fwd, fwd_masked): fwd(variables, imgs, adjs) -> (B, D);
    fwd_masked additionally takes a (B, S) frame mask (None when the arch
    does not implement the frame-mask contract). The SAME program serves
    the Evaluator and the AOT export path (engine/export.py) — one
    definition, so the served program cannot drift from the evaluated one.
    """
    # key created lazily: a module-level PRNGKey would initialize the
    # JAX backend at import time, defeating late platform selection
    zero_key = jax.random.PRNGKey(0)  # eval preprocessing is deterministic

    def _cast(v, x, a):
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
        return v, x, a

    def fwd(v, x, a):
        v, x, a = _cast(v, preprocess_clips(x, zero_key), a)
        out = model.apply(v, x, a, train=False)
        return out.astype(jnp.float32)

    fwd_masked = None
    # masked forward for the bucketed `--test-sample all` path: pads
    # are excluded exactly inside the model (models/vmgn.py)
    if getattr(model, "supports_frame_mask", False):
        def fwd_masked(v, x, a, fmask):
            v, x, a = _cast(v, preprocess_clips(x, zero_key), a)
            out = model.apply(v, x, a, train=False, frame_mask=fmask)
            return out.astype(jnp.float32)

        fwd_masked = jax.jit(fwd_masked)

    return jax.jit(fwd), fwd_masked


class Evaluator:
    def __init__(
        self, model, test_sample: str = "evenly", pool: str = "avg", bf16: bool = False,
        clip_batch: int = 64,
    ):
        self.model = model
        self.test_sample = test_sample
        self.pool = pool
        self.bf16 = bf16
        self.clip_batch = clip_batch
        self._fwd, self._fwd_masked = make_eval_forward(model, bf16)

    @staticmethod
    def _mesh_put(variables, mesh):
        """The ONE sharding recipe behind every eval runner: replicate the
        variables over the mesh and return (variables, put) where `put`
        dp-shards an array's leading axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        variables = jax.device_put(variables, NamedSharding(mesh, P()))

        def put(arr):
            return jax.device_put(
                arr, NamedSharding(mesh, P("dp", *[None] * (np.ndim(arr) - 1)))
            )

        return variables, put

    def _make_fwd_runner(self, variables, mesh):
        """Batch-sharded forward over the mesh's 'dp' axis (multi-chip
        extraction, SURVEY.md §2.8), or the plain single-device forward.

        Ragged batches pad to a dp multiple (all-ones adj) and slice the
        padding back off the feature rows."""
        if mesh is None or mesh.size <= 1:
            return lambda imgs, adjs: self._fwd(variables, imgs, adjs)

        dp = mesh.shape["dp"]
        variables, put = self._mesh_put(variables, mesh)

        def run(imgs, adjs):
            n = imgs.shape[0]
            pad = (-n) % dp
            if pad:
                imgs = np.concatenate(
                    [imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)]
                )
                adjs = np.concatenate(
                    [adjs, np.ones((pad, *adjs.shape[1:]), adjs.dtype)]
                )
            f = self._fwd(variables, put(imgs), put(adjs))
            return f[:n] if pad else f

        return run

    def extract(
        self, variables, loader, name: str = "query",
        keep_on_device: bool = False, mesh=None,
    ):
        """Returns (features (N, D), pids, camids, batch_time meter).

        `keep_on_device=True` (evenly/all sampling only): features stay
        device arrays end to end — no per-batch D2H fetch; downstream
        device ranking consumes them in place. Batch times then measure
        dispatch, not compute (the final ranking syncs).

        `mesh`: shard each batch over the mesh's 'dp' axis (multi-chip
        extraction)."""
        if self.test_sample in ("dense", "skipdense"):
            return self._extract_dense_packed(variables, loader, name, mesh=mesh)
        if self.test_sample == "all" and self._fwd_masked is not None:
            return self._extract_all_bucketed(
                variables, loader, name, keep_on_device=keep_on_device,
                mesh=mesh,
            )
        run_fwd = self._make_fwd_runner(variables, mesh)
        feats, pids, camids = [], [], []
        batch_time = AverageMeter()
        for imgs, bpids, bcamids, adjs in loader:
            t0 = time.time()
            f = run_fwd(imgs, adjs)
            if not keep_on_device:
                f = np.asarray(f)
            batch_time.update(time.time() - t0)
            feats.append(f)
            pids.extend(np.asarray(bpids).tolist())
            camids.extend(np.asarray(bcamids).tolist())
        if not feats:
            raise ValueError(f"{name} loader yielded no tracklets")
        features = (jnp.concatenate if keep_on_device else np.concatenate)(feats, axis=0)
        print(
            f"Extracted features for {name} set, obtained "
            f"{features.shape[0]}-by-{features.shape[1]} matrix"
        )
        return features, np.asarray(pids), np.asarray(camids), batch_time

    @staticmethod
    def _bucket_len(num: int, lo: int = 8) -> int:
        """Bucket ladder for `--test-sample all`: geometric ~1.25x steps
        rounded up to multiples of 8 (floored at `lo`) — still O(log)
        compiled programs per run (~18 for lengths up to 1000 vs 8 with
        power-of-two buckets, a one-time cost the persistent compile
        cache amortizes across processes), but MARS-shaped lengths pad
        13.5%% of pushed frames instead of 30%%: ~19%% less masked-out
        device compute (tools/project_multichip_eval.py measures both
        terms on the shipped ladder)."""
        b = lo
        while b < num:
            b = -(-5 * b // 32) * 8  # ceil(b * 1.25 / 8) * 8
        return b

    def _make_masked_runner(self, variables, mesh):
        """Masked forward, batch-sharded over the mesh's 'dp' axis when a
        mesh is given (caller sends dp-divisible batches)."""
        if mesh is None or mesh.size <= 1:
            return lambda x, a, m: self._fwd_masked(variables, x, a, m)

        variables, put = self._mesh_put(variables, mesh)
        return lambda x, a, m: self._fwd_masked(
            variables, put(x), put(a), put(m)
        )

    def _extract_all_bucketed(
        self, variables, loader, name: str, keep_on_device: bool = False,
        mesh=None,
    ):
        """`all`-sampling extraction with fixed-shape length bucketing and
        cross-tracklet batching.

        The reference runs whole tracklets one at a time at their native
        length (dataset_loader.py:115-119) — under XLA that is one
        compilation per distinct length (hundreds on MARS) at batch 1.
        Here each tracklet pads to the next _bucket_len ladder count with
        a frame mask the model honors exactly (masked global mean, masked
        graph row-normalization, masked attention — see models/vmgn.py),
        and same-bucket tracklets batch together up to a ~clip_batch*8
        frame budget (dp-padded under a mesh), so features equal the
        unpadded forward while only O(log) shapes compile — at real device
        batch sizes instead of the reference's batch 1.

        The per-frame vertex count comes from the adjacency itself
        (frame-major layout, trailing frames pad at trailing indices), so
        archs that ignore the adjacency (sta/res50tp/resnet50_s1) bucket
        too. msppn/msppgn — whose vertices are split-major across 3
        feature scales, where a trailing-block pad would land on the
        wrong vertices — own their padding via a `pad_eval_adjacency`
        hook (models/graphnet.py scatters entries to the flat positions
        their model vertices occupy after S -> Sp)."""
        dp = mesh.shape["dp"] if mesh is not None and mesh.size > 1 else 1
        frame_budget = max(self.clip_batch, 1) * 8
        runner = self._make_masked_runner(variables, mesh)
        batch_time = AverageMeter()
        pend: dict[int, list] = {}  # bucket -> [(idx, imgs, adj, fmask)]
        out: dict[int, object] = {}  # idx -> feature row
        pids, camids = [], []
        n_items = 0

        def ab_for(Sp: int) -> int:
            ab = max(1, frame_budget // Sp)
            return -(-ab // dp) * dp  # round UP to a dp multiple

        def flush(Sp: int, final: bool = False):
            q = pend[Sp]
            ab = ab_for(Sp)
            while q and (final or len(q) >= ab):
                chunk = q[:ab]
                del q[:ab]
                take = len(chunk)
                t0 = time.time()
                imgs = np.stack([c[1] for c in chunk])
                adjs = np.stack([c[2] for c in chunk])
                fmasks = np.stack([c[3] for c in chunk])
                if take < ab:  # tail: reuse the compiled (ab, ...) shape
                    pad = ab - take
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad, *imgs.shape[1:]), imgs.dtype)]
                    )
                    adjs = np.concatenate(
                        [adjs, np.zeros((pad, *adjs.shape[1:]), adjs.dtype)]
                    )
                    # dummy rows keep one real frame so the masked mean
                    # never divides by zero (rows are dropped anyway)
                    fpad = np.zeros((pad, Sp), np.float32)
                    fpad[:, 0] = 1.0
                    fmasks = np.concatenate([fmasks, fpad])
                f = runner(imgs, adjs, fmasks)
                if not keep_on_device:
                    f = np.asarray(f)
                batch_time.update(time.time() - t0)
                for (idx, *_), row in zip(chunk, f[:take]):
                    out[idx] = row

        pad_adj = getattr(self.model, "pad_eval_adjacency", None)
        for imgs, bpids, bcamids, adjs in loader:
            for bi in range(imgs.shape[0]):
                clip = imgs[bi]  # (num, H, W, 3)
                adj = adjs[bi]  # (V, V), V = num * vertices-per-frame
                num = clip.shape[0]
                Sp = self._bucket_len(num)
                if pad_adj is not None:
                    # split-major archs scatter entries themselves; run the
                    # hook even at Sp == num — adjacency-ignoring models
                    # (msppn; msppgn with learn_graph and no pose) remap ANY
                    # incoming layout to their fixed per-bucket shape, and
                    # an unpadded item must land on that same shape
                    adj = pad_adj(adj, num, Sp)
                if Sp > num:
                    pad = Sp - num
                    clip = np.concatenate(
                        [clip, np.zeros((pad, *clip.shape[1:]), clip.dtype)]
                    )
                    if pad_adj is None:  # frame-major: pad a trailing block
                        assert adj.shape[0] % num == 0, (
                            f"adjacency ({adj.shape[0]} vertices) is not a "
                            f"multiple of the frame count ({num}); bucketed "
                            "'all' eval needs the frame-major layout (or a "
                            "model pad_eval_adjacency hook)"
                        )
                        ts = adj.shape[0] // num
                        Vp = Sp * ts
                        adj_p = np.zeros((Vp, Vp), adj.dtype)
                        adj_p[: adj.shape[0], : adj.shape[1]] = adj
                        adj = adj_p
                fmask = np.zeros(Sp, np.float32)
                fmask[:num] = 1.0
                pend.setdefault(Sp, []).append((n_items, clip, adj, fmask))
                pids.append(int(np.asarray(bpids)[bi]))
                camids.append(int(np.asarray(bcamids)[bi]))
                n_items += 1
                if len(pend[Sp]) >= ab_for(Sp):
                    flush(Sp)
        for Sp in sorted(pend):
            flush(Sp, final=True)

        if not n_items:
            raise ValueError(f"{name} loader yielded no tracklets")
        rows = [out[i] for i in range(n_items)]
        features = (jnp.stack if keep_on_device else np.stack)(rows, axis=0)
        print(
            f"Extracted features for {name} set, obtained "
            f"{features.shape[0]}-by-{features.shape[1]} matrix"
        )
        return features, np.asarray(pids), np.asarray(camids), batch_time

    def _extract_dense_packed(self, variables, loader, name: str, mesh=None):
        """dense/skipdense extraction with CROSS-TRACKLET clip packing.

        The reference runs one forward per tracklet (its n clips as the
        batch, train_vidreid_xent_htri.py:461-476) — typical MARS tracklets
        yield ~8 clips, far under the chip's efficient batch. Here the clip
        streams of consecutive tracklets pack into fixed (clip_batch, ...)
        device batches (ONE compiled shape); a tracklet's clips may straddle
        batches, and its avg/max clip-feature pooling accumulates on host as
        slices arrive — numerically the same mean/max over the same set.
        """
        CB = self.clip_batch
        run_fwd = self._make_fwd_runner(variables, mesh)
        batch_time = AverageMeter()
        pend_imgs, pend_adjs, pend_seg = [], [], []  # flat clip stream
        pids, camids = [], []
        acc = {}  # tracklet idx -> [sum_or_max (D,), clip_count]
        in_flight = []  # one-deep pipeline: (device features, take, segs)
        # ping-pong assembly buffers: np.stack would malloc ~CB*S*H*W*3
        # bytes per chunk (a measured 46 ms of page-fault + memcpy at the
        # MARS shape vs 30 ms for this in-place fill); two buffers
        # alternate because ONE chunk is in flight: chunk k's transfer is
        # provably complete (its features were fetched) before its buffer
        # is refilled for chunk k+2
        buf_imgs = buf_adjs = None  # allocated lazily at first chunk shapes
        chunk_idx = 0

        def accumulate(fd, take, segs):
            t0 = time.time()
            f = np.asarray(fd)[:take]  # D2H sync overlaps the NEXT forward
            batch_time.update(time.time() - t0)
            for row, seg in zip(f, segs):
                entry = acc.get(seg)
                if entry is None:
                    acc[seg] = [row.astype(np.float64), 1]
                elif self.pool == "avg":
                    entry[0] += row
                    entry[1] += 1
                else:
                    np.maximum(entry[0], row, out=entry[0])
                    entry[1] += 1

        def flush(final: bool = False):
            nonlocal buf_imgs, buf_adjs, chunk_idx
            while pend_imgs and (final or len(pend_imgs) >= CB):
                take = min(CB, len(pend_imgs))
                if buf_imgs is None:
                    c0, a0 = pend_imgs[0], pend_adjs[0]
                    buf_imgs = np.empty((2, CB, *c0.shape), c0.dtype)
                    buf_adjs = np.empty((2, CB, *a0.shape), a0.dtype)
                # chunk k fills slot k%2: chunk k-1 (other slot) may be in
                # flight; chunk k-2 (this slot) was fetched when k-1 was
                # dispatched, so its transfer is complete
                slot = chunk_idx & 1
                chunk_idx += 1
                imgs, adjs = buf_imgs[slot], buf_adjs[slot]
                for i in range(take):
                    imgs[i] = pend_imgs[i]
                    adjs[i] = pend_adjs[i]
                segs = pend_seg[:take]
                del pend_imgs[:take], pend_adjs[:take], pend_seg[:take]
                if take < CB:  # tail batch: reuse the same compiled shape
                    imgs[take:] = 0
                    adjs[take:] = 1.0
                # dispatch this batch, THEN drain the previous one — the
                # host-side fetch + pooling overlaps device compute
                in_flight.append((run_fwd(imgs, adjs), take, segs))
                if len(in_flight) > 1:
                    accumulate(*in_flight.pop(0))
            if final:
                while in_flight:
                    accumulate(*in_flight.pop(0))

        n_tracklets = 0
        for imgs, bpids, bcamids, adjs in loader:
            # loader batch size 1: imgs (1, n, S, H, W, 3), adjs (1, n, V, V)
            b, n = imgs.shape[:2]
            for bi in range(b):
                seg = n_tracklets
                n_tracklets += 1
                pids.append(int(np.asarray(bpids)[bi]))
                camids.append(int(np.asarray(bcamids)[bi]))
                for ci in range(n):
                    pend_imgs.append(imgs[bi, ci])
                    pend_adjs.append(adjs[bi, ci])
                    pend_seg.append(seg)
            flush()
        flush(final=True)

        if not acc:
            raise ValueError(f"{name} loader yielded no tracklets")
        D = next(iter(acc.values()))[0].shape[0]
        features = np.empty((n_tracklets, D), np.float32)
        for seg in range(n_tracklets):
            total, cnt = acc[seg]
            features[seg] = total / cnt if self.pool == "avg" else total
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
        # features can stay on device whenever the ranking itself runs on
        # device (incl. re-ranking, which has a device path): saves the
        # D2H round-trip
        on_device = (
            device_rank
            and not return_distmat
            and metric_protocol in ("mars", "market1501", "cuhk03", "dukev")
        )
        qf, q_pids, q_camids, bt_q = self.extract(
            variables, queryloader, "query", keep_on_device=on_device, mesh=mesh
        )
        gf, g_pids, g_camids, bt_g = self.extract(
            variables, galleryloader, "gallery", keep_on_device=on_device, mesh=mesh
        )
        if on_device and mesh is not None and mesh.size > 1:
            # extraction left the feature rows dp-sharded; the ranking
            # kernels want them whole (the rank step is ~0.1 s total)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            qf = jax.device_put(qf, rep)
            gf = jax.device_put(gf, rep)
        avg_bt = (bt_q.sum + bt_g.sum) / max(bt_q.count + bt_g.count, 1)
        print(f"==> BatchTime(s)/Batch: {avg_bt:.3f}")

        # fast path: the whole protocol on device — no (Q, G) matrix on
        # host. mars: streaming top-k + masked-cumsum CMC/mAP; market1501:
        # device argsort + cumsums; cuhk03: vectorized single-gallery-shot
        # resampling; re-ranking: k-reciprocal as boolean matmuls + tiled
        # min-plus Jaccard (ops/rerank.py). Only distmat export (and
        # protocols without a device scorer) falls through to the host.
        if device_rank and not return_distmat:
            device_cmc = None
            # dukev's device scorer is a trapezoid closed form, exact only
            # for tie-free distances; re-ranked distances are quantized
            # Jaccard blends where ties are plausible -> host path (whose
            # dispatcher tie-detects and keeps the literal sklearn walk)
            protocols = ("mars", "market1501", "cuhk03") + (
                () if re_rank else ("dukev",)
            )
            if metric_protocol in protocols:
                from agrl_tpu.ops.rank import (
                    cuhk03_cmc_map,
                    dukev_cmc_map,
                    evaluate_mars_device,
                    market1501_cmc_map,
                    mars_cmc_map_from_distmat,
                )

                def device_cmc():
                    if re_rank:
                        from agrl_tpu.ops.rerank import re_ranking_from_features

                        print("Applying person re-ranking (device)...")
                        dm = re_ranking_from_features(
                            jnp.asarray(qf), jnp.asarray(gf), dist_metric
                        )
                    elif metric_protocol == "mars":
                        # streaming top-k: no full (Q, G) matrix at all
                        return evaluate_mars_device(
                            jnp.asarray(qf), jnp.asarray(gf),
                            q_pids, g_pids, q_camids, g_camids,
                            metric=dist_metric,
                        )
                    else:
                        # compute_distmat comes from the module-level import
                        dm = compute_distmat(
                            jnp.asarray(qf), jnp.asarray(gf), dist_metric
                        )
                    if metric_protocol == "mars":
                        return mars_cmc_map_from_distmat(
                            dm, q_pids, g_pids, q_camids, g_camids
                        )
                    if metric_protocol == "market1501":
                        return market1501_cmc_map(
                            dm, q_pids, g_pids, q_camids, g_camids
                        )
                    if metric_protocol == "dukev":
                        return dukev_cmc_map(
                            dm, q_pids, g_pids, q_camids, g_camids
                        )
                    return cuhk03_cmc_map(
                        dm, q_pids, g_pids, q_camids, g_camids,
                        jax.random.PRNGKey(0),
                    )

            if device_cmc is not None:
                # the jitted scorers clamp their valid-query denominator
                # (max(valid, 1)) because a traced value cannot raise — so
                # an all-invalid query set would silently print 0% scores.
                # Every host path raises here; validity depends only on
                # pids/camids, so check it on host first.
                q_p, g_p = np.asarray(q_pids), np.asarray(g_pids)
                q_c, g_c = np.asarray(q_camids), np.asarray(g_camids)
                some_valid = bool(
                    (
                        (q_p[:, None] == g_p[None, :])
                        & (q_c[:, None] != g_c[None, :])
                    ).any()
                )
                if not some_valid:
                    raise RuntimeError(
                        "No valid query: no query identity appears in the "
                        "gallery under a different camera"
                    )
                print("Computing CMC and mAP on device")
                cmc_d, map_d = device_cmc()
                cmc, mAP = np.asarray(cmc_d), float(map_d)
                print("Results ----------")
                print(f"mAP: {mAP:.2%}")
                print("CMC curve")
                for r in ranks:
                    if r <= len(cmc):
                        print(f"Rank-{r:<3}: {cmc[r - 1]:.2%}")
                print("------------------")
                return cmc[0], mAP

        print(f"Computing distance matrix with metric={dist_metric} ...")
        dist_fn = lambda a, b: _distmat_jit(a, b, metric=dist_metric)  # noqa: E731
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
            if r <= len(cmc):  # tiny galleries truncate the CMC curve
                print(f"Rank-{r:<3}: {cmc[r - 1]:.2%}")
        print("------------------")

        if return_distmat:
            return distmat
        return cmc[0], mAP
