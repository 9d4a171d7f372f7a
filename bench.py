"""End-of-round benchmark (runs on the real TPU chip).

Measures the MARS-protocol evaluation hot path end to end on synthetic
MARS-shaped data: VMGN (ResNet-50 + 2 graph blocks, seq_len 8, 256x128)
bf16 feature extraction throughput in clips/s, plus the 1980 x 9330
distance matrix + CMC/mAP ranking (fully on device via streaming top-k).

Baseline (BASELINE.md): the reference extracts features at
0.045 s / 256 images on a 4x TITAN X rig => 5689 imgs/s = 711 clips/s
(8-frame clips) for the WHOLE rig; its distmat+rank step takes ~4 s.
vs_baseline compares our single-chip clips/s against the 4-GPU number.

bf16 note: weights/activations in bfloat16 (mean relative feature error
vs f32 measured at 3e-4 — far below ranking noise); distances accumulate
in f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

import numpy as np

BASELINE_CLIPS_PER_SEC = 711.0  # 4x TITAN X rig (BASELINE.md)
BASELINE_RANK_S = 4.0  # reference distmat+CMC/mAP wall-clock
BASELINE_IMGS_PER_SEC_PER_WORKER = 5689.0 / 8  # reference hides decode behind 8 workers


def _ensure_native_built():
    """The host-pipeline numbers assume the native libjpeg decoder; on a
    fresh workspace build it rather than silently benching the PIL
    fallback (~4x slower per core)."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, "native", "libjpeg_decode.so")
    if not os.path.exists(so):
        r = subprocess.run(
            ["make", "-C", os.path.join(here, "native")],
            capture_output=True, text=True,
        )
        if not os.path.exists(so):
            print(f"WARNING: native build failed, benching PIL fallback:\n"
                  f"{r.stderr[-500:]}", file=sys.stderr)


def bench_host_pipeline(S=8, H=256, W=128, n_track=400, frames_per=10, batch=64):
    """Host input pipeline through the REAL ClipLoader on materialized JPEGs:
    native batched libjpeg decode + pose graph build + collation.

    Returns (decode-bound cold clips/s, disk-cache cold-start clips/s,
    warm clips/s with the RAM cache, imgs/s/core). "Warm" is the batch-
    cache steady state: deterministic eval loaders cache whole collated
    batches (data/loader.py), so epoch 2+ over an unchanged query/gallery
    costs one LRU lookup per batch — the measured rate is effectively
    iteration overhead, orders of magnitude above any device rate, i.e.
    repeat evals are host-free WHEN the collated set fits --cache-gb
    (true here; MARS evenly needs ~9 GB — an undersized LRU gets ~0 hits
    on a cyclic scan and repeat evals pay the fill rate). Epoch 1 of a
    process pays the decode or disk-store rate (the other two numbers).
    "Disk-cache cold
    start" = a fresh process on a machine whose persistent frame store
    (data.cache.FrameDiskCache, CLI --frame-cache-dir) was populated by any
    earlier run: decode is replaced by sequential uint8 reads. The
    axon-tunnel H2D (~20-40 MB/s) is a harness artifact — a real TPU host
    feeds HBM at GB/s — so end-to-end throughput is reported as
    min(host rate, device rate) rather than timed through the tunnel."""
    import os

    import numpy as np

    # corpus dir keyed by its generation parameters: a bare marker would
    # silently reuse a stale corpus after a parameter change
    root = f"/tmp/agrl_bench_jpegs_{n_track}x{frames_per}_{H}x{W}"
    if not os.path.exists(root + "/done"):
        from PIL import Image

        rng = np.random.RandomState(0)
        for t in range(n_track):
            d = f"{root}/{t:04d}"
            os.makedirs(d, exist_ok=True)
            base = (rng.rand(H // 8, W // 8, 3) * 255).astype(np.uint8)
            for f in range(frames_per):
                Image.fromarray(base).resize((W, H), Image.BILINEAR).save(
                    f"{d}/{f:03d}.jpg", quality=88
                )
        open(root + "/done", "w").write("1")

    tracklets = [
        (
            tuple(f"{root}/{t:04d}/{f:03d}.jpg" for f in range(frames_per)),
            t % 50,
            t % 6,
        )
        for t in range(n_track)
    ]
    rng = np.random.RandomState(1)
    pose_info = {}
    for paths, _, _ in tracklets:
        for p in paths:
            kp = np.zeros((18, 3))
            kp[:, 0] = rng.rand(18) * W
            kp[:, 1] = rng.rand(18) * H
            kp[:, 2] = rng.rand(18)
            pose_info[p] = kp

    from agrl_tpu.data.loader import ClipLoader, VideoClipDataset

    def run(loader):
        t0 = time.perf_counter()
        n = 0
        for imgs, _, _, _ in loader:
            n += imgs.shape[0]
        return n / (time.perf_counter() - t0)

    ds_args = dict(
        seq_len=S, sample="evenly", height=H, width=W,
        pose_info=pose_info, num_split=4, pyramid_part=True, enable_pose=True,
        cache_frames=True, key_fn=lambda p: p,
    )
    def reps_of(passes, n=5, pre=None):
        """n independent throughput reps. The host metrics report the
        MEDIAN with n named in the JSON (VERDICT r04 weak #3 / item 8:
        max-of-few made the r03-vs-r04 host-rate drift unattributable —
        median + spread makes cross-round comparisons meaningful on a
        1-core host with multi-10%% OS scheduling noise)."""
        out = []
        for _ in range(n):
            if pre is not None:
                pre()
            out.append(passes())
        return out

    ds = VideoClipDataset(tracklets, **ds_args)
    loader = ClipLoader(ds, batch_size=batch, num_workers=1, malloc_tuning=True)
    run(loader)  # page-cache + cache-fill warmup
    # decode-bound pass (page cache warm, like epoch 2+ of a new machine)
    cold_reps = reps_of(lambda: run(loader), pre=ds.cache.clear)
    warm_reps = reps_of(lambda: run(loader))  # batch-cache steady state

    # persistent frame store: first pass populates (or reuses a prior
    # bench's store), then a RAM-cold pass = every later run's epoch 1
    ds2 = VideoClipDataset(tracklets, disk_cache=root + "_fstore", **ds_args)
    loader2 = ClipLoader(ds2, batch_size=batch, num_workers=1, malloc_tuning=True)
    run(loader2)  # populate/verify the store
    disk_reps = reps_of(lambda: run(loader2), pre=ds2.cache.clear)
    ds2.disk_cache.close()
    med = lambda r: float(np.median(r))  # noqa: E731
    return {
        "decode_clips_per_sec": med(cold_reps),
        "disk_cold_clips_per_sec": med(disk_reps),
        "warm_clips_per_sec": med(warm_reps),
        "decode_imgs_per_sec_per_core": med(cold_reps) * S,
        "host_rate_reps": len(cold_reps),
        "host_rate_estimator": "median",
        "decode_reps_min_max": [round(min(cold_reps), 1), round(max(cold_reps), 1)],
        "disk_reps_min_max": [round(min(disk_reps), 1), round(max(disk_reps), 1)],
    }


def main():
    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_params
    from agrl_tpu.models.vmgn import VMGN
    from agrl_tpu.ops.rank import evaluate_mars_device

    B, S, H, W = 64, 8, 256, 128
    model = VMGN(num_classes=625, num_split=4, pyramid_part=True, num_gb=2)
    variables = init_params(
        model, jax.random.PRNGKey(0), seq_len=S, height=H, width=W, batch_size=2
    )
    bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t
    )
    variables = bf16(variables)
    V = S * model.total_split

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, H, W, 3), jnp.bfloat16)
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32), jnp.bfloat16)
    jax.block_until_ready((variables, x, adj))

    fwd = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    _ = np.asarray(fwd(variables, x, adj)[:, 0])  # compile + hard sync

    # two measurement windows, best wins: the axon tunnel adds ±5-8%
    # run-to-run noise that a single window inherits
    extract_s = float("inf")
    for _ in range(2):
        n_iters = 10
        t0 = time.perf_counter()
        for _ in range(n_iters):
            feats = fwd(variables, x, adj)
        _ = np.asarray(feats[:, 0])  # host fetch = hard sync (tunnel-safe)
        extract_s = min(extract_s, (time.perf_counter() - t0) / n_iters)
    clips_per_sec = B / extract_s

    # ---- serving path (engine/export.py FeatureExtractor): ragged uint8
    # requests behind the one compiled executable, incl. on-device
    # normalize + bf16 cast + pad/slice host overhead ----
    from agrl_tpu.engine.export import FeatureExtractor

    fx = FeatureExtractor(model, variables, batch_size=B, seq_len=S, bf16=True)
    req = rng.randint(0, 256, (2 * B + 13, S, H, W, 3), dtype=np.uint8)
    req_adj = (rng.rand(2 * B + 13, V, V) > 0.5).astype(np.float32)
    _ = fx(req[:B], req_adj[:B])  # compile
    # serving pays a REAL host->device transfer per request (uint8 frames),
    # unlike the extract number whose inputs live on device. On this rig
    # that transfer rides the axon tunnel (~40 MB/s), so also report the
    # transfers-only rate for the pattern the extractor ACTUALLY uses:
    # it pads the final chunk to a full batch and issues ONE B-clip put
    # per chunk, so the reference is ceil((2B+13)/B) = 3 chunked B-clip
    # puts of the SAME bytes, timed transfers-only (no compute). (r03
    # measured a single monolithic 3B-clip put instead, which the tunnel
    # moves ~1.3-1.7x SLOWER than the chunked stream — serving sat far
    # above that number and the "transfer-bound" narrative didn't hold;
    # VERDICT r03 weak #2.) The tunnel's rate drifts >50% across minutes,
    # so the two measurements INTERLEAVE rep-for-rep and both report from
    # the same rep. Even so this is a REFERENCE RATE, not a strict
    # ceiling: measured pairs put serving within ~10% of it on EITHER
    # side — the pipelined extractor hides per-put dispatch gaps that the
    # transfers-only harness pays, and the transport's rate is mildly
    # pattern-dependent. Equal-within-noise = transfer-bound: the ~0.15 s
    # of compute per window is fully hidden. A local-PCIe host moves the
    # same bytes ~375x faster (15 GB/s vs 40 MB/s; PROFILE.md "Serving
    # path") and serves compute-bound near the extract rate.
    # the ceiling moves the EXACT bytes serving moves: the same req
    # slices, final chunk padded to a full batch (a broadcast-of-one-clip
    # stand-in would have different content — and anything between the
    # host and the chip that is content-sensitive would skew the compare)
    n_chunks = -(-req.shape[0] // B)
    chunks = []
    for k in range(n_chunks):
        c = req[k * B : (k + 1) * B]
        if c.shape[0] < B:
            c = np.concatenate([c, req[: B - c.shape[0]]])
        chunks.append(np.ascontiguousarray(c))
    # sync by ONE host fetch of a jitted probe over all chunk arrays —
    # on the axon tunnel block_until_ready is not a reliable sync, and a
    # per-array element fetch costs an RTT each (~1 s of measured
    # pollution on a ~6 s window)
    h2d_probe = jax.jit(lambda ds: jnp.stack([d[0, 0, 0, 0, 0] for d in ds]))
    _ = np.asarray(h2d_probe([jnp.asarray(c) for c in chunks]))  # compile
    # report BOTH numbers from the SAME rep (fastest combined): taking
    # independent mins re-decouples the interleaved pairs — under the
    # tunnel's >50% drift a fast window can land on one metric's min and
    # not the other's, which is exactly the serving-above-ceiling
    # artifact the interleaving exists to prevent
    pairs = []
    for _ in range(4):
        t0 = time.perf_counter()
        feats = fx(req, req_adj)  # 2 full chunks + 1 padded chunk
        s = time.perf_counter() - t0
        t0 = time.perf_counter()
        devs = [jnp.asarray(c) for c in chunks]
        _ = np.asarray(h2d_probe(devs))
        pairs.append((s, time.perf_counter() - t0))
    assert feats.shape == (2 * B + 13, 4096)
    serve_s, h2d_s = min(pairs, key=lambda p: p[0] + p[1])
    serving_clips_per_sec = req.shape[0] / serve_s
    serving_h2d_rate = req.shape[0] / h2d_s
    del chunks, devs

    # ---- MARS-scale eval: distmat + CMC/mAP fully on device ----
    Q, G, D = 1980, 9330, 4096
    qf = jnp.asarray(rng.randn(Q, D), jnp.float32)
    gf = jnp.asarray(rng.randn(G, D), jnp.float32)
    q_pids = jnp.asarray(rng.randint(0, 625, Q))
    g_pids = jnp.asarray(rng.randint(0, 625, G))
    q_cams = jnp.asarray(rng.randint(0, 6, Q))
    g_cams = jnp.asarray(rng.randint(0, 6, G))
    jax.block_until_ready((qf, gf))
    cmc, mAP = evaluate_mars_device(qf, gf, q_pids, g_pids, q_cams, g_cams)
    _ = float(mAP)  # compile + sync
    rank_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cmc, mAP = evaluate_mars_device(qf, gf, q_pids, g_pids, q_cams, g_cams)
        _ = (float(mAP), np.asarray(cmc))
        rank_s = min(rank_s, time.perf_counter() - t0)

    # ---- k-reciprocal re-ranking fully on device (ops/rerank.py) ----
    from agrl_tpu.ops.rerank import re_ranking_from_features

    rr = re_ranking_from_features(qf, gf, "cosine")
    _ = np.asarray(rr[:1, :1])  # compile + sync
    rerank_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        rr = re_ranking_from_features(qf, gf, "cosine")
        _ = np.asarray(rr[:1, :1])
        rerank_s = min(rerank_s, time.perf_counter() - t0)
    del rr

    # ---- training throughput (reference: 89.744 clips/s on 4x TITAN X) ----
    from agrl_tpu.engine import create_train_state, make_train_step
    from agrl_tpu.optim import init_optim

    train_model = VMGN(
        num_classes=625, num_split=4, pyramid_part=True, num_gb=2,
        consistent_loss=True, dtype=jnp.bfloat16,  # mixed precision (f32 params)
    )
    tx = init_optim("adam", 1e-4, weight_decay=5e-4)
    state = create_train_state(
        train_model, tx, jax.random.PRNGKey(0), seq_len=S, height=H, width=W, batch_size=2
    )
    TB = 16  # the paper config batch
    xu8 = jnp.asarray(rng.randint(0, 256, (TB, S, H, W, 3)), jnp.uint8)
    adj_t = jnp.asarray((rng.rand(TB, V, V) > 0.5).astype(np.float32))
    pids = jnp.asarray(np.repeat(np.arange(4), 4))
    jax.block_until_ready((state.params, xu8, adj_t))
    step = make_train_step(train_model, tx, aug=dict(flip_aug=True), donate=False)
    state, m = step(state, xu8, pids, adj_t, jax.random.PRNGKey(1))
    _ = float(m["loss"])  # compile + sync
    train_step_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(8):
            state, m = step(state, xu8, pids, adj_t, jax.random.PRNGKey(i))
        loss = float(m["loss"])
        train_step_s = min(train_step_s, (time.perf_counter() - t0) / 8)
    assert np.isfinite(loss), f"train loss went non-finite: {loss}"
    train_clips_per_sec = TB / train_step_s

    # ---- host input pipeline (real ClipLoader over materialized JPEGs),
    # measured in a CLEAN subprocess: the axon tunnel's background threads
    # steal 20-30% of this 1-core host, which would depress (and randomize)
    # the host-side numbers if measured in-process ----
    host = json.loads(
        subprocess.run(
            [sys.executable, __file__, "--host-only"],
            capture_output=True, text=True, check=True,
        ).stdout.splitlines()[-1]
    )
    host_decode = host["decode_clips_per_sec"]
    host_disk_cold = host["disk_cold_clips_per_sec"]
    host_warm = host["warm_clips_per_sec"]
    imgs_per_core = host["decode_imgs_per_sec_per_core"]
    host_extras = {
        k: host[k]
        for k in (
            "host_rate_reps", "host_rate_estimator",
            "decode_reps_min_max", "disk_reps_min_max",
        )
    }
    # cold start = fresh process on a machine with the persistent frame
    # store populated (the shipped pipeline config); the first-ever run on
    # a machine is decode-bound and reported separately
    e2e_cold = min(host_disk_cold, clips_per_sec)
    e2e_first_ever = min(host_decode, clips_per_sec)
    e2e_warm = min(host_warm, clips_per_sec)

    result = {
        "metric": "mars_eval_clips_per_sec_single_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        "eval_e2e_clips_per_sec": round(e2e_warm, 1),
        "e2e_vs_baseline": round(e2e_warm / BASELINE_CLIPS_PER_SEC, 3),
        "eval_e2e_cold_clips_per_sec": round(e2e_cold, 1),
        "eval_e2e_first_ever_clips_per_sec": round(e2e_first_ever, 1),
        "host_pipeline_diskcache_clips_per_sec": round(host_disk_cold, 1),
        "host_pipeline_decode_clips_per_sec": round(host_decode, 1),
        "host_pipeline_warm_clips_per_sec": round(host_warm, 1),
        "host_decode_imgs_per_sec_per_core": round(imgs_per_core, 0),
        "host_decode_per_core_vs_baseline": round(
            imgs_per_core / BASELINE_IMGS_PER_SEC_PER_WORKER, 2
        ),
        **host_extras,
        "extract_ms_per_batch64_bf16": round(extract_s * 1e3, 2),
        "serving_clips_per_sec": round(serving_clips_per_sec, 1),
        "serving_h2d_rate_clips_per_sec": round(serving_h2d_rate, 1),
        "device_distmat_plus_rank_s": round(rank_s, 4),
        "rank_vs_baseline": round(BASELINE_RANK_S / rank_s, 1),
        "rerank_device_s": round(rerank_s, 3),
        "train_clips_per_sec": round(train_clips_per_sec, 1),
        "train_vs_baseline": round(train_clips_per_sec / 89.744, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    _ensure_native_built()
    if "--host-only" in sys.argv:
        print(json.dumps(bench_host_pipeline()))
    else:
        main()
