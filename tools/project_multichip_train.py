"""Quantified 4-chip (v5e-4) TRAIN projection — measured inputs.

Companion to project_multichip_eval.py. The reference trains MARS at
89.744 clips/s on its whole 4x TITAN X rig (BASELINE.md); one v5e chip
measures 298 clips/s at the paper batch (16) = 3.3x. This tool projects
dp=4 from measured terms:

  * per-chip train-step rate at per-chip batch 4/8/16, measured on the
    real chip (/tmp-style one-off, numbers recorded below): dp=4 with
    the SAME global batch 16 runs batch 4 per chip — batch scaling is
    NOT free at this size (244.8 clips/s/chip at b4 vs 298.4 at b16);
  * gradient all-reduce bytes (the full f32 grad tree = the weight
    bytes) against ICI bandwidth — XLA overlaps the collective with the
    backward, so this is an upper bound on overhead;
  * the TRAIN host input pipeline per core, measured HERE with the real
    ClipLoader at steady state (restricted sampling + P x K sampler +
    warm frame cache: items are rng-sampled every epoch, so unlike eval
    the host pays clip assembly + graph build per epoch — batch caching
    does not apply);
  * train batches are dp-divisible (16 % 4 == 0): zero padding waste.

Prints one JSON object; PROFILE.md's "4-chip train projection" section
is written from this output. Run: python tools/project_multichip_train.py
(CPU fine; chip rates are bench-recorded constants — edit
CHIP_CLIPS_PER_SEC after re-measuring to refresh).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# measured on the real chip (TPU v5e-1, mixed precision, consistent-loss
# on, flip aug, adam — the bench.py train configuration), 2026-08:
CHIP_CLIPS_PER_SEC = {4: 244.8, 8: 275.8, 16: 298.4}  # per-chip batch -> rate
BASELINE = 89.744  # reference whole-rig train rate (BASELINE.md)
WEIGHT_MB_F32 = 198.1  # f32 grad tree = weight bytes (project_multichip_eval)
ICI_GB_S = 100.0  # conservative effective all-reduce bandwidth per chip


def measure_train_host_rate(
    S=8, H=256, W=128, n_track=200, frames_per=16, batch=16, passes=4
):
    """Steady-state TRAIN host pipeline on one core: the real ClipLoader
    with restricted sampling + RandomIdentitySamplerV1, every frame
    pre-decoded into the RAM cache (the epoch-2+ state). Returns best-of
    clips/s (this 1-core rig sees multi-10% scheduler noise; max is the
    honest steady-state estimate)."""
    from PIL import Image

    from agrl_tpu.data.loader import ClipLoader, VideoClipDataset
    from agrl_tpu.data.samplers import init_sampler
    from agrl_tpu.data.transforms import host_decode_resize

    root = f"/tmp/agrl_bench_jpegs_train_{n_track}x{frames_per}_{H}x{W}"
    if not os.path.exists(root + "/done"):
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
    ds = VideoClipDataset(
        tracklets, seq_len=S, sample="restricted", height=H, width=W,
        pose_info=pose_info, num_split=4, pyramid_part=True, enable_pose=True,
        cache_frames=True, key_fn=lambda p: p,
    )
    for paths, _, _ in tracklets:  # pre-decode everything = steady state
        host_decode_resize(list(paths), H, W, cache=ds.cache)
    sampler = init_sampler(
        "RandomIdentitySamplerV1", tracklets, batch_size=batch,
        num_instances=4, seed=0,
    )
    loader = ClipLoader(
        ds, batch_size=batch, sampler=sampler, num_workers=1,
        malloc_tuning=True,
    )
    best = 0.0
    for _ in range(passes):
        t0 = time.perf_counter()
        n = 0
        for imgs, _, _, _ in loader:
            n += imgs.shape[0]
        best = max(best, n / (time.perf_counter() - t0))
    return best


def chip_rate(per_chip_batch: int) -> float:
    """Per-chip clips/s at a given per-chip batch: measured points for
    {4, 8, 16}, linear interpolation between them, flat extrapolation
    above 16 (batch scaling is flat there — PROFILE.md: 291/286/286
    clips/s at 16/32/64). Below the smallest measured batch the step is
    latency-bound, so rate scales down linearly with batch (step time
    held at the batch-4 measurement — conservative)."""
    xs = np.array(sorted(CHIP_CLIPS_PER_SEC), dtype=float)
    ys = np.array([CHIP_CLIPS_PER_SEC[int(x)] for x in xs])
    if per_chip_batch < xs[0]:
        return float(ys[0] * per_chip_batch / xs[0])
    return float(np.interp(per_chip_batch, xs, ys))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chips", type=int, default=4)
    ap.add_argument("--global-batch", type=int, default=16,
                    help="adds a projection entry for this global batch "
                         "(16 and 64 are always reported)")
    args = ap.parse_args()
    n = args.n_chips

    host_rate = measure_train_host_rate()

    def project(global_batch):
        per_chip = max(1, global_batch // n)
        chip = chip_rate(per_chip)
        step_s = per_chip / chip
        # unoverlapped upper bound: ring all-reduce moves ~2(n-1)/n x
        # grad bytes per chip; XLA schedules it inside the backward
        ar_s = 2 * (n - 1) / n * WEIGHT_MB_F32 / 1e3 / ICI_GB_S
        rate = n * chip
        rate_ar_bound = global_batch / (step_s + ar_s)
        return {
            "per_chip_batch": per_chip,
            "chip_clips_per_sec": round(chip, 1),
            "compute_clips_per_sec": round(rate, 0),
            "vs_baseline": round(rate / BASELINE, 1),
            "allreduce_unoverlapped_ms": round(ar_s * 1e3, 2),
            "floor_if_allreduce_unoverlapped": round(rate_ar_bound, 0),
            "floor_vs_baseline": round(rate_ar_bound / BASELINE, 1),
        }

    out = {
        "n_chips": n,
        "chip_rates_measured": CHIP_CLIPS_PER_SEC,
        "train_host_clips_per_sec_per_core_steady": round(host_rate, 0),
        "dp_batch_pad": 0.0,  # 16 % 4 == 0: P x K batches divide exactly
        "same_semantics_global_batch_16": project(16),
        "throughput_config_global_batch_64": project(64),
        "host_cores_to_feed": {
            "global_16": round(project(16)["compute_clips_per_sec"] / host_rate, 2),
            "global_64": round(project(64)["compute_clips_per_sec"] / host_rate, 2),
        },
    }
    if args.global_batch not in (16, 64):
        out[f"requested_global_batch_{args.global_batch}"] = project(
            args.global_batch
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
