"""Native-decoder thread-scaling benchmark (VERDICT r03 weak #6).

Materializes a JPEG corpus and times `jpeg_native.decode_resize_batch`
at an OpenMP thread sweep, printing one JSON line with imgs/s per width
and the parallel efficiency vs threads=1. The reference hides decode
cost behind 8 DataLoader workers (train_vidreid_xent_htri.py:37-38); the
equivalent claim here — per-core native decode x N cores — needs data,
and this tool is the measurement. Run it on a multi-core host:

    python tools/bench_decode_threads.py [--threads 1 2 4 8]

NOTE on this build rig: the container is pinned to ONE cpu (taskset 0),
so a sweep here can only show the oversubscription penalty, never
scaling; the measured per-core rate (~4200 imgs/s at 256x128, bench.py
`host_decode_imgs_per_sec_per_core`) is the honest per-core quantity and
multi-core totals are per-core x cores until measured on real hardware.
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


def _corpus(root: str, n: int, H: int, W: int) -> list[str]:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    marker = osp.join(root, "done")
    paths = [osp.join(root, f"{i:05d}.jpg") for i in range(n)]
    if not osp.exists(marker):
        rng = np.random.RandomState(0)
        for p in paths:
            base = (rng.rand(H // 8, W // 8, 3) * 255).astype(np.uint8)
            Image.fromarray(base).resize((W, H), Image.BILINEAR).save(p, quality=88)
        open(marker, "w").write("1")
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--n-imgs", type=int, default=2048)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from agrl_tpu.data import jpeg_native

    if not jpeg_native.available():
        raise SystemExit("native decoder not built (make -C native)")

    H, W = args.height, args.width
    paths = _corpus(f"/tmp/agrl_decode_sweep_{args.n_imgs}_{H}x{W}", args.n_imgs, H, W)
    # warm page cache + first-call overheads
    jpeg_native.decode_resize_batch(paths[:256], H, W, threads=1)

    rates = {}
    for t in args.threads:
        best = 0.0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            imgs, sizes, ok = jpeg_native.decode_resize_batch(paths, H, W, threads=t)
            dt = time.perf_counter() - t0
            assert ok.all()
            best = max(best, len(paths) / dt)
        rates[t] = best

    # parallel efficiency relative to the FIRST swept thread count:
    # eff(t) = rate(t) / (rate(t0) * t/t0) — 1.0 means perfect scaling
    # from t0 to t (with t0=1 this is the classic rate/(rate1*t))
    t0 = args.threads[0]
    base = rates[t0]
    print(json.dumps({
        "n_imgs": args.n_imgs, "hw": f"{H}x{W}",
        "cores_visible": os.cpu_count(),
        "affinity_cores": len(os.sched_getaffinity(0)),
        "imgs_per_sec": {str(t): round(r, 0) for t, r in rates.items()},
        f"efficiency_vs_t{t0}": {
            # max(t, 1): t=0 means "hardware default" — no meaningful ratio
            str(t): round(r / (base * (max(t, 1) / max(t0, 1))), 3)
            for t, r in rates.items()
        },
    }))


if __name__ == "__main__":
    main()
