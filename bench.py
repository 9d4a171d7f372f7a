"""End-of-round benchmark (runs on the real TPU chip).

Measures the MARS-protocol evaluation hot path end to end on synthetic
MARS-shaped data: VMGN (ResNet-50 + 2 graph blocks, seq_len 8, 256x128)
feature extraction throughput in clips/s, plus the 1980 x 9330 distance
matrix + vectorized CMC/mAP ranking wall-clock.

Baseline (BASELINE.md): the reference extracts features at
0.045 s / 256 images on a 4x TITAN X rig => 5689 imgs/s = 711 clips/s
(8-frame clips) for the WHOLE rig. vs_baseline compares our single-chip
clips/s against that 4-GPU number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC = 711.0  # 4x TITAN X rig (BASELINE.md)


def main():
    from agrl_tpu.metrics.rank import evaluate_mars
    from agrl_tpu.models import init_params
    from agrl_tpu.models.vmgn import VMGN
    from agrl_tpu.ops.distmat import cosine_distmat

    B, S, H, W = 32, 8, 256, 128
    model = VMGN(num_classes=625, num_split=4, pyramid_part=True, num_gb=2)
    variables = init_params(
        model, jax.random.PRNGKey(0), seq_len=S, height=H, width=W, batch_size=2
    )
    V = S * model.total_split

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, H, W, 3), jnp.float32)
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))

    fwd = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    # warmup + compile; fetch to host — on the tunneled axon platform
    # block_until_ready alone does not guarantee completion
    _ = np.asarray(fwd(variables, x, adj))

    n_iters = 15
    t0 = time.perf_counter()
    for _ in range(n_iters):
        feats = fwd(variables, x, adj)
    _ = np.asarray(feats[:, 0])  # host fetch = hard sync
    extract_s = (time.perf_counter() - t0) / n_iters
    clips_per_sec = B / extract_s

    # ---- distmat + ranking at MARS scale (1980 x 9330, 4096-d) ----
    Q, G, D = 1980, 9330, 4096
    qf = jnp.asarray(rng.randn(Q, D), jnp.float32)
    gf = jnp.asarray(rng.randn(G, D), jnp.float32)
    dist_fn = jax.jit(cosine_distmat)
    _ = np.asarray(dist_fn(qf, gf)[0, :4])  # compile + sync
    t0 = time.perf_counter()
    dm = dist_fn(qf, gf)
    _ = np.asarray(dm[0, :4])
    distmat_s = time.perf_counter() - t0

    q_pids = rng.randint(0, 625, Q)
    g_pids = rng.randint(0, 625, G)
    q_cams = rng.randint(0, 6, Q)
    g_cams = rng.randint(0, 6, G)
    dm_np = np.asarray(dm)
    t0 = time.perf_counter()
    cmc, mAP = evaluate_mars(dm_np, q_pids, g_pids, q_cams, g_cams, max_rank=50)
    rank_s = time.perf_counter() - t0

    result = {
        "metric": "mars_eval_clips_per_sec_single_chip",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        "extract_s_per_batch32": round(extract_s, 4),
        "distmat_1980x9330_s": round(distmat_s, 4),
        "rank_cmc_map_s": round(rank_s, 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
