"""Observability/visualization utilities: rank visualization directory
tree, FLOPs counter, profiler trace smoke, device memory report."""

import glob
import os
import os.path as osp

import jax
import numpy as np

from agrl_tpu.utils.model_complexity import compute_model_complexity, count_num_param
from agrl_tpu.utils.profiling import device_memory_report, trace
from agrl_tpu.utils.reidtools import visualize_ranked_results


def _tracklet(tmp_path, name, n=2):
    paths = []
    for i in range(n):
        p = str(tmp_path / f"{name}_{i}.jpg")
        with open(p, "wb") as f:
            f.write(b"img")
        paths.append(p)
    return tuple(paths)


def test_visualize_ranked_results(tmp_path):
    """Per-query directory with the query tracklet at rank 0 and same-
    pid+cam gallery entries excluded (reference reidtools.py:18-80)."""
    query = [(_tracklet(tmp_path, "q0"), 1, 0)]
    gallery = [
        (_tracklet(tmp_path, "g0"), 1, 0),  # same pid+cam -> junk, skipped
        (_tracklet(tmp_path, "g1"), 1, 1),  # true match
        (_tracklet(tmp_path, "g2"), 2, 1),
    ]
    dist = np.asarray([[0.1, 0.2, 0.9]])
    out = str(tmp_path / "ranked")
    visualize_ranked_results(dist, query, gallery, save_dir=out, topk=2)

    qdirs = glob.glob(osp.join(out, "*"))
    assert len(qdirs) == 1
    entries = sorted(os.listdir(qdirs[0]))
    # query_top000 + gallery ranks 1..2; the junk entry must not appear
    assert entries == ["gallery_top001", "gallery_top002", "query_top000"]
    assert len(os.listdir(osp.join(qdirs[0], "gallery_top001"))) == 2


def test_compute_model_complexity_reports_flops():
    from agrl_tpu.models import init_model, init_params

    model = init_model(
        "vmgn_tiny", num_classes=3, loss={"xent", "htri"}, num_split=4,
        pyramid_part=True, num_gb=1, use_pose=True, learn_graph=True,
    )
    variables = init_params(model, jax.random.PRNGKey(0), seq_len=2, height=64, width=32)
    n_params, gflops = compute_model_complexity(
        model, variables, seq_len=2, height=64, width=32, verbose=False
    )
    assert n_params == count_num_param(variables["params"])
    assert np.isfinite(gflops) and gflops > 0.1  # a real conv net


def test_profiler_trace_smoke(tmp_path):
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    produced = glob.glob(osp.join(logdir, "**", "*"), recursive=True)
    assert produced, "profiler trace produced no files"


def test_device_memory_report_shape():
    reports = device_memory_report(print_fn=lambda *a, **k: None)
    assert len(reports) == len(jax.devices())
    assert all("device" in r for r in reports)
