"""CLI pre-flight: --num-scale is validated against the model's DECLARED
adjacency contract (`expected_adj_scales`), not its vertex-scale count.

msppn builds 3 vertex scales but never reads the adjacency, so any
--num-scale must run (regression: an earlier pre-flight keyed on
`num_vertex_scales` hard-failed msppn at the reference's default
--num-scale 1). msppgn consumes the adjacency only when blending with
the pose graph (use_pose) or using it outright (learn_graph off) —
reference torchreid/models/graphnet.py:283-320 — and only then must
--num-scale match its 3 feature scales.
"""

import sys

import pytest

from agrl_tpu.models.graphnet import MSPyraPartGraphNet, MSPyraPartNet


def test_declared_adjacency_contracts():
    assert MSPyraPartNet(num_classes=10).expected_adj_scales is None
    # blending with the pose graph -> needs the 3-scale adjacency
    m = MSPyraPartGraphNet(num_classes=10, use_pose=True, learn_graph=True)
    assert m.expected_adj_scales == 3
    # the adjacency IS the graph -> needs it too
    m = MSPyraPartGraphNet(num_classes=10, use_pose=False, learn_graph=False)
    assert m.expected_adj_scales == 3
    # pure learned affinity -> adj is never read
    m = MSPyraPartGraphNet(num_classes=10, use_pose=False, learn_graph=True)
    assert m.expected_adj_scales is None
    # both vertex-scale properties stay 3 regardless (pooling layout)
    assert MSPyraPartNet(num_classes=10).num_vertex_scales == 3


def _argv(data_root, save_dir, arch, extra):
    return [
        "--root", data_root, "-d", "synthetic", "-a", arch,
        "--height", "64", "--width", "32", "--seq-len", "4",
        "--train-batch", "4", "--num-instances", "2",
        "--train-sampler", "RandomIdentitySamplerV1",
        "--test-sample", "evenly", "--test-batch", "4",
        "--num-split", "4", "--num-gb", "1",
        "--save-dir", save_dir, "-j", "1", "--seed", "1",
        "--max-epoch", "1",
    ] + extra


class _ReachedModelBuild(Exception):
    """Sentinel: run() got past the pre-flight."""


@pytest.fixture()
def synth_root(tmp_path):
    from agrl_tpu.data.datasets import init_vidreid_dataset

    root = str(tmp_path / "data")
    init_vidreid_dataset(
        "synthetic", root=root, num_pids=3, tracklets_per_pid=2,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )
    return root


def _run(argv, monkeypatch):
    from agrl_tpu import engine
    from agrl_tpu.cli.train_vidreid_xent_htri import build_parser, run

    def _stop(*a, **k):
        raise _ReachedModelBuild

    # the pre-flight sits between init_model and create_train_state; a
    # sentinel there proves the check passed without paying for training
    monkeypatch.setattr(engine, "create_train_state", _stop)
    stdout = sys.stdout
    try:
        run(build_parser().parse_args(argv))
    finally:
        sys.stdout = stdout


def test_msppgn_pose_mismatch_fails_fast(tmp_path, synth_root, monkeypatch):
    argv = _argv(
        synth_root, str(tmp_path / "log"), "msppgn",
        ["--use-pose", "--learn-graph", "--num-scale", "1"],
    )
    with pytest.raises(SystemExit, match="3-scale adjacency"):
        _run(argv, monkeypatch)


def test_msppgn_learned_graph_any_scale_runs(tmp_path, synth_root, monkeypatch):
    argv = _argv(
        synth_root, str(tmp_path / "log"), "msppgn",
        ["--learn-graph", "--num-scale", "1"],
    )
    with pytest.raises(_ReachedModelBuild):
        _run(argv, monkeypatch)


def test_msppgn_flat_split_adjacency_fails_fast(tmp_path, synth_root, monkeypatch):
    """graphnet models ALWAYS pool pyramid parts; a pose graph built
    without --pyramid-part has the wrong per-frame part count (found by
    driving the CLI: the mismatch used to surface as a shape assertion
    deep in the bucketed evaluator)."""
    argv = _argv(
        synth_root, str(tmp_path / "log"), "msppgn",
        ["--use-pose", "--learn-graph", "--num-scale", "3"],
    )
    with pytest.raises(SystemExit, match="pyramid"):
        _run(argv, monkeypatch)


def test_msppgn_matching_layout_runs(tmp_path, synth_root, monkeypatch):
    argv = _argv(
        synth_root, str(tmp_path / "log"), "msppgn",
        ["--use-pose", "--learn-graph", "--num-scale", "3", "--pyramid-part"],
    )
    with pytest.raises(_ReachedModelBuild):
        _run(argv, monkeypatch)


def test_msppn_ignores_num_scale(tmp_path, synth_root, monkeypatch):
    argv = _argv(synth_root, str(tmp_path / "log"), "msppn", ["--num-scale", "1"])
    with pytest.raises(_ReachedModelBuild):
        _run(argv, monkeypatch)
