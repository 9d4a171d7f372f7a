"""End-to-end CLI smoke test: train + eval the tiny VMGN on the synthetic
dataset through the full driver path (catalog -> sampler -> loader ->
sharded train step -> evaluator -> checkpoint)."""

import glob
import os.path as osp
import sys

import pytest


def _tiny_run(tmp_path):
    """Shared setup: synthetic dataset + the tiny-VMGN base argv used by the
    resume/observability tests. Returns (data_root, save_dir, base_argv)."""
    from agrl_tpu.data.datasets import init_vidreid_dataset

    data_root = str(tmp_path / "data")
    save_dir = str(tmp_path / "log")
    init_vidreid_dataset(
        "synthetic", root=data_root, num_pids=3, tracklets_per_pid=2,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )
    base = [
        "--root", data_root, "-d", "synthetic", "-a", "vmgn_tiny",
        "--height", "64", "--width", "32", "--seq-len", "4",
        "--train-batch", "4", "--num-instances", "2",
        "--train-sampler", "RandomIdentitySamplerV1",
        "--test-sample", "evenly", "--test-batch", "4",
        "--use-pose", "--learn-graph", "--pyramid-part", "--num-gb", "1",
        "--save-dir", save_dir, "-j", "2", "--print-freq", "1",
        # a dp=4 x mp=2 mesh over the 8 virtual devices: the CLI's
        # explicit state placement (put_sharded_tree) runs on both the
        # train and the --evaluate path
        "--mesh-mp", "2",
    ]
    return data_root, save_dir, base


@pytest.mark.slow
def test_cli_train_and_eval(tmp_path):
    from agrl_tpu.cli.train_vidreid_xent_htri import build_parser, run

    data_root = str(tmp_path / "data")
    save_dir = str(tmp_path / "log")

    # materialize the synthetic dataset at this root first
    from agrl_tpu.data.datasets import init_vidreid_dataset

    init_vidreid_dataset(
        "synthetic", root=data_root, num_pids=4, tracklets_per_pid=2,
        frames_per_tracklet=(5, 10), height=64, width=32, verbose=False,
    )

    argv = [
        "--root", data_root,
        "-d", "synthetic",
        "-a", "vmgn_tiny",
        "--height", "64", "--width", "32",
        "--seq-len", "4",
        "--train-batch", "4",
        "--num-instances", "2",
        "--train-sample", "restricted",
        "--train-sampler", "RandomIdentitySamplerV1",
        "--test-sample", "evenly",
        "--test-batch", "4",
        "--optim", "adam",
        "--lr", "1e-3",
        "--soft-margin",
        "--label-smooth",
        "--max-epoch", "2",
        "--stepsize", "50",
        "--eval-step", "2",
        "--num-split", "4",
        "--pyramid-part",
        "--use-pose",
        "--learn-graph",
        "--num-gb", "1",
        "--flip-aug",
        "--dist-metric", "cosine",
        "--print-freq", "1",
        "--save-dir", save_dir,
        "-j", "2",
        "--seed", "1",
    ]
    stdout = sys.stdout
    try:
        args = build_parser().parse_args(argv)
        run(args)
    finally:
        sys.stdout = stdout

    # training log written, checkpoint saved
    assert glob.glob(osp.join(save_dir, "log_train*.txt"))
    assert glob.glob(osp.join(save_dir, "checkpoint_ep2.msgpack"))
    assert glob.glob(osp.join(save_dir, "scalars.jsonl"))


@pytest.mark.slow
def test_cli_evaluate_with_resume(tmp_path):
    """--evaluate with --load-weights restores a trained checkpoint.
    Training runs with --async-ckpt, so this also proves a checkpoint
    written by the background thread is bit-loadable by --resume."""
    from agrl_tpu.cli.train_vidreid_xent_htri import build_parser, run

    _, save_dir, base = _tiny_run(tmp_path)
    stdout = sys.stdout
    try:
        run(build_parser().parse_args(
            base + ["--max-epoch", "1", "--eval-step", "1", "--async-ckpt"]
        ))
        ckpt = glob.glob(osp.join(save_dir, "checkpoint_ep1.msgpack"))[0]
        run(build_parser().parse_args(base + ["--evaluate", "--resume", ckpt]))
    finally:
        sys.stdout = stdout


@pytest.mark.slow
def test_cli_profile_dir_and_visualize_ranks(tmp_path):
    """The two observability side-channels through the real driver:
    --profile-dir captures a jax profiler trace of the first train epoch
    (reference: tensorboard has no trace; SURVEY §5 'tracing'), and
    --evaluate --visualize-ranks materializes the distance matrix on host
    and dumps per-query ranked image strips (reference
    utils/reidtools.py:18-80 behind the same flag)."""
    from agrl_tpu.cli.train_vidreid_xent_htri import build_parser, run

    _, save_dir, base = _tiny_run(tmp_path)
    profile_dir = str(tmp_path / "trace")
    stdout = sys.stdout
    try:
        run(build_parser().parse_args(
            base + ["--max-epoch", "1", "--eval-step", "5",
                    "--profile-dir", profile_dir]
        ))
        # the profiler wrote a trace for epoch 1
        assert glob.glob(osp.join(profile_dir, "**", "*.pb"), recursive=True) \
            or glob.glob(osp.join(profile_dir, "**", "*.json.gz"), recursive=True)

        ckpt = glob.glob(osp.join(save_dir, "checkpoint_ep1.msgpack"))[0]
        run(build_parser().parse_args(
            base + ["--evaluate", "--resume", ckpt, "--visualize-ranks"]
        ))
    finally:
        sys.stdout = stdout
    strips = glob.glob(osp.join(save_dir, "ranked_results", "*"))
    assert strips, "no ranked-result dumps written"
