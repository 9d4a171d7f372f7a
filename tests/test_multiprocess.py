"""True multi-process execution: 2 jax.distributed processes (4 virtual
CPU devices each) must produce the SAME two-step training metrics as a
single 8-device process given the same global batch — the per-host data
sharding path (ClipLoader process_shard + parallel.mesh.put_global)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
                 str(pid), "2", str(port), out],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    results = [json.load(open(o)) for o in outs]
    assert results[0]["process_count"] == 2
    assert results[0]["n_devices"] == 8
    # both processes observe identical (replicated) global metrics and
    # identical post-training eval features (the multi-host eval pattern)
    for k in ("loss", "xent_loss", "htri_loss", "eval_feat_checksum"):
        assert results[0][k] == pytest.approx(results[1][k], rel=1e-6), k

    # single-process oracle on this process's 8 virtual devices
    from .mp_common import run_two_steps

    # Gloo's cross-process all-reduce sums in a different order than the
    # single-process XLA reduction; after BN batch stats + one adam update
    # compound through step 2 the fp32 drift lands around 3e-4 on a ~1.5
    # loss. Same data, same math — tolerance covers reduction order only.
    want = run_two_steps(shard=None)
    for k in ("loss", "xent_loss", "htri_loss"):
        assert results[0][k] == pytest.approx(float(np.asarray(want[k])), abs=2e-3), k


@pytest.mark.slow
def test_two_process_tp_checkpoint_gather(tmp_path):
    """A tensor-parallel ('mp') kernel sharded ACROSS the two processes is
    neither fully addressable nor fully replicated — np.asarray raises on
    it, so the CLI gathers with core.fetch_global_tree (collectively, on
    every process) before the rank-0 save. This runs that exact flow with
    2 real jax.distributed processes and verifies the written checkpoint
    bit-equals the original host values."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    ckpt = str(tmp_path / "tp_ckpt.msgpack")

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
                 str(pid), "2", str(port), out, "ckpt", ckpt],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    results = [json.load(open(o)) for o in outs]
    assert results[0] == pytest.approx(results[1])  # both saw the same gather

    # the checkpoint process 0 wrote restores bit-exactly
    from .mp_common import expected_ckpt_tree

    from agrl_tpu.core import load_checkpoint

    expect = expected_ckpt_tree()
    loaded, meta = load_checkpoint(
        {"params": {"wide": np.zeros_like(expect["params"]["wide"]),
                    "bias": np.zeros_like(expect["params"]["bias"])},
         "opt_state": {"count": np.zeros_like(expect["opt_state"]["count"])}},
        ckpt,
    )
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(expect["params"]["wide"], loaded["params"]["wide"])
    np.testing.assert_array_equal(expect["params"]["bias"], loaded["params"]["bias"])
    np.testing.assert_array_equal(expect["opt_state"]["count"], loaded["opt_state"]["count"])


@pytest.mark.slow
def test_two_process_evaluator_matches_single_process(tmp_path):
    """Multi-host EVALUATION end to end: 2 real jax.distributed processes
    run the Evaluator over the global 8-device mesh (cross-host
    device_put of replicated variables + dp-sharded batches, ragged tail
    padded) and must agree with each other and with a single-process run
    on the same data."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    data_root = str(tmp_path / "data")

    # materialize the dataset ONCE before the workers race to read it
    from .mp_common import multihost_evaluator_eval

    from agrl_tpu.data.datasets import init_vidreid_dataset

    init_vidreid_dataset(
        "synthetic", root=data_root, num_pids=3, tracklets_per_pid=2,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )

    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"proc{pid}.json")
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
                 str(pid), "2", str(port), out, "eval", data_root],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    results = [json.load(open(o)) for o in outs]
    assert results[0]["rank1"] == pytest.approx(results[1]["rank1"], abs=1e-6)
    assert results[0]["mAP"] == pytest.approx(results[1]["mAP"], abs=1e-6)

    # single-process oracle on this process's 8 virtual devices
    want = multihost_evaluator_eval(data_root)
    assert results[0]["rank1"] == pytest.approx(want["rank1"], abs=1e-4)
    assert results[0]["mAP"] == pytest.approx(want["mAP"], abs=1e-4)


def test_cliploader_process_shard_partitions_batches():
    """Two sharded loaders with the same seed must cover each global batch
    exactly, in order, with the per-item rng seeds of the unsharded run."""
    from agrl_tpu.data.loader import ClipLoader

    class IdentityDataset:
        def __len__(self):
            return 32

        def get_item(self, index, rng=None):
            # echo the index and the first rng draw so seed parity is visible
            tag = rng.randint(0, 2**31 - 1) if rng is not None else -1
            img = np.full((2, 4, 4, 3), index, np.uint8)
            return img, index, tag, np.ones((3, 3), np.float32)

    def collect(shard):
        loader = ClipLoader(
            IdentityDataset(), batch_size=8, drop_last=True, num_workers=1,
            seed=0, process_shard=shard,
        )
        out = []
        for imgs, pids, tags, _ in loader:
            out.append((pids.tolist(), tags.tolist()))
        return out

    full = collect(None)
    p0 = collect((0, 2))
    p1 = collect((1, 2))
    assert len(full) == len(p0) == len(p1) == 4
    for (fp, ft), (ap, at), (bp, bt) in zip(full, p0, p1):
        assert ap + bp == fp  # contiguous halves cover the global batch
        assert at + bt == ft  # per-item seeds match the unsharded stream
