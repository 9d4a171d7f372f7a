"""Unit tests for the dryrun's multi-host worker supervision
(`__graft_entry__._collect_multihost_cli` / `_mh_tend`).

The behavior under test is the r05 recovery logic: worker logs stream to
disk so a failure tail is always diagnosable, the surviving peer is
killed the moment one rank dies (a dead-rank job is doomed; waiting out
its gloo timeout burned ~100 s of retry budget), and the retry policy
keys on HOW the worker died — a signal death (the cached-AOT SIGILL
case) relaunches without the compile cache, while a Python-exception
death (the observed gloo connect-timeout flake) relaunches warm because
a cold recompile rarely fits the leftover budget.

Reference behavior being certified end-to-end by the real dryrun: the
DataParallel equivalent, /root/reference/train_vidreid_xent_htri.py:317-318.
"""

import os
import subprocess
import sys
import time

import pytest

import __graft_entry__ as ge


def _handle(tmp_path, procs, cache=True, attempt=0):
    """Build a launch handle around already-started fake worker procs,
    with log files on disk like _launch_multihost_cli writes them."""
    logs = []
    for pid in range(len(procs)):
        log = tmp_path / f"proc{pid}_a{attempt}.log"
        if not log.exists():
            log.write_text(f"fake worker {pid} log line\n")
        logs.append(str(log))
    return ge._MultihostHandle(
        procs=procs,
        outs=[str(tmp_path / f"proc{pid}_a{attempt}.json") for pid in range(len(procs))],
        logs=logs,
        n_devices=8,
        work=str(tmp_path),
        cache=cache,
        attempt=attempt,
    )


def _spawn(argv):
    return subprocess.Popen(argv, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def test_collect_times_out_and_reaps(tmp_path):
    procs = [_spawn(["sleep", "60"]), _spawn(["sleep", "60"])]
    h = _handle(tmp_path, procs)
    t0 = time.monotonic()
    msg = ge._collect_multihost_cli(h, deadline_s=1.5)
    assert "TIMEOUT" in msg
    # both workers were killed and reaped promptly — no zombies left
    assert all(p.poll() is not None for p in procs)
    assert time.monotonic() - t0 < 40


def test_collect_kills_surviving_peer_on_rank_death(tmp_path):
    # rank 0 fails fast with a Python-style exit; rank 1 would run 60s —
    # the collect loop must NOT wait for it (the job is doomed)
    procs = [
        _spawn([sys.executable, "-c", "import sys; sys.exit(3)"]),
        _spawn(["sleep", "60"]),
    ]
    h = _handle(tmp_path, procs)
    t0 = time.monotonic()
    with pytest.raises(AssertionError) as ei:
        ge._collect_multihost_cli(h, deadline_s=300.0)
    assert time.monotonic() - t0 < 40  # far below the deadline
    assert all(p.poll() is not None for p in procs)
    # the failure message carries the on-disk log tail for BOTH workers
    assert "fake worker 0 log line" in str(ei.value)
    assert "fake worker 1 log line" in str(ei.value)
    # pre-reap rcs recorded: rank 0's real rc, not the SIGKILLed peer's
    assert h["fail_rcs"][0] == 3


def test_fail_rcs_distinguish_signal_from_exception(tmp_path):
    # a worker killed by a signal records rc < 0 in fail_rcs — the
    # bit the retry policy keys cache-vs-no-cache on
    victim = _spawn(["sleep", "60"])
    victim.send_signal(9)
    victim.wait(timeout=30)
    procs = [victim, _spawn(["sleep", "60"])]
    h = _handle(tmp_path, procs)
    with pytest.raises(AssertionError):
        ge._collect_multihost_cli(h, deadline_s=300.0)
    assert h["fail_rcs"][0] < 0


def test_tend_noop_while_workers_healthy(tmp_path):
    procs = [_spawn(["sleep", "60"]), _spawn(["sleep", "60"])]
    h = _handle(tmp_path, procs)
    mh = {"handle": h, "retries": 0}
    ge._mh_tend(mh)
    assert mh["handle"] is h and mh["retries"] == 0
    ge._reap_multihost(h)


@pytest.mark.parametrize("by_signal", [False, True])
def test_tend_relaunches_dead_worker_with_cache_policy(
    tmp_path, monkeypatch, by_signal
):
    if by_signal:
        dead = _spawn(["sleep", "60"])
        dead.send_signal(9)
        dead.wait(timeout=30)
    else:
        dead = _spawn([sys.executable, "-c", "import sys; sys.exit(1)"])
        dead.wait(timeout=30)
    peer = _spawn(["sleep", "60"])
    h = _handle(tmp_path, [dead, peer])

    launched = {}

    def fake_launch(n_devices, cache=True, work=None, attempt=0):
        launched.update(
            n_devices=n_devices, cache=cache, work=work, attempt=attempt
        )
        return ge._MultihostHandle(
            procs=[], outs=[], logs=[], n_devices=n_devices, work=work,
            cache=cache, attempt=attempt,
        )

    monkeypatch.setattr(ge, "_launch_multihost_cli", fake_launch)
    mh = {"handle": h, "retries": 0}
    ge._mh_tend(mh)
    assert mh["retries"] == 1
    # signal death => compile cache disabled; exception death => warm retry
    assert launched["cache"] is (not by_signal)
    assert launched["work"] == str(tmp_path)  # dataset is NOT re-materialized
    assert launched["attempt"] == 1  # fresh save/out/log names, no clashes
    assert mh["handle"]["attempt"] == 1
    # the doomed peer was reaped before relaunching
    assert peer.poll() is not None


def test_tend_respects_retry_budget(tmp_path, monkeypatch):
    dead = _spawn([sys.executable, "-c", "import sys; sys.exit(1)"])
    dead.wait(timeout=30)
    h = _handle(tmp_path, [dead])
    monkeypatch.setattr(
        ge, "_launch_multihost_cli",
        lambda *a, **k: pytest.fail("must not relaunch past the retry budget"),
    )
    mh = {"handle": h, "retries": 2}
    ge._mh_tend(mh)
    assert mh["handle"] is h and mh["retries"] == 2


def test_log_tail_reads_end_of_file(tmp_path):
    p = _spawn([sys.executable, "-c", "import sys; sys.exit(0)"])
    p.wait(timeout=30)
    big = tmp_path / "proc0_a0.log"
    big.write_text("A" * 5000 + "\nTHE-ACTUAL-ERROR-LINE")
    h = _handle(tmp_path, [p])
    tail = ge._multihost_log_tail(h, n=200)
    # the END of the log (where the exception is), not the beginning
    assert "THE-ACTUAL-ERROR-LINE" in tail
    assert len(tail) < 1000
