"""Profiling & memory observability.

The reference's observability is AverageMeter timing prints and a
gc-walking mem_report (torchreid/utils/torchtools.py:91-142). The
TPU-native equivalents:
  * `trace(logdir)` — context manager around jax.profiler traces
    (viewable in TensorBoard / Perfetto), wired to the driver's
    --profile-dir flag;
  * `device_memory_report()` — per-device live-buffer statistics from the
    runtime's memory stats API.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax


@contextmanager
def trace(logdir: str):
    """Capture an XLA/TPU profiler trace for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_report(print_fn=print) -> list[dict]:
    """Live device-memory statistics per device (bytes)."""
    reports = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        rec = {
            "device": str(d),
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
        reports.append(rec)
        if print_fn is not None:
            in_use = rec["bytes_in_use"]
            peak = rec["peak_bytes_in_use"]
            limit = rec["bytes_limit"]
            fmt = lambda b: f"{b / 2**20:.1f}MiB" if isinstance(b, int) else "n/a"  # noqa: E731
            print_fn(
                f"[mem] {rec['device']}: in_use={fmt(in_use)} "
                f"peak={fmt(peak)} limit={fmt(limit)}"
            )
    return reports
