"""Persistent XLA compilation-cache setup shared by the CLI, the tests
(tests/conftest.py), the multi-process workers (tests/mp_worker.py), and
the driver dryrun (__graft_entry__.dryrun_multichip).

One helper so every entry point agrees on the directory and thresholds:
compiled programs are keyed by program + config + topology, so CPU/TPU and
single-/multi-process runs never cross. On the axon-tunnel TPU a cached
program loads in ~30 ms vs minutes of XLA compile; on XLA:CPU compiles are
cheap but init/trace-time constants still amortize across processes.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/tmp/agrl_xla_cache"


def enable_compile_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default: the
    AGRL_COMPILE_CACHE_DIR env var, else /tmp/agrl_xla_cache). Returns the
    directory used ('' disables)."""
    import jax

    if path is None:
        path = os.environ.get("AGRL_COMPILE_CACHE_DIR", DEFAULT_CACHE_DIR)
    if path:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
