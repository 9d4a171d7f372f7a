"""Model complexity: parameter count + FLOPs.

Parity target: utils/model_complexity.py:252-348 + torchtools.py
count_num_param — the reference estimates per-layer FLOPs with forward
hooks and a per-op-type table. The TPU-native equivalent is exact: ask
XLA for the compiled program's cost analysis (flops metric), which
accounts for every fused op the hardware will actually run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_num_param(params, exclude_heads=("classifier",)) -> float:
    """Parameters in millions. The reference (torchtools.py:62-67) excludes
    ONLY a head attribute literally named `classifier`: vmgn (whose heads
    are global_/att_classifier) and msppgn (`classifiers`) exclude
    nothing, while msppn's `classifier` ModuleList — every per-vertex head
    — is excluded wholesale.

    `exclude_heads`: exact top-level names, or prefixes ending in '_'
    ("classifier_" covers msppn's classifier_{i}/classifier_fused)."""
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        top = str(getattr(path[0], "key", path[0]))
        if any(
            top.startswith(p) if p.endswith("_") else top == p
            for p in exclude_heads
        ):
            continue
        total += np.size(leaf)
    return total / 1e6


def head_exclusions(model) -> tuple:
    """Per-model `count_num_param` exclusions mirroring the reference's
    `hasattr(model, 'classifier')` rule (see count_num_param)."""
    return getattr(model, "count_exclude_heads", ("classifier",))


def compute_model_complexity(
    model,
    variables,
    seq_len: int = 8,
    height: int = 256,
    width: int = 128,
    num_vertices: int | None = None,
    verbose: bool = True,
):
    """Returns (num_params_millions, gflops) for a single-clip forward.

    FLOPs come from XLA's cost analysis of the jitted eval forward on a
    dummy (1, S, H, W, 3) clip + all-ones adjacency — the same probe the
    reference driver runs at startup (train_vidreid_xent_htri.py:256-263).
    """
    if num_vertices is None:
        from agrl_tpu.models import default_num_vertices

        num_vertices = default_num_vertices(model, seq_len)
    x = jnp.zeros((1, seq_len, height, width, 3), jnp.float32)
    adj = jnp.ones((1, num_vertices, num_vertices), jnp.float32)

    fn = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    num_params = count_num_param(variables["params"], head_exclusions(model))
    gflops = float("nan")
    try:
        compiled = fn.lower(variables, x, adj).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        gflops = float(cost.get("flops", float("nan"))) / 1e9
    except Exception as e:  # cost analysis is backend-dependent
        if verbose:
            print(f"(cost analysis unavailable: {e})")
    if verbose:
        print(f"Model complexity: params {num_params:.5f}M, eval forward {gflops:.2f} GFLOPs/clip")
    return num_params, gflops
