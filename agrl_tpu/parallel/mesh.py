"""Device mesh + sharding rules — the TPU-native replacement for the
reference's single-process nn.DataParallel (train_vidreid_xent_htri.py:317).

Design (SPMD over ICI, not replicate-scatter-gather):
  * A 2-D mesh ('dp', 'mp'). Batches shard over 'dp'; large 2048-wide
    weight matrices (classifiers, graph-layer projections) shard their
    output dim over 'mp'. Everything else is replicated.
  * The train step is a single `jit` with these shardings as in/out
    constraints; XLA GSPMD inserts the all-reduces (gradients ride ICI)
    — no hand-written collectives.
  * Cross-replica BatchNorm falls out for free: under jit the batch axis
    is a GLOBAL axis, so BN statistics are computed over the full batch
    (an upgrade over DataParallel's per-GPU stats; documented deviation).
  * Evaluation shards the gallery axis of the Q x G distance matrix over
    'dp' (see agrl_tpu.ops.distmat).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (jax.distributed): call once per host
    before any jax op when running on a multi-host pod slice. With no
    arguments, uses the TPU environment's auto-detection. After this,
    make_mesh() sees every chip in the slice and the same jit'd train
    step runs SPMD across hosts (collectives ride ICI within the slice,
    DCN across slices)."""
    import jax.distributed

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    dp: int | None = None, mp: int = 1, devices=None
) -> Mesh:
    """Build a ('dp', 'mp') mesh. Defaults: all devices on 'dp'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
        dp = n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} needs {dp * mp} devices, have {n}"
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, axis_names=("dp", "mp"))


def put_global(a, sharding: NamedSharding):
    """device_put that also works across processes.

    Single process: plain jax.device_put. Multi-process: `a` is THIS
    process's shard of the batch (or the full array for replicated
    shardings) and the result is a global jax.Array assembled from every
    process's local data (jax.make_array_from_process_local_data) — the
    per-host data loading story of SURVEY.md §2.8."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))
    return jax.device_put(a, sharding)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'dp'."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with their leading axis sharded over 'dp'."""
    out = tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a))) for a in arrays
    )
    return out if len(out) > 1 else out[0]


def put_sharded_tree(tree, shardings):
    """Place a pytree onto per-leaf shardings; works single- AND
    multi-process (device_put accepts shardings that span other hosts'
    devices — each process contributes its addressable shards, verified
    with 2 real jax.distributed processes in tests/test_multiprocess.py).
    Multi-process contract: the leaf VALUE must be the same on every
    process (fresh init from a shared seed, or a checkpoint every host
    read)."""
    return jax.tree.map(jax.device_put, tree, shardings)


def place_state(state, mesh: Mesh, min_size: int | None = None):
    """Place a whole TrainState onto the mesh — THE production placement,
    shared by the CLI, dryrun_multichip, and the tests so they cannot
    drift: wide 2-D kernels (classifier/graph projections) and their
    optimizer moments shard over 'mp' (the param_shardings shape rule,
    applied to every state collection), everything else replicates.

    `min_size`: forwarded to param_shardings (tests lower it so tiny
    models still exercise the mp path); None = the production default."""
    kw = {} if min_size is None else {"min_size": min_size}

    def place(tree):
        return put_sharded_tree(tree, param_shardings(mesh, tree, **kw))

    return state.replace(
        params=place(state.params),
        batch_stats=place(state.batch_stats),
        opt_state=place(state.opt_state),
        step=place(state.step),
    )


def param_shardings(
    mesh: Mesh,
    params,
    min_size: int = 2048 * 256,
):
    """Sharding pytree for model params: 2-D kernels whose LAST dim is
    divisible by the 'mp' axis size and whose total size exceeds
    `min_size` shard that dim over 'mp'; everything else replicates.

    With mp=1 this is full replication (pure data parallel)."""
    mp = mesh.shape["mp"]

    def rule(path, x):
        del path
        if (
            mp > 1
            and hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[-1] % mp == 0
            and x.size >= min_size
        ):
            return NamedSharding(mesh, P(None, "mp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
