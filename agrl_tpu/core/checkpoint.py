"""Checkpoint IO — resume vs. transfer semantics.

Parity targets:
  * save_checkpoint — utils/iotools.py:41-55 + driver :364-370: persists
    {params, batch_stats, opt_state, epoch, rank1, mAP}; `is_best` also
    writes a best_model copy.
  * --resume   — driver :289-315: full state restore (weights + optimizer
    + start_epoch + best metrics).
  * --load-weights — driver :279-287: SHAPE-FILTERED partial load: only
    entries whose path exists in the target with a matching shape are
    copied (transfer learning across heads/datasets).

Format: msgpack via flax.serialization for the array pytrees + a JSON
sidecar for scalar metadata. (No torch pickles; a converter for torch
checkpoints lives in agrl_tpu.models.weight_convert.)
"""

from __future__ import annotations

import json
import os.path as osp
import shutil

import jax
import numpy as np
from flax import serialization, traverse_util

from agrl_tpu.utils.iotools import mkdir_if_missing


def save_checkpoint(
    state_tree,
    fpath: str,
    epoch: int,
    rank1: float = 0.0,
    mAP: float = 0.0,
    is_best: bool = False,
) -> None:
    """state_tree: any pytree (e.g. {'params': ..., 'batch_stats': ...,
    'opt_state': ...}). Writes fpath (.msgpack) + fpath.json metadata."""
    mkdir_if_missing(osp.dirname(fpath))
    state_tree = jax.tree.map(np.asarray, state_tree)
    with open(fpath, "wb") as f:
        f.write(serialization.to_bytes(state_tree))
    meta = {"epoch": int(epoch), "rank1": float(rank1), "mAP": float(mAP)}
    with open(fpath + ".json", "w") as f:
        json.dump(meta, f)
    if is_best:
        best = osp.join(osp.dirname(fpath), "best_model.msgpack")
        shutil.copy(fpath, best)
        shutil.copy(fpath + ".json", best + ".json")


def fetch_global_tree(tree, fetch_local: bool = True):
    """Fetch every leaf to host numpy, gathering shards that span
    processes.

    A replicated leaf (or anything single-process) is a plain np.asarray.
    A leaf sharded across HOSTS — e.g. a tensor-parallel ('mp') kernel in
    a multi-host run — is neither fully addressable nor fully replicated,
    so np.asarray raises; those gather via
    multihost_utils.process_allgather. That makes this function a
    COLLECTIVE whenever such leaves exist: EVERY process must call it (in
    the same tree order) BEFORE any rank-0 gating, or the job deadlocks.
    The CLI does exactly that around its checkpoint saves.

    `fetch_local=False` skips the np.asarray on leaves that need no
    collective (non-writer processes call with False: they must JOIN the
    gathers, but fetching hundreds of MB of replicated state they will
    never write is pure waste)."""
    from jax.experimental import multihost_utils

    def fetch(leaf):
        if (
            isinstance(leaf, jax.Array)
            and not leaf.is_fully_addressable
            and not leaf.is_fully_replicated
        ):
            return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
        return np.asarray(leaf) if fetch_local else leaf

    return jax.tree.map(fetch, tree)


class AsyncCheckpointer:
    """Non-blocking `save_checkpoint`: the device->host fetch and msgpack
    serialization run on a background thread while training continues.

    On a tunnel/DCN-attached host the fetch of a full vmgn+adam state is
    seconds of dead time per save; overlapping it with the next epoch is
    the standard TPU-production pattern (what orbax's async checkpointer
    does for sharded trees — this state is replicated, so a thread + the
    existing msgpack writer suffice).

    Donation safety: the train step donates the state buffers, so the
    caller's pytree may be invalidated by the NEXT step while the fetch is
    still in flight. `save` therefore snapshots on device first
    (`jnp.copy`, an HBM->HBM copy, ~ms) and fetches from the snapshot.
    One save is in flight at a time (a new `save` joins the previous one
    first), bounding extra HBM at one state copy and keeping checkpoints
    in order; background failures surface at the next `save`/`wait`.

    Multi-host: the CLI gathers cross-host shards with fetch_global_tree
    BEFORE calling save (a collective cannot run on a background thread
    without racing the training step's collectives), so there async hides
    the serialization+write, not the gather; numpy leaves pass through
    the snapshot untouched.
    """

    def __init__(self):
        from concurrent.futures import ThreadPoolExecutor

        import jax.numpy as jnp

        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
        self._future = None
        # ONE dispatch for the whole-tree snapshot: per-leaf jnp.copy costs
        # a device round-trip each (~600 leaves = seconds over a tunnel/DCN
        # link); jitted, the copy is a single XLA program
        self._snapshot = jax.jit(lambda tree: jax.tree.map(jnp.copy, tree))

    def save(self, state_tree, fpath: str, **meta) -> None:
        self.wait()
        # only jax arrays need the device snapshot (and only they are
        # donation-vulnerable); host leaves pass through untouched so the
        # serialized bytes match the synchronous path exactly
        leaves, treedef = jax.tree.flatten(state_tree)
        arr_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
        if arr_idx:
            copies = self._snapshot([leaves[i] for i in arr_idx])
            for i, c in zip(arr_idx, copies):
                leaves[i] = c
        snapshot = jax.tree.unflatten(treedef, leaves)
        self._future = self._pool.submit(save_checkpoint, snapshot, fpath, **meta)

    def wait(self) -> None:
        """Block until the in-flight save (if any) lands; re-raise its error."""
        if self._future is not None:
            future, self._future = self._future, None
            future.result()


def load_checkpoint(template_tree, fpath: str):
    """Full restore: returns (state_tree, meta dict). `template_tree` must
    have the same structure (a freshly created TrainState's pieces)."""
    with open(fpath, "rb") as f:
        state = serialization.from_bytes(template_tree, f.read())
    meta = {"epoch": -1, "rank1": 0.0, "mAP": 0.0}
    if osp.exists(fpath + ".json"):
        with open(fpath + ".json") as f:
            meta.update(json.load(f))
    return state, meta


def load_variables(fpath: str):
    """Template-free model-variable load for serving hosts.

    Restores the raw msgpack tree with no structure template and returns
    just the model collections ({'params': ..., 'batch_stats': ..., ...})
    with training-only state (opt_state) dropped. The counterpart of
    `save_checkpoint` for hosts that have NO model code — the artifact
    serving path (engine/export.py `FeatureExtractor.from_exported`)
    needs exactly this: jax + the .jaxexp artifact + these variables.
    A bare-params checkpoint comes back as {'params': tree}."""
    with open(fpath, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if not isinstance(raw, dict) or "params" not in raw:
        return {"params": raw}
    return {k: v for k, v in raw.items() if k != "opt_state"}


def shape_filtered_merge(variables, source, cast_dtype=None):
    """Copy every leaf of `source` whose flattened path exists in
    `variables` with an identical shape; everything else is skipped and
    reported. The single implementation behind BOTH --load-weights
    (checkpoint dtypes preserved) and the torch weight converters
    (cast_dtype=np.float32 — torch trees arrive as f64/torch dtypes).

    Returns (new_variables, matched_paths, skipped_paths)."""
    matched, skipped = [], []
    new_vars = {}
    for collection in variables:
        flat_target = traverse_util.flatten_dict(variables[collection])
        flat_source = traverse_util.flatten_dict(source.get(collection, {}))
        for path, value in flat_source.items():
            if path in flat_target and np.shape(value) == np.shape(flat_target[path]):
                flat_target[path] = np.asarray(value, dtype=cast_dtype)
                matched.append(f"{collection}/" + "/".join(map(str, path)))
            else:
                skipped.append(f"{collection}/" + "/".join(map(str, path)))
        new_vars[collection] = traverse_util.unflatten_dict(flat_target)
    return new_vars, matched, skipped


def load_weights_partial(variables, fpath: str):
    """Shape-filtered partial weight load (the --load-weights semantics).

    `variables` is {'params': tree, 'batch_stats': tree, ...} (a bare
    params tree also works: it is treated as {'params': tree}). Loads the
    checkpoint WITHOUT a structure template (raw msgpack dict), then for
    every collection present in both sides copies each leaf whose
    flattened path exists in the target with an identical shape. The
    reference's torch state_dict load (driver :279-287) restores BN
    running stats alongside weights — batch_stats must transfer too or
    --load-weights evaluation runs on init statistics.

    Returns (new_variables, matched, skipped); new_variables mirrors the
    input's shape (bare tree in, bare tree out)."""
    bare = "params" not in variables
    if bare:
        variables = {"params": variables}
    with open(fpath, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if not isinstance(raw, dict) or "params" not in raw:
        raw = {"params": raw}  # bare params checkpoint

    new_vars, matched, skipped = shape_filtered_merge(variables, raw)
    return (new_vars["params"] if bare else new_vars), matched, skipped
