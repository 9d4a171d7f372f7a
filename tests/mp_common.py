"""Shared fixture logic for the multi-process test: a deterministic
two-step sharded training run that can execute either single-process
(8 local virtual devices) or as one process of a multi-host job."""

from __future__ import annotations

import jax
import numpy as np


def run_two_steps(shard: tuple[int, int] | None = None):
    """Two sharded train steps on an all-devices 'dp' mesh.

    `shard=(pid, nproc)`: this process holds only its contiguous slice of
    the deterministic global batch (multi-host data loading); None = the
    full batch (single process). Returns the step-2 metrics dict."""
    import jax.numpy as jnp  # noqa: F401

    from agrl_tpu.engine import create_train_state, make_train_step
    from agrl_tpu.models.vmgn import VMGN
    from agrl_tpu.optim import init_optim
    from agrl_tpu.parallel import batch_sharding, make_mesh, put_global, replicated

    mesh = make_mesh(dp=len(jax.devices()), mp=1)
    model = VMGN(
        num_classes=4, layers=(1, 1, 1, 1), num_split=4, pyramid_part=True, num_gb=1
    )
    tx = init_optim("adam", 1e-3, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=4, height=32, width=16, batch_size=1
    )
    rep = replicated(mesh)

    def to_global(tree):
        return jax.tree.map(lambda a: put_global(np.asarray(a), rep), tree)

    state = state.replace(
        params=to_global(state.params),
        batch_stats=to_global(state.batch_stats),
        opt_state=to_global(state.opt_state),
        step=put_global(np.asarray(state.step), rep),
    )

    rng = np.random.RandomState(0)
    B, S, H, W = 8, 4, 32, 16
    V = S * model.total_split
    x = rng.rand(B, S, H, W, 3).astype(np.float32)
    adj = (rng.rand(B, V, V) > 0.5).astype(np.float32)
    pids = rng.randint(0, 4, B).astype(np.int32)
    if shard is not None:
        pid, nproc = shard
        k = B // nproc
        x, adj, pids = (a[pid * k : (pid + 1) * k] for a in (x, adj, pids))

    step_fn = make_train_step(model, tx, donate=False)
    with mesh:
        xs = put_global(x, batch_sharding(mesh, 5))
        adjs = put_global(adj, batch_sharding(mesh, 3))
        pids_d = put_global(pids, batch_sharding(mesh, 1))
        metrics = None
        for i in range(2):
            state, metrics = step_fn(state, xs, pids_d, adjs, jax.random.PRNGKey(7 + i))
        jax.block_until_ready(metrics)

    # eval forward after training: global (replicated) variables + the
    # same host-local batch on every process — the multi-host evaluation
    # pattern the CLI uses. Checksum must agree across processes.
    rng_e = np.random.RandomState(1)
    xe = rng_e.rand(2, S, H, W, 3).astype(np.float32)
    adje = (rng_e.rand(2, V, V) > 0.5).astype(np.float32)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    feats = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))(
        variables, xe, adje
    )
    metrics = dict(metrics)
    metrics["eval_feat_checksum"] = jnp.sum(jnp.abs(feats))
    return metrics


def expected_ckpt_tree():
    """Deterministic host tree for the cross-host checkpoint test."""
    rng = np.random.RandomState(42)
    return {
        "params": {
            "wide": rng.randn(16, 64).astype(np.float32),
            "bias": rng.randn(64).astype(np.float32),
        },
        "opt_state": {"count": np.asarray(3, np.int32)},
    }


def cross_host_ckpt_roundtrip(out_path: str):
    """Tensor-parallel multi-host checkpointing: place a kernel sharded
    over 'mp' across BOTH processes (neither fully addressable nor fully
    replicated — plain np.asarray raises on it), gather it back with
    fetch_global_tree (collective: both processes call it), and have
    process 0 write the checkpoint. Returns per-process checksums."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from agrl_tpu.core import fetch_global_tree, save_checkpoint
    from agrl_tpu.parallel import make_mesh, put_sharded_tree

    mesh = make_mesh(mp=2)  # dp = n_devices/2; mp pairs span the device grid
    tree = expected_ckpt_tree()
    shardings = {
        "params": {
            "wide": NamedSharding(mesh, P(None, "mp")),
            "bias": NamedSharding(mesh, P()),
        },
        "opt_state": {"count": NamedSharding(mesh, P())},
    }
    placed = put_sharded_tree(tree, shardings)
    wide = placed["params"]["wide"]
    assert not wide.is_fully_addressable, "mp shards must span processes"
    assert not wide.is_fully_replicated

    # exactly the CLI's call shape: only the writer fetches replicated
    # leaves; the other process joins the collective gathers and nothing
    # else
    host = fetch_global_tree(placed, fetch_local=jax.process_index() == 0)
    for path in (("params", "wide"), ("params", "bias"), ("opt_state", "count")):
        a, b = tree, host
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(a, b, err_msg=str(path))

    if jax.process_index() == 0:
        save_checkpoint(host, out_path, epoch=7)
    return {
        "wide_sum": float(np.abs(host["params"]["wide"]).sum()),
        "bias_sum": float(np.abs(host["params"]["bias"]).sum()),
    }


def multihost_evaluator_eval(data_root: str):
    """The CLI's multi-host evaluation pattern with real processes: every
    process loads the SAME query/gallery (eval loaders are deliberately
    not process-sharded), the Evaluator replicates the variables and
    dp-shards every batch over the GLOBAL mesh via cross-host device_put
    — including the ragged tail batch that pads to the dp multiple.
    Both processes must report identical rank1/mAP, equal to a
    single-process run on the same data."""
    from agrl_tpu.data.datasets import init_vidreid_dataset
    from agrl_tpu.data.loader import ClipLoader, VideoClipDataset
    from agrl_tpu.engine.evaluator import Evaluator
    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.parallel import make_mesh

    ds = init_vidreid_dataset(
        "synthetic", root=data_root, num_pids=3, tracklets_per_pid=2,
        frames_per_tracklet=(5, 8), height=64, width=32, verbose=False,
    )
    kw = dict(seq_len=4, sample="evenly", height=64, width=32,
              pose_info=ds.process_poses, num_split=4, pyramid_part=True)
    qloader = ClipLoader(VideoClipDataset(ds.query, **kw), batch_size=8, num_workers=1)
    gloader = ClipLoader(VideoClipDataset(ds.gallery, **kw), batch_size=8, num_workers=1)
    model = init_model("vmgn_tiny", num_classes=3, loss={"xent", "htri"},
                       num_split=4, pyramid_part=True, num_gb=1,
                       use_pose=True, learn_graph=True)
    variables = init_params(
        model, jax.random.PRNGKey(0), seq_len=4, height=64, width=32
    )
    ev = Evaluator(model, test_sample="evenly")
    mesh = make_mesh()  # every global device on 'dp'
    r1, mAP = ev.evaluate(
        variables, qloader, gloader, dist_metric="cosine", mesh=mesh
    )
    return {"rank1": float(r1), "mAP": float(mAP)}


if __name__ == "__main__":
    print({k: float(np.asarray(v)) for k, v in run_two_steps().items()})
