"""Measure what --async-ckpt buys on the real chip: wall-clock of
[checkpoint save + K train steps] with the synchronous writer vs the
AsyncCheckpointer (whose fetch/serialize overlaps the steps).

Full-size state (vmgn, 625 classes, adam) — the same tree the CLI saves.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/measure_async_ckpt.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from agrl_tpu.core import AsyncCheckpointer, save_checkpoint
from agrl_tpu.engine import create_train_state, make_train_step
from agrl_tpu.models.vmgn import VMGN
from agrl_tpu.optim import init_optim


def main():
    S, H, W, B, K = 8, 256, 128, 16, 8
    rng = np.random.RandomState(0)
    model = VMGN(num_classes=625, num_split=4, pyramid_part=True, num_gb=2,
                 consistent_loss=True, dtype=jnp.bfloat16)
    V = S * model.total_split
    tx = init_optim("adam", 1e-4, weight_decay=5e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               seq_len=S, height=H, width=W, batch_size=2)
    x = jnp.asarray(rng.randint(0, 256, (B, S, H, W, 3)), jnp.uint8)
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))
    pids = jnp.asarray(np.repeat(np.arange(4), 4))
    # donate=False here: the sync-vs-async comparison reuses `state`, and
    # the CLI's donated path is covered by the snapshot-copy semantics test
    step = make_train_step(model, tx, aug=dict(flip_aug=True), donate=False)
    state, m = step(state, x, pids, adj, jax.random.PRNGKey(1))
    _ = float(m["loss"])  # compile + sync

    nbytes = sum(l.nbytes for l in jax.tree.leaves(
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state}))
    print(f"state tree: {nbytes / 1e6:.0f} MB")

    def run_epoch_with_save(saver, label):
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
        st = state
        t0 = time.perf_counter()
        saver(tree)
        t_save_call = time.perf_counter() - t0
        for i in range(K):
            st, mm = step(st, x, pids, adj, jax.random.PRNGKey(2 + i))
        _ = float(mm["loss"])  # sync (host fetch; reliable over the tunnel)
        total = time.perf_counter() - t0
        print(f"{label}: save-call {t_save_call:.2f}s, save + {K} steps {total:.2f}s")
        return total

    with tempfile.TemporaryDirectory() as d:
        sync = run_epoch_with_save(
            lambda t: save_checkpoint(t, os.path.join(d, "sync.msgpack"), epoch=0),
            "sync ")
        ck = AsyncCheckpointer()
        # warm the snapshot program: the first save compiles the jitted
        # whole-tree copy once; a training job saves every eval epoch, so
        # steady state is what matters
        ck.save({"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state},
                os.path.join(d, "warmup.msgpack"), epoch=0)
        ck.wait()

        def async_save(t):
            ck.save(t, os.path.join(d, "async.msgpack"), epoch=0)

        asy = run_epoch_with_save(async_save, "async")
        ck.wait()
        with open(os.path.join(d, "sync.msgpack"), "rb") as f1, \
                open(os.path.join(d, "async.msgpack"), "rb") as f2:
            assert f1.read() == f2.read(), "async checkpoint differs from sync"
        print(f"identical checkpoint bytes; async hides "
              f"{sync - asy:.2f}s per save ({(sync - asy) / sync:.0%} of the window)")


if __name__ == "__main__":
    main()
