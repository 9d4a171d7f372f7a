"""Training-step tests: loss decreases on a tiny overfit problem, and the
full step runs sharded over an 8-device dp/mp mesh (virtual CPU)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from agrl_tpu.engine import create_train_state, make_train_step
from agrl_tpu.optim import init_optim
from agrl_tpu.parallel import make_mesh, param_shardings, shard_batch

from .test_models import tiny_vmgn


def make_batch(rng, B=8, S=8, H=32, W=32, total_split=7, num_pids=4):
    x = jnp.asarray(rng.rand(B, S, H, W, 3), jnp.float32)
    V = S * total_split
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))
    pids = jnp.asarray(np.repeat(np.arange(num_pids), B // num_pids))
    return x, pids, adj


@pytest.mark.heavy
def test_single_head_arch_trains():
    """Regression: archs returning bare (y, f) arrays (not head lists)
    must pass through the train step (gsta/res50tp/etc.)."""
    from agrl_tpu.models.gsta import GSTA

    model = GSTA(num_classes=4, layers=(1, 1, 1, 1), num_split=4, num_gb=1)
    tx = init_optim("adam", 1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=8, height=32, width=32
    )
    step = make_train_step(model, tx, donate=False)
    x, pids, adj = make_batch(np.random.RandomState(0))
    state, metrics = step(state, x, pids, adj, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["top1"]) <= 1.0


@pytest.mark.heavy
def test_loss_decreases_single_device():
    model = tiny_vmgn()
    tx = init_optim("adam", 1e-3, weight_decay=0.0)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=8, height=32, width=32
    )
    step = make_train_step(model, tx, donate=False)
    rng = np.random.RandomState(0)
    x, pids, adj = make_batch(rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, x, pids, adj, sub)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


@pytest.mark.heavy
def test_train_step_on_8dev_mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(dp=4, mp=2)
    model = tiny_vmgn()
    tx = init_optim("adam", 1e-3, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=8, height=32, width=32
    )
    # place params according to mp sharding rules, batch over dp
    shardings = param_shardings(mesh, state.params, min_size=1024)
    params = jax.device_put(state.params, shardings)
    state = state.replace(params=params)

    step = make_train_step(model, tx, donate=False)
    rng = np.random.RandomState(0)
    x, pids, adj = make_batch(rng, B=8)
    with mesh:
        xs, pidss, adjs = shard_batch(mesh, x, pids, adj)
        state, metrics = step(state, xs, pidss, adjs, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["top1"]) <= 1.0

    # remat composes with GSPMD shardings (jax.checkpoint inside the
    # sharded program): same batch, same mesh, finite loss
    step_r = make_train_step(model, tx, donate=False, remat="full")
    with mesh:
        state, metrics_r = step_r(state, xs, pidss, adjs, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics_r["loss"]))


@pytest.mark.heavy
def test_dp_sharded_matches_replicated():
    """The sharded step must compute the same numbers as single-device."""
    model = tiny_vmgn(num_gb=1)
    tx = init_optim("sgd", 1e-2)
    state0 = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=8, height=32, width=32
    )
    step = make_train_step(model, tx, donate=False)
    rng = np.random.RandomState(3)
    x, pids, adj = make_batch(rng, B=8)
    key = jax.random.PRNGKey(2)

    _, m_single = step(state0, x, pids, adj, key)

    mesh = make_mesh(dp=8, mp=1)
    with mesh:
        xs, pidss, adjs = shard_batch(mesh, x, pids, adj)
        _, m_shard = step(state0, xs, pidss, adjs, key)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m_single["xent_loss"]), float(m_shard["xent_loss"]), rtol=2e-4
    )


@pytest.mark.heavy
def test_full_state_mesh_placement_matches_and_sticks():
    """The CLI's mesh placement (parallel.place_state — the SAME helper
    the CLI and dryrun call): wide kernels must actually shard over 'mp',
    their adam moments must shard with them, the sharded step must match
    the single-device step, and the step's OUTPUT state must keep the mp
    sharding (no silent re-replication)."""
    from jax.sharding import PartitionSpec as P

    from agrl_tpu.parallel import place_state

    model = tiny_vmgn(num_gb=1)
    tx = init_optim("adam", 1e-3)
    state0 = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=8, height=32, width=32
    )
    step = make_train_step(model, tx, donate=False)
    rng = np.random.RandomState(5)
    x, pids, adj = make_batch(rng, B=8)
    key = jax.random.PRNGKey(4)
    ref_state, m_single = step(state0, x, pids, adj, key)

    mesh = make_mesh(dp=4, mp=2)
    state = place_state(state0, mesh, min_size=1024)  # tiny-model threshold

    def mp_sharded_leaves(tree):
        return [
            l for l in jax.tree.leaves(tree)
            if isinstance(l, jax.Array)
            and l.sharding.spec == P(None, "mp")
        ]

    n_params_mp = len(mp_sharded_leaves(state.params))
    assert n_params_mp > 0, "no kernel sharded over mp — placement is a no-op"
    # adam's mu/nu mirror the param shapes, so the same rule shards them
    assert len(mp_sharded_leaves(state.opt_state)) == 2 * n_params_mp

    with mesh:
        xs, pidss, adjs = shard_batch(mesh, x, pids, adj)
        new_state, m_shard = step(state, xs, pidss, adjs, key)
        jax.block_until_ready(m_shard)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_shard["loss"]), rtol=2e-4
    )
    # updated params track single-device within the adam step bound: the
    # dp-psum reduction order perturbs near-zero gradients, and adam's
    # m/sqrt(v) normalization can flip those params' first-step DIRECTION,
    # so the honest bound is a couple of lr (=1e-3), not float noise
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=0
        ),
        ref_state.params, new_state.params,
    )
    # a second step from the updated states must also agree — wrong
    # updates compound, reduction noise does not
    _, m2_single = step(ref_state, x, pids, adj, jax.random.PRNGKey(9))
    with mesh:
        new_state2, m2_shard = step(new_state, xs, pidss, adjs, jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        float(m2_single["loss"]), float(m2_shard["loss"]), rtol=5e-3
    )
    # the tp placement survives the steps — epoch 2 starts sharded
    assert len(mp_sharded_leaves(new_state2.params)) == n_params_mp
    assert len(mp_sharded_leaves(new_state2.opt_state)) == 2 * n_params_mp


def test_mesh_placement_handles_every_optimizer_state():
    """The CLI maps the param_shardings shape rule over WHATEVER pytree
    the chosen optimizer keeps (adam moments, sgd trace, adabound/radam
    custom states, schedule counts) — every registered optimizer's state
    must place onto the mesh without error, with moment-like leaves
    sharded alongside their kernels."""
    from jax.sharding import PartitionSpec as P

    from agrl_tpu.optim.optimizers import OPTIMIZER_NAMES
    from agrl_tpu.parallel import put_sharded_tree

    mesh = make_mesh(dp=4, mp=2)
    params = {
        "wide": jnp.zeros((64, 64)),   # > min_size, mp-divisible: shards
        "bias": jnp.zeros((64,)),
    }
    for name in OPTIMIZER_NAMES:
        tx = init_optim(name, 1e-3, weight_decay=5e-4, base_lr=1e-3)
        opt_state = tx.init(params)
        placed = put_sharded_tree(
            opt_state, param_shardings(mesh, opt_state, min_size=1024)
        )
        # momentum/variance leaves mirror the kernel shape, so the rule
        # must shard them over mp (sgd without momentum would have none,
        # but every registered optimizer here keeps at least one)
        mp_leaves = [
            l for l in jax.tree.leaves(placed)
            if isinstance(l, jax.Array) and l.sharding.spec == P(None, "mp")
        ]
        assert mp_leaves, f"{name}: no moment leaf sharded over mp"
        # and a gradient step through the placed state stays consistent
        grads = jax.tree.map(jnp.ones_like, params)
        with mesh:
            updates, _ = tx.update(grads, placed, params)
        assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(updates))


@pytest.mark.heavy
def test_bf16_train_step_matches_f32_and_stays_finite():
    """Mixed-precision (--bf16-train) guard: the bf16-backbone train step
    must produce finite losses tracking the f32 step within bf16 noise
    for several steps (the hardware NaNs of round 2 motivated this)."""
    import numpy as np

    from agrl_tpu.engine import create_train_state, make_train_step
    from agrl_tpu.models import init_model
    from agrl_tpu.optim import init_optim

    B, S, H, W = 4, 6, 64, 32  # consistent loss needs seq_len >= 5
    losses = {}
    for label, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        rng = np.random.RandomState(0)  # identical batch for both dtypes
        model = init_model(
            "vmgn_tiny", num_classes=2, loss={"xent", "htri"}, num_split=4,
            pyramid_part=True, num_gb=1, use_pose=True, learn_graph=True,
            consistent_loss=True, dtype=dtype,
        )
        tx = init_optim("adam", 1e-4, weight_decay=5e-4)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0), seq_len=S, height=H, width=W,
            batch_size=2,
        )
        V = S * model.total_split
        xu8 = jnp.asarray(rng.randint(0, 256, (B, S, H, W, 3)), jnp.uint8)
        adj = jnp.asarray((np.random.RandomState(1).rand(B, V, V) > 0.5), jnp.float32)
        pids = jnp.asarray([0, 0, 1, 1])
        step = make_train_step(model, tx, aug=dict(flip_aug=True), donate=False)
        traj = []
        for i in range(4):
            state, m = step(state, xu8, pids, adj, jax.random.PRNGKey(i))
            traj.append(float(m["loss"]))
        losses[label] = traj
    for tr in losses.values():
        assert all(np.isfinite(v) for v in tr), losses
    # same trajectory within mixed-precision noise
    np.testing.assert_allclose(
        losses["f32"], losses["bf16"], rtol=0.05, atol=0.05
    )


@pytest.mark.heavy
def test_remat_step_matches_plain_step():
    """--remat must change memory behavior only: with identical state,
    batch and rng, each policy's updated params and metrics equal the
    plain step's bit-for-bit on CPU (the recomputed forward is the same
    program, not an approximation)."""
    import pytest

    model = tiny_vmgn()
    tx = init_optim("adam", 1e-3, weight_decay=0.0)
    x, pids, adj = make_batch(np.random.RandomState(3))
    rng = jax.random.PRNGKey(7)

    def one_step(remat):
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0), seq_len=8, height=32, width=32
        )
        step = make_train_step(model, tx, donate=False, remat=remat)
        return step(state, x, pids, adj, rng)

    state0, metrics0 = one_step("none")
    for policy in ("dots", "full"):
        state_r, metrics_r = one_step(policy)
        for k in metrics0:
            np.testing.assert_array_equal(
                np.asarray(metrics0[k]), np.asarray(metrics_r[k]), err_msg=k
            )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            state0.params,
            state_r.params,
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            state0.batch_stats,
            state_r.batch_stats,
        )

    # validation happens at factory time, before any step runs
    with pytest.raises(ValueError, match="remat"):
        make_train_step(model, tx, remat="bogus")
