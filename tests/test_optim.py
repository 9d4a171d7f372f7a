"""Optimizer/schedule parity tests: trajectories vs torch optimizers and
vs the reference AdaBound/RAdam update rules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.optim import init_optim, multistep_lr, per_step, warmup_multistep_lr

torch = pytest.importorskip("torch")


def run_optax(opt, x0, grads):
    params = {"w": jnp.asarray(x0)}
    state = opt.init(params)
    traj = []
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        traj.append(np.asarray(params["w"]))
    return traj


def run_torch(optimizer_fn, x0, grads):
    p = torch.nn.Parameter(torch.tensor(x0))
    opt = optimizer_fn([p])
    traj = []
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
        traj.append(p.detach().numpy().copy())
    return traj


def make_problem(n_steps=10, dim=5, seed=0):
    rng = np.random.RandomState(seed)
    x0 = rng.randn(dim).astype(np.float32)
    grads = [rng.randn(dim).astype(np.float32) for _ in range(n_steps)]
    return x0, grads


@pytest.mark.parametrize(
    "name,torch_fn",
    [
        ("adam", lambda ps: torch.optim.Adam(ps, lr=1e-3, weight_decay=5e-4)),
        ("amsgrad", lambda ps: torch.optim.Adam(ps, lr=1e-3, weight_decay=5e-4, amsgrad=True)),
        ("sgd", lambda ps: torch.optim.SGD(ps, lr=1e-2, momentum=0.9, weight_decay=5e-4)),
        (
            "nesterov",
            lambda ps: torch.optim.SGD(ps, lr=1e-2, momentum=0.9, weight_decay=5e-4, nesterov=True),
        ),
    ],
)
def test_trajectory_matches_torch(name, torch_fn):
    x0, grads = make_problem()
    lr = 1e-2 if "sgd" in name or name == "nesterov" else 1e-3
    opt = init_optim(name, lr, weight_decay=5e-4)
    got = run_optax(opt, x0, grads)
    want = run_torch(torch_fn, x0, grads)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def test_rmsprop_matches_torch():
    x0, grads = make_problem()
    opt = init_optim("rmsprop", 1e-3, weight_decay=5e-4, momentum=0.9)
    got = run_optax(opt, x0, grads)
    want = run_torch(
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, alpha=0.99, eps=1e-8, weight_decay=5e-4, momentum=0.9),
        x0,
        grads,
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


def reference_adabound_step(x, m, v, g, t, lr, base_lr, wd=0.0, final_lr=0.1,
                            b1=0.9, b2=0.999, gamma=1e-3, eps=1e-8):
    """Transcription of the reference AdaBound update (optimizers.py:82-137)."""
    g = g + wd * x
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    denom = np.sqrt(v) + eps
    bias1 = 1 - b1**t
    bias2 = 1 - b2**t
    step_size = lr * np.sqrt(bias2) / bias1
    flr = final_lr * lr / base_lr
    lower = flr * (1 - 1 / (gamma * t + 1))
    upper = flr * (1 + 1 / (gamma * t))
    step = np.clip(step_size / denom, lower, upper) * m
    return x - step, m, v


def test_adabound_matches_reference_rule():
    x0, grads = make_problem(n_steps=8)
    opt = init_optim("adabound", 1e-3, weight_decay=5e-4)
    got = run_optax(opt, x0, grads)
    x, m, v = x0.astype(np.float64), np.zeros_like(x0, np.float64), np.zeros_like(x0, np.float64)
    for t, g in enumerate(grads, start=1):
        x, m, v = reference_adabound_step(x, m, v, g.astype(np.float64), t, 1e-3, 1e-3, wd=5e-4)
        np.testing.assert_allclose(got[t - 1], x, atol=1e-6)


def reference_radam_step(x, m, v, g, t, lr, wd=0.0, b1=0.9, b2=0.999, eps=1e-8):
    """Transcription of the reference RAdam update (optimizers.py:160-209)."""
    v = b2 * v + (1 - b2) * g * g
    m = b1 * m + (1 - b1) * g
    beta2_t = b2**t
    n_max = 2 / (1 - b2) - 1
    n_sma = n_max - 2 * t * beta2_t / (1 - beta2_t)
    if n_sma > 5:
        step_size = lr * np.sqrt(
            (1 - beta2_t) * (n_sma - 4) / (n_max - 4) * (n_sma - 2) / n_sma * n_max / (n_max - 2)
        ) / (1 - b1**t)
    else:
        step_size = lr / (1 - b1**t)
    if wd != 0:
        x = x - wd * lr * x
    if n_sma > 4:
        x = x - step_size * m / (np.sqrt(v) + eps)
    else:
        x = x - step_size * m
    return x, m, v


def test_radam_matches_reference_rule():
    x0, grads = make_problem(n_steps=12)
    opt = init_optim("radam", 1e-3, weight_decay=5e-4)
    got = run_optax(opt, x0, grads)
    x, m, v = x0.astype(np.float64), np.zeros_like(x0, np.float64), np.zeros_like(x0, np.float64)
    for t, g in enumerate(grads, start=1):
        x, m, v = reference_radam_step(x, m, v, g.astype(np.float64), t, 1e-3, wd=5e-4)
        np.testing.assert_allclose(got[t - 1], x, atol=1e-6)


def test_unknown_optimizer_raises():
    with pytest.raises(KeyError):
        init_optim("lamb", 1e-3)


class TestSchedules:
    def test_multistep(self):
        s = multistep_lr(0.1, [50, 100, 150], gamma=0.1)
        assert s(0) == pytest.approx(0.1)
        assert s(49) == pytest.approx(0.1)
        assert s(50) == pytest.approx(0.01)
        assert s(149) == pytest.approx(0.01 * 0.1)
        assert s(151) == pytest.approx(0.1 * 0.1**3)
        # traced variant agrees
        assert float(s(jnp.asarray(50))) == pytest.approx(0.01)

    def test_warmup_linear(self):
        s = warmup_multistep_lr(0.1, [100], gamma=0.1, warmup_factor=0.01, warmup_iters=10)
        assert s(0) == pytest.approx(0.1 * 0.01)
        # linear interp at epoch 5: factor = 0.01*0.5 + 0.5
        assert s(5) == pytest.approx(0.1 * (0.01 * 0.5 + 0.5))
        assert s(10) == pytest.approx(0.1)
        assert s(100) == pytest.approx(0.01)
        assert float(s(jnp.asarray(5))) == pytest.approx(0.1 * (0.01 * 0.5 + 0.5))

    def test_warmup_constant(self):
        s = warmup_multistep_lr(
            0.1, [100], warmup_factor=0.5, warmup_iters=10, warmup_method="constant"
        )
        assert s(3) == pytest.approx(0.05)
        assert s(10) == pytest.approx(0.1)

    def test_per_step(self):
        s = per_step(multistep_lr(0.1, [2]), steps_per_epoch=5)
        assert s(9) == pytest.approx(0.1)
        assert s(10) == pytest.approx(0.01)

    def test_milestones_must_increase(self):
        with pytest.raises(ValueError):
            warmup_multistep_lr(0.1, [100, 50])

    def test_zero_wd_schedule(self):
        # --zero-wd semantics: weight decay off from a given step
        x0, grads = make_problem(n_steps=6)
        wd_fn = lambda step: jnp.where(step < 3, 5e-4, 0.0)  # noqa: E731
        opt = init_optim("adam", 1e-3, weight_decay=wd_fn)
        got = run_optax(opt, x0, grads)
        assert len(got) == 6

    def test_zero_wd_schedule_radam(self):
        # radam must honor the wd schedule too (decoupled decay)
        x0, grads = make_problem(n_steps=6)
        big_wd = 0.5  # large so the decay visibly changes the trajectory
        wd_fn = lambda step: jnp.where(step < 3, big_wd, 0.0)  # noqa: E731
        got_sched = run_optax(init_optim("radam", 1e-3, weight_decay=wd_fn), x0, grads)
        got_const = run_optax(init_optim("radam", 1e-3, weight_decay=big_wd), x0, grads)
        # identical while wd active...
        np.testing.assert_allclose(got_sched[2], got_const[2], atol=1e-7)
        # ...diverging once the schedule zeroes it
        assert np.abs(got_sched[5] - got_const[5]).max() > 1e-6


def test_amsbound_differs_from_adabound_and_descends():
    from agrl_tpu.optim import adabound

    x0, grads = make_problem(n_steps=8)
    a = run_optax(
        __import__("optax").chain(adabound(1e-3, base_lr=1e-3, amsbound=False)), x0, grads
    )
    b = run_optax(
        __import__("optax").chain(adabound(1e-3, base_lr=1e-3, amsbound=True)), x0, grads
    )
    assert np.isfinite(a[-1]).all() and np.isfinite(b[-1]).all()
    # variants agree initially (max == current second moment early on is
    # possible) but must both update parameters
    assert not np.allclose(a[-1], x0)
    assert not np.allclose(b[-1], x0)


# ---------------------------------------------------------------------------
# trajectory parity against the ACTUAL reference optimizer classes
# (torchreid/optimizers.py AdaBound/RAdam), not just rule transcriptions
# ---------------------------------------------------------------------------


def _import_reference_optimizers():
    import importlib
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        return importlib.import_module("torchreid.optimizers")
    finally:
        sys.path.remove("/root/reference")


@pytest.mark.parametrize("wd", [0.0, 5e-4])
def test_adabound_trajectory_matches_reference_class(wd):
    ref = _import_reference_optimizers()
    x0, grads = make_problem(n_steps=12, seed=3)
    opt = init_optim("adabound", 1e-3, weight_decay=wd, base_lr=1e-3)
    got = run_optax(opt, x0, grads)
    want = run_torch(lambda ps: ref.AdaBound(ps, lr=1e-3, weight_decay=wd), x0, grads)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("wd", [0.0, 5e-4])
def test_radam_trajectory_matches_reference_class(wd):
    ref = _import_reference_optimizers()
    x0, grads = make_problem(n_steps=12, seed=4)
    opt = init_optim("radam", 1e-3, weight_decay=wd)
    got = run_optax(opt, x0, grads)
    want = run_torch(lambda ps: ref.RAdam(ps, lr=1e-3, weight_decay=wd), x0, grads)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=1e-5)


def test_amsbound_trajectory_matches_reference_class():
    # amsbound is not an init_optim name (the reference registry has no
    # entry either, optimizers.py:7-23); it's the AdaBound flag
    from agrl_tpu.optim.optimizers import adabound

    ref = _import_reference_optimizers()
    x0, grads = make_problem(n_steps=12, seed=5)
    opt = adabound(1e-3, base_lr=1e-3, amsbound=True)
    got = run_optax(opt, x0, grads)
    want = run_torch(
        lambda ps: ref.AdaBound(ps, lr=1e-3, amsbound=True), x0, grads
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("method", ["linear", "constant"])
def test_warmup_multistep_matches_reference_scheduler(method):
    """LR sequence vs the reference WarmupMultiStepLR class itself
    (torchreid/lr_scheduler.py:9-51), stepped epoch by epoch."""
    import importlib
    import sys

    sys.path.insert(0, "/root/reference")
    try:
        ref_mod = importlib.import_module("torchreid.lr_scheduler")
    finally:
        sys.path.remove("/root/reference")

    base_lr, milestones, gamma = 1e-4, [50, 100, 150], 0.1
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    sched = ref_mod.WarmupMultiStepLR(
        opt, milestones, gamma=gamma, warmup_factor=0.01, warmup_iters=10,
        warmup_method=method,
    )
    ours = warmup_multistep_lr(
        base_lr, milestones, gamma=gamma, warmup_factor=0.01, warmup_iters=10,
        warmup_method=method,
    )
    for epoch in range(200):
        want = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(ours(epoch)), want, rtol=1e-10), epoch
        # traced-array branch must agree with the python branch
        np.testing.assert_allclose(
            float(ours(jnp.asarray(epoch))), want, rtol=1e-6
        )
        sched.step()


def test_rmsprop_small_gradients_match_torch():
    """torch RMSprop adds eps OUTSIDE the sqrt (sqrt(v) + eps); with tiny
    gradients the eps placement changes the step by ~1000x."""
    rng = np.random.RandomState(3)
    x0 = rng.randn(5).astype(np.float32)
    grads = [(rng.randn(5) * 1e-6).astype(np.float32) for _ in range(8)]
    opt = init_optim("rmsprop", 1e-3, weight_decay=0.0, momentum=0.9)
    got = run_optax(opt, x0, grads)
    want = run_torch(
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3, momentum=0.9), x0, grads
    )
    np.testing.assert_allclose(got[-1], want[-1], rtol=1e-4, atol=1e-7)


def test_adabound_final_lr_wiring_matches_reference_init_optim():
    """The reference's init_optim wires final_lr = 100 * lr
    (optimizers.py:19); at lr != 1e-3 the default final_lr=0.1 diverges."""
    x0, grads = make_problem(n_steps=12, seed=4)
    lr = 3e-4  # the driver default, where final_lr=0.1 would be 3.33x off
    opt = init_optim("adabound", lr, weight_decay=5e-4)
    got = run_optax(opt, x0, grads)
    x = x0.astype(np.float64)
    m = np.zeros_like(x)
    v = np.zeros_like(x)
    for t, g in enumerate(grads, start=1):
        x, m, v = reference_adabound_step(
            x, m, v, g.astype(np.float64), t, lr, lr, wd=5e-4, final_lr=100 * lr
        )
    np.testing.assert_allclose(got[-1], x, rtol=1e-5, atol=1e-7)


def test_adabound_schedule_requires_base_lr():
    sched = warmup_multistep_lr(3e-4, [50], warmup_factor=0.01, warmup_iters=10)
    with pytest.raises(ValueError, match="base_lr"):
        init_optim("adabound", per_step(sched, steps_per_epoch=10))
    init_optim("adabound", per_step(sched, steps_per_epoch=10), base_lr=3e-4)
