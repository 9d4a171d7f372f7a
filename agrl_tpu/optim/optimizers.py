"""Optimizers (optax) matching the reference's init_optim surface.

Parity targets:
  * init_optim name->optimizer table — torchreid/optimizers.py:7-23:
    adam, amsgrad, sgd (momentum 0.9), nesterov, rmsprop, adabound, radam.
  * AdaBound — torchreid/optimizers.py:26-138: Adam moments with the
    effective per-element rate clamped into [lower, upper] bounds that
    converge to final_lr: lower = final_lr * (1 - 1/(gamma*t + 1)),
    upper = final_lr * (1 + 1/(gamma*t)); final_lr tracks lr decay via
    final_lr * lr_t / base_lr.
  * RAdam — torchreid/optimizers.py:141-211: rectified Adam; SGD-with-
    momentum fallback while the variance rectification term N_sma <= 4.
    (This variant applies DECOUPLED weight decay p -= wd * lr * p, unlike
    the others' L2-into-grad — preserved here.)

All torch optimizers couple weight decay as L2 added to the gradient;
`_l2_weight_decay_schedule` reproduces that, with a schedule so the
driver's --zero-wd switch (torchtools.py:29-33) maps to a step threshold.
"""

from __future__ import annotations

from collections.abc import Callable

import jax
import jax.numpy as jnp
import optax

OPTIMIZER_NAMES = ("adam", "amsgrad", "sgd", "nesterov", "rmsprop", "adabound", "radam")


def _l2_weight_decay_schedule(wd_fn: Callable) -> optax.GradientTransformation:
    """grad += wd(step) * param  (torch-style coupled L2)."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay requires params")
        wd = wd_fn(state.count)
        updates = jax.tree.map(lambda g, p: g + wd * p, updates, params)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def _as_schedule(value) -> Callable:
    if callable(value):
        return value
    return lambda step: value


def amsgrad_torch(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AMSGrad with torch.optim.Adam(amsgrad=True) semantics: the running
    max is over the RAW second moment (bias correction applied after),
    denom = sqrt(v_max)/sqrt(1-b2^t) + eps. (optax.amsgrad maxes the
    bias-corrected moment — trajectories differ.)"""
    lr_fn = _as_schedule(learning_rate)

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return {"count": jnp.zeros([], jnp.int32), "m": zeros(), "v": zeros(), "vmax": zeros()}

    def update(updates, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], updates)
        v = jax.tree.map(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], updates)
        vmax = jax.tree.map(jnp.maximum, state["vmax"], v)
        lr_t = lr_fn(state["count"])
        bias1 = 1 - b1**t
        bias2 = 1 - b2**t

        def step(m_, vm):
            denom = jnp.sqrt(vm) / jnp.sqrt(bias2) + eps
            return -(lr_t / bias1) * m_ / denom

        new_updates = jax.tree.map(step, m, vmax)
        return new_updates, {"count": count, "m": m, "v": v, "vmax": vmax}

    return optax.GradientTransformation(init, update)


def adabound(
    learning_rate,
    base_lr: float,
    final_lr: float = 0.1,
    b1: float = 0.9,
    b2: float = 0.999,
    gamma: float = 1e-3,
    eps: float = 1e-8,
    amsbound: bool = False,
) -> optax.GradientTransformation:
    """AdaBound / AMSBound as an optax transform (no weight decay inside;
    chain with `_l2_weight_decay_schedule`)."""
    lr_fn = _as_schedule(learning_rate)

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        state = {
            "count": jnp.zeros([], jnp.int32),
            "exp_avg": zeros(),
            "exp_avg_sq": zeros(),
        }
        if amsbound:
            state["max_exp_avg_sq"] = zeros()
        return state

    def update(updates, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        exp_avg = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state["exp_avg"], updates
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state["exp_avg_sq"], updates
        )
        new_state = {"count": count, "exp_avg": exp_avg, "exp_avg_sq": exp_avg_sq}
        if amsbound:
            max_sq = jax.tree.map(
                jnp.maximum, state["max_exp_avg_sq"], exp_avg_sq
            )
            new_state["max_exp_avg_sq"] = max_sq
            denom_src = max_sq
        else:
            denom_src = exp_avg_sq

        lr_t = lr_fn(state["count"])
        bias1 = 1 - b1**t
        bias2 = 1 - b2**t
        step_size = lr_t * jnp.sqrt(bias2) / bias1
        # bounds track lr decay: final_lr * lr_t / base_lr
        flr = final_lr * lr_t / base_lr
        lower = flr * (1 - 1 / (gamma * t + 1))
        upper = flr * (1 + 1 / (gamma * t))

        def step(m, v):
            rate = jnp.clip(step_size / (jnp.sqrt(v) + eps), lower, upper)
            return -rate * m

        new_updates = jax.tree.map(step, exp_avg, denom_src)
        return new_updates, new_state

    return optax.GradientTransformation(init, update)


def radam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay=0.0,
) -> optax.GradientTransformation:
    """Rectified Adam matching the reference variant, including its
    decoupled weight decay (p -= wd * lr * p) and its SGD fallback when
    the rectification term N_sma <= 4 (<= 5 disables the rectified step
    size; the two thresholds differ in the reference — preserved).
    `weight_decay` may be a step schedule (--zero-wd support)."""
    lr_fn = _as_schedule(learning_rate)
    wd_fn = _as_schedule(weight_decay)

    def init(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)  # noqa: E731
        return {
            "count": jnp.zeros([], jnp.int32),
            "exp_avg": zeros(),
            "exp_avg_sq": zeros(),
        }

    def update(updates, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        exp_avg = jax.tree.map(
            lambda m, g: b1 * m + (1 - b1) * g, state["exp_avg"], updates
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state["exp_avg_sq"], updates
        )
        lr_t = lr_fn(state["count"])
        beta2_t = b2**t
        n_sma_max = 2.0 / (1 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1 - beta2_t)

        rect = jnp.sqrt(
            (1 - beta2_t)
            * (n_sma - 4)
            / (n_sma_max - 4)
            * (n_sma - 2)
            / n_sma
            * n_sma_max
            / (n_sma_max - 2)
        )
        step_rect = lr_t * rect / (1 - b1**t)
        step_plain = lr_t / (1 - b1**t)
        use_adam = n_sma > 4.0
        # reference computes the rectified step only when N_sma > 5 but
        # switches the update form at N_sma > 4; in practice N_sma crosses
        # both within one step for b2=0.999. Guard NaN for n_sma <= 4.
        step_size = jnp.where(n_sma > 5.0, step_rect, step_plain)

        wd_t = wd_fn(state["count"])

        def upd(m, v, p):
            adam_step = -step_size * m / (jnp.sqrt(v) + eps)
            sgd_step = -step_plain * m
            out = jnp.where(use_adam, adam_step, sgd_step)
            if p is not None:
                out = out - wd_t * lr_t * p
            return out

        if params is None:
            params = jax.tree.map(lambda m: None, exp_avg)
        new_updates = jax.tree.map(upd, exp_avg, exp_avg_sq, params)
        return new_updates, {
            "count": count,
            "exp_avg": exp_avg,
            "exp_avg_sq": exp_avg_sq,
        }

    return optax.GradientTransformation(init, update)


def init_optim(
    optim: str,
    learning_rate,
    weight_decay=0.0,
    momentum: float = 0.9,
    base_lr: float | None = None,
) -> optax.GradientTransformation:
    """Build an optimizer by name. `learning_rate` and `weight_decay` may
    be floats or step schedules (use agrl_tpu.optim.schedules.per_step to
    drive them from epoch schedules)."""
    lr_fn = _as_schedule(learning_rate)
    wd_fn = _as_schedule(weight_decay)
    if base_lr is None:
        if optim == "adabound" and callable(learning_rate):
            # lr_fn(0) under a warmup schedule is warmup_factor * lr, which
            # would inflate adabound's bound ratio by 1/warmup_factor; torch
            # records base_lrs at optimizer construction, BEFORE schedulers
            raise ValueError(
                "adabound with an lr schedule needs base_lr= "
                "(the pre-schedule learning rate)"
            )
        base_lr = float(lr_fn(0))

    l2 = _l2_weight_decay_schedule(wd_fn)

    if optim == "adam":
        core = optax.adam(lr_fn, b1=0.9, b2=0.999, eps=1e-8)
    elif optim == "amsgrad":
        core = amsgrad_torch(lr_fn, b1=0.9, b2=0.999, eps=1e-8)
    elif optim == "sgd":
        core = optax.sgd(lr_fn, momentum=momentum, nesterov=False)
    elif optim == "nesterov":
        core = optax.sgd(lr_fn, momentum=momentum, nesterov=True)
    elif optim == "rmsprop":
        # torch defaults: alpha (decay) 0.99, eps 1e-8. eps goes OUTSIDE
        # the sqrt (sqrt(v) + eps) like torch — optax's default
        # sqrt(v + eps) takes ~1000x smaller steps for tiny gradients
        core = optax.rmsprop(
            lr_fn, decay=0.99, eps=1e-8, eps_in_sqrt=False, momentum=momentum
        )
    elif optim == "adabound":
        # the reference wires final_lr = 100 * lr (optimizers.py:19)
        core = adabound(lr_fn, base_lr=base_lr, final_lr=100.0 * base_lr)
    elif optim == "radam":
        # radam applies its own decoupled decay; no L2 chain
        return radam(lr_fn, weight_decay=wd_fn)
    else:
        raise KeyError(f"Unsupported optimizer: {optim}. Choices: {OPTIMIZER_NAMES}")

    return optax.chain(l2, core)
