"""Learning-rate schedules (epoch-indexed, like the reference).

Parity targets:
  * multistep_lr       — torch MultiStepLR (re-exported by the reference at
    torchreid/lr_scheduler.py:6): lr = base * gamma^(#milestones <= epoch).
  * warmup_multistep_lr — torchreid/lr_scheduler.py:9-51: linear or constant
    warmup for `warmup_iters` epochs (driver wires warmup_factor=0.01,
    warmup_iters=10, train_vidreid_xent_htri.py:276-277), multiplied by the
    multistep decay.

The reference steps its scheduler once per EPOCH; `per_step` converts an
epoch schedule to an optax per-update-step schedule.

Deliberate deviation: this schedule decays AT the milestone epoch
(epoch 50 of `--stepsize 50 ...` already uses the decayed lr). torch's
post-1.1 `scheduler.step(epoch)` called after each epoch effectively
applies the decay from milestone+1 — a one-epoch offset with no
practical effect over 50-epoch stages."""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Callable, Sequence

import jax.numpy as jnp


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1):
    """Epoch -> lr. Works with both Python ints and traced arrays."""
    milestones = sorted(milestones)

    def schedule(epoch):
        if isinstance(epoch, (int, float)):
            return base_lr * gamma ** bisect_right(milestones, epoch)
        ms = jnp.asarray(milestones)
        power = jnp.sum(ms <= epoch)
        return base_lr * gamma**power

    return schedule


def warmup_multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    """Epoch -> lr with warmup, matching WarmupMultiStepLR.get_lr()."""
    if list(milestones) != sorted(milestones):
        raise ValueError(f"Milestones must be increasing, got {milestones}")
    if warmup_method not in ("constant", "linear"):
        raise ValueError(f"Unknown warmup method: {warmup_method}")
    decay = multistep_lr(base_lr, milestones, gamma)

    def schedule(epoch):
        if isinstance(epoch, (int, float)):
            factor = 1.0
            if epoch < warmup_iters:
                if warmup_method == "constant":
                    factor = warmup_factor
                else:
                    alpha = epoch / warmup_iters
                    factor = warmup_factor * (1 - alpha) + alpha
            return decay(epoch) * factor
        alpha = epoch / warmup_iters
        lin = warmup_factor * (1 - alpha) + alpha
        factor = jnp.where(
            epoch < warmup_iters,
            lin if warmup_method == "linear" else warmup_factor,
            1.0,
        )
        return decay(epoch) * factor

    return schedule


def per_step(epoch_schedule: Callable, steps_per_epoch: int):
    """Convert an epoch-indexed schedule into an optax step schedule."""

    def schedule(step):
        return epoch_schedule(step // steps_per_epoch)

    return schedule
