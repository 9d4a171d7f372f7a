"""Functional training state (params + BN stats + optimizer state)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from agrl_tpu.models import init_params


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    seq_len: int = 8,
    height: int = 256,
    width: int = 128,
    batch_size: int = 2,
) -> TrainState:
    variables = init_params(
        model, rng, seq_len=seq_len, height=height, width=width, batch_size=batch_size
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
