"""Fused batch-hard triplet mining kernel (Pallas TPU).

Fuses the reference's per-batch pipeline (hard_mine_triplet_loss.py:33-45)
— pairwise Euclidean distances + per-anchor hardest-positive /
hardest-negative selection — into one VMEM-resident kernel: the (B, B)
distance matrix never leaves the chip. The jnp twin lives in
agrl_tpu.losses (pairwise_euclidean + hard_mine) and is the parity oracle.

Batches are tiny (P x K <= a few hundred), so a single program handles
the whole batch; B pads to the sublane multiple with label -1 sentinels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(f_ref, labels_ref, out_ref):
    f = f_ref[:]  # (B, D)
    labels = labels_ref[:]  # (B, 1) int32; -1 = padding
    B = f.shape[0]

    sq = jnp.sum(f * f, axis=1, keepdims=True)
    # fp32 accumulation: bf16 MXU noise (~4e-3) can flip hard-mining picks
    gram = jax.lax.dot_general(
        f, f, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32,
    )
    d2 = sq + jnp.transpose(sq) - 2.0 * gram
    dist = jnp.sqrt(jnp.maximum(d2, 1e-12))  # (B, B)

    valid = labels[:, 0] >= 0  # (B,)
    pos = (labels[:, 0][:, None] == labels[:, 0][None, :]) & valid[None, :]
    neg = (~pos) & valid[None, :]

    big = jnp.float32(3.4e38)
    d_ap = jnp.max(jnp.where(pos, dist, -big), axis=1)
    d_an = jnp.min(jnp.where(neg, dist, big), axis=1)
    out_ref[0, :] = d_ap
    out_ref[1, :] = d_an


@partial(jax.jit, static_argnames=("interpret",))
def hard_mine_pallas(features, labels, interpret=False):
    """features: (B, D) f32, labels: (B,) int -> (d_ap, d_an) each (B,)."""
    B, D = features.shape
    B_pad = -(-B // 8) * 8
    if B_pad != B:
        features = jnp.pad(features, ((0, B_pad - B), (0, 0)))
        labels = jnp.pad(labels, (0, B_pad - B), constant_values=-1)
    labels2d = labels.astype(jnp.int32)[:, None]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((2, B_pad), jnp.float32),
        interpret=interpret,
    )(features.astype(jnp.float32), labels2d)
    return out[0, :B], out[1, :B]
