"""Training losses (pure jnp; batched, jit-friendly).

Parity targets in the reference:
  * cross_entropy_label_smooth — torchreid/losses/cross_entropy_loss.py:8-37:
    targets smoothed as (1 - eps) * onehot + eps / K, loss =
    (-targets * log_softmax(logits)).mean(axis=0).sum().
  * batch-hard triplet — torchreid/losses/hard_mine_triplet_loss.py:8-50:
    pairwise Euclidean distances (sqrt of clamped squared distances), per
    anchor the hardest positive (max same-pid distance) and hardest
    negative (min different-pid distance); soft margin
    log(1 + exp(d_ap - d_an)).mean() or margin ranking
    max(0, margin + d_ap - d_an).mean().
  * deep_supervision — torchreid/losses/__init__.py:9-19: mean of the
    criterion over a list of heads.

The hard mining here is fully vectorized with masked max/min (the
reference loops per anchor); agrl_tpu.ops.triplet provides a fused Pallas
kernel for the distance + mining step with this as its parity oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import nn as jnn

__all__ = [
    "cross_entropy_label_smooth",
    "batch_hard_triplet",
    "pairwise_euclidean",
    "hard_mine",
    "deep_supervision",
]


def cross_entropy_label_smooth(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int | None = None,
    epsilon: float = 0.1,
) -> jnp.ndarray:
    """logits: (B, K); labels: (B,) ints. Returns scalar loss."""
    if num_classes is None:
        num_classes = logits.shape[-1]
    log_probs = jnn.log_softmax(logits, axis=1)
    onehot = jnn.one_hot(labels, num_classes, dtype=log_probs.dtype)
    targets = (1.0 - epsilon) * onehot + epsilon / num_classes
    return (-targets * log_probs).mean(axis=0).sum()


def pairwise_euclidean(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D) -> (B, B) Euclidean distances, sqrt-clamped at 1e-12.

    precision=HIGHEST: the quadratic form cancels catastrophically near
    zero distance; on TPU the default bf16 matmul would corrupt the
    hardest-positive mining, so force fp32 accumulation (B is small)."""
    sq = jnp.sum(x * x, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        x, x.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return jnp.sqrt(jnp.clip(d2, min=1e-12))


def hard_mine(dist: jnp.ndarray, labels: jnp.ndarray):
    """Hardest positive / negative distance per anchor (vectorized).

    dist: (B, B); labels: (B,). Returns (d_ap, d_an), each (B,)."""
    pos_mask = labels[:, None] == labels[None, :]
    big = jnp.finfo(dist.dtype).max
    d_ap = jnp.max(jnp.where(pos_mask, dist, -big), axis=1)
    d_an = jnp.min(jnp.where(pos_mask, big, dist), axis=1)
    return d_ap, d_an


def batch_hard_triplet(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.3,
    soft: bool = True,
) -> jnp.ndarray:
    """Batch-hard triplet loss. features: (B, D); labels: (B,)."""
    dist = pairwise_euclidean(features)
    d_ap, d_an = hard_mine(dist, labels)
    if soft:
        # log(1 + exp(d_ap - d_an)), numerically stable softplus
        return jnn.softplus(d_ap - d_an).mean()
    return jnp.maximum(0.0, margin + d_ap - d_an).mean()


def deep_supervision(criterion, xs, y, **kwargs) -> jnp.ndarray:
    """Mean of `criterion(x, y)` over a list/tuple of head outputs."""
    if not isinstance(xs, (list, tuple)):
        xs = [xs]
    total = 0.0
    for x in xs:
        total = total + criterion(x, y, **kwargs)
    return total / len(xs)
