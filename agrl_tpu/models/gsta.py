"""GSTA — single-branch ancestor of VMGN.

Behavioral parity with reference torchreid/models/gsta.py:173-359:
  * ResNet-50 trunk with layer4 stride hardcoded to 1 (gsta.py:191);
  * pyramid part pooling -> (B, S * total_split, 2048) vertices -> num_gb
    adaptive graph layers -> temporal attention -> mean over parts ->
    one BNNeck + classifier;
  * eval feature = the 2048-d bottleneck output (gsta.py:309-310);
  * consistent loss drops ONE random frame PER SAMPLE (per-batch-element
    indices, gsta.py:295-307) and reuses the same head;
  * train returns ([y, sy], [f_g, sf_g]) with consistent loss, else
    (y, f_g).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from agrl_tpu.models.backbone import (
    Bottleneck,
    ResLayer,
    ResNetTrunk,
    adaptive_avg_pool_matrix,
)
from agrl_tpu.models.layers import (
    BNNeck,
    GraphConvLayer,
    graph_linear_init,
    temporal_attention,
)
from agrl_tpu.utils.reidtools import calc_splits


def drop_one_frame_per_sample(f: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """(B, S, P, C) -> (B, S-1, P, C): per sample, remove one random frame
    keeping temporal order (gsta.py:297-303)."""
    B, S = f.shape[0], f.shape[1]
    drop = jax.random.randint(key, (B,), 0, S)  # frame to remove per sample
    base = jnp.arange(S - 1)[None, :]  # (1, S-1)
    idx = base + (base >= drop[:, None])  # skip the dropped frame
    return jnp.take_along_axis(f, idx[:, :, None, None], axis=1)


class GSTA(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent", "htri"})
    layers: Sequence[int] = (3, 4, 6, 3)
    num_split: int = 4
    pyramid_part: bool = True
    num_gb: int = 2
    use_pose: bool = True
    learn_graph: bool = True
    consistent_loss: bool = False
    dist_method: str = "l2"
    feature_dim: int = 2048
    # mixed precision: compute dtype for the conv backbone (like VMGN);
    # graph layers / heads / losses stay f32
    dtype: Any = None

    @property
    def total_split_list(self):
        return calc_splits(self.num_split) if self.pyramid_part else [self.num_split]

    @property
    def total_split(self):
        return sum(self.total_split_list)

    # eval forward accepts frame_mask: enables the fixed-shape bucketing
    # of `--test-sample all` (engine/evaluator.py; see VMGN for contract)
    supports_frame_mask = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, adj: jnp.ndarray, *, train: bool = False,
        frame_mask: jnp.ndarray | None = None,
    ):
        B, S, H, W, C = x.shape
        x = x.reshape(B * S, H, W, C)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = ResNetTrunk(Bottleneck, self.layers, dtype=self.dtype, name="trunk")(
            x, train=train
        )
        fmap = ResLayer(Bottleneck, 512, self.layers[3], stride=1,
                        dtype=self.dtype, name="layer4")(x, train=train)
        if self.dtype is not None:
            fmap = fmap.astype(jnp.float32)
        _, h, w, c = fmap.shape

        if frame_mask is not None:
            assert not train, "frame_mask is an eval-only contract (batch BN mixes rows)"
            fm = frame_mask.astype(jnp.float32)  # (B, S)
            vmask = jnp.repeat(fm, self.total_split, axis=1)  # frame-major
        else:
            fm = vmask = None

        fw = fmap.mean(axis=2)  # pool width
        v_parts = [
            jnp.einsum("nh,bhc->bnc", adaptive_avg_pool_matrix(h, n), fw)
            for n in self.total_split_list
        ]
        f = jnp.concatenate(v_parts, axis=1).reshape(B, S * self.total_split, c)

        for i in range(self.num_gb):
            f = GraphConvLayer(
                in_features=self.feature_dim,
                out_features=self.feature_dim,
                use_pose=self.use_pose,
                learn_graph=self.learn_graph,
                dist_method=self.dist_method,
                name=f"graph_layer_{i}",
            )(f, adj, train=train, vertex_mask=vmask)
        f = f.reshape(B, S, self.total_split, c)

        bottleneck = BNNeck(name="bottleneck")
        # N(0, 0.01): gsta never applies weights_init_classifier — its
        # classifier comes from _init_params' blanket Linear rule
        # (reference gsta.py:235-248), unlike vmgn's 0.001 heads
        classifier = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=graph_linear_init,
            name="classifier",
        )

        f_g = temporal_attention(f, frame_mask=fm).mean(axis=1)
        bn = bottleneck(f_g, train=train)

        if not train:
            return bn

        y = classifier(bn)
        if self.consistent_loss:
            sf = drop_one_frame_per_sample(f, self.make_rng("subclip"))
            sf_g = temporal_attention(sf).mean(axis=1)
            sy = classifier(bottleneck(sf_g, train=train))

        if self.loss == frozenset({"xent"}):
            return [y, sy] if self.consistent_loss else y
        if self.loss == frozenset({"xent", "htri"}):
            if self.consistent_loss:
                return [y, sy], [f_g, sf_g]
            return y, f_g
        raise KeyError(f"Unsupported loss: {self.loss}")


def gsta(
    num_classes,
    loss={"xent", "htri"},
    last_stride=1,
    num_split=4,
    num_gb=2,
    num_scale=1,
    pyramid_part=True,
    use_pose=True,
    learn_graph=True,
    consistent_loss=False,
    dtype=None,
    **kwargs,
):
    del last_stride, num_scale  # layer4 stride hardcoded 1 (gsta.py:191)
    return GSTA(
        num_classes=num_classes,
        loss=frozenset(loss),
        layers=(3, 4, 6, 3),
        num_split=num_split,
        pyramid_part=pyramid_part,
        num_gb=num_gb,
        use_pose=use_pose,
        learn_graph=learn_graph,
        consistent_loss=consistent_loss,
        dtype=dtype,
    )
