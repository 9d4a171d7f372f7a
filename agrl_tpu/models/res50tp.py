"""ResNet50-TP — part pooling + norm-based temporal attention + BNNeck.

Behavioral parity with reference torchreid/models/res50tp.py:111-235:
4-part pooling, temporal attention weights = L1-normalized per-part
feature norms over frames, weighted sum, average over parts, BNNeck ->
classifier. Eval feature = the 2048-d bottleneck output.

`resnet50_s1` (reference models/resnet50_s1.py:109-228) is the plain
variant: global average pooling per frame, per-frame BNNeck, train
logits/features and eval features are the FRAME MEANS.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from agrl_tpu.models.backbone import (
    Bottleneck,
    ResLayer,
    ResNetTrunk,
    adaptive_avg_pool_matrix,
)
from agrl_tpu.models.layers import BNNeck, graph_linear_init, l1_normalize


class ResNet50TP(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent", "htri"})
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    parts: int = 4
    feature_dim: int = 2048

    # eval forward accepts frame_mask: enables the fixed-shape bucketing
    # of `--test-sample all` (engine/evaluator.py; see VMGN for contract)
    supports_frame_mask = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, adj=None, *, train: bool = False,
        frame_mask: jnp.ndarray | None = None,
    ):
        B, S, H, W, C = x.shape
        x = x.reshape(B * S, H, W, C)
        x = ResNetTrunk(Bottleneck, self.layers, name="trunk")(x, train=train)
        fmap = ResLayer(
            Bottleneck, 512, self.layers[3], stride=self.last_stride, name="layer4"
        )(x, train=train)
        _, h, w, c = fmap.shape

        v_g = jnp.einsum(
            "nh,bhc->bnc", adaptive_avg_pool_matrix(h, self.parts), fmap.mean(axis=2)
        ).reshape(B, S, self.parts, c)
        att = jnp.linalg.norm(v_g, axis=3, keepdims=True)
        if frame_mask is not None:
            assert not train, "frame_mask is an eval-only contract (batch BN mixes rows)"
            # padding frames weigh exactly 0 in the temporal fusion
            att = att * frame_mask.astype(jnp.float32)[:, :, None, None]
        t_a = l1_normalize(att, axis=1)
        f = (v_g * t_a).sum(axis=1).mean(axis=1)  # (B, c)

        bn = BNNeck(name="bottleneck")(f, train=train)
        if not train:
            return bn
        y = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=graph_linear_init, name="classifier"
        )(bn)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, f
        raise KeyError(f"Unsupported loss: {self.loss}")


class ResNet50S1(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent", "htri"})
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    feature_dim: int = 2048

    # eval forward accepts frame_mask: enables the fixed-shape bucketing
    # of `--test-sample all` (engine/evaluator.py; see VMGN for contract)
    supports_frame_mask = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, adj=None, *, train: bool = False,
        frame_mask: jnp.ndarray | None = None,
    ):
        B, S, H, W, C = x.shape
        if frame_mask is not None:
            assert not train, "frame_mask is an eval-only contract (batch BN mixes rows)"
        x = x.reshape(B * S, H, W, C)
        x = ResNetTrunk(Bottleneck, self.layers, name="trunk")(x, train=train)
        fmap = ResLayer(
            Bottleneck, 512, self.layers[3], stride=self.last_stride, name="layer4"
        )(x, train=train)
        f = fmap.mean(axis=(1, 2))  # (B*S, c)
        bn = BNNeck(name="bottleneck")(f, train=train)

        if not train:
            bnr = bn.reshape(B, S, -1)
            if frame_mask is not None:
                # masked frame mean: eval BN is per-element, so padding
                # rows never touch real ones
                fm = frame_mask.astype(jnp.float32)
                return (bnr * fm[:, :, None]).sum(axis=1) / fm.sum(axis=1)[:, None]
            return bnr.mean(axis=1)
        f_mean = f.reshape(B, S, -1).mean(axis=1)
        y = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=graph_linear_init, name="classifier"
        )(bn).reshape(B, S, -1).mean(axis=1)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, f_mean
        raise KeyError(f"Unsupported loss: {self.loss}")


def res50tp(num_classes=100, loss={"xent", "htri"}, last_stride=1, **kwargs):
    return ResNet50TP(num_classes=num_classes, loss=frozenset(loss), last_stride=last_stride)


def resnet50_s1(num_classes=100, loss={"xent", "htri"}, last_stride=1, **kwargs):
    return ResNet50S1(num_classes=num_classes, loss=frozenset(loss), last_stride=last_stride)
