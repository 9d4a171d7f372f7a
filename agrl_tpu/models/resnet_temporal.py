"""Temporal-aggregation baselines (legacy family).

Behavioral parity with reference torchreid/models/resnet_temporal.py
(ResNet50TP / ResNet50TA / ResNet50RNN — unregistered legacy baselines):
  * TP:  per-frame global pooling, temporal MEAN (":23-44").
  * TA:  attention scores from a (h, w)-kernel conv to 256-d + temporal
    conv (kernel 3) to scalars; softmax (or sigmoid+L1) over frames;
    weighted sum of per-frame features (":61-97").
  * RNN: single-layer LSTM (hidden 512) over per-frame features; temporal
    mean of the outputs (":100-133").
Input: (B, T, H, W, 3) clips.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from agrl_tpu.models.backbone import Bottleneck, ResNetBackbone
from agrl_tpu.models.layers import (
    l1_normalize,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)


def _per_frame_features(x, layers, train, name="backbone"):
    B, T, H, W, C = x.shape
    fmap = ResNetBackbone(Bottleneck, layers, last_stride=2, name=name)(
        x.reshape(B * T, H, W, C), train=train
    )
    return fmap, B, T


def _finish(module, f, train):
    if not train:
        return f
    # torch-default Linear init: the reference legacy family never
    # re-initializes its classifier (resnet_temporal.py has no _init_params)
    y = nn.Dense(
        module.num_classes,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(f.shape[-1]),
        name="classifier",
    )(f)
    if module.loss == frozenset({"xent"}):
        return y
    if module.loss in (frozenset({"xent", "htri"}), frozenset({"cent"})):
        return y, f
    raise KeyError(f"Unsupported loss: {module.loss}")


class ResNet50TPLegacy(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent"})
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, adj=None, *, train: bool = False):
        fmap, B, T = _per_frame_features(x, self.layers, train)
        f = fmap.mean(axis=(1, 2)).reshape(B, T, -1).mean(axis=1)
        return _finish(self, f, train)


class ResNet50TA(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent"})
    layers: Sequence[int] = (3, 4, 6, 3)
    att_gen: str = "softmax"
    middle_dim: int = 256

    @nn.compact
    def __call__(self, x, adj=None, *, train: bool = False):
        fmap, B, T = _per_frame_features(x, self.layers, train)
        _, h, w, c = fmap.shape
        # spatial attention conv with a full-map kernel (reference uses
        # [7,4] for 224x112 inputs; here sized from the actual map)
        a = nn.Conv(self.middle_dim, (h, w), padding="VALID", name="attention_conv")(fmap)
        a = nn.relu(a).reshape(B, T, self.middle_dim)
        # temporal conv over frames (Conv1d kernel 3, same padding)
        a = nn.Conv(1, (3,), padding="SAME", name="attention_tconv")(a)
        a = nn.relu(a).reshape(B, T)
        if self.att_gen == "softmax":
            a = jax.nn.softmax(a, axis=1)
        elif self.att_gen == "sigmoid":
            a = l1_normalize(jax.nn.sigmoid(a), axis=1)
        else:
            raise KeyError(f"Unsupported attention generation: {self.att_gen}")
        feats = fmap.mean(axis=(1, 2)).reshape(B, T, -1)
        f = (feats * a[:, :, None]).sum(axis=1)
        return _finish(self, f, train)


class ResNet50RNN(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent"})
    layers: Sequence[int] = (3, 4, 6, 3)
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x, adj=None, *, train: bool = False):
        fmap, B, T = _per_frame_features(x, self.layers, train)
        feats = fmap.mean(axis=(1, 2)).reshape(B, T, -1)
        # the cell is constructed in THIS compact scope, so its params live
        # under the explicit 'lstm' name (gate denses lstm/{ii..ho})
        cell = nn.OptimizedLSTMCell(self.hidden_dim, name="lstm")
        outputs = nn.RNN(cell)(feats)  # (B, T, hidden)
        f = outputs.mean(axis=1)
        return _finish(self, f, train)


def res50tp_legacy(num_classes, loss={"xent"}, **kwargs):
    return ResNet50TPLegacy(num_classes=num_classes, loss=frozenset(loss))


def res50ta(num_classes, loss={"xent"}, **kwargs):
    return ResNet50TA(num_classes=num_classes, loss=frozenset(loss))


def res50rnn(num_classes, loss={"xent"}, **kwargs):
    return ResNet50RNN(num_classes=num_classes, loss=frozenset(loss))
