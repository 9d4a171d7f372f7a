"""Image-reid ResNet baselines (legacy family).

Behavioral parity with reference torchreid/models/resnet.py (ResNet50,
ResNet101, ResNet50M, ResNet50B — kept out of the reference's factory as
legacy code, models/__init__.py:17-27, but part of the codebase's
capability surface). Input is a single image batch (B, H, W, 3).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from agrl_tpu.models.backbone import (
    BatchNorm,
    Bottleneck,
    ResLayer,
    ResNetBackbone,
    ResNetTrunk,
)
from agrl_tpu.models.layers import torch_linear_bias_init, torch_linear_kernel_init

# ResNet50B's bottleneck/classifier get weights_init_kaiming (reference
# resnet.py:138-141): kaiming_normal fan_out weights, zero bias
_kaiming_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _torch_default_dense(features, fan_in, name):
    """torch-default-initialized Dense (the reference never re-inits the
    ResNet50/101/50M heads)."""
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(fan_in),
        name=name,
    )


class ResNetImage(nn.Module):
    """ResNet50/101: global average pooling + classifier (resnet.py:14-62)."""

    num_classes: int
    loss: frozenset = frozenset({"xent"})
    layers: Sequence[int] = (3, 4, 6, 3)  # (3, 4, 23, 3) for ResNet101

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fmap = ResNetBackbone(Bottleneck, self.layers, last_stride=2, name="backbone")(
            x, train=train
        )
        f = fmap.mean(axis=(1, 2))
        if not train:
            return f
        y = _torch_default_dense(self.num_classes, f.shape[-1], "classifier")(f)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, f
        raise KeyError(f"Unsupported loss: {self.loss}")


class ResNet50M(nn.Module):
    """ResNet50 + mid-level features (resnet.py:64-115): the last stage's
    three blocks are tapped individually; blocks a+b fuse through an FC to
    1024-d 'mid' features concatenated with block c's 2048-d features."""

    num_classes: int
    loss: frozenset = frozenset({"xent"})
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ResNetTrunk(Bottleneck, self.layers, name="trunk")(x, train=train)
        x5a = Bottleneck(512, stride=2, downsample=True, name="layers5a")(x, train=train)
        x5b = Bottleneck(512, name="layers5b")(x5a, train=train)
        x5c = Bottleneck(512, name="layers5c")(x5b, train=train)

        fa = x5a.mean(axis=(1, 2))
        fb = x5b.mean(axis=(1, 2))
        fc = x5c.mean(axis=(1, 2))

        mid = jnp.concatenate([fa, fb], axis=1)  # (B, 4096)
        mid = _torch_default_dense(1024, mid.shape[-1], "fc_fuse")(mid)
        mid = BatchNorm(use_running_average=not train, name="fc_fuse_bn")(mid)
        mid = nn.relu(mid)

        combo = jnp.concatenate([fc, mid], axis=1)  # (B, 3072)
        if not train:
            return combo
        y = _torch_default_dense(self.num_classes, combo.shape[-1], "classifier")(combo)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, combo
        raise KeyError(f"Unsupported loss: {self.loss}")


class ResNet50B(nn.Module):
    """reid_baseline variant (resnet.py:118-160): last_stride=1 backbone,
    512-d bottleneck head (Linear+BN+LeakyReLU+Dropout) for the classifier;
    eval feature = the raw 2048-d global feature."""

    num_classes: int
    loss: frozenset = frozenset({"xent"})
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        fmap = ResNetBackbone(Bottleneck, self.layers, last_stride=1, name="backbone")(
            x, train=train
        )
        global_feat = fmap.mean(axis=(1, 2))
        if not train:
            return global_feat
        feat = nn.Dense(512, kernel_init=_kaiming_fan_out, name="bottleneck_fc")(global_feat)
        feat = BatchNorm(use_running_average=not train, name="bottleneck_bn")(feat)
        feat = nn.leaky_relu(feat, negative_slope=0.1)
        feat = nn.Dropout(0.5, deterministic=not train)(feat)
        y = nn.Dense(self.num_classes, kernel_init=_kaiming_fan_out, name="classifier")(feat)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, global_feat
        raise KeyError(f"Unsupported loss: {self.loss}")


def resnet50_image(num_classes, loss={"xent"}, **kwargs):
    return ResNetImage(num_classes=num_classes, loss=frozenset(loss), layers=(3, 4, 6, 3))


def resnet101_image(num_classes, loss={"xent"}, **kwargs):
    return ResNetImage(num_classes=num_classes, loss=frozenset(loss), layers=(3, 4, 23, 3))


def resnet50m(num_classes, loss={"xent"}, **kwargs):
    return ResNet50M(num_classes=num_classes, loss=frozenset(loss))


def resnet50b(num_classes, loss={"xent"}, **kwargs):
    return ResNet50B(num_classes=num_classes, loss=frozenset(loss))
