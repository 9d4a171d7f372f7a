"""3D ResNets (legacy family) — spatio-temporal convolution baselines.

Behavioral parity targets: reference torchreid/models/resnet3d.py
(Kinetics-style 3D ResNet-10..200, Hara et al.) and resnet3dt.py (the
video-reid wrapper that feeds (B, S, C, H, W) clips through the 3D
backbone). Structure: 7x7x7 stem conv with stride (1, 2, 2), 3x3x3
max-pool stride 2, four stages of 3D basic/bottleneck blocks with
type-B (projection) shortcuts, global spatio-temporal average pooling.

TPU note: inputs are channels-last (B, T, H, W, C); 3-D convolutions map
onto the MXU via XLA's NDHWC convolution path.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial

import jax.numpy as jnp
from flax import linen as nn

from agrl_tpu.models.backbone import BatchNorm, conv_kaiming
from agrl_tpu.models.layers import torch_linear_bias_init, torch_linear_kernel_init


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool):
        norm = partial(BatchNorm, use_running_average=not train)
        s = (self.stride,) * 3
        residual = x
        out = nn.Conv(self.planes, (3, 3, 3), strides=s, padding=1,
                      use_bias=False, kernel_init=conv_kaiming, name="conv1")(x)
        out = nn.relu(norm(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                      kernel_init=conv_kaiming, name="conv2")(out)
        out = norm(name="bn2")(out)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1, 1), strides=s,
                               use_bias=False, kernel_init=conv_kaiming,
                               name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool):
        norm = partial(BatchNorm, use_running_average=not train)
        s = (self.stride,) * 3
        residual = x
        out = nn.Conv(self.planes, (1, 1, 1), use_bias=False,
                      kernel_init=conv_kaiming, name="conv1")(x)
        out = nn.relu(norm(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3, 3), strides=s, padding=1,
                      use_bias=False, kernel_init=conv_kaiming, name="conv2")(out)
        out = nn.relu(norm(name="bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1, 1), use_bias=False,
                      kernel_init=conv_kaiming, name="conv3")(out)
        out = norm(name="bn3")(out)
        if self.downsample:
            residual = nn.Conv(self.planes * self.expansion, (1, 1, 1), strides=s,
                               use_bias=False, kernel_init=conv_kaiming,
                               name="downsample_conv")(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(out + residual)


DEPTH_CONFIGS = {
    10: (BasicBlock3D, (1, 1, 1, 1)),
    18: (BasicBlock3D, (2, 2, 2, 2)),
    34: (BasicBlock3D, (3, 4, 6, 3)),
    50: (Bottleneck3D, (3, 4, 6, 3)),
    101: (Bottleneck3D, (3, 4, 23, 3)),
    152: (Bottleneck3D, (3, 8, 36, 3)),
    200: (Bottleneck3D, (3, 24, 36, 3)),
}


class ResNet3D(nn.Module):
    """(B, T, H, W, C) clips -> classification logits / pooled features."""

    num_classes: int
    loss: frozenset = frozenset({"xent"})
    depth: int = 50

    @nn.compact
    def __call__(self, x, adj=None, *, train: bool = False):
        block, layers = DEPTH_CONFIGS[self.depth]
        norm = partial(BatchNorm, use_running_average=not train)

        x = nn.Conv(64, (7, 7, 7), strides=(1, 2, 2), padding=3,
                    use_bias=False, kernel_init=conv_kaiming, name="conv1")(x)
        x = nn.relu(norm(name="bn1")(x))
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)

        for i, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), layers, (1, 2, 2, 2))
        ):
            for b in range(blocks):
                s = stride if b == 0 else 1
                needs_down = s != 1 or x.shape[-1] != planes * block.expansion
                x = block(planes, stride=s, downsample=needs_down,
                          name=f"layer{i + 1}_block{b}")(x, train=train)

        f = x.mean(axis=(1, 2, 3))  # global spatio-temporal pooling
        if not train:
            return f
        # torch-default Linear init: the reference 3D family never re-inits
        # its fc head (resnet3dt.py:27)
        y = nn.Dense(
            self.num_classes,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(f.shape[-1]),
            name="classifier",
        )(f)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, f
        raise KeyError(f"Unsupported loss: {self.loss}")


def resnet3d(num_classes, loss={"xent", "htri"}, depth=50, **kwargs):
    assert depth in DEPTH_CONFIGS, f"depth must be one of {sorted(DEPTH_CONFIGS)}"
    return ResNet3D(num_classes=num_classes, loss=frozenset(loss), depth=depth)


def resnet3dt(num_classes, loss={"xent", "htri"}, depth=50, **kwargs):
    """Video-reid wrapper name (reference resnet3dt.py): same module —
    inputs here are already channels-last (B, S, H, W, 3) clips."""
    return resnet3d(num_classes, loss, depth, **kwargs)
