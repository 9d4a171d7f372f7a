"""ResNet backbone (Flax linen, NHWC) with a configurable last stride.

Semantics match the reference backbone (torchreid/models/vmgn.py:29-65,
175-211): Bottleneck v1 blocks (stride on the 3x3 conv), BN after every
conv, projection downsample when shape changes, `last_stride` switch for
layer4 (re-id models use last_stride=1 to keep a 16x8 final feature map at
256x128 input).

TPU-first choices:
  * NHWC layout (XLA's native conv layout on TPU).
  * BatchNorm statistics are computed over the GLOBAL batch when the batch
    axis is sharded under jit — the cross-replica upgrade of the
    reference's per-GPU DataParallel stats.
  * Weights can be converted from a torchvision resnet50 state_dict via
    agrl_tpu.models.weight_convert.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# torch BatchNorm defaults: momentum 0.1 (=> flax momentum 0.9), eps 1e-5.
# One-pass (fast) variance E[x^2] - E[x]^2 is safe when flax's
# _compute_stats promotes statistics to f32 AND clamps the cancellation
# residue with `var = jnp.maximum(0.0, mu2 - _abs_sq(mu))` (present in
# flax 0.12.3, linen/normalization.py) — a bf16-rounded constant channel
# then can never reach rsqrt with var + eps < 0. Round 2 shipped the
# two-pass use_fast_variance=False out of caution after a mid-training
# NaN (the actual overflow was the l2 affinity, fixed separately as
# 2*sigmoid(-d)); the two-pass cost ~5.6% train throughput (BENCH_r01
# 302.8 -> r02 285.7 clips/s) because it reads the conv activations from
# HBM twice. The clamp is VERIFIED at import below — an older flax
# without it falls back to the nonnegative-by-construction two-pass, so
# the finiteness guarantee never depends on an unpinned dependency; the
# constant-channel regression tests (tests/test_models.py) pin it either
# way (f32 + bf16, batch and running stats).


def _flax_clamps_fast_variance() -> bool:
    try:
        import inspect

        from flax.linen import normalization as _norm

        src = inspect.getsource(_norm._compute_stats)
        return "maximum(0.0" in src or "maximum(0," in src
    except Exception:
        return False


BatchNorm = partial(
    nn.BatchNorm, momentum=0.9, epsilon=1e-5,
    use_fast_variance=_flax_clamps_fast_variance(),
)

conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + residual."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = None  # None: follow input dtype (e.g. bf16-cast params)

    @nn.compact
    def __call__(self, x, *, train: bool):
        norm = partial(BatchNorm, use_running_average=not train, dtype=self.dtype)
        residual = x

        out = nn.Conv(self.planes, (1, 1), use_bias=False, kernel_init=conv_kaiming, dtype=self.dtype, name="conv1")(x)
        out = norm(name="bn1")(out)
        out = nn.relu(out)

        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            kernel_init=conv_kaiming,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = norm(name="bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False,
            kernel_init=conv_kaiming, dtype=self.dtype, name="conv3"
        )(out)
        out = norm(name="bn3")(out)

        if self.downsample:
            residual = nn.Conv(
                self.planes * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=conv_kaiming,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = norm(name="downsample_bn")(residual)

        return nn.relu(out + residual)


class BasicBlock(nn.Module):
    """ResNet-v1 basic block (3x3 -> 3x3 + residual), for ResNet-18/34."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1
    dtype: Any = None  # None: follow input dtype (e.g. bf16-cast params)

    @nn.compact
    def __call__(self, x, *, train: bool):
        norm = partial(BatchNorm, use_running_average=not train, dtype=self.dtype)
        residual = x
        out = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            kernel_init=conv_kaiming,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = norm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            kernel_init=conv_kaiming, dtype=self.dtype, name="conv2"
        )(out)
        out = norm(name="bn2")(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                kernel_init=conv_kaiming,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(out + residual)


class ResLayer(nn.Module):
    """A stage of `blocks` residual blocks; stride applies to the first."""

    block: type
    planes: int
    blocks: int
    stride: int = 1
    dtype: Any = None  # None: follow input dtype (e.g. bf16-cast params)

    @nn.compact
    def __call__(self, x, *, train: bool):
        expansion = self.block.expansion
        needs_down = self.stride != 1 or x.shape[-1] != self.planes * expansion
        x = self.block(
            self.planes, stride=self.stride, downsample=needs_down,
            dtype=self.dtype, name="block0"
        )(x, train=train)
        for i in range(1, self.blocks):
            x = self.block(self.planes, dtype=self.dtype, name=f"block{i}")(x, train=train)
        return x


class ResNetStem(nn.Module):
    """conv7x7/2 + BN + relu + maxpool3x3/2."""

    dtype: Any = None  # None: follow input dtype (e.g. bf16-cast params)

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            kernel_init=conv_kaiming,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        return x


class ResNetTrunk(nn.Module):
    """Stem + layer1..layer3 — the trunk shared by two-branch models."""

    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = None  # None: follow input dtype (e.g. bf16-cast params)

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = ResNetStem(dtype=self.dtype, name="stem")(x, train=train)
        x = ResLayer(self.block, 64, self.layers[0], dtype=self.dtype, name="layer1")(x, train=train)
        x = ResLayer(self.block, 128, self.layers[1], stride=2, dtype=self.dtype, name="layer2")(x, train=train)
        x = ResLayer(self.block, 256, self.layers[2], stride=2, dtype=self.dtype, name="layer3")(x, train=train)
        return x


class ResNetBackbone(nn.Module):
    """Stem + layer1..layer4. Returns the layer4 feature map (NHWC).

    `layers` e.g. (3, 4, 6, 3) for ResNet-50; `last_stride` controls
    layer4's stride (reference uses 1 for re-id)."""

    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 2
    dtype: Any = None  # None: follow input dtype (e.g. bf16-cast params)

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = ResNetTrunk(self.block, self.layers, dtype=self.dtype, name="trunk")(x, train=train)
        x = ResLayer(self.block, 512, self.layers[3], stride=self.last_stride,
                     dtype=self.dtype, name="layer4")(x, train=train)
        return x


def adaptive_max_pool_rows(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """torch AdaptiveMaxPool2d((n, 1)) over NHWC: max over W, then max over
    row bins [floor(i*h/n), ceil((i+1)*h/n)). x: (..., H, W, C) ->
    (..., n, C). Bin edges are static Python ints (XLA-friendly)."""
    import numpy as np

    xw = x.max(axis=-2)  # (..., H, C)
    h = xw.shape[-2]
    bins = []
    for i in range(out_size):
        start = int(np.floor(i * h / out_size))
        end = int(np.ceil((i + 1) * h / out_size))
        bins.append(xw[..., start:end, :].max(axis=-2))
    return jnp.stack(bins, axis=-2)


def adaptive_avg_pool_matrix(in_size: int, out_size: int) -> jnp.ndarray:
    """(out_size, in_size) averaging matrix replicating torch's
    AdaptiveAvgPool semantics: bin i averages rows
    [floor(i*in/out), ceil((i+1)*in/out))."""
    import numpy as np

    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        m[i, start:end] = 1.0 / (end - start)
    return jnp.asarray(m)
