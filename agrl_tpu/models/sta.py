"""STA baseline — spatial-temporal attention with frame picking.

Behavioral parity with reference torchreid/models/sta.py:116-281:
  * ResNet-50 (layer4 stride 1), 4-part pooling;
  * spatial score map: per-pixel channel L2 norms, L2-normalized over the
    frame's pixels, part-pooled -> s_a (B, S, parts);
  * temporal attention: L1 normalization of s_a over frames;
  * f_1 = per-part features of the HIGHEST-scoring frame,
    f_2 = attention-weighted sum over frames; concat -> (B, 2c, parts)
    -> average over parts (adaptive_avg_pool1d(.,1)) -> 4096-d
    -> fc1 (Linear 4096->1024 no bias + BN + ReLU) -> classifier (bias);
  * eval feature = the 1024-d f_t.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn

from agrl_tpu.models.backbone import (
    BatchNorm,
    Bottleneck,
    ResLayer,
    ResNetTrunk,
    adaptive_avg_pool_matrix,
)
from agrl_tpu.models.layers import graph_linear_init, l1_normalize



class STA(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent", "htri"})
    layers: Sequence[int] = (3, 4, 6, 3)
    reduced_dim: int = 1024
    parts: int = 4
    simple: bool = False  # simple_sta: skip the spatial normalization step

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
        fmap = ResLayer(Bottleneck, 512, self.layers[3], stride=1, name="layer4")(
            x, train=train
        )
        _, h, w, c = fmap.shape
        pool_m = adaptive_avg_pool_matrix(h, self.parts)

        if frame_mask is not None:
            assert not train, "frame_mask is an eval-only contract (batch BN mixes rows)"
            fm = frame_mask.astype(jnp.float32)  # (B, S)
        else:
            fm = None

        # part features: (B, S, parts, c)
        v_g = jnp.einsum("nh,bhc->bnc", pool_m, fmap.mean(axis=2)).reshape(
            B, S, self.parts, c
        )

        if self.simple:
            # simple_sta.py:205-208: attention from part-feature norms
            att = jnp.linalg.norm(v_g, axis=3, keepdims=True)  # (B, S, parts, 1)
            if fm is not None:
                # padding frames score exactly 0 -> excluded from the L1
                # normalization, from f_2's weighted sum, and from f_1's
                # argmax (real scores are positive)
                att = att * fm[:, :, None, None]
            t_a = l1_normalize(att, axis=1)  # (B, S, parts, 1)
        else:
            # sta.py:209-216: pixel norm map, L2-normalized per frame
            g_a = jnp.linalg.norm(fmap, axis=3)  # (B*S, h, w)
            g_a = g_a / jnp.maximum(
                jnp.linalg.norm(g_a.reshape(B * S, -1), axis=1, keepdims=True), 1e-12
            ).reshape(B * S, 1, 1)
            s_a = jnp.einsum("nh,bh->bn", pool_m, g_a.mean(axis=2)).reshape(
                B, S, self.parts
            )
            if fm is not None:
                s_a = s_a * fm[:, :, None]
            t_a = l1_normalize(s_a, axis=1)[..., None]  # (B, S, parts, 1)

        # f_1: per-part features of the highest-scoring frame
        h_index = jnp.argmax(t_a[..., 0], axis=1)  # (B, parts)
        f_1 = jnp.take_along_axis(v_g, h_index[:, None, :, None], axis=1)[:, 0]
        # f_2: attention-weighted sum over frames
        f_2 = (v_g * t_a).sum(axis=1)  # (B, parts, c)

        f_fuse = jnp.concatenate([f_1, f_2], axis=2)  # (B, parts, 2c)
        f_g = f_fuse.mean(axis=1)  # average over parts -> (B, 2c)

        f_t = nn.Dense(
            self.reduced_dim, use_bias=False, kernel_init=graph_linear_init, name="fc1"
        )(f_g)
        f_t = BatchNorm(use_running_average=not train, name="fc1_bn")(f_t)
        f_t = nn.relu(f_t)

        if not train:
            return f_t
        y = nn.Dense(self.num_classes, kernel_init=graph_linear_init, name="classifier")(f_t)
        if self.loss == frozenset({"xent"}):
            return y
        if self.loss == frozenset({"xent", "htri"}):
            return y, f_t
        raise KeyError(f"Unsupported loss: {self.loss}")


def sta_p4(num_classes, loss={"xent", "htri"}, last_stride=1, **kwargs):
    del last_stride
    return STA(num_classes=num_classes, loss=frozenset(loss), reduced_dim=1024)


def simple_sta_p4(num_classes, loss={"xent", "htri"}, last_stride=1, **kwargs):
    del last_stride
    return STA(num_classes=num_classes, loss=frozenset(loss), reduced_dim=1024, simple=True)
