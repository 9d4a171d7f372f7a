"""VMGN — the flagship pose-guided adaptive-graph video re-id model.

Behavioral parity with the reference GSTA class as built by `vmgn()`
(torchreid/models/vmgn.py:214-357, 373-390):

  * ResNet-50 trunk (last_stride=1) shared through layer3, then TWO
    independent layer4 branches (vmgn.py:233-234).
  * Global branch: layer4_1 -> avg pool over (S, h, w) -> BNNeck ->
    classifier (vmgn.py:237-241, 299-301).
  * Attention branch: layer4_2 -> pyramid part pooling
    (AdaptiveAvgPool2d((n, 1)) per scale, vmgn.py:249-251, 305-307) ->
    (B, S * total_split, 2048) vertices -> num_gb adaptive graph layers ->
    norm-based temporal attention fusion -> mean over parts -> BNNeck ->
    classifier.
  * Eval feature: concat([global_bn, att_bn]) — 4096-d (vmgn.py:320-321).
  * Train outputs: ([g_out, att_out, *subclip_outs], [g_f, att_f,
    *subclip_feats]) for loss = {'xent', 'htri'} (vmgn.py:344-355).
  * Consistent loss: random sorted subsets of S-3, S-2, S-1 frames are
    re-fused through the SAME attention head (vmgn.py:327-342); needs an
    rng stream named 'subclip' in train mode.

TPU-first notes: input layout is (B, S, H, W, 3) NHWC; the two layer4
branches run on the same layer3 activation so XLA schedules them as one
fused region; pyramid pooling is an exact matmul against a precomputed
averaging matrix (adaptive-pool parity without ragged windows).
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
    classifier_init,
    temporal_attention,
)
from agrl_tpu.utils.reidtools import calc_splits


class VMGN(nn.Module):
    num_classes: int
    loss: frozenset = frozenset({"xent", "htri"})
    layers: Sequence[int] = (3, 4, 6, 3)
    last_stride: int = 1
    num_split: int = 4
    pyramid_part: bool = True
    num_gb: int = 2
    use_pose: bool = True
    learn_graph: bool = True
    consistent_loss: bool = False
    dist_method: str = "l2"
    feature_dim: int = 2048
    # mixed precision: compute dtype for the conv backbone (~97% of FLOPs);
    # params stay f32, graph layers / heads / losses run f32. None = follow
    # the input dtype (so bf16-cast params keep the pure-bf16 eval path)
    dtype: Any = None

    # reference count_num_param excludes only a head named `classifier`;
    # vmgn's heads are global_/att_classifier -> nothing excluded
    count_exclude_heads = ()

    @property
    def total_split_list(self):
        return calc_splits(self.num_split) if self.pyramid_part else [self.num_split]

    @property
    def total_split(self):
        return sum(self.total_split_list)

    # eval forward accepts frame_mask: enables the fixed-shape bucketing
    # of `--test-sample all` (engine/evaluator.py)
    supports_frame_mask = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, adj: jnp.ndarray, *, train: bool = False,
        frame_mask: jnp.ndarray | None = None,
    ):
        """x: (B, S, H, W, 3) float; adj: (B, V, V), V = S * total_split.

        `frame_mask` (B, S) of 0/1 (eval only): frames marked 0 are
        PADDING — excluded exactly from the global mean, the graph
        row-normalizations and the attention fusion, so a clip padded to a
        bucketed length yields the same feature as the unpadded clip (the
        `--test-sample all` bucketing path; the reference runs that mode
        with per-length dynamic shapes instead, dataset_loader.py:115-119).
        Eval-mode BN uses running stats (per-element), so padded rows
        cannot leak into real ones."""
        B, S, H, W, C = x.shape
        x = x.reshape(B * S, H, W, C)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x3 = ResNetTrunk(Bottleneck, self.layers, dtype=self.dtype, name="trunk")(
            x, train=train
        )
        x4_1 = ResLayer(Bottleneck, 512, self.layers[3], stride=self.last_stride,
                        dtype=self.dtype, name="layer4_1")(x3, train=train)
        x4_2 = ResLayer(Bottleneck, 512, self.layers[3], stride=self.last_stride,
                        dtype=self.dtype, name="layer4_2")(x3, train=train)
        if self.dtype is not None:
            # mixed mode: graph layers / heads / losses run f32
            x4_1 = x4_1.astype(jnp.float32)
            x4_2 = x4_2.astype(jnp.float32)
        _, h, w, c = x4_1.shape
        if frame_mask is not None:
            assert not train, "frame_mask is an eval-only contract (batch BN mixes rows)"
            fm = frame_mask.astype(jnp.float32)  # (B, S)
            vmask = jnp.repeat(fm, self.total_split, axis=1)  # (B, V) frame-major
        else:
            fm = vmask = None

        # ---- global branch ----
        if fm is None:
            g_f = x4_1.reshape(B, S, h, w, c).mean(axis=(1, 2, 3))  # (B, c)
        else:  # masked mean over real frames only
            g_sum = (x4_1.reshape(B, S, h, w, c) * fm[:, :, None, None, None]).sum(
                axis=(1, 2, 3)
            )
            g_f = g_sum / (fm.sum(axis=1)[:, None] * (h * w))
        global_bottleneck = BNNeck(name="global_bottleneck")
        g_bn = global_bottleneck(g_f, train=train)

        # ---- attention branch: pyramid part pooling ----
        fmap = x4_2.mean(axis=2)  # pool width -> (B*S, h, c)
        v_parts = []
        for n in self.total_split_list:
            pool_m = adaptive_avg_pool_matrix(h, n)  # (n, h)
            v_parts.append(jnp.einsum("nh,bhc->bnc", pool_m, fmap))
        v_f = jnp.concatenate(v_parts, axis=1)  # (B*S, total_split, c)
        f = v_f.reshape(B, S * self.total_split, c)

        # ---- adaptive graph propagation ----
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

        att_bottleneck = BNNeck(name="att_bottleneck")
        att_classifier = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=classifier_init, name="att_classifier"
        )

        f_fuse = temporal_attention(f, frame_mask=fm)  # (B, total_split, c)
        att_f = f_fuse.mean(axis=1)  # (B, c)
        att_bn = att_bottleneck(att_f, train=train)

        if not train:
            return jnp.concatenate([g_bn, att_bn], axis=1)

        global_classifier = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=classifier_init, name="global_classifier"
        )
        g_out = global_classifier(g_bn)
        att_out = att_classifier(att_bn)

        out_list = [g_out, att_out]
        f_list = [g_f, att_f]

        if self.consistent_loss:
            assert S >= 5, "consistent loss needs seq_len >= 5"
            key = self.make_rng("subclip")
            for num_frame in [S - 3, S - 2, S - 1]:
                key, sub = jax.random.split(key)
                sub_index = jnp.sort(jax.random.permutation(sub, S)[:num_frame])
                sf = jnp.take(f, sub_index, axis=1)  # (B, num_frame, P, c)
                satt_f = temporal_attention(sf).mean(axis=1)
                satt_bn = att_bottleneck(satt_f, train=train)
                out_list.append(att_classifier(satt_bn))
                f_list.append(satt_f)

        if self.loss == frozenset({"xent"}):
            return out_list
        if self.loss == frozenset({"xent", "htri"}):
            return out_list, f_list
        raise KeyError(f"Unsupported loss: {self.loss}")


def vmgn(
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
    dtype=jnp.float32,
    **kwargs,
):
    """Factory matching the reference builder signature (vmgn.py:373-390)."""
    assert num_scale == 1, "vmgn's pooling produces one scale of vertices"
    return VMGN(
        num_classes=num_classes,
        loss=frozenset(loss),
        layers=(3, 4, 6, 3),
        last_stride=last_stride,
        num_split=num_split,
        pyramid_part=pyramid_part,
        num_gb=num_gb,
        use_pose=use_pose,
        learn_graph=learn_graph,
        consistent_loss=consistent_loss,
        dtype=dtype,
    )
