"""Shared model components: adaptive graph convolution, BNNeck, temporal
attention fusion.

Parity targets in the reference:
  * GraphLayer        — torchreid/models/vmgn.py:68-172 (same module is
    duplicated at gsta.py:66-170). Pose adjacency row-L1-normalized;
    learned affinity from 'l2' (2 / (exp(pairwise_dist) + 1)) or 'dot'
    (q/k embeddings of dim in/8) similarity, row-L1-normalized, then
    AVERAGED with the pose graph; propagate h' = graph @ (W x); BatchNorm
    over all (batch x vertex) rows; LeakyReLU(0.1); residual
    (1-gamma) * x + gamma * h'.
  * BNNeck            — vmgn.py:238-239: BatchNorm1d with the bias frozen
    at zero (here: use_bias=False, mathematically identical).
  * temporal attention — vmgn.py:270-278: per-vertex L2 feature norms,
    L1-normalized over the clip axis, used as fusion weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from agrl_tpu.models.backbone import BatchNorm  # single source of BN constants

# reference _init_params (vmgn.py:137-140): Linear ~ N(0, 0.01)
graph_linear_init = nn.initializers.normal(stddev=0.01)

# torch's DEFAULT nn.Linear init (kaiming_uniform a=sqrt(5) weight,
# uniform(+-1/sqrt(fan_in)) bias) — for heads the reference never
# re-initializes (legacy temporal family; graphnet's ModuleList no-op)
torch_linear_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / float(np.sqrt(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
# reference weights_init_classifier (torchtools.py): Linear ~ N(0, 0.001)
classifier_init = nn.initializers.normal(stddev=0.001)


def l1_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=1): x / max(sum|x|, eps)."""
    denom = jnp.maximum(jnp.sum(jnp.abs(x), axis=axis, keepdims=True), eps)
    return x / denom


def l2_affinity(v: jnp.ndarray) -> jnp.ndarray:
    """Similarity 2 / (exp(pairwise_euclidean) + 1) (vmgn.py:114-120),
    computed as 2 * sigmoid(-dist) — the same function, but overflow-safe.

    The reference's literal form NaNs in TRAINING once any pairwise
    distance exceeds ~88 (exp overflows f32 -> forward 2/inf = 0 is fine,
    but the backward is -2 exp(d)/(exp(d)+1)^2 = inf/inf = NaN; observed
    as sudden loss-NaN on real-size models mid-training). sigmoid keeps
    both directions finite: the gradient decays to 0 for large d.

    fp32 accumulation THROUGHOUT (input cast incl. the squared norms — a
    bf16 sq against an f32 cross term would reinject the cancellation
    error): the quadratic form cancels near zero distance and the
    affinity is sharpest exactly there (V is tiny, cost negligible)."""
    v = v.astype(jnp.float32)
    sq = jnp.sum(v * v, axis=2)
    d2 = sq[:, None, :] + sq[:, :, None] - 2.0 * jnp.einsum(
        "bic,bjc->bij", v, v, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    dist = jnp.sqrt(jnp.clip(d2, min=1e-12))
    return 2.0 * jax.nn.sigmoid(-dist)


def _blend_graph_l2_math(x: jnp.ndarray, adj: jnp.ndarray):
    """Reference composition (vmgn.py:142-164): pose adjacency row-L1-
    normalized, l2 affinity row-L1-normalized, averaged. Returns the
    blended graph plus the intermediates the hand-written VJP reuses."""
    x = x.astype(jnp.float32)
    ra = jnp.maximum(jnp.sum(jnp.abs(adj), axis=2, keepdims=True), 1e-12)
    adjn = adj / ra
    sq = jnp.sum(x * x, axis=2)
    d2 = sq[:, None, :] + sq[:, :, None] - 2.0 * jnp.einsum(
        "bic,bjc->bij", x, x, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    d = jnp.sqrt(jnp.clip(d2, min=1e-12))
    sim = 2.0 * jax.nn.sigmoid(-d)  # overflow-safe l2_affinity
    r = jnp.maximum(jnp.sum(sim, axis=2, keepdims=True), 1e-12)  # sim > 0
    return (adjn + sim / r) / 2.0, (adjn, ra, d2, d, sim, r)


@jax.custom_vjp
def blend_graph_l2(x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """Fused pose+learned graph for the vmgn/gsta l2 path, with a
    HAND-WRITTEN backward (VERDICT r04 weak #6 / item 6).

    Forward == l1_normalize(adj) averaged with l1_normalize(l2_affinity(x))
    — bit-comparable to the inline composition (same ops, same order).
    The payoff is the backward: autodiff emits a ~40-kernel chain of tiny
    (B, V, V) VPU ops (sigmoid'/sqrt'/clip'/normalize' each as separate
    fusions with (B, V, C) round trips); the closed form below is 6
    elementwise (B, V, V) ops + one rowsum + ONE (B, V, V)x(B, V, C)
    matmul that lands on the MXU:

        dgn  = dG/2;  dsim = (dgn - rowsum(dgn*sim)/r) / r
        dd   = -sim (1 - sim/2) dsim          (sigmoid chain)
        dd2  = dd / (2 d)   where d2 > eps    (sqrt + clip chain)
        M    = dd2 + dd2^T
        dx   = 2 (rowsum(M) * x - M @ x)      (pairwise-distance chain)
    """
    return _blend_graph_l2_math(x, adj)[0]


def _blend_graph_l2_fwd(x, adj):
    G, (adjn, ra, d2, d, sim, r) = _blend_graph_l2_math(x, adj)
    return G, (x.astype(jnp.float32), adj, adjn, ra, d2, d, sim, r)


def _blend_graph_l2_bwd(res, dG):
    x, adj, adjn, ra, d2, d, sim, r = res
    dG = dG.astype(jnp.float32)
    dgn = 0.5 * dG
    # learned-branch normalize backward (rows sum over axis 2)
    dsim = (dgn - jnp.sum(dgn * sim, axis=2, keepdims=True) / r) / r
    dd = dsim * (-sim * (1.0 - 0.5 * sim))
    dd2 = jnp.where(d2 > 1e-12, dd / (2.0 * d), 0.0)
    M = dd2 + jnp.swapaxes(dd2, 1, 2)
    dx = 2.0 * (
        jnp.sum(M, axis=2, keepdims=True) * x
        - jnp.einsum("bij,bjc->bic", M, x,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    )
    # pose-branch normalize backward (adj is dataset data — grads unused in
    # training, but custom_vjp must return a correct cotangent).
    # l1_normalize's numerator is adj (not |adj|): the sign enters only
    # through the denominator term, and only where the row sum was not
    # eps-clamped (max passes zero grad to a clamped sum) — matches
    # autodiff exactly, including all-zero (missing-pose) rows.
    dadjn = 0.5 * dG
    s = jnp.sum(jnp.abs(adj), axis=2, keepdims=True)
    # d|a|/da: JAX defines the abs gradient at 0 as +1 (select(x >= 0)),
    # NOT sign(0) = 0 — match it so zero entries in nonzero rows agree
    dabs = jnp.where(adj >= 0, 1.0, -1.0)
    denom_term = jnp.where(
        s > 1e-12,
        dabs * (jnp.sum(dadjn * adjn, axis=2, keepdims=True) / ra),
        0.0,
    )
    dadj = dadjn / ra - denom_term
    return dx.astype(x.dtype), dadj.astype(adj.dtype)


blend_graph_l2.defvjp(_blend_graph_l2_fwd, _blend_graph_l2_bwd)


def _pair_mask(vertex_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, V) 0/1 vertex mask -> (B, V, V) pairwise mask: entry (i, j) is
    1 iff BOTH endpoints are real vertices. Shared by GraphConvLayer and
    GraphBlock so the padding semantics cannot diverge."""
    return vertex_mask[:, :, None] * vertex_mask[:, None, :]


class GraphConvLayer(nn.Module):
    """Adaptive graph convolution with residual learning.

    Two reference variants are covered by flags:
      * vmgn/gsta GraphLayer (vmgn.py:68-172): no diagonal mask, gamma=0.1,
        convex residual (1-gamma) * x + gamma * h'.
      * ganet GraphLayer (ganet.py:170-274): zeroed diagonals on both the
        pose adj and the learned affinity BEFORE row normalization,
        gamma=0 default, additive residual x + gamma * h'.
    """

    in_features: int
    out_features: int
    learn_graph: bool = True
    use_pose: bool = True
    dist_method: str = "l2"
    gamma: float = 0.1
    mask_diag: bool = False
    residual: str = "convex"  # 'convex' | 'additive'

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, adj: jnp.ndarray, *, train: bool,
        vertex_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """x: (B, V, C_in); adj: (B, V, V) pose graph. Returns (B, V, C_out).

        `vertex_mask` (B, V) of 0/1 marks PADDING vertices (0): both the
        pose adjacency and the learned affinity are zeroed to/from them
        BEFORE row normalization, so real vertices aggregate exactly the
        neighbors an unpadded run would see (used by the fixed-shape
        bucketing of `--test-sample all`; eval-mode BN is per-element, so
        padded rows never leak into real ones)."""
        assert self.use_pose or self.learn_graph
        h = nn.Dense(
            self.out_features, use_bias=False, kernel_init=graph_linear_init, name="linear"
        )(x)
        B, V, C = h.shape
        mask = 1.0 - jnp.eye(V) if self.mask_diag else None
        if vertex_mask is not None:
            pair_mask = _pair_mask(vertex_mask)
            mask = pair_mask if mask is None else mask * pair_mask

        # NOTE on blend_graph_l2 (the fused graph build with a hand-written
        # VJP, above): measured NEUTRAL on the chip in the full train step
        # (interleaved A/B at paper config: fused 53.12/53.57 ms vs inline
        # 53.18/53.70 ms best/median — PROFILE.md "fused graph backward").
        # XLA already fuses this chain in context; production stays on the
        # autodiff composition below, the fused op remains tested
        # optimization infrastructure (like ops/graph_conv_v2).
        if self.use_pose:
            if mask is not None:
                adj = adj * mask
            adj = l1_normalize(adj, axis=2)

        if self.learn_graph:
            if self.dist_method == "dot":
                num_hid = self.in_features // 8
                q = nn.Dense(num_hid, kernel_init=graph_linear_init, name="emb_q")(x)
                k = nn.Dense(num_hid, kernel_init=graph_linear_init, name="emb_k")(x)
                sim = jnp.einsum("bih,bjh->bij", q, k, preferred_element_type=jnp.float32)
            elif self.dist_method == "l2":
                sim = l2_affinity(x)
            else:
                raise NotImplementedError(self.dist_method)
            if mask is not None:
                sim = sim * mask
            graph = l1_normalize(sim, axis=2)
            if self.use_pose:
                graph = (adj + graph) / 2.0
        else:
            graph = adj

        h_prime = jnp.einsum("bij,bjc->bic", graph, h, preferred_element_type=jnp.float32)
        # BatchNorm over all (B*V) vertex rows, matching BN1d(view(N*V, C))
        h_prime = BatchNorm(use_running_average=not train, name="bn")(
            h_prime.reshape(B * V, C)
        ).reshape(B, V, C)
        h_prime = nn.leaky_relu(h_prime, negative_slope=0.1)

        if self.residual == "convex":
            return (1.0 - self.gamma) * x + self.gamma * h_prime
        return x + self.gamma * h_prime


class GraphBlock(nn.Module):
    """graphnet.py:58-117 variant: softmax dot affinity (128-d embeddings
    with bias), blend (adj + gamma * graph) / (1 + gamma), relu BEFORE the
    vertex BatchNorm, additive residual x + alpha * h'."""

    in_features: int
    out_features: int
    alpha: float = 1.0
    gamma: float = 1.0
    learn_graph: bool = True
    use_pose: bool = True
    self_loop: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, adj: jnp.ndarray, *, train: bool,
        vertex_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """`vertex_mask` (B, V) of 0/1 marks PADDING vertices (0). Unlike
        GraphConvLayer's L1-normalized affinity, the learned graph here is
        a SOFTMAX — padding columns are excluded by -1e9 logits (their
        exp underflows to exactly 0 in f32 after the row-max shift, so
        real rows aggregate exactly the unpadded neighbor set; all-pad
        rows degrade to uniform weights and stay finite — their outputs
        are dropped by the caller's masked temporal mean)."""
        h = nn.Dense(
            self.out_features, use_bias=False, kernel_init=classifier_init, name="linear"
        )(x)
        B, V, C = h.shape
        pair = None if vertex_mask is None else _pair_mask(vertex_mask)

        if self.use_pose:
            if pair is not None:
                adj = adj * pair
            adj = l1_normalize(adj, axis=2)
        if self.learn_graph:
            q = nn.Dense(128, kernel_init=classifier_init, name="emb_q")(h)
            k = nn.Dense(128, kernel_init=classifier_init, name="emb_k")(h)
            logits = jnp.einsum("bih,bjh->bij", q, k, preferred_element_type=jnp.float32)
            if pair is not None:
                logits = jnp.where(pair > 0, logits, -1e9)
            graph = jax.nn.softmax(logits, axis=2)
            if self.self_loop:
                logits2 = graph + jnp.eye(V)[None]
                if pair is not None:
                    logits2 = jnp.where(pair > 0, logits2, -1e9)
                graph = jax.nn.softmax(logits2, axis=2)
            if self.use_pose:
                graph = (adj + self.gamma * graph) / (1.0 + self.gamma)
        else:
            graph = adj

        h_prime = jnp.einsum("bij,bjc->bic", graph, h, preferred_element_type=jnp.float32)
        if self.dropout > 0 and train:
            h_prime = nn.Dropout(self.dropout, deterministic=not train)(h_prime)
        h_prime = nn.relu(h_prime)
        h_prime = BatchNorm(use_running_average=not train, name="bn")(
            h_prime.reshape(B * V, C)
        ).reshape(B, V, C)
        assert x.shape == h_prime.shape, "skip connection needs equal sizes"
        return x + self.alpha * h_prime


class BNNeck(nn.Module):
    """BatchNorm bottleneck with frozen (zero) bias before the classifier."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        return BatchNorm(
            use_running_average=not train, use_bias=False, name="bn"
        )(x)


def temporal_attention(
    feat: jnp.ndarray, frame_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Norm-driven temporal fusion (vmgn.py:270-278).

    feat: (B, S, P, C) -> (B, P, C); weights = L1-normalized (over S)
    per-(frame, part) L2 feature norms. `frame_mask` (B, S) zeroes the
    weights of padding frames before normalization, so the fused feature
    equals an unpadded run's (bucketed `--test-sample all`)."""
    att = jnp.linalg.norm(feat, axis=3, keepdims=True)  # (B,S,P,1)
    if frame_mask is not None:
        att = att * frame_mask[:, :, None, None]
    att = l1_normalize(att, axis=1)
    return jnp.sum(feat * att, axis=1)
