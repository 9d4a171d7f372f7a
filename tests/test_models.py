"""Model tests: VMGN forward contract, graph-layer math vs a NumPy oracle,
pyramid pooling parity with torch adaptive-pool semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.models import get_names, init_model, init_params
from agrl_tpu.models.backbone import adaptive_avg_pool_matrix
from agrl_tpu.models.layers import GraphConvLayer, l1_normalize, temporal_attention
from agrl_tpu.models.vmgn import VMGN

TINY = dict(layers=(1, 1, 1, 1), num_classes=5)


def tiny_vmgn(**kw):
    cfg = dict(
        num_classes=5,
        layers=(1, 1, 1, 1),
        num_split=4,
        pyramid_part=True,
        num_gb=1,
        use_pose=True,
        learn_graph=True,
    )
    cfg.update(kw)
    return VMGN(**cfg)


def make_inputs(rng, B=2, S=8, H=64, W=32, total_split=7):
    x = jnp.asarray(rng.rand(B, S, H, W, 3), jnp.float32)
    V = S * total_split
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))
    return x, adj


def jit_train_apply(model, variables, x, adj):
    fn = jax.jit(
        lambda v, x, adj, r: model.apply(
            v, x, adj, train=True, mutable=["batch_stats"], rngs={"subclip": r}
        )
    )
    return fn(variables, x, adj, jax.random.PRNGKey(1))


class TestVMGNForward:
    def test_eval_feature_is_4096d_equivalent(self):
        model = tiny_vmgn()
        rng = np.random.RandomState(0)
        x, adj = make_inputs(rng)
        variables = init_params(model, jax.random.PRNGKey(0), seq_len=8, height=64, width=32)
        feats = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))(variables, x, adj)
        assert feats.shape == (2, 2 * 2048)

    def test_train_outputs_two_heads(self):
        model = tiny_vmgn()
        rng = np.random.RandomState(0)
        x, adj = make_inputs(rng)
        variables = init_params(model, jax.random.PRNGKey(0), seq_len=8, height=64, width=32)
        (outs, feats), _ = jit_train_apply(model, variables, x, adj)
        assert len(outs) == 2 and len(feats) == 2
        assert outs[0].shape == (2, 5) and outs[1].shape == (2, 5)
        assert feats[0].shape == (2, 2048) and feats[1].shape == (2, 2048)

    def test_consistent_loss_adds_three_heads(self):
        model = tiny_vmgn(consistent_loss=True)
        rng = np.random.RandomState(0)
        x, adj = make_inputs(rng)
        variables = init_params(model, jax.random.PRNGKey(0), seq_len=8, height=64, width=32)
        (outs, feats), _ = jit_train_apply(model, variables, x, adj)
        assert len(outs) == 5 and len(feats) == 5

    def test_xent_only_returns_logit_list(self):
        model = tiny_vmgn(loss=frozenset({"xent"}))
        rng = np.random.RandomState(0)
        x, adj = make_inputs(rng)
        variables = init_params(model, jax.random.PRNGKey(0), seq_len=8, height=64, width=32)
        outs, _ = jit_train_apply(model, variables, x, adj)
        assert isinstance(outs, list) and len(outs) == 2


class TestGraphConvLayer:
    def _run(self, use_pose, learn_graph, dist_method="l2"):
        layer = GraphConvLayer(
            in_features=16, out_features=16, use_pose=use_pose,
            learn_graph=learn_graph, dist_method=dist_method,
        )
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 6, 16), jnp.float32)
        adj = jnp.asarray((rng.rand(2, 6, 6) > 0.4).astype(np.float32))
        variables = layer.init(jax.random.PRNGKey(0), x, adj, train=False)
        out = layer.apply(variables, x, adj, train=False)
        return np.asarray(x), np.asarray(adj), variables, np.asarray(out)

    def test_eval_mode_numpy_oracle_l2(self):
        x, adj, variables, out = self._run(use_pose=True, learn_graph=True)
        p = jax.tree.map(np.asarray, variables["params"])
        bs = jax.tree.map(np.asarray, variables["batch_stats"])
        h = x @ p["linear"]["kernel"]
        # pose adj row-L1
        adj_n = adj / np.maximum(np.abs(adj).sum(2, keepdims=True), 1e-12)
        # l2 affinity on input
        sq = (x**2).sum(2)
        d2 = sq[:, None, :] + sq[:, :, None] - 2 * np.einsum("bic,bjc->bij", x, x)
        sim = 2.0 / (np.exp(np.sqrt(np.clip(d2, 1e-12, None))) + 1)
        sim_n = sim / np.maximum(np.abs(sim).sum(2, keepdims=True), 1e-12)
        graph = (adj_n + sim_n) / 2
        hp = np.einsum("bij,bjc->bic", graph, h)
        # eval-mode BN with running stats (mean 0, var 1 at init)
        scale, bias = p["bn"]["scale"], p["bn"]["bias"]
        hp = (hp - bs["bn"]["mean"]) / np.sqrt(bs["bn"]["var"] + 1e-5) * scale + bias
        hp = np.where(hp >= 0, hp, 0.1 * hp)
        want = 0.9 * x + 0.1 * hp
        # float32 device math vs float64 oracle: exp/sqrt amplify rounding
        np.testing.assert_allclose(out, want, atol=5e-4)

    def test_pose_only(self):
        x, adj, variables, out = self._run(use_pose=True, learn_graph=False)
        assert out.shape == x.shape

    def test_learned_only_dot(self):
        x, adj, variables, out = self._run(use_pose=False, learn_graph=True, dist_method="dot")
        assert out.shape == x.shape

    def test_requires_some_graph(self):
        with pytest.raises(AssertionError):
            self._run(use_pose=False, learn_graph=False)


class TestComponents:
    def test_adaptive_pool_matrix_matches_torch_semantics(self):
        torch = pytest.importorskip("torch")
        for in_size, out_size in [(16, 4), (16, 2), (16, 1), (7, 3), (5, 4)]:
            m = np.asarray(adaptive_avg_pool_matrix(in_size, out_size))
            x = np.random.RandomState(0).randn(1, 1, in_size, 1)
            t = torch.nn.AdaptiveAvgPool2d((out_size, 1))(torch.tensor(x, dtype=torch.float64))
            want = t.numpy()[0, 0, :, 0]
            got = m @ x[0, 0, :, 0]
            np.testing.assert_allclose(got, want, atol=1e-9, err_msg=f"{in_size}->{out_size}")

    def test_temporal_attention_matches_oracle(self):
        rng = np.random.RandomState(0)
        feat = rng.randn(2, 8, 7, 16).astype(np.float32)
        got = np.asarray(temporal_attention(jnp.asarray(feat)))
        att = np.linalg.norm(feat, axis=3, keepdims=True)
        att = att / np.maximum(np.abs(att).sum(1, keepdims=True), 1e-12)
        want = (feat * att).sum(1)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_l1_normalize_eps_guard(self):
        x = jnp.zeros((2, 3))
        out = l1_normalize(x, axis=1)
        assert not np.isnan(np.asarray(out)).any()

    def test_registry(self):
        assert "vmgn" in get_names()
        m = init_model("vmgn", num_classes=10, loss={"xent", "htri"})
        assert isinstance(m, VMGN)
        with pytest.raises(KeyError):
            init_model("nope", num_classes=10)


def test_bf16_dtype_reaches_whole_vmgn_family():
    """--bf16-train passes dtype= to init_model for every arch; gsta/ganet
    must honor it, not swallow it in **kwargs."""
    from agrl_tpu.models import init_model

    for arch in ("vmgn", "gsta", "ganet"):
        m = init_model(
            arch, num_classes=4, loss={"xent", "htri"}, dtype=jnp.bfloat16
        )
        assert m.dtype == jnp.bfloat16, arch


def test_batchnorm_survives_constant_channels():
    """Constant-channel BN finiteness guard (a NaN hazard on TPU): raw
    one-pass variance E[x^2] - E[x]^2 of a (numerically) constant channel
    can come out NEGATIVE beyond epsilon (e.g. a channel bf16-rounding
    collapsed to one value), and rsqrt(var + eps) would go NaN. The shared
    BatchNorm relies on flax's _compute_stats clamp
    (var = max(0, E[x^2] - E[x]^2), f32 statistics) — this test pins that
    the guarantee holds for whatever variance path backbone.BatchNorm is
    configured with, in f32 AND bf16, batch stats AND the running stats
    they update."""
    import numpy as np

    from agrl_tpu.models.backbone import BatchNorm

    # 123.456f repeated: raw one-pass f32 variance is ~ -0.018 < -eps
    x = jnp.full((640, 4), jnp.float32(123.456))
    fast = jnp.mean(x * x, axis=0) - jnp.mean(x, axis=0) ** 2
    assert float(fast.min()) < -1e-5  # the hazard is real on this input

    for dtype in (None, jnp.bfloat16):
        bn = BatchNorm(use_running_average=False, dtype=dtype)
        xd = x if dtype is None else x.astype(dtype)
        v = bn.init(jax.random.PRNGKey(0), xd)
        y, mut = bn.apply(v, xd, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(y, np.float32)).all()
        # the running variance must stay nonnegative too (it feeds eval rsqrt)
        ra_var = np.asarray(mut["batch_stats"]["var"])
        assert (ra_var >= 0).all()


def test_l2_affinity_gradients_finite_at_large_distances():
    """Regression for a mid-training NaN on real-size models: the
    reference's literal 2/(exp(d)+1) overflows exp at d > ~88 and its
    BACKWARD becomes inf/inf = NaN. The sigmoid form must keep gradients
    finite (decaying to 0) for arbitrarily large feature norms."""
    import numpy as np

    from agrl_tpu.models.layers import l2_affinity

    v = jnp.asarray(np.random.RandomState(0).randn(1, 6, 16), jnp.float32) * 100.0
    # pairwise distances here are O(1000) >> 88: exp would overflow
    val, grad = jax.value_and_grad(lambda v: l2_affinity(v).sum())(v)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()


class TestBlendGraphL2VJP:
    """blend_graph_l2 (the fused graph build with a hand-written backward,
    models/layers.py) must match the inline composition it replaces —
    forward AND gradients — for the vmgn/gsta l2 path it is gated to."""

    @staticmethod
    def _inline(x, adj):
        from agrl_tpu.models.layers import l1_normalize, l2_affinity

        adjn = l1_normalize(adj, axis=2)
        graphn = l1_normalize(l2_affinity(x), axis=2)
        return (adjn + graphn) / 2.0

    def _data(self, seed=0, B=3, V=14, C=24):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(B, V, C), jnp.float32)
        adj = jnp.asarray((rng.rand(B, V, V) > 0.4).astype(np.float32))
        # include an all-zero adjacency row (missing pose): the eps-clamped
        # normalize backward must stay finite and match autodiff
        adj = adj.at[0, 2, :].set(0.0)
        return x, adj

    def test_forward_matches_inline(self):
        from agrl_tpu.models.layers import blend_graph_l2

        x, adj = self._data()
        got = np.asarray(blend_graph_l2(x, adj))
        want = np.asarray(self._inline(x, adj))
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)

    def test_gradients_match_autodiff(self):
        from agrl_tpu.models.layers import blend_graph_l2

        x, adj = self._data(seed=1)
        rng = np.random.RandomState(7)
        ct = jnp.asarray(rng.randn(*self._inline(x, adj).shape), jnp.float32)

        def loss_fused(x, adj):
            return jnp.sum(blend_graph_l2(x, adj) * ct)

        def loss_inline(x, adj):
            return jnp.sum(self._inline(x, adj) * ct)

        gx_f, ga_f = jax.grad(loss_fused, argnums=(0, 1))(x, adj)
        gx_i, ga_i = jax.grad(loss_inline, argnums=(0, 1))(x, adj)
        assert np.isfinite(np.asarray(gx_f)).all()
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_i),
                                   atol=2e-5, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(ga_f), np.asarray(ga_i),
                                   atol=2e-5, rtol=2e-4)

    # NOTE: production GraphConvLayer stays on the autodiff composition —
    # the fused VJP measured NEUTRAL in the full train step on the chip
    # (PROFILE.md "fused graph backward"); blend_graph_l2 remains tested
    # optimization infrastructure (the two tests above pin its math).
