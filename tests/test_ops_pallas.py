"""Pallas kernel parity tests (interpret mode on CPU) vs jnp oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.losses import hard_mine, pairwise_euclidean
from agrl_tpu.ops.graph_conv import graph_propagate_pallas, graph_propagate_reference
from agrl_tpu.ops.triplet import hard_mine_pallas


class TestGraphConvKernel:
    def setup_method(self):
        rng = np.random.RandomState(0)
        self.B, self.V, self.C = 2, 56, 1024  # V=8*7 like vmgn; C multiple of 512
        self.f = rng.randn(self.B, self.V, self.C).astype(np.float32) * 0.1
        self.adj = (rng.rand(self.B, self.V, self.V) > 0.5).astype(np.float32)
        self.W = (rng.randn(self.C, self.C) * 0.01).astype(np.float32)
        self.scale = rng.rand(self.C).astype(np.float32) + 0.5
        self.bias = rng.randn(self.C).astype(np.float32) * 0.1
        self.mean = rng.randn(self.C).astype(np.float32) * 0.1
        self.var = rng.rand(self.C).astype(np.float32) + 0.5

    def test_parity_vs_reference(self):
        want = np.asarray(
            graph_propagate_reference(
                self.f, self.adj, self.W, self.scale, self.bias, self.mean, self.var
            )
        )
        got = np.asarray(
            graph_propagate_pallas(
                self.f, self.adj, self.W, self.scale, self.bias, self.mean,
                self.var, weight_tile=512, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_parity_matches_graph_conv_layer_eval(self):
        """The kernel must equal GraphConvLayer's eval forward."""
        from agrl_tpu.models.layers import GraphConvLayer

        layer = GraphConvLayer(in_features=self.C, out_features=self.C)
        variables = {
            "params": {"linear": {"kernel": jnp.asarray(self.W)},
                       "bn": {"scale": jnp.asarray(self.scale), "bias": jnp.asarray(self.bias)}},
            "batch_stats": {"bn": {"mean": jnp.asarray(self.mean), "var": jnp.asarray(self.var)}},
        }
        want = np.asarray(
            layer.apply(variables, jnp.asarray(self.f), jnp.asarray(self.adj), train=False)
        )
        got = np.asarray(
            graph_propagate_pallas(
                self.f, self.adj, self.W, self.scale, self.bias, self.mean,
                self.var, weight_tile=512, interpret=True,
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-4)


class TestTripletKernel:
    @pytest.mark.parametrize("B", [16, 15])  # aligned and ragged batch
    def test_parity(self, B):
        rng = np.random.RandomState(1)
        feats = rng.randn(B, 64).astype(np.float32)
        labels = np.repeat(np.arange(4), -(-B // 4))[:B]
        got_ap, got_an = hard_mine_pallas(
            jnp.asarray(feats), jnp.asarray(labels), interpret=True
        )
        dist = pairwise_euclidean(jnp.asarray(feats))
        want_ap, want_an = hard_mine(dist, jnp.asarray(labels))
        np.testing.assert_allclose(np.asarray(got_ap), np.asarray(want_ap), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_an), np.asarray(want_an), atol=1e-4)


class TestGraphConvKernelV2:
    def test_parity_vs_reference(self):
        """v2 (single-pass W streaming) vs the f32 reference on the same
        bf16-rounded inputs it uses internally."""
        import jax.numpy as jnp

        from agrl_tpu.ops.graph_conv_v2 import graph_propagate_pallas_v2

        rng = np.random.RandomState(0)
        B, V, C = 16, 56, 1024
        f = (rng.randn(B, V, C) * 0.1).astype(np.float32)
        adj = (rng.rand(B, V, V) > 0.5).astype(np.float32)
        W = (rng.randn(C, C) * 0.01).astype(np.float32)
        scale = rng.rand(C).astype(np.float32) + 0.5
        bias = (rng.randn(C) * 0.1).astype(np.float32)
        mean = (rng.randn(C) * 0.1).astype(np.float32)
        var = rng.rand(C).astype(np.float32) + 0.5

        f_rounded = np.asarray(jnp.asarray(f, jnp.bfloat16), np.float32)
        adj_rounded = np.asarray(jnp.asarray(adj, jnp.bfloat16), np.float32)
        want = np.asarray(
            graph_propagate_reference(f_rounded, adj_rounded, W, scale, bias, mean, var)
        )
        got = np.asarray(
            graph_propagate_pallas_v2(
                f, adj, W, scale, bias, mean, var, weight_tile=256, interpret=True
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-3)


class TestMinSumKernel:
    """Pallas min-plus matmul (ops/minsum.py) vs its jnp twin — the
    Jaccard accumulation of device re-ranking."""

    @pytest.mark.parametrize("shape", [(37, 53, 100), (130, 260, 515), (8, 8, 8)])
    def test_parity(self, shape):
        from agrl_tpu.ops.minsum import min_sum_pallas, min_sum_reference

        Q, J, C = shape
        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.rand(Q, C).astype(np.float32))
        b = jnp.asarray(rng.rand(J, C).astype(np.float32))
        got = min_sum_pallas(a, b, tq=16, tj=16, tc=32, interpret=True)
        want = min_sum_reference(a, b)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_matches_rerank_scan_formulation(self):
        from agrl_tpu.ops.minsum import min_sum_pallas
        from agrl_tpu.ops import rerank

        rng = np.random.RandomState(1)
        vq = jnp.asarray(rng.rand(11, 40).astype(np.float32))
        v = jnp.asarray(rng.rand(40, 40).astype(np.float32))
        scan = rerank._min_sum(vq, v)  # cpu backend -> scan path
        pallas = min_sum_pallas(vq, v, tq=8, tj=8, tc=16, interpret=True)
        np.testing.assert_allclose(scan, pallas, atol=1e-4)
