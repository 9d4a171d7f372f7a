"""Forward-contract tests for every registered architecture: output
shapes/types in train and eval mode, on tiny-depth configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.models.ganet import GANet
from agrl_tpu.models.graphnet import MSPyraPartGraphNet, MSPyraPartNet
from agrl_tpu.models.gsta import GSTA, drop_one_frame_per_sample
from agrl_tpu.models.res50tp import ResNet50S1, ResNet50TP
from agrl_tpu.models.sta import STA

TINY = dict(num_classes=5, layers=(1, 1, 1, 1))
B, S, H, W = 2, 8, 64, 32


def run_model(model, V, train, consistent=False):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, S, H, W, 3), jnp.float32)
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))

    @jax.jit
    def init(k1, k2, x, adj):
        return model.init({"params": k1, "subclip": k2}, x, adj, train=True)

    variables = init(jax.random.PRNGKey(0), jax.random.PRNGKey(1), x, adj)
    if train:
        fn = jax.jit(
            lambda v, x, a, r: model.apply(
                v, x, a, train=True, mutable=["batch_stats"], rngs={"subclip": r}
            )
        )
        out, _ = fn(variables, x, adj, jax.random.PRNGKey(2))
        return out
    fn = jax.jit(lambda v, x, a: model.apply(v, x, a, train=False))
    return fn(variables, x, adj)


class TestZooForwardContracts:
    def test_gsta(self):
        m = GSTA(**TINY, num_split=4, pyramid_part=True, num_gb=1)
        V = S * m.total_split
        feats = run_model(m, V, train=False)
        assert feats.shape == (B, 2048)
        y, f = run_model(m, V, train=True)
        assert y.shape == (B, 5) and f.shape == (B, 2048)

    def test_gsta_consistent(self):
        m = GSTA(**TINY, num_split=4, pyramid_part=True, num_gb=1, consistent_loss=True)
        V = S * m.total_split
        (ys, fs) = run_model(m, V, train=True)
        assert len(ys) == 2 and len(fs) == 2
        assert ys[1].shape == (B, 5) and fs[1].shape == (B, 2048)

    def test_ganet_concat_feature(self):
        m = GANet(**TINY, num_split=4, pyramid_part=True, num_gb=2)
        V = S * m.total_split
        feats = run_model(m, V, train=False)
        assert feats.shape == (B, 3 * 2048)  # (num_gb+1) * 2048
        y, f = run_model(m, V, train=True)
        assert y.shape == (B, 5) and f.shape == (B, 3 * 2048)

    def test_msppn(self):
        m = MSPyraPartNet(num_classes=5, layers=(1, 1, 1, 1), num_split=4)
        V = 3 * m.total_split * S
        feats = run_model(m, V, train=False)
        assert feats.shape == (B, 512)
        ys, fs = run_model(m, V, train=True)
        assert len(ys) == 3 * m.total_split + 1
        assert len(fs) == 3 * m.total_split + 1

    def test_msppgn(self):
        m = MSPyraPartGraphNet(num_classes=5, layers=(1, 1, 1, 1), num_split=2, num_gb=2)
        V = 3 * m.total_split * S
        feats = run_model(m, V, train=False)
        assert feats.shape == (B, 3 * 512)  # (num_gb+1) * 512
        ys, fs = run_model(m, V, train=True)
        assert len(ys) == 3 * m.total_split + 1
        assert ys[0].shape == (B, 5)

    @pytest.mark.parametrize("simple", [False, True])
    def test_sta(self, simple):
        m = STA(**TINY, reduced_dim=64, simple=simple)
        feats = run_model(m, 1, train=False)
        assert feats.shape == (B, 64)
        y, f = run_model(m, 1, train=True)
        assert y.shape == (B, 5) and f.shape == (B, 64)

    def test_res50tp(self):
        m = ResNet50TP(**TINY)
        feats = run_model(m, 1, train=False)
        assert feats.shape == (B, 2048)
        y, f = run_model(m, 1, train=True)
        assert y.shape == (B, 5) and f.shape == (B, 2048)

    def test_resnet50_s1(self):
        m = ResNet50S1(**TINY)
        feats = run_model(m, 1, train=False)
        assert feats.shape == (B, 2048)
        y, f = run_model(m, 1, train=True)
        assert y.shape == (B, 5) and f.shape == (B, 2048)


def test_registry_covers_reference_factory():
    from agrl_tpu.models import get_names

    reference_names = {
        "vmgn", "gsta", "ganet", "msppn", "msppgn",
        "sta", "simple_sta", "res50tp", "resnet50_s1",
    }
    assert reference_names <= set(get_names())


def test_drop_one_frame_per_sample():
    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.rand(4, 8, 2, 3), jnp.float32)
    out = drop_one_frame_per_sample(f, jax.random.PRNGKey(0))
    assert out.shape == (4, 7, 2, 3)
    # each output row must be the input with exactly one frame removed,
    # order preserved
    f_np, out_np = np.asarray(f), np.asarray(out)
    for b in range(4):
        matched = False
        for drop in range(8):
            kept = np.delete(f_np[b], drop, axis=0)
            if np.allclose(kept, out_np[b]):
                matched = True
                break
        assert matched


def test_graphnet_default_init_params_vertex_count():
    """init_params/complexity probe without num_vertices must account for
    graphnet's 3 feature scales (V = 3 * total_split * S), or the CLI's
    create_train_state crashes for msppgn."""
    import jax

    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.utils.model_complexity import compute_model_complexity

    model = init_model(
        "msppgn", num_classes=3, loss={"xent", "htri"}, num_split=2, num_gb=1
    )
    v = init_params(model, jax.random.PRNGKey(0), seq_len=2, height=64, width=32,
                    batch_size=1)
    assert "params" in v
    n_params, gflops = compute_model_complexity(
        model, v, seq_len=2, height=64, width=32, verbose=False
    )
    import numpy as np

    assert np.isfinite(gflops) and gflops > 0
