"""Forward contracts for the legacy model families (image-reid ResNets,
temporal baselines, 3D ResNets)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.models.resnet3d import ResNet3D
from agrl_tpu.models.resnet_image import ResNet50B, ResNet50M, ResNetImage
from agrl_tpu.models.resnet_temporal import ResNet50RNN, ResNet50TA, ResNet50TPLegacy

TINY = (1, 1, 1, 1)


def run(model, x, train, rngs_extra=None):
    extra = dict(rngs_extra or {})
    init_rngs = {"params": jax.random.PRNGKey(0), **extra}
    # init in train mode so all heads materialize
    variables = jax.jit(lambda x: model.init(init_rngs, x, train=True))(x)
    if train:
        fn = jax.jit(
            lambda v, x: model.apply(
                v, x, train=True, mutable=["batch_stats"], rngs=extra
            )
        )
        out, _ = fn(variables, x)
        return out
    return jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)


class TestImageModels:
    def setup_method(self):
        self.x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 32, 3), jnp.float32)

    def test_resnet_image(self):
        m = ResNetImage(num_classes=5, layers=TINY, loss=frozenset({"xent", "htri"}))
        f = run(m, self.x, train=False)
        assert f.shape == (2, 2048)
        y, f = run(m, self.x, train=True)
        assert y.shape == (2, 5)

    def test_resnet50m_midlevel_feature(self):
        m = ResNet50M(num_classes=5, layers=TINY)
        f = run(m, self.x, train=False)
        assert f.shape == (2, 3072)  # 2048 + 1024 mid

    def test_resnet50b(self):
        m = ResNet50B(num_classes=5, layers=TINY, loss=frozenset({"xent", "htri"}))
        f = run(m, self.x, train=False)
        assert f.shape == (2, 2048)
        y, f = run(m, self.x, train=True, rngs_extra={"dropout": jax.random.PRNGKey(1)})
        assert y.shape == (2, 5)


class TestTemporalModels:
    def setup_method(self):
        self.x = jnp.asarray(np.random.RandomState(0).rand(2, 4, 64, 32, 3), jnp.float32)

    def test_tp(self):
        m = ResNet50TPLegacy(num_classes=5, layers=TINY)
        assert run(m, self.x, train=False).shape == (2, 2048)

    def test_ta_attention_sums_to_one(self):
        m = ResNet50TA(num_classes=5, layers=TINY)
        assert run(m, self.x, train=False).shape == (2, 2048)

    def test_rnn(self):
        m = ResNet50RNN(num_classes=5, layers=TINY)
        assert run(m, self.x, train=False).shape == (2, 512)


class TestResNet3D:
    @pytest.mark.parametrize("depth,dim", [(10, 512), (50, 2048)])
    def test_forward(self, depth, dim):
        m = ResNet3D(num_classes=5, depth=depth, loss=frozenset({"xent", "htri"}))
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 32, 32, 3), jnp.float32)
        f = run(m, x, train=False)
        assert f.shape == (1, dim)


def test_full_registry():
    from agrl_tpu.models import get_image_names, get_names

    assert {"res50tp_legacy", "res50ta", "res50rnn", "resnet3d50", "resnet3dt"} <= set(
        get_names()
    )
    assert {"resnet50", "resnet101", "resnet50m", "resnet50b"} == set(get_image_names())


def test_image_model_init_params():
    from agrl_tpu.models import init_image_params

    m = ResNet50B(num_classes=4, loss=frozenset({"xent", "htri"}), layers=TINY)
    variables = init_image_params(m, jax.random.PRNGKey(0), height=64, width=32)
    assert "params" in variables
