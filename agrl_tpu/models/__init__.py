"""Model registry (parity with reference torchreid/models/__init__.py:17-41).

`init_model(name, ...)` returns a Flax module; `init_params(model, ...)`
creates its variables (params + batch_stats). Registered names mirror the
reference factory; each entry cites the reference implementation it
behaviorally matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from agrl_tpu.models.ganet import ganet
from agrl_tpu.models.graphnet import msppgn, msppn
from agrl_tpu.models.gsta import gsta
from agrl_tpu.models.res50tp import res50tp, resnet50_s1
from agrl_tpu.models.resnet3d import resnet3d, resnet3dt
from agrl_tpu.models.resnet_image import (
    resnet50_image,
    resnet50b,
    resnet50m,
    resnet101_image,
)
from agrl_tpu.models.resnet_temporal import res50rnn, res50ta, res50tp_legacy
from agrl_tpu.models.sta import simple_sta_p4, sta_p4
from agrl_tpu.models.vmgn import VMGN, vmgn
from agrl_tpu.models.weight_convert import (
    convert_reference_checkpoint,
    init_pretrained_weights,
    load_any_checkpoint,
)

def vmgn_tiny(num_classes, loss={"xent", "htri"}, **kwargs):
    """Depth-(1,1,1,1) VMGN for tests/smoke runs (not in the reference)."""
    kwargs.pop("num_scale", None)
    return VMGN(
        num_classes=num_classes,
        loss=frozenset(loss),
        layers=(1, 1, 1, 1),
        last_stride=kwargs.pop("last_stride", 1),
        num_split=kwargs.pop("num_split", 4),
        pyramid_part=kwargs.pop("pyramid_part", True),
        num_gb=kwargs.pop("num_gb", 2),
        use_pose=kwargs.pop("use_pose", True),
        learn_graph=kwargs.pop("learn_graph", True),
        consistent_loss=kwargs.pop("consistent_loss", False),
    )


__model_factory = {
    # reference factory parity (models/__init__.py:17-27)
    "vmgn": vmgn,  # models/vmgn.py:373 (the paper model)
    "gsta": gsta,  # models/gsta.py:340
    "ganet": ganet,  # models/ganet.py:458
    "msppn": msppn,  # models/graphnet.py:120
    "msppgn": msppgn,  # models/graphnet.py:217
    "sta": sta_p4,  # models/sta.py:268
    "simple_sta": simple_sta_p4,  # models/simple_sta.py:243
    "res50tp": res50tp,  # models/res50tp.py:224
    "resnet50_s1": resnet50_s1,  # models/resnet50_s1.py:217
    "vmgn_tiny": vmgn_tiny,  # debug/smoke-test arch (not in the reference)
    # legacy VIDEO families (unregistered in the reference —
    # models/resnet_temporal.py, resnet3d.py, resnet3dt.py)
    "res50tp_legacy": res50tp_legacy,
    "res50ta": res50ta,
    "res50rnn": res50rnn,
    "resnet3d50": resnet3d,
    "resnet3dt": resnet3dt,
}

# IMAGE re-id archs (single-image input, no adjacency — reference
# models/resnet.py, also unregistered there). Kept in a separate registry:
# the video driver's clip contract does not apply to them.
__image_model_factory = {
    "resnet50": resnet50_image,
    "resnet101": resnet101_image,
    "resnet50m": resnet50m,
    "resnet50b": resnet50b,
}


def get_image_names():
    return list(__image_model_factory.keys())


def init_image_model(name: str, *args, **kwargs):
    if name not in __image_model_factory:
        raise KeyError(f"Unknown image model: {name}. Choices: {get_image_names()}")
    return __image_model_factory[name](*args, **kwargs)


def init_image_params(model, rng, height=256, width=128, batch_size=2):
    """Initialize an image-reid model's variables (train mode, all rngs)."""
    x = jnp.zeros((batch_size, height, width, 3), jnp.float32)
    k1, k2 = jax.random.split(rng)

    @jax.jit
    def _init(k1, k2, x):
        return model.init({"params": k1, "dropout": k2}, x, train=True)

    return _init(k1, k2, x)


def get_names():
    return list(__model_factory.keys())


def register_model(name: str, builder) -> None:
    __model_factory[name] = builder


def init_model(name: str, *args, **kwargs):
    if name not in __model_factory:
        raise KeyError(f"Unknown model: {name}. Choices: {get_names()}")
    return __model_factory[name](*args, **kwargs)


def default_num_vertices(model, seq_len: int) -> int:
    """Adjacency vertex count for a dummy/all-ones graph: frames x parts
    per frame x vertex scales (graphnet models span 3 feature scales).
    The single source of truth — init_params, the FLOPs probe, and the
    serving export all size their adjacency through this."""
    return (
        seq_len
        * getattr(model, "total_split", 1)
        * getattr(model, "num_vertex_scales", 1)
    )


def init_params(
    model,
    rng: jax.Array,
    seq_len: int = 8,
    height: int = 256,
    width: int = 128,
    num_vertices: int | None = None,
    batch_size: int = 2,
):
    """Initialize model variables with a dummy clip batch.

    Initialization runs in train mode so every head (classifiers,
    consistent-loss path) materializes its parameters."""
    if num_vertices is None:
        num_vertices = default_num_vertices(model, seq_len)
    x = jnp.zeros((batch_size, seq_len, height, width, 3), jnp.float32)
    adj = jnp.ones((batch_size, num_vertices, num_vertices), jnp.float32)
    p_rng, s_rng = jax.random.split(rng)

    # jit the whole init: one XLA program instead of thousands of eager
    # per-op dispatches (orders of magnitude faster on all backends)
    @jax.jit
    def _init(p_rng, s_rng, x, adj):
        return model.init({"params": p_rng, "subclip": s_rng}, x, adj, train=True)

    return _init(p_rng, s_rng, x, adj)
