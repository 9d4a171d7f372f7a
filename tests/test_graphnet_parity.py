"""msppn / msppgn full-model parity vs the actual reference implementation
(torchreid/models/graphnet.py).

The reference builds its backbone by calling
torchvision.models.resnet50(pretrained=True); torchvision is not
installed, so a faithful in-test stand-in (standard torchvision ResNet-50
module layout and child order) is injected as the `torchvision` stub's
resnet50 — random weights, which is exactly what parity needs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REF = "/root/reference"


class _Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


class _ResNet50(tnn.Module):
    """torchvision.models.resnet50 layout: child order matters (msppgn
    slices children()[:-2] into a Sequential)."""

    def __init__(self):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(2048, 1000)

    def _make_layer(self, planes, blocks, stride):
        downsample = tnn.Sequential(
            tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
            tnn.BatchNorm2d(planes * 4),
        )
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)


@pytest.fixture(scope="module", autouse=True)
def ref_graphnet_env():
    sys.path.insert(0, REF)
    prev = sys.modules.get("torchvision")
    tv = types.ModuleType("torchvision")
    tv.models = types.SimpleNamespace(resnet50=lambda pretrained=True: _ResNet50())
    sys.modules["torchvision"] = tv
    # graphnet may already be imported with the bare stub from other tests
    sys.modules.pop("torchreid.models.graphnet", None)
    yield
    sys.modules.pop("torchreid.models.graphnet", None)
    if prev is not None:
        sys.modules["torchvision"] = prev
    else:
        sys.modules.pop("torchvision", None)
    sys.path.remove(REF)


def _randomize_bn_stats(tmodel, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _parity(tmodel, fmodel, skipped_expected, seed, v):
    import importlib  # noqa: F401

    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import convert_graphnet_state_dict, merge_converted

    arch = "msppgn" if any(k.startswith("base.") for k in tmodel.state_dict()) else "msppn"
    _randomize_bn_stats(tmodel, seed)
    converted, skipped = convert_graphnet_state_dict(tmodel.state_dict(), arch)
    bad = [n for n in skipped if not n.startswith(skipped_expected)]
    assert not bad, bad[:5]

    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=4, height=128, width=64,
        num_vertices=v, batch_size=1,
    )
    merged, matched, skips = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skips, skips[:5]

    rng = np.random.RandomState(seed)
    x = rng.rand(2, 4, 3, 128, 64).astype(np.float32)
    adj = (rng.rand(2, v, v) + np.eye(v)).astype(np.float32)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.tensor(x), torch.tensor(adj)).numpy()
    got = np.asarray(
        fmodel.apply(
            merged, jnp.asarray(x.transpose(0, 1, 3, 4, 2)), jnp.asarray(adj),
            train=False,
        )
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_msppn_full_model_parity_vs_reference():
    import importlib

    ref = importlib.import_module("torchreid.models.graphnet")
    tmodel = ref.MSPyraPartNet(num_classes=8, loss={"xent", "htri"}, num_split=4)

    from agrl_tpu.models.graphnet import msppn

    fmodel = msppn(num_classes=8, loss={"xent", "htri"}, num_split=4)
    # msppn vertices: 3 scales x total_split(4->7) x ... adj unused
    _parity(tmodel, fmodel, skipped_expected=(), seed=11, v=4 * 3 * 7)


def test_msppgn_full_model_parity_vs_reference():
    import importlib

    ref = importlib.import_module("torchreid.models.graphnet")
    tmodel = ref.MSPyraPartGraphNet(
        num_classes=8, loss={"xent", "htri"}, num_split=4, use_pose=True,
        learn_graph=True, num_gb=2,
    )

    from agrl_tpu.models.graphnet import msppgn

    fmodel = msppgn(
        num_classes=8, loss={"xent", "htri"}, num_split=4, use_pose=True,
        learn_graph=True, num_gb=2,
    )
    # V = num_scale(3) * total_split(7) * seq_len(4)... graph runs over the
    # (3*total_split*S) vertex axis; the adjacency must match that length
    _parity(tmodel, fmodel, skipped_expected=(), seed=12, v=3 * 7 * 4)


@pytest.mark.parametrize("arch", ["msppn", "msppgn"])
def test_graphnet_reverse_export_round_trip(arch):
    """torch -> flax -> torch is bit-equal for the graphnet family too:
    the reverse exporter shares the forward name map, incl. the msppn
    fusion Conv1d (1, V, 1) reshape and the fused-classifier index."""
    import importlib

    import jax

    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.models.weight_convert import (
        convert_graphnet_state_dict,
        export_torch_state_dict,
        merge_converted,
    )

    ref = importlib.import_module("torchreid.models.graphnet")
    kwargs = dict(num_classes=8, loss={"xent", "htri"}, num_split=4)
    if arch == "msppn":
        tmodel = ref.MSPyraPartNet(**kwargs)
        fmodel = init_model("msppn", **kwargs)
    else:
        kwargs.update(use_pose=True, learn_graph=True, num_gb=2)
        tmodel = ref.MSPyraPartGraphNet(**kwargs)
        fmodel = init_model("msppgn", **kwargs)
    _randomize_bn_stats(tmodel, seed=31)
    sd = tmodel.state_dict()

    converted, skipped = convert_graphnet_state_dict(sd, arch)
    assert not skipped, skipped[:5]
    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=4, height=128, width=64,
        num_vertices=3 * 7 * 4, batch_size=1,
    )
    merged, _, skips = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skips, skips[:5]

    state, filled, kept = export_torch_state_dict(merged, sd, arch)
    assert set(state) == set(sd)
    assert all(n.endswith("num_batches_tracked") for n in kept), kept[:5]
    for name, want in sd.items():
        np.testing.assert_array_equal(
            state[name], want.numpy().astype(np.float32), err_msg=name
        )


# ---------------------------------------------------------------------------
# legacy temporal family (ResNet50TP/TA/RNN) vs the reference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "ref_cls,flax_name",
    [("ResNet50TP", "res50tp_legacy"), ("ResNet50TA", "res50ta"), ("ResNet50RNN", "res50rnn")],
)
def test_temporal_legacy_parity_vs_reference(ref_cls, flax_name):
    import importlib

    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.models.weight_convert import convert_temporal_state_dict, merge_converted

    sys.modules.pop("torchreid.models.resnet_temporal", None)
    ref = importlib.import_module("torchreid.models.resnet_temporal")
    tmodel = getattr(ref, ref_cls)(num_classes=5, loss={"xent", "htri"}).eval()
    _randomize_bn_stats(tmodel, seed=21)

    converted, skipped = convert_temporal_state_dict(tmodel.state_dict())
    assert not skipped, skipped[:5]

    fmodel = init_model(flax_name, num_classes=5, loss={"xent", "htri"})
    # TA's attention_conv kernel is (7, 4) == the 224x112 feature map
    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=3, height=224, width=112, batch_size=1
    )
    merged, matched, skips = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skips, skips[:5]

    rng = np.random.RandomState(21)
    x = rng.rand(1, 3, 3, 224, 112).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()
    got = np.asarray(
        fmodel.apply(merged, jnp.asarray(x.transpose(0, 1, 3, 4, 2)), None, train=False)
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_resnet3d_parity_vs_reference():
    """3D ResNet (Kinetics family): pooled eval features match the
    reference ResNet3dT composition (children()[:-1] + adaptive pool,
    resnet3dt.py:24-36) at depth 10."""
    import importlib

    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.models.weight_convert import convert_resnet3d_state_dict, merge_converted

    ref = importlib.import_module("torchreid.models.resnet3d")
    tm = ref.ResNet3d(ref.BasicBlock, [1, 1, 1, 1], num_classes=7).eval()
    _randomize_bn_stats(tm, seed=31)

    converted, skipped = convert_resnet3d_state_dict(tm.state_dict())
    assert not skipped, skipped[:5]

    fmodel = init_model("resnet3d50", num_classes=7, loss={"xent", "htri"}, depth=10)
    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=4, height=64, width=32, batch_size=1
    )
    merged, matched, skips = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skips, skips[:5]

    rng = np.random.RandomState(31)
    x = rng.rand(2, 4, 3, 64, 32).astype(np.float32)  # (B, S, C, H, W)
    base = tnn.Sequential(*list(tm.children())[:-1])
    with torch.no_grad():
        z = base(torch.tensor(x).permute(0, 2, 1, 3, 4))
        want = torch.nn.functional.adaptive_avg_pool3d(z, 1).flatten(1).numpy()
    got = np.asarray(
        fmodel.apply(merged, jnp.asarray(x.transpose(0, 1, 3, 4, 2)), None, train=False)
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# legacy image family (ResNet50/101/50M/50B) vs the reference
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "ref_cls,flax_name,layers",
    [
        ("ResNet50", "resnet50", (3, 4, 6, 3)),
        ("ResNet101", "resnet101", (3, 4, 23, 3)),
        ("ResNet50B", "resnet50b", (3, 4, 6, 3)),
    ],
)
def test_image_family_parity_vs_reference(ref_cls, flax_name, layers):
    import importlib

    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_image_model, init_image_params
    from agrl_tpu.models.weight_convert import convert_temporal_state_dict, merge_converted

    # resnet101 stub: same layout, deeper layer3
    class _ResNet101(_ResNet50):
        def __init__(self):
            tnn.Module.__init__(self)
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, 3, 1)
            self.layer2 = self._make_layer(128, 4, 2)
            self.layer3 = self._make_layer(256, 23, 2)
            self.layer4 = self._make_layer(512, 3, 2)
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(2048, 1000)

    tv = sys.modules["torchvision"]
    tv.models.resnet101 = lambda pretrained=True: _ResNet101()

    sys.modules.pop("torchreid.models.resnet", None)
    ref = importlib.import_module("torchreid.models.resnet")
    tmodel = getattr(ref, ref_cls)(num_classes=5, loss={"xent", "htri"}).eval()
    _randomize_bn_stats(tmodel, seed=41)

    converted, skipped = convert_temporal_state_dict(tmodel.state_dict())
    # ResNet50B's train-only bottleneck head has no temporal counterpart
    bad = [n for n in skipped if not n.startswith("bottleneck.")]
    assert not bad, bad[:5]

    fmodel = init_image_model(flax_name, num_classes=5, loss={"xent", "htri"})
    variables = init_image_params(
        fmodel, jax.random.PRNGKey(0), height=64, width=32, batch_size=1
    )
    # the image models use 'backbone'; classifier shapes match; the B
    # variant's Flax bottleneck_fc/bn keep their init (train-only head)
    merged, matched, skips = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skips, skips[:5]

    rng = np.random.RandomState(41)
    x = rng.rand(2, 3, 64, 32).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()
    got = np.asarray(
        fmodel.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_resnet50m_parity_vs_reference():
    import importlib

    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_image_model, init_image_params
    from agrl_tpu.models.weight_convert import convert_resnet50m_state_dict, merge_converted

    sys.modules.pop("torchreid.models.resnet", None)
    ref = importlib.import_module("torchreid.models.resnet")
    tmodel = ref.ResNet50M(num_classes=5, loss={"xent", "htri"}).eval()
    _randomize_bn_stats(tmodel, seed=42)

    converted, skipped = convert_resnet50m_state_dict(tmodel.state_dict())
    bad = [n for n in skipped if "layers2.0" not in n]  # the maxpool
    assert not bad, bad[:5]

    fmodel = init_image_model("resnet50m", num_classes=5, loss={"xent", "htri"})
    variables = init_image_params(
        fmodel, jax.random.PRNGKey(0), height=64, width=32, batch_size=1
    )
    merged, matched, skips = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skips, skips[:5]

    rng = np.random.RandomState(42)
    x = rng.rand(2, 3, 64, 32).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()  # (2, 3072) combo feature
    got = np.asarray(
        fmodel.apply(merged, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    )
    assert got.shape == want.shape == (2, 3072)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_graphnet_converter_handles_dataparallel_prefix():
    """Reference checkpoints are saved from nn.DataParallel models whose
    keys carry a 'module.' prefix; the fused-classifier index detection
    must see through it (it drives the classifier_fused mapping)."""
    from agrl_tpu.models.weight_convert import convert_graphnet_state_dict

    sd = {
        "module.classifiers.0.weight": np.zeros((5, 512), np.float32),
        "module.classifiers.0.bias": np.zeros((5,), np.float32),
        "module.classifiers.1.weight": np.zeros((5, 512), np.float32),
        "module.classifiers.1.bias": np.zeros((5,), np.float32),
    }
    converted, skipped = convert_graphnet_state_dict(sd, "msppgn")
    assert not skipped
    assert set(converted["params"]) == {"classifier_0", "classifier_fused"}


# ---------------------------------------------------------------------------
# legacy-family REVERSE export (VERDICT r04 missing #2): the probe-based
# exporter (weight_convert._export_by_probe) must round-trip every family
# the reference trivially round-trips via torch.save
# (torchreid/utils/iotools.py:41-55)
# ---------------------------------------------------------------------------


def _round_trip(tmodel, fmodel, arch, convert_fn, init_kwargs, skipped_ok=(),
                sum_leaves=()):
    """torch -> flax -> torch bit-equal (except `sum_leaves`, which the
    forward converter SUMS into one flax leaf — those reconstruct to the
    original sum within one f32 rounding); then forward-convert the export
    again and check it reproduces the flax leaves exactly."""
    import jax

    from agrl_tpu.models.weight_convert import (
        export_torch_state_dict,
        merge_converted,
    )

    sd = tmodel.state_dict()
    converted, skipped = convert_fn(sd)
    bad = [n for n in skipped if not n.startswith(skipped_ok)]
    assert not bad, bad[:5]
    variables = init_kwargs  # already-built flax variable tree
    merged, _, skips = merge_converted(variables, converted)
    assert not skips, skips[:5]

    state, filled, kept = export_torch_state_dict(merged, sd, arch)
    assert set(state) == set(sd)
    expected_kept = ("num_batches_tracked",) + skipped_ok
    assert all(n.endswith(expected_kept) or n.startswith(skipped_ok) for n in kept), kept[:5]
    for name, want in sd.items():
        if name.endswith(sum_leaves):
            np.testing.assert_allclose(
                state[name], want.numpy().astype(np.float32),
                atol=1e-6, rtol=1e-6, err_msg=name,
            )
        else:
            np.testing.assert_array_equal(
                state[name], want.numpy().astype(np.float32), err_msg=name
            )

    # semantic invariant: re-importing the export lands EXACTLY on the
    # flax weights (the residual rule preserves the summed leaf even when
    # the individual torch biases move by a rounding step)
    reconverted, _ = convert_fn({k: np.asarray(v) for k, v in state.items()})
    from flax import traverse_util

    for coll in ("params", "batch_stats"):
        got = traverse_util.flatten_dict(reconverted.get(coll, {}))
        have = traverse_util.flatten_dict(merged[coll])
        for path, arr in got.items():
            if path in have:
                np.testing.assert_allclose(
                    np.asarray(arr, np.float32),
                    np.asarray(have[path], np.float32),
                    atol=1e-6, rtol=1e-6, err_msg=str(path),
                )


@pytest.mark.parametrize(
    "ref_cls,flax_name,sum_leaves",
    [
        ("ResNet50TP", "res50tp_legacy", ()),
        ("ResNet50TA", "res50ta", ()),
        ("ResNet50RNN", "res50rnn", ("bias_ih_l0", "bias_hh_l0")),
    ],
)
def test_temporal_reverse_export_round_trip(ref_cls, flax_name, sum_leaves):
    import importlib

    import jax

    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.models.weight_convert import convert_temporal_state_dict

    sys.modules.pop("torchreid.models.resnet_temporal", None)
    ref = importlib.import_module("torchreid.models.resnet_temporal")
    tmodel = getattr(ref, ref_cls)(num_classes=5, loss={"xent", "htri"}).eval()
    _randomize_bn_stats(tmodel, seed=51)

    fmodel = init_model(flax_name, num_classes=5, loss={"xent", "htri"})
    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=3, height=224, width=112, batch_size=1
    )
    _round_trip(
        tmodel, fmodel, flax_name, convert_temporal_state_dict,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        sum_leaves=sum_leaves,
    )


def test_resnet50m_reverse_export_round_trip():
    import importlib

    import jax

    from agrl_tpu.models import init_image_model, init_image_params
    from agrl_tpu.models.weight_convert import convert_resnet50m_state_dict

    sys.modules.pop("torchreid.models.resnet", None)
    ref = importlib.import_module("torchreid.models.resnet")
    tmodel = ref.ResNet50M(num_classes=5, loss={"xent", "htri"}).eval()
    _randomize_bn_stats(tmodel, seed=52)

    fmodel = init_image_model("resnet50m", num_classes=5, loss={"xent", "htri"})
    variables = init_image_params(
        fmodel, jax.random.PRNGKey(0), height=64, width=32, batch_size=1
    )
    _round_trip(
        tmodel, fmodel, "resnet50m", convert_resnet50m_state_dict,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        skipped_ok=("layers2.0",),  # the maxpool Sequential slot
    )


def test_resnet3d_reverse_export_round_trip():
    import importlib

    import jax

    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.models.weight_convert import convert_resnet3d_state_dict

    ref = importlib.import_module("torchreid.models.resnet3d")
    tmodel = ref.ResNet3d(ref.BasicBlock, [1, 1, 1, 1], num_classes=7).eval()
    _randomize_bn_stats(tmodel, seed=53)

    fmodel = init_model("resnet3d50", num_classes=7, loss={"xent", "htri"}, depth=10)
    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=4, height=64, width=32, batch_size=1
    )
    _round_trip(
        tmodel, fmodel, "resnet3d50", convert_resnet3d_state_dict,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
    )


def test_image_family_reverse_export_round_trip():
    """resnet50b: the train-only bottleneck head has no flax counterpart —
    it must survive as kept template entries, everything else round-trips."""
    import importlib

    import jax

    from agrl_tpu.models import init_image_model, init_image_params
    from agrl_tpu.models.weight_convert import convert_temporal_state_dict

    sys.modules.pop("torchreid.models.resnet", None)
    ref = importlib.import_module("torchreid.models.resnet")
    tmodel = ref.ResNet50B(num_classes=5, loss={"xent", "htri"}).eval()
    _randomize_bn_stats(tmodel, seed=54)

    fmodel = init_image_model("resnet50b", num_classes=5, loss={"xent", "htri"})
    variables = init_image_params(
        fmodel, jax.random.PRNGKey(0), height=64, width=32, batch_size=1
    )
    _round_trip(
        tmodel, fmodel, "resnet50b", convert_temporal_state_dict,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        skipped_ok=("bottleneck.",),
    )
