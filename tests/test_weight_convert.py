"""Weight conversion tests: torch->flax numeric parity on a real torch
Bottleneck (built in-test from standard resnet semantics) and structural
coverage for a synthesized full-VMGN state dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agrl_tpu.models.backbone import Bottleneck
from agrl_tpu.models.weight_convert import convert_torch_state_dict, merge_converted

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


class TorchBottleneck(tnn.Module):
    """Standard resnet-v1 bottleneck (torchvision semantics) for parity."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        else:
            self.downsample = None

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + r)


@pytest.mark.parametrize("stride,downsample", [(1, True), (2, True)])
def test_bottleneck_torch_flax_numeric_parity(stride, downsample):
    tmod = TorchBottleneck(16, 8, stride=stride, downsample=downsample).eval()
    # randomize BN stats so eval-mode normalization is nontrivial
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1, 0.2)
                m.bias.normal_(0, 0.2)

    x = np.random.RandomState(0).randn(2, 16, 12, 8).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.tensor(x)).numpy()

    # rename to the reference's layerX.N.* scheme and convert
    sd = {f"layer1.0.{k}": v for k, v in tmod.state_dict().items()}
    sd = {k.replace("downsample.0.", "downsample.0.").replace(".downsample.", ".downsample."): v for k, v in sd.items()}
    converted, _ = convert_torch_state_dict(sd)

    fmod = Bottleneck(planes=8, stride=stride, downsample=downsample)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = fmod.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    # grab the converted block subtree
    block = {
        "params": converted["params"]["trunk"]["layer1"]["block0"],
        "batch_stats": converted["batch_stats"]["trunk"]["layer1"]["block0"],
    }
    merged, matched, skipped = merge_converted(variables, block)
    assert not skipped, skipped
    assert len(matched) >= 12

    got = fmod.apply(merged, x_nhwc, train=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-5
    )


def _to_torch_names(variables):
    """Build reference torch-style names from a VMGN flax tree (inverse of
    convert_torch_state_dict's mapping) — synthesizes reference-shaped
    state dicts without torch."""
    from flax import traverse_util

    sd = {}
    for coll in ("params", "batch_stats"):
        for path, v in traverse_util.flatten_dict(variables[coll]).items():
            name = "/".join(path)
            tname = (
                name.replace("trunk/stem/", "")
                .replace("trunk/", "")
                .replace("block", "")
                .replace("/kernel", "/weight")
                .replace("/scale", "/weight")
                .replace("/mean", "/running_mean")
                .replace("/var", "/running_var")
                .replace("downsample_conv", "downsample/0")
                .replace("downsample_bn", "downsample/1")
                .replace("graph_layer_", "graph_layers/")
                .replace("global_bottleneck/bn", "global_bottleneck")
                .replace("att_bottleneck/bn", "att_bottleneck")
                .replace("/", ".")
            )
            arr = np.asarray(v)
            if name.endswith("kernel") and arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)
            elif name.endswith("kernel"):
                arr = arr.T
            sd[tname] = arr
    return sd


def test_full_vmgn_state_dict_coverage():
    """Synthesize a reference-shaped VMGN state dict and check every entry
    maps onto the Flax tree (no skips apart from expected ones)."""
    from agrl_tpu.models import init_params
    from agrl_tpu.models.vmgn import VMGN

    model = VMGN(num_classes=7, layers=(1, 1, 1, 1), num_split=4, num_gb=2)
    variables = init_params(model, jax.random.PRNGKey(0), seq_len=8, height=64, width=32)
    variables = jax.tree.map(np.asarray, variables)

    sd = _to_torch_names(variables)
    converted, unmapped = convert_torch_state_dict(sd)
    assert not unmapped, unmapped[:5]
    merged, matched, skipped = merge_converted(variables, converted)
    assert not skipped, skipped[:5]
    # every flax leaf must be covered
    n_leaves = len(jax.tree.leaves(variables))
    assert len(matched) == n_leaves

    # round trip: merged values equal originals
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_reference_checkpoint_dispatch_and_module_prefix(tmp_path):
    """The one-command migration path (convert_reference_checkpoint):
    loads a reference-shaped checkpoint file by arch, strips a
    DataParallel 'module.' prefix (reference iotools.py:45-49), and
    round-trips every leaf. Uses a .npz so the no-torch path is covered
    end to end too."""
    from agrl_tpu.models import init_params
    from agrl_tpu.models.vmgn import VMGN
    from agrl_tpu.models.weight_convert import convert_reference_checkpoint

    model = VMGN(num_classes=7, layers=(1, 1, 1, 1), num_split=4, num_gb=2)
    variables = init_params(
        model, jax.random.PRNGKey(1), seq_len=8, height=64, width=32
    )
    variables = jax.tree.map(np.asarray, variables)
    sd = {f"module.{k}": v for k, v in _to_torch_names(variables).items()}
    fpath = str(tmp_path / "model_mars.npz")
    np.savez(fpath, **sd)

    fresh = jax.tree.map(np.zeros_like, variables)
    merged, matched, skipped, unmapped = convert_reference_checkpoint(
        fresh, fpath, "vmgn"
    )
    assert not skipped and not unmapped, (skipped[:3], unmapped[:3])
    assert len(matched) == len(jax.tree.leaves(variables))
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_convert_reference_checkpoint_shape_filters_other_heads(tmp_path):
    """A checkpoint trained with a different #classes partially loads:
    classifier heads are skipped, everything else matches (the reference's
    --load-weights transfer semantics, driver :279-287)."""
    from agrl_tpu.models import init_params
    from agrl_tpu.models.vmgn import VMGN
    from agrl_tpu.models.weight_convert import convert_reference_checkpoint

    src_model = VMGN(num_classes=11, layers=(1, 1, 1, 1), num_split=4, num_gb=2)
    src_vars = jax.tree.map(np.asarray, init_params(
        src_model, jax.random.PRNGKey(2), seq_len=8, height=64, width=32
    ))
    fpath = str(tmp_path / "other_heads.npz")
    np.savez(fpath, **_to_torch_names(src_vars))

    dst_model = VMGN(num_classes=7, layers=(1, 1, 1, 1), num_split=4, num_gb=2)
    dst_vars = jax.tree.map(np.asarray, init_params(
        dst_model, jax.random.PRNGKey(3), seq_len=8, height=64, width=32
    ))
    merged, matched, skipped, unmapped = convert_reference_checkpoint(
        dst_vars, fpath, "vmgn"
    )
    assert not unmapped
    assert skipped and all("classifier" in s for s in skipped), skipped[:5]
    n_class_leaves = len(skipped)
    assert len(matched) == len(jax.tree.leaves(dst_vars)) - n_class_leaves
