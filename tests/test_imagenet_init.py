"""ImageNet-pretrained backbone initialization (reference
init_pretrained_weights, vmgn.py:360-370).

Synthesizes a torchvision-style ResNet-50 state dict (correct names +
shapes, random values) and checks:
  * vmgn: every backbone leaf is loaded and BOTH layer4 branches are
    bit-identical to the source layer4 (the load-before-duplication quirk,
    reference vmgn.py:224-234);
  * gsta / res50tp: single-layer4 archs load name-for-name;
  * the .npz no-torch path round-trips.
"""

import jax
import numpy as np
import pytest
from flax import traverse_util

from agrl_tpu.models import init_model, init_params, init_pretrained_weights
from agrl_tpu.models.weight_convert import _transform, convert_imagenet_resnet


def synth_resnet50_state_dict(rng: np.random.RandomState) -> dict:
    """torchvision resnet50 names + shapes, random values (no torch needed)."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(100, np.int64)

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    bn("bn1", 64)

    inplanes = 64
    for stage, (planes, blocks) in enumerate(
        [(64, 3), (128, 4), (256, 6), (512, 3)], start=1
    ):
        for j in range(blocks):
            p = f"layer{stage}.{j}"
            cin = inplanes if j == 0 else planes * 4
            sd[f"{p}.conv1.weight"] = rng.randn(planes, cin, 1, 1).astype(np.float32)
            bn(f"{p}.bn1", planes)
            sd[f"{p}.conv2.weight"] = rng.randn(planes, planes, 3, 3).astype(np.float32)
            bn(f"{p}.bn2", planes)
            sd[f"{p}.conv3.weight"] = rng.randn(planes * 4, planes, 1, 1).astype(np.float32)
            bn(f"{p}.bn3", planes * 4)
            if j == 0:
                sd[f"{p}.downsample.0.weight"] = rng.randn(
                    planes * 4, cin, 1, 1
                ).astype(np.float32)
                bn(f"{p}.downsample.1", planes * 4)
        inplanes = planes * 4

    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


def n_leaves(tree):
    return len(traverse_util.flatten_dict(tree))


def build_variables(arch, **kw):
    model = init_model(
        arch, num_classes=5, loss={"xent", "htri"},
        num_split=4, pyramid_part=True, num_gb=2, use_pose=True,
        learn_graph=True, num_scale=1, last_stride=1, **kw,
    )
    v = init_params(model, jax.random.PRNGKey(0), seq_len=2, height=64, width=32, batch_size=1)
    return {"params": v["params"], "batch_stats": v.get("batch_stats", {})}


@pytest.fixture(scope="module")
def sd():
    return synth_resnet50_state_dict(np.random.RandomState(0))


def test_vmgn_imagenet_init_duplicates_layer4(sd):
    variables = build_variables("vmgn")
    converted = convert_imagenet_resnet(sd, variables["params"])
    new_vars, matched, skipped = init_pretrained_weights(variables, sd)

    # every converted backbone leaf must land in the model (nothing skipped)
    assert not skipped, skipped[:5]
    assert len(matched) == n_leaves(converted["params"]) + n_leaves(
        converted["batch_stats"]
    )

    p = new_vars["params"]
    bs = new_vars["batch_stats"]
    # stem conv actually transposed OIHW->HWIO from the source
    np.testing.assert_array_equal(
        p["trunk"]["stem"]["conv1"]["kernel"], _transform(sd["conv1.weight"], "conv")
    )
    # both layer4 branches bit-identical to the source layer4
    f41 = traverse_util.flatten_dict(p["layer4_1"])
    f42 = traverse_util.flatten_dict(p["layer4_2"])
    assert f41.keys() == f42.keys() and len(f41) > 0
    for k in f41:
        np.testing.assert_array_equal(f41[k], f42[k])
    np.testing.assert_array_equal(
        p["layer4_1"]["block0"]["conv2"]["kernel"],
        _transform(sd["layer4.0.conv2.weight"], "conv"),
    )
    np.testing.assert_array_equal(
        bs["layer4_2"]["block1"]["bn3"]["mean"], sd["layer4.1.bn3.running_mean"]
    )
    # every backbone leaf in the model tree was overwritten: check a full
    # stage equals its converted source
    got_l2 = traverse_util.flatten_dict(p["trunk"]["layer2"])
    want_l2 = traverse_util.flatten_dict(converted["params"]["trunk"]["layer2"])
    assert got_l2.keys() == want_l2.keys()
    for k in want_l2:
        np.testing.assert_array_equal(got_l2[k], want_l2[k])


@pytest.mark.parametrize("arch", ["gsta", "res50tp"])
def test_single_branch_imagenet_init(arch, sd):
    variables = build_variables(arch)
    new_vars, matched, skipped = init_pretrained_weights(variables, sd)
    assert not skipped, skipped[:5]
    p = new_vars["params"]
    np.testing.assert_array_equal(
        p["layer4"]["block0"]["conv1"]["kernel"],
        _transform(sd["layer4.0.conv1.weight"], "conv"),
    )
    np.testing.assert_array_equal(
        p["trunk"]["stem"]["conv1"]["kernel"], _transform(sd["conv1.weight"], "conv")
    )
    # heads (bottleneck/classifier/graph) keep their init: ensure matched
    # count covers exactly the backbone leaf count for a single-layer4 net
    converted = convert_imagenet_resnet(sd, variables["params"])
    assert len(matched) == n_leaves(converted["params"]) + n_leaves(
        converted["batch_stats"]
    )


def test_imagenet_init_npz_path(sd, tmp_path):
    fpath = str(tmp_path / "imagenet_resnet50.npz")
    np.savez(fpath, **sd)
    variables = build_variables("vmgn")
    new_vars, matched, skipped = init_pretrained_weights(variables, fpath)
    assert not skipped
    np.testing.assert_array_equal(
        new_vars["params"]["trunk"]["stem"]["conv1"]["kernel"],
        _transform(sd["conv1.weight"], "conv"),
    )


def _variables_of(model, x):
    v = jax.jit(lambda x: model.init({"params": jax.random.PRNGKey(0)}, x, train=True))(x)
    return {"params": v["params"], "batch_stats": v.get("batch_stats", {})}


def _family_cases():
    from agrl_tpu.models import init_model, init_params
    from agrl_tpu.models.resnet_image import ResNet50M, ResNetImage
    from agrl_tpu.models.resnet_temporal import ResNet50TPLegacy

    x_img = np.zeros((1, 64, 32, 3), np.float32)
    x_clip = np.zeros((1, 2, 64, 32, 3), np.float32)
    yield (
        "res50tp_legacy",
        lambda: _variables_of(ResNet50TPLegacy(num_classes=5), x_clip),
        ("backbone", "layer4", "block0", "conv1", "kernel"),
        ("backbone", "trunk", "stem", "conv1", "kernel"),
    )
    yield (
        "resnet50_image",
        lambda: _variables_of(
            ResNetImage(num_classes=5, loss=frozenset({"xent"})), x_img
        ),
        ("backbone", "layer4", "block0", "conv1", "kernel"),
        ("backbone", "trunk", "stem", "conv1", "kernel"),
    )

    def msppn_vars():
        model = init_model(
            "msppn", num_classes=5, loss={"xent", "htri"},
            num_split=4, pyramid_part=True, num_gb=2,
        )
        v = init_params(
            model, jax.random.PRNGKey(0), seq_len=2, height=64, width=32, batch_size=1
        )
        return {"params": v["params"], "batch_stats": v.get("batch_stats", {})}

    yield (
        "msppn",
        msppn_vars,
        ("trunk", "layer4", "block0", "conv1", "kernel"),
        ("trunk", "stem", "conv1", "kernel"),
    )
    yield (
        "resnet50m",
        lambda: _variables_of(ResNet50M(num_classes=5), x_img),
        ("layers5a", "conv1", "kernel"),
        ("trunk", "stem", "conv1", "kernel"),
    )


@pytest.mark.parametrize(
    "arch,make_vars,l4_path,stem_path",
    list(_family_cases()),
    ids=lambda v: v if isinstance(v, str) else "",
)
def test_other_families_imagenet_init(arch, make_vars, l4_path, stem_path, sd):
    """--pretrained-weights must reach the temporal/image/graphnet/resnet50m
    trees too, not just the vmgn-family layout."""
    variables = make_vars()
    new_vars, matched, skipped = init_pretrained_weights(variables, sd)
    assert not skipped, skipped[:5]
    flat = traverse_util.flatten_dict(new_vars["params"])
    np.testing.assert_array_equal(
        flat[l4_path], _transform(sd["layer4.0.conv1.weight"], "conv")
    )
    np.testing.assert_array_equal(
        flat[stem_path], _transform(sd["conv1.weight"], "conv")
    )
    # the whole backbone loaded, not a token subset
    converted = convert_imagenet_resnet(sd, variables["params"])
    assert len(matched) == n_leaves(converted["params"]) + n_leaves(
        converted["batch_stats"]
    )
    assert len(matched) > 100  # resnet50 has ~265 backbone leaves
