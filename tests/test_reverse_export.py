"""Reverse checkpoint migration: flax -> reference-named torch state dict.

`export_torch_state_dict` is the inverse of convert_reference_checkpoint
(same name maps, inverse layout transforms) — it lets a TPU-trained
model drop back into the reference's --load-weights/--resume. Verified
against the ACTUAL reference implementation (imported from
/root/reference like tests/test_reference_parity.py):

  * round trip: torch state dict -> flax -> torch is bit-equal;
  * reverse parity: a flax-random-initialized model exported into a
    reference model produces the reference's eval features for the same
    inputs (the reference runs OUR weights);
  * msppgn: the graphnet name map round-trips too (fusion Conv1d
    reshape, fused-classifier index) — tested where the reference
    graphnet's torchvision stand-in lives, tests/test_graphnet_parity.py.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_on_path():
    sys.path.insert(0, REF)
    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace()
        sys.modules["torchvision"] = tv
    yield
    if stubbed:
        del sys.modules["torchvision"]
    sys.path.remove(REF)


def _randomize_bn_stats(tmodel, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _build_ref_vmgn(num_classes=10):
    import importlib

    ref_vmgn = importlib.import_module("torchreid.models.vmgn")
    # the reference constructor downloads ImageNet weights (vmgn.py:225)
    orig_init = ref_vmgn.init_pretrained_weights
    ref_vmgn.init_pretrained_weights = lambda *a, **k: None
    try:
        tmodel = ref_vmgn.GSTA(
            num_classes=num_classes, loss={"xent", "htri"},
            block=ref_vmgn.Bottleneck, layers=[3, 4, 6, 3], num_split=4,
            pyramid_part=True, num_gb=2, use_pose=True, learn_graph=True,
            consistent_loss=False,
        ).eval()
    finally:
        ref_vmgn.init_pretrained_weights = orig_init
    _randomize_bn_stats(tmodel)
    return tmodel


EXPECTED_KEPT = ("num_batches_tracked", "bottleneck.bias")


@pytest.fixture(scope="module")
def ref_vmgn_10(ref_on_path):
    """One reference vmgn build shared by every test here (it's the slow
    part); tests must not mutate its weights — reverse-parity loads into
    a dict-copy via load_state_dict, which replaces values wholesale."""
    return _build_ref_vmgn(num_classes=10)


def test_vmgn_round_trip_bit_equal(ref_vmgn_10):
    """torch -> flax -> torch reproduces every state-dict entry exactly
    (the transforms are pure transposes; no-counterpart entries keep the
    template's values)."""
    import jax

    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import (
        convert_torch_state_dict,
        export_torch_state_dict,
        merge_converted,
    )
    from agrl_tpu.models.vmgn import vmgn

    sd = ref_vmgn_10.state_dict()

    fmodel = vmgn(num_classes=10, loss={"xent", "htri"})
    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=4, height=128, width=64,
        batch_size=1,
    )
    converted, unmapped = convert_torch_state_dict(sd)
    assert not unmapped
    merged, _, skipped = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skipped

    state, filled, kept = export_torch_state_dict(merged, sd, "vmgn")
    assert set(state) == set(sd)
    assert all(n.endswith(EXPECTED_KEPT) for n in kept), kept[:5]
    assert len(filled) == len(sd) - len(kept)
    for name, want in sd.items():
        np.testing.assert_array_equal(
            state[name], want.numpy().astype(np.float32), err_msg=name
        )


def test_vmgn_reverse_parity_reference_runs_flax_weights(ref_vmgn_10):
    """A flax model with FRESH random weights exports into the reference
    model, and the reference then produces the flax model's eval features
    — the reverse-migration direction proven semantically."""
    import copy

    import jax
    import jax.numpy as jnp

    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import export_torch_state_dict
    from agrl_tpu.models.vmgn import vmgn

    tmodel = copy.deepcopy(ref_vmgn_10)  # this test overwrites its weights

    fmodel = vmgn(num_classes=10, loss={"xent", "htri"})
    variables = init_params(
        fmodel, jax.random.PRNGKey(7), seq_len=4, height=128, width=64,
        batch_size=1,
    )
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    state, filled, kept = export_torch_state_dict(
        variables, tmodel.state_dict(), "vmgn"
    )
    assert all(n.endswith(EXPECTED_KEPT) for n in kept), kept[:5]
    # frozen BNNeck biases: the reference inits them to zero (torchtools
    # weights_init_kaiming) — the flax side's no-bias assumption relies on it
    for n in kept:
        if n.endswith("bottleneck.bias"):
            assert not tmodel.state_dict()[n].abs().any()

    tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    )
    tmodel.eval()

    rng = np.random.RandomState(3)
    x = rng.rand(2, 4, 3, 128, 64).astype(np.float32)
    V = 28
    adj = (rng.rand(2, V, V) + np.eye(V)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x), torch.tensor(adj)).numpy()
    got = np.asarray(
        fmodel.apply(
            variables, jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(adj), train=False,
        )
    )
    assert got.shape == want.shape == (2, 4096)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_shape_mismatched_head_kept_from_template(ref_vmgn_10):
    """A different-#classes flax head leaves the template's classifier in
    place and reports it — the forward partial load's semantics, reversed."""
    import jax

    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import export_torch_state_dict
    from agrl_tpu.models.vmgn import vmgn

    tmodel = ref_vmgn_10
    fmodel = vmgn(num_classes=25, loss={"xent", "htri"})
    variables = init_params(
        fmodel, jax.random.PRNGKey(1), seq_len=4, height=128, width=64,
        batch_size=1,
    )
    state, filled, kept = export_torch_state_dict(
        variables, tmodel.state_dict(), "vmgn"
    )
    cls = [n for n in kept if "classifier" in n]
    assert cls, "mismatched classifier heads should be kept, not exported"
    for n in cls:
        np.testing.assert_array_equal(state[n], tmodel.state_dict()[n].numpy())


def test_legacy_arch_reverse_empty_template():
    """Legacy families now export via the probe-based inverter
    (weight_convert._export_by_probe; round-trip coverage lives in
    tests/test_graphnet_parity.py). An empty template is a no-op."""
    from agrl_tpu.models.weight_convert import export_torch_state_dict

    state, filled, kept = export_torch_state_dict({"params": {}}, {}, "res50ta")
    assert state == {} and filled == [] and kept == []


@pytest.mark.heavy
def test_export_torch_tool_end_to_end(tmp_path, ref_vmgn_10):
    """tools/export_torch.py: msgpack checkpoint + torch-named template in
    -> reference-loadable .pth.tar AND torch-free .npz out, matching the
    library function; a wrong template triggers the unfilled-entry guard."""
    import importlib.util
    import os.path as osp

    import jax

    from agrl_tpu.core.checkpoint import save_checkpoint
    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import export_torch_state_dict
    from agrl_tpu.models.vmgn import vmgn

    tool_path = osp.join(osp.dirname(osp.dirname(__file__)), "tools", "export_torch.py")
    spec = importlib.util.spec_from_file_location("export_torch_tool", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    tool_main = tool.main

    sd = ref_vmgn_10.state_dict()
    fmodel = vmgn(num_classes=10, loss={"xent", "htri"})
    variables = init_params(
        fmodel, jax.random.PRNGKey(2), seq_len=4, height=128, width=64,
        batch_size=1,
    )
    variables = {
        "params": variables["params"], "batch_stats": variables["batch_stats"]
    }
    ckpt = str(tmp_path / "best_model.msgpack")
    save_checkpoint(variables, ckpt, epoch=3)
    template = str(tmp_path / "template.npz")
    np.savez(template, **{k: v.numpy() for k, v in sd.items()})

    out_pth = str(tmp_path / "exported.pth.tar")
    tool_main(["-a", "vmgn", "--load-weights", ckpt, "--template", template,
               "--out", out_pth, "--epoch", "3", "--rank1", "0.9"])
    wrapper = torch.load(out_pth, map_location="cpu", weights_only=False)
    assert wrapper["epoch"] == 3 and wrapper["rank1"] == 0.9

    want, filled, _ = export_torch_state_dict(
        variables, {k: v.numpy() for k, v in sd.items()}, "vmgn"
    )
    assert set(wrapper["state_dict"]) == set(want)
    for name in filled:
        np.testing.assert_array_equal(
            wrapper["state_dict"][name].numpy(), want[name], err_msg=name
        )

    out_npz = str(tmp_path / "exported.npz")
    tool_main(["-a", "vmgn", "--load-weights", ckpt, "--template", template,
               "--out", out_npz])
    with np.load(out_npz) as z:
        np.testing.assert_array_equal(z[filled[0]], want[filled[0]])

    # wrong-template guard: an msppgn-named template leaves GSTA-family
    # entries unfilled -> the tool refuses without --allow-kept
    bad_template = str(tmp_path / "bad.npz")
    np.savez(bad_template, **{"base.0.weight": np.zeros((64, 3, 7, 7), np.float32)})
    with pytest.raises(SystemExit, match="unexpectedly unfilled"):
        tool_main(["-a", "vmgn", "--load-weights", ckpt,
                   "--template", bad_template, "--out", str(tmp_path / "x.npz")])
