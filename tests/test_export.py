"""AOT export + serving API (engine/export.py).

The served program must be THE eval forward (engine/evaluator.py
`make_eval_forward`) — these tests pin: ragged-batch padding equivalence,
jax.export round-trip through bytes, and artifact-only serving (no model
object on the loading side)."""

import numpy as np
import jax
import pytest

from agrl_tpu.engine.evaluator import make_eval_forward
from agrl_tpu.engine.export import (
    FeatureExtractor,
    export_eval_forward,
    load_exported,
    save_exported,
)
from agrl_tpu.models import init_model, init_params

S, H, W = 4, 64, 32


@pytest.fixture(scope="module")
def tiny_model():
    model = init_model("vmgn_tiny", num_classes=5)
    variables = init_params(
        model, jax.random.PRNGKey(0), seq_len=S, height=H, width=W
    )
    return model, variables


def _batch(n, model, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, (n, S, H, W, 3), dtype=np.uint8)
    v = S * model.total_split
    adjs = (rng.rand(n, v, v) > 0.4).astype(np.float32)
    return imgs, adjs


def test_feature_extractor_matches_direct_forward(tiny_model):
    model, variables = tiny_model
    imgs, adjs = _batch(5, model)
    fwd, _ = make_eval_forward(model, bf16=False)
    ref = np.asarray(fwd(variables, imgs, adjs))

    fx = FeatureExtractor(
        model, variables, batch_size=2, seq_len=S, bf16=False
    )
    out = fx(imgs, adjs)
    assert out.shape == ref.shape
    # padding rows are sliced off; real rows equal the direct forward
    # (eval BN uses running stats, so rows are batch-independent)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_feature_extractor_default_adjacency(tiny_model):
    model, variables = tiny_model
    imgs, _ = _batch(3, model)
    v = S * model.total_split
    fwd, _ = make_eval_forward(model, bf16=False)
    ref = np.asarray(fwd(variables, imgs, np.ones((3, v, v), np.float32)))
    fx = FeatureExtractor(model, variables, batch_size=3, seq_len=S, bf16=False)
    np.testing.assert_allclose(fx(imgs), ref, rtol=1e-5, atol=1e-5)


def test_export_roundtrip_and_artifact_only_serving(tiny_model, tmp_path):
    model, variables = tiny_model
    imgs, adjs = _batch(2, model)
    fwd, _ = make_eval_forward(model, bf16=False)
    ref = np.asarray(fwd(variables, imgs, adjs))

    exp = export_eval_forward(
        model, variables, batch_size=2, seq_len=S, height=H, width=W,
        bf16=False,
    )
    path = str(tmp_path / "vmgn_tiny_eval.jaxexp")
    save_exported(path, exp)

    # the loading side uses ONLY the artifact + the weights pytree
    loaded = load_exported(path)
    out = np.asarray(loaded.call(variables, imgs, adjs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # high-level serving wrapper infers batch/seq/vertices from the artifact
    fx = FeatureExtractor.from_exported(path, variables)
    assert fx.batch_size == 2 and fx.seq_len == S
    imgs5, adjs5 = _batch(5, model, seed=1)
    ref5 = []
    for i in range(0, 4, 2):
        ref5.append(np.asarray(fwd(variables, imgs5[i:i+2], adjs5[i:i+2])))
    pad_i = np.concatenate([imgs5[4:], np.zeros((1, S, H, W, 3), np.uint8)])
    pad_a = np.concatenate(
        [adjs5[4:], np.ones((1, *adjs5.shape[1:]), np.float32)]
    )
    ref5.append(np.asarray(fwd(variables, pad_i, pad_a))[:1])
    np.testing.assert_allclose(
        fx(imgs5, adjs5), np.concatenate(ref5), rtol=1e-5, atol=1e-5
    )


def test_from_exported_rejects_batch_mismatch(tiny_model, tmp_path):
    model, variables = tiny_model
    exp = export_eval_forward(
        model, variables, batch_size=2, seq_len=S, height=H, width=W,
        bf16=False,
    )
    with pytest.raises(ValueError, match="exported at batch 2"):
        FeatureExtractor.from_exported(exp, variables, batch_size=4)


def test_export_model_tool_roundtrip(tiny_model, tmp_path):
    """tools/export_model.py: checkpoint in, serving artifact out."""
    import importlib.util
    import os.path as osp

    from flax import serialization

    model, variables = tiny_model
    ckpt = tmp_path / "ckpt.msgpack"
    ckpt.write_bytes(serialization.to_bytes(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    ))
    out = tmp_path / "vmgn_tiny_eval.jaxexp"

    tool_path = osp.join(osp.dirname(osp.dirname(__file__)), "tools", "export_model.py")
    spec = importlib.util.spec_from_file_location("export_model_tool", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    tool.main([
        "-a", "vmgn_tiny", "--num-classes", "5",
        "--load-weights", str(ckpt), "--batch", "2",
        "--seq-len", str(S), "--height", str(H), "--width", str(W),
        # arch flags must match the trained model, exactly as with the CLI
        "--pyramid-part", "--use-pose", "--learn-graph", "--num-gb", "2",
        "--no-bf16", "--out", str(out),
    ])

    fwd, _ = make_eval_forward(model, bf16=False)
    imgs, adjs = _batch(2, model)
    ref = np.asarray(fwd(variables, imgs, adjs))
    fx = FeatureExtractor.from_exported(str(out), variables)
    np.testing.assert_allclose(fx(imgs, adjs), ref, rtol=1e-5, atol=1e-5)


def test_export_model_tool_from_reference_checkpoint(tiny_model, tmp_path):
    """Reference torch-named checkpoint (.npz, 'module.'-prefixed) in,
    serving artifact out — migration needs one command, no msgpack step."""
    import importlib.util
    import os.path as osp
    import sys as _sys

    _sys.path.insert(0, osp.dirname(__file__))
    from test_weight_convert import _to_torch_names

    model, variables = tiny_model
    np_vars = jax.tree.map(np.asarray, variables)
    sd = {f"module.{k}": v for k, v in _to_torch_names(np_vars).items()}
    ckpt = tmp_path / "model_mars.npz"
    np.savez(str(ckpt), **sd)
    out = tmp_path / "from_torch.jaxexp"

    tool_path = osp.join(osp.dirname(osp.dirname(__file__)), "tools", "export_model.py")
    spec = importlib.util.spec_from_file_location("export_model_tool3", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    tool.main([
        "-a", "vmgn_tiny", "--num-classes", "5",
        "--load-weights", str(ckpt), "--batch", "2",
        "--seq-len", str(S), "--height", str(H), "--width", str(W),
        "--pyramid-part", "--use-pose", "--learn-graph", "--num-gb", "2",
        "--no-bf16", "--out", str(out),
    ])

    fwd, _ = make_eval_forward(model, bf16=False)
    imgs, adjs = _batch(2, model)
    ref = np.asarray(fwd(variables, imgs, adjs))
    fx = FeatureExtractor.from_exported(str(out), variables)
    np.testing.assert_allclose(fx(imgs, adjs), ref, rtol=1e-5, atol=1e-5)


def test_export_model_tool_refuses_partial_load(tiny_model, tmp_path):
    """Mismatched arch flags -> skipped tensors -> the exporter refuses
    (a serving artifact from a partial load is a mis-specified arch)."""
    import importlib.util
    import os.path as osp

    from flax import serialization

    model, variables = tiny_model
    ckpt = tmp_path / "ckpt.msgpack"
    ckpt.write_bytes(serialization.to_bytes(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    ))
    tool_path = osp.join(osp.dirname(osp.dirname(__file__)), "tools", "export_model.py")
    spec = importlib.util.spec_from_file_location("export_model_tool2", tool_path)
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    with pytest.raises(SystemExit, match="did not match"):
        tool.main([
            # wrong --num-classes: classifier tensors skip the shape filter
            "-a", "vmgn_tiny", "--num-classes", "7",
            "--load-weights", str(ckpt), "--batch", "2",
            "--seq-len", str(S), "--height", str(H), "--width", str(W),
            "--pyramid-part", "--use-pose", "--learn-graph", "--num-gb", "2",
            "--no-bf16", "--out", str(tmp_path / "nope.jaxexp"),
        ])


def test_serving_host_flow_from_checkpoint(tiny_model, tmp_path):
    """The complete artifact-only serving recipe: a trainer-written
    checkpoint (params + batch_stats + opt_state) loads template-free via
    load_variables, opt_state is dropped, and features equal the live
    forward. A bare-params checkpoint also loads."""
    from agrl_tpu.core.checkpoint import load_variables, save_checkpoint

    model, variables = tiny_model
    ckpt = str(tmp_path / "checkpoint_ep1.msgpack")
    save_checkpoint(
        {**variables, "opt_state": {"count": np.zeros((), np.int32)}},
        ckpt, epoch=1,
    )
    served_vars = load_variables(ckpt)
    assert "opt_state" not in served_vars
    assert set(served_vars) == set(variables)

    exp = export_eval_forward(
        model, variables, batch_size=2, seq_len=S, height=H, width=W,
        bf16=False,
    )
    path = str(tmp_path / "m.jaxexp")
    save_exported(path, exp)
    fx = FeatureExtractor.from_exported(path, served_vars)
    imgs, adjs = _batch(3, model)
    fwd, _ = make_eval_forward(model, bf16=False)
    ref = np.asarray(fwd(variables, imgs, adjs))
    np.testing.assert_allclose(fx(imgs, adjs), ref, rtol=1e-5, atol=1e-5)

    bare = str(tmp_path / "bare.msgpack")
    save_checkpoint(variables["params"], bare, epoch=0)
    assert set(load_variables(bare)) == {"params"}


def test_feature_extractor_empty_batch(tiny_model):
    """N=0 is a legitimate serving request: (0, D) out, no crash."""
    model, variables = tiny_model
    fx = FeatureExtractor(model, variables, batch_size=2, seq_len=S, bf16=False)
    out = fx(np.zeros((0, S, H, W, 3), np.uint8))
    assert out.shape[0] == 0 and out.ndim == 2 and out.shape[1] > 0


def test_feature_extractor_rejects_shape_drift(tiny_model):
    """The one-compiled-executable promise: stray seq_len/H/W/adj-rows
    raise a clear error instead of silently compiling a second program."""
    model, variables = tiny_model
    fx = FeatureExtractor(model, variables, batch_size=2, seq_len=S, bf16=False)
    imgs, adjs = _batch(2, model)
    with pytest.raises(ValueError, match=f"N, {S}, H, W"):
        fx(np.zeros((2, S + 1, H, W, 3), np.uint8))
    with pytest.raises(ValueError, match="2 rows for 3"):
        fx(np.zeros((3, S, H, W, 3), np.uint8), adjs)
    fx(imgs, adjs)  # first request locks H x W
    with pytest.raises(ValueError, match=f"serves {H}x{W}"):
        fx(np.zeros((2, S, H, W * 2, 3), np.uint8))
    v = S * model.total_split
    with pytest.raises(ValueError, match="adjacency"):
        fx(imgs[:2], np.ones((2, v + 1, v + 1), np.float32))
    with pytest.raises(ValueError, match="adjacency"):
        fx(imgs[:2], np.ones((2, v, v - 1), np.float32))
    # N=0 WITH an explicit (0, V, V) adjacency still serves
    out = fx(np.zeros((0, S, H, W, 3), np.uint8), np.ones((0, v, v), np.float32))
    assert out.shape[0] == 0


def test_feature_extractor_mesh_sharded_matches_single(tiny_model):
    """dp-sharded serving (8 virtual devices): same features, and the
    artifact path refuses a mesh (single-device program)."""
    from agrl_tpu.parallel import make_mesh

    model, variables = tiny_model
    imgs, adjs = _batch(7, model)
    single = FeatureExtractor(
        model, variables, batch_size=4, seq_len=S, bf16=False
    )(imgs, adjs)

    mesh = make_mesh(dp=4, mp=1)
    fx = FeatureExtractor(
        model, variables, batch_size=4, seq_len=S, bf16=False, mesh=mesh
    )
    np.testing.assert_allclose(fx(imgs, adjs), single, rtol=1e-5, atol=1e-5)

    with pytest.raises(ValueError, match="must divide"):
        FeatureExtractor(model, variables, batch_size=3, seq_len=S, mesh=mesh)
    exp = export_eval_forward(
        model, variables, batch_size=4, seq_len=S, height=H, width=W,
        bf16=False,
    )
    with pytest.raises(ValueError, match="single-device"):
        FeatureExtractor(
            variables=variables, batch_size=4, seq_len=S, mesh=mesh,
            _call=exp.call,
        )


def test_export_bf16_matches_bf16_eval_forward(tiny_model):
    """The bf16 artifact reproduces the Evaluator's bf16 forward exactly
    (same program, same casts) — not merely the f32 one approximately."""
    model, variables = tiny_model
    imgs, adjs = _batch(2, model)
    fwd, _ = make_eval_forward(model, bf16=True)
    ref = np.asarray(fwd(variables, imgs, adjs))
    exp = export_eval_forward(
        model, variables, batch_size=2, seq_len=S, height=H, width=W,
        bf16=True,
    )
    out = np.asarray(exp.call(variables, imgs, adjs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
