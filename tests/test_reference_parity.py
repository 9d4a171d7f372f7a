"""End-to-end numeric parity against the ACTUAL reference implementation.

The reference repo is mounted read-only at /root/reference and torch (CPU)
is installed, so instead of hand-transcribed oracles these tests import the
reference code itself:

  * model parity: instantiate the reference GSTA (vmgn builder,
    torchreid/models/vmgn.py:214) / gsta (gsta.py:340) with random weights,
    convert the torch state dict via weight_convert, and assert the Flax
    eval features match the torch eval features;
  * metric parity: call torchreid/metrics/rank.py's evaluate_mars /
    eval_market1501 / eval_cuhk03 directly and assert equality with the
    vectorized implementations.

The reference is treated as an untrusted oracle: we import and execute its
public functions, nothing more.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_on_path():
    """Put the reference repo on sys.path with a torchvision stub
    (torchvision is not installed; sta.py/graphnet.py import it at module
    level but the classes under test never touch it)."""
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


def _clip_inputs(rng, B=2, S=4, H=128, W=64, V=28):
    x = rng.rand(B, S, 3, H, W).astype(np.float32)
    adj = (rng.rand(B, V, V) + np.eye(V)).astype(np.float32)
    return x, adj


def _flax_variables_from_torch(model_flax, tmodel, seq_len, height, width):
    import jax

    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import convert_torch_state_dict, merge_converted

    variables = init_params(
        model_flax, jax.random.PRNGKey(0),
        seq_len=seq_len, height=height, width=width, batch_size=1,
    )
    converted, unmapped = convert_torch_state_dict(tmodel.state_dict())
    assert not unmapped, unmapped[:5]
    merged, matched, skipped = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skipped, skipped[:5]
    return merged


def test_vmgn_full_model_parity_vs_reference():
    """Reference GSTA-as-built-by-vmgn() vs agrl_tpu VMGN: eval features
    (4096-d cat[g_bn, att_bn]) must match through weight conversion."""
    import importlib

    import jax.numpy as jnp

    ref_vmgn = importlib.import_module("torchreid.models.vmgn")
    # the reference constructor downloads ImageNet weights (vmgn.py:225);
    # no egress here and parity needs random weights anyway
    orig_init = ref_vmgn.init_pretrained_weights
    ref_vmgn.init_pretrained_weights = lambda *a, **k: None
    try:
        tmodel = ref_vmgn.GSTA(
            num_classes=10, loss={"xent", "htri"}, block=ref_vmgn.Bottleneck,
            layers=[3, 4, 6, 3], num_split=4, pyramid_part=True, num_gb=2,
            use_pose=True, learn_graph=True, consistent_loss=False,
        ).eval()
    finally:
        ref_vmgn.init_pretrained_weights = orig_init
    _randomize_bn_stats(tmodel)

    rng = np.random.RandomState(0)
    x, adj = _clip_inputs(rng)
    with torch.no_grad():
        want = tmodel(torch.tensor(x), torch.tensor(adj)).numpy()  # (2, 4096)

    from agrl_tpu.models.vmgn import vmgn

    fmodel = vmgn(num_classes=10, loss={"xent", "htri"})
    merged = _flax_variables_from_torch(fmodel, tmodel, seq_len=4, height=128, width=64)
    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    got = np.asarray(fmodel.apply(merged, x_nhwc, jnp.asarray(adj), train=False))

    assert got.shape == want.shape == (2, 4096)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_gsta_full_model_parity_vs_reference():
    import importlib

    import jax.numpy as jnp

    ref_gsta = importlib.import_module("torchreid.models.gsta")
    tmodel = ref_gsta.gsta(
        num_classes=10, loss={"xent", "htri"}, last_stride=1, num_split=4,
        num_gb=2, num_scale=1, pyramid_part=True, use_pose=True,
        learn_graph=True, pretrained=False,
    ).eval()
    _randomize_bn_stats(tmodel, seed=1)

    rng = np.random.RandomState(1)
    x, adj = _clip_inputs(rng)
    with torch.no_grad():
        want = tmodel(torch.tensor(x), torch.tensor(adj)).numpy()  # (2, 2048)

    from agrl_tpu.models.gsta import gsta as gsta_flax

    fmodel = gsta_flax(num_classes=10, loss={"xent", "htri"})
    merged = _flax_variables_from_torch(fmodel, tmodel, seq_len=4, height=128, width=64)
    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    got = np.asarray(fmodel.apply(merged, x_nhwc, jnp.asarray(adj), train=False))

    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# metric parity: call the reference's own rank.py functions
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_rank(ref_on_path):
    import importlib

    # the reference imports sklearn.metrics.base (removed in sklearn>=0.24);
    # the function it wants lives in sklearn.metrics._base now
    if "sklearn.metrics.base" not in sys.modules:
        from sklearn.metrics import _base as _sk_base

        shim = types.ModuleType("sklearn.metrics.base")
        shim._average_binary_score = _sk_base._average_binary_score
        sys.modules["sklearn.metrics.base"] = shim
    return importlib.import_module("torchreid.metrics.rank")


def _problem(seed, **kw):
    from .oracles import make_reid_problem

    return make_reid_problem(np.random.RandomState(seed), **kw)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluate_mars_vs_reference(ref_rank, seed):
    from agrl_tpu.metrics.rank import evaluate_mars

    dist, qp, gp, qc, gc = _problem(seed)
    cmc_r, map_r = ref_rank.evaluate_mars(dist, qp, gp, qc, gc, max_rank=50)
    cmc_v, map_v = evaluate_mars(dist, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(cmc_v, cmc_r, atol=1e-12)
    np.testing.assert_allclose(map_v, map_r, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eval_market1501_vs_reference(ref_rank, seed):
    from agrl_tpu.metrics.rank import eval_market1501

    dist, qp, gp, qc, gc = _problem(seed)
    cmc_r, map_r = ref_rank.eval_market1501(dist, qp, gp, qc, gc, 50)
    cmc_v, map_v = eval_market1501(dist, qp, gp, qc, gc, max_rank=50)
    np.testing.assert_allclose(cmc_v, cmc_r[:50], atol=1e-6)
    np.testing.assert_allclose(map_v, map_r, atol=1e-12)


@pytest.mark.parametrize("seed", [3, 4])
def test_eval_cuhk03_vs_reference(ref_rank, seed, monkeypatch):
    """Both implementations consume np.random in the same order (per-query
    insertion-ordered pid dict, repeats outer / pids inner), so seeding
    identically must give bit-equal CMC."""
    from agrl_tpu.metrics.rank import eval_cuhk03

    # the reference uses the np.bool alias (removed in numpy 1.24,
    # reintroduced in numpy 2.0) — shim only if this numpy lacks it
    if not hasattr(np, "bool"):
        monkeypatch.setattr(np, "bool", np.bool_, raising=False)

    # max_rank < num_pids so every query's single-shot list is >= max_rank
    # long: the reference's variable-length rows and our padded rows agree
    # (the pad-with-last-value extension only matters below that regime)
    dist, qp, gp, qc, gc = _problem(seed, num_q=12, num_g=80, num_pids=10)
    np.random.seed(1234)
    cmc_r, map_r = ref_rank.eval_cuhk03(dist, qp, gp, qc, gc, 5)
    np.random.seed(1234)
    cmc_v, map_v = eval_cuhk03(dist, qp, gp, qc, gc, max_rank=5)
    np.testing.assert_allclose(cmc_v, cmc_r, atol=1e-6)
    np.testing.assert_allclose(map_v, map_r, atol=1e-12)


@pytest.mark.parametrize("seed", [3, 4])
def test_eval_cuhk03_native_vs_reference(ref_rank, seed, monkeypatch):
    """The NATIVE cuhk03 path (C++ structure pass + exact np.random stream
    replay for the single-gallery-shot draws) must be bit-equal to the
    imported reference under identical seeding, like the numpy path."""
    from agrl_tpu.metrics import rank_native

    if not rank_native.IS_NATIVE_AVAILABLE:
        pytest.skip("librank_eval.so not built")
    if not hasattr(np, "bool"):
        monkeypatch.setattr(np, "bool", np.bool_, raising=False)

    dist, qp, gp, qc, gc = _problem(seed, num_q=12, num_g=80, num_pids=10)
    np.random.seed(1234)
    cmc_r, map_r = ref_rank.eval_cuhk03(dist, qp, gp, qc, gc, 5)
    np.random.seed(1234)
    cmc_v, map_v = rank_native.evaluate_cuhk03_native(dist, qp, gp, qc, gc, 5)
    np.testing.assert_allclose(cmc_v, cmc_r, atol=1e-6)
    np.testing.assert_allclose(map_v, map_r, atol=1e-6)


def _convert_and_merge(fmodel, tmodel, expected_skips=()):
    """Convert tmodel's state dict into fmodel variables; only paths whose
    torch name starts with an expected_skips prefix may fail to map."""
    import jax

    from agrl_tpu.models import init_params
    from agrl_tpu.models.weight_convert import convert_torch_state_dict, merge_converted

    variables = init_params(
        fmodel, jax.random.PRNGKey(0), seq_len=4, height=128, width=64, batch_size=1
    )
    converted, unmapped = convert_torch_state_dict(tmodel.state_dict())
    bad = [n for n in unmapped if not n.startswith(tuple(expected_skips))]
    assert not bad, bad[:5]
    merged, matched, skipped = merge_converted(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        converted,
    )
    assert not skipped, skipped[:5]
    return merged


def _assert_eval_parity(fmodel, tmodel, seed=0, dim=None, atol=5e-4, with_adj=True):
    import jax.numpy as jnp

    _randomize_bn_stats(tmodel, seed=seed)
    merged = _convert_and_merge(
        fmodel, tmodel,
        expected_skips=("cam_layer.",),  # reference-defined but unused in forward
    )
    rng = np.random.RandomState(seed)
    x, adj = _clip_inputs(rng)
    with torch.no_grad():
        want = (
            tmodel(torch.tensor(x), torch.tensor(adj))
            if with_adj
            else tmodel(torch.tensor(x))
        ).numpy()
    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    got = np.asarray(fmodel.apply(merged, x_nhwc, jnp.asarray(adj), train=False))
    assert got.shape == want.shape, (got.shape, want.shape)
    if dim is not None:
        assert got.shape[1] == dim
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_ganet_full_model_parity_vs_reference():
    """ganet: stripe PAM + masked/additive graph layers + concat feature."""
    import importlib

    ref = importlib.import_module("torchreid.models.ganet")
    tmodel = ref.ganet(
        num_classes=10, loss={"xent", "htri"}, last_stride=1, num_split=4,
        num_gb=2, num_scale=1, knn=16, pyramid_part=True, use_pose=True,
        learn_graph=True, pretrained=False,
    ).eval()
    # PAM gamma initializes at 0 (attention off); randomize so the PAM
    # path, not just the residual, is exercised
    with torch.no_grad():
        tmodel.pam_layer.gamma.fill_(0.37)

    from agrl_tpu.models.ganet import ganet as ganet_flax

    fmodel = ganet_flax(
        num_classes=10, loss={"xent", "htri"}, num_split=4, num_gb=2,
        num_scale=1, knn=16, pyramid_part=True, use_pose=True, learn_graph=True,
    )
    _assert_eval_parity(fmodel, tmodel, seed=2, dim=(2 + 1) * 2048)


@pytest.mark.parametrize(
    "mod_name,builder,flax_name,dim,kwargs",
    [
        ("torchreid.models.sta", "sta_p4", "sta", 1024, dict(pretrained=False)),
        ("torchreid.models.simple_sta", "simple_sta_p4", "simple_sta", 1024, dict(pretrained=False)),
        ("torchreid.models.res50tp", "res50tp", "res50tp", 2048, dict(pretrain=False)),
        ("torchreid.models.resnet50_s1", "resnet50_s1", "resnet50_s1", 2048, dict(pretrain=False)),
    ],
)
def test_sta_family_full_model_parity_vs_reference(mod_name, builder, flax_name, dim, kwargs):
    import importlib

    from agrl_tpu.models import init_model

    ref = importlib.import_module(mod_name)
    tmodel = getattr(ref, builder)(
        num_classes=10, loss={"xent", "htri"}, last_stride=1, **kwargs
    ).eval()
    fmodel = init_model(
        flax_name, num_classes=10, loss={"xent", "htri"}, last_stride=1,
        num_split=4, num_parts=3, num_scale=1, num_gb=2, pyramid_part=True,
        use_pose=False, learn_graph=False,
    )
    _assert_eval_parity(fmodel, tmodel, seed=3, dim=dim)


# ---------------------------------------------------------------------------
# loss parity: the reference's own loss classes
# ---------------------------------------------------------------------------


def test_losses_vs_reference_classes():
    """xent+label-smooth and batch-hard triplet (both margins) computed by
    the REFERENCE loss modules must equal ours on the same inputs."""
    import importlib

    import jax.numpy as jnp

    from agrl_tpu.losses import batch_hard_triplet, cross_entropy_label_smooth

    ref_xent = importlib.import_module(
        "torchreid.losses.cross_entropy_loss"
    ).CrossEntropyLabelSmooth(num_classes=7, use_gpu=False)
    ref_htri_soft = importlib.import_module(
        "torchreid.losses.hard_mine_triplet_loss"
    ).TripletLoss(margin=0.3, soft=True)
    ref_htri_hard = importlib.import_module(
        "torchreid.losses.hard_mine_triplet_loss"
    ).TripletLoss(margin=0.3, soft=False)

    rng = np.random.RandomState(0)
    logits = rng.randn(8, 7).astype(np.float32)
    labels = rng.randint(0, 7, 8)
    feats = rng.randn(8, 32).astype(np.float32)
    # P x K structure so every anchor has a positive and a negative
    pids = np.repeat(np.arange(4), 2)

    with torch.no_grad():
        want_x = float(ref_xent(torch.tensor(logits), torch.tensor(labels)))
        want_s = float(ref_htri_soft(torch.tensor(feats), torch.tensor(pids)))
        want_h = float(ref_htri_hard(torch.tensor(feats), torch.tensor(pids)))

    got_x = float(cross_entropy_label_smooth(jnp.asarray(logits), jnp.asarray(labels), 7))
    got_s = float(batch_hard_triplet(jnp.asarray(feats), jnp.asarray(pids), soft=True))
    got_h = float(
        batch_hard_triplet(jnp.asarray(feats), jnp.asarray(pids), margin=0.3, soft=False)
    )

    np.testing.assert_allclose(got_x, want_x, rtol=1e-5)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-5)
    np.testing.assert_allclose(got_h, want_h, rtol=1e-5)


@pytest.mark.heavy
def test_training_objective_vs_reference_end_to_end():
    """Same weights, same batch: the FULL training objective (xent + htri
    DeepSupervision over the vmgn heads, reference train()
    train_vidreid_xent_htri.py:399-408) computed through the reference
    model+losses must equal ours. Train-mode BN uses batch statistics on
    both sides, so no stats alignment is needed; consistent_loss stays off
    (its subclip RNG cannot be shared across frameworks)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from agrl_tpu.losses import (
        batch_hard_triplet,
        cross_entropy_label_smooth,
        deep_supervision,
    )

    ref_vmgn = importlib.import_module("torchreid.models.vmgn")
    orig = ref_vmgn.init_pretrained_weights
    ref_vmgn.init_pretrained_weights = lambda *a, **k: None
    try:
        tmodel = ref_vmgn.GSTA(
            num_classes=6, loss={"xent", "htri"}, block=ref_vmgn.Bottleneck,
            layers=[3, 4, 6, 3], num_split=4, pyramid_part=True, num_gb=2,
            use_pose=True, learn_graph=True, consistent_loss=False,
        ).train()
    finally:
        ref_vmgn.init_pretrained_weights = orig

    ref_xent = importlib.import_module(
        "torchreid.losses.cross_entropy_loss"
    ).CrossEntropyLabelSmooth(num_classes=6, use_gpu=False)
    ref_htri = importlib.import_module(
        "torchreid.losses.hard_mine_triplet_loss"
    ).TripletLoss(margin=0.3, soft=True)
    ref_ds = importlib.import_module("torchreid.losses").DeepSupervision

    rng = np.random.RandomState(5)
    x, adj = _clip_inputs(rng, B=4)
    pids = np.repeat(np.arange(2), 2)

    with torch.no_grad():
        outs, featps = tmodel(torch.tensor(x), torch.tensor(adj))
        want_xent = float(ref_ds(ref_xent, outs, torch.tensor(pids)))
        want_htri = float(ref_ds(ref_htri, featps, torch.tensor(pids)))

    from agrl_tpu.models.vmgn import vmgn

    fmodel = vmgn(num_classes=6, loss={"xent", "htri"})
    merged = _flax_variables_from_torch(fmodel, tmodel, seq_len=4, height=128, width=64)
    x_nhwc = jnp.asarray(x.transpose(0, 1, 3, 4, 2))
    (out_list, f_list), _ = fmodel.apply(
        merged, x_nhwc, jnp.asarray(adj), train=True,
        mutable=["batch_stats"], rngs={"subclip": jax.random.PRNGKey(0)},
    )
    got_xent = float(
        deep_supervision(
            cross_entropy_label_smooth, out_list, jnp.asarray(pids), num_classes=6
        )
    )
    got_htri = float(
        deep_supervision(batch_hard_triplet, f_list, jnp.asarray(pids), soft=True)
    )
    np.testing.assert_allclose(got_xent, want_xent, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_htri, want_htri, rtol=2e-4, atol=2e-4)


@pytest.mark.heavy
def test_training_gradients_vs_reference_end_to_end():
    """Same weights, same batch: d(loss)/d(params) of the FULL vmgn
    training objective must match the reference's autograd, leaf for leaf.

    The torch per-parameter gradients are converted through the SAME name
    map as the weights (convert_torch_state_dict works on a {name: grad}
    dict), so every flax params leaf gets compared against its reference
    counterpart — forward parity could hide a wrong custom-VJP or stop-
    gradient; this cannot.

    Runs in float64 on BOTH sides (torch .double(), scoped jax x64): in
    f32 the mathematically-identical gradients diverge by up to ~1e-1
    relative in early conv layers purely from accumulation noise amplified
    through the BatchNorm backward chain; in f64 every leaf agrees to
    ~3e-6, which is what this test pins down. Graph affinity runs with
    dist_method='dot' (swapped in on both sides): l2's
    sqrt(clamp(d2, 1e-12)) has an O(1/sqrt(d2)) gradient at the diagonal's
    d2 ~ 0 that rounding flips by orders of magnitude, so exact l2
    GRADIENT parity is meaningless; 'dot' is smooth and also covers the
    emb_q/emb_k path l2 lacks."""
    import importlib

    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from agrl_tpu.losses import (
        batch_hard_triplet,
        cross_entropy_label_smooth,
        deep_supervision,
    )
    from agrl_tpu.models.weight_convert import convert_torch_state_dict

    ref_vmgn = importlib.import_module("torchreid.models.vmgn")
    orig = ref_vmgn.init_pretrained_weights
    ref_vmgn.init_pretrained_weights = lambda *a, **k: None
    # the reference inits from torch's GLOBAL RNG: pin it so the weight
    # draw (and the gradient conditioning) is independent of test order
    torch.manual_seed(123)
    try:
        tmodel = ref_vmgn.GSTA(
            num_classes=6, loss={"xent", "htri"}, block=ref_vmgn.Bottleneck,
            layers=[1, 1, 1, 1], num_split=4, pyramid_part=True, num_gb=2,
            use_pose=True, learn_graph=True, consistent_loss=False,
        ).train()
    finally:
        ref_vmgn.init_pretrained_weights = orig
    for i in range(len(tmodel.graph_layers)):
        tmodel.graph_layers[i] = ref_vmgn.GraphLayer(
            in_features=2048, out_features=2048, use_pose=True,
            learn_graph=True, dist_method="dot",
        )
    tmodel = tmodel.double()

    ref_xent = importlib.import_module(
        "torchreid.losses.cross_entropy_loss"
    ).CrossEntropyLabelSmooth(num_classes=6, use_gpu=False)
    ref_htri = importlib.import_module(
        "torchreid.losses.hard_mine_triplet_loss"
    ).TripletLoss(margin=0.3, soft=True)
    ref_ds = importlib.import_module("torchreid.losses").DeepSupervision

    rng = np.random.RandomState(7)
    B, S, H, W, V = 4, 4, 128, 64, 28
    x = rng.rand(B, S, 3, H, W)
    adj = rng.rand(B, V, V) + np.eye(V)
    pids = np.repeat(np.arange(2), 2)

    outs, featps = tmodel(torch.tensor(x), torch.tensor(adj))
    loss_t = ref_ds(ref_xent, outs, torch.tensor(pids)) + ref_ds(
        ref_htri, featps, torch.tensor(pids)
    )
    loss_t.backward()
    tgrads = {
        n: p.grad for n, p in tmodel.named_parameters() if p.grad is not None
    }
    want_tree, _ = convert_torch_state_dict(tgrads)
    want_flat = traverse_util.flatten_dict(want_tree["params"])

    from agrl_tpu.models.vmgn import VMGN

    fmodel = VMGN(
        num_classes=6, loss=frozenset({"xent", "htri"}), layers=(1, 1, 1, 1),
        num_split=4, pyramid_part=True, num_gb=2, dist_method="dot",
    )

    with jax.enable_x64(True):
        merged = _flax_variables_from_torch(
            fmodel, tmodel, seq_len=4, height=128, width=64
        )
        merged = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), merged)

        def loss_fn(params):
            (out_list, f_list), _ = fmodel.apply(
                {"params": params, "batch_stats": merged["batch_stats"]},
                jnp.asarray(x.transpose(0, 1, 3, 4, 2)), jnp.asarray(adj),
                train=True, mutable=["batch_stats"],
                rngs={"subclip": jax.random.PRNGKey(0)},
            )
            xent = deep_supervision(
                cross_entropy_label_smooth, out_list, jnp.asarray(pids),
                num_classes=6,
            )
            htri = deep_supervision(
                batch_hard_triplet, f_list, jnp.asarray(pids), soft=True
            )
            return xent + htri

        grads = jax.jit(jax.grad(loss_fn))(merged["params"])
        got_flat = traverse_util.flatten_dict(grads)

    # every reference gradient leaf must exist here and match
    assert set(want_flat) <= set(got_flat)
    checked = 0
    for path, want in want_flat.items():
        got = np.asarray(got_flat[path])
        want = np.asarray(want)
        scale = max(np.abs(want).max(), 1e-9)
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5 * scale,
            err_msg="/".join(map(str, path)),
        )
        checked += 1
    assert checked > 50  # the whole tree, not a token subset
    # leaves we have but the reference lacks = only frozen BNNeck biases
    # (no grad) -- everything trainable was compared
    extra = set(got_flat) - set(want_flat)
    assert all("bottleneck" in "/".join(map(str, p)) for p in extra), extra
