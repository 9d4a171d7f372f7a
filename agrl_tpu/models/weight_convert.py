"""torch -> Flax weight conversion for AGRL checkpoints and torchvision
ResNets.

The reference ships .pth.tar checkpoints (test scripts load them via
--load-weights, e.g. scripts/test_vidreid_xent_htri_vmgn_mars.sh) and
initializes backbones from torchvision ImageNet weights
(vmgn.py:360-370). This module maps those state dicts onto the Flax
module trees defined in agrl_tpu.models:

  * conv kernels: torch OIHW -> flax HWIO;
  * linear kernels: torch (out, in) -> flax (in, out);
  * BatchNorm: weight/bias -> scale/bias (params), running_mean/var ->
    mean/var (batch_stats); BNNeck layers drop the frozen zero bias;
  * name mapping reference GSTA -> VMGN module tree (conv1/bn1/layerX ->
    trunk/stem|layerX/blockN/..., layer4_1/2, bottlenecks, classifiers,
    graph_layers.{i} -> graph_layer_{i}).

Unmatched or shape-mismatched entries are skipped and reported —
the same partial-load semantics as --load-weights
(train_vidreid_xent_htri.py:279-287).
"""

from __future__ import annotations

import re

import numpy as np
from flax import traverse_util


def _to_numpy(t):
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


# torch BatchNorm leaf -> (flax leaf, collection); num_batches_tracked has
# no Flax counterpart. Single source of truth for every converter below.
_BN_LEAF = {
    "weight": ("scale", "params"),
    "bias": ("bias", "params"),
    "running_mean": ("mean", "batch_stats"),
    "running_var": ("var", "batch_stats"),
}


def _bn_map(prefix: tuple, leaf: str):
    """torch BN leaf under `prefix` -> (flax path, collection, None)."""
    hit = _BN_LEAF.get(leaf)
    if hit is None:
        return None
    return prefix + (hit[0],), hit[1], None


def _split_torch_name(name: str):
    """reference module path -> (flax path tuple, collection, transform).

    Returns None for entries with no Flax counterpart (num_batches_tracked,
    frozen BNNeck biases)."""
    name = re.sub(r"^module\.", "", name)
    parts = name.split(".")

    bn = _bn_map

    # stem
    if parts[0] == "conv1" and parts[1] == "weight":
        return ("trunk", "stem", "conv1", "kernel"), "params", "conv"
    if parts[0] == "bn1":
        return bn(("trunk", "stem", "bn1"), parts[1])

    # residual stages: layer1..3 under trunk; layer4 / layer4_1 / layer4_2 top level
    m = re.match(r"^layer(\d)(_\d)?$", parts[0])
    if m:
        stage = parts[0]
        prefix = ("trunk", stage) if stage in ("layer1", "layer2", "layer3") else (stage,)
        block = (f"block{parts[1]}",)
        rest = parts[2:]
        if rest[0] in ("conv1", "conv2", "conv3") and rest[1] == "weight":
            return prefix + block + (rest[0], "kernel"), "params", "conv"
        if rest[0] in ("bn1", "bn2", "bn3"):
            return bn(prefix + block + (rest[0],), rest[1])
        if rest[0] == "downsample":
            if rest[1] == "0" and rest[2] == "weight":
                return prefix + block + ("downsample_conv", "kernel"), "params", "conv"
            if rest[1] == "1":
                return bn(prefix + block + ("downsample_bn",), rest[2])
        return None

    # bottleneck BNs (BNNeck: frozen zero bias has no Flax param)
    for tname, fname in (
        ("global_bottleneck", "global_bottleneck"),
        ("att_bottleneck", "att_bottleneck"),
        ("bottleneck", "bottleneck"),
    ):
        if parts[0] == tname:
            if parts[1] == "bias":
                return None  # frozen at zero; BNNeck uses use_bias=False
            return bn((fname, "bn"), parts[1])

    # classifiers
    for tname, fname in (
        ("global_classifier", "global_classifier"),
        ("att_classifier", "att_classifier"),
        ("classifier", "classifier"),
    ):
        if parts[0] == tname:
            if parts[1] == "weight":
                return (fname, "kernel"), "params", "linear"
            if parts[1] == "bias":
                return (fname, "bias"), "params", None

    # ganet PAM (position attention, ganet.py:98-132): 1x1 convs with bias
    # + the gamma blend scalar. CAM (ganet.py:135-167) is defined but never
    # used in the reference forward — no Flax counterpart, reported skipped.
    if parts[0] == "pam_layer":
        sub = parts[1]
        if sub == "gamma":
            return ("pam_layer", "gamma"), "params", None
        if sub in ("query_conv", "key_conv", "value_conv"):
            if parts[2] == "weight":
                return ("pam_layer", sub, "kernel"), "params", "conv"
            return ("pam_layer", sub, "bias"), "params", None

    # sta/simple_sta head: fc1 = Sequential(Linear(bias=False), BatchNorm1d,
    # ReLU) (sta.py:150-154) -> Flax fc1 + fc1_bn
    if parts[0] == "fc1":
        if parts[1] == "0" and parts[2] == "weight":
            return ("fc1", "kernel"), "params", "linear"
        if parts[1] == "1":
            return bn(("fc1_bn",), parts[2])

    # graph layers: graph_layers.{i}.linear|bn|emb_q|emb_k
    m = re.match(r"^graph_layers$", parts[0])
    if m:
        i = parts[1]
        sub = parts[2]
        prefix = (f"graph_layer_{i}",)
        if sub == "linear" and parts[3] == "weight":
            return prefix + ("linear", "kernel"), "params", "linear"
        if sub in ("emb_q", "emb_k"):
            if parts[3] == "weight":
                return prefix + (sub, "kernel"), "params", "linear"
            return prefix + (sub, "bias"), "params", None
        if sub == "bn":
            return bn(prefix + ("bn",), parts[3])
    return None


def _transform(arr: np.ndarray, kind):
    if kind == "conv":
        return arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if kind == "linear":
        return arr.T  # (out, in) -> (in, out)
    return arr


def convert_torch_state_dict(state_dict: dict):
    """torch state_dict -> {'params': tree, 'batch_stats': tree} (numpy)."""
    params, batch_stats, skipped = {}, {}, []
    for name, value in state_dict.items():
        mapped = _split_torch_name(name)
        if mapped is None:
            if not name.endswith("num_batches_tracked") and not name.endswith(
                "bottleneck.bias"
            ):
                skipped.append(name)
            continue
        path, collection, kind = mapped
        arr = _transform(_to_numpy(value), kind)
        (params if collection == "params" else batch_stats)[path] = arr
    return (
        {
            "params": traverse_util.unflatten_dict(params),
            "batch_stats": traverse_util.unflatten_dict(batch_stats),
        },
        skipped,
    )


def merge_converted(variables, converted):
    """Shape-filtered merge of a converted tree into model variables
    (f32 cast: torch trees arrive as f64/torch dtypes).

    Returns (new_variables, matched_paths, skipped_paths)."""
    from agrl_tpu.core.checkpoint import shape_filtered_merge

    return shape_filtered_merge(variables, converted, cast_dtype=np.float32)


def _graphnet_last_classifier(state_dict: dict) -> int:
    """Index of the FUSED (last) classifier in a msppn/msppgn state dict.
    Strips any DataParallel 'module.' prefix before reading indices, like
    the per-entry conversion loop does."""
    return max(
        (
            int(n.split(".")[1])
            for n in (re.sub(r"^module\.", "", s) for s in state_dict)
            if n.startswith(("classifier.", "classifiers."))
        ),
        default=-1,
    )


def _graphnet_name_map(name: str, arch: str, n_cls: int):
    """torch msppn/msppgn entry name -> (flax path, collection, transform),
    or None for entries with no Flax counterpart. `n_cls` = index of the
    fused classifier (see _graphnet_last_classifier)."""

    def bn(prefix, leaf):
        hit = _BN_LEAF.get(leaf)
        return (prefix + (hit[0],), hit[1]) if hit else None

    parts = name.split(".")
    # ---- backbone ----
    if arch == "msppn":
        if parts[0] == "conv1" and parts[1] == "weight":
            return ("trunk", "stem", "conv1", "kernel"), "params", "conv"
        if parts[0] == "bn1":
            hit = bn(("trunk", "stem", "bn1"), parts[1])
            return (*hit, None) if hit else None
        stage = re.match(r"^layer(\d)$", parts[0])
        if stage:
            return _map_res_block(("trunk", parts[0]), parts[1:])
    else:
        if parts[0] == "base":
            idx = parts[1]
            if idx == "0" and parts[2] == "weight":
                return ("trunk", "stem", "conv1", "kernel"), "params", "conv"
            if idx == "1":
                hit = bn(("trunk", "stem", "bn1"), parts[2])
                return (*hit, None) if hit else None
            if idx in ("4", "5", "6", "7"):
                return _map_res_block(
                    ("trunk", f"layer{int(idx) - 3}"), parts[2:]
                )
            return None
    # ---- reduce heads ----
    m = re.match(r"^reduce_?f?(\d)$", parts[0])
    if m and (arch == "msppn") == parts[0].startswith("reduce_f"):
        k = m.group(1)
        if parts[1] == "weight":
            return (f"reduce_f{k}", "reduce", "kernel"), "params", "linear"
        return (f"reduce_f{k}", "reduce", "bias"), "params", None
    m = re.match(r"^bn_?f?(\d)$", parts[0])
    if m and (arch == "msppn") == parts[0].startswith("bn_f"):
        hit = bn((f"reduce_f{m.group(1)}", "bn"), parts[1])
        return (*hit, None) if hit else None
    # ---- graph blocks (msppgn) ----
    if parts[0] == "gbs":
        i, sub = parts[1], parts[2]
        prefix = (f"gb_{i}",)
        if sub == "linear" and parts[3] == "weight":
            return prefix + ("linear", "kernel"), "params", "linear"
        if sub in ("emb_q", "emb_k"):
            if parts[3] == "weight":
                return prefix + (sub, "kernel"), "params", "linear"
            return prefix + (sub, "bias"), "params", None
        if sub == "bn":
            hit = bn(prefix + ("bn",), parts[3])
            return (*hit, None) if hit else None
        return None
    # ---- heads ----
    if parts[0] == "fusion_conv" and parts[1] == "weight":
        # torch Conv1d (1, V, 1) -> our (V, 1) fusion matrix
        return ("fusion_conv",), "params", "fusion"
    if parts[0] in ("classifier", "classifiers"):
        i = int(parts[1])
        fname = "classifier_fused" if i == n_cls else f"classifier_{i}"
        if parts[2] == "weight":
            return (fname, "kernel"), "params", "linear"
        return (fname, "bias"), "params", None
    return None


def convert_graphnet_state_dict(state_dict: dict, arch: str):
    """torch msppn/msppgn state dict -> Flax variable tree.

    The two graphnet archs name their modules differently from the
    vmgn family (reference graphnet.py):
      * msppn (MSPyraPartNet :120-214): direct backbone attrs conv1/bn1/
        layer1..4 (ALL under our MultiScaleTrunk), reduce_f{k} + bn_f{k}
        heads, per-vertex `classifier.{i}` list whose LAST entry is the
        fused head, Conv1d `fusion_conv`;
      * msppgn (MSPyraPartGraphNet :217-320): backbone as a Sequential
        `base.{0,1,4..7}`, reduce{k} + bn{k} heads (bn1 here is a head BN,
        not the stem!), GraphBlocks `gbs.{i}.{linear,emb_q,emb_k,bn}`,
        `classifiers.{i}`.

    Returns ({'params', 'batch_stats'}, skipped_names)."""
    assert arch in ("msppn", "msppgn")
    params, batch_stats, skipped = {}, {}, []

    n_cls = _graphnet_last_classifier(state_dict)

    def map_name(name):
        return _graphnet_name_map(name, arch, n_cls)

    for name, value in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        if name.endswith("num_batches_tracked"):
            continue
        mapped = map_name(name)
        if mapped is None:
            skipped.append(name)
            continue
        path, collection, kind = mapped
        arr = _to_numpy(value)
        if kind == "fusion":
            arr = arr.reshape(arr.shape[0], arr.shape[1]).T  # (1,V,1)->(V,1)
        else:
            arr = _transform(arr, kind)
        (params if collection == "params" else batch_stats)[path] = arr
    return (
        {
            "params": traverse_util.unflatten_dict(params),
            "batch_stats": traverse_util.unflatten_dict(batch_stats),
        },
        skipped,
    )


def _map_res_block(prefix: tuple, rest: list):
    """layerX.N.{convK,bnK,downsample} -> Flax ResLayer/block paths."""
    block = (f"block{rest[0]}",)
    if rest[1] in ("conv1", "conv2", "conv3") and rest[2] == "weight":
        return prefix + block + (rest[1], "kernel"), "params", "conv"
    if rest[1] in ("bn1", "bn2", "bn3"):
        return _bn_map(prefix + block + (rest[1],), rest[2])
    if rest[1] == "downsample":
        if rest[2] == "0" and rest[3] == "weight":
            return prefix + block + ("downsample_conv", "kernel"), "params", "conv"
        if rest[2] == "1":
            return _bn_map(prefix + block + ("downsample_bn",), rest[3])
    return None


def convert_temporal_state_dict(state_dict: dict):
    """torch ResNet50TP/TA/RNN (legacy temporal family,
    resnet_temporal.py:14-133) -> Flax variable tree.

    Layout: `base.{0,1,4..7}` Sequential backbone (torchvision children
    slice) -> our ResNetBackbone('backbone'); `classifier` Dense;
    TA's `attention_conv` (Conv2d full-map kernel) and `attention_tconv`
    (Conv1d k=3); RNN's packed-gate `lstm` -> flax OptimizedLSTMCell
    per-gate dense layers (torch gate order i,f,g,o == flax ii/if/ig/io;
    the two torch biases sum into the h-side bias).

    Returns ({'params', 'batch_stats'}, skipped_names)."""
    params, batch_stats, skipped = {}, {}, []

    bn_leaf = _BN_LEAF.get

    def emit(path, collection, arr):
        (params if collection == "params" else batch_stats)[path] = arr

    gates = ("i", "f", "g", "o")
    for name, value in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        arr = _to_numpy(value)
        if parts[0] == "base":
            idx = parts[1]
            if idx == "0" and parts[2] == "weight":
                emit(("backbone", "trunk", "stem", "conv1", "kernel"), "params",
                     _transform(arr, "conv"))
                continue
            if idx == "1":
                hit = bn_leaf(parts[2])
                if hit:
                    emit(("backbone", "trunk", "stem", "bn1", hit[0]), hit[1], arr)
                    continue
            if idx in ("4", "5", "6"):
                mapped = _map_res_block(
                    ("backbone", "trunk", f"layer{int(idx) - 3}"), parts[2:]
                )
            elif idx == "7":
                mapped = _map_res_block(("backbone", "layer4"), parts[2:])
            else:
                mapped = None
            if mapped:
                emit(mapped[0], mapped[1], _transform(arr, mapped[2]))
                continue
            skipped.append(name)
            continue
        if parts[0] == "classifier":
            emit(("classifier", "kernel" if parts[1] == "weight" else "bias"),
                 "params", _transform(arr, "linear" if parts[1] == "weight" else None))
            continue
        if parts[0] == "attention_conv":
            if parts[1] == "weight":
                emit(("attention_conv", "kernel"), "params", _transform(arr, "conv"))
            else:
                emit(("attention_conv", "bias"), "params", arr)
            continue
        if parts[0] == "attention_tconv":
            if parts[1] == "weight":  # Conv1d (out, in, k) -> flax (k, in, out)
                emit(("attention_tconv", "kernel"), "params", arr.transpose(2, 1, 0))
            else:
                emit(("attention_tconv", "bias"), "params", arr)
            continue
        if parts[0] == "lstm":
            H4 = arr.shape[0]
            H = H4 // 4
            leaf = parts[1]
            for k, g in enumerate(gates):
                chunk = arr[k * H : (k + 1) * H]
                if leaf == "weight_ih_l0":
                    emit(("lstm", f"i{g}", "kernel"), "params", chunk.T)
                elif leaf == "weight_hh_l0":
                    emit(("lstm", f"h{g}", "kernel"), "params", chunk.T)
                elif leaf in ("bias_ih_l0", "bias_hh_l0"):
                    # flax keeps one bias (h-side); torch's two biases sum
                    key = ("lstm", f"h{g}", "bias")
                    params[key] = params.get(key, 0) + chunk
            continue
        skipped.append(name)
    return (
        {
            "params": traverse_util.unflatten_dict(params),
            "batch_stats": traverse_util.unflatten_dict(batch_stats),
        },
        skipped,
    )


def convert_resnet50m_state_dict(state_dict: dict):
    """torch ResNet50M (mid-level features, resnet.py:64-115) -> Flax tree.

    The reference re-groups the torchvision children: layers1 = Sequential
    (conv1, bn1, relu), layers2 = (maxpool, layer1), layers3/4 = layer2/3,
    layers5a/b/c = layer4's three blocks, fc_fuse = (Linear, BN1d, ReLU).

    Returns ({'params', 'batch_stats'}, skipped_names)."""
    params, batch_stats, skipped = {}, {}, []

    bn_leaf = _BN_LEAF.get

    def emit(path, collection, arr):
        (params if collection == "params" else batch_stats)[path] = arr

    def block_leaf(prefix, rest, arr):
        """map a bottleneck's own conv/bn/downsample leaves (no block level)."""
        if rest[0].startswith("conv") and rest[1] == "weight":
            emit(prefix + (rest[0], "kernel"), "params", _transform(arr, "conv"))
            return True
        if rest[0].startswith("bn"):
            hit = bn_leaf(rest[1])
            if hit:
                emit(prefix + (rest[0], hit[0]), hit[1], arr)
                return True
        if rest[0] == "downsample":
            if rest[1] == "0" and rest[2] == "weight":
                emit(prefix + ("downsample_conv", "kernel"), "params", _transform(arr, "conv"))
                return True
            if rest[1] == "1":
                hit = bn_leaf(rest[2])
                if hit:
                    emit(prefix + ("downsample_bn", hit[0]), hit[1], arr)
                    return True
        return False

    stage_map = {"layers2": ("1", "layer1"), "layers3": (None, "layer2"),
                 "layers4": (None, "layer3")}
    for name, value in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        arr = _to_numpy(value)
        if parts[0] == "layers1":
            if parts[1] == "0" and parts[2] == "weight":
                emit(("trunk", "stem", "conv1", "kernel"), "params", _transform(arr, "conv"))
                continue
            if parts[1] == "1":
                hit = bn_leaf(parts[2])
                if hit:
                    emit(("trunk", "stem", "bn1", hit[0]), hit[1], arr)
                    continue
        elif parts[0] in stage_map:
            seq_idx, layer = stage_map[parts[0]]
            rest = parts[1:]
            if seq_idx is not None:
                if rest[0] != seq_idx:  # layers2.0 is the maxpool
                    skipped.append(name)
                    continue
                rest = rest[1:]
            mapped = _map_res_block(("trunk", layer), rest)
            if mapped:
                emit(mapped[0], mapped[1], _transform(arr, mapped[2]))
                continue
        elif parts[0] in ("layers5a", "layers5b", "layers5c"):
            if block_leaf((parts[0],), parts[1:], arr):
                continue
        elif parts[0] == "fc_fuse":
            if parts[1] == "0":
                emit(("fc_fuse", "kernel" if parts[2] == "weight" else "bias"),
                     "params", _transform(arr, "linear" if parts[2] == "weight" else None))
                continue
            if parts[1] == "1":
                hit = bn_leaf(parts[2])
                if hit:
                    emit(("fc_fuse_bn", hit[0]), hit[1], arr)
                    continue
        elif parts[0] == "classifier":
            emit(("classifier", "kernel" if parts[1] == "weight" else "bias"),
                 "params", _transform(arr, "linear" if parts[1] == "weight" else None))
            continue
        skipped.append(name)
    return (
        {
            "params": traverse_util.unflatten_dict(params),
            "batch_stats": traverse_util.unflatten_dict(batch_stats),
        },
        skipped,
    )


def convert_resnet3d_state_dict(state_dict: dict):
    """torch ResNet3d (Kinetics family, resnet3d.py:110-233) -> Flax tree.

    conv1/bn1/layer{i}.{j}.{convK,bnK,downsample} map onto our flat
    `layer{i}_block{j}` modules; Conv3d OIDHW kernels -> DHWIO; the
    Kinetics `fc` head maps onto `classifier` (shape-filtered away when
    class counts differ, like the reference's partial load :155-165).

    Returns ({'params', 'batch_stats'}, skipped_names)."""
    params, batch_stats, skipped = {}, {}, []

    bn_leaf = _BN_LEAF.get

    def emit(path, collection, arr):
        (params if collection == "params" else batch_stats)[path] = arr

    for name, value in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        if name.endswith("num_batches_tracked"):
            continue
        parts = name.split(".")
        arr = _to_numpy(value)
        if parts[0] == "conv1" and parts[1] == "weight":
            emit(("conv1", "kernel"), "params", arr.transpose(2, 3, 4, 1, 0))
            continue
        if parts[0] == "bn1":
            hit = bn_leaf(parts[1])
            if hit:
                emit(("bn1", hit[0]), hit[1], arr)
                continue
        m = re.match(r"^layer(\d)$", parts[0])
        if m:
            prefix = (f"layer{m.group(1)}_block{parts[1]}",)
            rest = parts[2:]
            if rest[0].startswith("conv") and rest[1] == "weight":
                emit(prefix + (rest[0], "kernel"), "params", arr.transpose(2, 3, 4, 1, 0))
                continue
            if rest[0].startswith("bn"):
                hit = bn_leaf(rest[1])
                if hit:
                    emit(prefix + (rest[0], hit[0]), hit[1], arr)
                    continue
            if rest[0] == "downsample":
                if rest[1] == "0" and rest[2] == "weight":
                    emit(prefix + ("downsample_conv", "kernel"), "params",
                         arr.transpose(2, 3, 4, 1, 0))
                    continue
                if rest[1] == "1":
                    hit = bn_leaf(rest[2])
                    if hit:
                        emit(prefix + ("downsample_bn", hit[0]), hit[1], arr)
                        continue
            skipped.append(name)
            continue
        if parts[0] == "fc":
            emit(("classifier", "kernel" if parts[1] == "weight" else "bias"),
                 "params", arr.T if parts[1] == "weight" else arr)
            continue
        skipped.append(name)
    return (
        {
            "params": traverse_util.unflatten_dict(params),
            "batch_stats": traverse_util.unflatten_dict(batch_stats),
        },
        skipped,
    )


def convert_imagenet_resnet(state_dict: dict, target_params: dict):
    """torchvision-style ResNet state dict -> converted variable tree.

    Reproduces the reference's ImageNet init semantics:
      * single-layer4 archs (gsta/ganet/sta/res50tp/...): name+shape
        filtered load, `layer4.*` maps straight onto `layer4`
        (reference init_pretrained_weights, vmgn.py:360-370);
      * vmgn: the reference loads the backbone BEFORE layer4 is
        deep-copied (vmgn.py:224-234), so both `layer4_1` and `layer4_2`
        start from the SAME ImageNet layer4 — here `layer4.*` entries fan
        out to every `layer4*` branch present in the target;
      * classifier head (`fc.*`) is dropped (shape-filtered out in the
        reference; the re-id heads are new).

    The emitted paths adapt to the target tree's layout: a `backbone`
    wrapper (legacy image/temporal families, resnet.py:20-62 /
    resnet_temporal.py:14-133), layer4 inside the trunk (graphnet's
    MultiScaleTrunk, graphnet.py:40-55), and resnet50m's unwrapped
    layers5a/b/c blocks (resnet.py:64-115) all receive the weights.
    """
    # locate the backbone inside the target tree
    root_prefix = ()
    root = target_params
    if isinstance(root.get("backbone"), dict):
        root_prefix = ("backbone",)
        root = root["backbone"]
    trunk = root.get("trunk", {})
    trunk_has_layer4 = isinstance(trunk, dict) and "layer4" in trunk
    has_layers5 = isinstance(root.get("layers5a"), dict)
    if trunk_has_layer4 or has_layers5:
        branches = ["layer4"]  # relocated by _adapt below
    else:
        branches = sorted(k for k in root if re.match(r"^layer4(_\d+)?$", k))

    def _adapt(path):
        if path[0] == "layer4":
            if trunk_has_layer4:
                path = ("trunk",) + path
            elif has_layers5:
                block_idx = int(path[1][len("block"):])
                if block_idx >= 3:
                    return None  # layers5 has exactly three blocks
                path = (f"layers5{'abc'[block_idx]}",) + path[2:]
        return root_prefix + path

    params, batch_stats = {}, {}

    def emit(name, value):
        mapped = _split_torch_name(name)
        if mapped is None:
            return
        path, collection, kind = mapped
        path = _adapt(path)
        if path is None:
            return
        arr = _transform(_to_numpy(value), kind)
        (params if collection == "params" else batch_stats)[path] = arr

    for name, value in state_dict.items():
        name = re.sub(r"^module\.", "", name)
        if name.startswith("fc."):
            continue
        if name.startswith("layer4."):
            for branch in branches:
                emit(branch + name[len("layer4"):], value)
        else:
            emit(name, value)
    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(batch_stats),
    }


def _load_state_dict_file(fpath: str, key: str = "state_dict") -> dict:
    """Read a torch-style state dict from .pth/.pth.tar (torch required) or
    .npz/.npy (numpy archive keyed by torch names — the no-torch path)."""
    if fpath.endswith(".npz"):
        with np.load(fpath) as z:
            return {k: z[k] for k in z.files}
    if fpath.endswith(".npy"):
        return dict(np.load(fpath, allow_pickle=True).item())
    import torch

    ckpt = torch.load(fpath, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and key in ckpt:
        return ckpt[key]
    return ckpt


def init_pretrained_weights(variables, source):
    """ImageNet-pretrained backbone init — reference init_pretrained_weights
    (vmgn.py:360-370) incl. the vmgn load-before-layer4-duplication quirk.

    `source` is a torchvision-style ResNet state dict, or a path to one
    (.pth/.pth.tar via torch, .npz/.npy via numpy).

    Returns (new_variables, matched, skipped) — shape-filtered partial
    merge, unmatched model leaves keep their random init."""
    if isinstance(source, str):
        source = _load_state_dict_file(source)
    converted = convert_imagenet_resnet(source, variables.get("params", {}))
    return merge_converted(variables, converted)


# arch name (models/__init__.py registry) -> converter family. The GSTA
# family (vmgn/gsta/ganet/sta/simple_sta/res50tp/resnet50_s1) shares one
# name map; graphnet, temporal/image, resnet50m, and 3D each have their own.
_GRAPHNET_ARCHS = {"msppn", "msppgn"}
_TEMPORAL_ARCHS = {
    "res50tp_legacy", "res50ta", "res50rnn",  # legacy video
    "resnet50", "resnet101", "resnet50b",  # image (same torch layout)
}
_RESNET3D_ARCHS = {"resnet3d50", "resnet3dt"}


def convert_reference_checkpoint(variables, source, arch: str):
    """One-command migration for released reference checkpoints.

    The reference's own test scripts pass .pth.tar files to --load-weights
    (scripts/test_vidreid_xent_htri_vmgn_mars.sh:15, loader driver
    :279-287 with the iotools.py:45-49 'module.' strip) — a user switching
    frameworks holds exactly those files. `source` is a torch state dict
    or a path (.pth/.pth.tar via torch-cpu, .npz/.npy without torch);
    `arch` picks the converter family. Shape-filtered merge, so heads for
    a different #classes are skipped and reported, like the reference.

    Returns (new_variables, matched, skipped, unmapped): matched/skipped
    are flax-side paths; unmapped are torch names with no flax counterpart.
    """
    if isinstance(source, str):
        source = _load_state_dict_file(source)
    source = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in source.items()
    }
    if arch in _GRAPHNET_ARCHS:
        converted, unmapped = convert_graphnet_state_dict(source, arch)
    elif arch in _TEMPORAL_ARCHS:
        converted, unmapped = convert_temporal_state_dict(source)
    elif arch == "resnet50m":
        converted, unmapped = convert_resnet50m_state_dict(source)
    elif arch in _RESNET3D_ARCHS:
        converted, unmapped = convert_resnet3d_state_dict(source)
    else:  # GSTA family (the registry default)
        converted, unmapped = convert_torch_state_dict(source)
    new_vars, matched, skipped = merge_converted(variables, converted)
    return new_vars, matched, skipped, unmapped


def _inverse_transform(arr: np.ndarray, kind):
    """Invert _transform (+ the graphnet 'fusion' reshape): flax layout ->
    torch layout."""
    if kind == "conv":
        return arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
    if kind == "linear":
        return arr.T  # (in, out) -> (out, in)
    if kind == "fusion":
        return arr.T.reshape(1, arr.shape[0], 1)  # (V, 1) -> Conv1d (1, V, 1)
    return arr


def _probe_entry_maps(convert_fn, template: dict):
    """torch name -> [(flat flax path incl. collection, source-index array)]
    by feeding the FORWARD converter one index-valued entry at a time.

    The probe array holds arange(size) (exact in float64 up to 2^53), so
    every emitted flax leaf literally contains, at each position, the flat
    index of the torch element it came from — which inverts ANY pure
    relayout (transpose/reshape/slice/chunk) the converter applies without
    re-deriving it. Converters that SUM two torch entries into one leaf
    (the LSTM bias pair) show up as two names claiming one path; the
    export resolves those by residual (see _export_by_probe)."""
    maps = {}
    for name, tvalue in template.items():
        arr = _to_numpy(tvalue)
        probe = np.arange(arr.size, dtype=np.float64).reshape(arr.shape)
        tree, _ = convert_fn({name: probe})
        entries = []
        for collection in ("params", "batch_stats"):
            for path, leaf in traverse_util.flatten_dict(
                tree.get(collection, {})
            ).items():
                idx = np.rint(np.asarray(leaf)).astype(np.int64)
                entries.append(((collection,) + tuple(path), idx))
        if entries:
            maps[name] = entries
    return maps


def _export_by_probe(variables, template: dict, convert_fn):
    """Reverse migration for the emit-style converters (legacy temporal/
    image/resnet50m/3D families): invert the forward converter via
    _probe_entry_maps. Same contract as export_torch_state_dict."""
    flat = {}
    for collection in ("params", "batch_stats"):
        for path, leaf in traverse_util.flatten_dict(
            variables.get(collection, {})
        ).items():
            flat[(collection,) + tuple(path)] = leaf

    maps = _probe_entry_maps(convert_fn, template)
    # group claimants per flax path (template order) to resolve summed
    # emissions: forward computes leaf = sum_i T_i(torch[name_i]), so all
    # but the LAST claimant anchor at their template values and the last
    # gets the residual — the round trip then reproduces the leaf exactly
    # (all claimants count as `filled`: every one was actively resolved).
    claims: dict[tuple, list] = {}
    for name in template:
        for path, idx in maps.get(name, []):
            claims.setdefault(path, []).append((name, idx))

    writes: dict[str, list] = {name: [] for name in template}
    for path, claimants in claims.items():
        leaf = flat.get(path)
        if leaf is None:
            continue
        leaf = np.asarray(leaf, np.float32)
        if any(idx.shape != leaf.shape for _, idx in claimants):
            continue  # e.g. a different-#classes head: keep the template
        if len(claimants) == 1:
            name, idx = claimants[0]
            writes[name].append((idx.ravel(), leaf.ravel()))
        else:
            *others, (lname, lidx) = claimants
            residual = leaf.astype(np.float64).ravel()
            for name, idx in others:
                tvals = _to_numpy(template[name]).ravel()[idx.ravel()]
                residual -= tvals
                # the anchor IS resolved (at its template value, so
                # anchor + residual = the flax leaf exactly): report it
                # filled, not kept — `kept` means "no flax counterpart"
                # to callers (tools/export_torch.py refuses on surprises)
                writes[name].append((idx.ravel(), tvals.astype(np.float32)))
            writes[lname].append((lidx.ravel(), residual.astype(np.float32)))

    out, filled, kept = {}, [], []
    for name, tvalue in template.items():
        tarr = _to_numpy(tvalue)
        if writes[name]:
            dst = tarr.astype(np.float32).copy()
            for pos, vals in writes[name]:
                dst.ravel()[pos] = vals
            out[name] = dst
            filled.append(name)
        else:
            out[name] = tarr
            kept.append(name)
    return out, filled, kept


def export_torch_state_dict(variables, template: dict, arch: str):
    """REVERSE migration: fill a reference-named torch state dict with this
    framework's weights (train on TPU -> hand a .pth.tar back to a torch
    rig, or re-verify a TPU-trained model under the reference's own test()).

    `template` is any torch state dict of the same arch — typically the
    checkpoint you migrated FROM, or a fresh torch-side init. It is the
    name authority: the export reuses the FORWARD converters' name maps
    (so both directions share one source of truth) and inverse-transforms
    each flax leaf into torch layout (HWIO->OIHW convs, transposed linear
    kernels, the graphnet fusion Conv1d reshape). Template entries with no
    flax counterpart keep their template values — num_batches_tracked and
    the reference's frozen-at-zero BNNeck biases — as do shape mismatches
    (a different #classes head), mirroring the forward shape-filtered
    partial load.

    Supported archs: EVERY converter family — the GSTA registry family +
    msppn/msppgn via their shared name maps, and the legacy unregistered
    families (temporal/image, resnet50m, 3D) via _export_by_probe, which
    inverts their forward converters directly (one source of truth; the
    reference round-trips all of them via torch.save,
    /root/reference/torchreid/utils/iotools.py:41-55).

    Returns (state_dict {name: np.ndarray float32}, filled, kept):
    `filled` = names overwritten from flax; `kept` = template names left
    as-is (with the reason encoded by membership: no counterpart or shape
    mismatch)."""
    if arch in _GRAPHNET_ARCHS:
        n_cls = _graphnet_last_classifier(template)

        def name_map(n):
            return _graphnet_name_map(n, arch, n_cls)

    elif arch in _TEMPORAL_ARCHS:
        return _export_by_probe(variables, template, convert_temporal_state_dict)
    elif arch == "resnet50m":
        return _export_by_probe(variables, template, convert_resnet50m_state_dict)
    elif arch in _RESNET3D_ARCHS:
        return _export_by_probe(variables, template, convert_resnet3d_state_dict)
    else:  # GSTA family (the registry default)
        name_map = _split_torch_name

    flat = {}
    for collection in ("params", "batch_stats"):
        for path, leaf in traverse_util.flatten_dict(
            variables.get(collection, {})
        ).items():
            flat[(collection,) + tuple(path)] = leaf

    out, filled, kept = {}, [], []
    for name, tvalue in template.items():
        base = re.sub(r"^module\.", "", name)
        tarr = _to_numpy(tvalue)
        mapped = None if base.endswith("num_batches_tracked") else name_map(base)
        if mapped is None:
            out[name] = tarr
            kept.append(name)
            continue
        path, collection, kind = mapped
        leaf = flat.get((collection,) + tuple(path))
        if leaf is None:
            out[name] = tarr
            kept.append(name)
            continue
        arr = _inverse_transform(np.asarray(leaf, np.float32), kind)
        if tuple(arr.shape) != tuple(tarr.shape):
            out[name] = tarr  # e.g. a different-#classes head
            kept.append(name)
            continue
        out[name] = arr
        filled.append(name)
    return out, filled, kept


# file extensions that mean "a torch-world state dict" (the reference's
# released checkpoints, or a torch-named numpy archive for torch-free hosts)
TORCH_CKPT_EXTS = (".pth", ".pth.tar", ".npz", ".npy")


def load_any_checkpoint(variables, fpath: str, arch: str):
    """--load-weights semantics for ANY checkpoint format, in one place
    (the CLI driver and tools/export_model.py both route through this):
    TORCH_CKPT_EXTS -> convert_reference_checkpoint (arch-dispatched
    conversion + shape-filtered merge); anything else -> this framework's
    msgpack via core.checkpoint.load_weights_partial.

    Returns (new_variables, matched, skipped, unmapped); `unmapped` (torch
    names with no flax counterpart) is [] for msgpack checkpoints."""
    if fpath.endswith(TORCH_CKPT_EXTS):
        return convert_reference_checkpoint(variables, fpath, arch)
    from agrl_tpu.core.checkpoint import load_weights_partial

    new_vars, matched, skipped = load_weights_partial(variables, fpath)
    return new_vars, matched, skipped, []


def load_torch_checkpoint(variables, fpath: str, key: str = "state_dict"):
    """Load a reference .pth(.tar) checkpoint into Flax variables.

    Requires torch (CPU) for unpickling; returns (variables, matched,
    skipped)."""
    import torch

    ckpt = torch.load(fpath, map_location="cpu", weights_only=False)
    state_dict = ckpt.get(key, ckpt) if isinstance(ckpt, dict) else ckpt
    converted, unmapped = convert_torch_state_dict(state_dict)
    new_vars, matched, skipped = merge_converted(variables, converted)
    if unmapped:
        print(f"(no Flax counterpart for {len(unmapped)} torch entries, e.g. {unmapped[:3]})")
    return new_vars, matched, skipped
