"""AOT export + in-process serving API for the eval forward.

The reference has no deployment story beyond re-running its test script
(train_vidreid_xent_htri.py:450-546 under --evaluate). This framework is
meant for production serving, so the eval forward — the exact program the
Evaluator runs (on-device normalize + optional bf16 cast + model apply,
engine/evaluator.py `make_eval_forward`) — is exportable two ways:

  * `FeatureExtractor` — in-process serving. Wraps model + variables
    behind ONE compiled batch shape: ragged request batches pad to
    `batch_size` and the padding rows are sliced off, so a serving
    process compiles exactly one XLA program per model and every request
    hits the cached executable.
  * `export_eval_forward` / `save_exported` / `load_exported` — AOT
    serialization via jax.export: the lowered StableHLO program round-
    trips through bytes, so a serving host can run extraction WITHOUT the
    model-building Python (flax module tree, registry, this package's
    model code) — it needs only jax and the msgpack checkpoint. Weights
    remain call-time arguments (the artifact stays ~KB instead of baking
    ~100 MB of constants in, and one artifact serves every checkpoint of
    an architecture).

Typical flow:

    model = init_model("vmgn", num_classes=625, ...)
    variables = load_weights(...)
    exp = export_eval_forward(model, variables, batch_size=64, seq_len=8,
                              height=256, width=128, bf16=True)
    save_exported("vmgn_eval.jaxexp", exp)
    # serving host (no model code — jax + artifact + checkpoint only):
    from agrl_tpu.core.checkpoint import load_variables
    variables = load_variables("best_model.msgpack")  # template-free
    fx = FeatureExtractor.from_exported("vmgn_eval.jaxexp", variables)
    feats = fx(clips_uint8)             # (N, D) f32, any N
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# NOTE: the evaluator/model imports are deliberately lazy (inside the
# live-model branches): the artifact-only serving path — from_exported +
# load_exported — must not pay for the metrics/transforms/model stacks
# it never uses.


def export_eval_forward(
    model,
    variables,
    batch_size: int,
    seq_len: int,
    height: int,
    width: int,
    *,
    bf16: bool = True,
    num_vertices: int | None = None,
    img_dtype=np.uint8,
    platforms: tuple[str, ...] | None = None,
):
    """Lower + export the eval forward at a fixed batch shape.

    Returns a jax.export.Exported whose `.call(variables, imgs, adjs)`
    reproduces Evaluator's forward: imgs (batch, seq_len, H, W, 3) in
    `img_dtype` (raw uint8 frames are normalized on device), adjs
    (batch, V, V) f32. `platforms` defaults to the current backend; pass
    e.g. ("tpu", "cpu") for an artifact that runs on both."""
    from jax import export as jax_export

    from agrl_tpu.engine.evaluator import make_eval_forward
    from agrl_tpu.models import default_num_vertices

    if num_vertices is None:
        num_vertices = default_num_vertices(model, seq_len)
    fwd, _ = make_eval_forward(model, bf16)
    img_spec = jax.ShapeDtypeStruct(
        (batch_size, seq_len, height, width, 3), img_dtype
    )
    adj_spec = jax.ShapeDtypeStruct(
        (batch_size, num_vertices, num_vertices), np.float32
    )
    var_specs = jax.tree.map(
        lambda t: jax.ShapeDtypeStruct(np.shape(t), t.dtype), variables
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(fwd, **kwargs)(var_specs, img_spec, adj_spec)


def save_exported(path: str, exported) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


class FeatureExtractor:
    """Serving-facing feature extraction behind one compiled batch shape.

    Requests of any size: inputs pad to `batch_size` rows (zero frames +
    all-ones adjacency — the same dummy rows the Evaluator pads ragged
    mesh batches with) and run in `ceil(N / batch_size)` executions of
    the single cached executable; padding rows are sliced off the output.

    Build from a live model (`FeatureExtractor(model, variables, ...)`)
    or from a serialized artifact (`FeatureExtractor.from_exported`),
    which needs no model code at all.

    Multi-chip serving: pass a `jax.sharding.Mesh` (parallel.make_mesh) on
    the live-model path — weights replicate once, every request chunk
    shards over the mesh's 'dp' axis, and the one compiled program is the
    SPMD extraction program (the same sharding the Evaluator uses,
    evaluator.py `_make_fwd_runner`). Artifacts are single-device programs
    (jax.export records the device count at export), so `from_exported`
    does not take a mesh — scale artifact serving by process instead.
    """

    def __init__(
        self,
        model=None,
        variables=None,
        *,
        batch_size: int = 64,
        seq_len: int = 8,
        bf16: bool = True,
        num_vertices: int | None = None,
        mesh=None,
        _call=None,
        _hw=None,
    ):
        if variables is None:
            raise ValueError("FeatureExtractor needs model variables")
        self.variables = variables
        self.batch_size = batch_size
        self.seq_len = seq_len
        # frame H/W the one compiled executable expects: fixed by the
        # artifact, or locked in by the live model's first request
        self._hw = _hw
        self._batch_sharding = None
        if mesh is not None and mesh.size > 1:
            if _call is not None:
                raise ValueError(
                    "mesh serving needs a live model: a jax.export artifact "
                    "is a single-device program (scale it by process)"
                )
            dp = mesh.shape["dp"]
            if batch_size % dp:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the mesh's "
                    f"dp={dp} axis"
                )
            from agrl_tpu.parallel.mesh import batch_sharding, replicated

            self.variables = jax.device_put(variables, replicated(mesh))
            self._batch_sharding = (
                batch_sharding(mesh, ndim=5),  # imgs (B, S, H, W, 3)
                batch_sharding(mesh, ndim=3),  # adjs (B, V, V)
            )
        if _call is not None:
            self._call = _call
            self._num_vertices = num_vertices
        else:
            if model is None:
                raise ValueError("pass a model (or use from_exported)")
            from agrl_tpu.engine.evaluator import make_eval_forward
            from agrl_tpu.models import default_num_vertices

            fwd, _ = make_eval_forward(model, bf16)
            self._call = fwd
            self._num_vertices = (
                num_vertices
                if num_vertices is not None
                else default_num_vertices(model, seq_len)
            )

    @classmethod
    def from_exported(cls, path_or_exported, variables, *, batch_size=None):
        """Serve a jax.export artifact: the batch shape (and vertex count)
        come from the artifact's input signature."""
        exported = (
            load_exported(path_or_exported)
            if isinstance(path_or_exported, str)
            else path_or_exported
        )
        # in_avals: (variables-tree..., imgs, adjs) — imgs aval is
        # second-to-last in flattening order because variables flatten first
        img_aval, adj_aval = exported.in_avals[-2], exported.in_avals[-1]
        b, s = img_aval.shape[0], img_aval.shape[1]
        if batch_size is not None and batch_size != b:
            raise ValueError(
                f"artifact was exported at batch {b}, not {batch_size}"
            )
        return cls(
            variables=variables,
            batch_size=b,
            seq_len=s,
            num_vertices=adj_aval.shape[1],
            # jit so repeated serving calls hit jit's executable cache
            # instead of re-dispatching the exported-call primitive
            _call=jax.jit(exported.call),
            _hw=(img_aval.shape[2], img_aval.shape[3]),
        )

    def __call__(self, imgs, adjs=None) -> np.ndarray:
        """imgs: (N, S, H, W, 3); adjs: (N, V, V) or None (all-ones).
        Returns (N, D) float32 features. N = 0 is served (one padded
        execution, empty result)."""
        imgs = np.asarray(imgs)
        n = imgs.shape[0]
        # reject shape drift up front: the serving promise is ONE compiled
        # executable, so a stray seq_len/H/W would otherwise silently
        # compile a second program (live path) or die in jax.export with a
        # low-level aval error (artifact path)
        if imgs.ndim != 5 or imgs.shape[1] != self.seq_len:
            raise ValueError(
                f"expected clips of shape (N, {self.seq_len}, H, W, 3), "
                f"got {imgs.shape}"
            )
        if self._hw is None:
            self._hw = (imgs.shape[2], imgs.shape[3])  # first request locks it
        elif tuple(imgs.shape[2:4]) != self._hw:
            raise ValueError(
                f"this extractor serves {self._hw[0]}x{self._hw[1]} frames, "
                f"got {imgs.shape[2]}x{imgs.shape[3]}"
            )
        if adjs is not None:
            adjs = np.asarray(adjs, np.float32)
            if adjs.shape[0] != n:
                raise ValueError(
                    f"adjs has {adjs.shape[0]} rows for {n} clips"
                )
            # the vertex count is a compiled shape dim like H/W: a stray V
            # would recompile (live path) or die in the artifact's aval
            # check — and a V the model can't consume only surfaces as an
            # XLA broadcast error deep in the graph blocks
            if adjs.ndim != 3 or adjs.shape[1] != adjs.shape[2] or (
                self._num_vertices is not None
                and adjs.shape[1] != self._num_vertices
            ):
                raise ValueError(
                    f"expected adjacency of shape (N, {self._num_vertices}, "
                    f"{self._num_vertices}), got {adjs.shape}"
                )
        bs = self.batch_size
        v = self._num_vertices if adjs is None else adjs.shape[1]
        needs_padding = n % bs != 0 or n == 0
        ones_block = (
            np.ones((bs, v, v), np.float32)
            if adjs is None or needs_padding
            else None
        )  # dummy/padding adjacency, reused per chunk
        out = []
        pending = None  # one-deep pipeline: (device features, rows to keep)
        for start in range(0, max(n, 1), bs):  # n==0 -> one padded run
            im = imgs[start : start + bs]
            ad = ones_block if adjs is None else adjs[start : start + bs]
            take = im.shape[0]
            if take < bs:
                im = np.concatenate(
                    [im, np.zeros((bs - take, *imgs.shape[1:]), imgs.dtype)]
                )
                if adjs is not None:
                    ad = np.concatenate([ad, ones_block[: bs - take]])
            if self._batch_sharding is not None:
                im_s, ad_s = self._batch_sharding
                im, ad = jax.device_put(im, im_s), jax.device_put(ad, ad_s)
            else:
                im, ad = jnp.asarray(im), jnp.asarray(ad)
            # dispatch this chunk, THEN fetch the previous one: chunk k+1's
            # H2D transfer + dispatch overlaps chunk k's device compute
            # (the fetch is the only hard sync), so multi-chunk requests
            # don't serialize transfer -> compute -> fetch per chunk
            f = self._call(self.variables, im, ad)
            if pending is not None:
                out.append(np.asarray(pending[0])[: pending[1]])
            pending = (f, take)
        out.append(np.asarray(pending[0])[: pending[1]])
        return np.concatenate(out, axis=0)
