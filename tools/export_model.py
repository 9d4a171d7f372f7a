"""Export a trained model's eval forward as an AOT serving artifact.

Builds the arch exactly like the training CLI (same hyper-parameter
flags), loads a checkpoint (msgpack, or a reference .pth(.tar)/.npz
torch checkpoint — converted by arch; shape-filtered like
--load-weights), and serializes the jitted eval forward via jax.export
(agrl_tpu/engine/export.py). The artifact + the checkpoint are all a
serving host needs — no model code on the loading side:

    python tools/export_model.py -a vmgn --num-classes 625 \
        --load-weights log/.../best_model.msgpack \
        --batch 64 --out vmgn_eval.jaxexp --platforms tpu,cpu

    # serving side (no model code)
    from agrl_tpu.core.checkpoint import load_variables
    from agrl_tpu.engine.export import FeatureExtractor
    variables = load_variables("log/.../best_model.msgpack")
    fx = FeatureExtractor.from_exported("vmgn_eval.jaxexp", variables)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-a", "--arch", default="vmgn")
    p.add_argument("--num-classes", type=int, required=True,
                   help="classifier width the checkpoint was trained with")
    p.add_argument("--load-weights", required=True,
                   help="msgpack checkpoint, or a reference torch "
                        ".pth(.tar)/.npz state dict (converted by arch)")
    # arch hyper-params (same names/defaults as the training CLI)
    p.add_argument("--last-stride", type=int, default=1)
    p.add_argument("--num-parts", type=int, default=3)
    p.add_argument("--num-scale", type=int, default=1)
    p.add_argument("--num-split", type=int, default=4)
    p.add_argument("--pyramid-part", action="store_true", default=False)
    p.add_argument("--num-gb", type=int, default=2)
    p.add_argument("--use-pose", action="store_true", default=False)
    p.add_argument("--learn-graph", action="store_true", default=False)
    p.add_argument("--bnneck", action="store_true", default=False)
    # export shape + options
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seq-len", type=int, default=8)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--no-bf16", action="store_true",
                   help="keep the forward in f32 (default: bf16 weights/activations)")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu,cpu' (default: current backend)")
    p.add_argument("--out", required=True, help="artifact output path")
    p.add_argument("--allow-partial", action="store_true",
                   help="export even if some checkpoint tensors did not "
                        "match (default: refuse — a mismatch usually means "
                        "the arch flags differ from the trained model)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax

    from agrl_tpu import models
    from agrl_tpu.engine.export import export_eval_forward, save_exported

    model = models.init_model(
        name=args.arch,
        num_classes=args.num_classes,
        loss={"xent", "htri"},
        last_stride=args.last_stride,
        num_parts=args.num_parts,
        num_scale=args.num_scale,
        num_split=args.num_split,
        pyramid_part=args.pyramid_part,
        num_gb=args.num_gb,
        use_pose=args.use_pose,
        learn_graph=args.learn_graph,
        bnneck=args.bnneck,
    )
    variables = models.init_params(
        model, jax.random.PRNGKey(0), seq_len=args.seq_len,
        height=args.height, width=args.width,
    )
    # msgpack or a reference torch checkpoint — reference weights export
    # to a serving artifact in this one command (same dispatcher as the
    # CLI's --load-weights)
    variables, matched, skipped, unmapped = models.load_any_checkpoint(
        variables, args.load_weights, args.arch
    )
    if unmapped:
        print(f"(no flax counterpart for {len(unmapped)} torch "
              f"entries, e.g. {unmapped[:3]})")
    print(f"Loaded {len(matched)} tensors from '{args.load_weights}'"
          + (f" ({len(skipped)} skipped)" if skipped else ""))
    if skipped and not args.allow_partial:
        preview = "\n  ".join(skipped[:8])
        raise SystemExit(
            f"{len(skipped)} checkpoint tensors did not match the built "
            f"model (first few:\n  {preview}\n). A serving artifact from a "
            "partial load is almost always a mis-specified arch — check "
            "--num-classes and the arch flags (--pyramid-part, --use-pose, "
            "--learn-graph, --num-gb, ...), or pass --allow-partial to "
            "export anyway."
        )

    platforms = (
        tuple(s.strip() for s in args.platforms.split(","))
        if args.platforms
        else None
    )
    exp = export_eval_forward(
        model, variables, batch_size=args.batch, seq_len=args.seq_len,
        height=args.height, width=args.width, bf16=not args.no_bf16,
        platforms=platforms,
    )
    save_exported(args.out, exp)
    size_kb = os.path.getsize(args.out) / 1024
    print(
        f"Exported {args.arch} eval forward (batch {args.batch}, "
        f"seq {args.seq_len}, {args.height}x{args.width}, "
        f"{'f32' if args.no_bf16 else 'bf16'}, "
        f"platforms {list(exp.platforms)}) -> {args.out} ({size_kb:.0f} KB)"
    )


if __name__ == "__main__":
    main()
