"""Export a TPU-trained checkpoint BACK to a reference .pth(.tar).

The reverse of --load-weights: fills a reference-named torch state dict
with this framework's weights, so a model trained here drops straight
into the reference's own --load-weights/--resume (or any torch-side
tooling). Needs no model code on either side: the msgpack checkpoint
loads template-free, and a `--template` torch state dict of the same
arch (typically the checkpoint you originally migrated FROM, or a fresh
torch-side init) supplies the names — both directions of the migration
share one source of truth (agrl_tpu/models/weight_convert.py: shared name
maps for the registry families; the legacy temporal/image/resnet50m/3D
families invert their forward converters directly via _export_by_probe).

    python tools/export_torch.py -a vmgn \
        --load-weights log/.../best_model.msgpack \
        --template vmgn_mars_reference.pth.tar \
        --out vmgn_tpu_trained.pth.tar

Template entries with no flax counterpart (num_batches_tracked, the
frozen BNNeck biases) keep the template's values; shape mismatches (a
different-#classes head) are kept too and reported — the forward partial
load's semantics, in reverse. `.npz` output works without torch.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-a", "--arch", default="vmgn",
                   help="arch family of BOTH checkpoints (name-map dispatch)")
    p.add_argument("--load-weights", required=True,
                   help="this framework's msgpack checkpoint (the weights)")
    p.add_argument("--template", required=True,
                   help="a reference torch state dict of the same arch "
                        "(.pth/.pth.tar via torch-cpu, .npz/.npy without "
                        "torch) — supplies the torch entry names")
    p.add_argument("--out", required=True,
                   help=".pth/.pth.tar (torch.save, reference-loadable) "
                        "or .npz (no torch needed)")
    p.add_argument("--epoch", type=int, default=0,
                   help="epoch recorded in the .pth.tar wrapper dict")
    p.add_argument("--rank1", type=float, default=0.0)
    p.add_argument("--mAP", type=float, default=0.0)
    p.add_argument("--allow-kept", action="store_true",
                   help="export even if template entries beyond the known "
                        "no-counterpart ones were left unfilled (default: "
                        "refuse — usually an arch/flag mismatch)")
    return p


# template entries EXPECTED to keep their template values (they have no
# flax counterpart by design; everything else kept is suspicious)
def _expected_kept(name: str, arch: str) -> bool:
    if name.endswith("num_batches_tracked") or name.endswith("bottleneck.bias"):
        return True
    # resnet50b's train-only bottleneck head (reference resnet.py ResNet50B)
    # has no flax counterpart at eval parity — the whole head keeps
    return arch == "resnet50b" and ".bottleneck." in f".{name}"


def main(argv=None):
    args = build_parser().parse_args(argv)

    from agrl_tpu.core.checkpoint import load_variables
    from agrl_tpu.models.weight_convert import (
        _load_state_dict_file,
        export_torch_state_dict,
    )

    variables = load_variables(args.load_weights)
    template = _load_state_dict_file(args.template)
    state, filled, kept = export_torch_state_dict(variables, template, args.arch)
    surprising = [n for n in kept if not _expected_kept(n, args.arch)]
    print(f"Filled {len(filled)}/{len(state)} entries from {args.load_weights}; "
          f"kept {len(kept)} template entries "
          f"({len(kept) - len(surprising)} expected no-counterpart)")
    if surprising:
        print(f"  unexpected kept entries: {surprising[:8]}"
              + (" ..." if len(surprising) > 8 else ""))
        if not args.allow_kept:
            raise SystemExit(
                "refusing to export with unexpectedly unfilled entries "
                "(wrong --arch, or the checkpoint/template disagree on "
                "hyper-params); pass --allow-kept to override"
            )

    if args.out.endswith(".npz"):
        np.savez(args.out, **state)
    else:
        import torch

        torch.save(
            {
                # copy: kept template entries may be read-only npz memmaps
                "state_dict": {k: torch.from_numpy(np.array(v))
                               for k, v in state.items()},
                "epoch": args.epoch,
                "rank1": args.rank1,
                "mAP": args.mAP,
            },
            args.out,
        )
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
