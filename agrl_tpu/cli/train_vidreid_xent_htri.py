"""Training/eval driver — the CLI-compatible counterpart of the
reference's train_vidreid_xent_htri.py.

Flag surface mirrors the reference parser (train_vidreid_xent_htri.py:
31-155) so the shipped scripts/*.sh presets invoke 1:1. GPU-device flags
are accepted for compatibility; placement is controlled by --mesh-dp /
--mesh-mp over the available TPU chips (jax.sharding.Mesh) instead of
CUDA_VISIBLE_DEVICES.

Call stack parity (SURVEY.md §3): main() builds dataset -> loaders ->
model -> losses -> optimizer/scheduler -> (resume | load-weights) ->
epoch loop with periodic eval + checkpointing; train() prints the same
meter block; test() prints the same CMC table.
"""

from __future__ import annotations

import argparse
import datetime
import os.path as osp
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from agrl_tpu import models
    from agrl_tpu.data import datasets as data_manager

    p = argparse.ArgumentParser(description="Train video re-id model with xent + htri losses (TPU)")
    # Datasets
    p.add_argument("--root", type=str, default="data")
    p.add_argument("-d", "--dataset", type=str, default="mars", choices=data_manager.get_names())
    p.add_argument("-j", "--workers", default=8, type=int)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--seq-len", type=int, default=15)
    p.add_argument("--split-id", type=int, default=0)
    p.add_argument("--download", action="store_true",
                   help="auto-download the dataset when missing (iLIDS-VID "
                        "only, reference ilidsvid.py:119-133); requires "
                        "network egress")
    p.add_argument("--train-batch", default=32, type=int)
    p.add_argument("--test-batch", default=5, type=int)
    p.add_argument("--clip-batch", default=64, type=int,
                   help="device batch for dense/skipdense eval: clips from "
                        "consecutive tracklets pack into this fixed shape")
    p.add_argument("--num-instances", type=int, default=4)
    p.add_argument("--train-sample", default="restricted",
                   choices=["evenly", "random", "consecutive", "restricted"])
    p.add_argument("--test-sample", default="dense",
                   choices=["evenly", "all", "dense", "skipdense"])
    p.add_argument("--train-sampler", default="RandomIdentitySampler")
    # Optimization
    p.add_argument("--optim", type=str, default="adam")
    # Loss
    p.add_argument("--margin", type=float, default=0.3)
    p.add_argument("--soft-margin", action="store_true")
    p.add_argument("--lambda-xent", type=float, default=1)
    p.add_argument("--lambda-htri", type=float, default=1)
    p.add_argument("--label-smooth", action="store_true")
    # LR schedule
    p.add_argument("--max-epoch", default=600, type=int)
    p.add_argument("--lr", "--learning-rate", default=0.0003, type=float)
    p.add_argument("--stepsize", default=[200, 400], nargs="+", type=int)
    p.add_argument("--gamma", default=0.1, type=float)
    p.add_argument("--weight-decay", default=5e-04, type=float)
    p.add_argument("--zero-wd", type=int, default=-1)
    p.add_argument("--warmup", action="store_true")
    # Architecture
    p.add_argument("-a", "--arch", type=str, default="vmgn", choices=models.get_names())
    p.add_argument("--pool", type=str, default="avg", choices=["avg", "max"])
    p.add_argument("--last-stride", type=int, default=1, choices=[1, 2])
    p.add_argument("--num-split", type=int, default=4)
    p.add_argument("--num-parts", type=int, default=3)
    p.add_argument("--num-gb", type=int, default=2)
    p.add_argument("--num-scale", type=int, default=1)
    p.add_argument("--pyramid-part", action="store_true")
    p.add_argument("--use-pose", action="store_true")
    p.add_argument("--learn-graph", action="store_true")
    p.add_argument("--knn", default=16, type=int)
    p.add_argument("--consistent-loss", action="store_true")
    p.add_argument("--bnneck", action="store_true")
    # Augmentation
    p.add_argument("--flip-aug", action="store_true")
    p.add_argument("--rand-erase", action="store_true")
    p.add_argument("--rand-crop", action="store_true")
    p.add_argument("--misalign-aug", action="store_true")
    # Visualization
    p.add_argument("--visualize-ranks", action="store_true")
    # Post process
    p.add_argument("--dist-metric", type=str, default="euclidean")
    p.add_argument("--re-rank", action="store_true")
    # Checkpoint
    p.add_argument("--resume", type=str, default="", metavar="PATH")
    p.add_argument("--load-weights", type=str, default="")
    p.add_argument("--pretrained-weights", type=str, default="", metavar="PATH",
                   help="torchvision-style ImageNet ResNet weights (.pth/.pth.tar/"
                        ".npz) loaded into the backbone at startup — the reference's "
                        "init_pretrained_weights (vmgn.py:360-370), incl. the vmgn "
                        "layer4 -> layer4_1/layer4_2 duplication")
    # Evaluation
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--eval-step", type=int, default=-1)
    p.add_argument("--start-eval", type=int, default=0)
    # Devices (TPU mesh; GPU flags accepted for script compatibility)
    p.add_argument("--mesh-dp", type=int, default=0, help="data-parallel mesh size (0 = all devices)")
    p.add_argument("--mesh-mp", type=int, default=1, help="model-parallel mesh size")
    # Multi-host launch (jax.distributed; one process per host)
    p.add_argument("--dist-coordinator", type=str, default="",
                   help="coordinator address host:port for jax.distributed "
                        "(multi-host); empty = single process or TPU auto-detect")
    p.add_argument("--dist-num-processes", type=int, default=0,
                   help="total process count for jax.distributed (0 = auto)")
    p.add_argument("--dist-process-id", type=int, default=-1,
                   help="this process's id for jax.distributed (-1 = auto)")
    p.add_argument("--bf16-eval", action="store_true",
                   help="bfloat16 feature extraction (~1.5x faster, ~3e-4 feature error)")
    p.add_argument("--bf16-train", action="store_true",
                   help="mixed-precision training: bf16 conv backbone, f32 params/"
                        "graph/losses (~1.6x faster; vmgn family)")
    p.add_argument("--profile-dir", type=str, default="",
                   help="capture a jax profiler trace of one train epoch into this dir")
    p.add_argument("--remat", type=str, default="none",
                   choices=["none", "dots", "full"],
                   help="gradient rematerialization over the model forward: "
                        "trade recompute for activation memory (use when a "
                        "big-activation model, e.g. resnet3d50, OOMs at the "
                        "full batch; ~20%% slower at paper-config scale)")
    p.add_argument("--cache-frames", action="store_true",
                   help="cache decoded frames in host RAM across epochs "
                        "(~H*W*3 bytes per distinct frame; keeps the input "
                        "pipeline off the critical path after epoch one)")
    p.add_argument("--cache-gb", type=float, default=None,
                   help="host-RAM budget (GB) for the --cache-frames LRU, "
                        "shared across train/query/gallery; <=0 = unbounded. "
                        "Default: auto — 8 GB, raised to hold the collated "
                        "eval batch set (repeat evals go host-free) when "
                        "that fits 40%% of MemAvailable")
    p.add_argument("--frame-cache-dir", type=str, default="",
                   help="persistent on-disk decoded-frame cache directory: "
                        "JPEG decode cost is paid once per machine — later "
                        "runs stream resized uint8 frames from disk (stores "
                        "DECODED bytes: use a fresh dir per --decode mode)")
    p.add_argument("--decode", type=str, default="auto",
                   choices=["auto", "native", "pil"],
                   help="frame decoder: auto = native libjpeg batch decoder "
                        "when built (fast), pil = the reference's exact "
                        "PIL reader+bilinear resize — pick pil when "
                        "evaluating MIGRATED reference .pth.tar weights on "
                        "datasets whose frames get resized (iLIDS/PRID/"
                        "Duke); MARS sources are already 256x128 so the "
                        "two decoders are bit-identical there")
    p.add_argument("--async-ckpt", action="store_true",
                   help="write checkpoints on a background thread (the "
                        "device->host state fetch overlaps the next epoch; "
                        "the state is snapshot on device first, so the "
                        "donated train step cannot corrupt an in-flight "
                        "save). Multi-host runs still fetch synchronously "
                        "— the cross-host gather is a collective — so "
                        "there only serialization+write are hidden")
    p.add_argument("--use-cpu", action="store_true")
    p.add_argument("--compile-cache-dir", type=str, default="auto",
                   help="persistent XLA compilation cache: compiled "
                        "programs (train step, eval buckets) are reused "
                        "across processes, so only the first run on a "
                        "machine pays compile time (minutes over a remote "
                        "tunnel, seconds after). 'auto' = "
                        "~/.cache/agrl_tpu/xla-cache on accelerators, off "
                        "on the CPU backend (XLA:CPU's AOT loader logs "
                        "spurious machine-feature warnings and CPU "
                        "compiles are cheap); a path forces it on, '' off")
    p.add_argument("--gpu-devices", default="0", type=str, help="(compat, unused on TPU)")
    p.add_argument("--use-avai-gpus", action="store_true", help="(compat, unused on TPU)")
    # Misc
    p.add_argument("--print-freq", type=int, default=200)
    p.add_argument("--print-last", action="store_true")
    p.add_argument("--seed", type=int, default=0xFF)
    p.add_argument("--save-dir", type=str, default="log")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    return run(args)


def run(args):
    from agrl_tpu import models
    from agrl_tpu.core import load_checkpoint, save_checkpoint
    from agrl_tpu.data import datasets as data_manager
    from agrl_tpu.data.loader import ClipLoader, VideoClipDataset
    from agrl_tpu.data.samplers import init_sampler
    from agrl_tpu.engine import create_train_state, make_train_step
    from agrl_tpu.engine.evaluator import Evaluator
    from agrl_tpu.optim import init_optim, multistep_lr, per_step, warmup_multistep_lr
    from agrl_tpu.parallel import make_mesh
    from agrl_tpu.utils.avgmeter import AverageMeter
    from agrl_tpu.utils.logger import Logger, ScalarWriter, cur_time
    from agrl_tpu.utils.reidtools import visualize_ranked_results
    from agrl_tpu.utils.model_complexity import count_num_param

    np.random.seed(args.seed)
    if args.use_cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.dist_coordinator or args.dist_num_processes:
        from agrl_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=args.dist_coordinator or None,
            num_processes=args.dist_num_processes or None,
            process_id=args.dist_process_id if args.dist_process_id >= 0 else None,
        )
    is_main = jax.process_index() == 0

    # after distributed init: default_backend() commits the backend, which
    # must not happen before jax.distributed.initialize
    cache_dir = args.compile_cache_dir
    if cache_dir == "auto":
        cache_dir = (
            "" if jax.default_backend() == "cpu"
            else "~/.cache/agrl_tpu/xla-cache"
        )
    if cache_dir:
        # verified on the axon-tunnel TPU: a cached program loads in ~30 ms
        # vs minutes of XLA compile; entries are keyed by program + config
        # + topology so CPU/TPU runs never cross
        jax.config.update("jax_compilation_cache_dir", osp.expanduser(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    mode = "test" if args.evaluate else "train"
    stamp = time.strftime("-%Y-%m-%d-%H-%M-%S")
    # multi-host: per-process log files; scalars only from process 0
    proc_tag = "" if is_main else f"-proc{jax.process_index()}"
    sys.stdout = Logger(osp.join(args.save_dir, f"log_{mode}{stamp}{proc_tag}.txt"))
    writer = ScalarWriter(args.save_dir) if is_main else None
    print(f"==========\nArgs:{args}\n==========")
    if is_main:
        # provenance: machine-readable arg dump next to the copied model
        # source (the reference only prints args into the log, :179)
        from agrl_tpu.utils.iotools import write_json

        write_json(vars(args), osp.join(args.save_dir, "args.json"))
    print(f"JAX devices: {jax.devices()}")

    print(f"Initializing dataset {args.dataset}")
    dataset = data_manager.init_vidreid_dataset(
        root=args.root, name=args.dataset, split_id=args.split_id,
        use_pose=args.use_pose, download=args.download,
    )

    # one shared byte-budgeted LRU across train/query/gallery; one shared
    # persistent frame store. Print the worst-case RAM math up front so a
    # MARS-scale --cache-frames run (~50 GB at 256x128) is never a surprise.
    from agrl_tpu.data.cache import BoundedCache, FrameDiskCache, estimate_cache_gb

    shared_cache = None
    if args.cache_frames:
        from agrl_tpu.data.cache import resolve_cache_budget

        full_gb = estimate_cache_gb(
            [dataset.train, dataset.query, dataset.gallery], args.height, args.width
        )
        # deterministic eval loaders cache whole collated batches; repeat
        # evals are host-free only if that working set fits the budget
        # (an undersized LRU gets ~0 hits on the cyclic eval scan). The
        # auto default RAISES the budget to hold it when host RAM allows.
        eval_gb = (
            (len(dataset.query) + len(dataset.gallery))
            * args.seq_len * args.height * args.width * 3 / 1e9
            if args.test_sample == "evenly"
            else 0.0
        )
        cap_bytes, cap_txt = resolve_cache_budget(args.cache_gb, eval_gb)
        print(
            f"Frame cache: ~{full_gb:.1f} GB to hold every decoded frame "
            f"({args.height}x{args.width}); LRU budget = {cap_txt}"
        )
        hint = (
            " — raise --cache-gb to keep repeat evals host-free"
            if cap_bytes and eval_gb * 1e9 > cap_bytes
            else ""
        )
        if eval_gb:
            print(
                f"Eval batch cache: ~{eval_gb:.1f} GB holds every collated "
                f"eval batch (evenly){hint}"
            )
        shared_cache = BoundedCache(cap_bytes)
    from agrl_tpu.data.transforms import effective_decoder

    disk_cache = (
        # tagged by the decoder that produces this run's pixels: a store
        # written by --decode native can never silently serve DCT-scaled
        # pixels to a --decode pil (reference-parity) run, and vice versa
        FrameDiskCache(args.frame_cache_dir, args.height, args.width,
                       decoder=effective_decoder(args.decode))
        if args.frame_cache_dir
        else None
    )
    if disk_cache is not None:
        print(
            f"Persistent frame cache: '{args.frame_cache_dir}' "
            f"({len(disk_cache)} frames present)"
        )

    ds_kwargs = dict(
        height=args.height,
        width=args.width,
        pose_info=dataset.process_poses,
        num_split=args.num_split,
        num_parts=args.num_parts,
        num_scale=args.num_scale,
        pyramid_part=args.pyramid_part,
        enable_pose=args.use_pose,
        cache_frames=args.cache_frames,
        cache=shared_cache,
        disk_cache=disk_cache,
        decode=args.decode,
    )
    train_ds = VideoClipDataset(dataset.train, seq_len=args.seq_len, sample=args.train_sample, **ds_kwargs)
    query_ds = VideoClipDataset(dataset.query, seq_len=args.seq_len, sample=args.test_sample, **ds_kwargs)
    gallery_ds = VideoClipDataset(dataset.gallery, seq_len=args.seq_len, sample=args.test_sample, **ds_kwargs)

    sampler = init_sampler(
        args.train_sampler, dataset.train, args.train_batch, args.num_instances, seed=args.seed
    )
    # multi-host: every host runs the identically-seeded sampler and loads
    # only its train_batch/process_count slice of each batch
    shard = (
        (jax.process_index(), jax.process_count())
        if jax.process_count() > 1
        else None
    )
    trainloader = ClipLoader(
        train_ds, batch_size=args.train_batch, sampler=sampler,
        drop_last=True, num_workers=args.workers, seed=args.seed,
        process_shard=shard, malloc_tuning=True,
    )
    # variable-length items (dense/skipdense/all) require per-tracklet batches
    test_batch = 1 if args.test_sample in ("dense", "skipdense", "all") else args.test_batch
    queryloader = ClipLoader(query_ds, batch_size=test_batch,
                             num_workers=args.workers, malloc_tuning=True)
    galleryloader = ClipLoader(gallery_ds, batch_size=test_batch,
                               num_workers=args.workers, malloc_tuning=True)

    print(f"Initializing model: {args.arch}")
    _copy_model_source(args.arch, args.save_dir)
    model = models.init_model(
        name=args.arch,
        num_classes=dataset.num_train_pids,
        loss={"xent", "htri"},
        last_stride=args.last_stride,
        num_parts=args.num_parts,
        num_scale=args.num_scale,
        num_split=args.num_split,
        pyramid_part=args.pyramid_part,
        num_gb=args.num_gb,
        use_pose=args.use_pose,
        learn_graph=args.learn_graph,
        consistent_loss=args.consistent_loss,
        bnneck=args.bnneck,
        dtype=jnp.bfloat16 if args.bf16_train else jnp.float32,
    )
    # pre-flight: msppgn's GraphBlocks consume the pose adjacency only when
    # blending with it (use_pose) or using it outright (learn_graph off),
    # and then its vertices span a FIXED number of feature scales — a
    # mismatched --num-scale adjacency would only surface as a cryptic XLA
    # broadcast error deep in the graph blocks. msppn never reads the
    # adjacency, so any --num-scale runs (expected_adj_scales is None).
    model_scales = getattr(model, "expected_adj_scales", None)
    if model_scales is not None:
        if args.num_scale != model_scales:
            raise SystemExit(
                f"arch '{args.arch}' consumes a {model_scales}-scale "
                f"adjacency (vertices span layer2/3/4) but --num-scale is "
                f"{args.num_scale}; pass --num-scale {model_scales} so the "
                "pose adjacency matches the model's vertex count"
            )
        # graphnet models ALWAYS pool pyramid parts (calc_splits, reference
        # graphnet.py:228) — the data-side graph must be built with the
        # same per-frame part count or every forward shape-errors
        data_split = train_ds.graph_builder.total_split
        if data_split != model.total_split:
            raise SystemExit(
                f"arch '{args.arch}' pools {model.total_split} pyramid "
                f"parts per frame (calc_splits({args.num_split})) but the "
                f"pose graph is built with {data_split}; pass "
                "--pyramid-part (and a matching --num-split) so the "
                "adjacency layout matches the model's vertices"
            )

    # schedules: epoch-indexed like the reference scheduler.step(epoch).
    # NOTE: RandomIdentitySampler's epoch length is stochastic (pids leave
    # the pool when exhausted), so step//steps_per_epoch is approximate for
    # it; RandomIdentitySamplerV1 (used by every shipped script) has exact
    # length num_ids * K, making the mapping exact under drop_last.
    steps_per_epoch = max(1, len(trainloader))
    if args.warmup:
        lr_epoch = warmup_multistep_lr(
            args.lr, args.stepsize, gamma=args.gamma, warmup_factor=0.01, warmup_iters=10
        )
    else:
        lr_epoch = multistep_lr(args.lr, args.stepsize, gamma=args.gamma)
    lr_fn = per_step(lr_epoch, steps_per_epoch)
    zero_wd_step = args.zero_wd * steps_per_epoch if args.zero_wd > 0 else None
    if zero_wd_step is not None:
        wd_fn = lambda step: jnp.where(step >= zero_wd_step, 0.0, args.weight_decay)  # noqa: E731
    else:
        wd_fn = args.weight_decay
    tx = init_optim(args.optim, lr_fn, weight_decay=wd_fn, base_lr=args.lr)

    state = create_train_state(
        model, tx, jax.random.PRNGKey(args.seed),
        seq_len=args.seq_len, height=args.height, width=args.width, batch_size=2,
    )
    # startup params/FLOPs report (reference train_vidreid_xent_htri.py:
    # 256-263 runs the same single-clip probe)
    from agrl_tpu.utils.model_complexity import compute_model_complexity

    n_params, gflops = compute_model_complexity(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        seq_len=args.seq_len, height=args.height, width=args.width, verbose=False,
    )
    print(f"Model complexity: params {n_params:.5f}M flops {gflops:.3f}G")
    print(f"Model size: {count_num_param(state.params):.5f}M")

    from agrl_tpu.utils.iotools import check_isfile

    if args.pretrained_weights and check_isfile(args.pretrained_weights):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        new_vars, matched, skipped = models.init_pretrained_weights(
            variables, args.pretrained_weights
        )
        state = state.replace(
            params=jax.tree.map(jnp.asarray, new_vars["params"]),
            batch_stats=jax.tree.map(jnp.asarray, new_vars["batch_stats"]),
        )
        print(f"Initialized backbone with ImageNet weights from "
              f"'{args.pretrained_weights}' ({len(matched)} matched, {len(skipped)} skipped)")

    if args.load_weights and check_isfile(args.load_weights):
        # takes this framework's msgpack OR a reference torch checkpoint
        # (the released .pth.tar weights the reference's own test scripts
        # pass to --load-weights) — one dispatcher, same shape-filtered
        # partial-merge semantics either way
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        new_vars, matched, skipped, unmapped = models.load_any_checkpoint(
            variables, args.load_weights, args.arch
        )
        if unmapped:
            print(f"(no flax counterpart for {len(unmapped)} torch "
                  f"entries, e.g. {unmapped[:3]})")
        state = state.replace(
            params=jax.tree.map(jnp.asarray, new_vars["params"]),
            batch_stats=jax.tree.map(jnp.asarray, new_vars["batch_stats"]),
        )
        print(f"Loaded pretrained weights from '{args.load_weights}' "
              f"({len(matched)} matched, {len(skipped)} skipped)")

    start_epoch = 0
    best_rank1 = -np.inf
    best_mAP = 0.0
    if args.resume and check_isfile(args.resume):
        tmpl = {"params": state.params, "batch_stats": state.batch_stats, "opt_state": state.opt_state}
        restored, meta = load_checkpoint(tmpl, args.resume)
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jnp.asarray((meta["epoch"] + 1) * steps_per_epoch, jnp.int32),
        )
        start_epoch = meta["epoch"] + 1
        best_rank1 = meta["rank1"]
        best_mAP = meta["mAP"]
        print(f"Loaded checkpoint from '{args.resume}'")
        print(f"- start_epoch: {start_epoch}")
        print(f"- rank1: {best_rank1}")
        print(f"- mAP: {best_mAP}")

    # dp must divide the (drop_last) train batch; prefer the full machine
    import math

    n_dev = len(jax.devices())
    full_dp = max(1, n_dev // args.mesh_mp)
    if args.mesh_dp:
        auto_dp = args.mesh_dp
    elif args.train_batch % full_dp == 0:
        auto_dp = full_dp
    else:
        # a smaller mesh leaves chips idle; never do that silently, and
        # never at all multi-host (a mesh that excludes another host's
        # chips breaks every cross-process device_put)
        auto_dp = max(1, math.gcd(args.train_batch, full_dp))
        if jax.process_count() > 1:
            raise ValueError(
                f"--train-batch {args.train_batch} is not divisible by "
                f"dp={full_dp} ({n_dev} devices / mp={args.mesh_mp}); in a "
                f"multi-host run every chip must join the mesh — pick a "
                f"divisible batch or set --mesh-dp/--mesh-mp explicitly"
            )
        print(
            f"Warning: --train-batch {args.train_batch} not divisible by "
            f"dp={full_dp}; using dp={auto_dp} and IDLING "
            f"{n_dev - auto_dp * args.mesh_mp} of {n_dev} devices"
        )
    mesh = make_mesh(dp=auto_dp, mp=args.mesh_mp)
    print(f"Mesh: dp={mesh.shape['dp']} mp={mesh.shape['mp']} (of {n_dev} devices)")

    if mesh.size > 1:
        # place the state on the mesh EXPLICITLY: wide 2-D kernels (2048-d
        # classifier/graph projections) and their adam moments shard over
        # 'mp', everything else replicates. Without this annotation GSPMD
        # gets no tensor-parallel placement on the CLI path and mp devices
        # would just replicate work. Multi-host is fine: every process
        # holds the same values here (shared-seed init or a checkpoint
        # every host read).
        from agrl_tpu.parallel import place_state

        state = place_state(state, mesh)

    evaluator = Evaluator(
        model, test_sample=args.test_sample, pool=args.pool, bf16=args.bf16_eval,
        clip_batch=args.clip_batch,
    )
    protocol = "mars"  # the reference driver always scores with evaluate_mars (:531)

    if args.evaluate:
        print("Evaluate only")
        # the full (Q, G) matrix is only materialized on host when rank
        # visualization needs it; otherwise ranking runs fully on device
        distmat = evaluator.evaluate(
            state.variables(), queryloader, galleryloader,
            dist_metric=args.dist_metric, re_rank=args.re_rank,
            metric_protocol=protocol, return_distmat=args.visualize_ranks,
            mesh=mesh if mesh.size > 1 else None,
        )
        if args.visualize_ranks:
            visualize_ranked_results(
                distmat, dataset.query, dataset.gallery,
                save_dir=osp.join(args.save_dir, "ranked_results"), topk=20,
            )
        # (rank1, mAP) — or the distmat under --visualize-ranks — so
        # programmatic callers (tests, tools) get the scores directly
        return distmat

    aug = dict(
        flip_aug=args.flip_aug,
        rand_erase=args.rand_erase,
        misalign_aug=args.misalign_aug,
        rand_translate=args.rand_crop,
    )
    train_step = make_train_step(
        model, tx,
        lambda_xent=args.lambda_xent, lambda_htri=args.lambda_htri,
        label_smooth=args.label_smooth, margin=args.margin,
        soft_margin=args.soft_margin, aug=aug, donate=True, remat=args.remat,
    )

    print("==> Start training")
    start_time = time.time()
    train_time = 0
    best_epoch = start_epoch
    key = jax.random.PRNGKey(args.seed + 1)

    async_ckpt = None
    if args.async_ckpt:
        from agrl_tpu.core import AsyncCheckpointer

        async_ckpt = AsyncCheckpointer()

    for epoch in range(start_epoch, args.max_epoch):
        t0 = time.time()
        key, epoch_key = jax.random.split(key)
        if args.profile_dir and epoch == start_epoch:
            from agrl_tpu.utils.profiling import trace

            with trace(args.profile_dir):
                state = train_one_epoch(
                    args, epoch, state, train_step, trainloader, mesh, epoch_key,
                    writer, AverageMeter, cur_time,
                )
        else:
            state = train_one_epoch(
                args, epoch, state, train_step, trainloader, mesh, epoch_key, writer,
                AverageMeter, cur_time,
            )
        train_time += round(time.time() - t0)

        do_eval = (
            (epoch + 1) > args.start_eval
            and args.eval_step > 0
            and (epoch + 1) % args.eval_step == 0
        ) or (epoch + 1) == args.max_epoch
        if do_eval:
            print("==> Test")
            rank1, mAP = evaluator.evaluate(
                state.variables(), queryloader, galleryloader,
                dist_metric=args.dist_metric, re_rank=args.re_rank,
                metric_protocol=protocol,
                mesh=mesh if mesh.size > 1 else None,
            )
            is_best = rank1 > best_rank1
            if is_best:
                best_rank1, best_mAP, best_epoch = rank1, mAP, epoch + 1
            tree = {"params": state.params, "batch_stats": state.batch_stats, "opt_state": state.opt_state}
            if jax.process_count() > 1:
                # COLLECTIVE: mp-sharded leaves span hosts in a multi-host
                # run — every process must join the gather, so this runs
                # BEFORE the rank-0 writer gate
                from agrl_tpu.core import fetch_global_tree

                tree = fetch_global_tree(tree, fetch_local=writer is not None)
            if writer is not None:  # one checkpoint/scalar writer per job
                fpath = osp.join(args.save_dir, f"checkpoint_ep{epoch + 1}.msgpack")
                if async_ckpt is not None:
                    async_ckpt.save(tree, fpath, epoch=epoch,
                                    rank1=float(rank1), mAP=float(mAP), is_best=is_best)
                else:
                    save_checkpoint(tree, fpath, epoch=epoch,
                                    rank1=float(rank1), mAP=float(mAP), is_best=is_best)
                writer.add_scalar("acc/rank1", float(rank1), epoch + 1)
                writer.add_scalar("acc/mAP", float(mAP), epoch + 1)

    if async_ckpt is not None:
        async_ckpt.wait()  # the last save must land before the job reports done
    print(f"==> Best Rank-1 {best_rank1:.2%}, mAP: {best_mAP:.2%}, achieved at epoch {best_epoch}")
    elapsed = str(datetime.timedelta(seconds=round(time.time() - start_time)))
    print(f"Finished. Total elapsed time (h:m:s): {elapsed}. "
          f"Training time (h:m:s): {datetime.timedelta(seconds=train_time)}.")


def _copy_model_source(arch: str, save_dir: str) -> None:
    """Copy the architecture's source file into save_dir for provenance
    (reference models/__init__.py:37-40)."""
    import importlib
    import shutil

    from agrl_tpu.utils.iotools import mkdir_if_missing

    try:
        from agrl_tpu import models as _m

        builder = _m.init_model.__globals__["__model_factory"][arch]
        module = importlib.import_module(builder.__module__)
        mkdir_if_missing(save_dir)
        shutil.copy(module.__file__, save_dir)
    except Exception as e:  # provenance is best-effort
        print(f"(model source copy skipped: {e})")


def train_one_epoch(
    args, epoch, state, train_step, trainloader, mesh, key, writer,
    AverageMeter, cur_time,
):
    xent_losses = AverageMeter()
    htri_losses = AverageMeter()
    precisions = AverageMeter()
    batch_time = AverageMeter()
    data_time = AverageMeter()

    from agrl_tpu.data.loader import prefetch_to_device
    from agrl_tpu.parallel.mesh import batch_sharding

    num_batches = len(trainloader)
    end = time.time()
    window_start = time.time()
    window_batches = 0

    def batches():
        for imgs, pids, _, adjs in trainloader:
            yield imgs, pids.astype(np.int32), adjs

    shardings = (
        batch_sharding(mesh, 5),
        batch_sharding(mesh, 1),
        batch_sharding(mesh, 3),
    )
    with mesh:
        prefetched = prefetch_to_device(batches(), size=2, sharding=shardings)
        for batch_idx, (imgs_d, pids_d, adjs_d) in enumerate(prefetched):
            data_time.update(time.time() - end)
            key, step_key = jax.random.split(key)
            state, metrics = train_step(state, imgs_d, pids_d, adjs_d, step_key)
            window_batches += 1

            # keep metrics as device scalars — a float() here would block on
            # the device every step and defeat the prefetch overlap; the
            # meters do device-side arithmetic and only sync at print time
            bsz = imgs_d.shape[0]
            xent_losses.update(metrics["xent_loss"], bsz)
            htri_losses.update(metrics["htri_loss"], bsz)
            precisions.update(metrics["top1"])

            if ((batch_idx + 1) % args.print_freq == 0) or (
                args.print_last and batch_idx == num_batches - 1
            ):
                # steps dispatch asynchronously; real step time = window
                # wall-clock / batches, measured AFTER a device sync
                float(metrics["xent_loss"])
                batch_time.update(
                    (time.time() - window_start) / window_batches, window_batches
                )
                window_start = time.time()
                window_batches = 0
                eta_seconds = batch_time.avg * (
                    num_batches - (batch_idx + 1) + (args.max_epoch - (epoch + 1)) * num_batches
                )
                eta_str = str(datetime.timedelta(seconds=int(eta_seconds)))
                print(
                    f"CurTime: {cur_time()}\t"
                    f"Epoch: [{epoch + 1}][{batch_idx + 1}/{num_batches}]\t"
                    f"Time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                    f"Speed {bsz / batch_time.avg:.3f} samples/s\t"
                    f"Data {data_time.val:.4f} ({data_time.avg:.4f})\t"
                    f"Xent {xent_losses.val:.4f} ({xent_losses.avg:.4f})\t"
                    f"Htri {htri_losses.val:.4f} ({htri_losses.avg:.4f})\t"
                    f"Top1 {precisions.val:.4f} ({precisions.avg:.4f})\t"
                    f"Eta {eta_str}"
                )
            end = time.time()

    if writer is not None:
        writer.add_scalar("loss/xent_loss", xent_losses.avg, epoch + 1)
        writer.add_scalar("loss/htri_loss", htri_losses.avg, epoch + 1)
    return state


if __name__ == "__main__":
    main()
