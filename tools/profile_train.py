"""Per-component TRAIN-step profile on the real TPU chip (PROFILE.md's
train section; VERDICT r2 item 3).

Isolates forward+backward of each pipeline stage of the full-size VMGN
training step (paper config: batch 16 clips x 8 frames x 256x128, mixed
precision) and times it on hardware, with XLA cost_analysis FLOPs:
  stem / layer1..layer3 bwd (trunk stages), layer4_1+layer4_2 bwd,
  graph blocks bwd, losses (xent + batch-hard triplet), optimizer update.
Then runs step-level experiments: donation on/off, full-remat
(jax.checkpoint around the model apply), and batch scaling.

Usage (axon tunnel): PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_train.py
Prints a markdown table + experiment lines to paste into PROFILE.md.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B, S, H, W = 16, 8, 256, 128


def timed(fn, *args, iters=8, warmup=2):
    """Best-of-2-windows mean step time with a host-fetch sync (the axon
    tunnel makes block_until_ready unreliable for timing). The sync
    fetches ONE element — a whole-array fetch would time the ~30 MB/s
    tunnel, not the chip."""

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.ravel()[0:1])

    sync(fn(*args))
    best = float("inf")
    for _w in range(warmup):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def gflops_of(jitted, *args):
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return c.get("flops", 0.0) / 1e9
    except Exception:
        return float("nan")


def main():
    from agrl_tpu.engine import create_train_state, make_train_step
    from agrl_tpu.models.backbone import ResLayer, ResNetStem, Bottleneck
    from agrl_tpu.models.layers import GraphConvLayer
    from agrl_tpu.models.vmgn import VMGN
    from agrl_tpu.optim import init_optim

    model = VMGN(
        num_classes=625, num_split=4, pyramid_part=True, num_gb=2,
        consistent_loss=True, dtype=jnp.bfloat16,
    )
    tx = init_optim("adam", 1e-4, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), seq_len=S, height=H, width=W, batch_size=2
    )
    params = state.params
    rng = np.random.RandomState(0)
    V = S * model.total_split
    print(f"device: {jax.devices()[0]}, model params "
          f"{sum(p.size for p in jax.tree.leaves(params))/1e6:.1f}M")

    # ---------- per-component fwd+bwd ----------
    rows = []

    def prof_stage(name, module, sub_params, x_np):
        """Time fwd and fwd+bwd (grad wrt params AND input) of one stage,
        in TRAIN mode (batch statistics computed, like the real step)."""
        x = jnp.asarray(x_np, jnp.bfloat16)

        def fwd(p, x):
            out, _ = module.apply(
                {"params": p}, x, train=True, mutable=["batch_stats"]
            )
            return out

        def loss(p, x):
            return jnp.sum(fwd(p, x).astype(jnp.float32))

        jf = jax.jit(fwd)
        jg = jax.jit(jax.grad(loss, argnums=(0, 1)))
        tf = timed(jf, sub_params, x)
        tg = timed(jg, sub_params, x)
        gf_f = gflops_of(jf, sub_params, x)
        gf_g = gflops_of(jg, sub_params, x)
        rows.append((name, tf * 1e3, tg * 1e3, gf_f, gf_g,
                     gf_g / tg / 1e3 if tg else 0))
        print(f"  {name}: fwd {tf*1e3:.1f} ms, fwd+bwd {tg*1e3:.1f} ms, "
              f"{gf_g:.0f} GFLOP -> {gf_g/tg/1e3:.1f} TFLOP/s")

    BS = B * S
    x_in = rng.rand(BS, H, W, 3)
    prof_stage("stem", ResNetStem(dtype=jnp.bfloat16),
               params["trunk"]["stem"], x_in)
    x1_in = rng.rand(BS, H // 4, W // 4, 64)
    prof_stage("layer1", ResLayer(Bottleneck, 64, 3, dtype=jnp.bfloat16),
               params["trunk"]["layer1"], x1_in)
    x2_in = rng.rand(BS, H // 4, W // 4, 256)
    prof_stage("layer2", ResLayer(Bottleneck, 128, 4, stride=2, dtype=jnp.bfloat16),
               params["trunk"]["layer2"], x2_in)
    x3_in = rng.rand(BS, H // 8, W // 8, 512)
    prof_stage("layer3", ResLayer(Bottleneck, 256, 6, stride=2, dtype=jnp.bfloat16),
               params["trunk"]["layer3"], x3_in)
    x4_in = rng.rand(BS, H // 16, W // 16, 1024)
    prof_stage("layer4_1", ResLayer(Bottleneck, 512, 3, stride=1, dtype=jnp.bfloat16),
               params["layer4_1"], x4_in)
    prof_stage("layer4_2", ResLayer(Bottleneck, 512, 3, stride=1, dtype=jnp.bfloat16),
               params["layer4_2"], x4_in)

    # graph blocks (f32 path like the mixed-precision model)
    gx = jnp.asarray(rng.rand(B, V, 2048), jnp.float32)
    adj = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))
    glayer = GraphConvLayer(in_features=2048, out_features=2048)

    def gloss(p, x):
        out, _ = glayer.apply(
            {"params": p}, x, adj, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(out)

    gp = params["graph_layer_0"]
    jg = jax.jit(jax.grad(gloss, argnums=(0, 1)))
    tg = timed(jg, gp, gx)
    print(f"  graph block (x1): fwd+bwd {tg*1e3:.2f} ms")
    rows.append(("graph_block", float("nan"), tg * 1e3,
                 float("nan"), gflops_of(jg, gp, gx), float("nan")))

    # losses over representative head outputs
    from agrl_tpu.losses import (
        batch_hard_triplet, cross_entropy_label_smooth, deep_supervision,
    )

    outs = [jnp.asarray(rng.randn(B, 625), jnp.float32) for _ in range(5)]
    feats = [jnp.asarray(rng.randn(B, 2048), jnp.float32) for _ in range(5)]
    pids = jnp.asarray(np.repeat(np.arange(4), 4))

    def loss_heads(outs, feats):
        xent = deep_supervision(
            lambda o, p: cross_entropy_label_smooth(o, p, epsilon=0.1), outs, pids
        )
        htri = deep_supervision(
            lambda f, p: batch_hard_triplet(f, p, soft=True), feats, pids
        )
        return xent + htri

    jl = jax.jit(jax.grad(loss_heads, argnums=(0, 1)))
    tl = timed(jl, outs, feats)
    print(f"  losses (5 heads, xent+htri): fwd+bwd {tl*1e3:.2f} ms")
    rows.append(("losses", float("nan"), tl * 1e3, float("nan"),
                 gflops_of(jl, outs, feats), float("nan")))

    # optimizer update on the full tree
    grads = jax.tree.map(jnp.ones_like, params)

    def opt(g, o, p):
        import optax

        u, no = tx.update(g, o, p)
        return optax.apply_updates(p, u), no

    jo = jax.jit(opt)
    to = timed(jo, grads, state.opt_state, params)
    print(f"  optimizer (adam, full tree): {to*1e3:.2f} ms")
    rows.append(("optimizer", float("nan"), to * 1e3, float("nan"),
                 float("nan"), float("nan")))

    print("\n| component | fwd ms | fwd+bwd ms | bwd-prog GFLOP | TFLOP/s |")
    print("|---|---|---|---|---|")
    for name, tf, tg, gf, gg, tput in rows:
        tf_s = "—" if np.isnan(tf) else f"{tf:.1f}"
        gg_s = "—" if np.isnan(gg) else f"{gg:.0f}"
        tp_s = "—" if np.isnan(tput) else f"{tput:.0f}"
        print(f"| {name} | {tf_s} | {tg:.1f} | {gg_s} | {tp_s} |")

    # ---------- step-level experiments ----------
    xu8 = jnp.asarray(rng.randint(0, 256, (B, S, H, W, 3)), np.uint8)
    adj_t = jnp.asarray((rng.rand(B, V, V) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def run_step(step, st):
        st2, m = step(st, xu8, pids, adj_t, key)
        _ = float(m["loss"])
        best = float("inf")
        for _w in range(2):
            t0 = time.perf_counter()
            for i in range(6):
                st2, m = step(st2, xu8, pids, adj_t, jax.random.PRNGKey(i))
            _ = float(m["loss"])
            best = min(best, (time.perf_counter() - t0) / 6)
        return best

    for donate in (False, True):
        step = make_train_step(model, tx, aug=dict(flip_aug=True), donate=donate)
        st = state
        if donate:  # donation consumes the buffers: use a fresh state
            st = create_train_state(
                model, tx, jax.random.PRNGKey(0), seq_len=S, height=H, width=W,
                batch_size=2,
            )
        t = run_step(step, st)
        print(f"experiment donate={donate}: {t*1e3:.1f} ms/step = {B/t:.1f} clips/s")

    # remat experiments measure the PRODUCTION step (trainer.py's
    # make_train_step(remat=...), the same code `--remat` wires), not a
    # hand-rolled replica that could drift from it
    for pname, pol in [
        ("full (nothing_saveable)", "full"),
        ("dots (dots_with_no_batch_dims)", "dots"),
    ]:
        try:
            t = run_step(
                make_train_step(
                    model, tx, aug=dict(flip_aug=True), donate=False, remat=pol
                ),
                state,
            )
            print(f"experiment remat={pname}: {t*1e3:.1f} ms/step = {B/t:.1f} clips/s")
        except Exception as e:
            print(f"experiment remat={pname}: FAILED {type(e).__name__}: {e}")

    # batch scaling
    for TB in (32, 64):
        xb = jnp.asarray(rng.randint(0, 256, (TB, S, H, W, 3)), np.uint8)
        ab = jnp.asarray((rng.rand(TB, V, V) > 0.5).astype(np.float32))
        pb = jnp.asarray(np.repeat(np.arange(TB // 4), 4))
        step = make_train_step(model, tx, aug=dict(flip_aug=True), donate=False)
        st2, m = step(state, xb, pb, ab, key)
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for i in range(4):
            st2, m = step(st2, xb, pb, ab, jax.random.PRNGKey(i))
        _ = float(m["loss"])
        t = (time.perf_counter() - t0) / 4
        print(f"experiment batch={TB}: {t*1e3:.1f} ms/step = {TB/t:.1f} clips/s")


if __name__ == "__main__":
    main()
