"""The jitted data-parallel training step.

Behavioral parity with the reference train() iteration
(train_vidreid_xent_htri.py:393-413):
  loss = lambda_xent * DeepSupervision(xent, outputs, pids)
       + lambda_htri * DeepSupervision(htri, features, pids)
  backward + optimizer step; top-1 precision over all heads is averaged
  for the meter (train_vidreid_xent_htri.py:419).

TPU-first: one `jit` program computes forward, both losses, gradients,
the optimizer update, BN-stat updates and the metrics; the batch axis is
sharded over the mesh's 'dp' axis so XLA all-reduces gradients over ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from agrl_tpu.losses import (
    batch_hard_triplet,
    cross_entropy_label_smooth,
    deep_supervision,
)
from agrl_tpu.engine.train_state import TrainState


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    lambda_xent: float = 1.0,
    lambda_htri: float = 1.0,
    label_smooth: bool = True,
    margin: float = 0.3,
    soft_margin: bool = True,
    donate: bool = True,
    aug: dict | None = None,
    remat: str = "none",
):
    """Returns train_step(state, imgs, pids, adj, rng) -> (state, metrics).

    When `aug` is given (e.g. {'flip_aug': True, 'rand_erase': False}),
    `imgs` may be the raw uint8 (B, S, H, W, 3) batch: on-device
    preprocessing + augmentation fuse into the same XLA program as the
    forward/backward pass.

    `remat`: gradient rematerialization policy over the model forward —
    'none' (default: save all activations; fastest when they fit),
    'dots' (save matmul/conv outputs, recompute elementwise chains), or
    'full' (save nothing; max memory relief, ~20% slower at paper-config
    scale per PROFILE.md). The lever for activation-bound configs — e.g.
    resnet3d50's 3D-conv activations at batch 16 x 8 x 256x128 exceed a
    single v5e's HBM without it (measured)."""
    epsilon = 0.1 if label_smooth else 0.0
    xent_fn = partial(cross_entropy_label_smooth, epsilon=epsilon)
    htri_fn = partial(batch_hard_triplet, margin=margin, soft=soft_margin)

    def apply_model(params, batch_stats, imgs, adj, rng):
        r_sub, r_drop = jax.random.split(rng)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs,
            adj,
            train=True,
            mutable=["batch_stats"],
            rngs={"subclip": r_sub, "dropout": r_drop},
        )

    if remat == "dots":
        apply_model = jax.checkpoint(
            apply_model,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif remat == "full":
        apply_model = jax.checkpoint(
            apply_model, policy=jax.checkpoint_policies.nothing_saveable
        )
    elif remat != "none":
        raise ValueError(f"unknown remat policy '{remat}'")

    def loss_fn(params, batch_stats, imgs, pids, adj, rng):
        (outputs, features), mutated = apply_model(
            params, batch_stats, imgs, adj, rng
        )
        # single-head archs return bare arrays (reference guards the same
        # way, train_vidreid_xent_htri.py:400-408)
        out_list = outputs if isinstance(outputs, (list, tuple)) else [outputs]
        feat_list = features if isinstance(features, (list, tuple)) else [features]
        xent = deep_supervision(xent_fn, out_list, pids)
        htri = deep_supervision(htri_fn, feat_list, pids)
        loss = lambda_xent * xent + lambda_htri * htri
        # top-1 precision FRACTION averaged over heads (reference
        # accuracy().mean(axis=0)[0]; the driver prints it raw)
        prec = jnp.mean(
            jnp.stack(
                [jnp.mean(jnp.argmax(o, axis=1) == pids) for o in out_list]
            )
        )
        return loss, (mutated["batch_stats"], xent, htri, prec)

    def train_step(state: TrainState, imgs, pids, adj, rng):
        if aug is not None:
            from agrl_tpu.data.transforms import preprocess_clips

            rng, aug_rng = jax.random.split(rng)
            imgs = preprocess_clips(imgs, aug_rng, train=True, **aug)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_stats, xent, htri, prec)), grads = grad_fn(
            state.params, state.batch_stats, imgs, pids, adj, rng
        )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": loss,
            "xent_loss": xent,
            "htri_loss": htri,
            "top1": prec,
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
