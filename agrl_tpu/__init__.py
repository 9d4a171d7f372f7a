"""agrl_tpu — TPU-native video person re-identification framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of the AGRL
("Adaptive Graph Representation Learning for Video Person Re-identification",
TIP 2020) research framework (reference: weleen/AGRL.pytorch).

Design principles (TPU-first, not a port):
  * All per-pixel / per-feature work runs on-device, batched, under `jit`.
  * Host Python handles only metadata: dataset catalogs, split files, pose
    parsing, index sampling.
  * Multi-chip scaling via `jax.sharding.Mesh` + `jit` sharding annotations;
    XLA inserts the collectives (no hand-written NCCL-style code).
  * Hot ops (graph propagation, batch-hard triplet mining, Q x G distance
    matrices, CMC/mAP ranking) have Pallas TPU kernels with pure-jnp
    reference implementations used for parity testing.
"""

__version__ = "0.1.0"

from agrl_tpu.utils.reidtools import calc_splits  # noqa: F401
