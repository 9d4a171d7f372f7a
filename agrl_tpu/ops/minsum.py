"""Pallas min-plus "matmul": ms[q, j] = sum_c min(A[q, c], B[j, c]).

The Jaccard accumulation of k-reciprocal re-ranking (ops/rerank.py) is a
matmul over the (min, +) semiring — the MXU cannot help (no min-multiply),
so the jnp fallback runs it as a broadcast-minimum + reduction on the VPU
via lax.scan. This kernel restructures it for VPU efficiency:

  * grid (q_tiles, j_tiles, c_tiles), c innermost — the classic matmul
    accumulation pattern with a (TQ, TJ) f32 scratch accumulator that
    initializes at c==0 and writes out at the last c step;
  * inside a step, a fori_loop walks the TJ rows of the B block; each
    iteration computes min(A_block (TQ, TC), B_row (1, TC)) — a full
    8x128-lane VPU broadcast over sublanes — reduces over lanes, and
    accumulates into the accumulator's lane column j;
  * A/B blocks stream through VMEM double-buffered by Mosaic.

Zero padding is safe on every axis: all inputs are nonnegative
(membership weights), so min(0, x) = 0 contributes nothing to the sum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, out_ref, acc_ref, *, jg: int):
    c_idx = pl.program_id(2)
    nc = pl.num_programs(2)

    @pl.when(c_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = a_ref[:]  # (TQ, TC)
    tj = b_ref.shape[0]

    # walk the B block in jg-sublane groups: dynamic SUBLANE slices (cheap
    # on TPU, unlike lane-indexed stores); the (jg, TQ, TC) broadcast
    # minimum reduces over lanes into a (jg, TQ) update
    def body(g, _):
        b_grp = b_ref[pl.ds(g * jg, jg), :]  # (jg, TC)
        m = jnp.minimum(b_grp[:, None, :], a[None, :, :])  # (jg, TQ, TC)
        acc_ref[pl.ds(g * jg, jg), :] += jnp.sum(m, axis=-1)
        return 0

    jax.lax.fori_loop(0, tj // jg, body, 0)

    @pl.when(c_idx == nc - 1)
    def _():
        out_ref[:] = acc_ref[:]


@partial(jax.jit, static_argnames=("tq", "tj", "tc", "jg", "interpret"))
def min_sum_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    tq: int = 512,
    tj: int = 128,
    tc: int = 1024,
    jg: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(Q, C), (J, C) nonnegative f32 -> (Q, J): sum_c min(a_qc, b_jc)."""
    Q, C = a.shape
    J = b.shape[0]
    tq, tc = min(tq, Q), min(tc, C)
    tj = -((-min(tj, J)) // jg) * jg  # multiple of jg so every row is visited
    pq, pj, pc = (-Q) % tq, (-J) % tj, (-C) % tc
    a_p = jnp.pad(a.astype(jnp.float32), ((0, pq), (0, pc)))
    b_p = jnp.pad(b.astype(jnp.float32), ((0, pj), (0, pc)))
    grid = (a_p.shape[0] // tq, b_p.shape[0] // tj, a_p.shape[1] // tc)

    out = pl.pallas_call(
        partial(_kernel, jg=jg),
        out_shape=jax.ShapeDtypeStruct((b_p.shape[0], a_p.shape[0]), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tq, tc), lambda q, j, c: (q, c)),
            pl.BlockSpec((tj, tc), lambda q, j, c: (j, c)),
        ],
        out_specs=pl.BlockSpec((tj, tq), lambda q, j, c: (j, q)),
        scratch_shapes=[pltpu.VMEM((tj, tq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Q * J * C, transcendentals=0,
            bytes_accessed=4 * (Q * C + J * C + Q * J),
        ),
        interpret=interpret,
    )(a_p, b_p)
    return out[:J, :Q].T


def min_sum_reference(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jnp twin for parity tests (same tiled formulation rerank uses)."""
    return jax.vmap(
        lambda bj: jnp.sum(jnp.minimum(a, bj[None, :]), axis=1), out_axes=1
    )(b)
