"""Fused Pallas TPU kernels for the hypercube-factorized n-gram SpMM.

`ops/hypercube.py` factors an n-gram propagation matrix over positional node
ids into a diagonal plus two banks of per-key [A x A] blocks (A = alphabet).
XLA executes that as batched matmuls with materialized layout transposes and
unfused elementwise passes — ~6-8 full sweeps over the [A^n, F] feature array
per propagation.  These kernels fuse each propagation into exactly TWO sweeps:

    K1 (contiguous order):  z[g,c,f]  = d[g,c]*x[g,c,f] + sum_r W[r,g,c]*x[r,g,f]
    K2 (strided order):     y[r,g,f]  = z[r,g,f]        + sum_c V[r,g,c]*x[g,c,f]

where `x[g,c,f]` and `x[r,g,f]` are the two free reshape views of the feature
array ([G, A, F] and [A, G, F]; G = A^(n-1)).  Every operand streams through
VMEM in blocked, fully contiguous DMAs; there are **no gathers and no
materialized transposes**.  The weight banks are stored [A, G, A] so both
kernels only ever take leading-axis slices (cheap in Mosaic), and the
transpose product M^T x needed by the backward pass is the SAME kernel pair
with the two banks swapped (see ops/hypercube.py for the algebra).

The contraction over the alphabet is an unrolled broadcast-FMA over A slabs —
VPU work of G*A^2*F FLOPs per kernel, sized to roughly balance the HBM
streaming time of the two sweeps.  bf16 features/weights halve the HBM bytes
(accumulation is always f32).

reference: graph_utils.py:198-287 (the propagation matrices this format
carries); the kernels implement the same out[i] = sum_{j->i} w_ij x[j].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _k1_body(d_ref, w_ref, xc_ref, xr_ref, o_ref):
    """z[g,c,f] = d[g,c] x[g,c,f] + sum_r w[r,g,c] x[r,g,f] (one g-block)."""
    a = w_ref.shape[0]
    acc = d_ref[...][:, :, None] * xc_ref[...].astype(jnp.float32)  # (gt, A, F)
    for r in range(a):
        w_r = w_ref[r].astype(jnp.float32)  # (gt, A)
        x_r = xr_ref[r].astype(jnp.float32)  # (gt, F)
        acc = acc + w_r[:, :, None] * x_r[:, None, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _k2_body(w_ref, z_ref, xc_ref, o_ref):
    """y[r,g,f] = z[r,g,f] + sum_c w[r,g,c] x[g,c,f] (one g-block)."""
    a = w_ref.shape[0]
    xc = xc_ref[...].astype(jnp.float32)  # (gt, A, F)
    rows = [
        (w_ref[r].astype(jnp.float32)[:, :, None] * xc).sum(axis=1)  # (gt, F)
        for r in range(a)
    ]
    acc = z_ref[...].astype(jnp.float32) + jnp.stack(rows, axis=0)
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_gt(g: int, a: int, f_tile: int, itemsize: int) -> int:
    """Largest g-block keeping the working set comfortably inside VMEM.

    Per-block bytes ~ gt * (3*A*f_tile + A*f_tile) * itemsize for the three
    feature operands plus accumulator, doubled by pipeline double-buffering;
    target <= ~6 MB of the ~16 MB VMEM."""
    budget = 6 * 1024 * 1024
    per_key = (4 * a * f_tile) * max(itemsize, 2) + 2 * a * f_tile * 4
    gt = max(8, budget // (2 * per_key))
    # Multiple of 8 sublanes for clean tiling; no bigger than the (rounded) G.
    gt = (gt // 8) * 8
    return max(8, min(gt, ((g + 7) // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_hyper_pallas(d2, w1, w2, x, interpret: bool = False):
    """One fused propagation: diag + A-pattern (bank ``w1``) + A^T-pattern
    (bank ``w2``) over hypercube-ordered features ``x`` [A^n, F].

    d2: [G, A] f32 diagonal; w1/w2: [A, G, A] blocks; returns [A^n, F] in
    ``x.dtype`` (f32 accumulation inside the kernels).
    """
    a, g, _ = w1.shape
    n_hyper, f = x.shape
    assert n_hyper == a * g, (n_hyper, a, g)
    f_tile = f if f <= 256 else 128
    assert f % f_tile == 0
    gt = _pick_gt(g, a, f_tile, x.dtype.itemsize)
    grid = (pl.cdiv(g, gt), f // f_tile)

    x_gc = x.reshape(g, a, f)  # free view, contiguous per key
    x_rg = x.reshape(a, g, f)  # free view, strided slabs per key

    spec_d = pl.BlockSpec((gt, a), lambda i, j: (i, 0))
    spec_w = pl.BlockSpec((a, gt, a), lambda i, j: (0, i, 0))
    spec_gc = pl.BlockSpec((gt, a, f_tile), lambda i, j: (i, 0, j))
    spec_rg = pl.BlockSpec((a, gt, f_tile), lambda i, j: (0, i, j))

    z = pl.pallas_call(
        _k1_body,
        grid=grid,
        in_specs=[spec_d, spec_w, spec_gc, spec_rg],
        out_specs=spec_gc,
        out_shape=jax.ShapeDtypeStruct((g, a, f), x.dtype),
        interpret=interpret,
    )(d2, w1, x_gc, x_rg)

    y = pl.pallas_call(
        _k2_body,
        grid=grid,
        in_specs=[spec_w, spec_rg, spec_gc],
        out_specs=spec_rg,
        out_shape=jax.ShapeDtypeStruct((a, g, f), x.dtype),
        interpret=interpret,
    )(w2, z.reshape(a, g, f), x_gc)

    return y.reshape(n_hyper, f)
