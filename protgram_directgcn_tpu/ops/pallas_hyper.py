"""Fused Pallas TPU kernels for the hypercube-factorized n-gram SpMM.

`ops/hypercube.py` factors an n-gram propagation matrix over positional node
ids into a diagonal plus two banks of per-key [A x A] blocks (A = alphabet).
XLA executes that as batched matmuls with materialized layout transposes and
unfused elementwise passes — ~6-8 full sweeps over the [A^n, F] feature array
per propagation.  These kernels fuse each propagation into exactly TWO sweeps:

    K1 (contiguous order):  z[g,c,f]  = d[g,c]*x[g,c,f] + sum_r W[g,c,r]*x[r,g,f]
    K2 (strided order):     y[r,g,f]  = z[r,g,f]        + sum_c V[g,r,c]*x[g,c,f]

where `x[g,c,f]` and `x[r,g,f]` are the two free reshape views of the feature
array ([G, A, F] and [A, G, F]; G = A^(n-1)).  Every operand streams through
VMEM in blocked, fully contiguous DMAs; there are **no gathers and no
HBM-materialized transposes**.  The weight banks arrive pre-transposed in
key-major [G, A, A] layouts (`wf_c/wb_r` for the forward product, `wb_c/wf_r`
for the transpose product — see ops/hypercube.py for the algebra), so each
kernel is a single batched-over-keys MXU contraction
(`dot_general` batching the leading G axis, contracting one A axis) plus one
in-register (1,0,2) relayout of a feature block.

Measured on v5e (5-gram, A=21, F=128, bf16): 455M fwd+bwd edges/s vs 190M
for the XLA einsum lowering — the remaining gap to the ~1.2B streaming
ceiling is MXU occupancy on the narrow (21-wide) contractions.

reference: graph_utils.py:198-287 (the propagation matrices this format
carries); the kernels implement the same out[i] = sum_{j->i} w_ij x[j].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _k1_body(d_ref, w_ref, xc_ref, xr_ref, o_ref):
    """z[g,c,f] = d[g,c] x[g,c,f] + sum_r w[g,c,r] x[r,g,f] (one g-block)."""
    xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
    y = jax.lax.dot_general(
        w_ref[...],  # (gt, A_c, A_r)
        xr_t,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (gt, A_c, F)
    o_ref[...] = (
        d_ref[...][:, :, None] * xc_ref[...].astype(jnp.float32) + y
    ).astype(o_ref.dtype)


def _k2_body(w_ref, z_ref, xc_ref, o_ref):
    """y[r,g,f] = z[r,g,f] + sum_c w[g,r,c] x[g,c,f] (one g-block)."""
    y = jax.lax.dot_general(
        w_ref[...],  # (gt, A_r, A_c)
        xc_ref[...],  # (gt, A_c, F)
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (gt, A_r, F)
    o_ref[...] = (z_ref[...].astype(jnp.float32) + y.transpose(1, 0, 2)).astype(
        o_ref.dtype
    )


def _pick_gt(g: int, a: int, f_tile: int, itemsize: int) -> int:
    """Largest g-block keeping the working set comfortably inside VMEM.

    Empirical scoped-VMEM footprint (Mosaic compile reports): ~(4*itemsize+8)
    bytes per (key, A, f_tile) element — double-buffered feature blocks plus
    the f32 accumulator.  Target ~12 MB of the 16 MB VMEM; throughput is flat
    across gt in [128, 256] on v5e, OOM by ~gt=500.  Multiples of 8 sublanes
    (a Mosaic blocking requirement for the [G, A] diagonal)."""
    budget = 12 * 1024 * 1024
    per_key = a * f_tile * (4 * max(itemsize, 2) + 8) + 2 * a * a * itemsize
    gt = max(8, budget // per_key)
    gt = (gt // 8) * 8
    return max(8, min(gt, ((g + 7) // 8) * 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_hyper_pallas(d2, w1c, w2r, x, interpret: bool = False):
    """One fused propagation: diag + A-pattern (bank ``w1c``, [g,c,r] layout)
    + Aᵀ-pattern (bank ``w2r``, [g,r,c] layout) over hypercube-ordered
    features ``x`` [A^n, F].

    d2: [G, A] f32 diagonal; returns [A^n, F] in ``x.dtype`` (f32
    accumulation inside the kernels).
    """
    g, a, _ = w1c.shape
    n_hyper, f = x.shape
    assert n_hyper == a * g, (n_hyper, a, g)
    f_tile = f if f <= 256 else 128
    assert f % f_tile == 0
    gt = _pick_gt(g, a, f_tile, x.dtype.itemsize)
    grid = (pl.cdiv(g, gt), f // f_tile)

    x_gc = x.reshape(g, a, f)  # free view, contiguous per key
    x_rg = x.reshape(a, g, f)  # free view, strided slabs per key

    spec_d = pl.BlockSpec((gt, a), lambda i, j: (i, 0))
    spec_w = pl.BlockSpec((gt, a, a), lambda i, j: (i, 0, 0))
    spec_gc = pl.BlockSpec((gt, a, f_tile), lambda i, j: (i, 0, j))
    spec_rg = pl.BlockSpec((a, gt, f_tile), lambda i, j: (0, i, j))

    z = pl.pallas_call(
        _k1_body,
        grid=grid,
        in_specs=[spec_d, spec_w, spec_gc, spec_rg],
        out_specs=spec_gc,
        out_shape=jax.ShapeDtypeStruct((g, a, f), x.dtype),
        interpret=interpret,
    )(d2, w1c, x_gc, x_rg)

    y = pl.pallas_call(
        _k2_body,
        grid=grid,
        in_specs=[spec_w, spec_rg, spec_gc],
        out_specs=spec_rg,
        out_shape=jax.ShapeDtypeStruct((a, g, f), x.dtype),
        interpret=interpret,
    )(w2r, z.reshape(a, g, f), x_gc)

    return y.reshape(n_hyper, f)
