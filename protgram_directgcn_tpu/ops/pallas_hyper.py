"""Pallas TPU kernels for the hypercube-factorized n-gram SpMM.

Layout is everything on this part.  Profiling the first-generation kernels
showed the runtime was *pure HBM traffic at full bandwidth* — MXU work and
in-kernel (1,0,2) transposes were free — and most of the traffic was waste:

- every `x.reshape(G, A, F)` / `(A, G, F)` crossing a jit/pallas boundary is a
  materialized XLA relayout (the (·, 21, ·) middle dim re-tiles);
- a `[G, 21, 21]` bf16 bank is stored tile-padded to (32, 128) — a 9.3x HBM
  inflation on every bank read; the r-major `[21, G, 21]` layout pads only
  its last dim (21 -> 128, 6.1x) — so banks are stored r-major ONLY.

Mosaic constraints shape what is reachable (A = alphabet is odd for proteins,
so no structural size divides 8):

- block shapes must have their last two dims (8k, 128k) or equal to the array
  dims — so blocks along the key axis G are free-sized (ragged), but blocks
  sized by node-id arithmetic (multiples of A) are illegal; this is what
  forbids fusing the whole propagation into one kernel (the A-pattern wants
  gc-blocked outputs, the Aᵀ-pattern rg-blocked outputs, provably
  incompatible as a single output block).
- in-register sublane merge/split reshapes ((gt, A, F) <-> (gt*A, F)) ARE
  supported and cheap; lane-split reshapes ((gt, A*A) -> (gt, A, A)) are NOT.

The resulting two-kernel structure (one propagation = K1 then K2):

    carry x: rg layout (A, G, F)    x[r, gg, f] = x[node r*G + gg]
    x_flat = x viewed flat (N, F)   [the one materialized relayout]

    K1 (A-pattern): z[g*A + c] = sum_r wf[r, g, c] * x[r*G + g]
        in:  x_rg slabs (A, gt, F) — native carry blocks
             wf_rs slabs (A, gt, A) — r-major bank, in-kernel (1,0,2) transpose
        out: z FLAT (N, F) — in-kernel sublane-merge (gt, A, F) -> (gt*A, F),
             so z is never stored in the padded gc-3D layout
    z_rg = z viewed (A, G, F)       [second materialized relayout]

    K2 (Aᵀ-pattern + diagonal + sum): out[r*G + gg] =
             z[r*G+gg] + d[r*G+gg] x[r*G+gg] + sum_c wb[r, gg, c] x[gg*A + c]
        in:  z_rg, x_rg (diag) — native rg blocks (A, gt, F)
             x_flat blocks (gt*A, F) — in-kernel sublane-split to (gt, A, F)
             wb_rs slabs (A, gt, A) — in-kernel transpose
        out: y rg blocks (A, gt, F) — the next carry, native

Per propagation: ~6 unpadded feature sweeps + 2 relayouts + 2 r-major bank
streams; no gathers, no gc-padded arrays anywhere.

reference: graph_utils.py:198-287 (the propagation matrices this format
carries); the kernels implement the same out[i] = sum_{j->i} w_ij x[j].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _k1_body(w_ref, xr_ref, o_ref):
    """z[g, c, f] = A-pattern partial: sum_r wf[g,c,r] x[r*G+g] (gc blocks).

    Measured variants (v5e, 5-gram): this form — g-major bank, minor-dim
    contraction, 3-D gc output — runs at HBM bandwidth.  Contracting the
    sublane dim of an r-major bank slab costs ~+4 ms/prop in lowering, and
    writing flat via an in-register sublane merge costs ~+5 ms/prop."""
    xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
    y = jax.lax.dot_general(
        w_ref[...],  # (gt, A_c, A_r)
        xr_t,
        (((2,), (1,)), ((0,), (0,))),  # contract A_r, batch g
        preferred_element_type=jnp.float32,
    )  # (gt, A_c, F)
    o_ref[...] = y.astype(o_ref.dtype)


def _k1_body_rs(w_ref, xr_ref, o_ref):
    """K1 from the r-major bank (memory-lean "rs" mode: no g-major copy on
    device).  Sublane-dim contraction — measured ~+4 ms/prop vs _k1_body."""
    w_t = w_ref[...].transpose(1, 0, 2)  # (gt, A_r, A_c)
    xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
    y = jax.lax.dot_general(
        w_t,
        xr_t,
        (((1,), (1,)), ((0,), (0,))),  # contract A_r, batch g
        preferred_element_type=jnp.float32,
    )  # (gt, A_c, F)
    o_ref[...] = y.astype(o_ref.dtype)


def _k1_body_pk(w_ref, xr_ref, o_ref):
    """K1 from the packed [A*A, G] bank (block (A*A, gt)): near-zero tile
    padding on the bank stream (vs 9.3x g-major / 6.1x r-major).  The
    (441, gt) block is split to (A_r, A_c, gt) in-register (lanes fixed)
    and transposed to a leading-batch dot form."""
    a = xr_ref.shape[0]
    w3 = w_ref[...].reshape(a, a, w_ref.shape[1])  # (A_r, A_c, gt)
    w_t = w3.transpose(2, 1, 0)  # (gt, A_c, A_r)
    xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
    y = jax.lax.dot_general(
        w_t,
        xr_t,
        (((2,), (1,)), ((0,), (0,))),  # contract A_r, batch g
        preferred_element_type=jnp.float32,
    )  # (gt, A_c, F)
    o_ref[...] = y.astype(o_ref.dtype)


def _k2_body(d_ref, w_ref, z_ref, xs_ref, xd_ref, o_ref, *, scale, shift, split, packed=False):
    """y[r, gg] = scale*(z + d*x + sum_c wb[r,gg,c] x[gg*A+c]) + shift.

    The affine epilogue rides the output cast for free — production layers
    scale/bias right after propagation, so this fusion is the natural API.

    ``split``: the gc-view input arrives as flat (gt*A, F) blocks and is
    sublane-split in-register — Mosaic supports that only for 128-multiple
    lane dims; otherwise the caller materializes the gc view and feeds
    (gt, A, F) blocks directly."""
    a, gt, f = z_ref.shape
    d_blk = d_ref[...]
    if packed:  # (A*A, gt) block -> (A_r, A_c, gt) -> (gt, A_r, A_c)
        w_t = w_ref[...].reshape(a, a, gt).transpose(2, 0, 1)
    else:
        w_t = w_ref[...].transpose(1, 0, 2)  # (gt, A_r, A_c)
    xs = xs_ref[...].reshape(gt, a, f) if split else xs_ref[...]
    y = jax.lax.dot_general(
        w_t,
        xs,
        (((2,), (1,)), ((0,), (0,))),  # contract A_c, batch gg
        preferred_element_type=jnp.float32,
    )  # (gt, A_r, F)
    acc = (
        z_ref[...].astype(jnp.float32)
        + d_blk[:, :, None] * xd_ref[...].astype(jnp.float32)
        + y.transpose(1, 0, 2)
    )
    if scale != 1.0:
        acc = acc * scale
    if shift != 0.0:
        acc = acc + shift
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_gt(g: int, a: int, f_tile: int, itemsize: int, blocks: int) -> int:
    """Largest multiple-of-128 g-block keeping ``blocks`` double-buffered
    (·gt·A·f_tile) feature blocks plus the f32 accumulator comfortably inside
    VMEM (target ~12 MB of 16).  128: K2's diagonal (A, gt) block puts gt on
    the lane dim."""
    budget = 12 * 1024 * 1024
    f_pad = ((f_tile + 127) // 128) * 128  # VMEM pads the lane dim to 128
    per_key = a * f_pad * (2 * blocks * max(itemsize, 2) + 4) + 4 * a * a * itemsize
    gt = max(128, budget // per_key)
    return max(128, (gt // 128) * 128)


@functools.partial(
    jax.jit, static_argnames=("interpret", "scale", "shift", "w1_is_gm", "w_layout")
)
def apply_hyper_pallas(
    d,
    w1,
    w2,
    x_rg,
    interpret: bool = False,
    scale: float = 1.0,
    shift: float = 0.0,
    w1_is_gm: bool = True,
    w_layout: str = None,
):
    """One propagation: diag + A-pattern (bank ``w1``) + Aᵀ-pattern (bank
    ``w2``) over rg-layout features, with an optional fused affine epilogue
    ``out = scale*(M x) + shift``.

    ``w_layout`` selects the bank layouts:
      "gm" — w1 g-major [g, c, r], w2 r-major [r, g, c] (fastest dual mode)
      "rs" — both r-major (memory-lean, ~+4 ms/prop K1)
      "pk" — both packed [A*A, G]: near-zero bank tile padding (~6x leaner
             than r-major on device) but a ~45% slower K1 (measured 14.32 vs
             9.84 ms/iter, experiments/exp_packed_k1.log) — the memory
             fallback, not the speed choice; see _k1_body_pk
    ``w1_is_gm`` is the legacy boolean spelling of gm/rs.

    d: [A, G] f32 diagonal (rg layout; flat order == node order)
    x_rg: [A, G, F]; returns [A, G, F] in ``x_rg.dtype`` (f32 accumulation).
    """
    a, g, f = x_rg.shape
    if w_layout is None:
        w_layout = "gm" if w1_is_gm else "rs"
    expect = {"gm": (g, a, a), "rs": (a, g, a), "pk": (a * a, g)}[w_layout]
    assert w1.shape == expect, (w1.shape, w_layout, a, g)
    # w2 (the K2-side bank) is r-major in both gm and rs modes.
    expect2 = (a * a, g) if w_layout == "pk" else (a, g, a)
    assert w2.shape == expect2, (w2.shape, w_layout, a, g)
    n_hyper = a * g
    f_tile = 128 if f % 128 == 0 else f
    assert f % f_tile == 0 and f_tile <= 256, (f, f_tile)
    # K2's diagonal (A, gt) block puts gt on the lane dim -> 128 multiples.
    # Compiled path is 2-byte dtypes only: at 4 bytes even 128-key blocks
    # brush the VMEM ceiling (the dispatcher routes f32 to the XLA einsum
    # path); interpret mode (tests) takes any dtype.
    assert interpret or x_rg.dtype.itemsize == 2, x_rg.dtype
    cap = -(-g // 128) * 128  # no point in blocks beyond one ragged G
    gt1 = min(cap, _pick_gt(g, a, f_tile, x_rg.dtype.itemsize, blocks=2))
    gt2 = min(cap, _pick_gt(g, a, f_tile, x_rg.dtype.itemsize, blocks=5))

    # Mosaic supports the in-register sublane merge/split only at
    # 128-multiple lane dims; otherwise K2 reads a materialized gc view.
    split = f_tile % 128 == 0
    x_gcish = x_rg.reshape(n_hyper, f) if split else x_rg.reshape(n_hyper, f).reshape(g, a, f)

    if w_layout == "gm":
        k1, spec_w1 = _k1_body, pl.BlockSpec((gt1, a, a), lambda i, j: (i, 0, 0))
    elif w_layout == "pk":
        k1, spec_w1 = _k1_body_pk, pl.BlockSpec((a * a, gt1), lambda i, j: (0, i))
    else:
        k1, spec_w1 = _k1_body_rs, pl.BlockSpec((a, gt1, a), lambda i, j: (0, i, 0))
    z_gc = pl.pallas_call(
        k1,
        grid=(pl.cdiv(g, gt1), f // f_tile),
        in_specs=[
            spec_w1,
            pl.BlockSpec((a, gt1, f_tile), lambda i, j: (0, i, j)),
        ],
        out_specs=pl.BlockSpec((gt1, a, f_tile), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((g, a, f), x_rg.dtype),
        interpret=interpret,
    )(w1, x_rg)

    z_rg = z_gc.reshape(a, g, f)  # materialized relayout #2 (order-preserving)

    packed2 = w_layout == "pk"
    spec_w = (
        pl.BlockSpec((a * a, gt2), lambda i, j: (0, i))
        if packed2
        else pl.BlockSpec((a, gt2, a), lambda i, j: (0, i, 0))
    )
    spec_rg = pl.BlockSpec((a, gt2, f_tile), lambda i, j: (0, i, j))
    spec_xs = (
        pl.BlockSpec((gt2 * a, f_tile), lambda i, j: (i, j))
        if split
        else pl.BlockSpec((gt2, a, f_tile), lambda i, j: (i, 0, j))
    )
    d_in, spec_d = d, pl.BlockSpec((a, gt2), lambda i, j: (0, i))

    return pl.pallas_call(
        functools.partial(_k2_body, scale=scale, shift=shift, split=split, packed=packed2),
        grid=(pl.cdiv(g, gt2), f // f_tile),
        in_specs=[spec_d, spec_w, spec_rg, spec_xs, spec_rg],
        out_specs=spec_rg,
        out_shape=jax.ShapeDtypeStruct((a, g, f), x_rg.dtype),
        interpret=interpret,
    )(d_in, w2, z_rg, x_gcish, x_rg)
