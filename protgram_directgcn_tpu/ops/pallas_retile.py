"""Pallas retile kernels: pack/unpack the sub-128-lane rg carry at HBM BW.

The jit-level reshapes these replace are 4-7x over bandwidth on TPU
(measured, experiments/exp_unpack_r4.py): XLA lowers the lane-split
[A, GP, 128] -> [A, G, f] (and its inverse) as a degenerate relayout.
Inside a kernel the same movement is a per-block register shuffle between
a [gt, 128] tile and its [k*gt, f] interleaving, which Mosaic lowers to
vector ops — the only HBM traffic is one read + one write.

Layout contract (models/directgcn.pack_rg_carry): packed row r of plane a
holds nodes g = r*k .. r*k+k-1 in consecutive f-wide lane segments, where
k = 128 // f.

reference: no counterpart (torch keeps a flat [N, F] layout throughout);
this exists because sub-128-lane buffers pad 2-4x in HBM tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _unpack_body(i_ref, o_ref, *, k, f):
    # [gt, 128] -> [k*gt, 128] with node j of each packed row landing on
    # output row k*i+j, lanes [0:f] (the rest zero — consumers want the
    # f_pad-padded form anyway).  Formulated as lane-concats plus a
    # LEADING-dim reshape only; a direct (gt,128)->(k*gt,f) lane-split
    # reshape does not lower in Mosaic.
    x = i_ref[0]  # [gt, 128]
    gt = x.shape[0]
    zero = jnp.zeros((gt, 128 - f), x.dtype)
    rows = [
        jnp.concatenate([x[:, j * f:(j + 1) * f], zero], axis=1)[:, None, :]
        for j in range(k)
    ]  # k x [gt, 1, 128]
    o_ref[0] = jnp.concatenate(rows, axis=1).reshape(gt * k, 128)


def _pack_body(i_ref, o_ref, *, k, f):
    # [k*gt, 128] (f_pad-padded rows; only lanes [0:f] read) -> [gt, 128]
    # packed.  The (k*gt, 128) -> (gt, k*128) sublane-merge-into-lanes
    # reshape DOES lower in Mosaic (strided sublane slices and middle-axis
    # indexing do not); segments are then plain lane slices.
    x = i_ref[0]  # [k*gt, 128]
    gt = x.shape[0] // k
    y = x.reshape(gt, k * 128)
    o_ref[0] = jnp.concatenate([y[:, j * 128:j * 128 + f] for j in range(k)], axis=1)


# NOTE: an "exact-width" body ([k*gt, f] -> [gt, 128] via one reshape) does
# NOT lower in Mosaic — sub-128 lane input blocks crash the compiler; the
# caller lane-pads exact-width inputs and uses _pack_body instead.


_GT = 256  # packed rows per block; ragged tails are masked by pallas


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def unpack_pad_rg_pallas(t: jnp.ndarray, f: int, interpret: bool = False) -> jnp.ndarray:
    """[A, GP, 128] packed -> [A, GP * (128 // f), 128] unpacked rows with
    lanes [0:f] populated and the rest zero (the f_pad form the propagation
    kernels and einsum consumers use; slice [..., :f] for the logical
    carry — XLA fuses the slice into consumers).  Linear: its VJP is the
    pack kernel (and vice versa), so both differentiate freely."""
    return _unpack_pad_impl(t, f, interpret)


@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def _unpack_pad_impl(t: jnp.ndarray, f: int, interpret: bool = False) -> jnp.ndarray:
    a, gp, lanes = t.shape
    assert lanes == 128 and 128 % f == 0 and f < 128, (t.shape, f)
    k = 128 // f
    gt = min(_GT, gp)
    return pl.pallas_call(
        functools.partial(_unpack_body, k=k, f=f),
        grid=(a, -(-gp // gt)),
        in_specs=[pl.BlockSpec((1, gt, 128), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, gt * k, 128), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((a, gp * k, 128), t.dtype),
        interpret=interpret,
    )(t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pack_rg_pallas(t: jnp.ndarray, f: int, interpret: bool = False) -> jnp.ndarray:
    """[A, G8, f] or [A, G8, 128] (f_pad-padded rows; only lanes [0:f] are
    read) -> [A, G8 // (128 // f), 128] packed.  G8 must divide evenly by
    the packing factor (pad g first otherwise).  Linear; VJP = unpack."""
    return _pack_impl(t, f, interpret)


@functools.partial(jax.jit, static_argnames=("f", "interpret"))
def _pack_impl(t: jnp.ndarray, f: int, interpret: bool = False) -> jnp.ndarray:
    a, g, lanes = t.shape
    assert 128 % f == 0 and f < 128, (t.shape, f)
    assert lanes in (f, 128), (t.shape, f)
    k = 128 // f
    assert g % k == 0, (g, k)
    if lanes != 128:
        # Sub-128 lane input blocks crash Mosaic; one lane pad (a
        # bandwidth-rate copy) makes every pack shape kernel-legal.
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 128 - lanes)))
    gp = g // k
    gt = min(_GT, gp)
    return pl.pallas_call(
        functools.partial(_pack_body, k=k, f=f),
        grid=(a, -(-gp // gt)),
        in_specs=[pl.BlockSpec((1, gt * k, 128), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, gt, 128), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((a, gp, 128), t.dtype),
        interpret=interpret,
    )(t)


def _unpack_fwd(t, f, interpret):
    return _unpack_pad_impl(t, f, interpret), None


def _unpack_bwd(f, interpret, _res, g):
    # d/dt of the unpacked-padded form: gather each node's [0:f] lanes back
    # into packed rows — exactly the pack kernel (pad-lane cotangents are
    # ignored, matching the zeros the forward wrote there).
    return (_pack_impl(g, f, interpret),)


unpack_pad_rg_pallas.defvjp(_unpack_fwd, _unpack_bwd)


def _pack_fwd(t, f, interpret):
    return _pack_impl(t, f, interpret), t.shape[-1]


def _pack_bwd(f, interpret, in_lanes, g):
    dt = _unpack_pad_impl(g, f, interpret)
    if in_lanes != 128:
        dt = dt[..., :in_lanes]
    return (dt,)


pack_rg_pallas.defvjp(_pack_fwd, _pack_bwd)
