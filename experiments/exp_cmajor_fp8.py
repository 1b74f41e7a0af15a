"""Experiment: c-major K1 bank layout + fp8 weight banks (traffic levers).

Round-1 profiling left the hypercube iteration AT the 2-kernel HBM roofline
(~28.4 GB/iter); the only remaining levers are the *bank* streams:

  K1 g-major [G, A, A] bf16: (21, 21) tiles pad (32, 128) -> 9.3x = 1.59 GB
  K2 r-major [A, G, A] bf16: lanes 21 -> 128             -> 6.1x = 1.045 GB

Levers tested here (A = 21, G = 21^4, F = 128, bf16 features):

1. **c-major K1 bank** [A_c, G, A_r]: pads lanes only (6.1x, 1.045 GB like
   r-major) but — unlike r-major — its in-kernel (1,0,2) transpose yields
   (gt, A_c, A_r) with the contraction on the MINOR dim, the exact dot form
   of the fast g-major kernel (r-major's +4 ms/prop came from contracting
   the sublane dim, not from the transpose).  Expected: g-major speed minus
   ~0.9 ms of bank traffic.

2. **fp8 banks** (e4m3, in-kernel upcast to bf16 before the dot): halves
   every bank stream again.  Graph weights are static data, so this is a
   precision trade on the adjacency values only (~6% max rel err), offered
   as an opt-in speed mode, never the parity default.

K1 variants (timed with the z relayout, directly comparable to
experiments/exp_packed_k1.log: base_gm 9.84 ms/iter, pk_t 14.32):
  base_gm : g-major bf16 (round-1 production)
  cm      : c-major bf16
  cm_f8   : c-major fp8-e4m3 + in-kernel upcast
  gm_f8   : g-major fp8-e4m3 + in-kernel upcast

K2 variants (timed with the x-flat relayout, comparable to exp_packed_k2):
  k2_rs    : r-major bf16 (round-1 production)
  k2_rs_f8 : r-major fp8-e4m3 + in-kernel upcast

Run on TPU:  python experiments/exp_cmajor_fp8.py
CPU check :  python experiments/exp_cmajor_fp8.py --check
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[exp] {m}", file=sys.stderr, flush=True)


def main(check_only: bool):
    import jax

    if check_only:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    A = 21
    G = A**4 if not check_only else A**2
    F = 128
    interp = check_only

    rng = np.random.default_rng(0)
    w_rs = (rng.standard_normal((A, G, A)) * 0.05).astype(np.float32)
    w_gm = np.ascontiguousarray(w_rs.transpose(1, 2, 0))  # [g, c, r]
    w_cm = np.ascontiguousarray(w_rs.transpose(2, 1, 0))  # [c, g, r]
    x = (rng.standard_normal((A, G, F)) * 0.1).astype(np.float32)
    d = (rng.standard_normal((A, G)) * 0.1).astype(np.float32)
    z = (rng.standard_normal((A, G, F)) * 0.1).astype(np.float32)

    dt = jnp.bfloat16
    f8 = jnp.float8_e4m3fn
    x_d = jnp.asarray(x, dt)
    d_d = jnp.asarray(d)
    z_d = jnp.asarray(z, dt)
    x_flat = jnp.asarray(x.reshape(A * G, F), dt)

    gt = 256 if not check_only else 128
    grid = (pl.cdiv(G, gt), F // F)

    # ---------------- K1 bodies ----------------

    def body_gm(w_ref, xr_ref, o_ref):
        w = w_ref[...]
        if w.dtype != dt:
            w = w.astype(dt)
        xr_t = xr_ref[...].transpose(1, 0, 2)
        y = jax.lax.dot_general(
            w, xr_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    def body_cm(w_ref, xr_ref, o_ref):
        w = w_ref[...]
        if w.dtype != dt:
            w = w.astype(dt)
        w_t = w.transpose(1, 0, 2)  # (gt, A_c, A_r)
        xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
        y = jax.lax.dot_general(
            w_t, xr_t, (((2,), (1,)), ((0,), (0,))),  # contract A_r (minor)
            preferred_element_type=jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    spec_x = pl.BlockSpec((A, gt, F), lambda i, j: (0, i, j))
    spec_o = pl.BlockSpec((gt, A, F), lambda i, j: (i, 0, j))
    spec_w_gm = pl.BlockSpec((gt, A, A), lambda i, j: (i, 0, 0))
    spec_w_cm = pl.BlockSpec((A, gt, A), lambda i, j: (0, i, 0))

    def to_f8(arr):
        return jnp.asarray(arr, f8)

    variants = {
        "base_gm": (body_gm, jnp.asarray(w_gm, dt), spec_w_gm),
        "cm": (body_cm, jnp.asarray(w_cm, dt), spec_w_cm),
        "cm_f8": (body_cm, to_f8(w_cm), spec_w_cm),
        "gm_f8": (body_gm, to_f8(w_gm), spec_w_gm),
    }

    def k1(body, w, spec_w):
        return pl.pallas_call(
            body, grid=grid,
            in_specs=[spec_w, spec_x], out_specs=spec_o,
            out_shape=jax.ShapeDtypeStruct((G, A, F), dt),
            interpret=interp,
        )(w, x_d)

    want = np.einsum("rgc,rgf->gcf", w_rs.astype(np.float64), x.astype(np.float64))
    s = slice(0, 256), slice(None), slice(None)
    for name, (body, w, spec_w) in list(variants.items()):
        try:
            got = np.asarray(k1(body, w, spec_w)[s], np.float64)
        except Exception as e:
            log(f"{name}: FAILED to lower/run: {type(e).__name__}: {e}")
            variants[name] = None
            continue
        err = np.abs(got - want[s]).max() / max(1e-9, np.abs(want[s]).max())
        tol = 8e-2 if "f8" in name else 2e-2  # e4m3: 3 mantissa bits
        log(f"{name}: rel err {err:.3e} (tol {tol})")
        assert err < tol, (name, err)

    # ---------------- K2 bodies ----------------

    def body_k2(d_ref, w_ref, z_ref, xs_ref, xd_ref, o_ref):
        a, gtb, f = z_ref.shape
        w = w_ref[...]
        if w.dtype != dt:
            w = w.astype(dt)
        w_t = w.transpose(1, 0, 2)  # (gt, A_r, A_c)
        xs = xs_ref[...].reshape(gtb, a, f)
        y = jax.lax.dot_general(
            w_t, xs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc = (
            z_ref[...].astype(jnp.float32)
            + d_ref[...][:, :, None] * xd_ref[...].astype(jnp.float32)
            + y.transpose(1, 0, 2)
        )
        o_ref[...] = acc.astype(o_ref.dtype)

    spec_rg = pl.BlockSpec((A, gt, F), lambda i, j: (0, i, j))
    spec_xs = pl.BlockSpec((gt * A, F), lambda i, j: (i, j))
    spec_d = pl.BlockSpec((A, gt), lambda i, j: (0, i))
    spec_w_rs = pl.BlockSpec((A, gt, A), lambda i, j: (0, i, 0))

    k2_variants = {
        "k2_rs": jnp.asarray(w_rs, dt),
        "k2_rs_f8": to_f8(w_rs),
    }

    def k2(w):
        return pl.pallas_call(
            body_k2, grid=grid,
            in_specs=[spec_d, spec_w_rs, spec_rg, spec_xs, spec_rg],
            out_specs=spec_rg,
            out_shape=jax.ShapeDtypeStruct((A, G, F), dt),
            interpret=interp,
        )(d_d, w, z_d, x_flat, x_d)

    xg = x.reshape(G, A, F)
    want2 = (
        z.astype(np.float64)
        + d[:, :, None] * x.astype(np.float64)
        + np.einsum("rgc,gcf->rgf", w_rs.astype(np.float64), xg.astype(np.float64))
    )
    s2 = slice(None), slice(0, 256), slice(None)
    for name, w in list(k2_variants.items()):
        try:
            got = np.asarray(k2(w)[s2], np.float64)
        except Exception as e:
            log(f"{name}: FAILED to lower/run: {type(e).__name__}: {e}")
            k2_variants[name] = None
            continue
        err = np.abs(got - want2[s2]).max() / max(1e-9, np.abs(want2[s2]).max())
        tol = 8e-2 if "f8" in name else 2e-2
        log(f"{name}: rel err {err:.3e} (tol {tol})")
        assert err < tol, (name, err)

    if check_only:
        log("CPU interpret check done")
        return

    # ---------------- timing (K1 chain: kernel + z relayout) ----------------

    def make_k1_loop(body, spec_w, length):
        @jax.jit
        def loop(w, x0):
            def step(c, _):
                zz = pl.pallas_call(
                    body, grid=grid,
                    in_specs=[spec_w, spec_x], out_specs=spec_o,
                    out_shape=jax.ShapeDtypeStruct((G, A, F), dt),
                )(w, c)
                return zz.reshape(A, G, F), None

            out, _ = jax.lax.scan(step, x0, None, length=length)
            return out

        return loop

    def slope(make_loop, w, extra=()):
        times = {}
        for length in (2, 10):
            loop = make_loop(length)
            t0 = time.perf_counter()
            _ = np.asarray(loop(w, x_d, *extra)[:1, :1])
            log(f"  L={length} compile+run {time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(loop(w, x_d, *extra)[:1, :1])
                best = min(best, time.perf_counter() - t0)
            times[length] = best
        return (times[10] - times[2]) / 8, times

    for name, v in variants.items():
        if v is None:
            continue
        body, w, spec_w = v
        per, raw = slope(lambda L: make_k1_loop(body, spec_w, L), w)
        log(f"{name}: {per * 1e3:.2f} ms/iter (K1 + relayout)   raw {raw}")

    # ---------------- timing (K2 chain: x-flat relayout + kernel) -----------

    def make_k2_loop(w, length):
        @jax.jit
        def loop(wb, x0, dd, zz):
            def step(c, _):
                y = pl.pallas_call(
                    body_k2, grid=grid,
                    in_specs=[spec_d, spec_w_rs, spec_rg, spec_xs, spec_rg],
                    out_specs=spec_rg,
                    out_shape=jax.ShapeDtypeStruct((A, G, F), dt),
                )(dd, wb, zz, c.reshape(A * G, F), c)
                return y, None

            out, _ = jax.lax.scan(step, x0, None, length=length)
            return out

        return loop

    for name, w in k2_variants.items():
        if w is None:
            continue
        per, raw = slope(lambda L: make_k2_loop(w, L), w, extra=(d_d, z_d))
        log(f"{name}: {per * 1e3:.2f} ms/iter (K2 + x-flat relayout)  raw {raw}")


if __name__ == "__main__":
    main("--check" in sys.argv)
