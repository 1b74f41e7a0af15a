"""Experiment: packed [A*A, G] bank for K2 (the Aᵀ+diag+sum kernel).

Variants:
  base_rs : current _k2_body (r-major bank (A, gt, A), (1,0,2) transpose)
  pk_t    : packed bank block (441, gt) -> reshape (A_r, A_c, gt)
            -> transpose(2,0,1) -> (gt, A_r, A_c) -> same dot

Run on TPU:  python experiments/exp_packed_k2.py
CPU check :  python experiments/exp_packed_k2.py --check
"""

from __future__ import annotations

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
    w_pk = np.ascontiguousarray(w_rs.transpose(0, 2, 1).reshape(A * A, G))
    d = (rng.standard_normal((A, G)) * 0.1).astype(np.float32)
    x = (rng.standard_normal((A, G, F)) * 0.1).astype(np.float32)
    z = (rng.standard_normal((A, G, F)) * 0.1).astype(np.float32)

    dt = jnp.bfloat16
    w_rs_d = jnp.asarray(w_rs, dt)
    w_pk_d = jnp.asarray(w_pk, dt)
    d_d = jnp.asarray(d)
    x_d = jnp.asarray(x, dt)
    z_d = jnp.asarray(z, dt)
    x_flat = jnp.asarray(x.reshape(A * G, F), dt)

    gt = 256 if not check_only else 128
    grid = (pl.cdiv(G, gt), F // F)

    def body(d_ref, w_ref, z_ref, xs_ref, xd_ref, o_ref, *, packed):
        a, gtb, f = z_ref.shape
        if packed:
            w3 = w_ref[...].reshape(a, a, gtb)  # (A_r, A_c, gt)
            w_t = w3.transpose(2, 0, 1)  # (gt, A_r, A_c)
        else:
            w_t = w_ref[...].transpose(1, 0, 2)
        xs = xs_ref[...].reshape(gtb, a, f)
        y = jax.lax.dot_general(
            w_t, xs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (gt, A_r, F)
        acc = (
            z_ref[...].astype(jnp.float32)
            + d_ref[...][:, :, None] * xd_ref[...].astype(jnp.float32)
            + y.transpose(1, 0, 2)
        )
        o_ref[...] = acc.astype(o_ref.dtype)

    import functools

    spec_rg = pl.BlockSpec((A, gt, F), lambda i, j: (0, i, j))
    spec_xs = pl.BlockSpec((gt * A, F), lambda i, j: (i, j))
    spec_d = pl.BlockSpec((A, gt), lambda i, j: (0, i))

    variants = {
        "base_rs": (False, w_rs_d, pl.BlockSpec((A, gt, A), lambda i, j: (0, i, 0))),
        "pk_t": (True, w_pk_d, pl.BlockSpec((A * A, gt), lambda i, j: (0, i))),
    }

    def k2(packed, w, spec_w):
        return pl.pallas_call(
            functools.partial(body, packed=packed),
            grid=grid,
            in_specs=[spec_d, spec_w, spec_rg, spec_xs, spec_rg],
            out_specs=spec_rg,
            out_shape=jax.ShapeDtypeStruct((A, G, F), dt),
            interpret=interp,
        )(d_d, w, z_d, x_flat, x_d)

    xg = x.reshape(G, A, F)
    want = (
        z.astype(np.float64)
        + d[:, :, None] * x.astype(np.float64)
        + np.einsum("rgc,gcf->rgf", w_rs.astype(np.float64), xg.astype(np.float64))
    )
    s = slice(None), slice(0, 256), slice(None)  # tiny fetch over the tunnel
    for name, (packed, w, spec_w) in list(variants.items()):
        try:
            got = np.asarray(k2(packed, w, spec_w)[s], np.float64)
        except Exception as e:
            log(f"{name}: FAILED: {type(e).__name__}: {e}")
            variants[name] = None
            continue
        err = np.abs(got - want[s]).max() / max(1e-9, np.abs(want[s]).max())
        log(f"{name}: rel err {err:.3e}")
        assert err < 2e-2, (name, err)
    if check_only:
        log("CPU interpret check done")
        return

    def make_loop(packed, spec_w, length):
        @jax.jit
        def loop(w, x0, dd, zz):
            def step(c, _):
                y = pl.pallas_call(
                    functools.partial(body, packed=packed),
                    grid=grid,
                    in_specs=[spec_d, spec_w, spec_rg, spec_xs, spec_rg],
                    out_specs=spec_rg,
                    out_shape=jax.ShapeDtypeStruct((A, G, F), dt),
                )(dd, w, zz, c.reshape(A * G, F), c)
                return y, None

            out, _ = jax.lax.scan(step, x0, None, length=length)
            return out

        return loop

    for name, v in variants.items():
        if v is None:
            continue
        packed, w, spec_w = v
        times = {}
        for length in (2, 10):
            loop = make_loop(packed, spec_w, length)
            t0 = time.perf_counter()
            _ = np.asarray(loop(w, x_d, d_d, z_d)[:1, :1])
            log(f"{name} L={length} compile+run {time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(loop(w, x_d, d_d, z_d)[:1, :1])
                best = min(best, time.perf_counter() - t0)
            times[length] = best
        per = (times[10] - times[2]) / 8
        log(f"{name}: {per * 1e3:.2f} ms/iter (K2 + x-flat relayout)  raw {times}")


if __name__ == "__main__":
    main("--check" in sys.argv)
