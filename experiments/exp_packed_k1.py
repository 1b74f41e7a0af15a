"""Experiment: packed [A*A, G] weight banks for the hypercube kernels.

Current banks pay massive HBM tile padding on every stream:
  g-major [G, A, A]: (21, 21) tiles pad to (32, 128)  -> 9.3x  (1.59 GB @5g)
  r-major [A, G, A]: lane dim 21 pads to 128          -> 6.1x  (1.045 GB)
A packed [A*A, G] layout (sublanes 441->448, lanes G ragged) is ~1.02x
(172 MB).  The question: can Mosaic get a (441, gt) block into an MXU-dot
form in-register without eating the saved bandwidth?

Variants timed (K1, the A-pattern kernel; chain includes one z relayout):
  base_gm : current _k1_body      (g-major bank, block (gt, A, A))
  base_rs : current _k1_body_rs   (r-major bank, block (A, gt, A))
  pk_t    : packed bank, reshape (441,gt)->(A,A,gt), transpose(2,1,0), dot
  pk_dg   : packed bank, direct dot_general with trailing batch dims

Run on TPU:  python experiments/exp_packed_k1.py
CPU check :  JAX_PLATFORMS=cpu python experiments/exp_packed_k1.py --check
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
    # packed: pk[r*A + c, g] = w_rs[r, g, c]
    w_pk = np.ascontiguousarray(w_rs.transpose(0, 2, 1).reshape(A * A, G))
    x = (rng.standard_normal((A, G, F)) * 0.1).astype(np.float32)

    dt = jnp.bfloat16
    w_rs_d = jnp.asarray(w_rs, dt)
    w_gm_d = jnp.asarray(w_gm, dt)
    w_pk_d = jnp.asarray(w_pk, dt)
    x_d = jnp.asarray(x, dt)

    gt = 256 if not check_only else 128
    grid = (pl.cdiv(G, gt), F // F)

    def body_gm(w_ref, xr_ref, o_ref):
        xr_t = xr_ref[...].transpose(1, 0, 2)
        y = jax.lax.dot_general(
            w_ref[...], xr_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    def body_rs(w_ref, xr_ref, o_ref):
        w_t = w_ref[...].transpose(1, 0, 2)
        xr_t = xr_ref[...].transpose(1, 0, 2)
        y = jax.lax.dot_general(
            w_t, xr_t, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    def body_pk_t(w_ref, xr_ref, o_ref):
        w3 = w_ref[...].reshape(A, A, w_ref.shape[1])  # (A_r, A_c, gt)
        w_t = w3.transpose(2, 1, 0)  # (gt, A_c, A_r)
        xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
        y = jax.lax.dot_general(
            w_t, xr_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    def body_pk_t2(w_ref, xr_ref, o_ref):
        # (2,0,1) transpose + rs-style sublane contraction.
        w3 = w_ref[...].reshape(A, A, w_ref.shape[1])  # (A_r, A_c, gt)
        w_t = w3.transpose(2, 0, 1)  # (gt, A_r, A_c)
        xr_t = xr_ref[...].transpose(1, 0, 2)  # (gt, A_r, F)
        y = jax.lax.dot_general(
            w_t, xr_t, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # -> (gt, A_c, F)
        o_ref[...] = y.astype(o_ref.dtype)

    spec_x = pl.BlockSpec((A, gt, F), lambda i, j: (0, i, j))
    spec_o = pl.BlockSpec((gt, A, F), lambda i, j: (i, 0, j))

    def k1(body, w, spec_w):
        return pl.pallas_call(
            body, grid=grid,
            in_specs=[spec_w, spec_x], out_specs=spec_o,
            out_shape=jax.ShapeDtypeStruct((G, A, F), dt),
            interpret=interp,
        )(w, x_d)

    variants = {
        "base_gm": (body_gm, w_gm_d, pl.BlockSpec((gt, A, A), lambda i, j: (i, 0, 0))),
        "base_rs": (body_rs, w_rs_d, pl.BlockSpec((A, gt, A), lambda i, j: (0, i, 0))),
        "pk_t": (body_pk_t, w_pk_d, pl.BlockSpec((A * A, gt), lambda i, j: (0, i))),
        "pk_t2": (body_pk_t2, w_pk_d, pl.BlockSpec((A * A, gt), lambda i, j: (0, i))),
    }

    if not check_only:
        variants.pop("base_rs", None)  # known: +4 ms/prop vs base_gm

    # Correctness vs einsum oracle.  On TPU fetch only a small device-side
    # slice — np.asarray of the full [G, A, F] output is ~1 GB over a
    # ~30 MB/s tunnel (minutes of pure transfer per variant).
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
        log(f"{name}: rel err {err:.3e}")
        assert err < 2e-2, (name, err)
    if check_only:
        log("CPU interpret check done")
        return

    # Slope timing: chain K1 through a z->(A,G,F) relayout (same for all).
    def make_loop(body, spec_w, length):
        @jax.jit
        def loop(w, x0):
            def step(c, _):
                z = pl.pallas_call(
                    body, grid=grid,
                    in_specs=[spec_w, spec_x], out_specs=spec_o,
                    out_shape=jax.ShapeDtypeStruct((G, A, F), dt),
                )(w, c)
                return z.reshape(A, G, F), None

            out, _ = jax.lax.scan(step, x0, None, length=length)
            return out

        return loop

    for name, v in variants.items():
        if v is None:
            continue
        body, w, spec_w = v
        times = {}
        for length in (2, 10):
            loop = make_loop(body, spec_w, length)
            t0 = time.perf_counter()
            r = np.asarray(loop(w, x_d)[:1, :1])  # noqa: F841
            log(f"{name} L={length} compile+run {time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = np.asarray(loop(w, x_d)[:1, :1])  # noqa: F841
                best = min(best, time.perf_counter() - t0)
            times[length] = best
        per = (times[10] - times[2]) / 8
        log(f"{name}: {per * 1e3:.2f} ms/iter (K1 + relayout)   raw {times}")


if __name__ == "__main__":
    main("--check" in sys.argv)
