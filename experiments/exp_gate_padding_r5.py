"""Measure the [N,1] lane-padding tax on gate-shaped arrays (r5 lever C).

Hypothesis: a [N, 1] array stores 128 lanes physically on TPU, so the 5
per-node gates are ~128x their logical bytes, and every optimizer update /
gate-product sweep pays GB-scale traffic for 10 MB of data.  Compare:

  - device memory of [N,1] vs [N] vs [A,G] arrays (memory_stats delta)
  - time of a fused gate-product + broadcast-multiply sweep in both forms
  - time of an adam-like elementwise update chain on [N,1] vs [N]

Run on TPU: python experiments/exp_gate_padding_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N = 2_513_566
A, G = 21, 194_481  # 5-gram lead; A*G > N (hypercube padding) but close enough
NH = A * G


def fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def mem():
    s = jax.local_devices()[0].memory_stats() or {}
    return s.get("bytes_in_use", 0)


def timeit(fn, *args, reps=8):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps


def main():
    dev = jax.devices()[0]
    print("device:", dev.platform, dev.device_kind, flush=True)

    key = jax.random.PRNGKey(0)
    m0 = mem()
    g_2d = [jax.device_put(jnp.ones((NH, 1), jnp.bfloat16)) for _ in range(5)]
    fetch(g_2d)
    m1 = mem()
    g_1d = [jax.device_put(jnp.ones((NH,), jnp.bfloat16)) for _ in range(5)]
    fetch(g_1d)
    m2 = mem()
    print(f"5x [N,1] bf16: {(m1 - m0) / 2**20:.1f} MB device "
          f"(logical {5 * NH * 2 / 2**20:.1f} MB)", flush=True)
    print(f"5x [N]   bf16: {(m2 - m1) / 2**20:.1f} MB device", flush=True)

    y = jax.device_put(jax.random.normal(key, (A, G, 128), jnp.bfloat16))

    @jax.jit
    def prod_2d(ci, co, cd, cu, ca, y):
        gi = (cd * ca * ci).reshape(A, G, 1)
        return gi.astype(y.dtype) * y

    @jax.jit
    def prod_1d(ci, co, cd, cu, ca, y):
        gi = (cd * ca * ci).reshape(A, G)
        return gi[..., None].astype(y.dtype) * y

    t2 = timeit(prod_2d, *g_2d, y)
    t1 = timeit(prod_1d, *g_1d, y)
    print(f"gate-product+bcast sweep: [N,1] {t2 * 1e3:.2f} ms | [N] {t1 * 1e3:.2f} ms", flush=True)

    # Adam-like update chain (f32 moments), one gate param.
    def make_update(shape):
        m = jax.device_put(jnp.zeros(shape, jnp.float32))
        v = jax.device_put(jnp.zeros(shape, jnp.float32))
        p = jax.device_put(jnp.ones(shape, jnp.bfloat16))
        g = jax.device_put(jnp.full(shape, 0.01, jnp.bfloat16))

        @jax.jit
        def upd(p, g, m, v):
            gf = g.astype(jnp.float32)
            m2 = 0.9 * m + 0.1 * gf
            v2 = 0.999 * v + 0.001 * gf * gf
            step = m2 / (jnp.sqrt(v2) + 1e-8)
            return (p.astype(jnp.float32) - 1e-3 * step).astype(p.dtype), m2, v2

        return upd, (p, g, m, v)

    for shape, tag in (((NH, 1), "[N,1]"), ((NH,), "[N]")):
        upd, args = make_update(shape)
        t = timeit(lambda *a: upd(*a), *args)
        print(f"adam-like update {tag}: {t * 1e3:.2f} ms", flush=True)

    # 5-gate multi-update (the real per-layer update shape mix).
    for shape, tag in (((NH, 1), "[N,1]x5"), ((NH,), "[N]x5")):
        upds = [make_update(shape) for _ in range(5)]

        def all5():
            outs = [u(*a) for u, a in upds]
            return outs[-1]

        t = timeit(all5)
        print(f"5-gate update chain {tag}: {t * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
