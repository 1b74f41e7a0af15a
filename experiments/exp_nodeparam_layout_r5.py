"""Confirm the rg-native node-param layout wins before implementing (r5 #2).

Measures, at 5-gram scale on TPU:
  a. const-add path: [N,64] reshape->[A,G,64]+pad+add  vs  [A,G,64] pad+add
  b. adafactor update: 5 gates as [N,1]  vs  [A,G]
  c. adafactor update: constant as [N,64]  vs  [A,G,64]
  d. gate-products sweep with [A,G] gates

Run: python experiments/exp_nodeparam_layout_r5.py
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from protgram_directgcn_tpu.pipeline.trainer import make_optimizer

A, G = 21, 194_481
NH = A * G
OUT = 64


def fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit_nodonate(fn, *args, reps=6):
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps


def timeit_donate(fn, args_fn, reps=5):
    args = args_fn()
    out = fn(*args); fetch(out)
    ts = []
    for _ in range(reps):
        args = args_fn()
        fetch(args)
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    key = jax.random.PRNGKey(0)
    acc = jax.random.normal(key, (A, G, 128), jnp.bfloat16)

    # (a) const-add inside a jit
    c_flat = jax.random.normal(key, (NH, OUT), jnp.float32).astype(jnp.bfloat16)
    c_rg = jnp.asarray(np.asarray(c_flat).reshape(A, G, OUT))

    @jax.jit
    def add_flat(acc, c):
        cp = jnp.pad(c.reshape(A, G, OUT), ((0, 0), (0, 0), (0, 128 - OUT)))
        return acc + cp

    @jax.jit
    def add_rg(acc, c):
        cp = jnp.pad(c, ((0, 0), (0, 0), (0, 128 - OUT)))
        return acc + cp

    print(f"const add [N,64]->rg: {timeit_nodonate(add_flat, acc, c_flat)*1e3:.1f} ms", flush=True)
    print(f"const add [A,G,64]  : {timeit_nodonate(add_rg, acc, c_rg)*1e3:.1f} ms", flush=True)

    # inverse: rg grad -> [N,64] (assemble's current relayout, no unpack)
    g_rg = jax.random.normal(key, (A, G, OUT), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def to_flat(g):
        return g.reshape(NH, OUT) * 1.000001

    print(f"grad rg->[N,64] reshape: {timeit_nodonate(to_flat, g_rg)*1e3:.1f} ms", flush=True)

    # (b)+(c) optimizer updates under the real factory
    def upd_bench(tag, tree_fn, label_n=NH):
        # label_n=A makes the rg-shaped variants label as "node" (adafactor)
        # too, so both layouts run the SAME transform.
        opt = make_optimizer(1e-3, 0.0, factor_node_params_above=label_n)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def update(pk, st, g):
            import optax

            updates, st = opt.update(g, st, pk)
            return optax.apply_updates(pk, updates), st

        def args_fn():
            p = tree_fn()
            g = jax.tree_util.tree_map(lambda a: (a * 0.01).astype(a.dtype), p)
            return p, opt.init(p), g

        print(f"update {tag}: {timeit_donate(update, args_fn)*1e3:.1f} ms", flush=True)

    gates2d = lambda: {"layers": [{k: jnp.ones((NH, 1), jnp.bfloat16)
                                   for k in ("c_in", "c_out", "c_directed", "c_undirected", "c_all")}],
                       "res_projs": [None]}
    gates_rg = lambda: {"layers": [{k: jnp.ones((A, G), jnp.bfloat16)
                                    for k in ("c_in", "c_out", "c_directed", "c_undirected", "c_all")}],
                        "res_projs": [None]}
    const2d = lambda: {"layers": [{"constant": jnp.ones((NH, OUT), jnp.bfloat16)}], "res_projs": [None]}
    const_rg3 = lambda: {"layers": [{"constant": jnp.ones((A, G, OUT), jnp.bfloat16)}], "res_projs": [None]}

    upd_bench("gates [N,1]x5", gates2d)
    upd_bench("gates [A,G]x5", gates_rg, label_n=A)
    upd_bench("constant [N,64]", const2d)
    upd_bench("constant [A,G,64]", const_rg3, label_n=A)

    # (d) gate-product sweep from [A,G] gates
    y = jax.random.normal(key, (A, G, 128), jnp.bfloat16)
    gs = [jnp.ones((A, G), jnp.bfloat16) for _ in range(3)]

    @jax.jit
    def prod_rg(cd, ca, ci, y):
        gi = (cd.astype(jnp.float32) * ca.astype(jnp.float32) * ci.astype(jnp.float32))
        return gi[..., None].astype(y.dtype) * y

    print(f"gate-product [A,G]: {timeit_nodonate(prod_rg, *gs, y)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
