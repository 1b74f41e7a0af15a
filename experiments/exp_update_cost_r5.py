"""Isolate the staged step's 130-180 ms optimizer-update cost (r5 #2).

Builds the EXACT per-stage update jit the staged step uses
(make_optimizer(factor_node_params_above=N) + optax.apply_updates, donated)
on realistic 5-gram-scale parameter pytrees, with no graph involved, and
times: the update alone, the _add_l2_grads step, the const-grad
unpack+reshape, and the full assemble-like chain.

Run on TPU: python experiments/exp_update_cost_r5.py
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
IN_DIM, OUT_DIM = 64, 64


def fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(fn, args_fn, reps=6):
    args = args_fn()
    out = fn(*args)  # compile
    fetch(out)
    ts = []
    for _ in range(reps):
        args = args_fn()  # donation consumes buffers; rebuild each rep
        fetch(args)
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_layer_params(key, node_dtype=jnp.bfloat16):
    ks = jax.random.split(key, 12)
    p = {
        "w_main_in": jax.random.normal(ks[0], (IN_DIM, OUT_DIM), jnp.float32),
        "w_main_out": jax.random.normal(ks[1], (IN_DIM, OUT_DIM), jnp.float32),
        "w_und": jax.random.normal(ks[2], (IN_DIM, OUT_DIM), jnp.float32),
        "w_shared": jax.random.normal(ks[3], (IN_DIM, OUT_DIM), jnp.float32),
    }
    for i, b in enumerate(["b_main_in", "b_main_out", "b_und", "b_shared_in", "b_shared_out", "b_shared_und"]):
        p[b] = jnp.zeros((OUT_DIM,), jnp.float32)
    for i, gname in enumerate(["c_in", "c_out", "c_directed", "c_undirected", "c_all"]):
        p[gname] = jnp.ones((NH, 1), node_dtype)
    p["constant"] = jax.random.normal(ks[4], (NH, OUT_DIM), jnp.float32).astype(node_dtype)
    return {"layers": [p], "res_projs": [None]}


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.PRNGKey(0)
    opt = make_optimizer(1e-3, 0.0, factor_node_params_above=NH)

    params0 = make_layer_params(key)
    state0 = opt.init(params0)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def update(pk, st, g):
        import optax

        updates, st = opt.update(g, st, pk)
        return optax.apply_updates(pk, updates), st

    def args_fn():
        p = make_layer_params(key)
        g = jax.tree_util.tree_map(lambda a: (a * 0.01).astype(a.dtype), p)
        return p, opt.init(p), g

    t = timeit(update, args_fn)
    print(f"update+apply (full layer pytree, adafactor node): {t*1e3:.1f} ms", flush=True)

    # Without node params (dense adam only, tiny weights).
    def strip_nodes(p):
        q = {k: v for k, v in p["layers"][0].items()
             if not k.startswith("c_") and k != "constant"}
        return {"layers": [q], "res_projs": [None]}

    opt_d = make_optimizer(1e-3, 0.0, factor_node_params_above=NH)
    pd = strip_nodes(params0)
    std = opt_d.init(pd)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def update_d(pk, st, g):
        import optax

        updates, st = opt_d.update(g, st, pk)
        return optax.apply_updates(pk, updates), st

    def args_fn_d():
        p = strip_nodes(make_layer_params(key))
        g = jax.tree_util.tree_map(lambda a: (a * 0.01).astype(a.dtype), p)
        return p, opt_d.init(p), g

    t = timeit(update_d, args_fn_d)
    print(f"update+apply (weights only): {t*1e3:.1f} ms", flush=True)

    # Gates-only and constant-only variants.
    def only(keys):
        def mk():
            p0 = make_layer_params(key)["layers"][0]
            q = {k: p0[k] for k in keys}
            return {"layers": [q], "res_projs": [None]}
        return mk

    for tag, keys in (("gates only", ["c_in", "c_out", "c_directed", "c_undirected", "c_all"]),
                      ("constant only", ["constant"])):
        mk = only(keys)
        opt_x = make_optimizer(1e-3, 0.0, factor_node_params_above=NH)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def update_x(pk, st, g, _opt=opt_x):
            import optax

            updates, st = _opt.update(g, st, pk)
            return optax.apply_updates(pk, updates), st

        def args_fn_x(_mk=mk, _opt=opt_x):
            p = _mk()
            g = jax.tree_util.tree_map(lambda a: (a * 0.01).astype(a.dtype), p)
            return p, _opt.init(p), g

        t = timeit(update_x, args_fn_x)
        print(f"update+apply ({tag}): {t*1e3:.1f} ms", flush=True)

    # The const-grad unpack+reshape (assemble_update's relayout).
    from protgram_directgcn_tpu.models.directgcn import unpack_rg_carry

    GP = (G + 1) // 2

    @jax.jit
    def const_from_packed(ds_packed):
        return unpack_rg_carry(ds_packed, OUT_DIM, G).reshape(NH, OUT_DIM)

    def args_ds():
        return (jax.random.normal(key, (A, GP, 128), jnp.float32).astype(jnp.bfloat16),)

    # non-donated: simple repeated timing
    ds = args_ds()[0]
    fetch(ds)
    out = const_from_packed(ds); fetch(out)
    t0 = time.perf_counter()
    for _ in range(6):
        out = const_from_packed(ds)
    fetch(out)
    print(f"const grad unpack+flat reshape: {(time.perf_counter()-t0)/6*1e3:.1f} ms", flush=True)

    # L2-grad add over the full pytree (assemble's _add_l2_grads analogue).
    @jax.jit
    def add_l2(g, p):
        return jax.tree_util.tree_map(
            lambda gg, pp: (gg.astype(jnp.float32) + 2e-7 * pp.astype(jnp.float32)).astype(gg.dtype),
            g, p,
        )

    p = make_layer_params(key)
    g = jax.tree_util.tree_map(lambda a: (a * 0.01).astype(a.dtype), p)
    fetch(p); fetch(g)
    out = add_l2(g, p); fetch(out)
    t0 = time.perf_counter()
    for _ in range(6):
        out = add_l2(g, p)
    fetch(out)
    print(f"_add_l2_grads full pytree: {(time.perf_counter()-t0)/6*1e3:.1f} ms", flush=True)

    # _l2 sum over the pytree.
    @jax.jit
    def l2sum(p):
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(p))

    out = l2sum(p); fetch(out)
    t0 = time.perf_counter()
    for _ in range(6):
        out = l2sum(p)
    fetch(out)
    print(f"_l2 sum full pytree: {(time.perf_counter()-t0)/6*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
