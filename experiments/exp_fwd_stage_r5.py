"""Decompose the ~280 ms forward-sweep stage (r5 #2).

Times, at 5-gram scale on TPU, the stage_fwd ingredients separately:
  - bernoulli dropout mask + where on [A, G, 128]   (PRNG cost suspect)
  - projection matmul [A,G,64] @ [64,128]
  - pack/unpack retile kernels
  - leaky_relu + residual-ish elementwise chain
  - a full synthetic stage (all of the above minus propagation)

Run: python experiments/exp_fwd_stage_r5.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

A, G = 21, 194_481
GP = (G + 1) // 2


def fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(fn, *args, reps=6):
    out = fn(*args); fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (A, G, 128), jnp.bfloat16)
    xp = jax.random.normal(key, (A, GP, 128), jnp.bfloat16)
    w = jax.random.normal(key, (64, 128), jnp.float32)

    @jax.jit
    def bern(k, y):
        mask = jax.random.bernoulli(k, 0.5, y.shape)
        return jnp.where(mask, y * 2.0, 0.0)

    print(f"bernoulli+where [A,G,128]: {timeit(bern, key, x)*1e3:.1f} ms", flush=True)

    @jax.jit
    def bern_packed(k, y):
        mask = jax.random.bernoulli(k, 0.5, y.shape)
        return jnp.where(mask, y * 2.0, 0.0)

    print(f"bernoulli+where [A,GP,128] packed: {timeit(bern_packed, key, xp)*1e3:.1f} ms", flush=True)

    # uniform-based mask (cheaper than bernoulli? same path) and rng impl note
    @jax.jit
    def uni(k, y):
        u = jax.random.uniform(k, y.shape, jnp.bfloat16)
        return jnp.where(u < 0.5, y * 2.0, 0.0)

    print(f"uniform-bf16 mask [A,G,128]: {timeit(uni, key, x)*1e3:.1f} ms", flush=True)

    x64 = jax.random.normal(key, (A, G, 64), jnp.bfloat16)

    @jax.jit
    def proj(xv, wv):
        return xv @ wv.astype(xv.dtype)

    print(f"projection [A,G,64]@[64,128]: {timeit(proj, x64, w)*1e3:.1f} ms", flush=True)

    from protgram_directgcn_tpu.ops.pallas_retile import pack_rg_pallas, unpack_pad_rg_pallas

    @jax.jit
    def unpack(t):
        return unpack_pad_rg_pallas(t, 64)

    xpadg = jax.random.normal(key, (A, G + 1, 128), jnp.bfloat16)

    @jax.jit
    def pack(t):
        return pack_rg_pallas(t, 64)

    print(f"unpack_pad Pallas: {timeit(unpack, xp)*1e3:.1f} ms", flush=True)
    print(f"pack Pallas: {timeit(pack, xpadg)*1e3:.1f} ms", flush=True)

    @jax.jit
    def elem_chain(a, b):
        s = jax.nn.leaky_relu(a + b, negative_slope=0.01)
        return s.astype(jnp.bfloat16)

    print(f"leaky+add [A,G,128]: {timeit(elem_chain, x, x)*1e3:.1f} ms", flush=True)

    # gate multiply-accumulate chain with barriers (3 contributions)
    g5 = [jnp.ones((A * G, 1), jnp.bfloat16) for _ in range(5)]

    @jax.jit
    def gated_acc(ci, co, cd, cu, ca, y):
        acc = None
        for gate in ((cd * ca * ci), (cd * ca * co), (cu * ca)):
            contrib = gate.reshape(A, G, 1).astype(y.dtype) * (y + 0.1)
            acc = contrib if acc is None else acc + contrib
            y, acc = jax.lax.optimization_barrier((y, acc))
        return acc

    print(f"3x gated-acc w/ barriers: {timeit(gated_acc, *g5, x)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
