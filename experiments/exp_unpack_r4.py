"""Round-4: the lane-split unpack (unpack_rg_carry) costs ~130 ms/call at
5-gram scale (stage-delta evidence: update2 199 ms vs update0 71 ms differ
by exactly one unpack; the saved-y tails carry three).  Measure the current
reshape against alternative formulations ON TPU and pick the fastest.

Patterns measured (packed [21, 97241, 128] bf16 -> logical [21, 194481, 64]):
  reshape   — current: t.reshape(a, 2gp, 64)[:, :g]          (lane SPLIT)
  slices    — lane-slice halves + stack + sublane-merge reshape
  consume   — unpack fused straight into an f32 sum (does XLA save us?)
  packedsum — the packed-native equivalent of the same reduction (floor)
  pack      — the reverse direction (current pack_rg_carry) for reference

Run: python experiments/exp_unpack_r4.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

A, G, F = 21, 194481, 64
K = 128 // F
GP = -(-G // K)


def timeit(fn, x, iters=8):
    r = fn(x)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1]))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((A, GP, 128)).astype(np.float32)).astype(jnp.bfloat16)
    results = {}

    @jax.jit
    def unpack_reshape(t):
        return t.reshape(A, GP * K, F)[:, :G, :] * jnp.bfloat16(1.0001)

    @jax.jit
    def unpack_slices(t):
        lo = t[:, :, :F]
        hi = t[:, :, F:]
        u = jnp.stack([lo, hi], axis=2).reshape(A, GP * K, F)[:, :G, :]
        return u * jnp.bfloat16(1.0001)

    @jax.jit
    def unpack_concat_sub(t):
        # interleave via sublane concat: [A, GP, 128] -> two [A, GP, F]
        # halves -> [A, 2GP, F] with even/odd interleaving via axis-1 stack.
        lo = t[:, :, :F]
        hi = t[:, :, F:]
        u = jnp.concatenate([lo[:, :, None, :], hi[:, :, None, :]], axis=2)
        return u.reshape(A, GP * K, F)[:, :G, :] * jnp.bfloat16(1.0001)

    @jax.jit
    def consume_sum(t):
        u = t.reshape(A, GP * K, F)[:, :G, :]
        return jnp.sum(u.astype(jnp.float32), axis=(0, 1))

    @jax.jit
    def consume_sum_slices(t):
        lo = t[:, :, :F].astype(jnp.float32)
        hi = t[:, :, F:].astype(jnp.float32)
        return jnp.sum(lo, axis=(0, 1)) + jnp.sum(hi, axis=(0, 1))

    @jax.jit
    def packed_sum(t):
        return jnp.sum(t.astype(jnp.float32), axis=(0, 1))

    @jax.jit
    def do_pack(u):
        return (u * jnp.bfloat16(1.0001)).reshape(A, GP, 128)

    results["unpack_reshape_ms"] = timeit(unpack_reshape, xp) * 1e3
    results["unpack_slices_ms"] = timeit(unpack_slices, xp) * 1e3
    results["unpack_concat_ms"] = timeit(unpack_concat_sub, xp) * 1e3
    results["consume_sum_ms"] = timeit(consume_sum, xp) * 1e3
    results["consume_sum_slices_ms"] = timeit(consume_sum_slices, xp) * 1e3
    results["packed_sum_ms"] = timeit(packed_sum, xp) * 1e3

    up = jnp.asarray(rng.standard_normal((A, GP * K, F)).astype(np.float32)).astype(jnp.bfloat16)
    results["pack_ms"] = timeit(do_pack, up) * 1e3

    # Correctness of the slice formulations vs the reshape.
    a = np.asarray(unpack_reshape(xp).astype(jnp.float32))
    b = np.asarray(unpack_slices(xp).astype(jnp.float32))
    c = np.asarray(unpack_concat_sub(xp).astype(jnp.float32))
    assert np.array_equal(a, b) and np.array_equal(a, c)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=1))
    with open("/root/repo/experiments/UNPACK_r04.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
