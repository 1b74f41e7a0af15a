"""Headline benchmark: SpMM fwd+bwd edges/s/chip on a 5-gram-scale graph.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = edges processed per second (forward + backward counted as two
               passes over nnz) for the DirectGCN propagation operator.
vs_baseline  = achieved edges/s divided by the single-chip HBM roofline
               (each edge slot must move one F-wide f32 feature row:
               roofline = BW / (4*F) edges/s; target >= 0.8).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from protgram_directgcn_tpu.ops import spmm

    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon") or "TPU" in str(jax.devices()[0])

    # 5-gram-scale synthetic transition graph: bounded out-degree (n-gram
    # successor structure), ~500k nodes (Swiss-Prot-subset 5-gram vocab scale).
    if on_tpu:
        n, deg, f, iters = 500_000, 20, 128, 20
    else:  # CPU smoke fallback
        n, deg, f, iters = 20_000, 10, 64, 3

    rng = np.random.default_rng(0)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    tgt = rng.integers(0, n, n * deg)
    pairs, counts = np.unique(np.stack([src, tgt], 1), axis=0, return_counts=True)
    s = pairs[:, 0].astype(np.int32)
    t = pairs[:, 1].astype(np.int32)
    w = counts.astype(np.float32)
    nnz = len(s)

    adj = spmm.build_adjacency(s, t, w, n, mode="ell", feat_dim=f)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, f), dtype=jnp.float32)

    fwdbwd = jax.jit(jax.grad(lambda xv: spmm.propagate(adj, xv).sum()))
    fwdbwd(x).block_until_ready()  # compile

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwdbwd(x)
        out.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)

    edges_per_s = 2.0 * nnz / best  # fwd + bwd passes

    # Roofline: one f32 feature row (4*F bytes) moved per edge slot per pass.
    hbm_bw = 819e9 if on_tpu else 50e9  # v5e ~819 GB/s
    roofline = hbm_bw / (4.0 * f)
    vs_baseline = edges_per_s / 2.0 / roofline  # per-pass fraction of roofline

    print(
        json.dumps(
            {
                "metric": "spmm_fwdbwd_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": f"edges/s (n={n}, nnz={nnz}, F={f}, {platform})",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
