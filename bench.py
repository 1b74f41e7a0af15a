"""Headline benchmark: SpMM fwd+bwd edges/s/chip on a 5-gram protein graph.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- Graph: a real 5-gram DirectGCN propagation matrix (𝒜_out) built by the
  framework's own ETL from synthetic protein-like sequences (motif reuse for
  realistic n-gram statistics); cached to disk after the first run.
- value: edges/s for one propagation forward + backward (2 passes over nnz)
  on the best available format.
- vs_baseline: the honest roofline fraction — achieved HBM bandwidth over
  the *measured achievable* streaming bound of this chip (612 GB/s on this
  v5e; spec 819).  "Achieved bandwidth" is the format's real traffic model
  (`ops.hypercube.hypercube_traffic_bytes`: every stream of the two-kernel
  pipeline, TPU tile padding included) divided by the measured time, so the
  fraction answers "how close is the iteration to the memory-bound optimum
  of its own structure".  A value slightly above 1.0 is possible: the 612
  GB/s bound was measured with a simple single-stream copy, and the kernels'
  large contiguous multi-stream DMAs can beat that microbenchmark slightly.
  Extra keys report the raw ingredients
  (traffic GB/iter, achieved GB/s, the bound, fraction of spec BW) plus a
  same-graph run of the best gather format (ELL) as the comparison line —
  the random-gather hardware bound (~150-220M rows/s at 512B rows, worse at
  the 256B bf16 rows used here; no SparseCore on v5e) is what the
  gather-free hypercube format exists to escape.

Measurement methodology (validated against MXU peak on this host):
- the iteration loop lives INSIDE one jit (lax.scan) — per-dispatch RPC
  overhead on tunneled devices otherwise dominates;
- all arrays are jit ARGUMENTS (closed-over constants are shipped with the
  remote compile request and explode compile time);
- the chain is carry-dependent so XLA cannot hoist the propagation out of
  the loop;
- timing is the slope between two scan lengths with a forced host fetch.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_graph_5gram_v3.npz")


def build_or_load_graph(num_seqs: int, seed: int = 0):
    """Realistic 5-gram propagation matrix + n-gram node keys (cached)."""
    if os.path.exists(_CACHE):
        with np.load(_CACHE) as z:
            keys = (z["pk"], z["sk"], int(z["nk"]))
            codes = (z["codes"], int(z["alpha"]))
            return z["src"], z["tgt"], z["val"], int(z["n"]), keys, codes
    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.graph.transforms import csr_to_coo_arrays
    from protgram_directgcn_tpu.ops.block import ngram_node_keys
    from protgram_directgcn_tpu.ops.hypercube import vocab_char_codes

    rng = np.random.default_rng(seed)
    aa = list("ACDEFGHIKLMNPQRSTVWY")
    motifs = ["".join(rng.choice(aa, 8)) for _ in range(500)]

    def make_seq():
        parts, length = [], 0
        while length < 300:
            m = motifs[rng.integers(0, len(motifs))] if rng.random() < 0.5 else "".join(
                rng.choice(aa, 8)
            )
            parts.append(m)
            length += len(m)
        return "".join(parts)

    seqs = [(f"P{i}", make_seq()) for i in range(num_seqs)]
    builder = NgramGraphBuilder(n_max=5)
    graphs = builder.build_from_sequences(seqs)
    g5 = graphs[4]
    src, tgt, val = csr_to_coo_arrays(g5.mathcal_a_out())
    pk, sk, nk = ngram_node_keys(g5.vocab)
    codes, alpha = vocab_char_codes(g5.vocab)
    np.savez_compressed(
        _CACHE,
        src=src,
        tgt=tgt,
        val=val,
        n=np.int64(g5.num_nodes),
        pk=pk.astype(np.int32),
        sk=sk.astype(np.int32),
        nk=np.int64(nk),
        codes=codes.astype(np.int8),
        alpha=np.int64(alpha),
    )
    return src, tgt, val, g5.num_nodes, keys_tuple(pk, sk, nk), (codes, alpha)


def keys_tuple(pk, sk, nk):
    return (np.asarray(pk), np.asarray(sk), int(nk))


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def slope_time(fn, args, lens=(2, 10), repeats=2):
    """Per-iteration seconds via scan-length slope (min over repeats, forced
    host fetch).  Falls back to the long run's mean if noise swamps the slope."""
    def run(f):
        # Force completion via a DEVICE-side slice then a 4-byte fetch.
        # (np.asarray(out)[:1] would fetch the full [N, F] array over the
        # ~30 MB/s tunnel — tens of seconds of pure transfer noise.)
        return np.asarray(f(*args)[:1, :1])

    fns = {length: fn(length) for length in lens}
    for length in lens:
        t0 = time.perf_counter()
        _ = run(fns[length])  # compile + warm
        _log(f"compile+first L={length}: {time.perf_counter() - t0:.1f}s")
    best = {length: float("inf") for length in lens}
    for _ in range(repeats):
        for length in lens:
            t0 = time.perf_counter()
            _ = run(fns[length])
            best[length] = min(best[length], time.perf_counter() - t0)
    _log(f"timings: {best}")
    per = (best[lens[1]] - best[lens[0]]) / (lens[1] - lens[0])
    if per <= 0:  # noise floor exceeded the slope signal
        per = best[lens[1]] / lens[1]
    return per


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from protgram_directgcn_tpu.ops import spmm

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    feat_dim = 128
    num_seqs = 30_000 if on_tpu else 500

    t0 = time.perf_counter()
    src, tgt, val, n, node_keys, vocab_codes = build_or_load_graph(num_seqs)
    nnz = len(src)
    _log(f"graph ready: n={n} nnz={nnz} ({time.perf_counter() - t0:.1f}s)")
    # Scale weights to keep the chained iteration numerically bounded.
    val = (val / max(1e-9, float(np.abs(val).max()))).astype(np.float32)

    mode = os.environ.get("BENCH_SPMM_MODE", "auto")
    # bf16 is the production precision on TPU (the reference trains under
    # CUDA AMP fp16, reference: protgram_directgcn_trainer.py:88); it halves
    # every HBM stream.  BENCH_DTYPE=f32 measures the full-precision path.
    dtype = jnp.float32 if os.environ.get("BENCH_DTYPE") == "f32" else jnp.bfloat16
    t0 = time.perf_counter()
    adj = spmm.build_adjacency(
        src,
        tgt,
        val,
        n,
        mode=mode,
        feat_dim=feat_dim,
        dtype=dtype,
        node_keys=node_keys,
        vocab_codes=(np.asarray(vocab_codes[0], np.int64), int(vocab_codes[1])),
    )
    _log(f"adjacency format: {type(adj).__name__}")
    jax.block_until_ready(jax.tree_util.tree_leaves(adj))
    _log(f"adjacency built mode={mode} ({time.perf_counter() - t0:.1f}s)")
    # The format defines its node space (the hypercube format pads to A^n)
    # and its feature layout: the hypercube kernels are layout-native over
    # [A, G, F] (rg) features — keeping the carry in that layout avoids a
    # materialized XLA relayout per propagation (see ops/pallas_hyper.py).
    rows = getattr(adj, "n_out", n)
    lead = getattr(adj, "feature_shape", (rows,))
    x = jax.random.normal(
        jax.random.PRNGKey(1), lead + (feat_dim,), dtype=jnp.float32
    ).astype(dtype)

    def make_loop(length):
        @jax.jit
        def loop(a, x0):
            def body(carry, _):
                # Chain: c' = Mᵀ(0.01·Mc + 0.001)·0.01 — the bounding affine
                # rides the kernels' fused epilogue (propagate_affine), so
                # each iteration is exactly fwd + bwd over nnz with zero
                # extra elementwise sweeps.
                c = carry
                out, vjp = jax.vjp(
                    lambda q: spmm.propagate_affine(a, q, 0.01, 0.001), c
                )
                # Non-hypercube formats promote to f32 (w is f32); keep the
                # carry in the bench dtype.
                return vjp(out)[0].astype(c.dtype), None

            out, _ = jax.lax.scan(body, x0, None, length=length)
            return out

        return functools.partial(loop, adj)

    per_iter = slope_time(make_loop, (x,))
    edges_per_s = 2.0 * nnz / per_iter

    # --- Roofline: achieved HBM bandwidth over the measured streaming bound.
    # 612 GB/s is the measured achievable streaming bandwidth of this v5e
    # (spec 819); the CPU fallback number only keeps local runs meaningful.
    bound_bw = 6.12e11 if on_tpu else 5.0e10
    spec_bw = 8.19e11 if on_tpu else 5.0e10
    from protgram_directgcn_tpu.ops import hypercube as _hyper

    extra = {}
    if isinstance(adj, _hyper.HypercubeAdj):
        per_prop = _hyper.hypercube_traffic_bytes(
            adj, feat_dim, jnp.dtype(dtype).itemsize
        )
        bytes_iter = 2.0 * per_prop  # fwd + bwd are the same two-kernel pass
        achieved_bw = bytes_iter / per_iter
        vs_baseline = achieved_bw / bound_bw
        extra = {
            "traffic_gb_per_iter": round(bytes_iter / 1e9, 2),
            "achieved_gbps": round(achieved_bw / 1e9, 1),
            "bound_gbps": round(bound_bw / 1e9, 1),
            "spec_bw_frac": round(achieved_bw / spec_bw, 4),
        }
    else:
        # Generic streaming model: one F-row read+write per edge slot/pass.
        roofline_per_pass = bound_bw / (jnp.dtype(dtype).itemsize * feat_dim)
        vs_baseline = (edges_per_s / 2.0) / roofline_per_pass

    # --- Comparison line: the best gather format on the SAME graph.  The
    # random-gather bound (~150-220M rows/s at 512B rows; no SparseCore on
    # v5e) is what the gather-free hypercube format exists to escape.
    if os.environ.get("BENCH_SKIP_GATHER") != "1" and isinstance(
        adj, _hyper.HypercubeAdj
    ):
        t0 = time.perf_counter()
        # auto (without the n-gram structure keys) picks the best edge-gather
        # format: bucketed ELL here (single-K ELL pads ~5x on the 5-gram
        # degree distribution, mean 5 / max ~24).
        adj_g = spmm.build_adjacency(src, tgt, val, n, mode="auto", feat_dim=feat_dim)
        jax.block_until_ready(jax.tree_util.tree_leaves(adj_g))
        _log(
            f"gather adjacency built: {type(adj_g).__name__} "
            f"({time.perf_counter() - t0:.1f}s)"
        )

        def make_gather_loop(length):
            @jax.jit
            def loop(a, x0):
                def body(carry, _):
                    out, vjp = jax.vjp(
                        lambda q: spmm.propagate_affine(a, q, 0.01, 0.001), carry
                    )
                    return vjp(out)[0].astype(x0.dtype), None

                out, _ = jax.lax.scan(body, x0, None, length=length)
                return out

            return functools.partial(loop, adj_g)

        xg = jax.random.normal(
            jax.random.PRNGKey(1), (n, feat_dim), dtype=jnp.float32
        ).astype(dtype)
        per_iter_g = slope_time(make_gather_loop, (xg,))
        extra["gather_edges_per_s"] = round(2.0 * nnz / per_iter_g, 1)
        extra["gather_format"] = type(adj_g).__name__
        extra["speedup_vs_gather"] = round(per_iter_g / per_iter, 2)

    print(
        json.dumps(
            {
                "metric": "spmm_fwdbwd_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": (
                    f"edges/s (5-gram n={n}, nnz={nnz}, F={feat_dim}, "
                    f"{jnp.dtype(dtype).name}, {dev.platform})"
                ),
                "vs_baseline": round(vs_baseline, 4),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
