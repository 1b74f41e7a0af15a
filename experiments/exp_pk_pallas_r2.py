"""Round-2: validate the FULL pk-bank Pallas propagation at PRODUCTION
block sizes on the real TPU.

History: exp_packed_k2.py's pk K2 failed to compile at gt=256 (scoped-VMEM
16.48M vs the 16M limit — 3% over), so pk-mode graphs were routed to the
XLA einsum path.  But the production dispatcher (_pick_gt, blocks=5,
f_tile=128, bf16) picks gt2=128 — half the failing block.  If the kernels
compile there, pk graphs get the Pallas path back: compact 1 GB resident
banks AND kernel-internal transients (the einsum path materialises a
~1.1 GB g-major bank relayout + a ~1.1 GB x relayout per call — the
remaining memory-wall driver at 5-gram training scale).

Measures (slope-timed): fwd+bwd pk Pallas propagate vs the einsum path on
the cached 5-gram bench graph, plus a correctness check vs einsum.

Run: python experiments/exp_pk_pallas_r2.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(m):
    print(f"[exp] {m}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from bench import build_or_load_graph, slope_time
    from protgram_directgcn_tpu.ops.hypercube import build_hypercube
    from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

    src, tgt, val, n, _, (codes, alpha) = build_or_load_graph(30_000)
    val = (val / max(1e-9, float(np.abs(val).max()))).astype(np.float32)
    adj = build_hypercube(
        src, tgt, val, np.asarray(codes, np.int64), int(alpha),
        weights_dtype=jnp.bfloat16, bank_layouts="pk", max_block_bytes=4 << 30,
    )
    a_dim, g_dim = adj.d.shape
    log(f"pk banks built: a={a_dim} g={g_dim}")

    x = jax.random.normal(
        jax.random.PRNGKey(0), (a_dim, g_dim, 128), jnp.float32
    ).astype(jnp.bfloat16)

    # --- compile + correctness: pk Pallas vs pk einsum -------------------
    pk_pallas = jax.jit(
        functools.partial(apply_hyper_pallas, w_layout="pk", scale=0.01, shift=0.001)
    )
    try:
        got = np.asarray(
            pk_pallas(adj.d, adj.wf_rs, adj.wb_rs, x)[:, :256].astype(jnp.float32),
            np.float64,
        )
    except Exception as e:
        log(f"pk pallas FAILED at production blocks: {type(e).__name__}: {e}")
        raise SystemExit(1)
    log("pk pallas compiled + ran at production block sizes")

    os.environ["PROTGRAM_HYPER_PALLAS"] = "off"
    from protgram_directgcn_tpu.ops import spmm

    want = np.asarray(
        jax.jit(lambda a_, q: spmm.propagate_affine(a_, q, 0.01, 0.001))(adj, x)[
            :, :256
        ].astype(jnp.float32),
        np.float64,
    )
    os.environ["PROTGRAM_HYPER_PALLAS"] = "auto"
    err = np.abs(got - want).max() / max(1e-9, np.abs(want).max())
    log(f"pk pallas vs pk einsum rel err {err:.3e}")
    assert err < 2e-2, err

    # --- fwd+bwd slope timing: pallas vs einsum --------------------------
    nnz = len(src)

    def make_loop(use_pallas, length):
        # The production operator (custom-vjp; the raw pallas_call has no
        # reverse-mode rule).  PROTGRAM_HYPER_PALLAS picks the route at
        # trace time.  adj rides as a jit ARGUMENT — closed-over banks ship
        # as constants with the remote compile request (HTTP 413).
        @jax.jit
        def loop(a_, x0):
            def body(c, _):
                out, vjp = jax.vjp(
                    lambda q: spmm.propagate_affine(a_, q, 0.01, 0.001), c
                )
                return vjp(out)[0].astype(c.dtype), None

            out, _ = jax.lax.scan(body, x0, None, length=length)
            return out

        return functools.partial(loop, adj)

    for name, use_pallas in (("pk_pallas", True), ("pk_einsum", False)):
        os.environ["PROTGRAM_HYPER_PALLAS"] = "on" if use_pallas else "off"
        t0 = time.perf_counter()
        per_iter = slope_time(lambda L: make_loop(use_pallas, L), (x,))
        os.environ["PROTGRAM_HYPER_PALLAS"] = "auto"
        log(
            f"{name}: {per_iter * 1e3:.2f} ms/iter fwd+bwd = "
            f"{2.0 * nnz / per_iter / 1e6:.0f}M edges/s  (wall {time.perf_counter() - t0:.0f}s)"
        )


if __name__ == "__main__":
    main()
