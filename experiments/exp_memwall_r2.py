"""Round-2 memory-wall experiment: 4-layer (128,128,64,64,32) DirectGCN
full-batch train step at 5-gram scale on one v5e chip.

Round-1 state (CLAUDE.md): (128->64)+remat OOMed (~20 GB).  Two causes:
  1. sub-128 feature dims forced the kernels' materialized gc view
     ((·,21,·) sublane padding, 1.5x) and non-split K2 — fixed in
     production by kernel-boundary feature padding (ops/hypercube.py
     _hyper_apply pads F to the 128-lane multiple the HBM tiles already
     occupy);
  2. per-node params dominate: constants sum(out_dims)·A^5 f32 = ~4.7 GB +
     ~9.4 GB Adam moments + 6.3 GB rs banks > 16 GB regardless of
     activations — addressed by node_param_dtype="bfloat16" (params AND
     moments; per-node gains applied to bf16 activations lose nothing).

This script measures, on the real TPU:
  A. f=64 propagation correctness: padded-kernel path vs einsum oracle.
  B. the 4-layer full-batch train step (bf16 compute, bf16 node params,
     remat) on the cached 5-gram bench graph — step time via scan slope.

Run: python experiments/exp_memwall_r2.py         (TPU)
"""

from __future__ import annotations

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

    from bench import build_or_load_graph
    from protgram_directgcn_tpu.graph.structure import DeviceGraph
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig,
        init_directgcn_params,
    )
    from protgram_directgcn_tpu.ops import spmm
    from protgram_directgcn_tpu.ops.hypercube import build_hypercube
    from protgram_directgcn_tpu.pipeline.trainer import make_optimizer, make_train_step

    src, tgt, val, n, _, (codes, alpha) = build_or_load_graph(30_000)
    val = (val / max(1e-9, float(np.abs(val).max()))).astype(np.float32)
    log(f"graph: n={n} nnz={len(src)}")

    # Three operators from the same matrix (memory- and layout-identical to
    # the real p_in/p_out/p_und triple; values don't matter for OOM/timing).
    # pk banks: what the trainer's residency-aware budget picks for this
    # config (params 2.5G + Adam moments 5G + remat saves ~6G leave < 2 GB
    # for banks; r-major banks are 6x1 GB lane-padded AND get copied by XLA
    # at the Pallas call sites inside the remat transpose — the measured
    # 24.6 GB OOM of the rs variant of this experiment).
    def hyper():
        return build_hypercube(
            src, tgt, val, np.asarray(codes, np.int64), int(alpha),
            weights_dtype=jnp.bfloat16, bank_layouts="pk", max_block_bytes=4 << 30,
        )

    t0 = time.perf_counter()
    p_in, p_out, p_und = hyper(), hyper(), hyper()
    dg = DeviceGraph(p_in=p_in, p_out=p_out, p_und=p_und,
                     num_nodes=p_in.n_out, node_map=p_in.node_map)
    jax.block_until_ready(jax.tree_util.tree_leaves(dg))
    log(f"3x pk-bank hypercube ops built ({time.perf_counter() - t0:.1f}s)")
    nh = dg.num_nodes
    a_dim, g_dim = p_in.d.shape

    # --- A: f=64 correctness — rs Pallas padded kernel vs rs einsum vs the
    # pk einsum path phase B trains through (one temporary rs operator).
    # SKIP_A=1 skips it when iterating on phase B (last full run: both
    # comparisons rel err 0.000e+00).
    if os.environ.get("SKIP_A") == "1":
        return _phase_b(jax, jnp, dg, nh, a_dim, g_dim)
    rs_op = build_hypercube(
        src, tgt, val, np.asarray(codes, np.int64), int(alpha),
        weights_dtype=jnp.bfloat16, bank_layouts="rs", max_block_bytes=4 << 30,
    )
    x64 = jax.random.normal(jax.random.PRNGKey(0), (a_dim, g_dim, 64)).astype(jnp.bfloat16)

    @jax.jit
    def prop64(adj, x):
        return spmm.propagate(adj, x)

    got = np.asarray(prop64(rs_op, x64)[:, :256].astype(jnp.float32), np.float64)
    os.environ["PROTGRAM_HYPER_PALLAS"] = "off"
    want = np.asarray(
        jax.jit(lambda adj, x: spmm.propagate(adj, x))(rs_op, x64)[:, :256].astype(jnp.float32),
        np.float64,
    )
    os.environ["PROTGRAM_HYPER_PALLAS"] = "auto"
    err = np.abs(got - want).max() / max(1e-9, np.abs(want).max())
    log(f"A: f=64 padded kernel vs einsum rel err {err:.3e}")
    assert err < 2e-2, err
    del rs_op
    got_pk = np.asarray(prop64(p_in, x64)[:, :256].astype(jnp.float32), np.float64)
    err = np.abs(got_pk - want).max() / max(1e-9, np.abs(want).max())
    log(f"A: f=64 pk einsum vs rs einsum rel err {err:.3e}")
    assert err < 2e-2, err
    _phase_b(jax, jnp, dg, nh, a_dim, g_dim)


def _phase_b(jax, jnp, dg, nh, a_dim, g_dim):
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig,
        init_directgcn_params,
    )
    from protgram_directgcn_tpu.pipeline.trainer import make_optimizer, make_train_step

    # --- B: 4-layer full-batch train step --------------------------------
    layer_dims = (128, 128, 64, 64, 32)
    cfg = DirectGCNConfig(
        layer_dims=layer_dims, num_nodes=nh, num_classes=32, n_gram_len=5,
        one_gram_dim=0, max_pe_len=0, compute_dtype="bfloat16",
        node_param_dtype="bfloat16", remat=True,
    )
    params = init_directgcn_params(jax.random.PRNGKey(1), cfg)
    # Factored second moments for the per-node tables — what the trainer's
    # node_param_factored="auto" picks at this scale (full Adam moments are
    # ~5 GB of the 15.75 GB chip).
    opt = make_optimizer(1e-3, 0.0, factor_node_params_above=nh)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, 1e-7)
    param_bytes = sum(
        a.nbytes for a in jax.tree_util.tree_leaves(params) if hasattr(a, "nbytes")
    )
    log(f"B: params {param_bytes / 1e9:.2f} GB (node_param_dtype=bf16)")

    # bf16 features in the kernel-native rg layout (a flat input would cost
    # a materialised ~1 GB relayout copy inside every step).
    x = jax.random.normal(
        jax.random.PRNGKey(2), (a_dim, g_dim, 128), jnp.float32
    ).astype(jnp.bfloat16)
    y = jnp.zeros((nh,), jnp.int32)
    mask = jnp.ones((nh,), jnp.float32)

    opts = {}
    if os.environ.get("LHS_OFF") == "1":
        # The latency-hiding scheduler overlaps the three matrices' DMA
        # chains — peak liveness grows with the overlap.  TPU-only flags
        # can't go through XLA_FLAGS here (the local CPU XLA rejects
        # unknown flags); per-compile compiler options are forwarded.
        opts["xla_tpu_enable_latency_hiding_scheduler"] = "false"
    if opts:
        lowered = step.lower(
            params, opt_state, dg, x, y, mask, jnp.float32(1.0),
            jax.random.PRNGKey(3), None,
        )
        step = lowered.compile(compiler_options=opts)
        log(f"B: compiled with {opts}")

    times = []
    for it in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss, _ = step(
            params, opt_state, dg, x, y, mask, jnp.float32(1.0),
            jax.random.PRNGKey(3 + it), None,
        )
        lv = float(np.asarray(jax.device_get(loss)))
        dt = time.perf_counter() - t0
        times.append(dt)
        log(f"B: step {it}: {dt:.2f}s loss {lv:.4f}")
        assert np.isfinite(lv), lv
    log(f"B: 4-layer (128,128,64,64,32) full-batch step at 5-gram scale OK; "
        f"steady step {min(times[1:]):.2f}s")


if __name__ == "__main__":
    main()
