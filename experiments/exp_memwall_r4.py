"""Round-4 staged-step optimization: profile and cut the 5.06 s/step deep
4-layer 5-gram train step (VERDICT r3 next-step #2).

Phases (real TPU; writes experiments/MEMWALL_r04.json):
  profile — per-stage wall-time breakdown of the r3-configuration staged step
            (PROTGRAM_STAGE_TIMING): where the 5.06 s goes — stage compute
            vs the ~25 ms tunnel fetch per sync.
  opt     — the optimized step (reduced sync set, saved per-path activations,
            fused small-layer backward — whatever the profile justifies),
            same stack, multi-step with decreasing losses.

Run: python experiments/exp_memwall_r4.py [profile|opt|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ.setdefault("PROTGRAM_STAGE_TIMING", "1")

RESULTS_PATH = "/root/repo/experiments/MEMWALL_r04.json"
RESULTS = {}
if os.path.exists(RESULTS_PATH):
    with open(RESULTS_PATH) as f:
        RESULTS = json.load(f)


def log(m):
    print(f"[exp] {m}", file=sys.stderr, flush=True)


def build_graph(jnp):
    from bench import build_or_load_graph
    from protgram_directgcn_tpu.graph.structure import DeviceGraph
    from protgram_directgcn_tpu.ops.hypercube import build_hypercube

    src, tgt, val, n, _, (codes, alpha) = build_or_load_graph(30_000)
    val = (val / max(1e-9, float(np.abs(val).max()))).astype(np.float32)
    log(f"graph: n={n} nnz={len(src)}")
    RESULTS["graph"] = {"nodes": int(n), "nnz": int(len(src))}

    def hyper():
        return build_hypercube(
            src, tgt, val, np.asarray(codes, np.int64), int(alpha),
            weights_dtype=jnp.bfloat16, bank_layouts="pk",
            max_block_bytes=4 << 30,
        )

    import jax

    t0 = time.perf_counter()
    p_in, p_out, p_und = hyper(), hyper(), hyper()
    dg = DeviceGraph(p_in=p_in, p_out=p_out, p_und=p_und,
                     num_nodes=p_in.n_out, node_map=p_in.node_map)
    jax.block_until_ready(jax.tree_util.tree_leaves(dg))
    log(f"3x pk-bank hypercube ops built ({time.perf_counter() - t0:.1f}s)")
    return dg


def make_step_inputs(jax, jnp, dg, layer_dims=(128, 128, 64, 64, 32)):
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig,
        init_directgcn_params,
    )
    from protgram_directgcn_tpu.pipeline.trainer import (
        make_optimizer,
        make_train_step_staged,
    )

    nh = dg.num_nodes
    a_dim, g_dim = dg.p_in.d.shape
    cfg = DirectGCNConfig(
        layer_dims=layer_dims, num_nodes=nh, num_classes=32,
        n_gram_len=5, one_gram_dim=0, max_pe_len=0, compute_dtype="bfloat16",
        node_param_dtype="bfloat16", remat=True, remat_paths=True,
    )
    params = init_directgcn_params(jax.random.PRNGKey(1), cfg)
    split = list(range(1, len(layer_dims)))
    step = make_train_step_staged(
        cfg, lambda: make_optimizer(1e-3, 0.0, factor_node_params_above=nh),
        1e-7, split=split,
    )
    opt_state = step.init_opt_state(params)
    x = jax.random.normal(
        jax.random.PRNGKey(2), (a_dim, g_dim, layer_dims[0]), jnp.float32
    ).astype(jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(7), (nh,), 0, 32, jnp.int32)
    mask = jnp.ones((nh,), jnp.float32)
    return step, params, opt_state, (x, y, mask)


def run_steps(jax, jnp, step, params, opt_state, dg, inputs, epochs, tag):
    x, y, mask = inputs
    times, losses = [], []
    for it in range(epochs):
        t0 = time.perf_counter()
        params, opt_state, loss, primary = step(
            params, opt_state, dg, x, y, mask, jnp.float32(1.0),
            jax.random.PRNGKey(3 + it), None,
        )
        lv = float(np.asarray(jax.device_get(primary)))
        dt = time.perf_counter() - t0
        times.append(dt)
        losses.append(lv)
        log(f"{tag}: step {it}: {dt:.2f}s loss {lv:.4f}")
        assert np.isfinite(lv), lv
    return times, losses


def phase_profile():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    dg = build_graph(jnp)
    step, params, opt_state, inputs = make_step_inputs(jax, jnp, dg)
    times, losses = run_steps(jax, jnp, step, params, opt_state, dg, inputs, 4,
                              "profile")
    # Per-tag means over the steady steps (drop the compile-laden first).
    breakdown = {}
    for tag, samples in step.stage_times.items():
        steady = samples[1:] if len(samples) > 1 else samples
        breakdown[tag] = {
            "n": len(steady),
            "mean_stage_s": float(np.mean([s[0] for s in steady])),
            "mean_fetch_s": float(np.mean([s[1] for s in steady])),
        }
    total = sum(b["mean_stage_s"] * 1 for b in breakdown.values())
    RESULTS["profile"] = {
        "layer_dims": [128, 128, 64, 64, 32],
        "step_times_s": [round(t, 3) for t in times],
        "losses": [round(v, 4) for v in losses],
        "per_stage": breakdown,
        "sum_of_stage_means_s": round(total, 3),
        "n_syncs": len(breakdown),
    }
    with open(RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    for tag, b in sorted(breakdown.items(), key=lambda kv: -kv[1]["mean_stage_s"]):
        log(f"  {tag:16s} {b['mean_stage_s']*1000:7.1f} ms (fetch {b['mean_fetch_s']*1000:6.1f} ms)")
    log(f"sum of stage means: {total:.3f}s over {len(breakdown)} syncs")


def phase_opt():
    """Production-mode timing: no PROTGRAM_STAGE_TIMING, so the big=False
    optimizer-update syncs are skipped (each costs a ~25 ms tunnel RTT)."""
    # The flag is read at step-BUILD time (make_train_step_staged factory
    # scope), so popping it before building is sufficient.
    os.environ.pop("PROTGRAM_STAGE_TIMING", None)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    dg = build_graph(jnp)
    step, params, opt_state, inputs = make_step_inputs(jax, jnp, dg)
    times, losses = run_steps(jax, jnp, step, params, opt_state, dg, inputs, 6,
                              "opt")
    steady = sorted(times[1:])
    RESULTS["opt"] = {
        "layer_dims": [128, 128, 64, 64, 32],
        "step_times_s": [round(t, 3) for t in times],
        "median_steady_s": round(steady[len(steady) // 2], 3),
        "losses": [round(v, 4) for v in losses],
        "r3_baseline_s": 5.06,
    }
    with open(RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"opt median steady step: {RESULTS['opt']['median_steady_s']}s (r3: 5.06s)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "profile"
    if which in ("profile", "all"):
        phase_profile()
    if which in ("opt", "all"):
        phase_opt()
