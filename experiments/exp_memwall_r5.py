"""Round-5 staged-step optimization (VERDICT r4 #2 + #8).

Changes measured vs r4's 3.30 s/step:
  - rg-native constant storage ([A,G,out]; kills the ~40-45 ms
    [N,out]<->[A,G,out] relayout per forward const-add and per update)
  - "lean" sync mode (drops the droppable inter-stage host syncs; each is a
    ~20-25 ms tunnel RTT of device idle)

Phases (each a fresh process run because sync mode is read at step build):
  profile — PROTGRAM_STAGE_TIMING per-stage breakdown + the per-stage HBM
            traffic model (#8): modeled bytes / measured seconds vs the
            612 GB/s measured streaming bound.
  opt     — production timing, default syncs.
  lean    — production timing, PROTGRAM_STAGE_SYNC=lean.

Run: python experiments/exp_memwall_r5.py [profile|opt|lean|all]
Writes experiments/MEMWALL_r05.json (merging phases).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS_PATH = "/root/repo/experiments/MEMWALL_r05.json"
RESULTS = {}
if os.path.exists(RESULTS_PATH):
    with open(RESULTS_PATH) as f:
        RESULTS = json.load(f)

LAYER_DIMS = (128, 128, 64, 64, 32)
BOUND_GBPS = 612.0


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


def make_step_inputs(jax, jnp, dg, layer_dims=LAYER_DIMS):
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig,
        init_directgcn_params,
    )
    from protgram_directgcn_tpu.pipeline.trainer import (
        _node_params_to_rg,
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
    params = _node_params_to_rg(params, dg)  # r5: rg-native constants
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


# ---------------------------------------------------------------------------
# Per-stage HBM traffic model (#8): modeled bytes per stage tag.
# ---------------------------------------------------------------------------


def stage_traffic_model(dg, layer_dims):
    """Bytes each staged-step program moves, from the kernel structure
    (ops/hypercube.hypercube_traffic_bytes for propagations; tile-padded
    sweeps for the elementwise/relayout parts)."""
    from protgram_directgcn_tpu.ops.hypercube import (
        _tile_padded_bytes,
        hypercube_traffic_bytes,
    )

    a, g = dg.p_in.d.shape

    def fpad(f):
        return -(-f // 128) * 128

    def rg_bytes(f):  # tile-padded [A, G, f] bf16
        return _tile_padded_bytes((a, g, f), 2)

    def packed_bytes(f):  # [A, ceil(G/(128/f)), 128] bf16 (logical size)
        k = 128 // f if (f < 128 and 128 % f == 0) else 1
        return _tile_padded_bytes((a, -(-g // k), 128), 2)

    def prop_bytes(f):
        return hypercube_traffic_bytes(dg.p_in, fpad(f), 2)

    def fwd_stage(ind, outd):
        unpack = packed_bytes(ind) + rg_bytes(fpad(ind)) if ind < 128 else 0
        projs = 3 * (rg_bytes(fpad(ind)) + rg_bytes(fpad(outd)))
        props = 3 * prop_bytes(outd)
        gacc = 3 * 2 * rg_bytes(fpad(outd))  # gate-mult + acc read/write
        const = rg_bytes(outd) + 2 * rg_bytes(fpad(outd))
        tail = 4 * rg_bytes(fpad(outd))  # residual add + leaky + dropout
        pack = (rg_bytes(fpad(outd)) + packed_bytes(outd)) if outd < 128 else 0
        return unpack + projs + props + gacc + const + tail + pack

    def ys_stage(ind, outd):
        unpack = packed_bytes(ind) + rg_bytes(fpad(ind)) if ind < 128 else 0
        projs = 3 * (rg_bytes(fpad(ind)) + rg_bytes(fpad(outd)))
        props = 3 * prop_bytes(outd)
        packs = 3 * (rg_bytes(fpad(outd)) + packed_bytes(outd))
        return unpack + projs + props + packs

    def path_stage(ind, outd, first):
        # dgate packed sweep + transpose propagation + dw einsum + dxc einsum
        dgate = 2 * packed_bytes(outd)
        tprop = prop_bytes(outd)
        dw = rg_bytes(fpad(ind)) + rg_bytes(fpad(outd))
        dxc = rg_bytes(fpad(outd)) + rg_bytes(fpad(ind))
        extra = (rg_bytes(fpad(ind)) if first else 0)
        return dgate + tprop + dw + dxc + extra

    model = {}
    n_layers = len(layer_dims) - 1
    for k in range(n_layers):
        ind, outd = layer_dims[k], layer_dims[k + 1]
        model[f"fwd{k}"] = fwd_stage(ind, outd)
        if outd < 128 and 128 % outd == 0:
            model[f"s_fwd{k}"] = ys_stage(ind, outd)
        else:
            model[f"s_fwd{k}"] = fwd_stage(ind, outd)  # s recompute
        for i in range(3):
            model[f"path{k}.{i}"] = path_stage(ind, outd, i == 0)
    # final stage: decoder fwd+bwd on [*, last] (+ loss); 3 sweeps-ish
    model["final_grad"] = 6 * rg_bytes(fpad(layer_dims[-1]))
    return model


def phase_profile():
    os.environ["PROTGRAM_STAGE_TIMING"] = "1"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    dg = build_graph(jnp)
    step, params, opt_state, inputs = make_step_inputs(jax, jnp, dg)
    times, losses = run_steps(jax, jnp, step, params, opt_state, dg, inputs, 4,
                              "profile")
    model = stage_traffic_model(dg, LAYER_DIMS)
    breakdown = {}
    for tag, samples in step.stage_times.items():
        steady = samples[1:] if len(samples) > 1 else samples
        mean_s = float(np.mean([s[0] for s in steady]))
        entry = {
            "n": len(steady),
            "mean_stage_s": mean_s,
            "mean_fetch_s": float(np.mean([s[1] for s in steady])),
        }
        if tag in model:
            entry["modeled_gb"] = round(model[tag] / 1e9, 2)
            entry["achieved_gbps"] = round(model[tag] / 1e9 / max(mean_s, 1e-9), 1)
            entry["bound_gbps"] = BOUND_GBPS
        breakdown[tag] = entry
    total = sum(b["mean_stage_s"] for b in breakdown.values())
    RESULTS["profile"] = {
        "layer_dims": list(LAYER_DIMS),
        "step_times_s": [round(t, 3) for t in times],
        "losses": [round(v, 4) for v in losses],
        "per_stage": breakdown,
        "sum_of_stage_means_s": round(total, 3),
        "n_syncs": len(breakdown),
        "note": ("achieved_gbps = modeled program bytes / measured stage wall "
                 "time (incl. ~20-25 ms tunnel RTT per sync, so sub-bound "
                 "fractions on short stages are RTT, not kernel slack)"),
    }
    with open(RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    for tag, b in sorted(breakdown.items(), key=lambda kv: -kv[1]["mean_stage_s"]):
        extra = f" {b.get('achieved_gbps', '')}/{int(BOUND_GBPS)} GBps" if "achieved_gbps" in b else ""
        log(f"  {tag:16s} {b['mean_stage_s']*1000:7.1f} ms{extra}")
    log(f"sum of stage means: {total:.3f}s over {len(breakdown)} syncs")


def phase_timed(tag_name):
    os.environ.pop("PROTGRAM_STAGE_TIMING", None)
    # "lean" is the production default since r5; "opt" pins the full
    # barrier set for the A/B.
    os.environ["PROTGRAM_STAGE_SYNC"] = "lean" if tag_name == "lean" else "full"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    dg = build_graph(jnp)
    step, params, opt_state, inputs = make_step_inputs(jax, jnp, dg)
    times, losses = run_steps(jax, jnp, step, params, opt_state, dg, inputs, 6,
                              tag_name)
    steady = sorted(times[1:])
    RESULTS[tag_name] = {
        "layer_dims": list(LAYER_DIMS),
        "step_times_s": [round(t, 3) for t in times],
        "median_steady_s": round(steady[len(steady) // 2], 3),
        "losses": [round(v, 4) for v in losses],
        "r4_baseline_s": 3.30,
    }
    with open(RESULTS_PATH, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log(f"{tag_name} median steady step: {RESULTS[tag_name]['median_steady_s']}s (r4: 3.30)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("profile",):
        phase_profile()
    elif which in ("opt", "lean"):
        phase_timed(which)
    elif which == "all":
        import subprocess

        for ph in ("opt", "lean", "profile"):
            subprocess.run([sys.executable, __file__, ph], check=False)
