"""Adjudicate the DirectGCN benchmark collapse (VERDICT r3 next-step #1).

The r3 benchmark table shows ProtGramDirectGCN at exactly 0.5 = chance on
KarateClub (the one real dataset) at every depth.  This experiment proves the
mechanism and that it is the reference architecture's behavior on raw
benchmark adjacency — not an implementation bug — via three parts:

  trace  — per-layer activation statistics at init and training dynamics at
           depths 0..3 on KarateClub raw adjacency.  Shows (1) exponential
           amplification: each layer multiplies the signal RMS by ~2·rho(A)
           (rho = 6.73 for KarateClub; two unnormalized directed paths), and
           (2) rank-1 collapse: the top singular value's energy fraction of
           the node-feature matrix reaches 1.000 by layer 3 — every node's
           features become proportional to the dominant-eigenvector entry, so
           every node shares one argmax, and accuracy pins to the majority
           fraction (17/17 split = exactly 0.5).  A third mechanism binds all
           depths: the reference decoder sizes its hidden layer as
           ``final_dim // 2`` where final_dim = num_classes
           (reference: src/models/protgram_directgcn.py:173-174 and
           src/benchmarks/gnn_benchmarker.py:325 — layer_dims ends at
           num_classes), so 2-class datasets get a WIDTH-1 ReLU bottleneck;
           with rank-collapsed inputs its pre-activation has one sign across
           all nodes and the whole network emits a constant logit vector.

  sweep  — lr x depth x use_vector_coeffs x constant-init-scale on KarateClub
           raw adjacency: every deep configuration plateaus at 0.5
           ("regardless of lr", quantified).

  torch  — INDEPENDENT PyTorch float64 re-implementation of the reference
           dataflow (dense operators, literal 6-propagation algebra as in
           reference: src/models/protgram_directgcn.py:100-135), identical
           init imported from the JAX tree, dropout disabled, same
           Adam(1e-3, wd=5e-4): per-epoch loss trajectories match the JAX
           literal mode (fused=False) to float tolerance while numerics hold,
           and both implementations end at the same dead plateau
           (1 distinct prediction, acc 0.5).  torch autograd + torch Adam on
           torch ops is an implementation-independent oracle: if the JAX
           model had a bug, the trajectories would diverge.

Writes experiments/BENCHMARK_COLLAPSE_r04.json.

Run:  PYTHONPATH=. python experiments/exp_benchmark_collapse.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import itertools
import json
import os

import numpy as np
import jax.numpy as jnp
import optax

from protgram_directgcn_tpu.bench.datasets import karate_club
from protgram_directgcn_tpu.bench.gnn_benchmarker import (
    _directgcn_device_graph,
    seeded_split,
)
from protgram_directgcn_tpu.models.directgcn import (
    DirectGCNConfig,
    _apply_pe,
    apply_layer_range,
    directgcn_apply,
    init_directgcn_params,
)

OUT = os.path.join(os.path.dirname(__file__), "BENCHMARK_COLLAPSE_r04.json")

ds = karate_club()
N, C = ds.num_nodes, ds.num_classes
MASKS = seeded_split(N, {"train": 0.1, "val": 0.1, "test": 0.8}, 42)
X64 = jnp.asarray(ds.x, jnp.float64)
Y = jnp.asarray(ds.y.astype(np.int32))
TRAIN_MASK = jnp.asarray(MASKS[0], jnp.float64)


def spectral_radius():
    import scipy.sparse as sp
    from scipy.sparse.linalg import eigs

    a = sp.coo_matrix(
        (np.ones(ds.edge_index.shape[1]), (ds.edge_index[1], ds.edge_index[0])),
        shape=(N, N),
    ).tocsr()
    return float(abs(eigs(a.astype(np.float64), k=1, return_eigenvectors=False)[0]))


def make_cfg(hidden, use_vec=True, dropout=0.5):
    dims = tuple([N] + list(hidden) + [C])
    return DirectGCNConfig(
        layer_dims=dims, num_nodes=N, num_classes=C, n_gram_len=0,
        one_gram_dim=0, max_pe_len=0, dropout=dropout,
        use_vector_coeffs=use_vec,
    )


def train(cfg, graph, params, lr=1e-3, wd=5e-4, epochs=300, seed=0, record_every=0):
    opt = optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits, _ = directgcn_apply(p, graph, X64, cfg, train=True, rng=rng)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, Y[:, None], 1)[:, 0]
            return jnp.sum(per * TRAIN_MASK) / jnp.maximum(TRAIN_MASK.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def ev(params):
        logits, _ = directgcn_apply(params, graph, X64, cfg, train=False)
        return jnp.argmax(logits, -1)

    rng = jax.random.PRNGKey(seed)
    best_val, best_test, trace = -1.0, 0.0, []
    y_np = np.asarray(Y)
    for epoch in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        pred = np.asarray(ev(params))
        correct = pred == y_np
        av, at = correct[MASKS[1]].mean(), correct[MASKS[2]].mean()
        if av >= best_val:
            best_val, best_test = float(av), float(at)
        if record_every and epoch % record_every == 0:
            trace.append(
                {"epoch": epoch, "loss": float(loss),
                 "distinct_preds": int(len(np.unique(pred))), "test_acc": float(at)}
            )
    return best_val, best_test, trace, params


# ---------------------------------------------------------------------------
# Part 1: trace — the amplification / rank-collapse / bottleneck mechanism
# ---------------------------------------------------------------------------


def part_trace():
    out = {"spectral_radius_raw_adjacency": spectral_radius(), "depths": []}
    for hidden in ([], [64], [256, 128], [256, 128, 64]):
        cfg = make_cfg(hidden)
        graph = _directgcn_device_graph(ds, feat_dim=max(cfg.layer_dims))
        params = init_directgcn_params(jax.random.PRNGKey(42), cfg)
        h = _apply_pe(params, X64, cfg)
        nl = len(params["layers"])
        layers = []
        for i in range(nl):
            h = apply_layer_range(
                params, graph, h, cfg, i, i + 1, train=False,
                drop_keys=[None] * (nl + 1),
            )
            hn = np.asarray(h, np.float64)
            s = np.linalg.svd(hn, compute_uv=False)
            layers.append(
                {"layer": i, "rms": float(np.sqrt((hn**2).mean())),
                 "top_sv_energy": float(s[0] ** 2 / (s**2).sum())}
            )
        # width-1 decoder bottleneck diagnostics (C=2 -> hidden = C//2 = 1)
        dec = params["decoder"]
        z = np.asarray(h @ dec["w1"] + dec["b1"], np.float64)
        frac_pos = float((z > 0).mean())
        bv, bt, trace, _ = train(cfg, graph, params, record_every=50)
        out["depths"].append(
            {"hidden_dims": hidden, "decoder_hidden_width": int(dec["w1"].shape[1]),
             "decoder_preact_frac_pos_at_init": frac_pos,
             "per_layer_at_init": layers, "best_val": bv, "best_test": bt,
             "training_trace": trace}
        )
        print(f"[trace] hidden={hidden}: best_test={bt:.3f} "
              f"final_distinct={trace[-1]['distinct_preds']} layers={layers}",
              flush=True)
    return out


# ---------------------------------------------------------------------------
# Part 2: sweep — "regardless of lr" quantified
# ---------------------------------------------------------------------------


def part_sweep():
    rows = []
    graph_cache = {}
    for hidden, lr, use_vec, const_scale in itertools.product(
        ([64], [256, 128, 64]), (1e-4, 1e-3, 1e-2), (True, False), (1.0, 0.1, 0.0)
    ):
        cfg = make_cfg(hidden, use_vec=use_vec)
        fd = max(cfg.layer_dims)
        if fd not in graph_cache:
            graph_cache[fd] = _directgcn_device_graph(ds, feat_dim=fd)
        graph = graph_cache[fd]
        params = init_directgcn_params(jax.random.PRNGKey(42), cfg)
        if const_scale != 1.0:
            for lp in params["layers"]:
                if lp["constant"] is not None:
                    lp["constant"] = lp["constant"] * const_scale
        bv, bt, _, _ = train(cfg, graph, params, lr=lr)
        rows.append(
            {"hidden_dims": hidden, "lr": lr, "use_vector_coeffs": use_vec,
             "constant_scale": const_scale, "best_val": bv, "best_test": bt}
        )
        print(f"[sweep] hidden={hidden} lr={lr} vec={use_vec} "
              f"const={const_scale}: test={bt:.3f}", flush=True)
    return rows


# ---------------------------------------------------------------------------
# Part 3: torch float64 oracle — implementation-independent trajectory match
# ---------------------------------------------------------------------------


def _scipy_operators():
    """Dense float64 operators matching the adapter convention
    (propagate(build_adjacency(s, t, w), x)[t] += w * x[s])."""
    import scipy.sparse as sp

    from protgram_directgcn_tpu.graph.transforms import undirected_normalized_matrix

    src = ds.edge_index[0].astype(np.int64)
    tgt = ds.edge_index[1].astype(np.int64)
    ones = np.ones(len(src), np.float64)
    p_out = sp.coo_matrix((ones, (tgt, src)), shape=(N, N)).toarray()
    p_in = sp.coo_matrix((ones, (src, tgt)), shape=(N, N)).toarray()
    p_und = undirected_normalized_matrix(src, tgt, N).toarray().astype(np.float64)
    return p_in, p_out, p_und


def part_torch(epochs=300, match_epochs=60):
    import torch

    torch.set_default_dtype(torch.float64)
    cfg = make_cfg([256, 128, 64], dropout=0.0)
    graph = _directgcn_device_graph(ds, feat_dim=max(cfg.layer_dims))
    jax_params = init_directgcn_params(jax.random.PRNGKey(42), cfg)

    # --- identical init, imported leaf by leaf into torch ---
    t = lambda a: torch.tensor(np.asarray(a, np.float64), requires_grad=True)
    tl, trs = [], []
    for lp, rp in zip(jax_params["layers"], jax_params["res_projs"]):
        tl.append({k: t(v) for k, v in lp.items() if v is not None})
        trs.append(None if rp is None else {k: t(v) for k, v in rp.items()})
    tdec = {k: t(v) for k, v in jax_params["decoder"].items()}
    p_in, p_out, p_und = (torch.tensor(m) for m in _scipy_operators())
    xt = torch.tensor(np.asarray(ds.x, np.float64))
    yt = torch.tensor(ds.y.astype(np.int64))
    tmask = torch.tensor(MASKS[0])

    def layer_fwd(p, x):
        """Literal reference dataflow: 6 propagations, hierarchical gating
        (reference: src/models/protgram_directgcn.py:100-135)."""
        xs = x @ p["w_shared"]
        ic = (p_in @ (x @ p["w_main_in"]) + p["b_main_in"]) + (
            p_in @ xs + p["b_shared_in"]
        )
        oc = (p_out @ (x @ p["w_main_out"]) + p["b_main_out"]) + (
            p_out @ xs + p["b_shared_out"]
        )
        uc = (p_und @ (x @ p["w_und"]) + p["b_und"]) + (p_und @ xs + p["b_shared_und"])
        directed = p["c_directed"] * (p["c_in"] * ic + p["c_out"] * oc)
        return p["c_all"] * (p["c_undirected"] * uc + directed) + p["constant"]

    def forward(x):
        h = x
        for p, rp in zip(tl, trs):
            res = h if rp is None else h @ rp["w"] + rp["b"]
            h = torch.nn.functional.leaky_relu(layer_fwd(p, h) + res,
                                               negative_slope=0.01)
        z = torch.relu(h @ tdec["w1"] + tdec["b1"])
        logits = z @ tdec["w2"] + tdec["b2"]
        return torch.log_softmax(logits, dim=-1)

    all_params = [v for d in tl + [tdec] + [r for r in trs if r] for v in d.values()]
    opt = torch.optim.Adam(all_params, lr=1e-3, weight_decay=5e-4)
    torch_losses, torch_final = [], None
    for _ in range(epochs):
        opt.zero_grad()
        out = forward(xt)
        # reference composition: CE (a second log_softmax) on log_softmax out
        loss = torch.nn.functional.cross_entropy(out[tmask], yt[tmask])
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))
    with torch.no_grad():
        torch_final = forward(xt).argmax(-1).numpy()

    # --- same run through the JAX literal mode (fused=False), dropout 0 ---
    cfg_lit = DirectGCNConfig(
        layer_dims=cfg.layer_dims, num_nodes=N, num_classes=C, n_gram_len=0,
        one_gram_dim=0, max_pe_len=0, dropout=0.0, use_vector_coeffs=True,
        fused=False,
    )
    jax_losses = {}
    finals = {}
    for tag, c in (("literal", cfg_lit), ("fused", cfg)):
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), jax_params,
            is_leaf=lambda a: a is None,
        )
        opt_j = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
        opt_state = opt_j.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits, _ = directgcn_apply(p, graph, X64, c, train=False)
                logp = jax.nn.log_softmax(logits, axis=-1)
                per = -jnp.take_along_axis(logp, Y[:, None], 1)[:, 0]
                return jnp.sum(per * TRAIN_MASK) / jnp.maximum(TRAIN_MASK.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt_j.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(epochs):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        jax_losses[tag] = losses
        logits, _ = directgcn_apply(params, graph, X64, c, train=False)
        finals[tag] = np.asarray(jnp.argmax(logits, -1))

    tm = np.asarray(torch_losses[:match_epochs])
    jm = np.asarray(jax_losses["literal"][:match_epochs])
    rel = float(np.max(np.abs(tm - jm) / (np.abs(tm) + 1e-12)))
    rel_fused = float(
        np.max(
            np.abs(np.asarray(jax_losses["fused"][:match_epochs]) - jm)
            / (np.abs(jm) + 1e-12)
        )
    )
    result = {
        "epochs": epochs,
        "match_epochs": match_epochs,
        "max_rel_loss_diff_torch_vs_jax_literal": rel,
        "max_rel_loss_diff_fused_vs_literal": rel_fused,
        "torch_final_distinct_preds": int(len(np.unique(torch_final))),
        "jax_final_distinct_preds": int(len(np.unique(finals["literal"]))),
        "torch_final_test_acc": float(
            (torch_final == ds.y)[MASKS[2]].mean()
        ),
        "jax_final_test_acc": float((finals["literal"] == ds.y)[MASKS[2]].mean()),
        "loss_head": {
            "torch": torch_losses[:10],
            "jax_literal": jax_losses["literal"][:10],
            "jax_fused": jax_losses["fused"][:10],
        },
        "loss_tail_epoch_290_300": {
            "torch": torch_losses[-10:],
            "jax_literal": jax_losses["literal"][-10:],
        },
    }
    print(
        f"[torch] max rel loss diff (torch vs jax-literal, {match_epochs} ep): "
        f"{rel:.3e}; fused vs literal: {rel_fused:.3e}; "
        f"final distinct torch={result['torch_final_distinct_preds']} "
        f"jax={result['jax_final_distinct_preds']}; "
        f"test acc torch={result['torch_final_test_acc']:.3f} "
        f"jax={result['jax_final_test_acc']:.3f}",
        flush=True,
    )
    assert rel < 1e-6, f"torch/jax trajectory mismatch: {rel}"
    assert rel_fused < 1e-6, f"fused/literal mismatch: {rel_fused}"
    return result


def main():
    results = {
        "dataset": "KarateClub (real, embedded)",
        "class_split": [int(v) for v in np.bincount(ds.y)],
        "trace": part_trace(),
        "sweep": part_sweep(),
        "torch_oracle": part_torch(),
    }
    deep_rows = [r for r in results["sweep"] if len(r["hidden_dims"]) > 1]
    results["conclusion"] = {
        "deep_raw_adjacency_rows": len(deep_rows),
        "deep_raw_adjacency_rows_at_chance": sum(
            1 for r in deep_rows if abs(r["best_test"] - 0.5) < 0.08
        ),
        "verdict": (
            "Architecture-level collapse of the reference dataflow on raw "
            "benchmark adjacency, reproduced by an independent torch float64 "
            "implementation with trajectory-level agreement: (1) unnormalized "
            "sum aggregation amplifies ~2*rho(A) per layer driving rank-1 "
            "feature collapse; (2) layer_dims ending at num_classes gives "
            "2-class datasets a width-1 ReLU decoder bottleneck that emits a "
            "constant argmax once features are rank-collapsed. Not an "
            "implementation bug. The production pipeline avoids this by "
            "feeding sqrt-normalized A-operators "
            "(graph/transforms.directgcn_propagation_matrix); the benchmark "
            "suite now also reports a ProtGramDirectGCN_norm row that applies "
            "those same production operators to the benchmark graphs."
        ),
    }
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
