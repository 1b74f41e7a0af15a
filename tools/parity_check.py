"""Per-layer activation parity harness vs the reference implementation.

BASELINE requires per-layer allclose parity with the reference
implementation on the same n-gram graphs.  Two modes:

Default (oracle) mode checks our jitted TPU model against an independent
float64 dense oracle that encodes the reference's literal 6-propagation
dataflow (the same oracle the test suite uses — tests/test_model.py).

``--vs-reference`` mode runs the ACTUAL reference code in-process: torch
(2.13+cpu, installed) executes /root/reference's graph_utils.py matrix
construction and protgram_directgcn.py model forward VERBATIM via the
4-symbol PyG shim in tools/ref_shim.py, with identical parameters injected
into both models.  It reports, per n-gram level:

1. dense allclose for all three propagation matrices
   (reference: graph_utils.py:140-287 vs graph/transforms.py),
2. per-layer max abs/rel error of each DirectGCNLayer output
   (reference: protgram_directgcn.py:93-135, captured via forward hooks),
3. final log_softmax + L2-normalized embeddings
   (reference: protgram_directgcn.py:195-222), eval mode — dropout/PRNG
   excluded by construction, per SURVEY.md §7.3 parity notes.

Exit code 0 iff everything is within tolerance.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_parity(fasta: str, n_max: int = 3, feat_dim: int = 32, rtol: float = 2e-4, atol: float = 2e-5) -> int:
    import jax
    import jax.numpy as jnp

    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig,
        directgcn_apply,
        init_directgcn_params,
    )
    from tests.test_model import oracle_forward

    sequences = list(__import__("protgram_directgcn_tpu.utils.io", fromlist=["parse_fasta"]).parse_fasta(fasta))
    graphs = NgramGraphBuilder(n_max=n_max).build_from_sequences(sequences)
    ok = True
    for g in graphs:
        if g.num_nodes == 0:
            continue
        dg = g.to_device(mode="auto", feat_dim=feat_dim)
        mats = [
            np.asarray(g.mathcal_a_in().todense()).T,
            np.asarray(g.mathcal_a_out().todense()).T,
            np.asarray(g.undirected_norm().todense()).T,
        ]
        cfg = DirectGCNConfig(
            layer_dims=(feat_dim, 24, 16), num_nodes=g.num_nodes,
            num_classes=max(2, min(g.num_nodes, 7)), n_gram_len=g.n, one_gram_dim=0,
        )
        params = init_directgcn_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(g.n)
        x = rng.standard_normal((g.num_nodes, feat_dim)).astype(np.float32)
        log_sm, emb = jax.jit(
            lambda p, dgv, xv: directgcn_apply(p, dgv, xv, cfg)
        )(params, dg, jnp.asarray(x))
        o_log_sm, o_emb = oracle_forward(params, mats, x, cfg)
        for name, got, want in (("log_softmax", np.asarray(log_sm), o_log_sm),
                                ("embeddings", np.asarray(emb), o_emb)):
            err = np.max(np.abs(got - want))
            rel = err / (np.max(np.abs(want)) + 1e-12)
            status = "OK " if np.allclose(got, want, rtol=rtol, atol=atol) else "FAIL"
            if status == "FAIL":
                ok = False
            print(f"  n={g.n} {name:12s}: max_abs={err:.3e} max_rel={rel:.3e} [{status}]")
    print("PARITY " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


def _compare(name: str, got, want, rtol: float, atol: float) -> bool:
    got = np.asarray(got, dtype=np.float64)
    want = np.asarray(want, dtype=np.float64)
    err = float(np.max(np.abs(got - want))) if got.size else 0.0
    rel = err / (float(np.max(np.abs(want))) + 1e-12)
    ok = bool(np.allclose(got, want, rtol=rtol, atol=atol))
    print(f"    {name:28s}: max_abs={err:.3e} max_rel={rel:.3e} [{'OK ' if ok else 'FAIL'}]")
    return ok


def run_reference_parity(fasta: str, n_max: int = 3, rtol: float = 2e-4, atol: float = 2e-5) -> int:
    """Parity vs the ACTUAL reference code (see module docstring)."""
    import jax
    import jax.numpy as jnp
    import torch

    from tools.ref_shim import (
        build_reference_model,
        load_reference_modules,
        reference_available,
        reference_data_from_graph,
        reference_graph_from_arrays,
    )

    if not reference_available():
        print("reference tree not found; nothing to check")
        return 2

    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.models import directgcn as m
    from protgram_directgcn_tpu.utils.io import parse_fasta

    _, _, Data = load_reference_modules()
    graphs = NgramGraphBuilder(n_max=n_max).build_from_sequences(list(parse_fasta(fasta)))
    ok = True
    for g in graphs:
        if g.num_nodes == 0:
            continue
        print(f"  n={g.n} ({g.num_nodes} nodes, {g.num_edges} edges)")
        ref_g = reference_graph_from_arrays(
            g.src, g.tgt, g.weight, g.num_nodes, g.epsilon_propagation, g.n
        )
        # --- 1. propagation-matrix parity (reference: graph_utils.py:140-287)
        for name, ref_t, mine in (
            ("mathcal_A_out", ref_g.mathcal_A_out, g.mathcal_a_out()),
            ("mathcal_A_in", ref_g.mathcal_A_in, g.mathcal_a_in()),
            ("A_undirected_norm", ref_g.A_undirected_norm_sparse, g.undirected_norm()),
        ):
            ok &= _compare(name, np.asarray(mine.todense()),
                           ref_t.to_dense().numpy(), rtol, atol)

        # --- 2+3. model parity with identical injected params.  The PE path
        # (one_gram_dim > 0) engages at n >= 2 per the trainer contract.
        one_gram = 8 if g.n >= 2 else 0
        feat = g.n * one_gram if one_gram else 32
        cfg = m.DirectGCNConfig(
            layer_dims=(feat, 24, 24, 16), num_nodes=g.num_nodes,
            num_classes=max(2, min(g.num_nodes, 7)), n_gram_len=g.n,
            one_gram_dim=one_gram,
        )
        key = jax.random.PRNGKey(g.n)
        params = m.init_directgcn_params(key, cfg)
        # Randomize the unit-initialized gates so the hierarchical gating
        # algebra (reference: protgram_directgcn.py:116-133) is exercised.
        for i, lp in enumerate(params["layers"]):
            for j, gate in enumerate(("c_in", "c_out", "c_directed", "c_undirected", "c_all")):
                k = jax.random.fold_in(key, 100 + 10 * i + j)
                lp[gate] = lp[gate] + 0.5 * jax.random.normal(k, lp[gate].shape)

        rng_np = np.random.default_rng(g.n)
        x = rng_np.standard_normal((g.num_nodes, feat)).astype(np.float32)

        # Reference forward (verbatim module, eval mode) with layer hooks.
        ref_model = build_reference_model(cfg, params)
        data = reference_data_from_graph(ref_g, x, Data)
        ref_layer_outs = []
        for conv in ref_model.convs:
            conv.register_forward_hook(
                lambda mod, inp, out: ref_layer_outs.append(out.detach().numpy())
            )
        with torch.no_grad():
            ref_log_sm, ref_emb = ref_model(data)

        # Our forward: evolve h with apply_layer_range, capture each layer's
        # raw GCN output with _layer_apply on the same incoming h.
        dg = g.to_device(mode="auto", feat_dim=feat)
        h = m._apply_pe(params, jnp.asarray(x), cfg)
        n_layers = len(params["layers"])
        for i in range(n_layers):
            gcn_out = m._layer_apply(params["layers"][i], dg, h, cfg, None)
            ok &= _compare(f"layer[{i}] gcn_out", gcn_out, ref_layer_outs[i], rtol, atol)
            h = m.apply_layer_range(params, dg, h, cfg, i, i + 1,
                                    train=False, drop_keys=[None] * (n_layers + 1))
        log_sm, emb = m.directgcn_apply(params, dg, jnp.asarray(x), cfg)
        ok &= _compare("log_softmax", log_sm, ref_log_sm.numpy(), rtol, atol)
        ok &= _compare("embeddings", emb, ref_emb.numpy(), rtol, atol)
    print("REFERENCE PARITY " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


def main(argv=None):
    p = argparse.ArgumentParser(description="DirectGCN activation parity check")
    p.add_argument("fasta")
    p.add_argument("--n-max", type=int, default=3)
    p.add_argument("--feat-dim", type=int, default=32)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--vs-reference", action="store_true",
                   help="run the actual reference code (torch) for comparison")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.vs_reference:
        return run_reference_parity(args.fasta, args.n_max)
    return run_parity(args.fasta, args.n_max, args.feat_dim)


if __name__ == "__main__":
    sys.exit(main())
