"""Parity vs the ACTUAL reference code, executed verbatim in-process.

torch 2.13+cpu runs /root/reference's graph_utils.py matrix construction and
protgram_directgcn.py model forward through the 4-symbol PyG shim
(tools/ref_shim.py).  Unlike the float64 oracle tests (test_model.py), the
"want" side here is the reference's own executed behavior — nothing
self-written.  Skipped cleanly if torch or the reference tree is absent.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import ref_shim

pytestmark = pytest.mark.skipif(
    not ref_shim.reference_available(), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def graphs():
    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder

    seqs = [
        ("P001", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"),
        ("P002", "QDKTAYIAKERQISMVKSHFSRQLEERLG"),
        ("P003", "MKTAYHRQDWLGLIEVQAPILSRVGDGTQDNLSGAEK"),
    ]
    return NgramGraphBuilder(n_max=2).build_from_sequences(seqs)


def _ref_graph(g):
    return ref_shim.reference_graph_from_arrays(
        g.src, g.tgt, g.weight, g.num_nodes, g.epsilon_propagation, g.n
    )


def test_propagation_matrices_match_reference(graphs):
    """graph/transforms.py vs reference graph_utils.py:140-287, exact."""
    for g in graphs:
        ref_g = _ref_graph(g)
        np.testing.assert_array_equal(
            np.asarray(g.mathcal_a_out().todense()), ref_g.mathcal_A_out.to_dense().numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(g.mathcal_a_in().todense()), ref_g.mathcal_A_in.to_dense().numpy()
        )
        np.testing.assert_array_equal(
            np.asarray(g.undirected_norm().todense()),
            ref_g.A_undirected_norm_sparse.to_dense().numpy(),
        )


@pytest.mark.parametrize("level", [0, 1])  # n=1 plain, n=2 engages the PE path
def test_model_forward_matches_reference(graphs, level):
    """models/directgcn.py vs reference protgram_directgcn.py:93-222."""
    import jax
    import jax.numpy as jnp

    from protgram_directgcn_tpu.models import directgcn as m

    g = graphs[level]
    ref_g = _ref_graph(g)
    one_gram = 8 if g.n >= 2 else 0
    feat = g.n * one_gram if one_gram else 24
    cfg = m.DirectGCNConfig(
        layer_dims=(feat, 20, 12), num_nodes=g.num_nodes, num_classes=5,
        n_gram_len=g.n, one_gram_dim=one_gram,
    )
    key = jax.random.PRNGKey(g.n)
    params = m.init_directgcn_params(key, cfg)
    for i, lp in enumerate(params["layers"]):
        for j, gate in enumerate(("c_in", "c_out", "c_directed", "c_undirected", "c_all")):
            k = jax.random.fold_in(key, 100 + 10 * i + j)
            lp[gate] = lp[gate] + 0.5 * jax.random.normal(k, lp[gate].shape)

    x = np.random.default_rng(g.n).standard_normal((g.num_nodes, feat)).astype(np.float32)

    ref_model = ref_shim.build_reference_model(cfg, params)
    _, _, Data = ref_shim.load_reference_modules()
    data = ref_shim.reference_data_from_graph(ref_g, x, Data)
    ref_layer_outs = []
    for conv in ref_model.convs:
        conv.register_forward_hook(
            lambda mod, inp, out: ref_layer_outs.append(out.detach().numpy())
        )
    with torch.no_grad():
        ref_log_sm, ref_emb = ref_model(data)

    dg = g.to_device(mode="auto", feat_dim=feat)
    h = m._apply_pe(params, jnp.asarray(x), cfg)
    for i in range(len(params["layers"])):
        gcn_out = m._layer_apply(params["layers"][i], dg, h, cfg, None)
        np.testing.assert_allclose(
            np.asarray(gcn_out), ref_layer_outs[i], rtol=2e-4, atol=2e-4,
            err_msg=f"layer {i} gcn output (n={g.n})",
        )
        h = m.apply_layer_range(params, dg, h, cfg, i, i + 1,
                                train=False, drop_keys=[None] * 4)
    log_sm, emb = m.directgcn_apply(params, dg, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(log_sm), ref_log_sm.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(), rtol=2e-4, atol=2e-4)


def test_literal_mode_matches_reference(graphs):
    """fused=False literal 6-propagation path also matches the reference."""
    import jax
    import jax.numpy as jnp

    from protgram_directgcn_tpu.models import directgcn as m

    g = graphs[0]
    ref_g = _ref_graph(g)
    cfg = m.DirectGCNConfig(
        layer_dims=(16, 12), num_nodes=g.num_nodes, num_classes=3,
        n_gram_len=g.n, one_gram_dim=0, fused=False,
    )
    params = m.init_directgcn_params(jax.random.PRNGKey(7), cfg)
    x = np.random.default_rng(7).standard_normal((g.num_nodes, 16)).astype(np.float32)

    ref_model = ref_shim.build_reference_model(cfg, params)
    _, _, Data = ref_shim.load_reference_modules()
    with torch.no_grad():
        ref_log_sm, ref_emb = ref_model(ref_shim.reference_data_from_graph(ref_g, x, Data))

    dg = g.to_device(mode="auto", feat_dim=16)
    log_sm, emb = m.directgcn_apply(params, dg, jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(log_sm), ref_log_sm.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(emb), ref_emb.numpy(), rtol=2e-4, atol=2e-4)
