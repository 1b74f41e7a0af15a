"""Hypercube SpMM: oracle parity, gradients, embedding round-trip, selection.

The hypercube factorisation must reproduce exactly the same propagation as
the generic formats on all three DirectGCN matrices (𝒜_out, 𝒜_in, undirected
sym-norm — reference: graph_utils.py:198-287) after embedding features at
positional hypercube ids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
from protgram_directgcn_tpu.graph import transforms
from protgram_directgcn_tpu.ops import hypercube, spmm
from tests.conftest import random_graph_arrays


@pytest.fixture(scope="module")
def trigram_graph():
    seqs = [
        ("P1", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"),
        ("P2", "MKLVTAYIAKQRRQISFVK"),
        ("P3", "GLIEVQAPILSRVGDGTQDNLSGAEKAVQ"),
    ]
    graphs = NgramGraphBuilder(n_max=3).build_from_sequences(seqs)
    return graphs[2]


def _dense_oracle(src, tgt, w, n, x):
    at = np.zeros((n, n), dtype=np.float64)
    np.add.at(at, (tgt, src), w)
    return at @ x


@pytest.mark.parametrize("matrix", ["mathcal_a_out", "mathcal_a_in", "undirected_norm"])
def test_hypercube_matches_oracle_on_ngram_matrices(trigram_graph, matrix):
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(getattr(g, matrix)())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    assert adj.n_out == alpha ** codes.shape[1]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(g.num_nodes, 16)).astype(np.float32)
    xh = hypercube.embed_features(adj, jnp.asarray(x))
    out = np.asarray(hypercube.extract_features(adj, spmm.propagate(adj, xh)))
    np.testing.assert_allclose(
        out, _dense_oracle(src, tgt, val, g.num_nodes, x), rtol=1e-4, atol=1e-5
    )


def test_hypercube_absent_ids_receive_nothing(trigram_graph):
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(g.num_nodes, 8)).astype(np.float32)
    )
    out = np.asarray(spmm.propagate(adj, hypercube.embed_features(adj, x)))
    mask = np.ones(adj.n_out, bool)
    mask[np.asarray(adj.node_map)] = False
    assert np.abs(out[mask]).max() == 0.0


def test_hypercube_gradients_match_transpose(trigram_graph):
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(g.num_nodes, 16)).astype(np.float32)
    grad_out = rng.normal(size=(g.num_nodes, 16)).astype(np.float32)

    def loss(xv):
        xh = hypercube.embed_features(adj, xv)
        prop = hypercube.extract_features(adj, spmm.propagate(adj, xh))
        return jnp.sum(prop * jnp.asarray(grad_out))

    dx = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    at = np.zeros((g.num_nodes, g.num_nodes))
    np.add.at(at, (tgt, src), val)
    np.testing.assert_allclose(dx, at.T @ grad_out, rtol=1e-4, atol=1e-5)


def test_build_adjacency_selects_hypercube_with_codes(trigram_graph):
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    # Auto mode picks the hypercube only when the padded space is dense
    # enough; the tiny test vocab is sparse in alphabet^3, so force it.
    adj = spmm.build_adjacency(
        src, tgt, val, g.num_nodes, mode="hypercube", vocab_codes=(codes, alpha)
    )
    assert isinstance(adj, hypercube.HypercubeAdj)
    # Auto mode with a sparse hypercube must fall back to a generic format.
    auto = spmm.build_adjacency(
        src, tgt, val, g.num_nodes, mode="auto", vocab_codes=(codes, alpha)
    )
    dense_enough = alpha ** codes.shape[1] <= 4 * g.num_nodes
    assert isinstance(auto, hypercube.HypercubeAdj) == dense_enough


@pytest.mark.parametrize("matrix", ["mathcal_a_out", "mathcal_a_in"])
def test_pallas_kernels_match_oracle(trigram_graph, matrix):
    """The Pallas sweeps (interpret mode on CPU) reproduce the dense oracle
    and the XLA einsum path exactly, forward and transpose."""
    from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(getattr(g, matrix)())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    a_dim, g_dim = adj.d.shape
    rng = np.random.default_rng(7)
    # F=128 exercises the single-f-tile path the TPU dispatch requires.
    x = rng.normal(size=(g.num_nodes, 128)).astype(np.float32)
    xh = hypercube.embed_features(adj, jnp.asarray(x)).reshape(a_dim, g_dim, 128)

    out_pl = apply_hyper_pallas(adj.d, adj.wf_gm, adj.wb_rs, xh, interpret=True)
    out_real = np.asarray(out_pl).reshape(-1, 128)[np.asarray(adj.node_map)]
    np.testing.assert_allclose(
        out_real, _dense_oracle(src, tgt, val, g.num_nodes, x), rtol=1e-4, atol=1e-5
    )
    # Transpose product = same kernels with the edge-pattern banks swapped.
    out_t = apply_hyper_pallas(adj.d, adj.wb_gm, adj.wf_rs, xh, interpret=True)
    at = np.zeros((g.num_nodes, g.num_nodes))
    np.add.at(at, (tgt, src), val)
    np.testing.assert_allclose(
        np.asarray(out_t).reshape(-1, 128)[np.asarray(adj.node_map)],
        at.T @ x,
        rtol=1e-4,
        atol=1e-5,
    )


def test_pallas_bf16_within_mixed_precision_tolerance(trigram_graph):
    from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(
        src, tgt, val, codes, alpha, weights_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(9)
    a_dim, g_dim = adj.d.shape
    x = rng.normal(size=(g.num_nodes, 128)).astype(np.float32)
    xh = (
        hypercube.embed_features(adj, jnp.asarray(x))
        .astype(jnp.bfloat16)
        .reshape(a_dim, g_dim, 128)
    )
    out = apply_hyper_pallas(adj.d, adj.wf_gm, adj.wb_rs, xh, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _dense_oracle(src, tgt, val, g.num_nodes, x)
    got = np.asarray(out, np.float64).reshape(-1, 128)[np.asarray(adj.node_map)]
    # bf16 storage: ~3 decimal digits; degrees here are small.
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 0.05 * scale


def test_propagate_hyper_rg_layout_matches_flat(trigram_graph):
    """propagate(adj, x) accepts flat [A^n, F] and rg [A, G, F] features and
    returns identical values in the matching layout (incl. gradients)."""
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    a_dim, g_dim = adj.d.shape
    rng_ = np.random.default_rng(13)
    xh = jnp.asarray(rng_.normal(size=(adj.n_out, 16)).astype(np.float32))

    flat = spmm.propagate(adj, xh)
    rg = spmm.propagate(adj, xh.reshape(a_dim, g_dim, 16))
    assert rg.shape == (a_dim, g_dim, 16)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(rg).reshape(-1, 16))

    def loss(xv):
        return jnp.sum(spmm.propagate(adj, xv) ** 2)

    gf = np.asarray(jax.grad(loss)(xh))
    gr = np.asarray(jax.grad(loss)(xh.reshape(a_dim, g_dim, 16)))
    np.testing.assert_allclose(gf, gr.reshape(-1, 16), rtol=1e-5, atol=1e-6)


def test_hypercube_rejects_unstructured_graph(rng):
    n = 27
    src, tgt, w = random_graph_arrays(rng, n=n, e=200)
    vocab = np.sort(np.array([f"{a}{b}{c}" for a in "abc" for b in "abc" for c in "abc"]))
    codes, alpha = hypercube.vocab_char_codes(vocab)
    with pytest.raises(Exception):
        hypercube.build_hypercube(src, tgt, w, codes, alpha)
    # 1-grams have no key structure.
    with pytest.raises(Exception):
        hypercube.build_hypercube(
            np.array([0]), np.array([1]), np.array([1.0]), codes[:, :1], alpha
        )


def test_model_rg_carry_matches_indexed_path(trigram_graph):
    """directgcn_apply carries rg-layout features internally on hypercube
    graphs; forcing the flat path (identity original_indices disables the
    rg carry) must give identical outputs."""
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig,
        directgcn_apply,
        init_directgcn_params,
    )

    dg = trigram_graph.to_device(mode="hypercube", feat_dim=32)
    n = dg.num_nodes
    cfg = DirectGCNConfig(
        layer_dims=(32, 16), num_nodes=n, num_classes=5, n_gram_len=3
    )
    params = init_directgcn_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 32))
    log_rg, emb_rg = directgcn_apply(params, dg, x, cfg)
    log_fl, emb_fl = directgcn_apply(
        params, dg, x, cfg, original_indices=jnp.arange(n)
    )
    assert log_rg.shape == (n, 5) and emb_rg.shape == (n, 16)
    np.testing.assert_allclose(np.asarray(log_rg), np.asarray(log_fl), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb_rg), np.asarray(emb_fl), rtol=1e-5, atol=1e-6)


def test_propagate_affine_fused_epilogue(trigram_graph):
    """propagate_affine == scale*propagate + shift, values and gradients
    (the hypercube path fuses the epilogue into the kernel output cast)."""
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    rng_ = np.random.default_rng(17)
    xh = jnp.asarray(rng_.normal(size=(adj.n_out, 16)).astype(np.float32))

    got = spmm.propagate_affine(adj, xh, 0.25, 0.5)
    ref = spmm.propagate(adj, xh) * 0.25 + 0.5
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)

    seed = jnp.asarray(rng_.normal(size=xh.shape).astype(np.float32))
    ga = jax.grad(lambda q: jnp.sum(spmm.propagate_affine(adj, q, 0.25, 0.5) * seed))(xh)
    gr = jax.grad(lambda q: jnp.sum((spmm.propagate(adj, q) * 0.25 + 0.5) * seed))(xh)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gr), rtol=1e-5, atol=1e-6)

    # ELL fallback path keeps the same semantics.
    ell = spmm.build_ell(src, tgt, val, g.num_nodes)
    x2 = jnp.asarray(rng_.normal(size=(g.num_nodes, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm.propagate_affine(ell, x2, 2.0, -1.0)),
        np.asarray(spmm.propagate(ell, x2)) * 2.0 - 1.0,
        rtol=1e-5, atol=1e-6,
    )


def test_rs_only_bank_mode_matches_dual(trigram_graph):
    """Memory-lean bank_layouts='rs' (no g-major banks on device) gives the
    same propagation values and gradients as the dual-layout build, on both
    the einsum and the Pallas (interpret) paths."""
    from protgram_directgcn_tpu.ops.hypercube import hypercube_bank_bytes
    from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    dual = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    lean = hypercube.build_hypercube(src, tgt, val, codes, alpha, bank_layouts="rs")
    assert lean.wf_gm is None and lean.wb_gm is None
    a_dim, g_dim = lean.d.shape
    assert hypercube_bank_bytes(g_dim, a_dim, 4, "rs") < hypercube_bank_bytes(
        g_dim, a_dim, 4, "dual"
    )

    rng_ = np.random.default_rng(23)
    xh = jnp.asarray(rng_.normal(size=(lean.n_out, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm.propagate(lean, xh)),
        np.asarray(spmm.propagate(dual, xh)),
        rtol=1e-5, atol=1e-6,
    )
    seed = jnp.asarray(rng_.normal(size=xh.shape).astype(np.float32))
    gl = jax.grad(lambda q: jnp.sum(spmm.propagate(lean, q) * seed))(xh)
    gd = jax.grad(lambda q: jnp.sum(spmm.propagate(dual, q) * seed))(xh)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gd), rtol=1e-5, atol=1e-6)

    # Pallas K1 r-major variant (interpret mode).
    x128 = jnp.asarray(
        rng_.normal(size=(a_dim, g_dim, 128)).astype(np.float32)
    )
    out_rs = apply_hyper_pallas(
        lean.d, lean.wf_rs, lean.wb_rs, x128, interpret=True, w1_is_gm=False
    )
    out_gm = apply_hyper_pallas(
        dual.d, dual.wf_gm, dual.wb_rs, x128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_rs), np.asarray(out_gm), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("feat", [32, 64, 192])
def test_pallas_kernels_non128_feature_dims(trigram_graph, feat):
    """Mosaic's equal-dims escape admits any F <= 256; values must match the
    dense oracle (interpret mode)."""
    from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    a_dim, g_dim = adj.d.shape
    rng_ = np.random.default_rng(29)
    x = rng_.normal(size=(g.num_nodes, feat)).astype(np.float32)
    xh = hypercube.embed_features(adj, jnp.asarray(x)).reshape(a_dim, g_dim, feat)
    out = apply_hyper_pallas(adj.d, adj.wf_gm, adj.wb_rs, xh, interpret=True)
    got = np.asarray(out).reshape(-1, feat)[np.asarray(adj.node_map)]
    np.testing.assert_allclose(
        got, _dense_oracle(src, tgt, val, g.num_nodes, x), rtol=1e-4, atol=1e-5
    )


def test_to_device_falls_back_to_lean_banks_under_budget(trigram_graph):
    """to_device(mode='hypercube') picks dual banks when they fit the HBM
    budget and the memory-lean rs banks otherwise."""
    from protgram_directgcn_tpu.ops.hypercube import hypercube_bank_bytes

    g = trigram_graph
    dual = g.to_device(mode="hypercube", feat_dim=16)
    assert dual.p_in.wf_gm is not None
    a_dim, g_dim = dual.p_in.d.shape
    # A budget between the rs and dual padded footprints forces rs.
    rs_bytes = hypercube_bank_bytes(g_dim, a_dim, 4, "rs")
    dual_bytes = hypercube_bank_bytes(g_dim, a_dim, 4, "dual")
    budget = 3 * (rs_bytes + dual_bytes) // 2
    lean = g.to_device(mode="hypercube", feat_dim=16, hbm_budget=budget)
    assert lean.p_in.wf_gm is None and lean.p_in.wb_gm is None
    # A budget below the rs footprint falls through to the packed banks.
    pk_bytes = hypercube_bank_bytes(g_dim, a_dim, 4, "pk")
    packed = g.to_device(
        mode="hypercube", feat_dim=16, hbm_budget=3 * (pk_bytes + rs_bytes) // 2
    )
    assert packed.p_in.bank_layout == "pk"
    # Same propagation any way.
    import numpy as np
    from protgram_directgcn_tpu.ops import spmm
    x = jnp.asarray(np.random.default_rng(31).normal(size=(dual.num_nodes, 8)).astype(np.float32))
    want = np.asarray(spmm.propagate(dual.p_out, x))
    np.testing.assert_allclose(
        np.asarray(spmm.propagate(lean.p_out, x)), want, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(spmm.propagate(packed.p_out, x)), want, rtol=1e-5, atol=1e-6
    )


def test_pk_bank_mode_matches_dual(trigram_graph):
    """Packed bank_layouts='pk' ([A*A, G] banks, near-zero tile padding)
    gives the same propagation values and gradients as the dual-layout
    build, on both the einsum and the Pallas (interpret) paths."""
    from protgram_directgcn_tpu.ops.hypercube import hypercube_bank_bytes
    from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    dual = hypercube.build_hypercube(src, tgt, val, codes, alpha)
    pk = hypercube.build_hypercube(src, tgt, val, codes, alpha, bank_layouts="pk")
    assert pk.bank_layout == "pk" and pk.wf_gm is None
    a_dim, g_dim = pk.d.shape
    assert pk.wf_rs.shape == (a_dim * a_dim, g_dim)
    # Packed is the leanest footprint of the three modes.
    assert hypercube_bank_bytes(g_dim, a_dim, 4, "pk") <= hypercube_bank_bytes(
        g_dim, a_dim, 4, "rs"
    )

    rng_ = np.random.default_rng(41)
    xh = jnp.asarray(rng_.normal(size=(pk.n_out, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm.propagate(pk, xh)),
        np.asarray(spmm.propagate(dual, xh)),
        rtol=1e-5, atol=1e-6,
    )
    seed = jnp.asarray(rng_.normal(size=xh.shape).astype(np.float32))
    gp = jax.grad(lambda q: jnp.sum(spmm.propagate_affine(pk, q, 0.25, 0.5) * seed))(xh)
    gd = jax.grad(lambda q: jnp.sum(spmm.propagate_affine(dual, q, 0.25, 0.5) * seed))(xh)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), rtol=1e-5, atol=1e-6)

    # Pallas packed kernels (interpret mode) against the dual-mode kernels.
    x128 = jnp.asarray(rng_.normal(size=(a_dim, g_dim, 128)).astype(np.float32))
    out_pk = apply_hyper_pallas(
        pk.d, pk.wf_rs, pk.wb_rs, x128, interpret=True, w_layout="pk"
    )
    out_gm = apply_hyper_pallas(dual.d, dual.wf_gm, dual.wb_rs, x128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_pk), np.asarray(out_gm), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("layouts", ["dual", "rs", "pk"])
def test_propagate_hyper_transpose_matches_oracle(trigram_graph, layouts):
    """Mᵀx via the swapped-bank kernel pair equals the dense transpose (the
    staged trainer's manual path backward calls this directly)."""
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha, bank_layouts=layouts)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(adj.n_out, 8)).astype(np.float32)
    out = np.asarray(spmm.propagate_transpose(adj, jnp.asarray(x)))
    at = np.zeros((adj.n_out, adj.n_out), dtype=np.float64)
    hyper = np.asarray(adj.node_map)
    np.add.at(at, (hyper[np.asarray(tgt)], hyper[np.asarray(src)]), val)
    np.testing.assert_allclose(out, at.T @ x, rtol=1e-4, atol=1e-4)
