"""SDDMM: gradients w.r.t. adjacency weights (opt-in via the static
``propagate(..., edge_grads=True)`` argument) vs a dense float64 oracle, on
every format.

The reference never learns edge weights (its adjacency is a preprocessed
constant, reference: graph_utils.py:198-287); this capability is the
"Pallas SpMM/SDDMM" kernel-family item of the BASELINE north star.  With
loss = sum(propagate(adj, x) * r), the dense oracle is
dw_dense[t, s] = <r[t], x[s]>.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.graph import transforms
from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
from protgram_directgcn_tpu.ops import hypercube, spmm


@pytest.fixture(scope="module")
def toy_coo():
    rng = np.random.default_rng(0)
    n = 40
    # Unique directed edges (duplicates would split gradient across slots).
    pairs = {(int(rng.integers(n)), int(rng.integers(n))) for _ in range(160)}
    src = np.array([p[0] for p in pairs], np.int64)
    tgt = np.array([p[1] for p in pairs], np.int64)
    w = rng.uniform(0.2, 1.0, len(src)).astype(np.float32)  # nonzero: real slots
    return src, tgt, w, n


def _oracle_dw(src, tgt, r, x):
    """dw_dense[t, s] = <r[t], x[s]> at each edge, float64."""
    return np.einsum(
        "ef,ef->e",
        r[tgt].astype(np.float64),
        x[src].astype(np.float64),
    )


def _loss_grad_w(adj, w_leaves, x, r):
    """Gradient of sum(propagate(adj, x) * r) w.r.t. the named weight leaves."""

    def loss(*ws):
        adj2 = adj.replace(**dict(zip(w_leaves, ws)))
        return jnp.sum(spmm.propagate(adj2, x, edge_grads=True) * r)

    return jax.grad(loss, argnums=tuple(range(len(w_leaves))))(
        *[getattr(adj, k) for k in w_leaves]
    )


def test_sddmm_ell_matches_oracle(toy_coo):
    src, tgt, w, n = toy_coo
    adj = spmm.build_ell(src, tgt, w, n)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    r = rng.normal(size=(n, 12)).astype(np.float32)
    (dw,) = _loss_grad_w(adj, ("w",), jnp.asarray(x), jnp.asarray(r))
    dw = np.asarray(dw)
    want = _oracle_dw(src, tgt, r, x)
    idx = np.asarray(adj.idx)
    wm = np.asarray(adj.w)
    # Each real slot (i, k) is the edge idx[i,k] -> i.
    for e in range(len(src)):
        slot = np.nonzero((idx[tgt[e]] == src[e]) & (wm[tgt[e]] != 0))[0]
        assert len(slot) == 1
        np.testing.assert_allclose(dw[tgt[e], slot[0]], want[e], rtol=1e-5)
    # Padding slots get exactly zero.
    assert np.all(dw[wm == 0] == 0.0)


def test_sddmm_ell_off_by_default(toy_coo):
    src, tgt, w, n = toy_coo
    adj = spmm.build_ell(src, tgt, w, n)
    x = jnp.ones((n, 4), jnp.float32)

    def loss(wv):
        return jnp.sum(spmm.propagate(adj.replace(w=wv), x))

    dw = np.asarray(jax.grad(loss)(adj.w))
    assert np.all(dw == 0.0)


def test_sddmm_coo_matches_oracle(toy_coo):
    src, tgt, w, n = toy_coo
    adj = spmm.build_coo(src, tgt, w, n)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    r = rng.normal(size=(n, 8)).astype(np.float32)
    (dw,) = _loss_grad_w(adj, ("w",), jnp.asarray(x), jnp.asarray(r))
    # adj.w is sorted by target; recover the permutation applied in build_coo.
    order = np.argsort(tgt, kind="stable")
    want = _oracle_dw(src, tgt, r, x)[order]
    np.testing.assert_allclose(np.asarray(dw), want, rtol=1e-5)


def test_sddmm_bucketed_matches_oracle(toy_coo):
    src, tgt, w, n = toy_coo
    adj = spmm.build_bucketed_ell(src, tgt, w, n)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    r = rng.normal(size=(n, 8)).astype(np.float32)

    def loss(wt):
        return jnp.sum(
            spmm.propagate(adj.replace(w=wt), jnp.asarray(x), edge_grads=True) * r
        )

    dw = jax.grad(loss)(adj.w)
    want = _oracle_dw(src, tgt, r, x)
    inv_perm = np.asarray(adj.inv_perm)
    orig_of_perm = np.empty(n, np.int64)
    orig_of_perm[inv_perm] = np.arange(n)
    # Assemble per-original-row (idx, w, dw) tables from the buckets.
    dw_full = np.zeros((n, max(np.asarray(b).shape[1] for b in adj.idx)))
    idx_full = np.zeros_like(dw_full, dtype=np.int64)
    w_full = np.zeros_like(dw_full)
    start = 0
    for bi, bw, bdw in zip(adj.idx, adj.w, dw):
        bi, bw, bdw = np.asarray(bi), np.asarray(bw), np.asarray(bdw)
        rows = bi.shape[0]
        for j in range(rows):
            t = orig_of_perm[start + j]
            dw_full[t, : bdw.shape[1]] = bdw[j]
            idx_full[t, : bi.shape[1]] = bi[j]
            w_full[t, : bw.shape[1]] = bw[j]
        start += rows
    for e in range(len(src)):
        slot = np.nonzero((idx_full[tgt[e]] == src[e]) & (w_full[tgt[e]] != 0))[0]
        assert len(slot) == 1
        np.testing.assert_allclose(
            dw_full[tgt[e], slot[0]], want[e], rtol=1e-4, atol=1e-6
        )


def test_sddmm_dense_native():
    """DenseAdj uses a plain dot — gradients w.r.t. the matrix are native."""
    rng = np.random.default_rng(4)
    n = 16
    at = rng.normal(size=(n, n)).astype(np.float32)
    x = rng.normal(size=(n, 6)).astype(np.float32)
    r = rng.normal(size=(n, 6)).astype(np.float32)

    def loss(a):
        return jnp.sum(spmm.propagate(spmm.DenseAdj(at=a), jnp.asarray(x)) * r)

    dat = np.asarray(jax.grad(loss)(jnp.asarray(at)))
    want = r.astype(np.float64) @ x.astype(np.float64).T
    np.testing.assert_allclose(dat, want, rtol=1e-4)


@pytest.fixture(scope="module")
def trigram_graph():
    seqs = [
        ("P1", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"),
        ("P2", "MKLVTAYIAKQRRQISFVK"),
        ("P3", "GLIEVQAPILSRVGDGTQDNLSGAEKAVQ"),
    ]
    return NgramGraphBuilder(n_max=3).build_from_sequences(seqs)[2]


@pytest.mark.parametrize("layouts", ["rs", "pk", "dual"])
def test_sddmm_hypercube_matches_oracle(trigram_graph, layouts):
    """Hypercube SDDMM: the per-key [A x A] outer-product contraction must
    put the dense-oracle gradient at each edge's bank coordinate."""
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    codes, alpha = hypercube.vocab_char_codes(g.vocab)
    adj = hypercube.build_hypercube(src, tgt, val, codes, alpha, bank_layouts=layouts)
    a = alpha
    gdim = a ** (codes.shape[1] - 1)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(g.num_nodes, 8)).astype(np.float32)
    r = rng.normal(size=(g.num_nodes, 8)).astype(np.float32)
    xh = hypercube.embed_features(adj, jnp.asarray(x))
    rh = np.asarray(hypercube.embed_features(adj, jnp.asarray(r)))

    leaves = (
        ("d", "wf_gm", "wb_gm", "wf_rs", "wb_rs") if layouts == "dual"
        else ("d", "wf_rs", "wb_rs")
    )
    grads = dict(zip(leaves, _loss_grad_w(adj, leaves, xh, jnp.asarray(rh))))

    # Replicate the builder's edge classification (ops/hypercube.py:177-220).
    pows = a ** np.arange(codes.shape[1] - 1, -1, -1, dtype=np.int64)
    hyper = np.asarray(codes, np.int64) @ pows
    pk = hyper // a
    sk = hyper % gdim
    first = np.asarray(codes)[:, 0]
    last = np.asarray(codes)[:, -1]
    want = _oracle_dw(src.astype(np.int64), tgt.astype(np.int64), r, x)

    dd = np.asarray(grads["d"], np.float64)
    dwf = np.asarray(grads["wf_gm" if layouts == "dual" else "wf_rs"], np.float64)
    dwb = np.asarray(grads["wb_rs"], np.float64)
    checked_f = checked_b = 0
    for e in range(len(src)):
        s, t = int(src[e]), int(tgt[e])
        if s == t:
            hp = hyper[s]
            np.testing.assert_allclose(dd[hp // gdim, hp % gdim], want[e], rtol=1e-4)
        elif sk[s] == pk[t]:  # A pattern -> K1 bank
            if layouts == "dual":  # g-major [G, A, A] (g, c, r)
                got = dwf[sk[s], last[t], first[s]]
            elif layouts == "pk":  # packed [A*A, G] (r*A + c, g)
                got = dwf.reshape(a, a, gdim)[first[s], last[t], sk[s]]
            else:  # r-major [A, G, A] (r, g, c)
                got = dwf[first[s], sk[s], last[t]]
            np.testing.assert_allclose(got, want[e], rtol=1e-4)
            checked_f += 1
        else:  # Aᵀ pattern -> K2 bank (always r-major except pk)
            assert pk[s] == sk[t]
            if layouts == "pk":
                got = dwb.reshape(a, a, gdim)[first[t], last[s], pk[s]]
            else:
                got = dwb[first[t], pk[s], last[s]]
            np.testing.assert_allclose(got, want[e], rtol=1e-4)
            checked_b += 1
    assert checked_f > 0 and checked_b > 0


def test_edge_gradients_context_is_deprecated_shim(toy_coo):
    """The legacy context still works as a trace-time default but warns;
    the explicit argument always wins over it."""
    import warnings

    src, tgt, w, n = toy_coo
    adj = spmm.build_ell(src, tgt, w, n)
    x = jnp.ones((n, 4), jnp.float32)

    def loss(wv):
        return jnp.sum(spmm.propagate(adj.replace(w=wv), x))

    with pytest.warns(DeprecationWarning):
        with spmm.edge_gradients():
            dw = np.asarray(jax.grad(loss)(adj.w))
    assert np.any(dw[np.asarray(adj.w) != 0] != 0.0)

    # Explicit False beats the context default.
    def loss_off(wv):
        return jnp.sum(spmm.propagate(adj.replace(w=wv), x, edge_grads=False))

    with pytest.warns(DeprecationWarning):
        with spmm.edge_gradients():
            dw_off = np.asarray(jax.grad(loss_off)(adj.w))
    assert np.all(dw_off == 0.0)
