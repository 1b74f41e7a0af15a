"""SpMM format equivalence + gradient tests.

All formats must compute out[i] = sum over edges (j->i) of w * x[j]
(the PyG source→target sum-aggregation semantics,
reference: protgram_directgcn.py:100-140)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.ops import spmm
from tests.conftest import random_graph_arrays


def dense_oracle(src, tgt, w, n, x):
    at = np.zeros((n, n), dtype=np.float64)
    np.add.at(at, (tgt, src), w)
    return at @ x


@pytest.fixture
def graph_and_x(rng):
    n = 60
    src, tgt, w = random_graph_arrays(rng, n=n, e=400)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    return n, src, tgt, w, x


@pytest.mark.parametrize("mode", ["dense", "ell", "coo"])
def test_formats_match_oracle(graph_and_x, mode):
    n, src, tgt, w, x = graph_and_x
    adj = spmm.build_adjacency(src, tgt, w, n, mode=mode)
    out = np.asarray(spmm.propagate(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense_oracle(src, tgt, w, n, x), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["dense", "ell", "coo"])
def test_gradients_match_transpose(graph_and_x, mode):
    n, src, tgt, w, x = graph_and_x
    adj = spmm.build_adjacency(src, tgt, w, n, mode=mode)
    g = np.random.default_rng(1).normal(size=(n, 32)).astype(np.float32)

    def loss(xv):
        return jnp.sum(spmm.propagate(adj, xv) * jnp.asarray(g))

    dx = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    # d/dx of sum(A^T x * g) = A g
    at = np.zeros((n, n))
    np.add.at(at, (tgt, src), w)
    np.testing.assert_allclose(dx, at.T @ g, rtol=1e-4, atol=1e-4)


def test_ell_transpose_orientation(graph_and_x):
    n, src, tgt, w, x = graph_and_x
    adj = spmm.build_adjacency(src, tgt, w, n, mode="ell")
    # Padded slots: weights zero.
    assert np.asarray(adj.w).min() >= 0
    deg = np.bincount(tgt, minlength=n)
    assert adj.idx.shape[1] >= deg.max()
    # The transpose orientation computes A x.
    out_t = np.asarray(spmm._ell_apply(adj.idx_t, adj.w_t, jnp.asarray(x)))
    at = np.zeros((n, n))
    np.add.at(at, (tgt, src), w)
    np.testing.assert_allclose(out_t, at.T @ x, rtol=1e-4, atol=1e-4)


def test_rectangular_coo(rng):
    # n_out != n_in (subgraph/halo cases).
    src = np.array([0, 1, 2], np.int32)
    tgt = np.array([0, 0, 1], np.int32)
    w = np.array([1.0, 2.0, 3.0], np.float32)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    adj = spmm.build_coo(src, tgt, w, n_out=2, n_in=3)
    out = np.asarray(spmm.propagate(adj, jnp.asarray(x)))
    expect = np.stack([x[0] + 2 * x[1], 3 * x[2]])
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_choose_format_small_dense_large_ell():
    assert spmm.choose_format(5000, 5000, 5000 * 40, feat_dim=128) == "dense"
    assert spmm.choose_format(2_000_000, 2_000_000, 2_000_000 * 40, feat_dim=128) == "ell"


def test_empty_graph():
    adj = spmm.build_adjacency(
        np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0, np.float32), 4, mode="ell"
    )
    out = np.asarray(spmm.propagate(adj, jnp.ones((4, 8))))
    np.testing.assert_allclose(out, np.zeros((4, 8)))


def test_bucketed_matches_oracle(graph_and_x):
    n, src, tgt, w, x = graph_and_x
    adj = spmm.build_bucketed_ell(src, tgt, w, n)
    out = np.asarray(spmm.propagate(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense_oracle(src, tgt, w, n, x), rtol=1e-4, atol=1e-4)


def test_bucketed_gradients(graph_and_x):
    n, src, tgt, w, x = graph_and_x
    adj = spmm.build_bucketed_ell(src, tgt, w, n)
    g = np.random.default_rng(1).normal(size=(n, 32)).astype(np.float32)

    def loss(xv):
        return jnp.sum(spmm.propagate(adj, xv) * jnp.asarray(g))

    dx = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    at = np.zeros((n, n))
    np.add.at(at, (tgt, src), w)
    np.testing.assert_allclose(dx, at.T @ g, rtol=1e-4, atol=1e-4)


def test_bucketed_skewed_graph():
    """Hub row (degree 300) + many degree-1 rows: padding must stay small."""
    rng = np.random.default_rng(0)
    n = 400
    hub_src = rng.integers(0, n, 300).astype(np.int32)
    hub_tgt = np.zeros(300, np.int32)
    rest_src = rng.integers(0, n, n - 1).astype(np.int32)
    rest_tgt = np.arange(1, n, dtype=np.int32)
    src = np.concatenate([hub_src, rest_src])
    tgt = np.concatenate([hub_tgt, rest_tgt])
    w = np.ones(len(src), np.float32)
    adj = spmm.build_bucketed_ell(src, tgt, w, n)
    padded_slots = sum(int(i.shape[0] * i.shape[1]) for i in adj.idx)
    assert padded_slots < 3 * len(src)  # vs single-K ELL's ~300*n
    x = rng.normal(size=(n, 8)).astype(np.float32)
    out = np.asarray(spmm.propagate(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, dense_oracle(src, tgt, w, n, x), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["dense", "ell", "coo", "bucketed"])
def test_propagate_transpose_matches_oracle(graph_and_x, mode):
    """propagate_transpose computes Mᵀx directly — the staged trainer's
    manual per-path backward uses it in place of a jax.vjp that would
    recompute the forward propagation it does not need."""
    n, src, tgt, w, x = graph_and_x
    adj = (
        spmm.build_bucketed_ell(src, tgt, w, n)
        if mode == "bucketed"
        else spmm.build_adjacency(src, tgt, w, n, mode=mode)
    )
    out = np.asarray(spmm.propagate_transpose(adj, jnp.asarray(x)))
    at = np.zeros((n, n), dtype=np.float64)
    np.add.at(at, (tgt, src), w)
    np.testing.assert_allclose(out, at.T @ x, rtol=1e-4, atol=1e-4)
