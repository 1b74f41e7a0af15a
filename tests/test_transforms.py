"""Parity tests for the DirectGCN propagation math against an independent
dense-numpy oracle implementing the reference semantics
(reference: graph_utils.py:160-273)."""

import numpy as np
import pytest
import scipy.sparse as sp

from protgram_directgcn_tpu.graph import transforms
from tests.conftest import random_graph_arrays


def dense_propagation_oracle(a_w: np.ndarray, eps: float) -> np.ndarray:
    """Dense re-statement of 𝒜 = sqrt(0.5(A_n∘²+A_n∘²ᵀ)+ε)+I with ε only at
    stored (nonzero-pattern) positions."""
    n = a_w.shape[0]
    row_sum = a_w.sum(1)
    inv = np.divide(1.0, row_sum, out=np.zeros_like(row_sum), where=row_sum != 0)
    a_n = inv[:, None] * a_w
    p = a_n * a_n
    s = 0.5 * (p + p.T)
    pattern = (p != 0) | (p.T != 0)
    vals = np.where(pattern, np.sqrt(s + eps, where=pattern, out=np.zeros_like(s)), 0.0)
    return vals + np.eye(n)


def dense_undirected_oracle(src, tgt, n) -> np.ndarray:
    pairs = np.unique(np.stack([src, tgt], 1), axis=0)
    sym = np.unique(np.concatenate([pairs, pairs[:, ::-1]], 0), axis=0)
    rows = np.concatenate([sym[:, 0], np.arange(n)])
    cols = np.concatenate([sym[:, 1], np.arange(n)])
    deg = np.bincount(cols, minlength=n).astype(np.float64)
    dinv = np.divide(1.0, np.sqrt(deg), out=np.zeros(n), where=deg > 0)
    out = np.zeros((n, n))
    np.add.at(out, (rows, cols), dinv[rows] * dinv[cols])
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_propagation_matrix_matches_dense_oracle(seed):
    rng = np.random.default_rng(seed)
    src, tgt, w = random_graph_arrays(rng, n=40, e=250)
    a_w = transforms.coalesce_coo(src, tgt, w, 40)
    ours = transforms.directgcn_propagation_matrix(a_w, 1e-9).toarray()
    oracle = dense_propagation_oracle(a_w.toarray().astype(np.float64), 1e-9)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-7)


def test_propagation_matrix_is_symmetric(rng):
    src, tgt, w = random_graph_arrays(rng, n=30, e=120)
    a_w = transforms.coalesce_coo(src, tgt, w, 30)
    m = transforms.directgcn_propagation_matrix(a_w, 1e-9).toarray()
    np.testing.assert_allclose(m, m.T, rtol=1e-6)


def test_propagation_empty_graph():
    a_w = sp.csr_matrix((5, 5), dtype=np.float32)
    m = transforms.directgcn_propagation_matrix(a_w, 1e-9).toarray()
    np.testing.assert_allclose(m, np.eye(5))


def test_undirected_matches_dense_oracle(rng):
    src, tgt, w = random_graph_arrays(rng, n=35, e=150)
    ours = transforms.undirected_normalized_matrix(src, tgt, 35).toarray()
    oracle = dense_undirected_oracle(src, tgt, 35)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ours, ours.T, rtol=1e-6)


def test_undirected_self_loop_duplicate_summed():
    # Edge (0,0) exists in the raw edges; appended self-loop duplicates it and
    # the coalesce must SUM the two normalized entries (reference keeps
    # duplicates through normalization, graph_utils.py:177-195).
    src = np.array([0, 0], dtype=np.int32)
    tgt = np.array([0, 1], dtype=np.int32)
    m = transforms.undirected_normalized_matrix(src, tgt, 2).toarray()
    oracle = dense_undirected_oracle(src, tgt, 2)
    np.testing.assert_allclose(m, oracle, rtol=1e-6)
    # entry (0,0): two entries each 1/deg0; deg0 = 3 (0->0 twice... see oracle)
    assert m[0, 0] > 1.0 / m.shape[0]


def test_row_normalize_zero_rows(rng):
    a = sp.csr_matrix(np.array([[0, 2.0], [0, 0]], dtype=np.float32))
    out = transforms.row_normalize(a).toarray()
    np.testing.assert_allclose(out, [[0, 1.0], [0, 0]])
