"""Block-structured n-gram SpMM: oracle parity, gradients, auto-selection.

The block factorisation must reproduce exactly the same propagation as the
generic formats on all three DirectGCN matrices (𝒜_out, 𝒜_in, undirected
sym-norm — reference: graph_utils.py:198-287), since their patterns are
contained in union(A, Aᵀ, I) of the n-gram transition adjacency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
from protgram_directgcn_tpu.graph import transforms
from protgram_directgcn_tpu.ops import block, spmm
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
def test_block_matches_oracle_on_ngram_matrices(trigram_graph, matrix):
    g = trigram_graph
    m = getattr(g, matrix)()
    src, tgt, val = transforms.csr_to_coo_arrays(m)
    pk, sk, nk = block.ngram_node_keys(g.vocab)
    adj = block.build_block_ngram(src, tgt, val, g.num_nodes, pk, sk, nk)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(g.num_nodes, 16)).astype(np.float32)
    out = np.asarray(block.propagate_block(adj, jnp.asarray(x)))
    np.testing.assert_allclose(
        out, _dense_oracle(src, tgt, val, g.num_nodes, x), rtol=1e-4, atol=1e-5
    )


def test_block_gradients_match_transpose(trigram_graph):
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    pk, sk, nk = block.ngram_node_keys(g.vocab)
    adj = block.build_block_ngram(src, tgt, val, g.num_nodes, pk, sk, nk)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(g.num_nodes, 16)).astype(np.float32)
    grad_out = rng.normal(size=(g.num_nodes, 16)).astype(np.float32)

    def loss(xv):
        return jnp.sum(block.propagate_block(adj, xv) * jnp.asarray(grad_out))

    dx = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    at = np.zeros((g.num_nodes, g.num_nodes))
    np.add.at(at, (tgt, src), val)
    np.testing.assert_allclose(dx, at.T @ grad_out, rtol=1e-4, atol=1e-5)


def test_node_keys_group_sizes_alphabet_bounded(trigram_graph):
    pk, sk, nk = block.ngram_node_keys(trigram_graph.vocab)
    alphabet = len({c for s in trigram_graph.vocab for c in str(s)})
    assert np.bincount(pk, minlength=nk).max() <= alphabet
    assert np.bincount(sk, minlength=nk).max() <= alphabet
    # Sorted vocab => prefix keys non-decreasing (contiguous prefix groups).
    assert (np.diff(pk) >= 0).all()


def test_build_adjacency_selects_block_with_keys(trigram_graph):
    g = trigram_graph
    src, tgt, val = transforms.csr_to_coo_arrays(g.mathcal_a_out())
    keys = block.ngram_node_keys(g.vocab)
    adj = spmm.build_adjacency(src, tgt, val, g.num_nodes, mode="block", node_keys=keys)
    assert isinstance(adj, block.BlockNgramAdj)
    # propagate() dispatch covers the block type.
    x = np.random.default_rng(2).normal(size=(g.num_nodes, 8)).astype(np.float32)
    out = np.asarray(spmm.propagate(adj, jnp.asarray(x)))
    np.testing.assert_allclose(
        out, _dense_oracle(src, tgt, val, g.num_nodes, x), rtol=1e-4, atol=1e-5
    )


def test_block_rejects_unstructured_graph(rng):
    """A random graph does not factor over n-gram keys -> structure error."""
    n = 40
    src, tgt, w = random_graph_arrays(rng, n=n, e=300)
    vocab = np.sort(np.array([f"{i:03d}" for i in range(n)]))
    pk, sk, nk = block.ngram_node_keys(vocab)
    with pytest.raises(block.BlockStructureError):
        block.build_block_ngram(src, tgt, w, n, pk, sk, nk)
    # Auto mode with keys must fall back instead of raising.
    adj = spmm.build_adjacency(src, tgt, w, n, mode="auto", node_keys=(pk, sk, nk))
    assert not isinstance(adj, block.BlockNgramAdj)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    out = np.asarray(spmm.propagate(adj, jnp.asarray(x)))
    np.testing.assert_allclose(out, _dense_oracle(src, tgt, w, n, x), rtol=1e-4, atol=1e-4)
