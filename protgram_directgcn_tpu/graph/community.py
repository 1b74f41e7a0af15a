"""First-party Louvain community detection (numpy/CSR).

Replaces the reference's dependency on python-louvain
(reference: protgram_directgcn_trainer.py:167-170, 200-220), used for
(a) community task labels and (b) the METIS-fallback cluster partitioner.

Standard two-phase Louvain over a weighted undirected graph:
phase 1 greedily moves nodes to the neighboring community with the best
modularity gain; phase 2 aggregates communities into super-nodes; repeat
until no gain.  Deterministic under a seed (node visit order is the seeded
permutation, mirroring the reference passing random_state to best_partition).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as sp


def _one_level(adj: sp.csr_matrix, m2: float, rng: np.random.Generator) -> Tuple[np.ndarray, bool]:
    """One greedy modularity-optimization sweep. Returns (community, improved)."""
    n = adj.shape[0]
    comm = np.arange(n)
    k = np.asarray(adj.sum(axis=1)).ravel()  # weighted degree (incl. self-loops)
    self_loops = adj.diagonal()
    comm_tot = k.copy()  # sum of degrees per community
    indptr, indices, data = adj.indptr, adj.indices, adj.data

    improved_any = False
    for _ in range(100):  # sweep limit
        moved = 0
        for v in rng.permutation(n):
            cv = comm[v]
            lo, hi = indptr[v], indptr[v + 1]
            nbr, wts = indices[lo:hi], data[lo:hi]
            # Weights from v to each neighboring community (excluding self-loop).
            mask = nbr != v
            if not mask.any() and k[v] == self_loops[v]:
                continue
            ncomm = comm[nbr[mask]]
            nw = wts[mask]
            # Remove v from its community.
            comm_tot[cv] -= k[v]
            uniq, inv = np.unique(ncomm, return_inverse=True)
            w_to = np.bincount(inv, weights=nw)
            # Modularity gain of joining community c: w_to(c) - k_v * tot(c) / 2m
            gains = w_to - k[v] * comm_tot[uniq] / m2
            # Staying put (back in cv) gain:
            cv_pos = np.nonzero(uniq == cv)[0]
            stay_gain = gains[cv_pos[0]] if len(cv_pos) else -k[v] * comm_tot[cv] / m2
            best = int(np.argmax(gains)) if len(gains) else -1
            if best >= 0 and gains[best] > stay_gain + 1e-12:
                comm[v] = int(uniq[best])
                moved += 1
            comm_tot[comm[v]] += k[v]
        if moved == 0:
            break
        improved_any = True
    return comm, improved_any


def louvain_communities(adj: sp.spmatrix, seed: int = 42, max_levels: int = 20) -> np.ndarray:
    """Community label per node (consecutive ints, 0..C-1).

    `adj` is treated as undirected: it is symmetrized (W + Wᵀ)/1 with
    duplicate entries summed; self-loops allowed.
    """
    n = adj.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    w = adj.tocsr().astype(np.float64)
    w = (w + w.T) / 2.0
    w.sum_duplicates()
    if w.nnz == 0:
        return np.zeros(n, dtype=np.int64)
    rng = np.random.default_rng(seed)

    labels = np.arange(n)
    current = w
    for _ in range(max_levels):
        m2 = current.sum()  # = 2m for symmetric matrices counting both triangles
        if m2 <= 0:
            break
        comm, improved = _one_level(current.tocsr(), m2, rng)
        # Relabel to consecutive.
        uniq, comm = np.unique(comm, return_inverse=True)
        labels = comm[labels]
        if not improved or len(uniq) == current.shape[0]:
            break
        # Aggregate: super-node adjacency.
        c = current.tocoo()
        current = sp.coo_matrix(
            (c.data, (comm[c.row], comm[c.col])), shape=(len(uniq), len(uniq))
        ).tocsr()
        current.sum_duplicates()

    # Deterministic consecutive relabeling (reference sorts unique labels,
    # protgram_directgcn_trainer.py:214-219).
    uniq, out = np.unique(labels, return_inverse=True)
    return out.astype(np.int64)


def modularity(adj: sp.spmatrix, labels: np.ndarray) -> float:
    """Newman modularity of a partition (for tests/diagnostics)."""
    w = adj.tocsr().astype(np.float64)
    w = (w + w.T) / 2.0
    m2 = w.sum()
    if m2 == 0:
        return 0.0
    k = np.asarray(w.sum(axis=1)).ravel()
    c = w.tocoo()
    intra = c.data[labels[c.row] == labels[c.col]].sum()
    tot = np.bincount(labels, weights=k)
    return float(intra / m2 - np.sum((tot / m2) ** 2))
