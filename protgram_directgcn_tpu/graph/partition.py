"""Graph partitioning: Cluster-GCN mini-batching and multi-chip placement.

First-party replacement for the reference's METIS / Louvain partitioners
(reference: protgram_directgcn_trainer.py:152-198).  Three strategies:

- ``block``:   contiguous node ranges.  On sorted n-gram vocabularies this is
               locality-aware for free (n-grams sharing prefixes are
               neighbors in id space and share most of their out-targets),
               and it is the natural multi-chip sharding (each device owns a
               contiguous id range — cheap ownership tests).
- ``bfs``:     seeded multi-source BFS region growing with balanced sizes
               (greedy Cluster-GCN-style partitioner).
- ``louvain``: Louvain communities bin-packed into the requested number of
               parts (the reference's fallback path).
"""

from __future__ import annotations

import collections
from typing import List

import numpy as np
import scipy.sparse as sp

from protgram_directgcn_tpu.graph.community import louvain_communities


def partition_block(n: int, num_parts: int) -> np.ndarray:
    """Contiguous equal ranges."""
    return np.minimum((np.arange(n) * num_parts) // max(n, 1), num_parts - 1)


def partition_bfs(adj: sp.spmatrix, num_parts: int, seed: int = 42) -> np.ndarray:
    """Balanced multi-source BFS region growing over the symmetrized graph."""
    n = adj.shape[0]
    if num_parts <= 1 or n == 0:
        return np.zeros(n, dtype=np.int64)
    a = adj.tocsr()
    a = a + a.T
    indptr, indices = a.indptr, a.indices
    rng = np.random.default_rng(seed)
    target = int(np.ceil(n / num_parts))

    labels = np.full(n, -1, dtype=np.int64)
    seeds = rng.choice(n, size=num_parts, replace=False)
    frontiers: List[collections.deque] = []
    sizes = np.zeros(num_parts, dtype=np.int64)
    for p, s in enumerate(seeds):
        if labels[s] == -1:
            labels[s] = p
            sizes[p] = 1
        frontiers.append(collections.deque([s]))

    active = True
    while active:
        active = False
        for p in range(num_parts):
            if sizes[p] >= target or not frontiers[p]:
                continue
            v = frontiers[p].popleft()
            for u in indices[indptr[v] : indptr[v + 1]]:
                if labels[u] == -1 and sizes[p] < target:
                    labels[u] = p
                    sizes[p] += 1
                    frontiers[p].append(u)
            if frontiers[p]:
                active = True

    # Unreached nodes (disconnected): assign to smallest parts.
    for v in np.nonzero(labels == -1)[0]:
        p = int(np.argmin(sizes))
        labels[v] = p
        sizes[p] += 1
    return labels


def partition_louvain(adj: sp.spmatrix, num_parts: int, seed: int = 42) -> np.ndarray:
    """Louvain communities greedily bin-packed into num_parts balanced parts."""
    comm = louvain_communities(adj, seed=seed)
    n = len(comm)
    if n == 0:
        return comm
    sizes = np.bincount(comm)
    order = np.argsort(sizes)[::-1]  # largest communities first
    part_sizes = np.zeros(num_parts, dtype=np.int64)
    comm_to_part = np.zeros(len(sizes), dtype=np.int64)
    for c in order:
        p = int(np.argmin(part_sizes))
        comm_to_part[c] = p
        part_sizes[p] += sizes[c]
    return comm_to_part[comm]


def partition_nodes(adj: sp.spmatrix, num_parts: int, method: str = "bfs", seed: int = 42) -> np.ndarray:
    if method == "block":
        return partition_block(adj.shape[0], num_parts)
    if method == "bfs":
        return partition_bfs(adj, num_parts, seed)
    if method == "louvain":
        return partition_louvain(adj, num_parts, seed)
    raise ValueError(f"Unknown partition method: {method}")


def edge_cut_fraction(adj: sp.spmatrix, labels: np.ndarray) -> float:
    """Fraction of edges crossing partitions (diagnostic / test metric)."""
    c = adj.tocoo()
    if c.nnz == 0:
        return 0.0
    return float(np.mean(labels[c.row] != labels[c.col]))
