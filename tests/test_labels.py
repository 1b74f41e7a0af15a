"""Label-generator semantics tests (reference: protgram_directgcn_trainer.py:200-269)."""

import numpy as np

from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
from protgram_directgcn_tpu.graph.structure import NgramGraph
from protgram_directgcn_tpu.pipeline.labels import (
    closest_aa_labels,
    community_labels,
    generate_labels,
    next_node_labels,
)


def small_graph():
    # 0 -> 1 (w=3), 0 -> 2 (w=3), 1 -> 2 (w=1), 3 isolated source-less
    return NgramGraph(
        n=1,
        vocab=np.array(["A", "C", "D", "E"]),
        src=np.array([0, 0, 1], np.int32),
        tgt=np.array([1, 2, 2], np.int32),
        weight=np.array([3.0, 3.0, 1.0], np.float32),
    )


def test_next_node_argmax_and_self():
    g = small_graph()
    labels, nc = next_node_labels(g, seed=0)
    assert nc == 4
    assert labels[0] in (1, 2)  # tie between max-weight successors
    assert labels[1] == 2
    assert labels[2] == 2  # no out-edges -> self
    assert labels[3] == 3


def test_next_node_tie_break_covers_both():
    g = small_graph()
    seen = {int(next_node_labels(g, seed=s)[0][0]) for s in range(30)}
    assert seen == {1, 2}


def test_next_node_deterministic_under_seed():
    g = small_graph()
    a, _ = next_node_labels(g, seed=5)
    b, _ = next_node_labels(g, seed=5)
    np.testing.assert_array_equal(a, b)


def test_community_two_cliques():
    # Two triangles joined by one weak edge -> 2 communities.
    src = np.array([0, 1, 2, 3, 4, 5, 2], np.int32)
    tgt = np.array([1, 2, 0, 4, 5, 3, 3], np.int32)
    w = np.array([5, 5, 5, 5, 5, 5, 0.1], np.float32)
    g = NgramGraph(n=1, vocab=np.array(list("ACDEFG")), src=src, tgt=tgt, weight=w)
    labels, nc = community_labels(g, seed=0)
    assert nc == 2
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4] == labels[5]
    assert labels[0] != labels[3]


def bfs_oracle_labels(g, k_hops, seed):
    """Per-node BFS oracle mirroring the reference BFS semantics
    (reference: protgram_directgcn_trainer.py:239-269)."""
    from protgram_directgcn_tpu.pipeline.labels import AMINO_ACID_ALPHABET

    n = g.num_nodes
    rng = np.random.default_rng(seed)
    targets = rng.integers(0, len(AMINO_ACID_ALPHABET), n)
    succ = [[] for _ in range(n)]
    for s, t in zip(g.src, g.tgt):
        succ[int(s)].append(int(t))
    labels = np.full(n, k_hops, dtype=np.int64)
    for v in range(n):
        aa = AMINO_ACID_ALPHABET[targets[v]]
        if aa in str(g.vocab[v]):
            labels[v] = 0
            continue
        frontier, visited, hop = [v], {v}, 0
        while frontier and hop < k_hops and labels[v] == k_hops:
            nxt = []
            for u in frontier:
                for w in succ[u]:
                    if w not in visited:
                        visited.add(w)
                        if aa in str(g.vocab[w]):
                            labels[v] = min(labels[v], hop + 1)
                        nxt.append(w)
            frontier, hop = nxt, hop + 1
    return labels


def test_closest_aa_matches_bfs_oracle():
    rng = np.random.default_rng(7)
    n = 30
    src = rng.integers(0, n, 80).astype(np.int32)
    tgt = rng.integers(0, n, 80).astype(np.int32)
    vocab = np.array([chr(ord("A") + (i % 26)) for i in range(n)])
    g = NgramGraph(n=1, vocab=vocab, src=src, tgt=tgt, weight=np.ones(80, np.float32))
    for seed in (0, 3, 9):
        labels, nc = closest_aa_labels(g, k_hops=3, seed=seed)
        assert nc == 4
        np.testing.assert_array_equal(labels, bfs_oracle_labels(g, 3, seed))


def test_closest_aa_unreachable_gets_k():
    g = NgramGraph(
        n=1, vocab=np.array(["B", "Z"]), src=np.empty(0, np.int32),
        tgt=np.empty(0, np.int32), weight=np.empty(0, np.float32),
    )
    labels, nc = closest_aa_labels(g, k_hops=2, seed=0)
    # Neither node contains any target amino acid (B, Z not in alphabet).
    assert (labels == 2).all()


def test_generate_labels_on_real_graph():
    g = NgramGraphBuilder(n_max=2).build_from_sequences(
        [("P1", "MKTAYIAKQR"), ("P2", "QDKTAYIAK")]
    )[1]
    for task in ("next_node", "community", "closest_aa"):
        labels, nc = generate_labels(g, task, k_hops=2, seed=1)
        assert len(labels) == g.num_nodes
        assert labels.min() >= 0
        assert labels.max() < nc
