"""Generate tiny raw-format dataset fixtures for the loader round-trip tests.

Writes, next to this script, hand-sized datasets in the EXACT raw on-disk
formats the production parsers consume (reference: the PyG Planetoid/WebKB
raw layouts the reference downloads, gnn_benchmarker.py:54-119):

- ``Cora/raw/ind.cora.*``      — standard Planetoid pickles with a SHUFFLED
  ``test.index`` so ``_parse_planetoid``'s test-row unshuffle is exercised.
- ``CiteSeer/raw/ind.citeseer.*`` — a gap in the test range (node 9 missing
  from test.index) so the isolated-test-node extension branch is exercised.
- ``Cornell/raw/out1_*.txt``   — WebKB tab/comma text format.

Ground truth (``<Name>_truth.npz``) is computed from the generator's own
node-order construction, NOT by calling the parsers — the raw files are
derived by inverting the parsers' documented transforms, so the round-trip
test is meaningful.  Deterministic: seeded rng only.
"""

import os
import pickle

import numpy as np
import scipy.sparse as sp

HERE = os.path.dirname(os.path.abspath(__file__))


def _onehot(y, c):
    out = np.zeros((len(y), c))
    out[np.arange(len(y)), y] = 1.0
    return out


def _write_planetoid(name, x_true, y_true, n_classes, n_train, test_idx_file_order,
                     graph_dict):
    """Derive the raw ``ind.<name>.*`` files from truth node order.

    The loader stacks [allx; tx_ext] (tx_ext row k = test-range position k,
    zero-filled over gaps) and then assigns
    ``x[test_idx[j]] = stacked[sort(test_idx)[j]]``.  Inverting: the row at
    sorted offset ``test_sorted[j] - start`` must hold the features of node
    ``test_idx[j]``, and ``tx`` keeps only the offsets present in
    test.index, in offset order.
    """
    lname = name.lower()
    raw = os.path.join(HERE, name, "raw")
    os.makedirs(raw, exist_ok=True)

    n = x_true.shape[0]
    # allx covers nodes [0, start_of_test_range); truth rows are node-ordered.
    test_sorted = np.sort(test_idx_file_order)
    start = int(test_sorted[0])
    n_allx = start

    allx = x_true[:n_allx].copy()
    ally = _onehot(y_true[:n_allx], n_classes)

    # Solve for tx such that the loader reproduces x_true.  Loader:
    #   stacked = [allx; tx(_ext)]            (row n_allx+k <- position k of
    #                                          the test range, after the
    #                                          CiteSeer gap extension)
    #   stacked[test_idx] = stacked[sort(test_idx)]   (RHS evaluated first)
    # Positions sort(test_idx)[j] = n_allx + offset_j where offset_j =
    # test_sorted[j] - start; their pre-assignment contents are
    # tx_ext[offset_j] .  After assignment node test_idx[j] holds
    # tx_ext[sort offset of j-th file entry].  Inverting:
    #   tx_ext[test_sorted[j] - start] = x_true[test_idx_file_order[j]]
    rng_len = n - start
    tx_ext = np.zeros((rng_len, x_true.shape[1]))
    ty_ext = np.zeros((rng_len, n_classes))
    for j, node in enumerate(test_idx_file_order):
        off = test_sorted[j] - start
        tx_ext[off] = x_true[node]
        ty_ext[off] = _onehot([y_true[node]], n_classes)[0]
    # tx holds only the rows present in test.index (sorted positions).
    present = np.isin(np.arange(start, n), test_sorted)
    tx = tx_ext[present]
    ty = ty_ext[present]

    objs = {
        "x": sp.csr_matrix(x_true[:n_train]),
        "y": _onehot(y_true[:n_train], n_classes),
        "allx": sp.csr_matrix(allx),
        "ally": ally,
        "tx": sp.csr_matrix(tx),
        "ty": ty,
        "graph": graph_dict,
    }
    for suffix, obj in objs.items():
        with open(os.path.join(raw, f"ind.{lname}.{suffix}"), "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(os.path.join(raw, f"ind.{lname}.test.index"),
               np.asarray(test_idx_file_order, np.int64), fmt="%d")


def make_cora():
    """12 nodes, 6 features, 3 classes; shuffled test.index [10, 8, 11, 9]."""
    rng = np.random.default_rng(0)
    n, f, c, n_train = 12, 6, 3, 3
    x = np.round(rng.random((n, f)) * (rng.random((n, f)) < 0.5), 3)
    y = rng.integers(0, c, n)
    test_idx = np.array([10, 8, 11, 9], np.int64)  # file order (shuffled)

    und = {(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
           (8, 9), (9, 10), (10, 11), (0, 4), (2, 7), (5, 11)}
    graph = {i: [] for i in range(n)}
    pairs = []
    for a, b in sorted(und):
        graph[a].append(b)
        graph[b].append(a)
        pairs += [(a, b), (b, a)]
    edges = np.unique(np.array(pairs, np.int64), axis=0)

    _write_planetoid("Cora", x, y, c, n_train, test_idx, graph)
    np.savez(os.path.join(HERE, "Cora_truth.npz"),
             x=x.astype(np.float32), y=y.astype(np.int64), edges=edges,
             n_train=np.int64(n_train), test_index=test_idx)


def make_citeseer():
    """12 nodes; test range 8..11 but node 9 absent from test.index →
    isolated test node: zero features, label 0 (argmax of a zero row)."""
    rng = np.random.default_rng(1)
    n, f, c, n_train = 12, 6, 3, 3
    x = np.round(rng.random((n, f)) * (rng.random((n, f)) < 0.5), 3)
    y = rng.integers(0, c, n)
    x[9] = 0.0  # isolated node: loader zero-fills its features
    y[9] = 0  # argmax of the zero-filled one-hot row
    test_idx = np.array([8, 10, 11], np.int64)  # sorted; 9 missing

    und = {(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
           (8, 10), (10, 11), (0, 3)}
    graph = {i: [] for i in range(n) if i != 9}
    pairs = []
    for a, b in sorted(und):
        graph[a].append(b)
        graph[b].append(a)
        pairs += [(a, b), (b, a)]
    edges = np.unique(np.array(pairs, np.int64), axis=0)

    _write_planetoid("CiteSeer", x, y, c, n_train, test_idx, graph)
    np.savez(os.path.join(HERE, "CiteSeer_truth.npz"),
             x=x.astype(np.float32), y=y.astype(np.int64), edges=edges,
             n_train=np.int64(n_train), test_index=test_idx)


def make_cornell():
    """10 nodes, 5 features, 3 classes in the WebKB text format."""
    rng = np.random.default_rng(2)
    n, f, c = 10, 5, 3
    x = (rng.random((n, f)) < 0.4).astype(np.float64)
    y = rng.integers(0, c, n)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, (25, 2)) if a != b})
    edges = np.unique(np.array(pairs, np.int64), axis=0)

    raw = os.path.join(HERE, "Cornell", "raw")
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, "out1_node_feature_label.txt"), "w") as fh:
        fh.write("node_id\tfeature\tlabel\n")
        for i in range(n):
            feat = ",".join(str(int(v)) for v in x[i])
            fh.write(f"{i}\t{feat}\t{int(y[i])}\n")
    with open(os.path.join(raw, "out1_graph_edges.txt"), "w") as fh:
        fh.write("source\ttarget\n")
        for a, b in pairs:
            fh.write(f"{a}\t{b}\n")
    np.savez(os.path.join(HERE, "Cornell_truth.npz"),
             x=x.astype(np.float32), y=y.astype(np.int64), edges=edges)


def make_pubmed():
    """14 nodes, 5 float (TF-IDF-like) features, 3 classes; CONTIGUOUS sorted
    test.index [11, 12, 13] — the standard Planetoid case with non-binary
    features (PubMed's distinguishing trait)."""
    rng = np.random.default_rng(3)
    n, f, c, n_train = 14, 5, 3, 3
    x = np.round(rng.random((n, f)) * (rng.random((n, f)) < 0.6), 4)
    y = rng.integers(0, c, n)
    test_idx = np.array([11, 12, 13], np.int64)

    und = {(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
           (8, 9), (9, 10), (10, 11), (11, 12), (12, 13), (0, 7), (3, 10)}
    graph = {i: [] for i in range(n)}
    pairs = []
    for a, b in sorted(und):
        graph[a].append(b)
        graph[b].append(a)
        pairs += [(a, b), (b, a)]
    edges = np.unique(np.array(pairs, np.int64), axis=0)

    _write_planetoid("PubMed", x, y, c, n_train, test_idx, graph)
    np.savez(os.path.join(HERE, "PubMed_truth.npz"),
             x=x.astype(np.float32), y=y.astype(np.int64), edges=edges,
             n_train=np.int64(n_train), test_index=test_idx)


def _make_webkb(name, seed, n, f, c, dup_edge=False):
    rng = np.random.default_rng(seed)
    x = (rng.random((n, f)) < 0.4).astype(np.float64)
    y = rng.integers(0, c, n)
    pairs = sorted({(int(a), int(b))
                    for a, b in rng.integers(0, n, (3 * n, 2)) if a != b})
    edges = np.unique(np.array(pairs, np.int64), axis=0)

    raw = os.path.join(HERE, name, "raw")
    os.makedirs(raw, exist_ok=True)
    with open(os.path.join(raw, "out1_node_feature_label.txt"), "w") as fh:
        fh.write("node_id\tfeature\tlabel\n")
        for i in range(n):
            feat = ",".join(str(int(v)) for v in x[i])
            fh.write(f"{i}\t{feat}\t{int(y[i])}\n")
    with open(os.path.join(raw, "out1_graph_edges.txt"), "w") as fh:
        fh.write("source\ttarget\n")
        for a, b in pairs:
            fh.write(f"{a}\t{b}\n")
        if dup_edge and pairs:
            a, b = pairs[0]
            fh.write(f"{a}\t{b}\n")  # duplicate row: parser must dedupe
    np.savez(os.path.join(HERE, f"{name}_truth.npz"),
             x=x.astype(np.float32), y=y.astype(np.int64), edges=edges)


def make_texas():
    """9 nodes; includes a DUPLICATE edge row (parser np.unique dedupe)."""
    _make_webkb("Texas", seed=4, n=9, f=4, c=3, dup_edge=True)


def make_wisconsin():
    """11 nodes, 6 features, 4 classes."""
    _make_webkb("Wisconsin", seed=5, n=11, f=6, c=4)


if __name__ == "__main__":
    make_cora()
    make_citeseer()
    make_cornell()
    make_pubmed()
    make_texas()
    make_wisconsin()
    print(f"fixtures written under {HERE}")
