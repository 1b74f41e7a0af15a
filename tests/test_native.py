"""Native C++ ETL kernels: build, correctness vs numpy, builder parity."""

import numpy as np
import pytest

from protgram_directgcn_tpu import native
from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")

SEQS = [("P1", "MKTAYIAKQR"), ("P2", "QDKTAYIAK"), ("P3", "MKQR")]


def test_pack_ngrams_matches_numpy():
    from protgram_directgcn_tpu.graph.builder import _pack_ngrams

    data = [np.frombuffer(b" MKTAYIAKQR ", dtype=np.uint8), np.frombuffer(b"QD ", dtype=np.uint8)]
    for n in (1, 2, 3, 5, 8):
        keys, counts = native.pack_ngrams_batch(data, n)
        ref = [(_pack_ngrams(b, n)) for b in data]
        np.testing.assert_array_equal(keys, np.concatenate(ref))
        np.testing.assert_array_equal(counts, [len(r) for r in ref])


def test_aggregate_and_merge():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 50, 1000).astype(np.uint64)
    ka, ca = native.aggregate_u64(a)
    uk, uc = np.unique(a, return_counts=True)
    np.testing.assert_array_equal(ka, uk)
    np.testing.assert_array_equal(ca, uc)

    b = rng.integers(25, 75, 500).astype(np.uint64)
    kb, cb = native.aggregate_u64(b)
    mk, mc = native.merge_aggregates(ka, ca, kb, cb)
    allk, allc = np.unique(np.concatenate([a, b]), return_counts=True)
    np.testing.assert_array_equal(mk, allk)
    np.testing.assert_array_equal(mc, allc)


def test_lookup_sorted():
    vocab = np.array([2, 5, 9, 11], dtype=np.uint64)
    keys = np.array([5, 3, 11, 2, 100], dtype=np.uint64)
    ids = native.lookup_sorted(vocab, keys)
    np.testing.assert_array_equal(ids, [1, -1, 3, 0, -1])


def test_emit_pairs_respects_sequence_boundaries():
    ids = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    counts = np.array([3, 2], dtype=np.int64)  # seq1: [0,1,2], seq2: [3,4]
    pairs = native.emit_pairs(ids, counts, 10)
    np.testing.assert_array_equal(pairs, [0 * 10 + 1, 1 * 10 + 2, 3 * 10 + 4])


def test_builder_native_equals_numpy():
    for n_max in (1, 3):
        g_native = NgramGraphBuilder(n_max=n_max, use_native=True).build_from_sequences(SEQS)
        g_numpy = NgramGraphBuilder(n_max=n_max, use_native=False).build_from_sequences(SEQS)
        for gn, gp in zip(g_native, g_numpy):
            assert gn.vocab.tolist() == gp.vocab.tolist()
            np.testing.assert_array_equal(gn.src, gp.src)
            np.testing.assert_array_equal(gn.tgt, gp.tgt)
            np.testing.assert_array_equal(gn.weight, gp.weight)
