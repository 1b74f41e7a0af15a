"""G-sharded hypercube SpMM tests (8 virtual CPU devices).

The sharded format (parallel/hyper_shard.py) must reproduce the single-chip
hypercube propagation (ops/hypercube.py) exactly — same factorisation, the
two relayouts turned into all-to-alls.  Oracle: dense float64 matvec.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protgram_directgcn_tpu.ops.hypercube import (
    build_hypercube,
    propagate_hyper,
    vocab_char_codes,
)
from protgram_directgcn_tpu.parallel.halo import active_mesh
from protgram_directgcn_tpu.parallel.hyper_shard import (
    HyperShardAdj,
    build_hyper_shard,
    build_hyper_shard_tables,
    propagate_hyper_shard,
)
from protgram_directgcn_tpu.parallel.mesh import make_mesh


def ngram_coo(alphabet=6, n=3, deg=3, seed=0):
    """Suffix-overlapping n-gram transition graph + per-node codes."""
    rng = np.random.default_rng(seed)
    letters = np.array(list("ACDEFGHIKLMNPQRSTVWY"[:alphabet]))
    num = alphabet**n
    codes = np.stack(
        np.meshgrid(*[np.arange(alphabet)] * n, indexing="ij"), -1
    ).reshape(num, n)
    src = np.repeat(np.arange(num, dtype=np.int64), deg)
    sfx = np.repeat(codes[:, 1:] @ (alphabet ** np.arange(n - 2, -1, -1)), deg)
    tgt = sfx * alphabet + rng.integers(0, alphabet, num * deg)
    # Add self loops (the diagonal path).
    src = np.concatenate([src, np.arange(num, dtype=np.int64)])
    tgt = np.concatenate([tgt, np.arange(num, dtype=np.int64)])
    pairs, counts = np.unique(np.stack([src, tgt], 1), axis=0, return_counts=True)
    w = counts.astype(np.float32) * 0.25
    return pairs[:, 0], pairs[:, 1], w, codes, alphabet, num


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_hyper_shard_matches_dense_and_single_chip(shards):
    src, tgt, w, codes, alpha, num = ngram_coo()
    g_keys = alpha ** (codes.shape[1] - 1)
    adj_s = build_hyper_shard(src, tgt, w, codes, alpha, shards)
    adj_1 = build_hypercube(src, tgt, w, codes, alpha)
    mesh = make_mesh(shards, feat_axis=1)

    f = 8
    rng = np.random.default_rng(1)
    x_real = rng.standard_normal((num, f)).astype(np.float32)

    # Single-chip reference on the same values (hypercube flat space == real
    # space here because the synthetic graph covers the full hypercube).
    out_1 = np.asarray(propagate_hyper(adj_1, jnp.asarray(x_real)))

    # Sharded: scatter into the padded-G flat space via node_map.
    x_pad = np.zeros((adj_s.n_out, f), np.float32)
    x_pad[np.asarray(adj_s.node_map)] = x_real
    with active_mesh(mesh):
        out_s = np.asarray(
            jax.jit(lambda a, x: propagate_hyper_shard(a, x))(adj_s, jnp.asarray(x_pad))
        )
    out_s_real = out_s[np.asarray(adj_s.node_map)]
    np.testing.assert_allclose(out_s_real, out_1, rtol=1e-5, atol=1e-5)

    # Dense float64 oracle.
    dense = np.zeros((num, num))
    np.add.at(dense, (tgt.astype(int), src.astype(int)), w.astype(np.float64))
    np.testing.assert_allclose(out_s_real, dense @ x_real.astype(np.float64),
                               rtol=1e-4, atol=1e-4)


def test_hyper_shard_affine_and_grad():
    src, tgt, w, codes, alpha, num = ngram_coo(alphabet=5, n=2, deg=2)
    shards = 4
    adj_s = build_hyper_shard(src, tgt, w, codes, alpha, shards)
    mesh = make_mesh(shards, feat_axis=1)
    f = 4
    rng = np.random.default_rng(2)
    x_real = rng.standard_normal((num, f)).astype(np.float32)
    x_pad = np.zeros((adj_s.n_out, f), np.float32)
    nm = np.asarray(adj_s.node_map)
    x_pad[nm] = x_real

    dense = np.zeros((num, num))
    np.add.at(dense, (tgt.astype(int), src.astype(int)), w.astype(np.float64))

    with active_mesh(mesh):
        out = np.asarray(
            jax.jit(lambda a, x: propagate_hyper_shard(a, x, 0.5, 0.25))(
                adj_s, jnp.asarray(x_pad)
            )
        )
        np.testing.assert_allclose(
            out[nm], 0.5 * (dense @ x_real.astype(np.float64)) + 0.25,
            rtol=1e-4, atol=1e-4,
        )

        # Gradient: d(sum(Mx))/dx = Mᵀ 1 at real slots, 0 at padded slots.
        grad = jax.jit(
            jax.grad(lambda x: jnp.sum(propagate_hyper_shard(adj_s, x)))
        )(jnp.asarray(x_pad))
        want = dense.T @ np.ones((num, f))
        np.testing.assert_allclose(np.asarray(grad)[nm], want, rtol=1e-4, atol=1e-4)


def test_hyper_shard_tables_are_exact_permutations():
    """Every real node id appears exactly once on each side of both
    exchanges (the relayouts are permutations, no loss, no duplication)."""
    a, g, d = 7, 49, 4
    t = build_hyper_shard_tables(a, g, d)
    gd = -(-g // d)
    # Assembled positions cover every real id exactly once.
    asm = np.asarray(t.asm_gc)
    real_slots = asm < d * t.send_gc.shape[2]
    # Count of real assembled slots across shards == number of real ids.
    assert int(real_slots.sum()) == a * g
    asm2 = np.asarray(t.asm_rg)
    assert int((asm2 < d * t.send_rg.shape[2]).sum()) == a * g


def test_trainer_distributed_hypercube_mode(toy_fasta, tmp_path):
    """parallel.mode=hypercube trains an n=2 level end-to-end on the mesh
    and returns real-node embeddings."""
    from test_trainer_distributed import dist_config

    from protgram_directgcn_tpu.graph.structure import NgramGraph
    from protgram_directgcn_tpu.pipeline.labels import generate_labels
    from protgram_directgcn_tpu.pipeline.trainer import HierarchicalTrainer

    # Dense synthetic 2-gram graph (the toy FASTA's 18-node vocab is too
    # sparse for the hypercube density guard).
    src, tgt, w, codes, alpha, num = ngram_coo(alphabet=6, n=2, deg=3, seed=3)
    letters = np.array(list("ACDEFG"))
    vocab = np.array(["".join(letters[c]) for c in codes])
    g = NgramGraph(n=2, vocab=vocab, src=src.astype(np.int32),
                   tgt=tgt.astype(np.int32), weight=w)
    cfg = dist_config(tmp_path, "hypercube", mesh_nodes=4,
                      use_early_stopping=False, use_lr_scheduler=False)
    trainer = HierarchicalTrainer(cfg)
    x = np.random.default_rng(0).standard_normal((g.num_nodes, 16)).astype(np.float32)
    y, nc = generate_labels(g, "next_node", seed=0)
    params, embeds, model_cfg, dg = trainer.train_level(g, x, y, nc)
    assert isinstance(dg.p_in, HyperShardAdj)
    assert embeds.shape == (g.num_nodes, cfg.gcn.hidden_layer_dims[-1])
    assert np.isfinite(embeds).all()
    norms = np.linalg.norm(embeds, axis=1)
    np.testing.assert_allclose(norms, np.ones_like(norms), rtol=1e-3)


@pytest.mark.parametrize("shards", [2, 8])
def test_hyper_shard_tri_matches_three_propagations(shards):
    """The batched-exchange tri operator (one all_to_all pair per direction)
    equals three independent propagations, forward and backward."""
    from protgram_directgcn_tpu.parallel.hyper_shard import (
        HyperShardTri,
        propagate_hyper_shard_tri,
    )

    f = 8
    adjs = []
    for seed in range(3):
        src, tgt, w, codes, alpha, num = ngram_coo(seed=seed)
        adjs.append(build_hyper_shard(src, tgt, w, codes, alpha, shards))
    tri = HyperShardTri(adjs=tuple(adjs))
    mesh = make_mesh(shards, feat_axis=1)
    rng = np.random.default_rng(2)
    xs = tuple(
        jnp.asarray(rng.standard_normal((adjs[0].n_out, f)).astype(np.float32)
                    .reshape(adjs[0].alphabet, adjs[0].g_padded, f))
        for _ in range(3)
    )
    with active_mesh(mesh):
        outs = jax.jit(lambda t, a, b, c: propagate_hyper_shard_tri(t, a, b, c))(
            tri, *xs
        )
        refs = [
            np.asarray(jax.jit(lambda a, x: propagate_hyper_shard(a, x))(adj, x))
            for adj, x in zip(adjs, xs)
        ]
        for o, r in zip(outs, refs):
            np.testing.assert_allclose(np.asarray(o), r, rtol=1e-5, atol=1e-5)

        # Backward: d/dx of sum(P_i x_i * g_i) must equal P_i^T g_i.
        gs = [rng.standard_normal(np.asarray(o).shape).astype(np.float32) for o in outs]

        def loss(a, b, c):
            o = propagate_hyper_shard_tri(tri, a, b, c)
            return sum(jnp.sum(oi * gi) for oi, gi in zip(o, gs))

        dxs = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*xs)
        for adj, gi, dx in zip(adjs, gs, dxs):
            ref = np.asarray(
                jax.jit(
                    lambda a, x: propagate_hyper_shard(a, x)
                )(adj, jnp.asarray(gi))
            )
            # propagate of g through the TRANSPOSE = adj with swapped banks.
            from protgram_directgcn_tpu.parallel.hyper_shard import hyper_shard_propagate

            ref_t = np.asarray(
                jax.jit(
                    lambda x: hyper_shard_propagate(adj, x, mesh, transpose=True)
                )(jnp.asarray(gi))
            )
            np.testing.assert_allclose(np.asarray(dx), ref_t, rtol=1e-5, atol=1e-5)
