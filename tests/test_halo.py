"""Halo-exchange distributed propagation: parity vs single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.parallel.halo import (
    build_halo_partition,
    halo_propagate,
    pad_node_features,
)
from protgram_directgcn_tpu.parallel.mesh import make_mesh
from tests.conftest import random_graph_arrays


def dense_oracle(src, tgt, w, n, x):
    at = np.zeros((n, n))
    np.add.at(at, (tgt, src), w)
    return at @ x


@pytest.mark.parametrize("n,shards", [(64, 8), (50, 4), (37, 8)])
def test_halo_propagate_matches_oracle(rng, n, shards):
    src, tgt, w = random_graph_arrays(rng, n=n, e=5 * n)
    f = 16
    x = rng.normal(size=(n, f)).astype(np.float32)
    part = build_halo_partition(src, tgt, w, n, shards)
    mesh = make_mesh(shards, feat_axis=1)
    x_pad = pad_node_features(x, part)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_dev = jax.device_put(jnp.asarray(x_pad), NamedSharding(mesh, P("nodes", None)))
    out = np.asarray(halo_propagate(part, x_dev, mesh))[:n]
    np.testing.assert_allclose(out, dense_oracle(src, tgt, w, n, x), rtol=1e-4, atol=1e-4)


def test_halo_propagate_differentiable(rng):
    n, shards = 48, 4
    src, tgt, w = random_graph_arrays(rng, n=n, e=4 * n)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    part = build_halo_partition(src, tgt, w, n, shards)
    mesh = make_mesh(shards, feat_axis=1)
    x_pad = jnp.asarray(pad_node_features(x, part))

    def loss(xv):
        return jnp.sum(halo_propagate(part, xv, mesh) ** 2)

    g = np.asarray(jax.grad(loss)(x_pad))[:n]
    # Compare against dense autodiff oracle.
    at = np.zeros((n, n))
    np.add.at(at, (tgt, src), w)
    want = 2 * at.T @ (at @ x)
    np.testing.assert_allclose(g, want, rtol=1e-3, atol=1e-3)


def test_halo_partition_no_crossing_edges_when_single_shard(rng):
    src, tgt, w = random_graph_arrays(rng, n=20, e=60)
    part = build_halo_partition(src, tgt, w, 20, 1)
    assert float(np.asarray(part.halo_w).sum()) == 0.0  # all edges local


def test_halo_partition_jit_under_mesh(rng):
    """halo_propagate must be jittable (single compile, reused)."""
    n, shards = 40, 8
    src, tgt, w = random_graph_arrays(rng, n=n, e=3 * n)
    part = build_halo_partition(src, tgt, w, n, shards)
    mesh = make_mesh(shards)
    x = jnp.asarray(pad_node_features(np.ones((n, 8), np.float32), part))
    fn = jax.jit(lambda xv: halo_propagate(part, xv, mesh))
    a = np.asarray(fn(x))
    b = np.asarray(fn(x * 2))
    np.testing.assert_allclose(b, 2 * a, rtol=1e-5)


def test_weak_scaling_harness_runs():
    from protgram_directgcn_tpu.bench.scaling import weak_scaling_report

    points = weak_scaling_report(nodes_per_shard=128, deg=4, feat_dim=8,
                                 shard_counts=[1, 2, 4], iters=2)
    assert [p.shards for p in points] == [1, 2, 4]
    assert points[0].efficiency == 1.0
    assert all(p.edges_per_s > 0 for p in points)


def test_distributed_directgcn_step_matches_single_device(toy_fasta):
    """Full DirectGCN training step through HaloAdj == single-device step."""
    import optax

    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.models.directgcn import DirectGCNConfig, init_directgcn_params
    from protgram_directgcn_tpu.parallel.halo import active_mesh
    from protgram_directgcn_tpu.parallel.mesh import (
        build_distributed_device_graph,
        make_mesh,
        shard_model_params,
        shard_training_inputs,
    )
    from protgram_directgcn_tpu.pipeline.labels import generate_labels
    from protgram_directgcn_tpu.pipeline.trainer import make_optimizer, make_train_step

    seqs = [("P1", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"), ("P2", "QDKTAYIAKQRQISFVK")]
    g = NgramGraphBuilder(n_max=2).build_from_sequences(seqs)[1]
    n = g.num_nodes
    shards = 4
    rng = np.random.default_rng(0)
    feat = 12
    x_np = rng.standard_normal((n, feat)).astype(np.float32)
    y_np, nc = generate_labels(g, "next_node", seed=0)

    cfg = DirectGCNConfig(layer_dims=(feat, 8), num_nodes=n, num_classes=nc,
                          n_gram_len=2, dropout=0.0)
    params0 = init_directgcn_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-3, 0.0)
    step = make_train_step(cfg, opt, l2_lambda=1e-6)
    key = jax.random.PRNGKey(5)

    # Single-device baseline.
    dg = g.to_device(mode="ell", feat_dim=feat)
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np.astype(np.int32))
    mask = jnp.ones(n, jnp.float32)
    # The train step donates params/opt_state; keep params0 usable below.
    params_copy = jax.tree_util.tree_map(jnp.copy, params0)
    p1, _, loss1, _ = step(params_copy, opt.init(params0), dg, x, y, mask, jnp.float32(1.0), key, None)

    # Distributed: halo graph + node-sharded params/inputs, same math.
    mesh = make_mesh(shards, feat_axis=1)
    ddg = build_distributed_device_graph(g, shards)
    total = ddg.p_in.n_out
    pad = total - n
    xd = jnp.asarray(np.pad(x_np, ((0, pad), (0, 0))))
    yd = jnp.asarray(np.pad(y_np.astype(np.int32), (0, pad)))
    md = jnp.asarray(np.pad(np.ones(n, np.float32), (0, pad)))
    cfg_d = DirectGCNConfig(layer_dims=(feat, 8), num_nodes=total, num_classes=nc,
                            n_gram_len=2, dropout=0.0)
    # Pad per-node params to the distributed row count, then shard.
    import jax.numpy as jnp2

    params_pad = jax.tree_util.tree_map(lambda a: a, params0)
    for lp in params_pad["layers"]:
        for name in ("c_in", "c_out", "c_directed", "c_undirected", "c_all", "constant"):
            lp[name] = jnp2.pad(lp[name], ((0, pad), (0, 0)))
    params_d = shard_model_params(params_pad, mesh)
    xd, yd, md = shard_training_inputs(mesh, xd, yd, md)
    step_d = make_train_step(cfg_d, opt, l2_lambda=1e-6)
    with active_mesh(mesh):
        p2, _, loss2, _ = step_d(params_d, opt.init(params_d), ddg, xd, yd, md,
                                 jnp.float32(1.0), key, None)
        loss2 = float(loss2)

    assert abs(float(loss1) - loss2) < 1e-4
    # Updated non-node params must match too.
    np.testing.assert_allclose(
        np.asarray(p1["layers"][0]["w_shared"]), np.asarray(p2["layers"][0]["w_shared"]),
        rtol=1e-4, atol=1e-5,
    )


def test_tri_halo_matches_independent_propagations(rng):
    """One shared exchange for three matrices == three independent halo
    propagations (and the dense oracle), fwd and bwd."""
    import jax
    import jax.numpy as jnp

    from protgram_directgcn_tpu.parallel.halo import (
        active_mesh,
        build_halo_adjacency,
        build_tri_halo_adjacency,
        propagate_halo,
        propagate_tri,
    )
    from protgram_directgcn_tpu.parallel.mesh import make_mesh

    n, f, shards = 64, 8, 4
    coos = [random_graph_arrays(rng, n=n, e=300) for _ in range(3)]
    tri = build_tri_halo_adjacency(coos, n, shards)
    singles = [build_halo_adjacency(*c, n, shards) for c in coos]
    mesh = make_mesh(shards, feat_axis=1)
    xs = [jnp.asarray(rng.standard_normal((n, f)).astype(np.float32)) for _ in range(3)]

    with active_mesh(mesh):
        tri_out = jax.jit(lambda a, b, c: propagate_tri(tri, a, b, c))(*xs)
        for m in range(3):
            want = np.asarray(jax.jit(lambda x, s=singles[m]: propagate_halo(s, x))(xs[m]))
            np.testing.assert_allclose(np.asarray(tri_out[m]), want, rtol=1e-5, atol=1e-5)
            # Dense oracle.
            s, t, w = coos[m]
            dense = np.zeros((n, n), np.float64)
            np.add.at(dense, (t.astype(int), s.astype(int)), w.astype(np.float64))
            np.testing.assert_allclose(
                np.asarray(tri_out[m]), dense @ np.asarray(xs[m], np.float64),
                rtol=1e-4, atol=1e-4,
            )

        # Backward: d(sum of outputs)/dx_m == column sums routed through Mᵀ.
        def loss(a, b, c):
            o = propagate_tri(tri, a, b, c)
            return sum(jnp.sum(x) for x in o)

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*xs)
        for m in range(3):
            s, t, w = coos[m]
            dense = np.zeros((n, n), np.float64)
            np.add.at(dense, (t.astype(int), s.astype(int)), w.astype(np.float64))
            want = dense.T @ np.ones((n, f))
            np.testing.assert_allclose(np.asarray(grads[m]), want, rtol=1e-4, atol=1e-4)


def test_distributed_graph_carries_tri_operator(toy_fasta):
    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.parallel.halo import TriHaloAdj
    from protgram_directgcn_tpu.parallel.mesh import build_distributed_device_graph

    import tempfile, pathlib

    out = pathlib.Path(tempfile.mkdtemp())
    NgramGraphBuilder(n_max=2).run(fasta_path=toy_fasta, output_dir=out)
    from protgram_directgcn_tpu.graph.structure import load_graph

    g = load_graph(out / "ngram_graph_n2.npz")
    dg = build_distributed_device_graph(g, 4)
    assert isinstance(dg.tri, TriHaloAdj)
    # All three matrices share one union ring plan.
    assert len(dg.tri.fwd.send_steps) == 3  # D-1 steps at 4 shards
    for part in dg.tri.fwd.parts:
        assert all(
            a.shape == b.shape for a, b in zip(part.send_steps, dg.tri.fwd.send_steps)
        )
