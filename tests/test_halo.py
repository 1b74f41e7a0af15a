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
