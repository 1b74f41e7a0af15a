"""Weak-scaling harness for edge-partitioned propagation.

Measures halo-exchange SpMM throughput as devices scale with fixed work per
device (the BASELINE acceptance bar: >= 75% weak-scaling efficiency from
1 host to N >= 2).  Runs on any mesh — virtual CPU devices for CI, real
chips on a pod slice.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from protgram_directgcn_tpu.parallel.halo import (
    build_halo_partition,
    halo_propagate,
    pad_node_features,
)
from protgram_directgcn_tpu.parallel.mesh import make_mesh
from protgram_directgcn_tpu.utils.io import logger


@dataclass
class ScalingPoint:
    shards: int
    num_nodes: int
    nnz: int
    seconds_per_step: float
    edges_per_s: float
    efficiency: float  # vs ideal scaling of the 1-shard point


def _bounded_degree_graph(n: int, deg: int, seed: int):
    rng = np.random.default_rng(seed)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    tgt = rng.integers(0, n, n * deg)
    pairs, counts = np.unique(np.stack([src, tgt], 1), axis=0, return_counts=True)
    return (
        pairs[:, 0].astype(np.int32),
        pairs[:, 1].astype(np.int32),
        counts.astype(np.float32),
    )


def weak_scaling_report(
    nodes_per_shard: int = 4096,
    deg: int = 16,
    feat_dim: int = 64,
    shard_counts: Optional[List[int]] = None,
    iters: int = 10,
    seed: int = 0,
) -> List[ScalingPoint]:
    max_dev = len(jax.devices())
    if shard_counts is None:
        shard_counts = [d for d in (1, 2, 4, 8, 16) if d <= max_dev]
    points: List[ScalingPoint] = []
    base_rate_per_shard = None
    for d in shard_counts:
        n = nodes_per_shard * d
        src, tgt, w = _bounded_degree_graph(n, deg, seed)
        part = build_halo_partition(src, tgt, w, n, d)
        mesh = make_mesh(d, feat_axis=1)
        x = np.random.default_rng(seed).standard_normal((n, feat_dim)).astype(np.float32)
        x = jnp.asarray(pad_node_features(x, part))
        x = jax.device_put(x, NamedSharding(mesh, P("nodes", None)))
        fn = jax.jit(lambda xv: halo_propagate(part, xv, mesh))
        fn(x).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        rate = len(src) / best
        rate_per_shard = rate / d
        if base_rate_per_shard is None:
            base_rate_per_shard = rate_per_shard
        eff = rate_per_shard / base_rate_per_shard
        points.append(
            ScalingPoint(
                shards=d, num_nodes=n, nnz=len(src), seconds_per_step=best,
                edges_per_s=rate, efficiency=eff,
            )
        )
        logger.info(
            "weak scaling D=%d: %d nodes, %d edges, %.3fms/step, %.2fM edges/s, eff=%.2f",
            d, n, len(src), best * 1e3, rate / 1e6, eff,
        )
    return points


def main():
    import json

    points = weak_scaling_report()
    print(json.dumps([p.__dict__ for p in points], indent=2))


if __name__ == "__main__":
    main()
