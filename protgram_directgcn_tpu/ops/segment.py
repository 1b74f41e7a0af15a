"""Segment operations for edge-level computations (attention, softmax).

Used by the GNN zoo's attention models where per-edge values must be
normalized over each target node's incoming edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Numerically stable softmax over segments (axis 0)."""
    maxs = jax.ops.segment_max(logits, segment_ids, num_segments=num_segments)
    maxs = jnp.where(jnp.isfinite(maxs), maxs, 0.0)
    exp = jnp.exp(logits - maxs[segment_ids])
    sums = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return exp / jnp.maximum(sums[segment_ids], 1e-16)


def segment_mean(values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    sums = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments)
    counts = jax.ops.segment_sum(jnp.ones_like(segment_ids, dtype=values.dtype), segment_ids, num_segments=num_segments)
    return sums / jnp.maximum(counts, 1.0)[(...,) + (None,) * (values.ndim - 1)]
