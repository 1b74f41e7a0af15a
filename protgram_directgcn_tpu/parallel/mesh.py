"""Device mesh + sharding layout for multi-chip DirectGCN training.

No reference counterpart — the reference is single-process, single-device
(SURVEY.md §2.3); this subsystem is new TPU-native work.

Design (scaling-book style: pick a mesh, annotate shardings, let XLA insert
collectives over ICI):

- 2D mesh ``("nodes", "feat")``.
- **Node partitioning** (the graph-parallel axis): every per-node array —
  features, labels, ELL rows (idx/w), dense A^T rows, per-node gates and the
  node-constant — is sharded along "nodes".  Node ids are assigned by sorted
  n-gram order, so a contiguous block partition is locality-aware for free
  (n-grams sharing prefixes land on the same shard and share most targets).
  The ELL gather ``x[idx]`` over a node-sharded ``x`` makes XLA materialise
  the halo via collectives automatically; an explicit overlapped halo
  exchange is the planned optimisation once profiles justify it.
- **Feature/tensor partitioning**: dense projection weights are sharded on
  their output dim along "feat", biases along "feat" — standard TP.  Gates
  ([N,1]) stay node-sharded, the decoder weights feat-sharded.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protgram_directgcn_tpu.graph.structure import DeviceGraph
from protgram_directgcn_tpu.ops.spmm import CooAdj, DenseAdj, EllAdj


def make_mesh(num_devices: Optional[int] = None, feat_axis: int = 1, devices=None) -> Mesh:
    """Create a ("nodes", "feat") mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    num_devices = num_devices or len(devices)
    if num_devices % feat_axis != 0:
        raise ValueError(f"num_devices {num_devices} not divisible by feat_axis {feat_axis}")
    shape = (num_devices // feat_axis, feat_axis)
    dev_array = np.asarray(devices[:num_devices]).reshape(shape)
    return Mesh(dev_array, axis_names=("nodes", "feat"))


def _put(x, mesh: Mesh, spec: P):
    if x is None:
        return None
    return jax.device_put(x, NamedSharding(mesh, spec))


def _pad_rows_to(x, multiple: int):
    import jax.numpy as jnp

    if x is None:
        return None
    pad = (-x.shape[0]) % multiple
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def shard_device_graph(graph: DeviceGraph, mesh: Mesh) -> DeviceGraph:
    """Shard adjacency rows along the "nodes" axis.

    Row counts are padded to a multiple of the axis size (padded ELL rows
    have zero weights; padded dense rows are zero)."""
    n_shards = mesh.shape["nodes"]

    def shard_adj(adj):
        if isinstance(adj, EllAdj):
            return EllAdj(
                idx=_put(_pad_rows_to(adj.idx, n_shards), mesh, P("nodes", None)),
                w=_put(_pad_rows_to(adj.w, n_shards), mesh, P("nodes", None)),
                idx_t=_put(_pad_rows_to(adj.idx_t, n_shards), mesh, P("nodes", None)),
                w_t=_put(_pad_rows_to(adj.w_t, n_shards), mesh, P("nodes", None)),
            )
        if isinstance(adj, DenseAdj):
            # Square-pad so A^T @ x stays consistent with row-padded x.
            import jax.numpy as jnp

            at = adj.at
            pad_r = (-at.shape[0]) % n_shards
            pad_c = (-at.shape[1]) % n_shards
            if pad_r or pad_c:
                at = jnp.pad(at, ((0, pad_r), (0, pad_c)))
            return DenseAdj(at=_put(at, mesh, P("nodes", None)))
        if isinstance(adj, CooAdj):
            # COO edges are not row-alignable; replicate (used only for skewed
            # benchmark graphs that fit on one chip anyway).
            return CooAdj(
                src=_put(adj.src, mesh, P()), tgt=_put(adj.tgt, mesh, P()),
                w=_put(adj.w, mesh, P()), src_t=_put(adj.src_t, mesh, P()),
                tgt_t=_put(adj.tgt_t, mesh, P()), w_t=_put(adj.w_t, mesh, P()),
                n_out=adj.n_out, n_in=adj.n_in,
            )
        raise TypeError(type(adj))

    return DeviceGraph(
        p_in=shard_adj(graph.p_in),
        p_out=shard_adj(graph.p_out),
        p_und=shard_adj(graph.p_und),
        num_nodes=graph.num_nodes,
    )


_NODE_SHARDED_LAYER_KEYS = {"c_in", "c_out", "c_directed", "c_undirected", "c_all", "constant"}
_FEAT_OUT_WEIGHT_KEYS = {"w_main_in", "w_main_out", "w_und", "w_shared"}


def shard_model_params(params: Any, mesh: Mesh) -> Any:
    """Apply the DirectGCN sharding layout to a parameter pytree."""

    def shard_layer(layer):
        out = {}
        for k, v in layer.items():
            if v is None:
                out[k] = None
            elif k in _NODE_SHARDED_LAYER_KEYS:
                out[k] = _put(_pad_rows_to(v, mesh.shape["nodes"]), mesh, P("nodes", None))
            elif k in _FEAT_OUT_WEIGHT_KEYS:
                out[k] = _put(v, mesh, P(None, "feat"))
            elif k.startswith("b_"):
                out[k] = _put(v, mesh, P("feat"))
            else:
                out[k] = _put(v, mesh, P())
        return out

    sharded = {
        "layers": [shard_layer(lp) for lp in params["layers"]],
        "res_projs": [
            None if rp is None else {"w": _put(rp["w"], mesh, P(None, "feat")), "b": _put(rp["b"], mesh, P("feat"))}
            for rp in params["res_projs"]
        ],
        "decoder": {
            "w1": _put(params["decoder"]["w1"], mesh, P(None, "feat")),
            "b1": _put(params["decoder"]["b1"], mesh, P("feat")),
            "w2": _put(params["decoder"]["w2"], mesh, P("feat", None)),
            "b2": _put(params["decoder"]["b2"], mesh, P()),
        },
    }
    if "pe_table" in params:
        sharded["pe_table"] = _put(params["pe_table"], mesh, P())
    return sharded


def build_distributed_device_graph(
    graph, num_shards: int, debug_checksums: bool = False
) -> DeviceGraph:
    """DeviceGraph whose three operators are explicit halo-exchange
    adjacencies (edge-partitioned over `num_shards` node blocks).

    The DirectGCN model runs on this unchanged — `ops.spmm.propagate`
    dispatches HaloAdj members to the shard_map halo path.  Use inside
    `parallel.halo.active_mesh(mesh)`.  ``debug_checksums`` asserts per-peer
    checksums on every exchanged boundary buffer (SURVEY §5.2)."""
    from protgram_directgcn_tpu.graph.transforms import csr_to_coo_arrays
    from protgram_directgcn_tpu.parallel.halo import (
        build_halo_adjacency,
        build_tri_halo_adjacency,
    )

    coos = [
        csr_to_coo_arrays(m)
        for m in (graph.mathcal_a_in(), graph.mathcal_a_out(), graph.undirected_norm())
    ]

    def halo_from(coo):
        return build_halo_adjacency(
            *coo, graph.num_nodes, num_shards, debug_checksums=debug_checksums
        )

    return DeviceGraph(
        p_in=halo_from(coos[0]),
        p_out=halo_from(coos[1]),
        p_und=halo_from(coos[2]),
        num_nodes=graph.num_nodes,
        # Layer-level fused operator: one halo exchange serves all three
        # matrices per layer (ops.spmm.propagate3 dispatches to it).
        tri=build_tri_halo_adjacency(
            coos, graph.num_nodes, num_shards, debug_checksums=debug_checksums
        ),
    )


def shard_training_inputs(mesh: Mesh, x, y, mask) -> Tuple[Any, Any, Any]:
    """Shard node features/labels/mask along the "nodes" axis (row-padded)."""
    n_shards = mesh.shape["nodes"]
    x = _put(_pad_rows_to(x, n_shards), mesh, P("nodes", None))
    y = _put(_pad_rows_to(y, n_shards), mesh, P("nodes"))
    mask = _put(_pad_rows_to(mask, n_shards), mesh, P("nodes"))
    return x, y, mask
