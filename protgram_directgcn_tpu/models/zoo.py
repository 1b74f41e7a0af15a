"""GNN zoo: JAX re-implementations of the 7 baseline architectures.

Functional equivalents of the reference's PyG wrappers
(reference: src/models/gnn_zoo.py): GCN, GAT, GraphSAGE, GIN, ChebNet, RGCN,
TongDiGCN.  Each model binds a static graph at construction (propagation
operators precomputed host-side, built through `ops.spmm.build_adjacency`
so small benchmark graphs ride the dense/MXU path) and exposes
``init_params(key)`` / ``apply(params, x, train, rng)`` returning logits,
plus ``embeddings_from`` mirroring the reference's get_embeddings hook
(gnn_zoo.py:17-32).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from protgram_directgcn_tpu.ops.segment import segment_softmax
from protgram_directgcn_tpu.ops.spmm import build_adjacency, propagate

Params = Dict


# ----------------------------------------------------------------------------
# Host-side normalized operator builders
# ----------------------------------------------------------------------------


def _gcn_norm_adj(edge_index: np.ndarray, edge_weight: Optional[np.ndarray], n: int, feat_dim: int):
    """Â = D̂^-1/2 (A + I) D̂^-1/2 (PyG GCNConv normalization, fill=1)."""
    src, tgt = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    w = np.ones(len(src), np.float32) if edge_weight is None else edge_weight.astype(np.float32)
    loops = np.arange(n, dtype=np.int64)
    src = np.concatenate([src, loops])
    tgt = np.concatenate([tgt, loops])
    w = np.concatenate([w, np.ones(n, np.float32)])
    deg = np.zeros(n, np.float32)
    np.add.at(deg, tgt, w)
    with np.errstate(divide="ignore"):
        dinv = deg ** -0.5
    dinv[~np.isfinite(dinv)] = 0.0
    vals = dinv[src] * w * dinv[tgt]
    return build_adjacency(src.astype(np.int32), tgt.astype(np.int32), vals, n, feat_dim=feat_dim)


def _mean_adj(edge_index: np.ndarray, n: int, feat_dim: int):
    """Mean aggregation over incoming edges (SAGE/RGCN)."""
    src, tgt = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    deg = np.bincount(tgt, minlength=n).astype(np.float32)
    inv = np.divide(1.0, deg, out=np.zeros_like(deg), where=deg > 0)
    return build_adjacency(src.astype(np.int32), tgt.astype(np.int32), inv[tgt], n, feat_dim=feat_dim)


def _sum_adj(edge_index: np.ndarray, edge_weight: Optional[np.ndarray], n: int, feat_dim: int):
    src, tgt = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    w = np.ones(len(src), np.float32) if edge_weight is None else edge_weight.astype(np.float32)
    return build_adjacency(src.astype(np.int32), tgt.astype(np.int32), w, n, feat_dim=feat_dim)


def _cheb_operator(edge_index: np.ndarray, edge_weight: Optional[np.ndarray], n: int, feat_dim: int):
    """L̂ = -D^-1/2 A D^-1/2 (sym norm, λmax=2, PyG ChebConv default)."""
    src, tgt = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    w = np.ones(len(src), np.float32) if edge_weight is None else edge_weight.astype(np.float32)
    deg = np.zeros(n, np.float32)
    np.add.at(deg, tgt, w)
    with np.errstate(divide="ignore"):
        dinv = deg ** -0.5
    dinv[~np.isfinite(dinv)] = 0.0
    vals = -dinv[src] * w * dinv[tgt]
    return build_adjacency(src.astype(np.int32), tgt.astype(np.int32), vals, n, feat_dim=feat_dim)


# ----------------------------------------------------------------------------
# Shared init helpers
# ----------------------------------------------------------------------------


def _glorot(key, shape):
    fan_in, fan_out = shape[-2], shape[-1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _dropout(x, rate, rng, train):
    if not train or rng is None or rate <= 0:
        return x, rng
    rng, sub = jax.random.split(rng)
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(sub, keep, x.shape), x / keep, 0.0), rng


class BaseZooModel:
    """Binds a static graph; subclasses define init_params/apply."""

    name = "base"

    def __init__(self, edge_index: np.ndarray, num_nodes: int,
                 edge_weight: Optional[np.ndarray] = None, feat_dim: int = 64):
        self.edge_index = edge_index
        self.edge_weight = edge_weight
        self.num_nodes = num_nodes
        self.feat_dim = feat_dim

    # Names of per-instance graph-array attributes.  ``graph_arrays()``
    # exposes them as a pytree so callers can thread them through jit as
    # ARGUMENTS: closed-over device arrays become compile-time constants,
    # which on remote-compile backends ship with every compile request.
    _graph_attrs: tuple = ()

    def graph_arrays(self):
        return {name: getattr(self, name) for name in self._graph_attrs}

    def _g(self, graph, name):
        return graph[name] if graph is not None else getattr(self, name)

    def init_params(self, key) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, x, train: bool = False, rng=None, graph=None):
        """Returns (logits, embeddings) — embeddings per the reference's
        get_embeddings semantics for this architecture."""
        raise NotImplementedError


# ----------------------------------------------------------------------------
# GCN (reference: gnn_zoo.py:35-56)
# ----------------------------------------------------------------------------


class GCN(BaseZooModel):
    name = "GCN"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 num_layers=2, dropout_rate=0.5, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        self.dropout_rate = dropout_rate
        self.adj = _gcn_norm_adj(edge_index, edge_weight, num_nodes, hidden_dim)

    _graph_attrs = ("adj",)

    def init_params(self, key):
        keys = jax.random.split(key, len(self.dims) - 1)
        return {
            "layers": [
                {"w": _glorot(k, (self.dims[i], self.dims[i + 1])), "b": jnp.zeros(self.dims[i + 1])}
                for i, k in enumerate(keys)
            ]
        }

    def apply(self, params, x, train=False, rng=None, graph=None):
        h = x
        adj = self._g(graph, "adj")
        n_layers = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            h = propagate(adj, h @ lp["w"]) + lp["b"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
                h, rng = _dropout(h, self.dropout_rate, rng, train)
        return h, h


# ----------------------------------------------------------------------------
# GraphSAGE (mean aggregator; reference: gnn_zoo.py:88-109)
# ----------------------------------------------------------------------------


class GraphSAGE(BaseZooModel):
    name = "GraphSAGE"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 num_layers=2, dropout_rate=0.5, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        self.dropout_rate = dropout_rate
        self.adj = _mean_adj(edge_index, num_nodes, hidden_dim)

    _graph_attrs = ("adj",)

    def init_params(self, key):
        keys = jax.random.split(key, len(self.dims) - 1)
        return {
            "layers": [
                {
                    "w_nbr": _glorot(jax.random.fold_in(k, 0), (self.dims[i], self.dims[i + 1])),
                    "b_nbr": jnp.zeros(self.dims[i + 1]),
                    "w_root": _glorot(jax.random.fold_in(k, 1), (self.dims[i], self.dims[i + 1])),
                }
                for i, k in enumerate(keys)
            ]
        }

    def apply(self, params, x, train=False, rng=None, graph=None):
        h = x
        adj = self._g(graph, "adj")
        n_layers = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            h = propagate(adj, h) @ lp["w_nbr"] + lp["b_nbr"] + h @ lp["w_root"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
                h, rng = _dropout(h, self.dropout_rate, rng, train)
        return h, h


# ----------------------------------------------------------------------------
# GAT (reference: gnn_zoo.py:59-85)
# ----------------------------------------------------------------------------


class GAT(BaseZooModel):
    name = "GAT"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 heads=8, num_layers=2, dropout_rate=0.6, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.heads = heads
        self.dropout_rate = dropout_rate
        # Self-loops (PyG GATConv default add_self_loops=True).
        src = np.concatenate([edge_index[0], np.arange(num_nodes)]).astype(np.int32)
        tgt = np.concatenate([edge_index[1], np.arange(num_nodes)]).astype(np.int32)
        order = np.argsort(tgt, kind="stable")
        self.src = jnp.asarray(src[order])
        self.tgt = jnp.asarray(tgt[order])
        self._graph_attrs = ("src", "tgt")
        # Layer shapes: in->hidden (H heads, concat), ..., hidden*H->out (1 head).
        if num_layers == 1:
            self.layer_specs = [(in_dim, out_dim, heads, False)]
        else:
            specs = [(in_dim, hidden_dim, heads, True)]
            for _ in range(num_layers - 2):
                specs.append((hidden_dim * heads, hidden_dim, heads, True))
            specs.append((hidden_dim * heads, out_dim, 1, False))
            self.layer_specs = specs

    def init_params(self, key):
        layers = []
        for i, (din, dout, h, _) in enumerate(self.layer_specs):
            k = jax.random.fold_in(key, i)
            layers.append(
                {
                    "w": _glorot(jax.random.fold_in(k, 0), (din, h * dout)),
                    "att_src": _glorot(jax.random.fold_in(k, 1), (1, h, dout)),
                    "att_dst": _glorot(jax.random.fold_in(k, 2), (1, h, dout)),
                    "b": jnp.zeros(h * dout if self.layer_specs[i][3] else dout),
                }
            )
        return {"layers": layers}

    def _gat_layer(self, lp, x, heads, dout, concat, train, rng, graph=None):
        n = x.shape[0]
        src_e = self._g(graph, "src")
        tgt_e = self._g(graph, "tgt")
        z = (x @ lp["w"]).reshape(n, heads, dout)
        a_src = jnp.sum(z * lp["att_src"], axis=-1)  # [N, H]
        a_dst = jnp.sum(z * lp["att_dst"], axis=-1)
        logits = jax.nn.leaky_relu(a_src[src_e] + a_dst[tgt_e], negative_slope=0.2)  # [E, H]
        alpha = segment_softmax(logits, tgt_e, n)
        alpha, rng = _dropout(alpha, self.dropout_rate, rng, train)
        msgs = z[src_e] * alpha[:, :, None]  # [E, H, dout]
        out = jax.ops.segment_sum(msgs, tgt_e, num_segments=n, indices_are_sorted=True)
        if concat:
            out = out.reshape(n, heads * dout)
        else:
            out = out.mean(axis=1)
        return out + lp["b"], rng

    def apply(self, params, x, train=False, rng=None, graph=None):
        h = x
        n_layers = len(params["layers"])
        for i, (lp, (din, dout, heads, concat)) in enumerate(zip(params["layers"], self.layer_specs)):
            # Input dropout per GAT convention is folded into attention dropout.
            h, rng = self._gat_layer(lp, h, heads, dout, concat, train, rng, graph)
            if i < n_layers - 1:
                h = jax.nn.elu(h)
        return h, h


# ----------------------------------------------------------------------------
# GIN (reference: gnn_zoo.py:211-237)
# ----------------------------------------------------------------------------


class GIN(BaseZooModel):
    name = "GIN"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 num_layers=2, dropout_rate=0.5, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.dropout_rate = dropout_rate
        self.hidden = hidden_dim
        self.dims = []
        current = in_dim
        for i in range(num_layers):
            out = hidden_dim if i < num_layers - 1 else out_dim
            self.dims.append((current, hidden_dim, out))
            current = out
        self.adj = _sum_adj(edge_index, None, num_nodes, hidden_dim)

    _graph_attrs = ("adj",)

    def init_params(self, key):
        layers = []
        for i, (din, dh, dout) in enumerate(self.dims):
            k = jax.random.fold_in(key, i)
            layers.append(
                {
                    "w1": _glorot(jax.random.fold_in(k, 0), (din, dh)),
                    "b1": jnp.zeros(dh),
                    "w2": _glorot(jax.random.fold_in(k, 1), (dh, dout)),
                    "b2": jnp.zeros(dout),
                    "eps": jnp.zeros(()),  # train_eps=True, init 0
                }
            )
        return {"layers": layers}

    def apply(self, params, x, train=False, rng=None, graph=None):
        h = x
        adj = self._g(graph, "adj")
        n_layers = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            agg = (1.0 + lp["eps"]) * h + propagate(adj, h)
            h = jax.nn.relu(agg @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
                h, rng = _dropout(h, self.dropout_rate, rng, train)
        return h, h


# ----------------------------------------------------------------------------
# ChebNet (reference: gnn_zoo.py:146-167)
# ----------------------------------------------------------------------------


class ChebNet(BaseZooModel):
    name = "ChebNet"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 K=3, num_layers=2, dropout_rate=0.5, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.K = K
        self.dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        self.dropout_rate = dropout_rate
        self.lap = _cheb_operator(edge_index, edge_weight, num_nodes, hidden_dim)

    _graph_attrs = ("lap",)

    def init_params(self, key):
        layers = []
        for i in range(len(self.dims) - 1):
            k = jax.random.fold_in(key, i)
            layers.append(
                {
                    "ws": [_glorot(jax.random.fold_in(k, j), (self.dims[i], self.dims[i + 1])) for j in range(self.K)],
                    "b": jnp.zeros(self.dims[i + 1]),
                }
            )
        return {"layers": layers}

    def apply(self, params, x, train=False, rng=None, graph=None):
        h = x
        lap = self._g(graph, "lap")
        n_layers = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            t_prev_prev = h
            out = t_prev_prev @ lp["ws"][0]
            if self.K > 1:
                t_prev = propagate(lap, h)
                out = out + t_prev @ lp["ws"][1]
                for j in range(2, self.K):
                    t_cur = 2.0 * propagate(lap, t_prev) - t_prev_prev
                    out = out + t_cur @ lp["ws"][j]
                    t_prev_prev, t_prev = t_prev, t_cur
            h = out + lp["b"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
                h, rng = _dropout(h, self.dropout_rate, rng, train)
        return h, h


# ----------------------------------------------------------------------------
# RGCN (single relation; reference: gnn_zoo.py:240-267)
# ----------------------------------------------------------------------------


class RGCN(BaseZooModel):
    name = "RGCN"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 num_relations=1, num_layers=2, dropout_rate=0.5, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.dims = [in_dim] + [hidden_dim] * (num_layers - 1) + [out_dim]
        self.dropout_rate = dropout_rate
        self.adj = _mean_adj(edge_index, num_nodes, hidden_dim)  # aggr='mean'

    _graph_attrs = ("adj",)

    def init_params(self, key):
        layers = []
        for i in range(len(self.dims) - 1):
            k = jax.random.fold_in(key, i)
            layers.append(
                {
                    "w_rel": _glorot(jax.random.fold_in(k, 0), (self.dims[i], self.dims[i + 1])),
                    "w_root": _glorot(jax.random.fold_in(k, 1), (self.dims[i], self.dims[i + 1])),
                    "b": jnp.zeros(self.dims[i + 1]),
                }
            )
        return {"layers": layers}

    def apply(self, params, x, train=False, rng=None, graph=None):
        h = x
        adj = self._g(graph, "adj")
        n_layers = len(params["layers"])
        for i, lp in enumerate(params["layers"]):
            h = propagate(adj, h) @ lp["w_rel"] + h @ lp["w_root"] + lp["b"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
                h, rng = _dropout(h, self.dropout_rate, rng, train)
        return h, h


# ----------------------------------------------------------------------------
# TongDiGCN (two-GCN directed baseline; reference: gnn_zoo.py:112-143)
# ----------------------------------------------------------------------------


class TongDiGCN(BaseZooModel):
    name = "TongDiGCN"

    def __init__(self, edge_index, num_nodes, in_dim, hidden_dim, out_dim,
                 num_layers=2, dropout_rate=0.5, edge_weight=None):
        super().__init__(edge_index, num_nodes, edge_weight, feat_dim=hidden_dim)
        self.dropout_rate = dropout_rate
        self.fwd = GCN(edge_index, num_nodes, in_dim, hidden_dim, hidden_dim,
                       num_layers, dropout_rate, edge_weight)
        self.bwd = GCN(edge_index[[1, 0]], num_nodes, in_dim, hidden_dim, hidden_dim,
                       num_layers, dropout_rate, edge_weight)
        self.hidden_dim = hidden_dim
        self.out_dim = out_dim

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "fwd": self.fwd.init_params(k1),
            "bwd": self.bwd.init_params(k2),
            "w_final": _glorot(k3, (2 * self.hidden_dim, self.out_dim)),
            "b_final": jnp.zeros(self.out_dim),
        }

    def graph_arrays(self):
        return {"fwd": self.fwd.graph_arrays(), "bwd": self.bwd.graph_arrays()}

    def apply(self, params, x, train=False, rng=None, graph=None):
        r1 = r2 = r3 = None
        if rng is not None:
            r1, r2, r3 = jax.random.split(rng, 3)
        h_fwd, _ = self.fwd.apply(params["fwd"], x, train, r1, graph["fwd"] if graph else None)
        h_bwd, _ = self.bwd.apply(params["bwd"], x, train, r2, graph["bwd"] if graph else None)
        combined = jnp.concatenate([h_fwd, h_bwd], axis=-1)
        combined, _ = _dropout(combined, self.dropout_rate, r3, train)
        return combined @ params["w_final"] + params["b_final"], combined


ZOO_MODELS = {
    "GCN": GCN,
    "GAT": GAT,
    "GraphSAGE": GraphSAGE,
    "GIN": GIN,
    "ChebNet": ChebNet,
    "RGCN": RGCN,
    "TongDiGCN": TongDiGCN,
}
