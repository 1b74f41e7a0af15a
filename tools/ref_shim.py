"""Run the ACTUAL reference code (/root/reference) in-process for parity.

The reference stack needs torch (installed: 2.13+cpu) and torch_geometric
(NOT installed).  The reference only touches four PyG symbols:

- ``torch_geometric.utils.add_self_loops`` / ``degree``
  (reference: graph_utils.py:16, used at graph_utils.py:180-187)
- ``torch_geometric.nn.MessagePassing``
  (reference: protgram_directgcn.py:15, subclassed with aggr='add' and the
  default flow='source_to_target': messages are x[edge_index[0]] scaled by
  edge_weight, sum-aggregated at edge_index[1])
- ``torch_geometric.data.Data`` (an attribute bag)

This module installs a minimal, semantics-exact shim for those four symbols
into ``sys.modules`` and then imports the reference modules VERBATIM from
/root/reference — no reference code is copied or modified.  Everything the
parity harness compares against is therefore the reference's own executed
behavior, not a re-implementation.

Used by ``tools/parity_check.py --vs-reference`` and
``tests/test_reference_parity.py``.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import types

REFERENCE_ROOT = os.environ.get("PROTGRAM_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))


def install_pyg_shim() -> None:
    """Install a minimal torch_geometric into sys.modules (idempotent)."""
    if "torch_geometric" in sys.modules:
        return
    import torch

    def add_self_loops(edge_index, edge_attr=None, fill_value=None, num_nodes=None):
        # PyG appends one (i, i) loop per node AFTER the existing edges.
        n = int(num_nodes) if num_nodes is not None else int(edge_index.max()) + 1
        loops = torch.arange(n, dtype=torch.long, device=edge_index.device)
        loops = loops.unsqueeze(0).expand(2, -1)
        out = torch.cat([edge_index, loops], dim=1)
        return out, edge_attr

    def degree(index, num_nodes=None, dtype=None):
        n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
        out = torch.zeros(n, dtype=dtype if dtype is not None else torch.float32)
        out.scatter_add_(0, index, torch.ones_like(index, dtype=out.dtype))
        return out

    class MessagePassing(torch.nn.Module):
        """aggr='add', flow='source_to_target' (the PyG defaults the
        reference relies on): out[t] = sum over edges (s, t) of message(x[s])."""

        def __init__(self, aggr: str = "add", **kwargs):
            super().__init__()
            if aggr != "add":
                raise NotImplementedError("shim supports aggr='add' only")

        def propagate(self, edge_index, x=None, edge_weight=None, **kwargs):
            src, dst = edge_index[0], edge_index[1]
            msg = self.message(x.index_select(0, src), edge_weight)
            out = torch.zeros(x.size(0), msg.size(1), dtype=msg.dtype)
            out.index_add_(0, dst, msg)
            return out

        def message(self, x_j, edge_weight=None):
            if edge_weight is None:
                return x_j
            return edge_weight.view(-1, 1) * x_j

    class Data:
        """Attribute-bag stand-in for torch_geometric.data.Data."""

        def __init__(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)

        def to(self, device):
            return self

    tg = types.ModuleType("torch_geometric")
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.add_self_loops = add_self_loops
    tg_utils.degree = degree
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_nn.MessagePassing = MessagePassing
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data.Data = Data
    tg.utils = tg_utils
    tg.nn = tg_nn
    tg.data = tg_data
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.utils"] = tg_utils
    sys.modules["torch_geometric.nn"] = tg_nn
    sys.modules["torch_geometric.data"] = tg_data


def load_reference_modules():
    """Import the reference's graph_utils + protgram_directgcn verbatim.

    Returns (graph_utils_module, protgram_directgcn_module, Data_class).
    """
    install_pyg_shim()
    import importlib

    # The reference root hosts a top-level main.py/config.py that would
    # shadow the repo's own on later imports — take it off sys.path as soon
    # as the (module-cached) imports are done.
    added = REFERENCE_ROOT not in sys.path
    if added:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        graph_utils = importlib.import_module("src.utils.graph_utils")
        protgram = importlib.import_module("src.models.protgram_directgcn")
    finally:
        if added and REFERENCE_ROOT in sys.path:
            sys.path.remove(REFERENCE_ROOT)
    return graph_utils, protgram, sys.modules["torch_geometric.data"].Data


def reference_graph_from_arrays(src, tgt, weight, num_nodes, epsilon=1e-9, n_value=None):
    """Build a reference DirectedNgramGraph from in-memory edge arrays.

    Executes the reference's OWN matrix construction methods
    (graph_utils.py:140-287) on arrays produced by our production ETL —
    only the parquet file read is bypassed (the reference constructor's
    only file-format dependency).
    """
    import numpy as np

    graph_utils, _, _ = load_reference_modules()
    nodes = {i: f"node_{i}" for i in range(num_nodes)}
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        g = graph_utils.DirectedNgramGraph(
            nodes=nodes, edge_file_path=None,
            epsilon_propagation=epsilon, n_value=n_value,
        )
        g.number_of_edges = len(src)
        src64 = np.asarray(src, dtype=np.int64)
        tgt64 = np.asarray(tgt, dtype=np.int64)
        w32 = np.asarray(weight, dtype=np.float32)
        g._create_raw_weighted_adj_matrices_torch(src64, tgt64, w32.copy())
        g._create_undirected_normalized_adj_matrix(src64, tgt64)
        g._create_propagation_matrices_for_gcn()
    return g


def build_reference_model(cfg, params):
    """Instantiate the reference ProtGramDirectGCN with OUR params injected.

    cfg is a protgram_directgcn_tpu DirectGCNConfig; params the pytree from
    init_directgcn_params.  Weight matrices are transposed ([in,out] ->
    torch's [out,in]); name mapping documented inline
    (reference: protgram_directgcn.py:26-91, 143-180).
    """
    import numpy as np
    import torch

    _, protgram, _ = load_reference_modules()
    model = protgram.ProtGramDirectGCN(
        layer_dims=list(cfg.layer_dims),
        num_graph_nodes=cfg.num_nodes,
        task_num_output_classes=cfg.num_classes,
        n_gram_len=cfg.n_gram_len,
        one_gram_dim=cfg.one_gram_dim,
        max_pe_len=cfg.max_pe_len if cfg.one_gram_dim > 0 else 0,
        dropout=cfg.dropout,
        use_vector_coeffs=cfg.use_vector_coeffs,
        l2_eps=cfg.l2_eps,
    )

    def t(a):
        return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))

    sd = {}
    for i, lp in enumerate(params["layers"]):
        pre = f"convs.{i}."
        sd[pre + "lin_main_in.weight"] = t(lp["w_main_in"]).T.contiguous()
        sd[pre + "lin_main_out.weight"] = t(lp["w_main_out"]).T.contiguous()
        sd[pre + "lin_undirected.weight"] = t(lp["w_und"]).T.contiguous()
        sd[pre + "lin_shared.weight"] = t(lp["w_shared"]).T.contiguous()
        sd[pre + "bias_main_in"] = t(lp["b_main_in"])
        sd[pre + "bias_main_out"] = t(lp["b_main_out"])
        sd[pre + "bias_undirected"] = t(lp["b_und"])
        sd[pre + "bias_directed_shared_in"] = t(lp["b_shared_in"])
        sd[pre + "bias_directed_shared_out"] = t(lp["b_shared_out"])
        sd[pre + "bias_undirected_shared"] = t(lp["b_shared_und"])
        gate_suffix = "_vec" if (cfg.use_vector_coeffs and cfg.num_nodes > 0) else ""
        for ours, theirs in (
            ("c_in", "C_in"), ("c_out", "C_out"), ("c_directed", "C_directed"),
            ("c_undirected", "C_undirected"), ("c_all", "C_all"),
        ):
            sd[pre + theirs + gate_suffix] = t(lp[ours])
        if lp["constant"] is not None:
            # rg-native [A, G, out] storage flattens back to torch's [N, out]
            c = np.array(lp["constant"], dtype=np.float32, copy=True)
            sd[pre + "constant"] = torch.from_numpy(c.reshape(-1, c.shape[-1]))
        res = params["res_projs"][i]
        if res is not None:
            sd[f"res_projs.{i}.weight"] = t(res["w"]).T.contiguous()
            sd[f"res_projs.{i}.bias"] = t(res["b"])
    d = params["decoder"]
    sd["decoder_fc.0.weight"] = t(d["w1"]).T.contiguous()
    sd["decoder_fc.0.bias"] = t(d["b1"])
    sd["decoder_fc.3.weight"] = t(d["w2"]).T.contiguous()
    sd["decoder_fc.3.bias"] = t(d["b2"])
    if "pe_table" in params and model.pe_layer is not None:
        sd["pe_layer.weight"] = t(params["pe_table"])
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model


def reference_data_from_graph(ref_graph, x, Data):
    """full_data exactly as the reference trainer wires it
    (reference: protgram_directgcn_trainer.py:362-367)."""
    import numpy as np
    import torch

    return Data(
        x=torch.from_numpy(np.asarray(x, dtype=np.float32)),
        edge_index_in=ref_graph.mathcal_A_in.indices(),
        edge_weight_in=ref_graph.mathcal_A_in.values(),
        edge_index_out=ref_graph.mathcal_A_out.indices(),
        edge_weight_out=ref_graph.mathcal_A_out.values(),
        edge_index_undirected_norm=ref_graph.A_undirected_norm_sparse.indices(),
        edge_weight_undirected_norm=ref_graph.A_undirected_norm_sparse.values(),
    )
