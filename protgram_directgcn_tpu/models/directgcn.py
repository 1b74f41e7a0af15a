"""DirectGCN: dual-path directed GCN with hierarchical gating — TPU-native.

Functional (init/apply) re-design of the reference model
(reference: src/models/protgram_directgcn.py:20-222).  Exact parameter
inventory per layer: 4 weight matrices (main_in, main_out, undirected,
shared), 6 bias vectors, 5 per-node gating vectors [N,1] (or scalars), and a
per-node constant [N, out]; network-level: optional positional-encoding
table, residual projections, and a 2-layer decoder head.

TPU-first restructuring of the 6-propagation layer (reference forward,
protgram_directgcn.py:100-113):  propagation is linear, so
``P(X·W_main) + P(X·W_shared) == P(X·(W_main + W_shared))``.  We compute one
fused dense projection per path — a single [N, F_in]×[F_in, 3·F_out] MXU
matmul — followed by exactly 3 sparse propagations (one per edge set)
instead of 6.  Bias algebra is preserved: the per-path bias is
``b_main + b_shared_path`` added after propagation.  Set ``fused=False`` to
run the literal 6-propagation dataflow for parity checking.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from protgram_directgcn_tpu.graph.structure import DeviceGraph
from protgram_directgcn_tpu.ops.spmm import propagate

Params = Dict[str, Any]


@dataclass(frozen=True)
class DirectGCNConfig:
    """Static model hyperparameters (hashable; safe to close over in jit)."""

    layer_dims: Tuple[int, ...]  # [in, hidden..., out] (>= 2 entries)
    num_nodes: int
    num_classes: int
    n_gram_len: int
    one_gram_dim: int = 0  # > 0 only at level n=1 (trainer contract)
    max_pe_len: int = 512
    dropout: float = 0.5
    decoder_dropout: float = 0.5
    use_vector_coeffs: bool = True
    l2_eps: float = 1e-12
    leaky_relu_slope: float = 0.01
    # Minimum decoder hidden width.  The reference sizes the decoder hidden
    # layer as ``final_dim // 2`` (reference: protgram_directgcn.py:173-174);
    # when layer_dims ends at num_classes (the benchmark adapter,
    # reference: gnn_benchmarker.py:325) a 2-class task gets a WIDTH-1 ReLU
    # bottleneck whose uniform-sign pre-activation pins the whole network to
    # one argmax (experiments/exp_benchmark_collapse.py).  Default 1 keeps
    # exact reference parity; the benchmark's ProtGramDirectGCN_norm row
    # raises it.
    decoder_hidden_floor: int = 1
    fused: bool = True
    use_pallas: bool = False
    # Rematerialise each GCN layer on the backward pass (jax.checkpoint):
    # trades ~1 extra forward per layer for not storing its activations —
    # the standard TPU lever when full-batch training at hypercube scale
    # brushes the HBM ceiling (a (128->64)-dim 5-gram step needs ~17.5 GB
    # without remat on a 16 GB chip).
    remat: bool = False
    # Additionally rematerialise each of the three (projection ->
    # propagation) paths INSIDE the layer.  With only layer-level remat the
    # rematerialized backward keeps ~12 concurrent ~1 GB pipeline buffers
    # live at 5-gram scale (three paths' projections, Pallas operands,
    # relayouts and transpose-propagations — measured 12.86 GB HLO temp,
    # experiments/exp_memwall_r3.log OOM); per-path checkpoints let each
    # path's buffers die before the next path's backward runs, at the price
    # of one more forward propagation per path.
    remat_paths: bool = False
    # "bfloat16" runs the dense projections and sparse propagations in bf16
    # (params stay f32; gating/bias/residual math promotes back to f32) —
    # the TPU-native analogue of the reference's CUDA AMP autocast
    # (reference: protgram_directgcn_trainer.py:88).  No loss scaling needed.
    compute_dtype: str = "float32"
    # Storage dtype for the PER-NODE parameters (5 gates [N,1] + constant
    # [N,out]) — and, because optax moments follow param dtype, their Adam
    # state.  At 5-gram hypercube scale these dominate parameter memory
    # (~4.7 GB f32 + 9.4 GB moments for a 4-layer stack on a 16 GB chip);
    # "bfloat16" halves all three.  Gates/constant are per-node gains and
    # offsets applied to bf16 activations, so bf16 storage loses nothing
    # the compute path had.
    node_param_dtype: str = "float32"

    def __post_init__(self):
        if len(self.layer_dims) < 2:
            raise ValueError("layer_dims must contain at least input and output dims")


# ----------------------------------------------------------------------------
# Initialization (matches reference reset_parameters, protgram_directgcn.py:70-91)
# ----------------------------------------------------------------------------


def _xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _torch_linear_init(key, in_dim, out_dim, dtype=jnp.float32):
    """torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) + bias bound)."""
    kw, kb = jax.random.split(key)
    limit = (1.0 / in_dim) ** 0.5
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -limit, limit)
    b = jax.random.uniform(kb, (out_dim,), dtype, -limit, limit)
    return w, b


def _init_layer(key, in_dim: int, out_dim: int, num_nodes: int, use_vector_coeffs: bool,
                node_dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, 6)
    p: Params = {
        # Stored [in, out] (applied as x @ w); xavier_uniform is symmetric in
        # fan_in/fan_out so matches torch's [out, in] init.
        "w_main_in": _xavier_uniform(keys[0], (in_dim, out_dim), in_dim, out_dim),
        "w_main_out": _xavier_uniform(keys[1], (in_dim, out_dim), in_dim, out_dim),
        "w_und": _xavier_uniform(keys[2], (in_dim, out_dim), in_dim, out_dim),
        "w_shared": _xavier_uniform(keys[3], (in_dim, out_dim), in_dim, out_dim),
        "b_main_in": jnp.zeros((out_dim,)),
        "b_main_out": jnp.zeros((out_dim,)),
        "b_und": jnp.zeros((out_dim,)),
        "b_shared_in": jnp.zeros((out_dim,)),
        "b_shared_out": jnp.zeros((out_dim,)),
        "b_shared_und": jnp.zeros((out_dim,)),
    }
    gate_shape = (num_nodes, 1) if (use_vector_coeffs and num_nodes > 0) else (1,)
    for name in ("c_in", "c_out", "c_directed", "c_undirected", "c_all"):
        p[name] = jnp.ones(gate_shape, node_dtype)
    if num_nodes > 0:
        # torch xavier on [N, out]: fan_in = out, fan_out = N
        # (reference: protgram_directgcn.py:90-91).
        p["constant"] = _xavier_uniform(
            keys[4], (num_nodes, out_dim), out_dim, num_nodes
        ).astype(node_dtype)
    else:
        p["constant"] = None
    return p


def init_directgcn_params(key: jax.Array, cfg: DirectGCNConfig) -> Params:
    dims = cfg.layer_dims
    n_layers = len(dims) - 1
    keys = jax.random.split(key, n_layers + 3)
    layers = []
    res_projs: List[Optional[Dict[str, jnp.ndarray]]] = []
    node_dtype = jnp.bfloat16 if cfg.node_param_dtype == "bfloat16" else jnp.float32
    for i in range(n_layers):
        sub = jax.random.split(keys[i], 2)
        layers.append(
            _init_layer(sub[0], dims[i], dims[i + 1], cfg.num_nodes,
                        cfg.use_vector_coeffs and cfg.num_nodes > 0,
                        node_dtype=node_dtype)
        )
        if dims[i] != dims[i + 1]:
            w, b = _torch_linear_init(sub[1], dims[i], dims[i + 1])
            res_projs.append({"w": w, "b": b})
        else:
            res_projs.append(None)  # identity residual

    final_dim = dims[-1]
    hidden = max(final_dim // 2 if final_dim > 1 else 1, cfg.decoder_hidden_floor)
    dk = jax.random.split(keys[n_layers], 2)
    dw1, db1 = _torch_linear_init(dk[0], final_dim, hidden)
    dw2, db2 = _torch_linear_init(dk[1], hidden, cfg.num_classes)

    params: Params = {
        "layers": layers,
        "res_projs": res_projs,
        "decoder": {"w1": dw1, "b1": db1, "w2": dw2, "b2": db2},
    }
    if cfg.one_gram_dim > 0 and cfg.max_pe_len > 0:
        # torch nn.Embedding default init: N(0, 1)
        # (reference: protgram_directgcn.py:156-158).
        params["pe_table"] = jax.random.normal(keys[n_layers + 1], (cfg.max_pe_len, cfg.one_gram_dim))
    return params


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------


def _gather_node_params(p: Params, original_indices: Optional[jnp.ndarray]):
    """Per-node gates/constant, gathered for subgraph batches
    (reference: protgram_directgcn.py:116-128)."""
    names = ("c_in", "c_out", "c_directed", "c_undirected", "c_all")
    if original_indices is not None and p["c_in"].ndim == 2:
        gates = tuple(p[n][original_indices] for n in names)
        const = p["constant"]
        if const is not None and const.ndim == 3:
            # rg-native stored constant (trainer hypercube levels): restore
            # the flat node axis for the subgraph gather.
            const = const.reshape(-1, const.shape[-1])
        const = const[original_indices] if const is not None else 0.0
    else:
        gates = tuple(p[n] for n in names)
        const = p["constant"] if p["constant"] is not None else 0.0
    return gates, const


def _layer_apply(
    p: Params,
    graph: DeviceGraph,
    x: jnp.ndarray,
    cfg: DirectGCNConfig,
    original_indices: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """One DirectGCN layer (reference forward: protgram_directgcn.py:93-135)."""
    use_pallas = cfg.use_pallas
    ct = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else x.dtype
    if cfg.fused:
        from protgram_directgcn_tpu.ops.spmm import propagate3

        if x.ndim == 3:
            # rg-layout carry = hypercube scale: three separate matmuls so
            # the projections have disjoint lifetimes — a concatenated
            # [A, G, 3·out] buffer is ~3 GB at 5-gram/out=128 and was the
            # single largest allocation in the 4-layer OOM breakdown
            # (experiments/exp_memwall_r2.py).  Same MXU FLOPs either way.
            #
            # Sub-128 out_dims are padded in the WEIGHTS (zero columns, a
            # few KB) so each dot emits a 128-lane-multiple buffer the
            # propagation kernels take as-is: a [·,·,64] bf16 activation
            # already OCCUPIES the 128-lane physical footprint, and the
            # kernel-boundary jnp.pad otherwise COPIES it into a second
            # ~1 GB buffer at every remat boundary.  Propagation is linear,
            # so zero feature columns stay zero; the slice back fuses into
            # the bias/gating loop.
            out_dim = p["w_main_in"].shape[1]
            f_pad = -(-out_dim // 128) * 128
            wp = (
                (lambda w: jnp.pad(w, ((0, 0), (0, f_pad - out_dim))))
                if f_pad != out_dim
                else (lambda w: w)
            )
            xc = x.astype(ct)
            if cfg.remat_paths:
                return _layer_paths_remat(p, graph, xc, cfg, wp, out_dim, f_pad,
                                          original_indices, use_pallas, ct)
            x_in = xc @ wp(p["w_main_in"] + p["w_shared"]).astype(ct)
            x_out = xc @ wp(p["w_main_out"] + p["w_shared"]).astype(ct)
            x_und = xc @ wp(p["w_und"] + p["w_shared"]).astype(ct)
        else:
            # One fused MXU matmul for all three paths, then 3 propagations.
            w_cat = jnp.concatenate(
                [p["w_main_in"] + p["w_shared"], p["w_main_out"] + p["w_shared"],
                 p["w_und"] + p["w_shared"]], axis=1,
            )
            proj = x.astype(ct) @ w_cat.astype(ct)  # [..., 3*out]
            out_dim = p["w_main_in"].shape[1]
            x_in, x_out, x_und = (
                proj[..., :out_dim],
                proj[..., out_dim : 2 * out_dim],
                proj[..., 2 * out_dim :],
            )
        pi, po, pu = propagate3(graph, x_in, x_out, x_und, use_pallas)
        # Padded-width layers (see wp above) keep pi/po/pu at f_pad through
        # the gating and slice ONCE at the exit below: slicing here would
        # put three ~1 GB pad copies (the slices' transposes) in front of
        # the three backward propagations simultaneously, while one exit
        # slice costs one — and the saved inter-layer carry stays at the
        # logical width, which XLA's remat compression halves.
        # Biases are f32 params; cast the SUM to the compute dtype so the
        # adds don't promote the three [A, G, F] propagated paths to f32
        # (three 2 GB f32 buffers per layer in the 5-gram OOM breakdown).
        bp = (
            (lambda b: jnp.pad(b, (0, f_pad - out_dim)))
            if x.ndim == 3 and f_pad != out_dim
            else (lambda b: b)
        )
        ic = pi + bp(p["b_main_in"] + p["b_shared_in"]).astype(ct)
        oc = po + bp(p["b_main_out"] + p["b_shared_out"]).astype(ct)
        uc = pu + bp(p["b_und"] + p["b_shared_und"]).astype(ct)
    else:
        # Literal 6-propagation dataflow for parity testing.
        x = x.astype(ct)
        xs = x @ p["w_shared"].astype(ct)
        ic = (
            propagate(graph.p_in, x @ p["w_main_in"].astype(ct), use_pallas)
            + p["b_main_in"].astype(ct)
        ) + (propagate(graph.p_in, xs, use_pallas) + p["b_shared_in"].astype(ct))
        oc = (
            propagate(graph.p_out, x @ p["w_main_out"].astype(ct), use_pallas)
            + p["b_main_out"].astype(ct)
        ) + (propagate(graph.p_out, xs, use_pallas) + p["b_shared_out"].astype(ct))
        uc = (
            propagate(graph.p_und, x @ p["w_und"].astype(ct), use_pallas)
            + p["b_und"].astype(ct)
        ) + (propagate(graph.p_und, xs, use_pallas) + p["b_shared_und"].astype(ct))

    return _combine_paths(p, x, ic, oc, uc, original_indices)


def _layer_paths_remat(p, graph, xc, cfg, wp, out_dim, f_pad, original_indices,
                       use_pallas, ct):
    """rg-layout fused layer with PER-PATH rematerialisation.

    Each (projection -> propagation -> bias -> GATE) path is its own
    checkpoint region, chained by optimization barriers, and the combine is
    restructured distributively:

        out = (c_all·c_dir·c_in)·IC + (c_all·c_dir·c_out)·OC
            + (c_all·c_und)·UC + const

    Folding the gate product INTO each path's checkpoint matters: with the
    gates applied after the paths, the backward needs all three propagated
    outputs simultaneously for the gate gradients (3 x ~1 GB at 5-gram
    scale — with layer-level remat alone the step measured 12.86 GB HLO
    temp, and with per-path remat but post-hoc gating still 10.91 GB, 56 MB
    over the chip).  Inside the checkpoints, each path's output is
    recomputed for its own gate gradient and DEAD before the next path's
    backward runs.  Graph/weights enter as explicit checkpoint arguments:
    closed-over constants get COPIED into rematerialized computations by
    XLA (~1 GB per bank per layer)."""
    bp = (
        (lambda b: jnp.pad(b, (0, f_pad - out_dim)))
        if f_pad != out_dim
        else (lambda b: b)
    )

    (c_in, c_out, c_dir, c_und, c_all), const = _gather_node_params(p, original_indices)
    lead = xc.shape[:2]
    reshape3 = lambda t: (  # noqa: E731
        t.reshape(lead + t.shape[-1:]) if getattr(t, "ndim", 0) == 2 else t
    )
    # Per-path gate products (f32 per-node math, tiny [A, G, 1] tensors).
    gate_in = reshape3(c_dir * c_all * c_in)
    gate_out = reshape3(c_dir * c_all * c_out)
    gate_und = reshape3(c_und * c_all)
    const = reshape3(const)
    if getattr(const, "ndim", 0) == 3 and const.shape[-1] != f_pad:
        const = jnp.pad(const, ((0, 0), (0, 0), (0, f_pad - const.shape[-1])))

    path_contrib = _make_path_contrib(wp, bp, out_dim, ct, use_pallas)

    acc = path_contrib(
        p["w_main_in"] + p["w_shared"], p["b_main_in"] + p["b_shared_in"],
        gate_in, graph.p_in, xc,
    )
    xc, acc = jax.lax.optimization_barrier((xc, acc))
    acc = acc + path_contrib(
        p["w_main_out"] + p["w_shared"], p["b_main_out"] + p["b_shared_out"],
        gate_out, graph.p_out, xc,
    )
    xc, acc = jax.lax.optimization_barrier((xc, acc))
    acc = acc + path_contrib(
        p["w_und"] + p["w_shared"], p["b_und"] + p["b_shared_und"],
        gate_und, graph.p_und, xc,
    )
    out = acc + const
    if out.shape[-1] != out_dim:
        out = out[..., :out_dim]  # restore the logical width at the exit
    return out


def _zeros_cotangent(tree):
    """Zero cotangents for a (constant) adjacency pytree: float leaves get
    zeros, integer index tables get float0 (the JAX convention)."""
    import numpy as _np

    return jax.tree_util.tree_map(
        lambda a: _np.zeros(a.shape, dtype=jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        tree,
    )


def _make_path_contrib(wp, bp, out_dim, ct, use_pallas):
    """One gated propagation path with a MANUAL, memory-bounded VJP.

    Forward: ``gate * (propagate(adj, x @ w) + b)``.  The backward saves
    only the inputs (checkpoint semantics) and — critically — runs its two
    propagation pipelines SEQUENTIALLY: first the forward recompute (needed
    for the gate gradient), then, behind an optimization barrier, the
    transpose propagation of the cotangent.  `jax.checkpoint` nesting
    cannot enforce this: XLA overlaps the two pipelines' DMA chains, and at
    5-gram scale each pipeline holds 3-4 ~1 GB buffers — the measured
    12-15 GB HLO-temp peaks across every scheduling variant of
    experiments/exp_memwall_r3*.  Adjacency weights get zero cotangents
    here (this path targets the memory-bound training mode; opt-in SDDMM
    lives on the standard propagate VJPs, ops/spmm.edge_gradients)."""

    @jax.custom_vjp
    def pc(w, b, gate, adj, xv):
        proj = xv @ wp(w).astype(ct)
        return gate.astype(ct) * (propagate(adj, proj, use_pallas) + bp(b).astype(ct))

    def pc_fwd(w, b, gate, adj, xv):
        return pc(w, b, gate, adj, xv), (w, b, gate, adj, xv)

    def pc_bwd(res, g):
        w, b, gate, adj, xv = res
        wc = wp(w).astype(ct)
        proj = xv @ wc
        # Pipeline A: forward recompute (for the gate/bias gradients).
        y, vjp_prop = jax.vjp(lambda pr: propagate(adj, pr, use_pallas), proj)
        yb = y + bp(b).astype(ct)
        gf = gate.astype(ct)
        prod = (g * yb).astype(jnp.float32)
        if getattr(gate, "ndim", 0) == 3:  # per-node [A, G, 1]
            dgate = jnp.sum(prod, axis=-1, keepdims=True).astype(gate.dtype)
        else:  # scalar gate
            dgate = jnp.sum(prod).reshape(gate.shape).astype(gate.dtype)
        dprop = gf * g
        db_pad = jnp.sum(
            dprop.astype(jnp.float32), axis=tuple(range(dprop.ndim - 1))
        )
        db = db_pad[:out_dim].astype(b.dtype)
        # Serialize: pipeline B (the transpose propagation) must not launch
        # until pipeline A's consumers are done, or both pipelines' ~1 GB
        # buffers coexist.
        dprop, dgate, db = jax.lax.optimization_barrier((dprop, dgate, db))
        (dproj,) = vjp_prop(dprop)
        dw_pad = jnp.einsum(
            "...i,...o->io", xv.astype(ct), dproj, preferred_element_type=jnp.float32
        )
        dw = dw_pad[:, :out_dim].astype(w.dtype)
        dxv = jnp.einsum("...o,io->...i", dproj, wc)
        return (dw, db, dgate, _zeros_cotangent(adj), dxv)

    pc.defvjp(pc_fwd, pc_bwd)
    return pc


def _combine_paths(p, x, ic, oc, uc, original_indices):
    """Hierarchical gating + per-node constant + exit-slice
    (reference combine: protgram_directgcn.py:131-135)."""
    (c_in, c_out, c_dir, c_und, c_all), const = _gather_node_params(p, original_indices)
    if x.ndim == 3:
        # rg-layout carry (hypercube graphs): per-node params follow the
        # same order-preserving [N, ·] -> [A, G, ·] reshape as the features.
        lead = x.shape[:2]
        reshape3 = lambda t: (  # noqa: E731
            t.reshape(lead + t.shape[-1:]) if getattr(t, "ndim", 0) == 2 else t
        )
        c_in, c_out, c_dir, c_und, c_all = map(
            reshape3, (c_in, c_out, c_dir, c_und, c_all)
        )
        const = reshape3(const)
        if getattr(const, "ndim", 0) == 3 and const.shape[-1] != ic.shape[-1]:
            # Padded-width layer: zero-pad the per-node constant's feature
            # dim (fuses into the gating loop).
            const = jnp.pad(
                const, ((0, 0), (0, 0), (0, ic.shape[-1] - const.shape[-1]))
            )
    directed = c_dir * (c_in * ic + c_out * oc)
    undirected = c_und * uc
    out = c_all * (undirected + directed) + const
    if out.ndim == 3 and out.shape[-1] != p["w_main_in"].shape[1]:
        # Restore the logical width once at the exit (padded-width layer).
        out = out[..., : p["w_main_in"].shape[1]]
    return out


def _use_retile_pallas() -> bool:
    """Route pack/unpack through the Pallas retile kernels on TPU: the
    jit-level lane-split/merge reshapes are 4-7x over HBM bandwidth there
    (pack 20 ms / unpack 27 ms at 5-gram scale vs 8.6 / 12.9 in-kernel —
    experiments/exp_unpack_r4.py; ops/pallas_retile.py)."""
    import os

    knob = os.environ.get("PROTGRAM_RETILE_PALLAS", "auto")
    if knob in ("0", "off"):
        return False
    if knob in ("1", "on"):
        return True
    return jax.default_backend() == "tpu"


def pack_rg_carry(t: jnp.ndarray, active: bool = True) -> jnp.ndarray:
    """Pack a sub-128-lane rg carry [A, G, F] to full 128-lane rows
    [A, ceil(G/(128/F)), 128].

    A [A, G, 64] bf16 carry physically occupies the 128-lane tile footprint
    (997 MB at 5-gram scale, 2x its logical bytes; 4x for 32-wide); packed,
    a SAVED or jit-boundary buffer is its logical size.  Pad slots are
    ZEROS (packed elementwise consumers rely on it)."""
    if not active or t.ndim != 3:
        return t
    a, g, f = t.shape
    if f >= 128 or 128 % f != 0:
        return t
    k = 128 // f
    gp = -(-g // k) * k
    if gp != g:
        t = jnp.pad(t, ((0, 0), (0, gp - g), (0, 0)))
    if _use_retile_pallas():
        from protgram_directgcn_tpu.ops.pallas_retile import pack_rg_pallas

        return pack_rg_pallas(t, f)
    return t.reshape(a, gp // k, 128)


def unpack_rg_carry(t: jnp.ndarray, f: int, g_real: int) -> jnp.ndarray:
    """Inverse of :func:`pack_rg_carry` (no-op on unpacked carries)."""
    if t.ndim != 3 or t.shape[-1] == f:
        return t
    k = 128 // f
    if _use_retile_pallas():
        from protgram_directgcn_tpu.ops.pallas_retile import unpack_pad_rg_pallas

        return unpack_pad_rg_pallas(t, f)[:, :g_real, :f]
    return t.reshape(t.shape[0], t.shape[1] * k, f)[:, :g_real, :]


def apply_layer_range(
    params: Params,
    graph: DeviceGraph,
    h: jnp.ndarray,
    cfg: DirectGCNConfig,
    start: int,
    stop: int,
    *,
    train: bool,
    drop_keys,
    original_indices=None,
    rg_lead: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Run GCN layers [start, stop) on a flat or rg carry.

    The carry convention between layers (and across staged-step jit
    boundaries, pipeline/trainer.make_train_step_staged): packed via
    :func:`pack_rg_carry` whenever ``cfg.remat_paths`` and the carry is rg —
    callers slicing the layer range hand over/receive packed carries for
    sub-128 widths.  ``drop_keys`` must be the FULL net's key list (one per
    layer, derived from one rng) so staged and fused execution drop the same
    units."""
    ct = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    pack = cfg.remat_paths and rg_lead is not None

    # ``graph`` is an explicit argument (not a closure) of the checkpointed
    # block: closed-over constants get COPIED into the rematerialized
    # computation by XLA (a ~1 GB copy PER BANK per layer at 5-gram scale),
    # while explicit inputs are referenced in place.
    def layer_block(layer_p, rp, gg, hh, drop_key):
        if pack and hh.ndim == 3:
            hh = unpack_rg_carry(hh, layer_p["w_main_in"].shape[0], rg_lead[1])
        gcn_out = _layer_apply(layer_p, gg, hh, cfg, original_indices)
        # Residual weights are f32 params: cast to the carry dtype so the
        # projection (and everything downstream of the add) stays bf16
        # under bf16 compute instead of promoting the whole layer tail.
        res_out = (
            hh if rp is None
            else hh @ rp["w"].astype(hh.dtype) + rp["b"].astype(hh.dtype)
        )
        s = gcn_out + res_out
        # PACK BEFORE the activation tail: pack is a permutation (pad slots
        # zero; leaky/dropout keep zeros zero), so leaky_relu and the
        # dropout mask run on the packed half-size buffer — each elementwise
        # sweep on a sub-128-lane rg array pays full 128-lane tile bytes
        # otherwise (measured ~13 ms/layer saved at 5-gram scale,
        # experiments/exp_fwd_stage_r5.py).  The staged manual backward's
        # carry trick (ds = g * phi(h), trainer.ds_from_carry) reads the
        # packed carry elementwise and is order-independent.
        s = pack_rg_carry(s, pack)
        out = jax.nn.leaky_relu(s, negative_slope=cfg.leaky_relu_slope)
        # Dropout INSIDE the (possibly remat'd) block: the bernoulli mask is
        # recomputed on backward instead of being saved per layer — at
        # 5-gram hypercube scale each saved mask is ~0.5 GB.
        if train and drop_key is not None and cfg.dropout > 0:
            keep = 1.0 - cfg.dropout
            mask = jax.random.bernoulli(drop_key, keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
        # bf16 inter-layer carry under bf16 compute: the next layer casts to
        # bf16 anyway, and the saved-for-backward activation halves (the
        # backward-saved f32 copies were the largest OOM allocations at
        # 5-gram scale — see experiments/exp_memwall_r2.py).
        return out.astype(ct) if ct is not None else out

    if cfg.remat:
        layer_block = jax.checkpoint(layer_block, static_argnums=())

    for i in range(start, stop):
        h = layer_block(params["layers"][i], params["res_projs"][i], graph, h, drop_keys[i])
    return h


def apply_decoder(
    dec_p: Params, h: jnp.ndarray, cfg: DirectGCNConfig, *, train: bool, drop_key
) -> jnp.ndarray:
    """The 2-layer decoder head (reference: protgram_directgcn.py:173-180).

    Runs in the carry dtype: at 5-gram hypercube scale each f32 [A, G, ·]
    decoder buffer lane-pads to ~2 GB (64- and 32-wide heads pad to 128
    lanes regardless of dtype — bf16 halves the bytes).  Under cfg.remat
    only ``h`` is saved for the backward."""

    def block(dp, hh, key):
        z = jax.nn.relu(hh @ dp["w1"].astype(hh.dtype) + dp["b1"].astype(hh.dtype))
        if train and key is not None and cfg.decoder_dropout > 0:
            keep = 1.0 - cfg.decoder_dropout
            mask = jax.random.bernoulli(key, keep, z.shape)
            z = jnp.where(mask, z / keep, 0.0)
        return z @ dp["w2"].astype(z.dtype) + dp["b2"].astype(z.dtype)

    if cfg.remat:
        block = jax.checkpoint(block)
    return block(dec_p, h, drop_key)


def _apply_pe(params: Params, x: jnp.ndarray, cfg: DirectGCNConfig) -> jnp.ndarray:
    """Per-slot learned positional encoding for 1-gram-composed features
    (reference: protgram_directgcn.py:182-193)."""
    if "pe_table" not in params:
        return x
    n, d1 = cfg.n_gram_len, cfg.one_gram_dim
    if n <= 0 or d1 <= 0 or x.shape[1] != n * d1:
        return x
    pos = min(n, cfg.max_pe_len)
    xr = x.reshape(-1, n, d1)
    xr = xr.at[:, :pos, :].add(params["pe_table"][:pos][None, :, :])
    return xr.reshape(-1, n * d1)


def directgcn_apply(
    params: Params,
    graph: DeviceGraph,
    x: jnp.ndarray,
    cfg: DirectGCNConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    original_indices: Optional[jnp.ndarray] = None,
    flatten_rg: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (log_softmax logits, L2-normalized embeddings)
    (reference: protgram_directgcn.py:195-222).

    ``flatten_rg=False`` keeps rg-layout ([A, G, ·]) outputs when the carry
    is rg: the flat [N, ·] restore is a materialised ~1 GB sublane-merge
    relayout at 5-gram scale, which the training loss avoids by reshaping
    its tiny y/mask vectors into [A, G] instead (pipeline/trainer._loss_fn)."""
    h = _apply_pe(params, x, cfg)
    # Hypercube graphs: carry features in the kernels' native rg layout
    # [A, G, F] through every layer (all ops here are row-wise), so the 3
    # propagations per layer never pay a flat<->rg relayout on TPU.  The
    # external [N, ·] contract is restored at the exit.
    rg_lead = None
    if original_indices is None and h.ndim == 3:
        # Caller already supplies the kernel-native rg layout [A, G, F] —
        # preferred at scale: the flat->rg reshape below otherwise
        # materialises a full copy of the features inside every step
        # (~1 GB at 5-gram scale, see experiments/exp_memwall_r2.py).
        rg_lead = h.shape[:2]
    elif original_indices is None and h.ndim == 2:
        from protgram_directgcn_tpu.ops.hypercube import HypercubeAdj
        from protgram_directgcn_tpu.parallel.hyper_shard import HyperShardAdj

        mats = (graph.p_in, graph.p_out, graph.p_und)
        rg_types = (HypercubeAdj, HyperShardAdj)
        if all(isinstance(m, rg_types) for m in mats) and h.shape[0] == mats[0].n_out:
            rg_lead = mats[0].feature_shape
            h = h.reshape(rg_lead + h.shape[-1:])
    n_layers = len(params["layers"])
    if train and rng is not None:
        drop_keys = jax.random.split(rng, n_layers + 1)
    else:
        drop_keys = [None] * (n_layers + 1)

    h = apply_layer_range(
        params, graph, h, cfg, 0, n_layers,
        train=train, drop_keys=drop_keys, original_indices=original_indices,
        rg_lead=rg_lead,
    )
    if h.ndim == 3:
        h = unpack_rg_carry(h, cfg.layer_dims[-1], rg_lead[1])

    logits = apply_decoder(params["decoder"], h, cfg, train=train, drop_key=drop_keys[-1])

    h32 = h.astype(jnp.float32)
    norm = jnp.linalg.norm(h32, axis=-1, keepdims=True)
    normalized = h32 / (norm + cfg.l2_eps)
    # Row-wise f32 softmax math (torch-AMP promotes log_softmax the same
    # way) but STORED in the carry dtype: an f32 [A, G, C] result would
    # lane-pad to ~2 GB at 5-gram scale.  The fusion keeps the f32 strictly
    # in registers.
    log_sm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    if rg_lead is not None and flatten_rg:
        log_sm = log_sm.reshape((-1,) + log_sm.shape[2:])
        normalized = normalized.reshape((-1,) + normalized.shape[2:])
    return log_sm, normalized
