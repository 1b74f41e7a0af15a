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
    hidden = final_dim // 2 if final_dim > 1 else 1
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
        const = p["constant"][original_indices] if p["constant"] is not None else 0.0
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

    Each (projection -> propagation -> bias) path is its own checkpoint
    region, chained by optimization barriers: during the layer's backward,
    path k's ~1 GB pipeline buffers are recomputed, consumed, and DEAD
    before path k-1's backward begins.  Without this, all three paths'
    buffers coexist in the rematerialized backward (12.86 GB HLO temp
    measured at 5-gram scale — the r3 OOM driver).  Graph/weights enter as
    explicit checkpoint arguments: closed-over constants get COPIED into
    rematerialized computations by XLA (~1 GB per bank per layer)."""
    bp = (
        (lambda b: jnp.pad(b, (0, f_pad - out_dim)))
        if f_pad != out_dim
        else (lambda b: b)
    )

    @functools.partial(jax.checkpoint, static_argnums=())
    def path_fn(w, b, adj, xv):
        proj = xv @ wp(w).astype(ct)
        return propagate(adj, proj, use_pallas) + bp(b).astype(ct)

    ic = path_fn(
        p["w_main_in"] + p["w_shared"], p["b_main_in"] + p["b_shared_in"],
        graph.p_in, xc,
    )
    xc, ic = jax.lax.optimization_barrier((xc, ic))
    oc = path_fn(
        p["w_main_out"] + p["w_shared"], p["b_main_out"] + p["b_shared_out"],
        graph.p_out, xc,
    )
    xc, oc = jax.lax.optimization_barrier((xc, oc))
    uc = path_fn(
        p["w_und"] + p["w_shared"], p["b_und"] + p["b_shared_und"],
        graph.p_und, xc,
    )
    return _combine_paths(p, xc, ic, oc, uc, original_indices)


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

    ct = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    # ``graph`` is an explicit argument (not a closure) of the checkpointed
    # block: closed-over constants get COPIED into the rematerialized
    # computation by XLA (a ~1 GB copy PER BANK per layer at 5-gram scale),
    # while explicit inputs are referenced in place.
    def layer_block(layer_p, rp, gg, hh, drop_key):
        gcn_out = _layer_apply(layer_p, gg, hh, cfg, original_indices)
        # Residual weights are f32 params: cast to the carry dtype so the
        # projection (and everything downstream of the add) stays bf16
        # under bf16 compute instead of promoting the whole layer tail.
        res_out = (
            hh if rp is None
            else hh @ rp["w"].astype(hh.dtype) + rp["b"].astype(hh.dtype)
        )
        out = jax.nn.leaky_relu(gcn_out + res_out, negative_slope=cfg.leaky_relu_slope)
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

    for i in range(n_layers):
        h = layer_block(params["layers"][i], params["res_projs"][i], graph, h, drop_keys[i])

    dec = params["decoder"]
    # Decoder in the carry dtype: at 5-gram hypercube scale each f32
    # [A, G, ·] decoder buffer lane-pads to ~2 GB (64- and 32-wide heads
    # pad to 128 lanes regardless of dtype — bf16 halves the bytes).
    z = jax.nn.relu(h @ dec["w1"].astype(h.dtype) + dec["b1"].astype(h.dtype))
    if train and drop_keys[-1] is not None and cfg.decoder_dropout > 0:
        keep = 1.0 - cfg.decoder_dropout
        mask = jax.random.bernoulli(drop_keys[-1], keep, z.shape)
        z = jnp.where(mask, z / keep, 0.0)
    logits = z @ dec["w2"].astype(z.dtype) + dec["b2"].astype(z.dtype)

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
