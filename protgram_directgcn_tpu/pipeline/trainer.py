"""Hierarchical DirectGCN trainer: per-n-gram-level training with feature
cascading, protein pooling, and H5/PCA export.

TPU-native re-design of the reference trainer
(reference: src/pipeline/protgram_directgcn_trainer.py:68-426):

- one jitted train step per level (static shapes; levels are few so a
  recompile per level is the intended trade);
- optax Adam with torch-style L2-in-gradient weight decay, plateau LR
  schedule and early stopping driven host-side off the per-epoch loss;
- Cluster-GCN-equivalent partitioned training: clusters are padded to one
  common node budget so every cluster reuses a single compiled step, and
  subgraph adjacency goes dense — a few-hundred-node dense block is faster
  on the MXU than any sparse form;
- feature cascading (level n initialised from mean of prefix/suffix
  (n-1)-gram embeddings) fully vectorized via sorted-vocab searchsorted;
- per-level checkpoint artifacts (.npz) enabling resume, replacing the
  reference's pickle flow.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from protgram_directgcn_tpu.config import Config
from protgram_directgcn_tpu.graph.partition import partition_nodes
from protgram_directgcn_tpu.graph.structure import DeviceGraph, NgramGraph, load_graph
from protgram_directgcn_tpu.models.directgcn import (
    DirectGCNConfig,
    directgcn_apply,
    init_directgcn_params,
)
from protgram_directgcn_tpu.ops.spmm import build_adjacency
from protgram_directgcn_tpu.pipeline.labels import generate_labels
from protgram_directgcn_tpu.utils import embeddings as emb_utils
from protgram_directgcn_tpu.utils.io import (
    ensure_dir,
    generate_regex_id_map,
    logger,
    parse_fasta,
    write_h5_embeddings,
)


class PlateauScheduler:
    """ReduceLROnPlateau with torch defaults (mode=min, rel threshold 1e-4)
    (reference: protgram_directgcn_trainer.py:84)."""

    def __init__(self, lr: float, patience: int, factor: float, threshold: float = 1e-4):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, loss: float) -> float:
        if loss < self.best * (1.0 - self.threshold):
            self.best = loss
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr


class EarlyStopper:
    """Stop when loss stops improving (reference: protgram_directgcn_trainer.py:48-65)."""

    def __init__(self, patience: int, min_delta: float):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_loss = float("inf")

    def should_stop(self, loss: float) -> bool:
        if loss < self.best_loss - self.min_delta:
            self.best_loss = loss
            self.counter = 0
            return False
        self.counter += 1
        return self.counter >= self.patience


# Parameter names of the per-node tables (5 gates + the [N, out] constant,
# reference: protgram_directgcn.py:48-66).  Optimizer routing labels by THIS
# name set, not by leading-dim == num_nodes: a dense weight whose fan-in
# happens to equal the node count (128-node toy graphs with 128-wide layers)
# must keep torch-parity Adam.
_NODE_PARAM_NAMES = frozenset(
    {"c_in", "c_out", "c_directed", "c_undirected", "c_all", "constant"}
)

# Adafactor only factors a second moment when BOTH dims reach this size;
# below it the leaf keeps a full [shape] v.  32 covers the [N, out>=32]
# constants while the [N, 1] gates keep (tiny, f32) full moments.
_FACTOR_MIN_DIM = 32


def _f32_state(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``inner`` in f32 regardless of parameter storage dtype.

    Optax state inherits the parameter dtype, so bf16 node params would get
    bf16 second moments — and a decay_rate~0.999 EMA's 1e-3 relative
    increments sit below bf16's ~4e-3 resolution: warm moments stop
    updating.  Casting params/grads at the boundary keeps all optimizer
    state and moment math in f32; ``optax.apply_updates`` casts the f32
    update back to the parameter dtype at the apply site."""

    def f32(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if getattr(a, "dtype", None) == jnp.bfloat16
            else a,
            tree,
        )

    def init(params):
        return inner.init(f32(params))

    def update(updates, state, params=None):
        return inner.update(f32(updates), state, None if params is None else f32(params))

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float, weight_decay: float, factor_node_params_above: Optional[int] = None
) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 added to the gradient before the Adam
    moments (reference: protgram_directgcn_trainer.py:354).

    ``factor_node_params_above``: when set to a node count N, the per-node
    tables (the 5 gates and the [N, out] constants, identified by parameter
    NAME with a shape[0] == N guard) train with factored-second-moment,
    momentum-free Adafactor instead of Adam.  At 5-gram hypercube scale full
    Adam moments for the node tables are ~5 GB of a 16 GB chip; the factored
    state is tens of MB.  The trainer enables this automatically ("auto")
    only when the Adam residency estimate would not fit the chip, and logs
    the switch.  All optimizer state is held in f32 (see _f32_state)."""

    def factory(learning_rate):
        steps = []
        if weight_decay > 0:
            steps.append(optax.add_decayed_weights(weight_decay))
        adam = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-learning_rate)
        )
        if factor_node_params_above is None:
            steps.append(_f32_state(adam))
            return optax.chain(*steps)
        n = int(factor_node_params_above)
        fact = optax.adafactor(
            learning_rate=learning_rate,
            multiply_by_parameter_scale=False,
            clipping_threshold=None,
            decay_rate=0.999,
            min_dim_size_to_factor=_FACTOR_MIN_DIM,
        )

        def labels(params):
            def label(path, p):
                name = None
                for entry in reversed(path):
                    if isinstance(entry, jax.tree_util.DictKey):
                        name = entry.key
                        break
                nd = getattr(p, "ndim", 0)
                is_node = name in _NODE_PARAM_NAMES and nd >= 1 and (
                    p.shape[0] == n
                    # rg-native constant [A, G, out] (A*G == padded node count)
                    or (nd == 3 and p.shape[0] * p.shape[1] == n)
                )
                return "node" if is_node else "dense"

            return jax.tree_util.tree_map_with_path(label, params)

        steps.append(
            optax.multi_transform(
                {"dense": _f32_state(adam), "node": _f32_state(fact)}, labels
            )
        )
        return optax.chain(*steps)

    return optax.inject_hyperparams(factory)(learning_rate=lr)


def _loss_fn(params, graph, x, y, mask, weight_factor, rng, model_cfg, l2_lambda, original_indices):
    log_sm, _ = directgcn_apply(
        params, graph, x, model_cfg, train=True, rng=rng,
        original_indices=original_indices, flatten_rg=False,
    )
    if log_sm.ndim == 3:
        # rg-layout output: reshape the tiny label/mask vectors into [A, G]
        # instead of paying the model's ~1 GB flat-restore relayout.
        y = y.reshape(log_sm.shape[:2])
        mask = mask.reshape(log_sm.shape[:2])
    per_node = -jnp.take_along_axis(log_sm, y[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(mask.sum(), 1.0)
    primary = jnp.sum(per_node * mask) / denom
    # Accumulate L2 in f32 (bf16 node-param storage would otherwise lose the
    # sum over millions of per-node entries).
    l2 = sum(
        jnp.sum(jnp.square(p.astype(jnp.float32)))
        for p in jax.tree_util.tree_leaves(params)
    )
    return primary * weight_factor + l2_lambda * l2, primary


def make_train_step(model_cfg: DirectGCNConfig, opt: optax.GradientTransformation, l2_lambda: float):
    # Donate params/opt_state: without donation the old and updated pytrees
    # are live simultaneously — ~2x parameter+moment HBM (the [N, out]
    # per-node constant alone is ~1 GB at 5-gram hypercube scale).  Callers
    # must rebind both from the step's returns (all ours do).
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, graph, x, y, mask, weight_factor, rng, original_indices):
        (loss, primary), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            params, graph, x, y, mask, weight_factor, rng, model_cfg, l2_lambda, original_indices
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, primary

    return step


def set_learning_rate(opt_state, lr: float):
    """Plateau-scheduler hook that works for both the fused step's single
    inject_hyperparams state and the staged step's per-stage states."""
    lr = jnp.asarray(lr)
    if isinstance(opt_state, StagedOptState):
        for s in opt_state.stages:
            s.hyperparams["learning_rate"] = lr
    else:
        opt_state.hyperparams["learning_rate"] = lr


class StagedOptState(NamedTuple):
    """Per-stage optimizer states for the layer-staged train step (a pytree,
    so orbax checkpointing and tree_map over it keep working)."""

    stages: Tuple[Any, ...]


def _node_params_to_rg(params, full_graph):
    """Store each layer's per-node constant in the kernel-native rg layout
    [A, G, out] on hypercube-format levels (single-chip).

    The flat [N, out] layout forces a materialised [N,out]<->[A,G,out]
    relayout (~40-45 ms each at 5-gram scale, G odd => sublane-misaligned;
    measured in experiments/exp_nodeparam_layout_r5.py) at EVERY forward
    constant-add and every staged-step constant-gradient assembly; the rg
    layout makes both free (models/directgcn reshape3 and trainer
    _const_pad/assemble_update handle either form).  Gates stay [N, 1]:
    their rg form measured no faster.  Subgraph (original_indices) batches
    flatten on the fly in _gather_node_params."""
    lead = getattr(full_graph.p_in, "feature_shape", None)
    if lead is None:
        return params
    a, g = lead
    for lp in params["layers"]:
        c = lp.get("constant")
        if c is not None and getattr(c, "ndim", 0) == 2 and c.shape[0] == a * g:
            lp["constant"] = c.reshape(a, g, c.shape[-1])
    return params


def make_train_step_staged(
    model_cfg: DirectGCNConfig,
    make_opt,
    l2_lambda: float,
    split,
):
    """Layer-staged training step: same numerics as :func:`make_train_step`,
    executed as a SEQUENCE of jits so no single XLA program holds the full
    backward.

    The fused 4-layer step at 5-gram scale needs 13-15 GB of HLO temps on
    top of ~5 GB of resident arguments — over a 16 GB v5e no matter how the
    backward is rematerialized (measured across six scheduling variants,
    experiments/exp_memwall_r3*.log and this file's history).  Staging
    bounds the peak: ``split`` names the interior layer boundaries (an int
    for one boundary, or a list — e.g. ``[1, 2, 3]`` stages every layer of
    a 4-layer net); each stage gets

        - a forward jit (layers only, no autodiff residuals),
        - a grad jit — the final stage's computes decoder + loss and the
          boundary-carry cotangent; earlier stages re-run their forward
          inside ``jax.vjp`` (cross-jit remat) and hand the cotangent back,
        - an immediate optimizer-update jit (donated), so one stage's
          gradients are consumed before the previous stage's backward runs.

    Boundary carries and cotangents are DONATED to their consumers.
    ``make_opt`` is a zero-arg optimizer factory (per-stage states;
    Adam/Adafactor updates are per-leaf, so per-stage updates are identical
    to the fused step's).  Torch-parity L2-in-gradient is applied
    analytically (d/dp of l2_lambda*sum(p^2) = 2*l2_lambda*p).  Dropout
    keys derive from ONE rng exactly as in the fused step.  Requires
    one_gram_dim == 0 (no PE table; the staged path targets deep n>=2
    levels)."""
    from protgram_directgcn_tpu.models.directgcn import (
        apply_decoder,
        apply_layer_range,
        unpack_rg_carry,
    )

    assert model_cfg.one_gram_dim == 0, "staged step does not support PE levels"
    n_layers = len(model_cfg.layer_dims) - 1
    splits = [split] if isinstance(split, int) else sorted(split)
    # A boundary AT n_layers makes the final stage decoder+loss only (its
    # layer range is empty) — the leanest final-stage program.
    assert all(0 < s <= n_layers for s in splits) and len(set(splits)) == len(splits)
    # Always close with n_layers: a trailing split AT n_layers yields a
    # final (n_layers, n_layers) range — the decoder-only loss stage.
    bounds = [0] + list(splits) + [n_layers]
    m = len(bounds) - 1  # stages
    ranges = [(bounds[k], bounds[k + 1]) for k in range(m)]
    opts = [make_opt() for _ in range(m)]

    def _rg_lead(graph):
        return getattr(graph.p_in, "feature_shape", None)

    def _keys(rng):
        return jax.random.split(rng, n_layers + 1)

    def _stage_params(params, k):
        lo, hi = ranges[k]
        d = {"layers": params["layers"][lo:hi], "res_projs": params["res_projs"][lo:hi]}
        if k == m - 1:
            d["decoder"] = params["decoder"]
        return d

    def _l2(tree):
        return sum(
            jnp.sum(jnp.square(p.astype(jnp.float32)))
            for p in jax.tree_util.tree_leaves(tree)
        )

    def _add_l2_grads(grads, params):
        # Matches the fused step's autodiff of l2_lambda * sum(p.astype(f32)^2).
        return jax.tree_util.tree_map(
            lambda g, p: (
                g.astype(jnp.float32) + 2.0 * l2_lambda * p.astype(jnp.float32)
            ).astype(g.dtype),
            grads, params,
        )

    def _run_stage(k, pk, graph, c, keys):
        lo, hi = ranges[k]
        return apply_layer_range(
            pk, graph, c, model_cfg, 0, hi - lo,
            train=True, drop_keys=keys[lo:hi], rg_lead=_rg_lead(graph),
        )

    def make_stage_fwd(k):
        @jax.jit
        def stage_fwd(pk, graph, c, rng):
            return _run_stage(k, pk, graph, c, _keys(rng))

        return stage_fwd

    def make_final_grad(k, donate_carry=True):
        @functools.partial(jax.jit, donate_argnums=(2,) if donate_carry else ())
        def final_grad(pk, graph, carry, y, mask, weight_factor, rng):
            lead = _rg_lead(graph)
            keys = _keys(rng)

            def loss_fn(pv, cv):
                h = _run_stage(k, pv, graph, cv, keys)
                if h.ndim == 3 and lead is not None:
                    h = unpack_rg_carry(h, model_cfg.layer_dims[-1], lead[1])
                logits = apply_decoder(pv["decoder"], h, model_cfg, train=True, drop_key=keys[-1])
                log_sm = jax.nn.log_softmax(
                    logits.astype(jnp.float32), axis=-1
                ).astype(logits.dtype)
                yv, mv = y, mask
                if log_sm.ndim == 3:
                    yv = yv.reshape(log_sm.shape[:2])
                    mv = mv.reshape(log_sm.shape[:2])
                per_node = -jnp.take_along_axis(log_sm, yv[..., None], axis=-1)[..., 0]
                denom = jnp.maximum(mv.sum(), 1.0)
                primary = jnp.sum(per_node * mv) / denom
                return primary * weight_factor, primary

            (loss_p, primary), (g_p, g_c) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(pk, carry)
            return _add_l2_grads(g_p, pk), g_c, loss_p, primary, _l2(pk)

        return final_grad

    def make_stage_grad(k):
        # x (the k == 0 carry) must not be donated — it is reused every step.
        donate = (2, 3) if k > 0 else (3,)

        @functools.partial(jax.jit, donate_argnums=donate)
        def stage_grad(pk, graph, carry, g_next, rng):
            keys = _keys(rng)

            def f(pv):
                return _run_stage(k, pv, graph, carry, keys)

            _, vjp = jax.vjp(f, pk)
            (g_p,) = vjp(g_next)
            return _add_l2_grads(g_p, pk), _l2(pk)

        return stage_grad

    def make_stage_grad_carry(k):
        # Interior stage that must also hand back its own input cotangent.
        donate = (2, 3) if k > 0 else (3,)

        @functools.partial(jax.jit, donate_argnums=donate)
        def stage_grad_c(pk, graph, carry, g_next, rng):
            keys = _keys(rng)

            def f(pv, cv):
                return _run_stage(k, pv, graph, cv, keys)

            _, vjp = jax.vjp(f, pk, carry)
            g_p, g_c = vjp(g_next)
            return _add_l2_grads(g_p, pk), g_c, _l2(pk)

        return stage_grad_c

    def make_stage_grad_carry_recompute(k, j):
        # Stage k whose input carry is NOT held device-resident (128-wide
        # boundaries cannot pack, so holding one costs a full ~1 GB at
        # 5-gram scale): recompute it from the nearest held carry c_j by
        # running stages j..k-1 forward (their params are pre-update at this
        # point of the backward sweep, so the recomputation is bit-identical
        # to the original forward).  stop_gradient keeps the vjp scoped to
        # stage k; the returned cotangent is w.r.t. stage k's input as
        # usual.
        donate = (4,)  # g_next; c_j stays (it may feed stage j's own grad)

        @functools.partial(jax.jit, donate_argnums=donate)
        def stage_grad_rec(pk, ps_prev, graph, c_j, g_next, rng):
            keys = _keys(rng)
            c = c_j
            for t, pt in zip(range(j, k), ps_prev):
                c = _run_stage(t, pt, graph, c, keys)
            c = jax.lax.stop_gradient(c)

            def f(pv, cv):
                return _run_stage(k, pv, graph, cv, keys)

            _, vjp = jax.vjp(f, pk, c)
            g_p, g_c = vjp(g_next)
            return _add_l2_grads(g_p, pk), g_c, _l2(pk)

        return stage_grad_rec

    def make_update(k):
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def update(pk, opt_state, g):
            updates, opt_state = opts[k].update(g, opt_state, pk)
            return optax.apply_updates(pk, updates), opt_state

        return update

    # ------------------------------------------------------------------
    # Manual per-path layer backward: even a SINGLE layer's vjp program
    # (recompute + three path transposes + gate/const grads) peaks ~10 GB at
    # 5-gram scale — XLA will not serialize the path pipelines inside one
    # program tightly enough.  For interior single-layer stages in the rg
    # per-node mode, the gradient is computed as a host-driven sequence of
    # SMALL jits, each bounded by one propagation pipeline:
    #   S: recompute the pre-activation sum s (3 barrier-chained paths)
    #   T: elementwise tail backward (dropout -> leaky -> residual); emits
    #      ds — which IS the constant's gradient and every path's upstream
    #      cotangent
    #   P_i (x3): one path's backward — pipeline A (forward recompute for
    #      the gate grad), barrier, pipeline B (transpose propagation);
    #      accumulates the carry cotangent
    #   A: assemble the layer's gradient pytree (shared-weight sums, gate
    #      product chain rule, L2) and apply the optimizer — all donated.
    # ------------------------------------------------------------------

    _PATHS = (
        ("w_main_in", "b_main_in", "b_shared_in", "p_in"),
        ("w_main_out", "b_main_out", "b_shared_out", "p_out"),
        ("w_und", "b_und", "b_shared_und", "p_und"),
    )

    def _manual_ok(k):
        lo, hi = ranges[k]
        return (
            hi - lo == 1
            and model_cfg.remat_paths
            and model_cfg.use_vector_coeffs
            and model_cfg.num_nodes > 0
        )

    def make_interior_grad_manual(k):
        from protgram_directgcn_tpu.models.directgcn import pack_rg_carry
        from protgram_directgcn_tpu.ops.spmm import propagate, propagate_transpose

        li = ranges[k][0]  # absolute layer index
        in_dim = model_cfg.layer_dims[li]
        out_dim = model_cfg.layer_dims[li + 1]
        f_pad = -(-out_dim // 128) * 128
        # Sub-128 widths pack below the lane tile: the per-path propagation
        # outputs y are cheap enough to SAVE across the S recompute
        # (261-523 MB each at 5-gram scale), which drops each path backward
        # from recompute-forward + transpose (2 propagations + a projection
        # matmul) to the transpose propagation alone — 9 -> 6 propagations
        # per layer backward (VERDICT r3 next-step #2 / CLAUDE.md lead (c)).
        # 128-wide outputs would cost a full ~1 GB per path; keep recompute.
        save_y = out_dim < 128 and 128 % out_dim == 0
        # Stage 0's input is x itself — nothing below consumes its input
        # cotangent, so its three path backwards skip the widest einsum
        # (dproj @ Wᵀ) and the [A, G, in_pad] accumulation entirely.
        need_dxc = k > 0
        ct = jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16" else jnp.float32
        use_pallas = model_cfg.use_pallas
        slope = model_cfg.leaky_relu_slope
        dropout = model_cfg.dropout
        wp = (
            (lambda w: jnp.pad(w, ((0, 0), (0, f_pad - out_dim))))
            if f_pad != out_dim else (lambda w: w)
        )
        bp = (
            (lambda b: jnp.pad(b, (0, f_pad - out_dim)))
            if f_pad != out_dim else (lambda b: b)
        )

        def _unpack(t, f, lead):
            from protgram_directgcn_tpu.models.directgcn import unpack_rg_carry

            return unpack_rg_carry(t, f, lead[1])

        def _gate_products(lp, lead):
            a, g_real = lead
            r3 = lambda t: t.reshape((a, g_real, 1))  # noqa: E731
            gi = r3(lp["c_directed"] * lp["c_all"] * lp["c_in"])
            go = r3(lp["c_directed"] * lp["c_all"] * lp["c_out"])
            gu = r3(lp["c_undirected"] * lp["c_all"])
            return gi, go, gu

        def _const_pad(lp, lead):
            a, g_real = lead
            c = lp["constant"]
            if c.ndim == 2:
                # Legacy flat storage: the [N,out]->[A,G,out] reshape is a
                # materialised ~45 ms relayout at 5-gram scale (G odd =>
                # sublane-misaligned); rg-native storage (the trainer's
                # hypercube default, exp_nodeparam_layout_r5) skips it.
                c = c.reshape(a, g_real, out_dim)
            if f_pad != out_dim:
                c = jnp.pad(c, ((0, 0), (0, 0), (0, f_pad - out_dim)))
            return c

        @jax.jit
        def s_fwd(lp, rp, graph, carry):
            lead = _rg_lead(graph)
            xc = _unpack(carry, in_dim, lead).astype(ct)
            gates = _gate_products(lp, lead)
            acc = None
            for (wk, bm, bs, adj_attr), gate in zip(_PATHS, gates):
                proj = xc @ wp(lp[wk] + lp["w_shared"]).astype(ct)
                y = propagate(getattr(graph, adj_attr), proj, use_pallas)
                contrib = gate.astype(ct) * (y + bp(lp[bm] + lp[bs]).astype(ct))
                if acc is None:
                    acc = contrib
                else:
                    acc = acc + contrib
                xc, acc = jax.lax.optimization_barrier((xc, acc))
            s = (acc + _const_pad(lp, lead))[..., :out_dim]
            res = (
                xc if rp is None
                else xc @ rp["w"].astype(xc.dtype) + rp["b"].astype(xc.dtype)
            )
            s = s + res
            return pack_rg_carry(s.astype(ct))

        @jax.jit
        def fwd_with_ys(lp, rp, graph, carry, rng):
            # Forward-sweep variant for the TOP manual stage: emit the output
            # carry AND the packed per-path ys in one program, so the
            # backward (which runs immediately after the lean decoder-only
            # final stage) skips its ys_fwd recompute entirely.  Mirrors
            # apply_layer_range's activation/dropout ops exactly
            # (models/directgcn.py:515-537) — the parity suite checks it.
            lead = _rg_lead(graph)
            xc = _unpack(carry, in_dim, lead).astype(ct)
            gates = _gate_products(lp, lead)
            acc = None
            ys = []
            for (wk, bm, bs, adj_attr), gate in zip(_PATHS, gates):
                proj = xc @ wp(lp[wk] + lp["w_shared"]).astype(ct)
                y = propagate(getattr(graph, adj_attr), proj, use_pallas)
                ys.append(_pack_y(y, lead))
                contrib = gate.astype(ct) * (y + bp(lp[bm] + lp[bs]).astype(ct))
                acc = contrib if acc is None else acc + contrib
                xc, acc, _y = jax.lax.optimization_barrier((xc, acc, ys[-1]))
                ys[-1] = _y
            s = (acc + _const_pad(lp, lead))[..., :out_dim]
            res = (
                xc if rp is None
                else xc @ rp["w"].astype(xc.dtype) + rp["b"].astype(xc.dtype)
            )
            # Pack BEFORE the activation tail — must mirror
            # apply_layer_range's layer_block exactly (same op order, same
            # packed mask shape) for the staged==fused parity to hold.
            sp = pack_rg_carry((s + res).astype(ct))
            out = jax.nn.leaky_relu(sp, negative_slope=slope)
            if dropout > 0:
                keep = 1.0 - dropout
                mask = jax.random.bernoulli(_keys(rng)[li], keep, out.shape)
                out = jnp.where(mask, out / keep, 0.0)
            return out.astype(ct), tuple(ys)

        @jax.jit
        def ys_fwd(lp, graph, carry):
            # saved-y mode: emit ONLY the three packed propagation outputs —
            # no pre-activation accumulator, no s materialisation (tail_bwd
            # reconstructs s from the ys elementwise, exactly).  The r3
            # S-program PLUS three extra 0.5 GB outputs blew the 5-gram HBM
            # margin; this variant's program temps are one pipeline + one
            # packed output at a time.
            lead = _rg_lead(graph)
            xc = _unpack(carry, in_dim, lead).astype(ct)
            ys = []
            for (wk, bm, bs, adj_attr) in _PATHS:
                proj = xc @ wp(lp[wk] + lp["w_shared"]).astype(ct)
                y = propagate(getattr(graph, adj_attr), proj, use_pallas)
                ys.append(_pack_y(y, lead))
                xc, _last_y = jax.lax.optimization_barrier((xc, ys[-1]))
                ys[-1] = _last_y
            return tuple(ys)

        def _tail_core(lp, rp, carry, s, g_packed, rng, lead):
            g = _unpack(g_packed, out_dim, lead)
            key = _keys(rng)[li]
            if dropout > 0:
                keep = 1.0 - dropout
                mask = jax.random.bernoulli(key, keep, s.shape)
                # forward was out = where(mask, leaky(s)/keep, 0)
                dpre = jnp.where(mask, g / keep, jnp.zeros_like(g))
            else:
                dpre = g
            ds = dpre * jnp.where(s >= 0, 1.0, slope).astype(dpre.dtype)
            if rp is None:
                dwres = None
            else:
                xc = _unpack(carry, in_dim, lead).astype(ct)
                dwres = (
                    jnp.einsum("...i,...o->io", xc, ds, preferred_element_type=jnp.float32)
                    .astype(rp["w"].dtype),
                    jnp.sum(ds.astype(jnp.float32), axis=(0, 1)).astype(rp["b"].dtype),
                )
            # The residual branch's INPUT cotangent (identity pass-through or
            # ds @ Wres^T) is NOT returned: a full-width [A, G, in_pad]
            # resident between this jit and the path backwards was part of
            # the r4 OOM peak — path 0 computes it in-program from ds_p.
            return pack_rg_carry(ds), dwres

        @functools.partial(jax.jit, donate_argnums=(3, 4))
        def tail_bwd(lp, rp, carry, s_packed, g_packed, rng):
            lead = _rg_lead(graph_ref[0])
            s = _unpack(s_packed, out_dim, lead)
            return _tail_core(lp, rp, carry, s, g_packed, rng, lead)

        def _pack_y(y, lead):
            # Pack the propagation output (already f_pad-wide) without
            # materialising the [..., :out] slice: the Pallas pack kernel
            # reads lanes [0:out] only (ops/pallas_retile.py).
            from protgram_directgcn_tpu.models.directgcn import _use_retile_pallas

            if f_pad != out_dim and _use_retile_pallas():
                from protgram_directgcn_tpu.ops.pallas_retile import pack_rg_pallas

                kf_ = 128 // out_dim
                gpad = (-lead[1]) % kf_
                if gpad:
                    y = jnp.pad(y, ((0, 0), (0, gpad), (0, 0)))
                return pack_rg_pallas(y, out_dim)
            return pack_rg_carry(y[..., :out_dim])

        _xc_prep = save_y and in_dim < 128 and 128 % in_dim == 0

        @jax.jit
        def path_prep(ds_packed, carry):
            # ONE unpack of ds (padded to the propagation width) and of the
            # input carry, shared by all three path backwards — each path
            # paying its own ~25 ms relayouts was a third of the path cost.
            lead = _rg_lead(graph_ref[0])
            du = _unpack(ds_packed, out_dim, lead)
            if f_pad != out_dim:
                du = jnp.pad(du, ((0, 0), (0, 0), (0, f_pad - out_dim)))
            if _xc_prep:
                return du, _unpack(carry, in_dim, lead).astype(ct)
            return (du,)  # unpacked-input layers pass the carry straight through

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def ds_from_carry(g_packed, c_out_packed):
            # The retained OUTPUT carry already encodes everything the tail
            # needs: h = where(mask, leaky(s)/keep, 0), so sign(h) = sign(s)
            # wherever the node was kept and h == 0 exactly where it was
            # dropped.  ds = g * phi(h) with phi in {1/keep, slope/keep, 0}
            # is ONE packed elementwise op — no s reconstruction, no y
            # unpacks, no RNG replay, no relayouts.  (Sole deviation from
            # the autodiff tail: a kept node whose bf16 s is EXACTLY 0 gets
            # phi = 0 instead of 1/keep — a measure-zero subgradient choice.)
            keep = 1.0 - dropout if dropout > 0 else 1.0
            hi = jnp.asarray(1.0 / keep, g_packed.dtype)
            lo = jnp.asarray(slope / keep, g_packed.dtype)
            zero = jnp.zeros((), g_packed.dtype)
            phi = jnp.where(
                c_out_packed > 0, hi, jnp.where(c_out_packed < 0, lo, zero)
            )
            return g_packed * phi

        def make_path_bwd(i):
            """Path i's backward jit.  Path 0 additionally initialises the
            input-cotangent accumulator IN-PROGRAM from ds_p (identity
            residual pass-through or ds @ Wres^T) — holding that full-width
            [A, G, in_pad] buffer between tail_bwd and the paths was part of
            the r4 OOM peak.  Signatures therefore differ:
              i == 0: (lp, rp, graph, carry, [y_p,] ds_p)
              i  > 0: (lp, graph, carry, [y_p,] ds_p, dxc_acc)
            and when k == 0 (need_dxc False) no dxc is computed at all."""
            wk, bm, bs, adj_attr = _PATHS[i]
            first = i == 0
            kf = 128 // out_dim  # nodes per packed row (saved mode)

            def _dgate_packed(lp, ds_packed, y_p, lead):
                # Per-node sum over features WITHOUT unpacking: lane-slice
                # each node's segment out of the packed rows and reduce —
                # the reshape-then-reduce lowering is ~6x slower (measured,
                # experiments/exp_unpack_r4.py consume_sum vs _slices).
                a, g_real = lead
                b2 = jnp.tile((lp[bm] + lp[bs]).astype(ct), kf)
                prod = (ds_packed * (y_p + b2)).astype(jnp.float32)
                sums = [
                    jnp.sum(prod[:, :, j * out_dim:(j + 1) * out_dim], axis=-1)
                    for j in range(kf)
                ]
                rows = prod.shape[1]
                return (
                    jnp.stack(sums, axis=-1).reshape(a, rows * kf)[:, :g_real, None]
                )

            def _body(lp, rp, graph, carry, y_p, ds_packed, dxc_acc, du=None):
                lead = _rg_lead(graph)
                # saved mode receives the input pre-unpacked (path_prep for
                # packable widths, or the raw unpacked carry otherwise).
                xc = carry if save_y else _unpack(carry, in_dim, lead).astype(ct)
                gate = _gate_products(lp, lead)[i].astype(ct)
                wc = wp(lp[wk] + lp["w_shared"]).astype(ct)
                adj = getattr(graph, adj_attr)
                du0 = (
                    du[..., :out_dim] if (save_y and f_pad != out_dim)
                    else (du if save_y else _unpack(ds_packed, out_dim, lead))
                )
                dwres = None
                if save_y:
                    dgate = _dgate_packed(lp, ds_packed, y_p, lead)
                    vjp_prop = None
                else:
                    proj = xc @ wc
                    y, vjp_prop = jax.vjp(
                        lambda pr: propagate(adj, pr, use_pallas), proj
                    )
                    yb = y + bp(lp[bm] + lp[bs]).astype(ct)
                    if f_pad != out_dim:
                        yb = yb[..., :out_dim]
                    dgate = jnp.sum(
                        (du0 * yb).astype(jnp.float32), axis=-1, keepdims=True
                    )
                if first and need_dxc:
                    dxc_acc = (
                        du0 if rp is None
                        else jnp.einsum("...o,io->...i", du0, rp["w"].astype(du0.dtype))
                    )
                if first and save_y and rp is not None:
                    # Residual-projection grads, folded here where du0 and xc
                    # are already unpacked (the tail stage no longer exists
                    # in saved mode).
                    dwres = (
                        jnp.einsum(
                            "...i,...o->io", xc, du0,
                            preferred_element_type=jnp.float32,
                        ).astype(rp["w"].dtype),
                        jnp.sum(du0.astype(jnp.float32), axis=(0, 1)).astype(
                            rp["b"].dtype
                        ),
                    )
                if not save_y:
                    du = du0
                    if f_pad != out_dim:
                        du = jnp.pad(du0, ((0, 0), (0, 0), (0, f_pad - out_dim)))
                dprop = gate * du
                db = jnp.sum(dprop.astype(jnp.float32), axis=(0, 1))[:out_dim]
                # Pipeline B only after pipeline A's consumers finish.
                dprop, dgate, db = jax.lax.optimization_barrier((dprop, dgate, db))
                if save_y:
                    dproj = propagate_transpose(adj, dprop, use_pallas)
                else:
                    (dproj,) = vjp_prop(dprop)
                dw = jnp.einsum(
                    "...i,...o->io", xc, dproj, preferred_element_type=jnp.float32
                )[:, :out_dim]
                if not need_dxc:
                    dxc_out = jnp.zeros((), jnp.float32)
                else:
                    dxc_out = dxc_acc + jnp.einsum("...o,io->...i", dproj, wc)
                if first and save_y:
                    return dw, db, dgate, dxc_out, dwres
                return dw, db, dgate, dxc_out

            if first:
                if save_y:
                    @functools.partial(jax.jit, donate_argnums=(4,))
                    def path_first_saved(lp, rp, graph, xc_u, y_p, ds_p, du):
                        return _body(lp, rp, graph, xc_u, y_p, ds_p, None, du)

                    return path_first_saved, (4,)

                @jax.jit
                def path_first(lp, rp, graph, carry, ds_p):
                    return _body(lp, rp, graph, carry, None, ds_p, None)

                return path_first, ()
            if save_y:
                # The LAST path donates the shared prepped du (and the
                # prep-unpacked input when it is a distinct buffer).
                # Donation roles follow EXECUTION position: under
                # PROTGRAM_PATH_SWAP12=1 (anomaly experiment — run order
                # 0,2,1) path 1 is executed last and takes the du-donating
                # role.
                pos = i if not _swap12 else {1: 2, 2: 1}[i]
                if pos < 2:
                    donate = (3, 6)
                else:
                    donate = (2, 3, 5, 6) if _xc_prep else (3, 5, 6)

                @functools.partial(jax.jit, donate_argnums=donate)
                def path_rest_saved(lp, graph, xc_u, y_p, ds_p, du, dxc_acc):
                    return _body(lp, None, graph, xc_u, y_p, ds_p, dxc_acc, du)

                return path_rest_saved, donate

            @functools.partial(jax.jit, donate_argnums=(4,))
            def path_rest(lp, graph, carry, ds_p, dxc_acc):
                return _body(lp, None, graph, carry, None, ds_p, dxc_acc)

            return path_rest, (4,)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def assemble_update(pk, opt_state, parts):
            lp = pk["layers"][0]
            rp = pk["res_projs"][0]
            (dws, dbs, dgates, dwres, ds_packed) = parts
            lead = _rg_lead(graph_ref[0])
            n = model_cfg.num_nodes
            f32 = jnp.float32
            ci, co, cd, cu, ca = (
                lp["c_in"].astype(f32), lp["c_out"].astype(f32),
                lp["c_directed"].astype(f32), lp["c_undirected"].astype(f32),
                lp["c_all"].astype(f32),
            )
            dgi, dgo, dgu = (d.reshape(n, 1) for d in dgates)
            glp = {
                "w_main_in": dws[0].astype(lp["w_main_in"].dtype),
                "w_main_out": dws[1].astype(lp["w_main_out"].dtype),
                "w_und": dws[2].astype(lp["w_und"].dtype),
                "w_shared": (dws[0] + dws[1] + dws[2]).astype(lp["w_shared"].dtype),
                "b_main_in": dbs[0].astype(lp["b_main_in"].dtype),
                "b_shared_in": dbs[0].astype(lp["b_shared_in"].dtype),
                "b_main_out": dbs[1].astype(lp["b_main_out"].dtype),
                "b_shared_out": dbs[1].astype(lp["b_shared_out"].dtype),
                "b_und": dbs[2].astype(lp["b_und"].dtype),
                "b_shared_und": dbs[2].astype(lp["b_shared_und"].dtype),
                "c_in": (dgi * cd * ca).astype(lp["c_in"].dtype),
                "c_out": (dgo * cd * ca).astype(lp["c_out"].dtype),
                "c_directed": (dgi * ca * ci + dgo * ca * co).astype(lp["c_directed"].dtype),
                "c_undirected": (dgu * ca).astype(lp["c_undirected"].dtype),
                "c_all": (dgi * cd * ci + dgo * cd * co + dgu * cu).astype(lp["c_all"].dtype),
                # ds IS the constant's gradient; rg-native storage takes the
                # unpacked [A,G,out] directly (the .reshape(n,·) flat restore
                # was a measured ~42 ms relayout per update).
                "constant": (
                    _unpack(ds_packed, out_dim, lead).astype(lp["constant"].dtype)
                    if lp["constant"].ndim == 3
                    else _unpack(ds_packed, out_dim, lead)
                    .reshape(n, out_dim)
                    .astype(lp["constant"].dtype)
                ),
            }
            grp = (
                None if rp is None
                else {"w": dwres[0], "b": dwres[1]}
            )
            grads = {"layers": [glp], "res_projs": [grp]}
            grads = _add_l2_grads(grads, pk)
            l2_k = _l2(pk)
            updates, opt_state = opts[k].update(grads, opt_state, pk)
            return optax.apply_updates(pk, updates), opt_state, l2_k

        # PROTGRAM_PATH_SWAP12=1: execute the backward paths in order 0,2,1
        # (dxc accumulation is commutative up to f32 reassociation).  With
        # the probe this separates position-in-sequence effects (allocator /
        # defrag state) from program-intrinsic cost for the r5 profile
        # anomaly; experiment-only, not a production mode.
        _swap12 = os.environ.get("PROTGRAM_PATH_SWAP12") == "1"
        _path_defs = [make_path_bwd(i) for i in range(3)]
        path_bwds = [f for f, _ in _path_defs]
        path_donates = [d for _, d in _path_defs]
        # PROTGRAM_PATH_PROBE=R: before each path's production call, run the
        # SAME compiled program R extra times on copies of its donated args
        # (device state otherwise untouched).  Separates "this program is
        # intrinsically slow" from "this call pays a transient allocator/
        # defrag cost at this point in the step" — the r5 profile anomaly
        # (path2.1 at 233 ms vs ~90 ms siblings with identical modeled
        # traffic, experiments/MEMWALL_r05.json).  Probe times land on
        # ``step.stage_times`` as probe{k}.{i} (copy_s, exec_s) tuples.
        _path_probe = int(os.environ.get("PROTGRAM_PATH_PROBE", "0"))
        # graph is threaded via a mutable ref so tail_bwd/assemble (which
        # don't take it as an arg) can read the rg lead at TRACE time.  The
        # jits above trace ONCE for the first graph's shapes; a different rg
        # lead later would silently mis-slice through the stale traced
        # constant, so `run` pins the lead on first use and refuses reuse
        # across different-shape graphs (VERDICT r3 weak #8).
        graph_ref = [None]

        def run(pk, opt_state_k, graph, carry, g_next, rng, carry_out=None, ys=None):
            lead = _rg_lead(graph)
            if graph_ref[0] is not None:
                traced = _rg_lead(graph_ref[0])
                if traced != lead:
                    raise ValueError(
                        "staged train step was traced for rg lead "
                        f"{traced} but is being reused with {lead}; build a "
                        "fresh step (make_train_step_staged) per graph shape"
                    )
            graph_ref[0] = graph
            lp = pk["layers"][0]
            rp = pk["res_projs"][0]
            if save_y:
                if ys is None:
                    ys = ys_fwd(lp, graph, carry)
                    _sync(f"s_fwd{k}", ys)
                if carry_out is None:
                    # Fallback: regenerate the output carry (params are
                    # pre-update here, so this matches the forward exactly).
                    carry_out = stage_fwd_fns[k](
                        {"layers": [lp], "res_projs": [rp]}, graph, carry, rng
                    )
                    _sync(f"refwd_out{k}", carry_out)
                ds_p = ds_from_carry(g_next, carry_out)
                prep = path_prep(ds_p, carry)
                du = prep[0]
                xc_u = prep[1] if _xc_prep else carry
                dwres = None  # rp-case grads come from path 0
            else:
                ys = ()
                s_p = s_fwd(lp, rp, graph, carry)
                _sync(f"s_fwd{k}", s_p)
                ds_p, dwres = tail_bwd(lp, rp, carry, s_p, g_next, rng)
                _sync(f"tail{k}", ds_p)
            dws, dbs, dgates = [None] * 3, [None] * 3, [None] * 3
            dxc = None
            for i in ((0, 2, 1) if _swap12 else (0, 1, 2)):
                if save_y:
                    if i == 0:
                        args = (lp, rp, graph, xc_u, ys[i], ds_p, du)
                    else:
                        args = (lp, graph, xc_u, ys[i], ds_p, du, dxc)
                elif i == 0:
                    args = (lp, rp, graph, carry, ds_p)
                else:
                    args = (lp, graph, carry, ds_p, dxc)
                if _path_probe:
                    _probe_path(f"probe{k}.{i}", path_bwds[i], args,
                                path_donates[i])
                out = path_bwds[i](*args)
                if i == 0 and save_y:
                    dw, db, dgate, dxc, dwres = out
                else:
                    dw, db, dgate, dxc = out
                # Two path pipelines' workspaces may overlap (one ~2 GB each
                # at 5-gram scale); only the last path's sync is a hard
                # barrier before assemble+update consumes everything.
                _sync(f"path{k}.{i}", dxc,
                      droppable=(i < 2 if not _swap12 else i != 1))
                dws[i] = dw
                dbs[i] = db
                dgates[i] = dgate
            from protgram_directgcn_tpu.models.directgcn import pack_rg_carry as _pack

            if not need_dxc:
                g_c = None  # stage 0: nothing below consumes an input cotangent
            else:
                g_c = _pack(dxc) if (in_dim < 128 and 128 % in_dim == 0) else dxc
            new_pk, new_state, l2_k = assemble_update(
                pk, opt_state_k, (dws, dbs, dgates, dwres, ds_p)
            )
            _sync(f"update{k}", l2_k, big=False)
            return new_pk, new_state, g_c, l2_k

        run.save_y = save_y  # step() uses this for output-carry retention
        run.fwd_with_ys = fwd_with_ys if save_y else None
        return run

    # Carry-holding policy: a boundary carry is held device-resident only
    # when its width packs below the 128-lane tile (pack_rg_carry) —
    # 128-wide boundaries cost a full ~1 GB each at 5-gram scale, so those
    # stages recompute their input from the nearest held carry instead.
    def _packable(w):
        return w < 128 and 128 % w == 0

    held = [True] + [
        _packable(model_cfg.layer_dims[bounds[k]]) for k in range(1, m)
    ]
    assert held[m - 1], "final stage's input carry must be packable"
    nearest_held = {}
    for k in range(1, m - 1):
        j = k - 1
        while not held[j]:
            j -= 1
        nearest_held[k] = j

    stage_fwd_fns = [make_stage_fwd(k) for k in range(m - 1)]
    manual_fns = {
        k: make_interior_grad_manual(k)
        for k in range(0, m - 1)
        if _manual_ok(k)
    }

    def _retains_carry(k):
        """Stage k-1's saved-y backward consumes carries[k] as its OUTPUT
        carry (ds = g * phi(h)); retain it past stage k's own backward."""
        lower = manual_fns.get(k - 1)
        return lower is not None and lower.save_y

    final_grad_fn = make_final_grad(m - 1, donate_carry=not _retains_carry(m - 1))
    grad_fns = {
        k: (
            make_stage_grad_carry(k)
            if held[k]
            else make_stage_grad_carry_recompute(k, nearest_held[k])
        )
        for k in range(1, m - 1)
        if k not in manual_fns
    }
    stage0_grad_fn = make_stage_grad(0) if (m > 1 and 0 not in manual_fns) else None
    update_fns = [make_update(k) for k in range(m)]

    def init_opt_state(params):
        return StagedOptState(
            stages=tuple(opts[k].init(_stage_params(params, k)) for k in range(m))
        )

    # Serialize stage executions: dispatch is ASYNC, and with the stages
    # enqueued back-to-back multiple programs' workspaces overlap on the
    # device — the whole point of staging is that they must not.  A
    # one-element fetch between stages (block_until_ready does not block on
    # tunneled backends, CLAUDE.md) bounds the peak to one stage's program —
    # but each fetch is a tunnel HTTP roundtrip (~25 ms), so syncs are
    # placed only where the next enqueue could overlap a LARGE workspace
    # (see the `big` markers at the call sites).  PROTGRAM_STAGE_DEBUG=1
    # additionally logs the live device arrays the host still references;
    # PROTGRAM_STAGE_TIMING=1 records per-sync wall times on
    # ``step.stage_times``; PROTGRAM_STAGE_SYNC=all forces every sync
    # (the conservative r3 behavior).
    _dbg = os.environ.get("PROTGRAM_STAGE_DEBUG") == "1"
    _timing = os.environ.get("PROTGRAM_STAGE_TIMING") == "1"
    _sync_mode = os.environ.get("PROTGRAM_STAGE_SYNC", "lean")
    _sync_all = _sync_mode == "all"
    # "lean" (default): drop the syncs whose adjacent-program overlap fits
    # the measured headroom (r5: each sync on the tunneled backend costs a
    # ~20-25 ms HTTP RTT of device idle; the droppable set was validated
    # OOM-free at the 5-gram 4-layer config, experiments/exp_memwall_r5 —
    # 3.46 -> 2.98 s/step under identical load).  PROTGRAM_STAGE_SYNC=full
    # restores every barrier; =all also syncs the small update programs.
    _lean = _sync_mode == "lean"
    stage_times: Dict[str, list] = {}
    _last = [0.0]

    def _fetch_one(val):
        leaf = jax.tree_util.tree_leaves(val)[0]
        tiny = leaf[(slice(0, 1),) * getattr(leaf, "ndim", 0)]
        np.asarray(jax.device_get(tiny))

    def _probe_path(tag, fn, args, donate):
        # See the PROTGRAM_PATH_PROBE note at the path_bwds definition.
        # PROTGRAM_PATH_PROBE_ONLY="2.1,1.2" restricts to specific k.i
        # stages (the probe's arg copies cost HBM; probing every path at
        # 5-gram scale OOMs).
        only = os.environ.get("PROTGRAM_PATH_PROBE_ONLY", "")
        if only and tag.removeprefix("probe") not in only.split(","):
            return
        reps = int(os.environ.get("PROTGRAM_PATH_PROBE", "0"))
        for _ in range(reps):
            t0 = time.perf_counter()
            cargs = list(args)
            for j in donate:
                cargs[j] = jnp.copy(args[j])
            if donate:
                _fetch_one(cargs[donate[-1]])
            t1 = time.perf_counter()
            out = fn(*cargs)
            _fetch_one(out[3])
            t2 = time.perf_counter()
            stage_times.setdefault(tag, []).append((t1 - t0, t2 - t1))
            del out, cargs
        _last[0] = time.perf_counter()

    def _sync(tag, val, big=True, droppable=False):
        if _lean and droppable and not (_sync_all or _dbg or _timing):
            return
        if not (big or _sync_all or _dbg or _timing):
            return
        t0 = time.perf_counter()
        leaf = jax.tree_util.tree_leaves(val)[0]
        tiny = leaf[(slice(0, 1),) * getattr(leaf, "ndim", 0)]
        np.asarray(jax.device_get(tiny))
        if _timing:
            now = time.perf_counter()
            stage_times.setdefault(tag, []).append(
                (now - _last[0], now - t0)
            )
            _last[0] = now
        if not _dbg:
            return
        live = [a for a in jax.live_arrays() if not a.is_deleted()]
        total = sum(a.nbytes for a in live)
        top = sorted(live, key=lambda a: a.nbytes, reverse=True)[:8]
        logger.info(
            "[stage %s] live=%.2f GB over %d arrays; top %s", tag,
            total / 2**30, len(live),
            [(round(a.nbytes / 2**20), str(a.shape), str(a.dtype)) for a in top],
        )

    # The TOP manual stage's forward emits its packed ys alongside the
    # carry: its backward runs right after the lean decoder-only final
    # stage, so the ys only stay resident across that one stage and the
    # backward's ys_fwd recompute (3 propagations) disappears.
    top_manual = (
        m - 2
        if (m - 2) in manual_fns and manual_fns[m - 2].save_y
        else None
    )

    def step(params, opt_state, graph, x, y, mask, weight_factor, rng, original_indices):
        assert original_indices is None, "staged step is full-batch only"
        _last[0] = time.perf_counter()
        stage_ps = [_stage_params(params, k) for k in range(m)]
        carries = [x]
        top_ys = None
        for k in range(m - 1):
            if k == top_manual:
                fn = manual_fns[k].fwd_with_ys
                c_next, top_ys = fn(
                    stage_ps[k]["layers"][0], stage_ps[k]["res_projs"][0],
                    graph, carries[-1], rng,
                )
                carries.append(c_next)
            else:
                carries.append(stage_fwd_fns[k](stage_ps[k], graph, carries[-1], rng))
            if k >= 1 and not held[k]:
                carries[k] = None  # free: stage k recomputes it at backward
            # Forward-sweep programs are single-pipeline; pairs may overlap.
            # The last stage's sync stays (final_grad is the big program).
            _sync(f"fwd{k}", carries[-1], droppable=k < m - 2)

        new_states = [None] * m
        g_p, g_c, loss_p, primary, l2_sum = final_grad_fn(
            stage_ps[m - 1], graph, carries[m - 1], y, mask, weight_factor, rng
        )
        if not _retains_carry(m - 1):
            carries[m - 1] = None
        _sync("final_grad", g_c)
        stage_ps[m - 1], new_states[m - 1] = update_fns[m - 1](
            stage_ps[m - 1], opt_state.stages[m - 1], g_p
        )
        _sync("final_update", new_states[m - 1], big=False)
        def materialize_carry(k):
            # Regenerate a non-held carry by re-running stage forwards from
            # the nearest held one (their params are pre-update here).
            if carries[k] is not None:
                return carries[k]
            j = nearest_held[k]
            c = carries[j]
            for t in range(j, k):
                c = stage_fwd_fns[t](stage_ps[t], graph, c, rng)
                _sync(f"refwd{t}", c, droppable=True)
            return c

        for k in range(m - 2, 0, -1):
            if k in manual_fns:
                carry_k = materialize_carry(k)
                carries[k] = carry_k
                c_out = carries[k + 1] if manual_fns[k].save_y else None
                stage_ps[k], new_states[k], g_c, l2_k = manual_fns[k](
                    stage_ps[k], opt_state.stages[k], graph, carry_k, g_c, rng,
                    carry_out=c_out,
                    ys=top_ys if k == top_manual else None,
                )
                top_ys = None
                carries[k + 1] = None  # donated into ds_from_carry (or stale)
                if not _retains_carry(k):
                    carries[k] = None
                l2_sum = l2_sum + l2_k
                continue
            if held[k]:
                g_p, g_c, l2_k = grad_fns[k](stage_ps[k], graph, carries[k], g_c, rng)
                if not _retains_carry(k):
                    carries[k] = None
            else:
                j = nearest_held[k]
                g_p, g_c, l2_k = grad_fns[k](
                    stage_ps[k], [stage_ps[t] for t in range(j, k)], graph,
                    carries[j], g_c, rng,
                )
            _sync(f"grad{k}", g_c)
            l2_sum = l2_sum + l2_k
            stage_ps[k], new_states[k] = update_fns[k](
                stage_ps[k], opt_state.stages[k], g_p
            )
            _sync(f"update{k}", new_states[k], big=False)
        if m > 1:
            if 0 in manual_fns:
                c_out0 = carries[1] if manual_fns[0].save_y else None
                stage_ps[0], new_states[0], _, l2_0 = manual_fns[0](
                    stage_ps[0], opt_state.stages[0], graph, x, g_c, rng,
                    carry_out=c_out0,
                    ys=top_ys if 0 == top_manual else None,
                )
                top_ys = None
                carries[1] = None
            else:
                g_p, l2_0 = stage0_grad_fn(stage_ps[0], graph, x, g_c, rng)
                _sync("grad0", l2_0)
                stage_ps[0], new_states[0] = update_fns[0](
                    stage_ps[0], opt_state.stages[0], g_p
                )
                _sync("update0", new_states[0], big=False)
            l2_sum = l2_sum + l2_0

        params = {
            "layers": [l for sp in stage_ps for l in sp["layers"]],
            "res_projs": [r for sp in stage_ps for r in sp["res_projs"]],
            "decoder": stage_ps[m - 1]["decoder"],
        }
        loss = loss_p + l2_lambda * l2_sum
        return params, StagedOptState(stages=tuple(new_states)), loss, primary

    step.init_opt_state = init_opt_state
    step.stage_times = stage_times
    step.manual_fns = manual_fns  # exposed for the lead-pinning regression test
    return step


# Auto-select the gather-free hypercube SpMM format when the padded node
# space [alphabet^n] stays within this multiple of the real vocabulary
# (see ops/hypercube.py for the bandwidth model behind the threshold).
_HYPERCUBE_MAX_RATIO = 4.0


@dataclass(frozen=True)
class LevelPlan:
    """Resolved memory-governed knobs for one level (see _level_plan)."""

    compute_dtype: str  # "float32" | "bfloat16"
    node_param_dtype: str
    remat: bool
    factored: bool  # per-node tables use factored Adafactor second moments
    bank_budget: int  # HBM bytes left for the propagation operators
    # Per-path remat inside each layer: layer-level remat alone leaves ~12
    # concurrent ~1 GB pipeline buffers live in the rematerialized backward
    # at 5-gram scale (measured 12.86 GB HLO temp, exp_memwall_r3 OOM).
    remat_paths: bool = False
    # > 0: run the layer-staged train step split at this layer boundary
    # (make_train_step_staged) — no single XLA program holds the full
    # backward.  0 = the fused single-jit step.
    stage_split: int = 0
    # Set when gcn.oversize_policy == "degrade" had to shrink the hidden
    # dims to fit the chip(s): the dims the level will ACTUALLY train with
    # (train_level consumes this in place of gcn.hidden_layer_dims).
    layer_dims_override: Optional[Tuple[int, ...]] = None


@dataclass
class ClusterBatch:
    """One padded Cluster-GCN subgraph batch.

    Arrays are either device-resident (jnp) or host numpy when the total
    cluster working set exceeds ``GCNConfig.cluster_device_budget_bytes`` —
    then ``to_device()`` is called per step and the device holds ONE batch
    at a time (plus the compiled step's workspace) instead of every
    cluster's blocks at once (the round-1 failure mode: ~150 GB of dense
    blocks at 5-gram scale)."""

    graph: DeviceGraph
    x: Any
    y: Any
    mask: Any
    weight_factor: float
    original_indices: Any

    def to_device(self) -> "ClusterBatch":
        dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
        return ClusterBatch(
            graph=dev(self.graph), x=jnp.asarray(self.x), y=jnp.asarray(self.y),
            mask=jnp.asarray(self.mask), weight_factor=self.weight_factor,
            original_indices=jnp.asarray(self.original_indices),
        )


class HierarchicalTrainer:
    """Drives n = 1..n_max training and embedding export
    (reference run() contract: protgram_directgcn_trainer.py:271-426)."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config()
        self.gcn = self.config.gcn
        self.id_map: Dict[str, str] = {}

    # ------------------------------------------------------------------

    def _initial_features(
        self,
        graph: NgramGraph,
        prev_vocab: Optional[np.ndarray],
        prev_embeds: Optional[np.ndarray],
        seed: int,
    ) -> np.ndarray:
        """Level-1: random [N, d1]; level-n: mean of prefix/suffix (n-1)-gram
        embeddings, zeros if neither exists
        (reference: protgram_directgcn_trainer.py:312-330)."""
        n = graph.num_nodes
        if graph.n == 1 or prev_vocab is None:
            rng = np.random.default_rng(seed)
            return rng.standard_normal((n, self.gcn.one_gram_init_dim)).astype(np.float32)

        dim = prev_embeds.shape[1]
        chars = graph.vocab.view(np.uint32).reshape(n, graph.n)
        prefix = np.ascontiguousarray(chars[:, :-1]).view(f"U{graph.n - 1}").ravel()
        suffix = np.ascontiguousarray(chars[:, 1:]).view(f"U{graph.n - 1}").ravel()

        def lookup(names):
            pos = np.searchsorted(prev_vocab, names)
            pos = np.clip(pos, 0, len(prev_vocab) - 1)
            return np.where(prev_vocab[pos] == names, pos, -1)

        p_idx, s_idx = lookup(prefix), lookup(suffix)
        x = np.zeros((n, dim), dtype=np.float32)
        cnt = (p_idx >= 0).astype(np.float32) + (s_idx >= 0).astype(np.float32)
        x += np.where((p_idx >= 0)[:, None], prev_embeds[np.maximum(p_idx, 0)].astype(np.float32), 0)
        x += np.where((s_idx >= 0)[:, None], prev_embeds[np.maximum(s_idx, 0)].astype(np.float32), 0)
        x /= np.maximum(cnt, 1.0)[:, None]
        return x

    # ------------------------------------------------------------------

    _LEVEL_HBM = 14 << 30  # fallback: ~16 GB chip minus runtime reserve

    # Test hook: set to an int to pin the chip budget regardless of device.
    _hbm_override: Optional[int] = None

    def _chip_hbm(self) -> int:
        """Usable HBM budget for one level's training step.

        Queried from the device (VERDICT r2 weak #4: the hard-coded 14 GB
        mis-budgets any non-v5e part) with a 1 GB runtime reserve;
        `_LEVEL_HBM` remains the fallback when the backend exposes no
        memory stats (CPU test meshes, some tunnels)."""
        if self._hbm_override is not None:
            return int(self._hbm_override)
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = int(stats.get("bytes_limit", 0))
            if limit > (4 << 30):
                return limit - (1 << 30)
        except Exception:
            pass
        return self._LEVEL_HBM

    def _residency(
        self, n_hyper: int, feat_dim: int,
        compute_dtype: str, node_param_dtype: str, remat: bool, factored: bool,
        remat_paths: bool = False, staged: bool = False,
        out_dims: Optional[Sequence[int]] = None, shards: int = 1,
    ) -> Tuple[int, int, int]:
        """(param_bytes, opt_state_bytes, dynamic_bytes) estimate for one
        full-batch training step at ``n_hyper`` padded nodes, calibrated
        against the measured 5-gram compiles (experiments/exp_memwall_r3*).

        Per-node params are the gates + constants
        (reference: protgram_directgcn.py:48-66).  Optimizer state is ALWAYS
        f32 (trainer _f32_state); Adafactor factors a leaf only when both
        dims reach _FACTOR_MIN_DIM, so the [N, out] constants factor to
        row+col vectors while the [N, 1] gates keep full f32 v.

        dynamic_bytes = saved carries + backward workspace + in-flight
        node-parameter gradients:
        - carries pad to 128 lanes unless remat_paths packs sub-128 widths;
        - the backward workspace is ~6 concurrent full-width buffers (the
          deepest path's recompute pipeline + cotangents, measured);
        - node grads pad to 128 lanes and stay live until the optimizer
          update — the whole point of the staged step (tier 4) is that only
          HALF of the saves+grads exist per stage.

        ``shards`` > 1 models the distributed step (parallel.mesh_nodes):
        node params, moments, carries and workspace all shard along the node
        axis (shard_model_params / the halo- and key-sharded graph formats),
        so per-chip residency divides by the shard count."""
        out_dims = list(self.gcn.hidden_layer_dims if out_dims is None else out_dims)
        node_itm = 2 if node_param_dtype == "bfloat16" else 4
        act_itm = 2 if compute_dtype == "bfloat16" else 4
        n_gates = 5 * len(out_dims) if self.gcn.use_vector_coeffs else 0
        elems_const = n_hyper * sum(out_dims)
        elems_gate = n_hyper * n_gates
        param_b = (elems_const + elems_gate) * node_itm
        if factored:
            opt_b = 4 * elems_gate + 4 * sum(
                (n_hyper + d) if min(n_hyper, d) >= _FACTOR_MIN_DIM else n_hyper * d
                for d in out_dims
            )
        else:
            opt_b = 2 * 4 * (elems_const + elems_gate)  # f32 Adam mu + nu
        pad = lambda d: max(128, -(-d // 128) * 128)  # noqa: E731
        packed = lambda d: d if (remat_paths and d < 128 and 128 % d == 0) else pad(d)  # noqa: E731
        per_layer = 1 if remat else 3
        saves = (
            pad(feat_dim) + per_layer * sum(packed(d) for d in out_dims)
        ) * n_hyper * act_itm
        grads = sum(pad(d) for d in out_dims) * n_hyper * act_itm
        workspace = 6 * n_hyper * pad(max(out_dims + [feat_dim])) * act_itm
        if staged:
            saves, grads = saves // 2, grads // 2
        s = max(1, int(shards))
        return param_b // s, opt_b // s, (saves + grads + workspace) // s

    # Slack the residency tiers must leave free (collectives, fragmentation,
    # compiled-step scratch beyond the modeled workspace), and the floor the
    # weight banks always get.
    _PLAN_SLACK = 1 << 30
    _MIN_BANK = 2 << 30

    def _level_plan(self, graph: NgramGraph, feat_dim: int) -> "LevelPlan":
        """Resolve the level's memory-governed knobs from the residency
        estimate (VERDICT r2 item #2: the proven 5-gram configuration must
        be the automatic one, not hidden behind four hand-set knobs).

        Escalation tiers, first that fits the chip wins:
          0. f32 compute, f32 node params, no remat, Adam   (torch parity)
          1. tier 0 + remat
          2. bf16 compute + bf16 node params + remat
          3. tier 2 + factored node moments + per-path remat
          4. tier 3 + the LAYER-STAGED step (proven 5-gram 4-layer config:
             no single XLA program holds the full backward)
        With parallel.mesh_nodes > 1, every tier is evaluated PER SHARD
        (node params, moments, carries and banks all shard along the node
        axis) but without the single-chip-only levers (per-path remat packs
        the sharded key axis; the staged step is host-driven single-chip).
        Explicit knob settings ("float32"/"bfloat16"/bool/"on"/"off")
        override the corresponding tier field at every tier.

        When NO tier fits — e.g. the reference-default [256, 128, 64] dims
        at 5-gram scale on one v5e — ``gcn.oversize_policy`` governs the
        outcome (VERDICT r3 weak #4: the plan must never die in compile):
        "degrade" halves the hidden dims until tier 4 fits and records them
        on ``LevelPlan.layer_dims_override`` with a loud warning naming both
        real fixes; "error" raises the same one-liner immediately."""
        from protgram_directgcn_tpu.ops.hypercube import vocab_char_codes

        gcn = self.gcn
        _, alpha = vocab_char_codes(graph.vocab)
        n_hyper = int(alpha) ** graph.n if alpha else graph.num_nodes
        chip = self._chip_hbm()
        par = getattr(self.config, "parallel", None)
        shards = 1
        if par is not None and par.mesh_nodes is not None:
            shards = max(1, int(par.mesh_nodes))
        n_layers = len(gcn.hidden_layer_dims)

        def resolve(tier: int):
            cd = "float32" if tier < 2 else "bfloat16"
            nd = "float32" if tier < 2 else "bfloat16"
            rm = tier >= 1
            fc = tier >= 3
            # Single-chip-only levers (train_level strips them when
            # distributed); excluding them here keeps the fit estimate
            # honest for the sharded step.
            rp = tier >= 3 and rm and shards == 1
            split = (
                (n_layers + 1) // 2
                if (tier >= 4 and n_layers >= 2 and shards == 1)
                else 0
            )
            if gcn.compute_dtype != "auto":
                cd = gcn.compute_dtype
            if gcn.node_param_dtype != "auto":
                nd = gcn.node_param_dtype
            if gcn.remat not in ("auto", None):
                rm = bool(gcn.remat)
            if gcn.node_param_factored == "on":
                fc = True
            elif gcn.node_param_factored == "off":
                fc = False
            return cd, nd, rm, fc, rp, split

        def fits(tier: int, dims=None, at_shards=None):
            cd, nd, rm, fc, rp, split = resolve(tier)
            pb, ob, db = self._residency(
                n_hyper, feat_dim, cd, nd, rm, fc, remat_paths=rp,
                staged=split > 0, out_dims=dims,
                shards=shards if at_shards is None else at_shards,
            )
            fit = pb + ob + db + self._PLAN_SLACK + self._MIN_BANK <= chip
            return fit, (pb, ob, db)

        chosen_tier = 4
        for tier in range(5):
            fit, _ = fits(tier)
            if fit:
                chosen_tier = tier
                break

        dims_override = None
        fit, _ = fits(chosen_tier)
        if not fit:
            # No tier fits: resolve per gcn.oversize_policy.  Both messages
            # name the smallest mesh that trains the configured dims.
            need = shards
            while need <= 4096 and not fits(4, at_shards=need)[0]:
                need *= 2
            degraded = list(gcn.hidden_layer_dims)
            while not fits(4, dims=degraded)[0] and max(degraded) > 16:
                degraded = [max(16, d // 2) for d in degraded]
            deg_ok = fits(4, dims=degraded)[0]
            if gcn.oversize_policy == "error" or not deg_ok:
                dim_fix = (
                    f" or gcn.hidden_layer_dims={degraded} (or smaller)"
                    if deg_ok else
                    " (no hidden-dim reduction fits — the input width / "
                    "forced dtype set the floor)"
                )
                raise ValueError(
                    f"level n={graph.n}: gcn.hidden_layer_dims="
                    f"{list(gcn.hidden_layer_dims)} does not fit "
                    f"{chip / 2**30:.1f} GB at any memory tier "
                    f"({n_hyper} padded nodes x {shards} shard(s)); set "
                    f"parallel.mesh_nodes>={need}{dim_fix}"
                )
            dims_override = tuple(degraded)
            # The degraded dims may fit a cheaper tier than the fully-staged
            # one they were sized against — re-pick the first that fits.
            for tier in range(5):
                if fits(tier, dims=dims_override)[0]:
                    chosen_tier = tier
                    break
            logger.warning(
                "level n=%d: gcn.hidden_layer_dims=%s does not fit %.1f GB at "
                "any memory tier (%d padded nodes x %d shard(s)) — DEGRADING "
                "to %s (gcn.oversize_policy='degrade').  To train the "
                "configured dims set parallel.mesh_nodes>=%d, or set "
                "gcn.hidden_layer_dims explicitly.",
                graph.n, list(gcn.hidden_layer_dims), chip / 2**30, n_hyper,
                shards, list(dims_override), need,
            )

        cd, nd, rm, fc, rp, split = resolve(chosen_tier)
        pb, ob, db = self._residency(
            n_hyper, feat_dim, cd, nd, rm, fc, remat_paths=rp,
            staged=split > 0, out_dims=dims_override, shards=shards,
        )
        budget = max(self._MIN_BANK, chip - pb - ob - db - self._PLAN_SLACK)
        plan = LevelPlan(
            compute_dtype=cd, node_param_dtype=nd, remat=rm, factored=fc,
            bank_budget=int(budget), remat_paths=rp, stage_split=split,
            layer_dims_override=dims_override,
        )
        if chosen_tier > 0:
            logger.info(
                "level n=%d auto-plan tier %d: compute=%s node_params=%s "
                "remat=%s remat_paths=%s factored=%s stage_split=%d shards=%d "
                "(residency %.1f+%.1f+%.1f GB of %.1f GB; banks get %.1f GB)",
                graph.n, chosen_tier, cd, nd, rm, rp, fc, split, shards,
                pb / 2**30, ob / 2**30, db / 2**30, chip / 2**30, budget / 2**30,
            )
        return plan

    def _bank_hbm_budget(self, graph: NgramGraph, feat_dim: int) -> int:
        return self._level_plan(graph, feat_dim).bank_budget

    def _to_device_graph(
        self, graph: NgramGraph, feat_dim: int, plan: Optional["LevelPlan"] = None
    ) -> DeviceGraph:
        """Materialise the level's propagation operators, preferring the
        gather-free hypercube format when the padded space is dense enough."""
        gcn = self.gcn
        if plan is None:
            plan = self._level_plan(graph, feat_dim)
        mode = gcn.spmm_mode if gcn.spmm_mode != "pallas" else "ell"
        dtype = jnp.bfloat16 if plan.compute_dtype == "bfloat16" else jnp.float32
        if graph.n >= 2 and graph.num_nodes and mode in ("auto", "hypercube"):
            want = mode == "hypercube"
            if not want:
                from protgram_directgcn_tpu.ops.hypercube import vocab_char_codes

                _, alpha = vocab_char_codes(graph.vocab)
                n_hyper = alpha**graph.n
                want = 0 < n_hyper <= _HYPERCUBE_MAX_RATIO * graph.num_nodes
            if want:
                try:
                    return graph.to_device(
                        mode="hypercube", feat_dim=feat_dim, dtype=dtype,
                        hbm_budget=plan.bank_budget,
                    )
                except Exception as exc:  # falls back to generic formats
                    if mode == "hypercube":
                        raise
                    logger.info("hypercube format unavailable (%s); falling back", exc)
        # 1-gram levels have no key structure — generic formats handle them.
        return graph.to_device(
            mode="auto" if mode == "hypercube" else mode, feat_dim=feat_dim, dtype=dtype
        )

    def _to_hyper_shard_graph(
        self, graph: NgramGraph, node_shards: int, compute_dtype: str = "float32"
    ) -> Optional[DeviceGraph]:
        """Build the three operators in the G-sharded hypercube format
        (parallel/hyper_shard.py); None when the level doesn't fit the
        format (too-sparse hypercube or off-pattern edges)."""
        from protgram_directgcn_tpu.graph.transforms import csr_to_coo_arrays
        from protgram_directgcn_tpu.ops.block import BlockStructureError
        from protgram_directgcn_tpu.ops.hypercube import vocab_char_codes
        from protgram_directgcn_tpu.parallel.hyper_shard import (
            build_hyper_shard,
            build_hyper_shard_tables,
        )

        codes, alpha = vocab_char_codes(graph.vocab)
        n_hyper = alpha**graph.n
        if not (0 < n_hyper <= _HYPERCUBE_MAX_RATIO * max(graph.num_nodes, 1)):
            return None
        dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        try:
            tables = build_hyper_shard_tables(alpha, alpha ** (graph.n - 1), node_shards)

            def mk(m):
                s, t, v = csr_to_coo_arrays(m)
                return build_hyper_shard(
                    s, t, v, codes, alpha, node_shards,
                    weights_dtype=dtype, tables=tables,
                )

            from protgram_directgcn_tpu.parallel.hyper_shard import HyperShardTri

            p_in = mk(graph.mathcal_a_in())
            p_out = mk(graph.mathcal_a_out())
            p_und = mk(graph.undirected_norm())
            # Layer-level batched-exchange operator: ONE collective pair per
            # layer direction instead of three (propagate3 consumes it).
            # "auto" = TPU meshes only: it amortises ICI collective latency;
            # on the CPU test mesh the batched buffers just add copies
            # (SCALING_r04 hyper_shard_tri vs hyper_shard).
            knob = getattr(self.config.parallel, "hyper_tri", "auto")
            use_tri = (
                knob == "on"
                or (knob == "auto" and jax.default_backend() == "tpu")
            )
            return DeviceGraph(
                p_in=p_in,
                p_out=p_out,
                p_und=p_und,
                num_nodes=p_in.n_out,
                node_map=p_in.node_map,
                tri=HyperShardTri(adjs=(p_in, p_out, p_und)) if use_tri else None,
            )
        except BlockStructureError as exc:
            logger.info("hypercube sharding refused: %s", exc)
            return None

    def _make_cluster_batches(
        self,
        graph: NgramGraph,
        x: np.ndarray,
        y: np.ndarray,
        seed: int,
        node_map: Optional[np.ndarray] = None,
    ) -> Tuple[List[ClusterBatch], bool]:
        """Partition into Cluster-GCN subgraph batches padded to one common
        node budget (reference: protgram_directgcn_trainer.py:152-198).

        Every batch shares one shape signature (node budget; ELL widths),
        so all clusters reuse a single compiled step.  Small budgets build
        dense [budget, budget] blocks (fastest on the MXU); larger budgets
        build padded-ELL blocks (a 5k-node dense block is 100 MB while its
        edges are ~100 KB).  Returns ``(batches, device_resident)`` —
        batches are uploaded up front only while their total fits
        ``GCNConfig.cluster_device_budget_bytes``; beyond it they stay host
        numpy and stream per step.
        """
        gcn = self.gcn
        n = graph.num_nodes
        num_clusters = int(np.ceil(n / gcn.target_nodes_per_cluster))
        num_clusters = max(gcn.min_clusters, num_clusters)
        num_clusters = min(num_clusters, gcn.max_clusters)
        logger.info("partitioning %d nodes into %d clusters", n, num_clusters)

        m_in = graph.mathcal_a_in()
        m_out = graph.mathcal_a_out()
        m_und = graph.undirected_norm()
        combined = (m_in + m_out).tocsr()
        labels = partition_nodes(combined, num_clusters, method="bfs", seed=seed)

        sizes = np.bincount(labels, minlength=num_clusters)
        budget = int(sizes.max())
        budget = ((budget + 7) // 8) * 8  # pad to sublane multiple
        fmt = "dense" if budget <= gcn.cluster_dense_max_budget else "ell"

        from protgram_directgcn_tpu.ops.spmm import _ell_one_sided

        cluster_nodes = [np.nonzero(labels == c)[0] for c in range(num_clusters)]
        cluster_nodes = [nd for nd in cluster_nodes if len(nd)]

        def sub_coo(m, nodes):
            block = m[nodes][:, nodes].tocoo()
            return (
                block.row.astype(np.int64),
                block.col.astype(np.int64),
                block.data.astype(np.float32),
            )

        if fmt == "dense":
            def make_adj(m, nodes, _k):
                r, c, v = sub_coo(m, nodes)
                at = np.zeros((budget, budget), np.float32)
                np.add.at(at, (c, r), v)  # A^T: aggregate at targets
                from protgram_directgcn_tpu.ops.spmm import DenseAdj

                return DenseAdj(at=at)

            k_widths = [None] * 3
        else:
            # Common ELL width per matrix across clusters -> one compiled step.
            def max_deg(m):
                k = 0
                for nodes in cluster_nodes:
                    r, c, v = sub_coo(m, nodes)
                    if len(c):
                        k = max(k, int(np.bincount(c).max()), int(np.bincount(r).max()))
                return max(4, -(-k // 4) * 4)

            k_widths = [max_deg(m) for m in (m_in, m_out, m_und)]

            def make_adj(m, nodes, k):
                from protgram_directgcn_tpu.ops.spmm import EllAdj

                r, c, v = sub_coo(m, nodes)
                idx, w = _ell_one_sided(r, c, v, budget)
                idx_t, w_t = _ell_one_sided(c, r, v, budget)
                pad = lambda a: np.pad(a, ((0, 0), (0, k - a.shape[1])))  # noqa: E731
                return EllAdj(idx=pad(idx), w=pad(w), idx_t=pad(idx_t), w_t=pad(w_t))

        batches = []
        for nodes in cluster_nodes:
            dg = DeviceGraph(
                p_in=make_adj(m_in, nodes, k_widths[0]),
                p_out=make_adj(m_out, nodes, k_widths[1]),
                p_und=make_adj(m_und, nodes, k_widths[2]),
                num_nodes=budget,
            )
            x_sub = np.zeros((budget, x.shape[1]), dtype=np.float32)
            x_sub[: len(nodes)] = x[nodes]
            y_sub = np.zeros(budget, dtype=np.int32)
            y_sub[: len(nodes)] = y[nodes]
            mask = np.zeros(budget, dtype=np.float32)
            mask[: len(nodes)] = 1.0
            orig = np.zeros(budget, dtype=np.int32)
            # Per-node params live in the device graph's node space; map
            # cluster members through node_map when it differs from real ids.
            orig[: len(nodes)] = nodes if node_map is None else node_map[nodes]
            batches.append(
                ClusterBatch(
                    graph=dg, x=x_sub, y=y_sub, mask=mask,
                    weight_factor=float(len(nodes) / n), original_indices=orig,
                )
            )

        total_bytes = sum(
            a.nbytes
            for b in batches
            for a in jax.tree_util.tree_leaves((b.graph, b.x, b.y, b.mask, b.original_indices))
        )
        resident = total_bytes <= gcn.cluster_device_budget_bytes
        logger.info(
            "cluster batches: %d x budget=%d (%s blocks) = %.2f GB total -> %s",
            len(batches), budget, fmt, total_bytes / 1e9,
            "device-resident" if resident else
            f"host-streamed (budget {gcn.cluster_device_budget_bytes / 1e9:.2f} GB)",
        )
        if resident:
            batches = [b.to_device() for b in batches]
        return batches, resident

    # ------------------------------------------------------------------

    def train_level(
        self, graph: NgramGraph, x_np: np.ndarray, y_np: np.ndarray, num_classes: int,
        ckpt_dir: Optional[os.PathLike] = None, metrics=None,
    ) -> Tuple[dict, np.ndarray, DirectGCNConfig, DeviceGraph]:
        """Train one n-gram level; returns (params, node embeddings)."""
        gcn = self.gcn
        n_val = graph.n
        feat_dim = x_np.shape[1]
        layer_dims = tuple([feat_dim] + list(gcn.hidden_layer_dims))
        use_pallas = gcn.spmm_mode == "pallas"
        # The plan takes the INPUT width; _residency maxes it with the hidden
        # dims internally where the widest buffer matters (workspace), so a
        # degraded plan can actually shrink below the configured dims.
        plan = self._level_plan(graph, feat_dim)
        if plan.layer_dims_override is not None:
            # gcn.oversize_policy == "degrade": the configured dims fit no
            # memory tier; the plan substituted smaller ones (logged there).
            layer_dims = tuple([feat_dim] + list(plan.layer_dims_override))

        # ---- Multi-chip: consume ParallelConfig (north-star integration;
        # the reference is single-device, SURVEY.md §2.3).  mesh_nodes > 1
        # builds a ("nodes","feat") mesh and trains the level distributed:
        # "halo" uses the explicit edge-partitioned all_to_all exchange,
        # "gspmd" row-shards the adjacency and lets XLA insert collectives.
        par = getattr(self.config, "parallel", None)
        mesh_devices = 0
        if par is not None and par.mesh_nodes is not None:
            mesh_devices = int(par.mesh_nodes) * max(int(par.mesh_feats), 1)
        distributed = mesh_devices > 1
        if distributed and (plan.remat_paths or plan.stage_split):
            # Per-path remat packs sub-128 carries by reshaping the key
            # axis — the axis mesh parallelism shards — and the staged step
            # is a single-chip memory lever.  Multi-chip memory pressure is
            # per-shard anyway; keep the plain fused step.
            import dataclasses as _dc

            plan = _dc.replace(plan, remat_paths=False, stage_split=0)
        mesh = None
        if distributed:
            from protgram_directgcn_tpu.parallel.mesh import (
                build_distributed_device_graph,
                make_mesh,
                shard_device_graph,
            )

            mesh = make_mesh(mesh_devices, feat_axis=max(int(par.mesh_feats), 1))
            node_shards = mesh.shape["nodes"]
            mode_n = par.mode
            if mode_n == "hypercube" and graph.n < 2:
                logger.info("1-gram level has no key structure; using halo mode")
                mode_n = "halo"
            if mode_n == "hypercube":
                # North-star path: the gather-free hypercube format sharded
                # along its key axis — both kernels stay local, the two
                # relayouts become regular all-to-alls (parallel/hyper_shard).
                full_graph = self._to_hyper_shard_graph(
                    graph, node_shards, compute_dtype=plan.compute_dtype
                )
                if full_graph is None:
                    logger.info("hypercube sharding unavailable; using halo mode")
                    mode_n = "halo"
            if mode_n == "halo":
                full_graph = build_distributed_device_graph(
                    graph, node_shards, debug_checksums=par.debug_checksums
                )
            elif mode_n == "gspmd":
                # Row-alignable format required (the hypercube node space
                # does not block-partition by node id); ELL covers every
                # level.
                dtype = jnp.bfloat16 if plan.compute_dtype == "bfloat16" else jnp.float32
                full_graph = shard_device_graph(
                    graph.to_device(mode="ell", feat_dim=max(layer_dims), dtype=dtype),
                    mesh,
                )
            elif mode_n != "hypercube":
                raise ValueError(f"unknown parallel.mode: {par.mode!r}")
            node_map = None if full_graph.node_map is None else np.asarray(full_graph.node_map)
            total_nodes = full_graph.p_in.n_out  # shard-padded node space
            logger.info(
                "distributed level n=%d: mesh=%s mode=%s (%d nodes padded to %d)",
                n_val, dict(mesh.shape), mode_n, graph.num_nodes, total_nodes,
            )
        else:
            full_graph = self._to_device_graph(graph, max(layer_dims), plan=plan)
            node_map = None if full_graph.node_map is None else np.asarray(full_graph.node_map)
            total_nodes = full_graph.num_nodes

        def pad_nodes(arr: np.ndarray) -> np.ndarray:
            """Scatter/pad real-node rows into the device graph's node space."""
            if node_map is not None:
                out = np.zeros((total_nodes,) + arr.shape[1:], dtype=arr.dtype)
                out[node_map] = arr
                return out
            if arr.shape[0] < total_nodes:  # shard padding (zero rows at end)
                out = np.zeros((total_nodes,) + arr.shape[1:], dtype=arr.dtype)
                out[: arr.shape[0]] = arr
                return out
            return arr

        model_cfg = DirectGCNConfig(
            layer_dims=layer_dims,
            num_nodes=total_nodes,
            num_classes=num_classes,
            n_gram_len=n_val,
            one_gram_dim=(gcn.one_gram_init_dim if n_val == 1 else 0),
            max_pe_len=gcn.max_pe_len,
            dropout=gcn.dropout_rate,
            use_vector_coeffs=gcn.use_vector_coeffs,
            use_pallas=use_pallas,
            compute_dtype=plan.compute_dtype,
            node_param_dtype=plan.node_param_dtype,
            remat=plan.remat,
            remat_paths=plan.remat_paths,
        )
        params = init_directgcn_params(jax.random.PRNGKey(self.config.random_state + n_val), model_cfg)
        if distributed:
            from protgram_directgcn_tpu.parallel.mesh import shard_model_params

            params = shard_model_params(params, mesh)
        else:
            params = _node_params_to_rg(params, full_graph)

        l2_lambda = gcn.l2_reg_lambda
        wd = gcn.weight_decay if l2_lambda <= 0 else 0.0
        factored = plan.factored
        if factored:
            logger.info(
                "level n=%d: per-node tables train with factored (Adafactor) "
                "second moments — full Adam moments would not fit the chip "
                "(node_param_factored=%s)", n_val, gcn.node_param_factored,
            )
        def make_opt():
            return make_optimizer(
                gcn.lr, wd, factor_node_params_above=total_nodes if factored else None
            )

        if plan.stage_split:
            # A stage per layer: coarser splits measured 14.8+ GB of HLO
            # temps at 5-gram scale (experiments/exp_memwall_r3 history).
            step = make_train_step_staged(
                model_cfg, make_opt, l2_lambda,
                list(range(1, len(layer_dims))),
            )
            opt_state = step.init_opt_state(params)
        else:
            opt = make_opt()
            opt_state = opt.init(params)
            step = make_train_step(model_cfg, opt, l2_lambda)

        sched = PlateauScheduler(gcn.lr, gcn.lr_scheduler_patience, gcn.lr_scheduler_factor) if gcn.use_lr_scheduler else None
        stopper = EarlyStopper(gcn.early_stopping_patience, gcn.early_stopping_min_delta) if gcn.use_early_stopping else None

        rng = jax.random.PRNGKey(self.config.random_state * 7919 + n_val)

        use_cluster = (
            gcn.use_cluster_training
            and graph.num_nodes > gcn.cluster_training_threshold_nodes
            and not distributed  # the mesh IS the partitioning when distributed
        )
        if distributed and gcn.use_cluster_training and graph.num_nodes > gcn.cluster_training_threshold_nodes:
            logger.info("cluster training disabled under mesh parallelism (full-batch sharded)")
        if use_cluster and gcn.cluster_auto_fullbatch:
            from protgram_directgcn_tpu.ops.hypercube import HypercubeAdj

            if isinstance(full_graph.p_in, HypercubeAdj):
                # The level already compiled to the gather-free full-batch
                # format — strictly faster than cluster mini-batching, and
                # sidesteps materialising per-cluster blocks entirely.
                logger.info(
                    "auto-routing n=%d to full-batch (hypercube operators built)", n_val
                )
                use_cluster = False
        # Ambient-mesh context: the halo path requires it for its shard_map
        # collectives; GSPMD sharding propagation benefits from it too.
        if distributed:
            from protgram_directgcn_tpu.parallel.halo import active_mesh

            mesh_ctx = lambda: active_mesh(mesh)  # noqa: E731
        else:
            import contextlib

            mesh_ctx = contextlib.nullcontext
        t0 = time.monotonic()
        if use_cluster:
            batches, resident = self._make_cluster_batches(
                graph, x_np, y_np, self.config.random_state, node_map=node_map
            )
            shuffle_rng = np.random.default_rng(self.config.random_state + n_val)
            epochs_run = 0
            for epoch in range(1, gcn.epochs_per_level + 1):
                order = shuffle_rng.permutation(len(batches))
                epoch_loss = 0.0
                for bi in order:
                    # Streaming mode: upload this batch only (the previous
                    # batch's device buffers die with its step).
                    b = batches[bi] if resident else batches[bi].to_device()
                    rng, sub = jax.random.split(rng)
                    params, opt_state, loss, _ = step(
                        params, opt_state, b.graph, b.x, b.y, b.mask,
                        jnp.float32(b.weight_factor), sub, b.original_indices,
                    )
                    epoch_loss += float(loss)
                avg = epoch_loss / len(batches)
                epochs_run = epoch
                if sched is not None:
                    set_learning_rate(opt_state, sched.step(avg))
                if stopper is not None and stopper.should_stop(avg):
                    logger.info("early stop at epoch %d (best %.5f)", epoch, stopper.best_loss)
                    break
            logger.info("clustered training: %d epochs over %d clusters in %.1fs",
                        epochs_run, len(batches), time.monotonic() - t0)
        else:
            # bf16 feature storage under bf16 compute: the model casts before
            # every matmul anyway, and the [N, F] input is ~2 GB f32 at
            # 5-gram hypercube scale.
            x_dtype = jnp.bfloat16 if plan.compute_dtype == "bfloat16" else jnp.float32
            x = jnp.asarray(pad_nodes(x_np), dtype=x_dtype)
            # Hand rg-family formats their native [A, G, F] layout up front —
            # a flat input costs a materialised 1-per-step relayout copy.
            fshape = getattr(full_graph.p_in, "feature_shape", None)
            if fshape is not None and x.shape[0] == fshape[0] * fshape[1]:
                x = x.reshape(fshape + x.shape[1:])
            y = jnp.asarray(pad_nodes(y_np.astype(np.int32)))
            mask = jnp.asarray(pad_nodes(np.ones(graph.num_nodes, dtype=np.float32)))
            if distributed:
                from protgram_directgcn_tpu.parallel.mesh import shard_training_inputs

                if x.ndim == 3:  # rg layout: the key axis is the sharded one
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    x = jax.device_put(x, NamedSharding(mesh, P(None, "nodes", None)))
                    _, y, mask = shard_training_inputs(mesh, None, y, mask)
                else:
                    x, y, mask = shard_training_inputs(mesh, x, y, mask)
            start_epoch = 1
            if ckpt_dir is not None and gcn.checkpoint_every_epochs > 0:
                from protgram_directgcn_tpu.utils import checkpoint as ckpt

                restored = ckpt.restore_train_state(ckpt_dir, params, opt_state)
                if restored is not None:
                    start_epoch, params, opt_state = restored[0] + 1, restored[1], restored[2]
            epochs_run = 0
            loss_val = float("nan")
            with mesh_ctx():
                for epoch in range(start_epoch, gcn.epochs_per_level + 1):
                    rng, sub = jax.random.split(rng)
                    params, opt_state, loss, primary = step(
                        params, opt_state, full_graph, x, y, mask, jnp.float32(1.0), sub, None
                    )
                    loss_val = float(loss)
                    epochs_run = epoch
                    if metrics is not None:
                        metrics.log_metrics(
                            {"level": n_val, "loss": loss_val, "lr": sched.lr if sched else gcn.lr},
                            step=epoch,
                        )
                    if sched is not None:
                        set_learning_rate(opt_state, sched.step(loss_val))
                    if stopper is not None and stopper.should_stop(loss_val):
                        logger.info("early stop at epoch %d (best %.5f)", epoch, stopper.best_loss)
                        break
                    if (
                        ckpt_dir is not None
                        and gcn.checkpoint_every_epochs > 0
                        and epoch % gcn.checkpoint_every_epochs == 0
                    ):
                        from protgram_directgcn_tpu.utils import checkpoint as ckpt

                        ckpt.save_train_state(ckpt_dir, epoch, params, opt_state)
            logger.info("full-batch training: %d epochs in %.1fs (final loss %.5f)",
                        epochs_run, time.monotonic() - t0, loss_val)
            # Exposed for harnesses (dryrun legs print per-mode losses).
            self.last_level_loss = loss_val

        # Eval-mode embedding extraction on the full graph
        # (reference: models_utils.py:264-273).  Graph passed as a jit
        # argument — not a closure — to keep remote compiles small.
        eval_fn = jax.jit(lambda p, g, xv: directgcn_apply(p, g, xv, model_cfg, train=False))
        with mesh_ctx():
            _, embeds = eval_fn(params, full_graph, jnp.asarray(pad_nodes(x_np)))
            embeds = np.asarray(embeds)
        if node_map is not None:
            embeds = embeds[node_map]
        elif embeds.shape[0] > graph.num_nodes:  # drop shard padding rows
            embeds = embeds[: graph.num_nodes]
        return params, embeds, model_cfg, full_graph

    # ------------------------------------------------------------------

    def run(
        self,
        fasta_path: Optional[os.PathLike] = None,
        graphs_dir: Optional[os.PathLike] = None,
        output_dir: Optional[os.PathLike] = None,
    ) -> Optional[str]:
        cfg = self.config
        fasta_path = fasta_path or cfg.paths.input_fasta
        graphs_dir = graphs_dir or cfg.paths.graph_objects_dir
        output_dir = ensure_dir(output_dir or cfg.paths.gcn_embeddings_dir)
        ckpt_dir = ensure_dir(os.path.join(str(output_dir), "level_checkpoints"))

        if cfg.id_mapping_mode == "regex":
            self.id_map = generate_regex_id_map(fasta_path, cfg.paths.id_mapping_output_file)
            logger.info("loaded %d ID mappings", len(self.id_map))
        elif cfg.id_mapping_mode == "api":
            from protgram_directgcn_tpu.utils.io import generate_api_id_map

            self.id_map = generate_api_id_map(
                fasta_path, output_file=cfg.paths.id_mapping_output_file
            )
            logger.info("loaded %d ID mappings via UniProt API", len(self.id_map))

        level_embeds: Dict[int, np.ndarray] = {}
        level_vocab: Dict[int, np.ndarray] = {}
        n_max = cfg.graph_builder.ngram_max_n

        for n_val in range(1, n_max + 1):
            ckpt_path = os.path.join(str(ckpt_dir), f"level_{n_val}.npz")
            graph_path = os.path.join(str(graphs_dir), f"ngram_graph_n{n_val}.npz")
            if not os.path.exists(graph_path):
                logger.error("graph artifact missing for n=%d: %s", n_val, graph_path)
                continue
            graph = load_graph(graph_path)
            if graph.num_nodes == 0:
                logger.warning("skipping n=%d (empty graph)", n_val)
                continue
            level_vocab[n_val] = graph.vocab

            if os.path.exists(ckpt_path):
                with np.load(ckpt_path, allow_pickle=False) as z:
                    level_embeds[n_val] = z["embeddings"]
                logger.info("resumed n=%d from checkpoint (%s)", n_val, ckpt_path)
                continue

            task = self.gcn.task_types_per_level.get(n_val, self.gcn.default_task_type)
            logger.info("=== level n=%d: %d nodes, task=%s ===", n_val, graph.num_nodes, task)
            prev_vocab = level_vocab.get(n_val - 1)
            prev_embeds = level_embeds.get(n_val - 1)
            if n_val > 1 and (prev_embeds is None or prev_embeds.size == 0):
                logger.error("previous level embeddings missing for n=%d; skipping", n_val)
                continue
            x = self._initial_features(graph, prev_vocab, prev_embeds, cfg.random_state + n_val)
            y, num_classes = generate_labels(graph, task, self.gcn.closest_aa_k_hops, cfg.random_state)
            from protgram_directgcn_tpu.utils.metrics import MetricLogger

            with MetricLogger(os.path.join(str(ckpt_dir), f"run_n{n_val}"), f"gcn_n{n_val}") as metrics:
                metrics.log_params({"level": n_val, "task": task, "num_nodes": graph.num_nodes,
                                    "num_edges": graph.num_edges, "num_classes": num_classes})
                _, embeds, _, _ = self.train_level(
                    graph, x, y, num_classes,
                    ckpt_dir=os.path.join(str(ckpt_dir), f"orbax_n{n_val}"), metrics=metrics,
                )
            level_embeds[n_val] = embeds
            np.savez_compressed(ckpt_path, embeddings=embeds)

        if n_max not in level_embeds or level_embeds[n_max].size == 0:
            logger.error("final level n=%d embeddings missing; cannot pool", n_max)
            return None

        # Pool n-gram embeddings to proteins, rename ids, export H5 (+PCA)
        # (reference: protgram_directgcn_trainer.py:387-421).
        sequences = list(parse_fasta(fasta_path))
        pooled = emb_utils.pool_ngram_embeddings_for_proteins(
            sequences, n_max, level_vocab[n_max], level_embeds[n_max]
        )
        if self.id_map:
            pooled = {self.id_map.get(k, k): v for k, v in pooled.items()}
        h5_path = os.path.join(str(output_dir), f"gcn_n{n_max}_embeddings.h5")
        write_h5_embeddings(h5_path, pooled)
        logger.info("primary embeddings saved to %s (%d proteins)", h5_path, len(pooled))

        final_path = h5_path
        if self.gcn.apply_pca and pooled:
            pca = emb_utils.apply_pca(pooled, self.gcn.pca_target_dim, cfg.random_state)
            if pca:
                dim = next(iter(pca.values())).shape[0]
                pca_path = os.path.join(str(output_dir), f"gcn_n{n_max}_embeddings_pca{dim}.h5")
                write_h5_embeddings(pca_path, pca)
                logger.info("PCA embeddings saved to %s", pca_path)
                final_path = pca_path

        if self.gcn.run_sanity_check_ppi:
            try:
                from protgram_directgcn_tpu.pipeline.ppi import run_sanity_check_ppi

                run_sanity_check_ppi(self.config, final_path)
            except FileNotFoundError:
                logger.info("sanity-check PPI skipped (no interaction files)")
        return final_path
