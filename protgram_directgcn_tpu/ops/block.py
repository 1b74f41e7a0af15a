"""Block-structured SpMM for n-gram transition graphs (the biclique kernel).

Every DirectGCN propagation matrix on an n-gram level — 𝒜_out, 𝒜_in and the
undirected sym-norm matrix (reference: graph_utils.py:198-287) — has sparsity
pattern contained in ``union(A, Aᵀ, I)`` where ``A`` is the raw transition
adjacency.  A transition edge ``u → v`` exists only when the (n-1)-gram
*suffix* of ``u`` equals the (n-1)-gram *prefix* of ``v``
(reference: data_builder.py:45-54 — consecutive n-grams overlap in n-1
characters).  Each node has exactly one prefix key and one suffix key, so
grouping nodes by key factors any such matrix ``M`` into

    M = diag(d) + Ppᵀ · blockdiag(Wf) · Sp + Spᵀ · blockdiag(Wb) · Pp

where ``Sp``/``Pp`` are pad-gather operators into suffix-/prefix-grouped
layouts ``[G, R]`` / ``[G, C]`` (G = number of distinct (n-1)-gram keys,
R/C = max group sizes, both bounded by the alphabet size ~21-26), and
``Wf``/``Wb`` are per-key dense blocks holding the A-pattern (fwd) and
Aᵀ-pattern (bwd) values.

Why this is the right TPU format:

- A gather-based sparse format (ELL/COO) moves one feature row per *edge
  slot*: ~nnz random HBM rows per pass.  The block format moves one row per
  *node slot*: ``G·R + N`` gathered rows for the inputs plus ``2N`` for the
  output unpermute — 2-3x fewer random rows on realistic 5-gram graphs
  (mean union degree ~5), and the random-row gather is the measured hardware
  bound on this part (no SparseCore; see CLAUDE.md).
- The per-key block contraction is a single batched dense matmul
  ``[G,C,R] × [G,R,F]`` that runs on the MXU, replacing per-edge FMA.
- Because the vocabulary is sorted, prefix groups are contiguous in node
  order, so the Pp gather and the Ppᵀ unpermute are monotonic (near-stream
  rate) — only the two suffix-side gathers are genuinely random.

The transpose (backward) pass reuses the SAME blocks with transposed einsum
index order (Mᵀ = diag(d) + Spᵀ·Wfᵀ·Pp + Ppᵀ·Wbᵀ·Sp): no second copy of the
adjacency, unlike the ELL format which prebuilds both orientations.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class BlockStructureError(ValueError):
    """Raised when the edge set does not factor over the given node keys."""


class BankBudgetError(BlockStructureError):
    """Raised when a bank layout is structurally fine but its padded device
    footprint exceeds the caller's HBM budget — the one failure mode the
    dual->rs->pk fallback chain (graph/structure.py) may continue past."""


@struct.dataclass
class BlockNgramAdj:
    """Prefix/suffix-block factorisation of an n-gram propagation matrix."""

    d: jnp.ndarray  # [N] f32 diagonal
    wf: jnp.ndarray  # [G, C, R] f32: suffix-slot r -> prefix-slot c (A pattern)
    wb: jnp.ndarray  # [G, R, C] f32: prefix-slot c -> suffix-slot r (Aᵀ pattern)
    sgrp: jnp.ndarray  # [G, R] int32 node id per suffix-grouped slot (pad -> 0)
    pgrp: jnp.ndarray  # [G, C] int32 node id per prefix-grouped slot (pad -> 0)
    pos_p: jnp.ndarray  # [N] int32: node v lives at prefix-layout slot pos_p[v]
    pos_s: jnp.ndarray  # [N] int32: node v lives at suffix-layout slot pos_s[v]

    @property
    def n_out(self) -> int:
        return self.d.shape[0]


def ngram_node_keys(vocab: np.ndarray) -> Tuple[np.ndarray, np.ndarray, int]:
    """Prefix/suffix (n-1)-gram key ids for a sorted equal-length vocabulary.

    Returns (pk, sk, num_keys) with key ids over the union key space, assigned
    in sorted key order (so pk is non-decreasing when vocab is sorted).
    """
    vocab = np.asarray(vocab)
    n_nodes = len(vocab)
    if n_nodes == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), 0
    n = len(str(vocab[0]))
    if n < 2:
        # 1-grams have empty prefix/suffix: a single all-pairs key (callers
        # should use the dense format for these tiny levels anyway).
        z = np.zeros(n_nodes, np.int64)
        return z, z, 1
    arr = vocab.astype(f"U{n}")
    chars = arr.view("U1").reshape(n_nodes, n)
    prefix = np.ascontiguousarray(chars[:, :-1]).view(f"U{n - 1}").reshape(n_nodes)
    suffix = np.ascontiguousarray(chars[:, 1:]).view(f"U{n - 1}").reshape(n_nodes)
    keys, inv = np.unique(np.concatenate([prefix, suffix]), return_inverse=True)
    return inv[:n_nodes], inv[n_nodes:], len(keys)


def _group_layout(key: np.ndarray, num_keys: int, pad_multiple: int = 1):
    """Group node ids by key.  Returns (grp [G, K] int32 pad->0, pos [N] int32,
    rank [N], group size K)."""
    n = len(key)
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    counts = np.bincount(key, minlength=num_keys)
    k = max(1, int(counts.max()) if num_keys else 1)
    k = ((k + pad_multiple - 1) // pad_multiple) * pad_multiple
    starts = np.zeros(num_keys + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    rank_sorted = np.arange(n, dtype=np.int64) - starts[sorted_key]
    rank = np.empty(n, np.int64)
    rank[order] = rank_sorted
    grp = np.zeros((num_keys, k), np.int32)
    grp[key, rank] = np.arange(n, dtype=np.int32)
    pos = (key * k + rank).astype(np.int32)
    return grp, pos, rank, k


def build_block_ngram(
    src: np.ndarray,
    tgt: np.ndarray,
    val: np.ndarray,
    n_nodes: int,
    pk: np.ndarray,
    sk: np.ndarray,
    num_keys: int,
    max_block: int = 64,
) -> BlockNgramAdj:
    """Factor a coalesced COO matrix over prefix/suffix node keys.

    Raises BlockStructureError if any off-diagonal edge fits neither the
    A pattern (sk[src] == pk[tgt]) nor the Aᵀ pattern (pk[src] == sk[tgt]),
    or if a group exceeds ``max_block`` (the format only pays off for
    alphabet-bounded groups).
    """
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    val = np.asarray(val, np.float32)
    pk = np.asarray(pk, np.int64)
    sk = np.asarray(sk, np.int64)

    pgrp, pos_p, prank, c_sz = _group_layout(pk, num_keys)
    sgrp, pos_s, srank, r_sz = _group_layout(sk, num_keys)
    if c_sz > max_block or r_sz > max_block:
        raise BlockStructureError(
            f"group sizes ({r_sz}, {c_sz}) exceed max_block={max_block}"
        )

    d = np.zeros(n_nodes, np.float32)
    diag = src == tgt
    np.add.at(d, src[diag], val[diag])

    off = ~diag
    s, t, v = src[off], tgt[off], val[off]
    fwd = sk[s] == pk[t]
    bwd = ~fwd & (pk[s] == sk[t])
    leftover = int((~fwd & ~bwd).sum())
    if leftover:
        raise BlockStructureError(
            f"{leftover} edges fit neither the A nor the Aᵀ n-gram pattern"
        )

    wf = np.zeros((num_keys, c_sz, r_sz), np.float32)
    wb = np.zeros((num_keys, r_sz, c_sz), np.float32)
    # Coalesced COO + injective (edge -> block slot) maps: plain assignment.
    wf[sk[s[fwd]], prank[t[fwd]], srank[s[fwd]]] = v[fwd]
    wb[pk[s[bwd]], srank[t[bwd]], prank[s[bwd]]] = v[bwd]

    return BlockNgramAdj(
        d=jnp.asarray(d),
        wf=jnp.asarray(wf),
        wb=jnp.asarray(wb),
        sgrp=jnp.asarray(sgrp),
        pgrp=jnp.asarray(pgrp),
        pos_p=jnp.asarray(pos_p),
        pos_s=jnp.asarray(pos_s),
    )


def block_gather_rows(adj: BlockNgramAdj) -> int:
    """Randomly gathered rows per propagation pass (format-selection model)."""
    g, r = adj.sgrp.shape
    return g * r + adj.pos_s.shape[0]


# -----------------------------------------------------------------------------
# Propagation
# -----------------------------------------------------------------------------


def _einsum(spec, a, b):
    # f32 blocks demand full-precision MXU passes (TPU matmul defaults bf16).
    prec = "highest" if a.dtype == jnp.float32 else "default"
    return jnp.einsum(spec, a, b, precision=prec, preferred_element_type=jnp.float32)


def _block_apply(d, wf, wb, sgrp, pgrp, pos_p, pos_s, x, transpose=False):
    f = x.shape[-1]
    g, r = sgrp.shape
    c = pgrp.shape[1]
    # 1-D flattened gathers only (2-D index arrays lower ~20x slower on TPU).
    xg_s = jnp.take(x, sgrp.reshape(-1), axis=0).reshape(g, r, f)
    xg_p = jnp.take(x, pgrp.reshape(-1), axis=0).reshape(g, c, f)
    if not transpose:
        y_p = _einsum("gcr,grf->gcf", wf, xg_s)  # A pattern: suffix -> prefix
        y_s = _einsum("grc,gcf->grf", wb, xg_p)  # Aᵀ pattern: prefix -> suffix
    else:
        y_s = _einsum("gcr,gcf->grf", wf, xg_p)  # Wfᵀ
        y_p = _einsum("grc,grf->gcf", wb, xg_s)  # Wbᵀ
    out = d[:, None] * x
    out = out + jnp.take(y_p.reshape(g * c, f), pos_p, axis=0)
    out = out + jnp.take(y_s.reshape(g * r, f), pos_s, axis=0)
    return out


@jax.custom_vjp
def _propagate_block(d, wf, wb, sgrp, pgrp, pos_p, pos_s, x):
    return _block_apply(d, wf, wb, sgrp, pgrp, pos_p, pos_s, x)


def _propagate_block_fwd(d, wf, wb, sgrp, pgrp, pos_p, pos_s, x):
    out = _block_apply(d, wf, wb, sgrp, pgrp, pos_p, pos_s, x)
    return out, (d, wf, wb, sgrp, pgrp, pos_p, pos_s)


def _propagate_block_bwd(res, grad):
    d, wf, wb, sgrp, pgrp, pos_p, pos_s = res
    dx = _block_apply(d, wf, wb, sgrp, pgrp, pos_p, pos_s, grad, transpose=True)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (
        jnp.zeros_like(d),
        jnp.zeros_like(wf),
        jnp.zeros_like(wb),
        f0(sgrp),
        f0(pgrp),
        f0(pos_p),
        f0(pos_s),
        dx,
    )


_propagate_block.defvjp(_propagate_block_fwd, _propagate_block_bwd)


def propagate_block(adj: BlockNgramAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum over edges (j -> i) of w * x[j], via block factorisation."""
    return _propagate_block(
        adj.d, adj.wf, adj.wb, adj.sgrp, adj.pgrp, adj.pos_p, adj.pos_s, x
    )
