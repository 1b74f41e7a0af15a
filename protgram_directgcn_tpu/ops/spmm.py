"""TPU-native sparse propagation (SpMM) operators.

Semantics follow the reference's message passing exactly: given an edge list
(src, tgt, w), ``propagate(adj, x)[i] = sum over edges (j -> i) of w * x[j]``
— messages flow source→target and are sum-aggregated at the target
(reference: protgram_directgcn.py:100-140, PyG MessagePassing aggr='add').

Three device formats, selected by a roofline byte model (`choose_format`):

- ``DenseAdj``:  A^T stored dense; propagation is a single MXU matmul.  For
  small graphs (n-gram levels n<=3, ~10^4 nodes) this moves *fewer* bytes
  than any sparse scheme (2 bytes/entry in bf16 vs 4·F bytes/edge for
  gathered rows) and runs at matmul speed-of-light.
- ``EllAdj``:   padded neighbor lists [N, K] — the natural format for n-gram
  transition graphs, whose in/out degree is bounded by |alphabet|+1, so the
  padding overhead is tiny and all shapes are static for XLA.  Forward is a
  K-chunked gather+FMA; backward uses the pre-built transpose orientation
  (no scatter — mirrors the reference keeping both A_out/A_in,
  graph_utils.py:154-158).
- ``CooAdj``:   sorted-by-target COO + segment_sum, for degree-skewed
  benchmark graphs where ELL padding would explode.

A Pallas kernel (`ops/pallas_spmm.py`) implements the fused
gather→multiply→accumulate ELL propagation for HBM-resident graphs.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# ----------------------------------------------------------------------------
# SDDMM: optional gradients w.r.t. adjacency weights
# ----------------------------------------------------------------------------

# Off by default: the reference never learns edge weights (its adjacency is
# a preprocessed constant, graph_utils.py:198-287), and the dw contractions
# cost an extra sampled dense-dense product per propagation.  Enable per
# call with ``propagate(adj, x, edge_grads=True)`` — the flag is an explicit
# static argument plumbed into the propagation custom-VJPs, so a compiled
# function's behavior is fixed by the argument it was traced with (no
# mutable trace-time state).  dw for the edge-list formats is the sampled
# dense-dense product ``dw[slot] = <g[tgt], x[src]>``; the hypercube format
# computes the per-key [A x A] outer-product contraction (ops/hypercube.py).
# Padding slots (w == 0) receive zero gradient.
_EDGE_GRADS = False


@contextlib.contextmanager
def edge_gradients(enable: bool = True):
    """DEPRECATED shim: pass ``edge_grads=True`` to :func:`propagate` /
    :func:`propagate3` instead.

    The context sets only the *default* that ``propagate`` resolves when its
    ``edge_grads`` argument is None, at trace time.  Explicit arguments
    always win.  A DeprecationWarning fires on entry."""
    import warnings

    warnings.warn(
        "ops.spmm.edge_gradients() is deprecated: pass edge_grads=True to "
        "propagate()/propagate3() — the context only sets a trace-time "
        "default and cannot affect already-compiled functions.",
        DeprecationWarning,
        stacklevel=3,
    )
    global _EDGE_GRADS
    prev = _EDGE_GRADS
    _EDGE_GRADS = bool(enable)
    try:
        yield
    finally:
        _EDGE_GRADS = prev


def edge_gradients_enabled() -> bool:
    return _EDGE_GRADS

# ----------------------------------------------------------------------------
# Device adjacency formats (pytrees)
# ----------------------------------------------------------------------------


@struct.dataclass
class DenseAdj:
    """Dense A^T (out[i] = sum_j at[i, j] x[j])."""

    at: jnp.ndarray  # [n_out, n_in], compute dtype

    @property
    def n_out(self) -> int:
        return self.at.shape[0]


@struct.dataclass
class EllAdj:
    """Padded neighbor lists, both orientations.

    ``idx[i, k]`` is the k-th source feeding target i with weight ``w[i, k]``
    (padding slots have w == 0 and idx == 0).  ``idx_t/w_t`` is the transpose
    orientation (targets per source) used for the backward pass.
    """

    idx: jnp.ndarray  # [n_out, K] int32
    w: jnp.ndarray  # [n_out, K] f32
    idx_t: jnp.ndarray  # [n_in, Kt] int32
    w_t: jnp.ndarray  # [n_in, Kt] f32

    @property
    def n_out(self) -> int:
        return self.idx.shape[0]


@struct.dataclass
class CooAdj:
    """Sorted-by-target COO with transpose orientation for backward."""

    src: jnp.ndarray  # [nnz] int32
    tgt: jnp.ndarray  # [nnz] int32 (sorted ascending)
    w: jnp.ndarray  # [nnz] f32
    src_t: jnp.ndarray  # transpose orientation, sorted by its own target (=src)
    tgt_t: jnp.ndarray
    w_t: jnp.ndarray
    n_out: int = struct.field(pytree_node=False, default=0)
    n_in: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class BucketedEllAdj:
    """Degree-bucketed ELL: rows grouped by degree into per-bucket ELL tables.

    Removes the padding waste of single-K ELL on degree-skewed graphs (a
    single hub row otherwise forces K = max degree for every row).  Rows are
    permuted so each bucket is a contiguous range; ``inv_perm`` maps the
    concatenated bucket output back to original node order.  Both
    orientations are bucketed independently (backward = transpose).
    """

    idx: Tuple[jnp.ndarray, ...]  # per-bucket [rows_b, K_b] int32 source ids
    w: Tuple[jnp.ndarray, ...]  # per-bucket [rows_b, K_b] f32
    inv_perm: jnp.ndarray  # [n_out] int32: out = concat(buckets)[inv_perm]
    idx_t: Tuple[jnp.ndarray, ...]
    w_t: Tuple[jnp.ndarray, ...]
    inv_perm_t: jnp.ndarray

    @property
    def n_out(self) -> int:
        return self.inv_perm.shape[0]


Adjacency = Union[DenseAdj, EllAdj, CooAdj, BucketedEllAdj]


# ----------------------------------------------------------------------------
# Host-side builders
# ----------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ell_one_sided(src: np.ndarray, tgt: np.ndarray, w: np.ndarray, n_out: int, pad_multiple: int = 4):
    """Group (src, w) by tgt into padded [n_out, K] arrays."""
    src = np.asarray(src, dtype=np.int64)
    tgt = np.asarray(tgt, dtype=np.int64)
    w = np.asarray(w, dtype=np.float32)
    deg = np.bincount(tgt, minlength=n_out) if len(tgt) else np.zeros(n_out, dtype=np.int64)
    k = max(1, int(deg.max()) if len(deg) else 1)
    k = _round_up(k, pad_multiple)
    idx = np.zeros((n_out, k), dtype=np.int32)
    wm = np.zeros((n_out, k), dtype=np.float32)
    if len(tgt):
        order = np.argsort(tgt, kind="stable")
        ts, ss, ws = tgt[order], src[order], w[order]
        starts = np.zeros(n_out + 1, dtype=np.int64)
        np.cumsum(deg, out=starts[1:])
        offsets = np.arange(len(ts), dtype=np.int64) - starts[ts]
        idx[ts, offsets] = ss.astype(np.int32)
        wm[ts, offsets] = ws
    return idx, wm


def build_ell(
    src: np.ndarray, tgt: np.ndarray, w: np.ndarray, n_out: int, n_in: Optional[int] = None
) -> EllAdj:
    n_in = n_out if n_in is None else n_in
    idx, wm = _ell_one_sided(src, tgt, w, n_out)
    idx_t, wm_t = _ell_one_sided(tgt, src, w, n_in)
    return EllAdj(
        idx=jnp.asarray(idx), w=jnp.asarray(wm), idx_t=jnp.asarray(idx_t), w_t=jnp.asarray(wm_t)
    )


def build_dense(
    src: np.ndarray,
    tgt: np.ndarray,
    w: np.ndarray,
    n_out: int,
    n_in: Optional[int] = None,
    dtype: jnp.dtype = jnp.float32,
) -> DenseAdj:
    n_in = n_out if n_in is None else n_in
    at = np.zeros((n_out, n_in), dtype=np.float32)
    if len(src):
        np.add.at(at, (np.asarray(tgt, np.int64), np.asarray(src, np.int64)), np.asarray(w, np.float32))
    return DenseAdj(at=jnp.asarray(at, dtype=dtype))


# Few buckets keep the compiled program small (each bucket adds an
# unrolled gather chain to the HLO).
_BUCKET_KS = (8, 16, 64)


def _bucketed_one_sided(src, tgt, w, n_out):
    """Group rows (targets) by degree bucket; returns (idx_list, w_list, inv_perm)."""
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    w = np.asarray(w, np.float32)
    deg = np.bincount(tgt, minlength=n_out) if len(tgt) else np.zeros(n_out, np.int64)
    order = np.argsort(deg, kind="stable")
    inv = np.empty(n_out, np.int64)
    inv[order] = np.arange(n_out)
    tgt_p = inv[tgt]
    sorted_deg = deg[order]
    bounds = []
    start = 0
    for kb in _BUCKET_KS:
        end = int(np.searchsorted(sorted_deg, kb, side="right"))
        if end > start:
            bounds.append((start, end))
        start = end
        if start >= n_out:
            break
    if start < n_out:
        bounds.append((start, n_out))
    if not bounds:
        bounds = [(0, n_out)]
    idx_list, w_list = [], []
    for s_, e_ in bounds:
        m = (tgt_p >= s_) & (tgt_p < e_)
        bi, bw = _ell_one_sided(src[m], tgt_p[m] - s_, w[m], e_ - s_)
        idx_list.append(jnp.asarray(bi))
        w_list.append(jnp.asarray(bw))
    return tuple(idx_list), tuple(w_list), jnp.asarray(inv.astype(np.int32))


def build_bucketed_ell(src, tgt, w, n_out: int, n_in: Optional[int] = None) -> BucketedEllAdj:
    n_in = n_out if n_in is None else n_in
    idx, wm, inv = _bucketed_one_sided(src, tgt, w, n_out)
    idx_t, wm_t, inv_t = _bucketed_one_sided(tgt, src, w, n_in)
    return BucketedEllAdj(idx=idx, w=wm, inv_perm=inv, idx_t=idx_t, w_t=wm_t, inv_perm_t=inv_t)


def build_coo(
    src: np.ndarray, tgt: np.ndarray, w: np.ndarray, n_out: int, n_in: Optional[int] = None
) -> CooAdj:
    n_in = n_out if n_in is None else n_in
    src = np.asarray(src, np.int32)
    tgt = np.asarray(tgt, np.int32)
    w = np.asarray(w, np.float32)
    order = np.argsort(tgt, kind="stable")
    order_t = np.argsort(src, kind="stable")
    return CooAdj(
        src=jnp.asarray(src[order]),
        tgt=jnp.asarray(tgt[order]),
        w=jnp.asarray(w[order]),
        src_t=jnp.asarray(tgt[order_t]),
        tgt_t=jnp.asarray(src[order_t]),
        w_t=jnp.asarray(w[order_t]),
        n_out=int(n_out),
        n_in=int(n_in),
    )


def choose_format(n_out: int, n_in: int, nnz: int, feat_dim: int = 128) -> str:
    """Pick the adjacency format minimising bytes moved per propagation.

    Dense moves ~2·n_out·n_in bytes (bf16 A^T tiles dominate); ELL moves
    ~4·F·nnz_padded bytes (one gathered f32 feature row per edge slot).  COO
    is chosen over ELL when degree skew makes padded nnz explode.
    """
    if nnz == 0:
        return "dense" if n_out * n_in <= 4_000_000 else "coo"
    deg = float(nnz) / max(n_out, 1)
    dense_bytes = 2.0 * n_out * n_in
    ell_pad_factor = 1.25  # typical padding for bounded-degree n-gram graphs
    ell_bytes = 4.0 * feat_dim * nnz * ell_pad_factor
    if dense_bytes <= ell_bytes and n_out * n_in * 4 <= 2 << 30:
        return "dense"
    # Degree skew estimate is refined by the caller (which knows max degree);
    # default to ELL for bounded-degree graphs.
    return "ell" if deg >= 1.0 else "coo"


def build_adjacency(
    src: np.ndarray,
    tgt: np.ndarray,
    w: np.ndarray,
    n_out: int,
    n_in: Optional[int] = None,
    mode: str = "auto",
    feat_dim: int = 128,
    dtype: jnp.dtype = jnp.float32,
    node_keys: Optional[Tuple[np.ndarray, np.ndarray, int]] = None,
    vocab_codes: Optional[Tuple[np.ndarray, int]] = None,
) -> Adjacency:
    """Build the device adjacency in the requested (or auto-selected) format.

    ``node_keys = (prefix_key, suffix_key, num_keys)`` unlocks the
    block-structured n-gram format (`ops/block.py`) for square propagation
    matrices whose pattern factors over (n-1)-gram keys — chosen in auto mode
    when its random-gather row count beats the edge-gather formats.

    ``vocab_codes = (codes [N, n], alphabet_size)`` additionally unlocks the
    gather-free hypercube format (`ops/hypercube.py`).  NOTE: that format
    changes the propagation node space to [alphabet^n] (see its ``n_out``) —
    callers must size features accordingly, so it is only chosen when
    ``vocab_codes`` is passed explicitly.
    """
    n_in = n_out if n_in is None else n_in
    if mode in ("auto", "hypercube") and vocab_codes is not None and n_out == n_in:
        from protgram_directgcn_tpu.ops import hypercube as _hyper

        codes, alpha = vocab_codes
        n_chars = codes.shape[1] if getattr(codes, "ndim", 0) == 2 else 0
        n_hyper = alpha**n_chars if n_chars else 0
        # Worthwhile whenever the padded node space stays within a small
        # multiple of the real one: gather-free streaming beats random
        # gathers until padding dilutes the streams by ~the gather/stream
        # bandwidth ratio (~4-6x on this part).
        dense_enough = 0 < n_hyper <= 4 * max(n_out, 1)
        if mode == "hypercube" or dense_enough:
            try:
                # Single-matrix context (e.g. the SpMM bench): most of HBM is
                # available, so afford the fast dual-layout banks.
                return _hyper.build_hypercube(
                    src, tgt, w, codes, alpha, weights_dtype=dtype,
                    max_block_bytes=10 << 30,
                )
            except Exception:
                if mode == "hypercube":
                    raise
    if mode in ("auto", "block") and node_keys is not None and n_out == n_in and len(src):
        from protgram_directgcn_tpu.ops import block as _block

        pk, sk, num_keys = node_keys
        counts_s = np.bincount(np.asarray(sk, np.int64), minlength=num_keys)
        r_est = int(counts_s.max()) if len(counts_s) else 1
        block_rows = num_keys * r_est + n_out  # random rows per pass
        worthwhile = block_rows < 0.9 * len(src) and r_est <= 64
        if mode == "block" or (worthwhile and choose_format(n_out, n_in, len(src), feat_dim) != "dense"):
            try:
                return _block.build_block_ngram(src, tgt, w, n_out, pk, sk, num_keys)
            except _block.BlockStructureError:
                if mode == "block":
                    raise
    if mode == "auto":
        mode = choose_format(n_out, n_in, len(src), feat_dim)
        if mode == "ell" and len(tgt):
            # Refine: when max degree is well above the mean (degree skew),
            # single-K ELL wastes padded slots — switch to degree buckets.
            deg = np.bincount(np.asarray(tgt, np.int64), minlength=n_out)
            deg_t = np.bincount(np.asarray(src, np.int64), minlength=n_in)
            kmax = max(int(deg.max()), int(deg_t.max()))
            if kmax * max(n_out, n_in) > 2 * len(src):
                mode = "bucketed"
    if mode == "dense":
        return build_dense(src, tgt, w, n_out, n_in, dtype=dtype)
    if mode in ("ell", "pallas"):
        return build_ell(src, tgt, w, n_out, n_in)
    if mode == "bucketed":
        return build_bucketed_ell(src, tgt, w, n_out, n_in)
    if mode == "coo":
        return build_coo(src, tgt, w, n_out, n_in)
    raise ValueError(f"Unknown adjacency mode: {mode}")


# ----------------------------------------------------------------------------
# Propagation implementations
# ----------------------------------------------------------------------------

# Cap on the [chunk, N, F] gather intermediate in the ELL forward.
_ELL_CHUNK_BYTES = 256 * 1024 * 1024


# K at or below this unrolls into straight-line gather+FMA (simple HLO;
# remote compiles of scan-heavy SpMM programs were measured at 25+ minutes).
_ELL_UNROLL_K = 16


def _ell_apply(idx: jnp.ndarray, w: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum_k w[i,k] * x[idx[i,k]].

    1-D flattened gathers only — 2-D index arrays lower ~20x slower on TPU.
    Small K unrolls (compile-friendly); large K runs a K-chunked scan.
    """
    n, k = idx.shape
    f = x.shape[-1]
    out_dtype = jnp.promote_types(x.dtype, w.dtype)

    if k <= _ELL_UNROLL_K:
        acc = jnp.zeros((n, f), dtype=out_dtype)
        for j in range(k):
            acc = acc + w[:, j : j + 1] * jnp.take(x, idx[:, j], axis=0)
        return acc

    chunk = max(1, min(k, _ELL_CHUNK_BYTES // max(1, 4 * n * f)))
    acc = jnp.zeros((n, f), dtype=out_dtype)
    num_chunks = (k + chunk - 1) // chunk
    if num_chunks * chunk != k:
        pad = num_chunks * chunk - k
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))

    idx_c = idx.reshape(n, num_chunks, chunk).transpose(1, 0, 2)  # [C, N, chunk]
    w_c = w.reshape(n, num_chunks, chunk).transpose(1, 0, 2)

    def body(acc, args):
        ic, wc = args  # [N, chunk]
        gathered = jnp.take(x, ic.reshape(-1), axis=0).reshape(n, chunk, f)
        acc = acc + jnp.einsum(
            "nc,ncf->nf", wc, gathered, preferred_element_type=out_dtype
        )
        return acc, None

    acc, _ = jax.lax.scan(body, acc, (idx_c, w_c))
    return acc


def _sddmm_ell(idx: jnp.ndarray, w: jnp.ndarray, x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Sampled dense-dense product ``dw[i, k] = <g[i], x[idx[i, k]]>``.

    The SDDMM counterpart of `_ell_apply` (same 1-D flattened gathers /
    chunking discipline).  Padding slots (w == 0) are masked to zero so the
    padded ELL structure never leaks gradient into fictitious edges."""
    n, k = idx.shape
    f = x.shape[-1]
    g32 = g.astype(jnp.float32)
    if k <= _ELL_UNROLL_K:
        cols = [
            jnp.sum(g32 * jnp.take(x, idx[:, j], axis=0).astype(jnp.float32), axis=-1)
            for j in range(k)
        ]
        dw = jnp.stack(cols, axis=1)
    else:
        chunk = max(1, min(k, _ELL_CHUNK_BYTES // max(1, 4 * n * f)))
        num_chunks = (k + chunk - 1) // chunk
        idx_p = idx
        if num_chunks * chunk != k:
            idx_p = jnp.pad(idx, ((0, 0), (0, num_chunks * chunk - k)))
        idx_c = idx_p.reshape(n, num_chunks, chunk).transpose(1, 0, 2)  # [C, N, chunk]

        def body(_, ic):
            gathered = jnp.take(x, ic.reshape(-1), axis=0).reshape(n, chunk, f)
            return None, jnp.einsum(
                "nf,ncf->nc", g32, gathered.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )

        _, dw_c = jax.lax.scan(body, None, idx_c)
        dw = dw_c.transpose(1, 0, 2).reshape(n, num_chunks * chunk)[:, :k]
    return jnp.where(w != 0, dw, 0.0).astype(w.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _propagate_ell(edge_grads, idx, w, idx_t, w_t, x):
    return _ell_apply(idx, w, x)


def _propagate_ell_fwd(edge_grads, idx, w, idx_t, w_t, x):
    res = (idx, w, idx_t, w_t) + ((x,) if edge_grads else ())
    return _ell_apply(idx, w, x), res


def _propagate_ell_bwd(edge_grads, res, g):
    idx, w, idx_t, w_t = res[:4]
    dx = _ell_apply(idx_t, w_t, g)  # transpose-orientation gather, no scatter
    z_i = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    z_it = np.zeros(idx_t.shape, dtype=jax.dtypes.float0)
    if len(res) == 5:  # edge_gradients(): SDDMM w.r.t. the forward weights
        dw = _sddmm_ell(idx, w, res[4], g)
        # w_t holds the same values in the transpose orientation but is not
        # read by the forward product — its gradient is strictly zero; a
        # caller training edge weights updates w and rebuilds/syncs w_t.
        return (z_i, dw, z_it, jnp.zeros_like(w_t), dx)
    return (z_i, jnp.zeros_like(w), z_it, jnp.zeros_like(w_t), dx)


_propagate_ell.defvjp(_propagate_ell_fwd, _propagate_ell_bwd)


def _bucketed_apply(idx_tuple, w_tuple, inv_perm, x):
    outs = [_ell_apply(i, wv, x) for i, wv in zip(idx_tuple, w_tuple)]
    return jnp.concatenate(outs, axis=0)[inv_perm]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _propagate_bucketed(edge_grads, idx, w, inv_perm, idx_t, w_t, inv_perm_t, x):
    return _bucketed_apply(idx, w, inv_perm, x)


def _propagate_bucketed_fwd(edge_grads, idx, w, inv_perm, idx_t, w_t, inv_perm_t, x):
    res = (idx, w, inv_perm, idx_t, w_t, inv_perm_t) + ((x,) if edge_grads else ())
    return _bucketed_apply(idx, w, inv_perm, x), res


def _propagate_bucketed_bwd(edge_grads, res, g):
    idx, w, inv_perm, idx_t, w_t, inv_perm_t = res[:6]
    dx = _bucketed_apply(idx_t, w_t, inv_perm_t, g)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    if len(res) == 7:  # edge_gradients(): per-bucket SDDMM
        x = res[6]
        # out = concat(buckets)[inv_perm] -> cotangent of the concatenation
        # is g put back into bucket order.
        g_concat = jnp.take(g, jnp.argsort(inv_perm), axis=0)
        dw, start = [], 0
        for bi, bw in zip(idx, w):
            rows = bi.shape[0]
            dw.append(_sddmm_ell(bi, bw, x, g_concat[start : start + rows]))
            start += rows
        dw = tuple(dw)
    else:
        dw = tuple(jnp.zeros_like(a) for a in w)
    return (
        tuple(f0(a) for a in idx),
        dw,
        f0(inv_perm),
        tuple(f0(a) for a in idx_t),
        tuple(jnp.zeros_like(a) for a in w_t),
        f0(inv_perm_t),
        dx,
    )


_propagate_bucketed.defvjp(_propagate_bucketed_fwd, _propagate_bucketed_bwd)


def _coo_apply(src, tgt, w, x, n_out):
    msgs = w[:, None] * jnp.take(x, src, axis=0)
    return jax.ops.segment_sum(msgs, tgt, num_segments=n_out, indices_are_sorted=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 7, 8))
def _propagate_coo(edge_grads, src, tgt, w, src_t, tgt_t, w_t, n_out, n_in, x):
    return _coo_apply(src, tgt, w, x, n_out)


def _propagate_coo_fwd(edge_grads, src, tgt, w, src_t, tgt_t, w_t, n_out, n_in, x):
    # fwd receives args in original positions; bwd gets nondiff args first.
    res = (src, tgt, w, src_t, tgt_t, w_t) + ((x,) if edge_grads else ())
    return _coo_apply(src, tgt, w, x, n_out), res


def _propagate_coo_bwd(edge_grads, n_out, n_in, res, g):
    src, tgt, w, src_t, tgt_t, w_t = res[:6]
    dx = _coo_apply(src_t, tgt_t, w_t, g, n_in)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    if len(res) == 7:  # edge_gradients(): dw[e] = <g[tgt[e]], x[src[e]]>
        x = res[6]
        dw = jnp.sum(
            jnp.take(g, tgt, axis=0).astype(jnp.float32)
            * jnp.take(x, src, axis=0).astype(jnp.float32),
            axis=-1,
        ).astype(w.dtype)
    else:
        dw = jnp.zeros_like(w)
    return (f0(src), f0(tgt), dw, f0(src_t), f0(tgt_t), jnp.zeros_like(w_t), dx)


# custom_vjp positional plumbing: nondiff_argnums must come first in fwd/bwd.
_propagate_coo.defvjp(_propagate_coo_fwd, _propagate_coo_bwd)


def propagate(
    adj: Adjacency,
    x: jnp.ndarray,
    use_pallas: bool = False,
    edge_grads: Optional[bool] = None,
) -> jnp.ndarray:
    """Sum-aggregate weighted source features at each target node.

    ``edge_grads=True`` additionally produces SDDMM gradients w.r.t. the
    adjacency weight leaves under autodiff (see the module header); the flag
    is static — it fixes the traced program's behavior explicitly.  None
    falls back to the deprecated :func:`edge_gradients` context default."""
    eg = bool(_EDGE_GRADS) if edge_grads is None else bool(edge_grads)
    if isinstance(adj, DenseAdj):
        # In f32 mode force full-precision MXU passes (TPU defaults to bf16);
        # in bf16 mode one pass is the intended speed/accuracy trade.
        # (Dense weights are differentiated natively by jnp.dot.)
        precision = "highest" if adj.at.dtype == jnp.float32 else "default"
        return jnp.dot(
            adj.at, x.astype(adj.at.dtype), precision=precision, preferred_element_type=jnp.float32
        )
    if isinstance(adj, EllAdj):
        if use_pallas and not eg:  # the Pallas ELL kernel has no SDDMM path
            from protgram_directgcn_tpu.ops.pallas_spmm import propagate_ell_pallas

            return propagate_ell_pallas(adj, x)
        return _propagate_ell(eg, adj.idx, adj.w, adj.idx_t, adj.w_t, x)
    if isinstance(adj, BucketedEllAdj):
        return _propagate_bucketed(
            eg, adj.idx, adj.w, adj.inv_perm, adj.idx_t, adj.w_t, adj.inv_perm_t, x
        )
    if isinstance(adj, CooAdj):
        return _propagate_coo(eg, adj.src, adj.tgt, adj.w, adj.src_t, adj.tgt_t, adj.w_t, adj.n_out, adj.n_in, x)
    from protgram_directgcn_tpu.ops import block as _block

    if isinstance(adj, _block.BlockNgramAdj):
        return _block.propagate_block(adj, x)
    from protgram_directgcn_tpu.ops import hypercube as _hyper

    if isinstance(adj, _hyper.HypercubeAdj):
        return _hyper.propagate_hyper(adj, x, edge_grads=eg)
    # Distributed adjacencies (imported lazily to avoid a cycle).
    from protgram_directgcn_tpu.parallel import halo as _halo

    if isinstance(adj, _halo.HaloAdj):
        return _halo.propagate_halo(adj, x)
    from protgram_directgcn_tpu.parallel import hyper_shard as _hs

    if isinstance(adj, _hs.HyperShardAdj):
        return _hs.propagate_hyper_shard(adj, x)
    raise TypeError(f"Unknown adjacency type: {type(adj)}")


def propagate_transpose(adj: Adjacency, x: jnp.ndarray, use_pallas: bool = False) -> jnp.ndarray:
    """The transpose product ``Mᵀ x``: out[j] = sum over edges (j -> i) of
    w * x[i].  Every format stores its transpose pair, so this is a direct
    dispatch with the roles swapped — for manual/host-driven backward passes
    that already hold the upstream cotangent (the staged trainer's per-path
    layer backward).  NOT meant to be differentiated itself; differentiate
    :func:`propagate` instead."""
    if isinstance(adj, DenseAdj):
        precision = "highest" if adj.at.dtype == jnp.float32 else "default"
        return jnp.dot(
            adj.at.T, x.astype(adj.at.dtype), precision=precision,
            preferred_element_type=jnp.float32,
        )
    if isinstance(adj, EllAdj):
        if use_pallas:
            from protgram_directgcn_tpu.ops.pallas_spmm import propagate_ell_pallas

            return propagate_ell_pallas(EllAdj(idx=adj.idx_t, w=adj.w_t, idx_t=adj.idx, w_t=adj.w), x)
        return _propagate_ell(False, adj.idx_t, adj.w_t, adj.idx, adj.w, x)
    if isinstance(adj, BucketedEllAdj):
        return _propagate_bucketed(
            False, adj.idx_t, adj.w_t, adj.inv_perm_t, adj.idx, adj.w, adj.inv_perm, x
        )
    if isinstance(adj, CooAdj):
        return _propagate_coo(
            False, adj.src_t, adj.tgt_t, adj.w_t, adj.src, adj.tgt, adj.w,
            adj.n_in, adj.n_out, x,
        )
    from protgram_directgcn_tpu.ops import hypercube as _hyper

    if isinstance(adj, _hyper.HypercubeAdj):
        return _hyper.propagate_hyper_transpose(adj, x)
    raise TypeError(f"propagate_transpose: unsupported adjacency {type(adj)}")


def propagate3(graph, x_in: jnp.ndarray, x_out: jnp.ndarray, x_und: jnp.ndarray,
               use_pallas: bool = False, edge_grads: Optional[bool] = None):
    """The three per-path propagations of a DirectGCN layer:
    ``(P_in x_in, P_out x_out, P_und x_und)``.

    Dispatches to the layer-level fused operator when the device graph
    carries one (distributed TriHaloAdj: ONE halo exchange serves all three
    matrices, parallel/halo.py), else falls back to three independent
    propagations."""
    tri = getattr(graph, "tri", None)
    if tri is not None:
        from protgram_directgcn_tpu.parallel import halo as _halo
        from protgram_directgcn_tpu.parallel import hyper_shard as _hs

        if isinstance(tri, _hs.HyperShardTri):
            return _hs.propagate_hyper_shard_tri(tri, x_in, x_out, x_und)
        return _halo.propagate_tri(tri, x_in, x_out, x_und)
    if x_in.ndim == 3:
        # rg carry = hypercube scale: chain the three independent
        # propagations with optimization barriers so XLA schedules them
        # (and, via the barrier's transpose, their backward chains)
        # SEQUENTIALLY — overlapped, each chain's ~4 x 1 GB pipeline
        # buffers (projection, z, x_flat relayout, out) are live at once
        # and the 4-layer 5-gram train step misses the 16 GB chip by
        # ~190 MB.  The kernels run serially on the single core anyway;
        # only some DMA prefetch overlap is lost.
        pi = propagate(graph.p_in, x_in, use_pallas, edge_grads)
        x_out, pi = jax.lax.optimization_barrier((x_out, pi))
        po = propagate(graph.p_out, x_out, use_pallas, edge_grads)
        x_und, po = jax.lax.optimization_barrier((x_und, po))
        pu = propagate(graph.p_und, x_und, use_pallas, edge_grads)
        return pi, po, pu
    return (
        propagate(graph.p_in, x_in, use_pallas, edge_grads),
        propagate(graph.p_out, x_out, use_pallas, edge_grads),
        propagate(graph.p_und, x_und, use_pallas, edge_grads),
    )


def propagate_affine(adj: Adjacency, x: jnp.ndarray, scale: float, shift: float) -> jnp.ndarray:
    """Fused ``scale * propagate(adj, x) + shift``.

    Production layers apply a scale/bias right after aggregation; formats
    with a fused epilogue (the hypercube Pallas kernels) run it inside the
    output cast for free, others fall back to an XLA elementwise."""
    from protgram_directgcn_tpu.ops import hypercube as _hyper

    if isinstance(adj, _hyper.HypercubeAdj):
        return _hyper.propagate_hyper_affine(adj, x, scale, shift)
    from protgram_directgcn_tpu.parallel import hyper_shard as _hs

    if isinstance(adj, _hs.HyperShardAdj):
        return _hs.propagate_hyper_shard(adj, x, scale, shift)
    return propagate(adj, x) * scale + shift
