"""Hypercube-factorized SpMM for n-gram propagation matrices (gather-free).

The block format (`ops/block.py`) already factors any n-gram propagation
matrix ``M`` (pattern contained in union(A, Aᵀ, I), which holds for 𝒜_out,
𝒜_in and the undirected sym-norm matrix — reference: graph_utils.py:198-287)
into per-(n-1)-gram-key dense blocks, but still pays two *random* HBM gathers
per pass (suffix-grouped inputs and outputs).  This format removes them
entirely by choosing the node id space to be the **full character hypercube**:

    node id of n-gram (c_1 .. c_n)  :=  sum_i code(c_i) * A^(n-i)

With positional ids, the prefix key and the suffix key of a node are integer
div/mod of its id (``id // A`` and ``id % A^(n-1)``), so the two grouped
layouts the block contraction needs are plain *reshapes* of the feature array:

    prefix layout  x[key, last_char]   = x.reshape(G, A, F)       (free view)
    suffix layout  x[first_char, key]  = x.reshape(A, G, F)       (free view)

and one propagation becomes

    out = d * x                                  (diagonal)
        + sum_r wf[g,c,r] * x[r,g,f]             (A  pattern, out at (g,c))
        + sum_c wb[g,r,c] * x[g,c,f]             (Aᵀ pattern, out at (r,g))

— per-key [A x A] block contractions over G = A^(n-1) keys plus regular
(tileable) relayouts.  **Zero random gathers**: every byte moves at
streaming/transpose rate instead of the random-row gather rate that bounds
ELL/COO/block SpMM on this hardware (no SparseCore; see CLAUDE.md).

Weight banks are stored ``[G, A, A]`` (key-major, so kernels take contiguous
leading-axis blocks), in BOTH last-two-dim layouts because the two fused
kernels batch their matmuls over the key axis with different operand orders:

    wf_c[g, c, r] = wf_r[g, r, c] = weight of edge (r·G+g) -> (g·A+c)
    wb_c[g, c, r] = wb_r[g, r, c] = weight of edge (g·A+c) -> (r·G+g)

The transpose product Mᵀx — the backward pass — is the SAME computation with
the two edge-pattern banks swapped: under Mᵀ each A-pattern edge becomes an
Aᵀ-pattern edge with identical (r, g, c) coordinates and vice versa, so
fwd consumes (wf_c, wb_r) and bwd consumes (wb_c, wf_r).  Duplicating the
layouts costs 2x weight memory but removes two full relayout passes per
propagation (measured ~13% on v5e).  On TPU the product runs as two fused
Pallas kernels (`ops/pallas_hyper.py`, batched MXU contractions); off-TPU an
XLA einsum fallback computes the same contraction.

The price of the format is padding the node space from |vocab| to A^n
(absent n-grams are zero rows that never receive contributions).  For
protein n-gram graphs the vocabulary saturates the hypercube quickly (5-gram
Swiss-Prot scale: ~60%+ dense), so the 1/density traffic overhead is far
cheaper than random gathers.  Builders refuse (BlockStructureError) when the
hypercube would be too sparse or too large, letting
`build_adjacency(mode="auto")` fall back.

reference: graph_utils.py:198-287 (propagation matrices this format carries),
data_builder.py:45-54 (edges connect overlapping n-grams, which is what makes
every off-diagonal entry fit the A or Aᵀ key pattern).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from protgram_directgcn_tpu.ops.block import BlockStructureError


@struct.dataclass
class HypercubeAdj:
    """Positional-id factorisation of an n-gram propagation matrix.

    Operates on the hypercube node space [A^n] (``n_out == A**n``); real
    nodes live at ``node_map`` positions, absent ids are zero rows/columns.
    """

    d: jnp.ndarray  # [G, A] f32 diagonal (flat over node id g*A + c)
    wf_c: jnp.ndarray  # [G, A, A]: wf_c[g, c, r] = w(edge r·G+g -> g·A+c)
    wf_r: jnp.ndarray  # [G, A, A]: wf_r[g, r, c] = same weights, other layout
    wb_c: jnp.ndarray  # [G, A, A]: wb_c[g, c, r] = w(edge g·A+c -> r·G+g)
    wb_r: jnp.ndarray  # [G, A, A]: wb_r[g, r, c] = same weights, other layout
    node_map: jnp.ndarray  # [N_real] int32 hypercube id per real node

    @property
    def n_out(self) -> int:
        return self.d.shape[0] * self.d.shape[1]

    @property
    def alphabet(self) -> int:
        return self.d.shape[1]


def vocab_char_codes(vocab: np.ndarray) -> Tuple[np.ndarray, int]:
    """Per-node character codes [N, n] over the sorted alphabet of ``vocab``."""
    vocab = np.asarray(vocab)
    n_nodes = len(vocab)
    if n_nodes == 0:
        return np.zeros((0, 1), np.int64), 0
    n = len(str(vocab[0]))
    chars = vocab.astype(f"U{n}").view("U1").reshape(n_nodes, n)
    alphabet, flat = np.unique(chars, return_inverse=True)
    return flat.reshape(n_nodes, n).astype(np.int64), int(len(alphabet))


def build_hypercube(
    src: np.ndarray,
    tgt: np.ndarray,
    val: np.ndarray,
    codes: np.ndarray,
    alphabet_size: int,
    max_block_bytes: int = 2 << 30,
    weights_dtype: jnp.dtype = jnp.float32,
) -> HypercubeAdj:
    """Factor a coalesced COO matrix over positional hypercube ids.

    ``codes[u]`` are the alphabet indices of node u's characters.  Raises
    BlockStructureError when an off-diagonal edge fits neither key pattern,
    when n < 2 (1-grams have no key structure — use the dense format), or
    when the hypercube blocks would exceed ``max_block_bytes``.

    ``weights_dtype=bfloat16`` halves the HBM traffic of the weight banks
    (f32 accumulation regardless); the diagonal stays f32.
    """
    codes = np.asarray(codes, np.int64)
    n_real, n = codes.shape
    a = int(alphabet_size)
    if n < 2:
        raise BlockStructureError("hypercube format needs n >= 2")
    g = a ** (n - 1)
    n_hyper = a**n
    itemsize = jnp.dtype(weights_dtype).itemsize
    if 4 * g * a * a * itemsize > max_block_bytes:
        raise BlockStructureError(
            f"hypercube banks would need {4 * g * a * a * itemsize} bytes"
        )

    pows = a ** np.arange(n - 1, -1, -1, dtype=np.int64)
    hyper = codes @ pows  # [N_real] positional id
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    val = np.asarray(val, np.float32)

    pk = hyper // a  # prefix key = chars 1..n-1 positional code
    sk = hyper % g  # suffix key = chars 2..n positional code
    first = codes[:, 0]
    last = codes[:, -1]

    diag = src == tgt
    d = np.zeros(n_hyper, np.float32)
    np.add.at(d, hyper[src[diag]], val[diag])

    off = ~diag
    s, t, v = src[off], tgt[off], val[off]
    fwd = sk[s] == pk[t]
    bwd = ~fwd & (pk[s] == sk[t])
    leftover = int((~fwd & ~bwd).sum())
    if leftover:
        raise BlockStructureError(
            f"{leftover} edges fit neither the A nor the Aᵀ n-gram pattern"
        )

    sf, tf, vf = s[fwd], t[fwd], v[fwd]
    sb, tb, vb = s[bwd], t[bwd], v[bwd]
    # Ship COO to the device and scatter there: the flat block tables are
    # 4*G*A*A entries (hundreds of MB at 5-gram scale) while the COO triplets
    # are ~8 bytes/edge — a big win over the ~8 MB/s host->device tunnel.
    # A-pattern edge coords: r = first[src], g = suffix key of src, c = last[tgt].
    # Aᵀ-pattern edge coords: r = first[tgt], g = prefix key of src, c = last[src].
    def scatter_bank(flat, vals):
        bank = (
            jnp.zeros(g * a * a, jnp.float32)
            .at[jnp.asarray(flat, jnp.int32)]
            .add(jnp.asarray(vals))
            .reshape(g, a, a)
        )
        return bank.astype(weights_dtype)

    return HypercubeAdj(
        d=jnp.asarray(d.reshape(g, a)),
        wf_c=scatter_bank((sk[sf] * a + last[tf]) * a + first[sf], vf),
        wf_r=scatter_bank((sk[sf] * a + first[sf]) * a + last[tf], vf),
        wb_c=scatter_bank((pk[sb] * a + last[sb]) * a + first[tb], vb),
        wb_r=scatter_bank((pk[sb] * a + first[tb]) * a + last[sb], vb),
        node_map=jnp.asarray(hyper.astype(np.int32)),
    )


def embed_features(adj: HypercubeAdj, x_real: jnp.ndarray) -> jnp.ndarray:
    """Scatter real-node features into the hypercube layout (absent ids = 0)."""
    out = jnp.zeros((adj.n_out,) + x_real.shape[1:], x_real.dtype)
    return out.at[adj.node_map].set(x_real)


def extract_features(adj: HypercubeAdj, x_hyper: jnp.ndarray) -> jnp.ndarray:
    """Gather real-node rows back out of the hypercube layout."""
    return jnp.take(x_hyper, adj.node_map, axis=0)


# -----------------------------------------------------------------------------
# Propagation
# -----------------------------------------------------------------------------


def _einsum(spec, a, b):
    # f32 blocks demand full-precision MXU passes (TPU matmul defaults bf16).
    prec = "highest" if a.dtype == jnp.float32 else "default"
    return jnp.einsum(spec, a, b, precision=prec, preferred_element_type=jnp.float32)


def _use_pallas() -> bool:
    knob = os.environ.get("PROTGRAM_HYPER_PALLAS", "auto")
    if knob in ("0", "off"):
        return False
    if knob in ("1", "on"):
        return True
    return jax.default_backend() == "tpu"


def _hyper_apply(d, w1c, w2r, x):
    """M x where ``w1c`` is the A-pattern bank in [g, c, r] layout and
    ``w2r`` the Aᵀ-pattern bank in [g, r, c] layout.

    The transpose product Mᵀx is the same call with (wb_c, wf_r): transposing
    M swaps the two edge-pattern roles at identical (r, g, c) coordinates.
    """
    g, a, _ = w1c.shape
    n_hyper, f = x.shape
    if _use_pallas() and f % 128 == 0 and n_hyper == a * g:
        from protgram_directgcn_tpu.ops.pallas_hyper import apply_hyper_pallas

        return apply_hyper_pallas(d, w1c, w2r, x)
    x_rg = x.reshape(a, g, f)  # [first char, suffix key, F]  (free view)
    x_gc = x.reshape(g, a, f)  # [prefix key, last char, F]   (free view)
    y1 = _einsum("gcr,rgf->gcf", w1c, x_rg)  # A  pattern -> node order (g, c)
    y2 = _einsum("grc,gcf->rgf", w2r, x_gc)  # Aᵀ pattern -> node order (r, g)
    out = d.reshape(-1)[:, None] * x + y1.reshape(n_hyper, f) + y2.reshape(n_hyper, f)
    return out.astype(x.dtype)


@jax.custom_vjp
def _propagate_hyper(d, wf_c, wf_r, wb_c, wb_r, x):
    return _hyper_apply(d, wf_c, wb_r, x)


def _propagate_hyper_fwd(d, wf_c, wf_r, wb_c, wb_r, x):
    return _hyper_apply(d, wf_c, wb_r, x), (d, wf_r, wb_c)


def _propagate_hyper_bwd(res, grad):
    d, wf_r, wb_c = res
    dx = _hyper_apply(d, wb_c, wf_r, grad)  # Mᵀ grad: edge-pattern roles swap
    zeros = lambda ref: jnp.zeros_like(ref)  # noqa: E731 — graph is constant
    return (zeros(d), zeros(wf_r), zeros(wf_r), zeros(wb_c), zeros(wb_c), dx)


_propagate_hyper.defvjp(_propagate_hyper_fwd, _propagate_hyper_bwd)


def propagate_hyper(adj: HypercubeAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum over edges (j -> i) of w * x[j], both in hypercube ids."""
    return _propagate_hyper(adj.d, adj.wf_c, adj.wf_r, adj.wb_c, adj.wb_r, x)
