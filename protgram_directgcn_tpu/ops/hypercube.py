"""Hypercube-factorized SpMM for n-gram propagation matrices (gather-free).

The block format (`ops/block.py`) already factors any n-gram propagation
matrix ``M`` (pattern contained in union(A, Aᵀ, I), which holds for 𝒜_out,
𝒜_in and the undirected sym-norm matrix — reference: graph_utils.py:198-287)
into per-(n-1)-gram-key dense blocks, but still pays two *random* HBM gathers
per pass (suffix-grouped inputs and outputs).  This format removes them
entirely by choosing the node id space to be the **full character hypercube**:

    node id of n-gram (c_1 .. c_n)  :=  sum_i code(c_i) * A^(n-i)

With positional ids, the prefix key and the suffix key of a node are integer
div/mod of its id (``id // A`` and ``id % A^(n-1)``), so the grouped layouts
the block contraction needs are plain *reshapes* of the feature array, and one
propagation becomes

    out = d * x                                  (diagonal)
        + sum_r wf[r,g,c] * x[r*G+g]             (A  pattern, out at g*A+c)
        + sum_c wb[r,g,c] * x[g*A+c]             (Aᵀ pattern, out at r*G+g)

— per-key [A x A] block contractions over G = A^(n-1) keys.  **Zero random
gathers**: every byte moves at streaming rate instead of the random-row gather
rate that bounds ELL/COO SpMM on this hardware (no SparseCore; see CLAUDE.md).

TPU layout discipline (see ops/pallas_hyper.py for the measured rationale):
features are carried in the **rg layout** ``[A, G, F]`` whose trailing dims
tile perfectly, and each weight bank is stored in the layout its consuming
kernel measured fastest: K1 (A pattern) takes g-major slabs, K2 (Aᵀ) takes
r-major slabs (g-major pads (A, A) tiles to (32, 128) — 9.3x — but buys K1 a
minor-dim MXU contraction worth ~4 ms/prop; r-major pads only lanes, 6.1x):

    w*_gm[g, c, r]   g-major;  wf: edge (r*G+g) -> (g*A+c),  wb: the reverse
    w*_rs[r, g, c]   r-major;  same values, sliced along G by K2

The transpose product Mᵀx — the backward pass — is the SAME computation with
the two edge-pattern roles swapped at identical (r, g, c) coordinates:
forward consumes (wf_gm, wb_rs), backward (wb_gm, wf_rs).

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

import functools
import os
from typing import Optional, Tuple

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

    d: jnp.ndarray  # [A, G] f32 diagonal (rg layout; flat == node order)
    wf_gm: Optional[jnp.ndarray]  # [G, A, A]: wf_gm[g,c,r] = w(r·G+g -> g·A+c)
    wb_gm: Optional[jnp.ndarray]  # [G, A, A]: wb_gm[g,c,r] = w(g·A+c -> r·G+g)
    wf_rs: jnp.ndarray  # see bank_layout: [A, G, A] wf_rs[r,g,c], or packed
    wb_rs: jnp.ndarray  # [A, G, A] wb_rs[r,g,c] in dual/rs modes, or packed
    #                     [A*A, G] w[r·A+c, g] in the "pk" mode
    node_map: jnp.ndarray  # [N_real] int32 hypercube id per real node
    # Bank layout modes (bank_layout property distinguishes them by shape):
    #  "dual" wf_gm/wb_gm [G, A, A] g-major copies for K1 plus r-major
    #         wf_rs/wb_rs for K2 — the FASTEST mode (K1 measured 9.84
    #         ms/iter vs 14.32 packed, experiments/exp_packed_k1.log) at the
    #         price of storing each bank twice (g-major pads 9.3x).
    #  "pk"   wf_rs/wb_rs are packed [A*A, G] — near-zero tile padding on
    #         both the HBM stream and device storage (~6x leaner than
    #         r-major, ~9x than g-major) but a SLOWER K1 (in-register
    #         (441, gt) split costs ~45%: 14.32 vs 9.84 ms/iter measured);
    #         wf_gm/wb_gm are None.  Pick it for memory, not speed.
    #  "rs"   r-major only (memory-lean legacy fallback; ~+4 ms/prop K1).

    @property
    def bank_layout(self) -> str:
        if self.wf_rs is not None and self.wf_rs.ndim == 2:
            return "pk"
        return "dual" if self.wf_gm is not None else "rs"

    @property
    def n_out(self) -> int:
        return self.d.shape[0] * self.d.shape[1]

    @property
    def alphabet(self) -> int:
        return self.d.shape[0]

    @property
    def feature_shape(self) -> Tuple[int, int]:
        """Leading dims of the kernel-native (rg) feature layout [A, G]."""
        return (self.d.shape[0], self.d.shape[1])


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
    max_block_bytes: int = 6 << 30,
    weights_dtype: jnp.dtype = jnp.float32,
    bank_layouts: str = "dual",
) -> HypercubeAdj:
    """Factor a coalesced COO matrix over positional hypercube ids.

    ``codes[u]`` are the alphabet indices of node u's characters.  Raises
    BlockStructureError when an off-diagonal edge fits neither key pattern,
    when n < 2 (1-grams have no key structure — use the dense format), or
    when the banks' PADDED device footprint (TPU tile padding included)
    would exceed ``max_block_bytes``.

    ``weights_dtype=bfloat16`` halves the HBM traffic of the weight banks
    (f32 accumulation regardless); the diagonal stays f32.

    ``bank_layouts``: "dual" stores each bank in both the g-major layout K1
    prefers and the r-major layout K2 needs — the fastest mode (K1 9.84
    ms/iter measured, experiments/exp_packed_k1.log); "pk" stores each bank
    packed [A*A, G] — the leanest device footprint (~6x under r-major) but a
    ~45% slower K1 (14.32 ms/iter measured); "rs" stores r-major only
    (memory-lean legacy fallback, slightly slower K1).
    """
    if bank_layouts not in ("pk", "dual", "rs"):
        raise ValueError(f"bank_layouts must be 'pk', 'dual' or 'rs': {bank_layouts}")
    codes = np.asarray(codes, np.int64)
    n_real, n = codes.shape
    a = int(alphabet_size)
    if n < 2:
        raise BlockStructureError("hypercube format needs n >= 2")
    g = a ** (n - 1)
    n_hyper = a**n
    itemsize = jnp.dtype(weights_dtype).itemsize
    padded = hypercube_bank_bytes(g, a, itemsize, bank_layouts)
    if padded > max_block_bytes:
        from protgram_directgcn_tpu.ops.block import BankBudgetError

        raise BankBudgetError(
            f"hypercube banks would occupy {padded} padded bytes on device"
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
    # Ship COO to the device and scatter there: the flat bank tables are
    # 2*G*A*A entries (hundreds of MB at 5-gram scale) while the COO triplets
    # are ~8 bytes/edge — a big win over the ~8 MB/s host->device tunnel.
    # A-pattern edge coords:  r = first[src], g = suffix key of src, c = last[tgt].
    # Aᵀ-pattern edge coords: r = first[tgt], g = prefix key of src,  c = last[src].
    def scatter_bank(flat, vals, shape):
        bank = (
            jnp.zeros(g * a * a, jnp.float32)
            .at[jnp.asarray(flat, jnp.int32)]
            .add(jnp.asarray(vals))
            .reshape(shape)
        )
        return bank.astype(weights_dtype)

    gm, rs, pkk = (g, a, a), (a, g, a), (a * a, g)
    dual = bank_layouts == "dual"
    if bank_layouts == "pk":
        # packed: bank[r*A + c, g]
        wf = scatter_bank((first[sf] * a + last[tf]) * g + sk[sf], vf, pkk)
        wb = scatter_bank((first[tb] * a + last[sb]) * g + pk[sb], vb, pkk)
    else:
        wf = scatter_bank((first[sf] * g + sk[sf]) * a + last[tf], vf, rs)
        wb = scatter_bank((first[tb] * g + pk[sb]) * a + last[sb], vb, rs)
    return HypercubeAdj(
        d=jnp.asarray(d.reshape(a, g)),
        wf_gm=scatter_bank((sk[sf] * a + last[tf]) * a + first[sf], vf, gm) if dual else None,
        wb_gm=scatter_bank((pk[sb] * a + last[sb]) * a + first[tb], vb, gm) if dual else None,
        wf_rs=wf,
        wb_rs=wb,
        node_map=jnp.asarray(hyper.astype(np.int32)),
    )


def hypercube_bank_bytes(g: int, a: int, itemsize: int, bank_layouts: str = "dual") -> int:
    """Padded device footprint of the weight banks (TPU tiles the last two
    dims: sublanes to 8 (4-byte) / 16 (2-byte), lanes to 128)."""
    sub = 16 if itemsize <= 2 else 8
    if bank_layouts == "pk":  # [A*A, G]: both dims pad to their tile only
        subs = ((a * a + sub - 1) // sub) * sub
        lanes = ((g + 127) // 128) * 128
        return 2 * subs * lanes * itemsize
    lanes = ((a + 127) // 128) * 128
    gm_pad = g * ((a + sub - 1) // sub) * sub * lanes * itemsize
    rs_pad = a * g * lanes * itemsize  # sublane dim g is effectively unpadded
    return 2 * rs_pad + (2 * gm_pad if bank_layouts == "dual" else 0)


def _tile_padded_bytes(shape: Tuple[int, ...], itemsize: int) -> int:
    """Device bytes of an array under TPU tiling: the last dim pads to a
    128-lane multiple, the second-to-last to the sublane tile (8 rows at
    4 bytes, 16 at 2, 32 at 1); leading dims are untiled."""
    if len(shape) == 1:
        shape = (1,) + tuple(shape)
    sub = {1: 32, 2: 16, 4: 8}.get(itemsize, 8)
    lead = 1
    for dim in shape[:-2]:
        lead *= dim
    subs = -(-shape[-2] // sub) * sub
    lanes = -(-shape[-1] // 128) * 128
    return lead * subs * lanes * itemsize


def hypercube_traffic_bytes(adj: HypercubeAdj, feat_dim: int, feat_itemsize: int = 2) -> int:
    """HBM bytes moved by ONE propagation (M x or Mᵀ x) of rg-layout
    features through the production two-kernel pipeline — the format's real
    traffic model, used by bench.py to compute an honest roofline fraction.

    Streams counted (see ops/pallas_hyper.py for the structure):
      K1:        read x_rg [A,G,F], read the K1 bank, write z_gc [G,A,F]
      relayout:  read z_gc, write z_rg [A,G,F]
      K2:        read d [A,G] f32, read the K2 bank, read z_rg, read x_flat
                 [N,F], read x_rg (diagonal), write out [A,G,F]
      relayout:  read x_rg, write x_flat
    All padded to real TPU tile sizes (the z_gc/gc-bank (·,A,·) middle dims
    are where padding dominates at odd A).
    """
    a, g = adj.d.shape
    n = a * g
    it = jnp.dtype(adj.wf_rs.dtype).itemsize
    fit = feat_itemsize
    rg = _tile_padded_bytes((a, g, feat_dim), fit)
    gc = _tile_padded_bytes((g, a, feat_dim), fit)
    flat = _tile_padded_bytes((n, feat_dim), fit)
    layout = adj.bank_layout
    if layout == "dual":
        bank1 = _tile_padded_bytes((g, a, a), it)  # g-major K1 bank
    elif layout == "pk":
        bank1 = _tile_padded_bytes((a * a, g), it)
    else:
        bank1 = _tile_padded_bytes((a, g, a), it)  # r-major
    bank2 = (
        _tile_padded_bytes((a * a, g), it)
        if layout == "pk"
        else _tile_padded_bytes((a, g, a), it)
    )
    diag = _tile_padded_bytes((a, g), 4)
    k1 = rg + bank1 + gc
    z_relayout = gc + rg
    k2 = diag + bank2 + rg + flat + rg + rg
    x_relayout = rg + flat
    return k1 + z_relayout + k2 + x_relayout


def embed_features(adj: HypercubeAdj, x_real: jnp.ndarray) -> jnp.ndarray:
    """Scatter real-node features into the hypercube layout (absent ids = 0)."""
    out = jnp.zeros((adj.n_out,) + x_real.shape[1:], x_real.dtype)
    return out.at[adj.node_map].set(x_real)


def extract_features(adj: HypercubeAdj, x_hyper: jnp.ndarray) -> jnp.ndarray:
    """Gather real-node rows back out of the hypercube layout."""
    if x_hyper.ndim == 3:  # kernel-native rg layout
        x_hyper = x_hyper.reshape((x_hyper.shape[0] * x_hyper.shape[1],) + x_hyper.shape[2:])
    return jnp.take(x_hyper, adj.node_map, axis=0)


# -----------------------------------------------------------------------------
# Propagation
# -----------------------------------------------------------------------------


def _einsum(spec, a, b):
    # f32 blocks demand full-precision MXU passes (TPU matmul defaults bf16).
    # bf16 operands keep bf16 OUTPUT (MXU still accumulates f32 in-register):
    # asking for an f32 result here materialises 2 GB per dot at 5-gram
    # scale — XLA schedules the convert after the gc->rg relayout, so the
    # f32 copy exists even when the caller casts immediately.
    prec = "highest" if a.dtype == jnp.float32 else "default"
    out_t = jnp.float32 if b.dtype == jnp.float32 else b.dtype
    return jnp.einsum(spec, a, b, precision=prec, preferred_element_type=out_t)


def _use_pallas() -> bool:
    knob = os.environ.get("PROTGRAM_HYPER_PALLAS", "auto")
    if knob in ("0", "off"):
        return False
    if knob in ("1", "on"):
        return True
    return jax.default_backend() == "tpu"


def _hyper_apply(d, w1, w2, x_rg, scale=1.0, shift=0.0, w_layout="gm"):
    """scale*(M x) + shift in rg layout, where ``w1`` is the A-pattern bank
    and ``w2`` the Aᵀ-pattern bank, in the layout ``w_layout`` names
    ("gm": w1 g-major/w2 r-major; "rs": both r-major; "pk": both packed
    [A*A, G]).  The affine epilogue is fused into the kernels' output cast
    (free).

    The transpose product Mᵀx is the same call with the banks' roles
    swapped (wb, wf): transposing M swaps the two edge patterns at
    identical (r, g, c) coordinates.
    """
    a, g = d.shape
    f = x_rg.shape[2]
    # 4-byte dtypes brush the VMEM ceiling at the mandatory 128-key blocks;
    # f32 propagation (small graphs / parity runs) stays on the einsum path.
    # pk kernels are TPU-validated at the production block sizes (gt=128):
    # exp_packed_k2.py's scoped-VMEM OOM was specific to its gt=256 blocks
    # (16.48M vs the 16M limit); at _pick_gt's 128 the full pk propagation
    # compiles and matches einsum exactly (experiments/exp_pk_pallas_r2.log)
    # — and the Pallas route keeps transients in VMEM, where the einsum
    # lowering materialises a ~1.1 GB g-major bank relayout + a ~1.1 GB x
    # relayout per call (the 5-gram training memory-wall driver).
    if _use_pallas() and g >= 128 and x_rg.dtype.itemsize == 2:
        from protgram_directgcn_tpu.ops import pallas_hyper

        # Pad the feature dim to a 128-lane multiple at the kernel boundary:
        # HBM tiles store the lane dim 128-padded anyway, so the padded
        # kernel moves the same bytes — but a 128-multiple F keeps the
        # in-register sublane split legal, so K2 reads x_flat directly and
        # the 1.5x-sublane-padded materialized gc view (the (128->64)-layer
        # OOM driver at 5-gram scale) never exists.  XLA fuses the pad into
        # the producer and the slice into the consumer.
        f_pad = -(-f // 128) * 128
        if f_pad != f:
            out = pallas_hyper.apply_hyper_pallas(
                d, w1, w2,
                jnp.pad(x_rg, ((0, 0), (0, 0), (0, f_pad - f))),
                scale=scale, shift=shift, w_layout=w_layout,
            )
            return out[..., :f]
        return pallas_hyper.apply_hyper_pallas(
            d, w1, w2, x_rg, scale=scale, shift=shift, w_layout=w_layout
        )
    x_gc = x_rg.reshape(g, a, f)  # order-preserving view of the same nodes
    if w_layout == "pk":
        # Contract the packed [r·A+c, g] banks in place: reshaping [A*A, G]
        # to [r, c, g] keeps G minor (no lane re-padding), and both einsums
        # index w[r, c, g] directly — an explicit (0, 2, 1) transpose to
        # r-major here would MATERIALISE a 6.1x-lane-padded copy per call
        # (~1 GB at 5-gram scale), defeating pk's reason to exist.
        w1 = w1.reshape(a, a, g)  # [r, c, g]
        w2 = w2.reshape(a, a, g)  # [r, c, g]
        spec1, spec2 = "rcg,rgf->gcf", "rcg,gcf->rgf"
    else:
        spec1 = "gcr,rgf->gcf" if w_layout == "gm" else "rgc,rgf->gcf"
        spec2 = "rgc,gcf->rgf"
    # bf16 carries round each dot in its own epilogue (precision-equivalent
    # to the Pallas pipeline's bf16 inter-kernel z — _einsum keeps the MXU's
    # f32 accumulation and only the STORED result is bf16).
    y1 = _einsum(spec1, w1, x_rg)  # A  pattern -> node order (g, c)
    y2 = _einsum(spec2, w2, x_gc)  # Aᵀ pattern -> node order (r, g)
    # Accumulate the 3-term sum in the carry dtype: an f32 accumulation
    # forces XLA to upcast the dot outputs in their epilogues — three f32
    # [A, G, F] buffers (~6 GB at 5-gram/F=128) in the OOM breakdown.
    acc_t = jnp.float32 if x_rg.dtype == jnp.float32 else x_rg.dtype
    out = d.astype(acc_t)[:, :, None] * x_rg + y1.reshape(a, g, f) + y2
    if scale != 1.0:
        out = out * scale
    if shift != 0.0:
        out = out + shift
    return out.astype(x_rg.dtype)


def _sddmm_hyper(d, grad, x_rg, scale, layout):
    """Gradients w.r.t. the diagonal and the two weight banks — the
    hypercube SDDMM: per-key [A x A] outer-product contractions (the
    sampled-product counterpart of the two propagation kernels).

    With ``out = scale * (D + K1(wf) + K2(wb)) x + shift``:
      dd[r, g]        = scale * <grad[r, g, :], x[r, g, :]>
      dwf[r, g, c]    = scale * <grad_gc[g, c, :], x_rg[r, g, :]>
      dwb[r, g, c]    = scale * <grad_rg[r, g, :], x_gc[g, c, :]>
    emitted in the bank layout the forward consumed ("gm" [G,A,A] (g,c,r);
    "rs" [A,G,A] (r,g,c); "pk" packed [A*A, G] (r*A+c, g)).  Dense over the
    bank tables: structural zeros (absent node pairs) receive gradient too —
    under this format the bank IS the parameter, so such entries mean
    "create an edge"; mask with the bank's sparsity pattern to forbid that.
    """
    a, g, f = x_rg.shape
    g32 = grad.astype(jnp.float32)
    x32 = x_rg.astype(jnp.float32)
    dd = jnp.sum(g32 * x32, axis=-1) * scale  # [A, G] f32 (d is always f32)
    grad_gc = g32.reshape(g, a, f)
    x_gc = x32.reshape(g, a, f)
    if layout == "gm":
        dwf = jnp.einsum("gcf,rgf->gcr", grad_gc, x32)
    elif layout == "pk":
        dwf = jnp.einsum("gcf,rgf->rcg", grad_gc, x32).reshape(a * a, g)
    else:  # rs
        dwf = jnp.einsum("gcf,rgf->rgc", grad_gc, x32)
    if layout == "pk":
        dwb = jnp.einsum("rgf,gcf->rcg", g32, x_gc).reshape(a * a, g)
    else:  # K2 consumes the r-major bank in both "gm" (dual) and "rs" modes
        dwb = jnp.einsum("rgf,gcf->rgc", g32, x_gc)
    return dd, dwf * scale, dwb * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _propagate_hyper_affine(layout, scale, shift, edge_grads, d, w1f, w1b, wf2, wb2, x):
    """w1f/w1b: the A-/Aᵀ-pattern K1 banks; wf2/wb2 the K2-side banks, all in
    the layout ``layout`` names (resolved by the caller so the lean modes
    never pass None leaves; in "rs"/"pk" the pairs are the same arrays).
    ``edge_grads`` (static) opts into the hypercube SDDMM backward."""
    return _hyper_apply(d, w1f, wb2, x, scale, shift, w_layout=layout)


def _propagate_hyper_affine_fwd(layout, scale, shift, edge_grads, d, w1f, w1b, wf2, wb2, x):
    out = _hyper_apply(d, w1f, wb2, x, scale, shift, w_layout=layout)
    res = (d, w1b, wf2) + ((x,) if edge_grads else ())
    return out, res


def _propagate_hyper_affine_bwd(layout, scale, shift, edge_grads, res, grad):
    d, w1b, wf2 = res[:3]
    # d(scale*Mx + shift)/dx applied to grad = scale * Mᵀ grad — the scale
    # rides the backward kernels' epilogue too.
    dx = _hyper_apply(d, w1b, wf2, grad, scale, 0.0, w_layout=layout)
    zeros = lambda ref: jnp.zeros_like(ref)  # noqa: E731 — graph is constant
    if len(res) == 4:  # ops.spmm.edge_gradients(): hypercube SDDMM
        x_rg = res[3]
        dd, dwf, dwb = _sddmm_hyper(d, grad, x_rg, scale, layout)
        # The forward product reads w1f (A pattern) and wb2 (Aᵀ pattern);
        # w1b/wf2 only drive the backward and get strict zeros.  In the
        # "rs"/"pk" modes w1f is wf2 and w1b is wb2 (aliased arrays), so
        # JAX's cotangent accumulation delivers exactly one dwf + one dwb
        # to the adjacency's two banks.
        return (
            dd.astype(d.dtype), dwf.astype(w1b.dtype), zeros(w1b),
            zeros(wf2), dwb.astype(wf2.dtype), dx,
        )
    return (zeros(d), zeros(w1b), zeros(w1b), zeros(wf2), zeros(wf2), dx)


_propagate_hyper_affine.defvjp(_propagate_hyper_affine_fwd, _propagate_hyper_affine_bwd)


def propagate_hyper(
    adj: HypercubeAdj, x: jnp.ndarray, edge_grads: bool = False
) -> jnp.ndarray:
    """out[i] = sum over edges (j -> i) of w * x[j], both in hypercube ids.

    ``x`` may be flat ``[A^n, F]`` (node order) or kernel-native rg layout
    ``[A, G, F]``; the output matches the input layout.  Keeping features in
    rg layout across propagations avoids a per-call relayout on TPU.
    """
    return propagate_hyper_affine(adj, x, 1.0, 0.0, edge_grads=edge_grads)


def propagate_hyper_transpose(adj: HypercubeAdj, x: jnp.ndarray) -> jnp.ndarray:
    """out[j] = sum over edges (j -> i) of w * x[i] — the transpose product
    Mᵀx, computed directly (the SAME two kernels with the banks' pattern
    roles swapped; module header).  For manual/host-driven backward passes
    that already hold the upstream cotangent — NOT meant to be
    differentiated itself (use :func:`propagate_hyper` under jax.vjp for
    that).  Layout contract as in :func:`propagate_hyper`."""
    a, g = adj.d.shape
    flat_in = x.ndim == 2
    x_rg = x.reshape(a, g, x.shape[-1]) if flat_in else x
    layout = adj.bank_layout
    gm = layout == "dual"
    # Transpose swaps the pattern roles: K1 consumes the Aᵀ bank, K2 the A
    # bank — exactly the pair the autodiff backward uses.
    w1 = adj.wb_gm if gm else adj.wb_rs
    w2 = adj.wf_rs
    out = _hyper_apply(adj.d, w1, w2, x_rg, 1.0, 0.0, w_layout="gm" if gm else layout)
    return out.reshape(a * g, -1) if flat_in else out


def propagate_hyper_affine(
    adj: HypercubeAdj, x: jnp.ndarray, scale: float, shift: float,
    edge_grads: bool = False,
) -> jnp.ndarray:
    """Fused ``scale*(M x) + shift`` — the affine epilogue rides the
    kernels' output cast for free (layers scale/bias right after
    propagation).  Layout contract as in :func:`propagate_hyper`."""
    a, g = adj.d.shape
    flat_in = x.ndim == 2
    x_rg = x.reshape(a, g, x.shape[-1]) if flat_in else x
    layout = adj.bank_layout
    gm = layout == "dual"
    w1f = adj.wf_gm if gm else adj.wf_rs
    w1b = adj.wb_gm if gm else adj.wb_rs
    out = _propagate_hyper_affine(
        "gm" if gm else layout, float(scale), float(shift), bool(edge_grads),
        adj.d, w1f, w1b, adj.wf_rs, adj.wb_rs, x_rg,
    )
    return out.reshape(a * g, -1) if flat_in else out
