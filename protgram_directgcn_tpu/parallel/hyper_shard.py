"""Multi-chip hypercube SpMM: shard the gather-free format along the key axis.

The single-chip hypercube pipeline (ops/hypercube.py, ops/pallas_hyper.py)
computes one propagation as

    K1 (A pattern, by suffix key g)  ->  z relayout (gc -> rg)
    K2 (Aᵀ pattern + diag + sum, by suffix key g, reading the gc view of x)

Sharding the rg feature layout ``[A, G, F]`` along **G** (the suffix-key
axis) makes BOTH kernels fully local: K1 contracts within one g, K2's bank
slab and outputs are g-local.  The only non-local data movement is exactly
the two relayouts — and under G-sharding each is a **regular all-to-all**:

- the gc view block for shard d (rows ``q*A + c`` for local prefix keys q)
  is the contiguous flat range [d*Gd*A, (d+1)*Gd*A) of node ids, whose rg
  owners are ``(id % G) // Gd`` — at most A contiguous runs per peer pair;
- the z relayout is the same pattern in reverse.

So one propagation = all_to_all(x) ‖ local K1 -> all_to_all(z) -> local K2,
with per-device exchange volume ~N/D rows per relayout (the same bytes the
single-chip relayout moves through HBM, now riding ICI).  Per-shard compute
is the single-chip kernel math over G/D keys.  Exchange tables are
precomputed host-side and depend only on (A, G, D) — all three propagation
matrices share them.

No reference counterpart (the reference is single-device, SURVEY.md §2.3);
this is the north-star edge-partitioned execution of the flagship format.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protgram_directgcn_tpu.ops.block import BlockStructureError
from protgram_directgcn_tpu.parallel.halo import current_mesh


@struct.dataclass
class HyperShardTables:
    """Exchange tables for the two relayouts (shared by all matrices)."""

    # x exchange: rg-sharded x -> per-shard contiguous gc block.
    send_gc: jnp.ndarray  # [D, D, S] int32 local flat (r*Gd+gl) rows to send
    asm_gc: jnp.ndarray  # [D, Gd*A] int32 into [D*S (+1 zero slot)] recv rows
    # z exchange: per-shard contiguous gc block -> rg-sharded z.
    send_rg: jnp.ndarray  # [D, D, S2] int32 positions within the local block
    asm_rg: jnp.ndarray  # [D, A*Gd] int32 into [D*S2 (+1 zero slot)]


@struct.dataclass
class HyperShardAdj:
    """One propagation matrix in the G-sharded hypercube format.

    Arrays are stacked on a leading device axis [D, ...]; propagation runs
    under ``parallel.halo.active_mesh`` via shard_map.
    """

    d: jnp.ndarray  # [D, A, Gd] f32 diagonal slabs
    wf: jnp.ndarray  # [D, A, Gd, A] r-major A-pattern bank slabs
    wb: jnp.ndarray  # [D, A, Gd, A] r-major Aᵀ-pattern bank slabs
    tables: HyperShardTables
    node_map: jnp.ndarray  # [N_real] int32: r*(D*Gd) + g flat padded id
    axis: str = struct.field(pytree_node=False, default="nodes")

    @property
    def num_shards(self) -> int:
        return self.d.shape[0]

    @property
    def alphabet(self) -> int:
        return self.d.shape[1]

    @property
    def g_padded(self) -> int:
        return self.d.shape[0] * self.d.shape[2]

    @property
    def n_out(self) -> int:
        return self.alphabet * self.g_padded

    @property
    def feature_shape(self) -> Tuple[int, int]:
        """Leading dims of the kernel-native rg feature layout [A, G_pad]."""
        return (self.alphabet, self.g_padded)


def build_hyper_shard_tables(a: int, g: int, num_shards: int) -> HyperShardTables:
    """Host-side exchange tables for (A, G, D).  Real ids only — the padded
    key slots (g >= G on the last shard) never move."""
    d_count = num_shards
    gd = -(-g // d_count)
    n = a * g

    m = np.arange(n, dtype=np.int64)
    rg_owner = (m % g) // gd  # owner in the rg (suffix-key) sharding
    gc_owner = np.minimum(m // (gd * a), d_count - 1)  # owner of the gc block
    r = m // g
    gl = (m % g) - rg_owner * gd
    local_flat = (r * gd + gl).astype(np.int64)  # position in owner's [A*Gd] x
    block_pos = (m - gc_owner * (gd * a)).astype(np.int64)  # position in gc block

    # --- x exchange: src = rg owner, dst = gc-block owner.
    send_gc_lists = [[None] * d_count for _ in range(d_count)]
    for dst in range(d_count):
        in_dst = gc_owner == dst
        for src in range(d_count):
            sel = in_dst & (rg_owner == src)
            send_gc_lists[src][dst] = (local_flat[sel], block_pos[sel])
    s1 = max(1, max(len(v[0]) for row in send_gc_lists for v in row))
    send_gc = np.zeros((d_count, d_count, s1), np.int32)
    asm_gc = np.full((d_count, gd * a), d_count * s1, np.int32)  # default: zero slot
    for src in range(d_count):
        for dst in range(d_count):
            rows, pos = send_gc_lists[src][dst]
            send_gc[src, dst, : len(rows)] = rows
            # After all_to_all at dst, chunk src occupies [src*s1, src*s1+S).
            asm_gc[dst, pos] = (src * s1 + np.arange(len(rows))).astype(np.int32)

    # --- z exchange: src = gc-block owner, dst = rg owner (the inverse).
    send_rg_lists = [[None] * d_count for _ in range(d_count)]
    for dst in range(d_count):
        in_dst = rg_owner == dst
        for src in range(d_count):
            sel = in_dst & (gc_owner == src)
            send_rg_lists[src][dst] = (block_pos[sel], local_flat[sel])
    s2 = max(1, max(len(v[0]) for row in send_rg_lists for v in row))
    send_rg = np.zeros((d_count, d_count, s2), np.int32)
    asm_rg = np.full((d_count, a * gd), d_count * s2, np.int32)
    for src in range(d_count):
        for dst in range(d_count):
            pos, lflat = send_rg_lists[src][dst]
            send_rg[src, dst, : len(pos)] = pos
            asm_rg[dst, lflat] = (src * s2 + np.arange(len(pos))).astype(np.int32)

    return HyperShardTables(
        send_gc=jnp.asarray(send_gc), asm_gc=jnp.asarray(asm_gc),
        send_rg=jnp.asarray(send_rg), asm_rg=jnp.asarray(asm_rg),
    )


def build_hyper_shard(
    src: np.ndarray,
    tgt: np.ndarray,
    val: np.ndarray,
    codes: np.ndarray,
    alphabet_size: int,
    num_shards: int,
    weights_dtype=jnp.float32,
    tables: Optional[HyperShardTables] = None,
) -> HyperShardAdj:
    """Factor a coalesced COO matrix into G-sharded hypercube slabs.

    Same edge-pattern factorisation as ops.hypercube.build_hypercube
    (A pattern / Aᵀ pattern / diagonal); raises BlockStructureError when an
    edge fits neither pattern.  The key axis pads to ``D * ceil(G/D)`` —
    padded keys are zero bank rows/diagonal and never exchanged.
    """
    codes = np.asarray(codes, np.int64)
    n_real, n = codes.shape
    a = int(alphabet_size)
    if n < 2:
        raise BlockStructureError("hypercube format needs n >= 2")
    g = a ** (n - 1)
    d_count = int(num_shards)
    gd = -(-g // d_count)
    gp = gd * d_count

    pows = a ** np.arange(n - 1, -1, -1, dtype=np.int64)
    hyper = codes @ pows
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    val = np.asarray(val, np.float32)

    pk = hyper // a
    sk = hyper % g
    first = codes[:, 0]
    last = codes[:, -1]

    diag = src == tgt
    d_full = np.zeros(a * g, np.float32)
    np.add.at(d_full, hyper[src[diag]], val[diag])

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

    # r-major [A, G_pad, A] banks, then split to per-shard slabs.
    def bank(r_ids, g_ids, c_ids, vals):
        flat = np.zeros(a * gp * a, np.float32)
        np.add.at(flat, (r_ids * gp + g_ids) * a + c_ids, vals)
        slab = flat.reshape(a, d_count, gd, a).transpose(1, 0, 2, 3)
        return jnp.asarray(slab).astype(weights_dtype)

    # A-pattern coords:  r = first[src], g = suffix key of src, c = last[tgt].
    wf = bank(first[sf], sk[sf], last[tf], vf)
    # Aᵀ-pattern coords: r = first[tgt], g = prefix key of src, c = last[src].
    wb = bank(first[tb], pk[sb], last[sb], vb)

    d_slab = np.zeros((a, gp), np.float32)
    d_slab[:, :g] = d_full.reshape(a, g)
    d_slab = d_slab.reshape(a, d_count, gd).transpose(1, 0, 2)

    if tables is None:
        tables = build_hyper_shard_tables(a, g, d_count)

    node_map = (hyper // g) * gp + (hyper % g)  # padded-stride flat id
    return HyperShardAdj(
        d=jnp.asarray(d_slab),
        wf=wf,
        wb=wb,
        tables=tables,
        node_map=jnp.asarray(node_map.astype(np.int32)),
    )


def _local_apply(d_loc, w1, w2, x_loc, x_gc_flat, z_gc_to_rg, scale, shift):
    """Single-shard two-pattern apply with an explicit gc-view input and a
    caller-supplied z relayout (the cross-shard exchange).

    d_loc [A, Gd]; w1/w2 [A, Gd, A] r-major; x_loc [A, Gd, F];
    x_gc_flat [Gd*A, F] (this shard's contiguous gc block of the features).

    Scheduling (VERDICT r3 weak #2): the z all-to-all is ISSUED right after
    K1 and only CONSUMED after K2's local terms (y2 + diagonal) — those have
    no data dependence on it, so on TPU the async collective rides ICI
    behind the local einsums instead of serializing between K1 and K2.
    """
    a, gd, f = x_loc.shape
    prec = "highest" if x_loc.dtype == jnp.float32 else "default"
    ein = functools.partial(jnp.einsum, precision=prec, preferred_element_type=jnp.float32)
    # K1 (A pattern): z for LOCAL suffix keys, landing in the gc block.
    z_gc = ein("rgc,rgf->gcf", w1, x_loc)  # [Gd, A, F] f32
    z_finish = z_gc_to_rg(z_gc.reshape(gd * a, f))  # collective issued here
    # K2 (Aᵀ pattern + diagonal + sum) — independent local work that the
    # in-flight z exchange overlaps.
    x_gc = x_gc_flat.reshape(gd, a, f)
    y2 = ein("rgc,gcf->rgf", w2, x_gc)  # [A, Gd, F] f32
    local = y2 + d_loc[:, :, None] * x_loc.astype(jnp.float32)
    z_rg = z_finish()  # assemble (consume) only now
    out = z_rg.reshape(a, gd, f) + local
    if scale != 1.0:
        out = out * scale
    if shift != 0.0:
        out = out + shift
    return out.astype(x_loc.dtype)


def _wire_dtype(rows_dtype):
    """Collective wire format (VERDICT r4 #3: halve all-to-all bytes).

    PROTGRAM_HS_WIRE: "auto" (default) keeps the feature dtype — under bf16
    compute the wire is already bf16; "bf16" forces f32 features onto a bf16
    wire (matches the single-chip kernels' bf16 inter-kernel z precision);
    "off" never casts."""
    import os

    knob = os.environ.get("PROTGRAM_HS_WIRE", "auto")
    if knob == "bf16" and rows_dtype.itemsize > 2:
        return jnp.bfloat16
    return None


def _exchange_start(send_idx, rows, axis, d_count):
    """Issue one padded all_to_all: gather per-peer rows and exchange.
    ``rows`` [L, F]; returns the raw [D, S, F] receive buffer."""
    s = send_idx.shape[1]
    f = rows.shape[1]
    wd = _wire_dtype(rows.dtype)
    if wd is not None:
        rows = rows.astype(wd)
    send_buf = jnp.take(rows, send_idx.reshape(-1), axis=0).reshape(d_count, s, f)
    return _a2a(send_buf, axis)


def _a2a(send_buf, axis):
    """The collective itself — PROTGRAM_HS_NOCOMM=1 replaces it with identity
    (wrong data, identical local work/shapes) so scaling harnesses can
    measure the compute-only curve and attribute the gap to the wire."""
    import os

    if os.environ.get("PROTGRAM_HS_NOCOMM") == "1":
        return send_buf
    return jax.lax.all_to_all(send_buf, axis, split_axis=0, concat_axis=0, tiled=False)


def _exchange_finish(asm_idx, recv):
    """Assemble the received chunks into destination row order (missing
    slots -> zeros via the one-past-the-end zero slot)."""
    d_count, s, f = recv.shape
    recv_flat = jnp.concatenate(
        [recv.reshape(d_count * s, f), jnp.zeros((1, f), recv.dtype)], axis=0
    )
    return jnp.take(recv_flat, asm_idx, axis=0)


def _exchange(send_idx, asm_idx, rows, axis, d_count):
    """Gather per-peer rows, exchange, assemble (start + finish fused)."""
    return _exchange_finish(asm_idx, _exchange_start(send_idx, rows, axis, d_count))


def hyper_shard_propagate(
    adj: HyperShardAdj, x: jnp.ndarray, mesh: Mesh, transpose: bool = False,
    scale: float = 1.0, shift: float = 0.0,
) -> jnp.ndarray:
    """One propagation (or Mᵀx with ``transpose``) of rg-layout features
    ``[A, G_pad, F]`` sharded along the key axis."""
    axis = adj.axis
    d_count = adj.num_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis, None, None),  # d slabs
            P(axis, None, None, None),  # w1 slabs
            P(axis, None, None, None),  # w2 slabs
            P(axis, None, None), P(axis, None),  # x tables
            P(axis, None, None), P(axis, None),  # z tables
            P(None, axis, None),  # x (sharded on the G axis)
        ),
        out_specs=P(None, axis, None),
    )
    def _run(d_slab, w1, w2, send_gc, asm_gc, send_rg, asm_rg, x_loc):
        d_loc, w1, w2 = d_slab[0], w1[0], w2[0]
        send_gc, asm_gc = send_gc[0], asm_gc[0]
        send_rg, asm_rg = send_rg[0], asm_rg[0]
        a, gd, f = x_loc.shape
        # 1. Launch the x exchange (feeds K2's gc view) FIRST: K1 below has
        # no dependence on it, so the collective overlaps local compute.
        x_gc_flat = _exchange(send_gc, asm_gc, x_loc.reshape(a * gd, f), axis, d_count)

        def z_to_rg(z_flat):
            # Issue now; hand back a thunk so _local_apply can schedule the
            # consume after its independent local terms.
            recv = _exchange_start(send_rg, z_flat, axis, d_count)
            return lambda: _exchange_finish(asm_rg, recv)

        return _local_apply(d_loc, w1, w2, x_loc, x_gc_flat, z_to_rg, scale, shift)

    w1, w2 = (adj.wb, adj.wf) if transpose else (adj.wf, adj.wb)
    t = adj.tables
    return _run(adj.d, w1, w2, t.send_gc, t.asm_gc, t.send_rg, t.asm_rg, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _hyper_shard_cv(scale, shift, d, wf, wb, tables, x):
    adj = HyperShardAdj(d=d, wf=wf, wb=wb, tables=tables, node_map=None)
    return hyper_shard_propagate(adj, x, current_mesh(), False, scale, shift)


def _hyper_shard_cv_fwd(scale, shift, d, wf, wb, tables, x):
    return _hyper_shard_cv(scale, shift, d, wf, wb, tables, x), (d, wf, wb, tables)


def _hyper_shard_cv_bwd(scale, shift, res, g):
    d, wf, wb, tables = res
    adj = HyperShardAdj(d=d, wf=wf, wb=wb, tables=tables, node_map=None)
    # d(scale*Mx+shift)/dx · g = scale * Mᵀ g.
    dx = hyper_shard_propagate(adj, g, current_mesh(), True, scale, 0.0)
    zeros = lambda ref: jax.tree_util.tree_map(  # noqa: E731
        lambda t: np.zeros(t.shape, dtype=jax.dtypes.float0)
        if jnp.issubdtype(t.dtype, jnp.integer)
        else jnp.zeros_like(t),
        ref,
    )
    return (zeros(d), zeros(wf), zeros(wb), zeros(tables), dx)


_hyper_shard_cv.defvjp(_hyper_shard_cv_fwd, _hyper_shard_cv_bwd)


def propagate_hyper_shard(
    adj: HyperShardAdj, x: jnp.ndarray, scale: float = 1.0, shift: float = 0.0
) -> jnp.ndarray:
    """out[i] = sum over edges (j -> i) of w * x[j] in padded flat ids.

    ``x`` may be flat [A*G_pad, F] or rg [A, G_pad, F]; output matches."""
    a, gp = adj.feature_shape
    flat_in = x.ndim == 2
    x_rg = x.reshape(a, gp, x.shape[-1]) if flat_in else x
    out = _hyper_shard_cv(
        float(scale), float(shift), adj.d, adj.wf, adj.wb, adj.tables, x_rg
    )
    return out.reshape(a * gp, -1) if flat_in else out


@struct.dataclass
class HyperShardTri:
    """Layer-level distributed operator: the three propagation matrices of a
    DirectGCN layer with BATCHED exchanges — the per-peer chunks of all
    three feature sets ride ONE all_to_all per relayout (so one collective
    pair per layer direction instead of three), exactly the trick the halo
    path's TriHaloAdj applies.  Exchange tables are shared by construction
    (they depend only on (A, G, D)).  Consumed by ops.spmm.propagate3 via
    ``DeviceGraph.tri``; the custom VJP runs the same batched op with the
    banks' pattern roles swapped."""

    adjs: Tuple[HyperShardAdj, HyperShardAdj, HyperShardAdj]  # (in, out, und)

    @property
    def axis(self) -> str:
        return self.adjs[0].axis


def _exchange3_start(send_idx, rows3, axis, d_count):
    """Issue ONE all_to_all carrying the per-peer chunks of three feature
    sets (concatenated on the chunk axis)."""
    s = send_idx.shape[1]
    f = rows3[0].shape[1]
    wd = _wire_dtype(rows3[0].dtype)
    bufs = [
        jnp.take(r.astype(wd) if wd is not None else r,
                 send_idx.reshape(-1), axis=0).reshape(d_count, s, f)
        for r in rows3
    ]
    send = jnp.concatenate(bufs, axis=1)  # [D, 3S, F]
    return _a2a(send, axis)


def _exchange3_finish(asm_idx, recv, i):
    """Assemble matrix i's rows out of the batched receive buffer."""
    d_count, s3, f = recv.shape
    s = s3 // 3
    return _exchange_finish(asm_idx, recv[:, i * s: (i + 1) * s, :])


def hyper_shard_tri_propagate(
    tri: HyperShardTri, xs, mesh: Mesh, transpose: bool = False
):
    """Batched-exchange propagation of three rg-layout feature sets through
    the layer's three matrices: (P_in x0, P_out x1, P_und x2)."""
    axis = tri.axis
    a0 = tri.adjs[0]
    d_count = a0.num_shards
    t = a0.tables
    banks = [
        ((adj.wb, adj.wf) if transpose else (adj.wf, adj.wb)) for adj in tri.adjs
    ]

    in_specs = (
        [P(axis, None, None)] * 3  # d slabs
        + [P(axis, None, None, None)] * 6  # w1/w2 slabs
        + [P(axis, None, None), P(axis, None)]  # x tables
        + [P(axis, None, None), P(axis, None)]  # z tables
        + [P(None, axis, None)] * 3  # xs
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, axis, None),) * 3,
    )
    def _run(d0, d1, d2, w10, w20, w11, w21, w12, w22,
             send_gc, asm_gc, send_rg, asm_rg, x0, x1, x2):
        ds = [d0[0], d1[0], d2[0]]
        w1s = [w10[0], w11[0], w12[0]]
        w2s = [w20[0], w21[0], w22[0]]
        send_gc, asm_gc = send_gc[0], asm_gc[0]
        send_rg, asm_rg = send_rg[0], asm_rg[0]
        xs_loc = [x0, x1, x2]
        a, gd, f = x0.shape
        prec = "highest" if x0.dtype == jnp.float32 else "default"
        ein = functools.partial(
            jnp.einsum, precision=prec, preferred_element_type=jnp.float32
        )
        # ONE x exchange for all three matrices (issued before any K1).
        recv_x = _exchange3_start(
            send_gc, [x.reshape(a * gd, f) for x in xs_loc], axis, d_count
        )
        # Local K1s.
        zs = [ein("rgc,rgf->gcf", w1, x) for w1, x in zip(w1s, xs_loc)]
        # ONE z exchange (issued before K2's local terms, consumed after).
        recv_z = _exchange3_start(
            send_rg, [z.reshape(gd * a, f) for z in zs], axis, d_count
        )
        outs = []
        for i in range(3):
            x_gc = _exchange3_finish(asm_gc, recv_x, i).reshape(gd, a, f)
            y2 = ein("rgc,gcf->rgf", w2s[i], x_gc)
            local = y2 + ds[i][:, :, None] * xs_loc[i].astype(jnp.float32)
            z_rg = _exchange3_finish(asm_rg, recv_z, i)
            outs.append((z_rg.reshape(a, gd, f) + local).astype(xs_loc[i].dtype))
        return tuple(outs)

    args = []
    for adj in tri.adjs:
        args.append(adj.d)
    for (w1, w2) in banks:
        args.extend([w1, w2])
    args.extend([t.send_gc, t.asm_gc, t.send_rg, t.asm_rg])
    args.extend(list(xs))
    return _run(*args)


@jax.custom_vjp
def _hyper_tri_cv(tri, x0, x1, x2):
    return hyper_shard_tri_propagate(tri, (x0, x1, x2), current_mesh(), False)


def _hyper_tri_cv_fwd(tri, x0, x1, x2):
    return _hyper_tri_cv(tri, x0, x1, x2), (tri,)


def _hyper_tri_cv_bwd(res, gs):
    (tri,) = res
    dxs = hyper_shard_tri_propagate(tri, gs, current_mesh(), True)
    zero = lambda p: jax.tree_util.tree_map(  # noqa: E731
        lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        p,
    )
    return (zero(tri),) + tuple(dxs)


_hyper_tri_cv.defvjp(_hyper_tri_cv_fwd, _hyper_tri_cv_bwd)


def propagate_hyper_shard_tri(tri: HyperShardTri, x_in, x_out, x_und):
    """propagate3 contract: (P_in x_in, P_out x_out, P_und x_und) with one
    batched exchange pair per direction."""
    return _hyper_tri_cv(tri, x_in, x_out, x_und)


def shard_hyper_features(x, mesh: Mesh, axis: str = "nodes"):
    """Place an rg-layout [A, G_pad, F] feature array with its G axis on the
    mesh's node dimension."""
    return jax.device_put(x, NamedSharding(mesh, P(None, axis, None)))
