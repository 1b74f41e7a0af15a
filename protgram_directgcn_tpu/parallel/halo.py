"""Edge-partitioned propagation with explicit halo exchange (shard_map).

The BASELINE north-star distributed design: nodes are block-partitioned
across the "nodes" mesh axis (contiguous sorted-vocab ranges → cheap
ownership tests and prefix locality), and each propagation splits into

- a **local** part: edges whose source is owned by the same device,
- a **halo** part: edges whose source lives on a peer device.

Boundary source features are exchanged as a RING of per-step ``ppermute``
collectives — step k moves each device's chunk to peer (d+k)%D.  SPMD
requires one static chunk size per step (the same trace runs on every
device), but sizes vary freely ACROSS steps: each step is padded only to
its own max over devices, not to the global max over all (device, peer)
pairs.  The r2 design's single ``all_to_all`` padded every pair to the one
global s_max — an O(D²·s_max) buffer that resent row-0 features for every
padded slot and capped adversarial weak-scaling retention at 0.74 (VERDICT
r2 item #4); the ring plan's buffer is Σ_k max_d s[d,k], which degrades
only the one step a skewed pair lives on.  The per-step permutes have no
data dependencies, so XLA overlaps them with each other and with the local
aggregation issued before the halo aggregation consumes the buffer.

Host-side, `build_halo_partition` precomputes per-device padded arrays:
local/halo ELL tables (halo indices pre-remapped into the concatenated
receive-buffer coordinate space) and per-step send index lists.  This
mirrors how the reference keeps per-node state indexable under partitioning
via ``original_indices`` (reference: protgram_directgcn_trainer.py:179-197)
— ownership is by contiguous range, so original ids are recovered by adding
the range offset.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P


@struct.dataclass
class HaloPartition:
    """Per-device padded arrays, stacked on axis 0 (= device)."""

    # Local edges: sources are local row indices.
    local_idx: jnp.ndarray  # [D, Nd, Kl] int32
    local_w: jnp.ndarray  # [D, Nd, Kl] f32
    # Halo edges: sources index the concatenated ring receive buffer.
    halo_idx: jnp.ndarray  # [D, Nd, Kh] int32
    halo_w: jnp.ndarray  # [D, Nd, Kh] f32
    # Ring-exchange plan: entry k-1 is [D, s_k] int32 — the local rows
    # device d sends to peer (d + k) % D at step k.  Sizes s_k vary per
    # step (each padded to its own max over devices only).
    send_steps: Tuple[jnp.ndarray, ...]
    num_shards: int = struct.field(pytree_node=False, default=1)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    rows_per_shard: int = struct.field(pytree_node=False, default=0)
    # Debug: assert per-step checksums of the exchanged boundary features
    # (SURVEY §5.2 — the TPU equivalent of the reference's determinism
    # tooling, gnn_benchmarker.py:41-52).  The checksums ride tiny extra
    # permutes and are compared against the received chunks host-side.
    debug_checksums: bool = struct.field(pytree_node=False, default=False)


def _ring_plan(recv_sets, nd: int, num_shards: int):
    """(send_steps, buf_offset) for the per-step ring exchange.

    ``recv_sets[d][p]``: sorted global ids device d needs from peer p.  At
    ring step k, device q sends to d=(q+k)%D the set recv_sets[d][q]; the
    step's chunk is padded to s_k = max_d |recv_sets[d][(d-k)%D]| — per-step
    max only.  Device d's receive buffer is the concatenation over k of the
    step-k chunk; ``buf_offset[k]`` is its row offset."""
    send_steps = []
    offsets = [0] * (num_shards + 1)
    for k in range(1, num_shards):
        s_k = max(
            1,
            max(len(recv_sets[d][(d - k) % num_shards]) for d in range(num_shards)),
        )
        step = np.zeros((num_shards, s_k), np.int32)
        for q in range(num_shards):
            need = recv_sets[(q + k) % num_shards][q]  # owned by q
            step[q, : len(need)] = (need - q * nd).astype(np.int32)
        send_steps.append(step)
        offsets[k] = offsets[k - 1] + s_k if k > 1 else 0
    # offsets[k] = start row of step-k chunk (k >= 1)
    off = {}
    acc = 0
    for k in range(1, num_shards):
        off[k] = acc
        acc += send_steps[k - 1].shape[1]
    return send_steps, off


def build_halo_partition(
    src: np.ndarray, tgt: np.ndarray, w: np.ndarray, num_nodes: int, num_shards: int,
    debug_checksums: bool = False,
) -> HaloPartition:
    """Precompute the partitioned halo-exchange layout (host side)."""
    nd = -(-num_nodes // num_shards)  # padded rows per shard
    src = np.asarray(src, np.int64)
    tgt = np.asarray(tgt, np.int64)
    w = np.asarray(w, np.float32)
    owner_t = np.minimum(tgt // nd, num_shards - 1)
    owner_s = np.minimum(src // nd, num_shards - 1)

    local_rows, local_srcs, local_ws = [], [], []
    halo_rows, halo_peers, halo_gsrcs, halo_ws = [], [], [], []

    # Per-device recv sets: unique remote sources needed from each peer.
    recv_sets = [[np.empty(0, np.int64)] * num_shards for _ in range(num_shards)]
    for d in range(num_shards):
        mask_d = owner_t == d
        is_local = owner_s[mask_d] == d
        local_rows.append(tgt[mask_d][is_local] - d * nd)
        local_srcs.append(src[mask_d][is_local] - d * nd)
        local_ws.append(w[mask_d][is_local])
        halo_rows.append(tgt[mask_d][~is_local] - d * nd)
        halo_peers.append(owner_s[mask_d][~is_local])
        halo_gsrcs.append(src[mask_d][~is_local])
        halo_ws.append(w[mask_d][~is_local])
        for p in range(num_shards):
            sel = halo_peers[d] == p
            recv_sets[d][p] = np.unique(halo_gsrcs[d][sel])

    send_steps, buf_off = _ring_plan(recv_sets, nd, num_shards)

    # Remap halo sources into receive-buffer coordinates: device d's buffer
    # concatenates the per-step chunks; the chunk from peer p lands at step
    # k = (d - p) % D with row offset buf_off[k].
    def ell_pack(rows, cols, ws, n_rows, pad=4):
        from protgram_directgcn_tpu.ops.spmm import _ell_one_sided

        return _ell_one_sided(cols, rows, ws, n_rows, pad_multiple=pad)

    l_idx, l_w, h_idx, h_w = [], [], [], []
    for d in range(num_shards):
        li, lw = ell_pack(local_rows[d], local_srcs[d], local_ws[d], nd)
        buf_coords = np.zeros(len(halo_gsrcs[d]), np.int64)
        for p in range(num_shards):
            sel = halo_peers[d] == p
            if sel.any():
                pos = np.searchsorted(recv_sets[d][p], halo_gsrcs[d][sel])
                buf_coords[sel] = buf_off[(d - p) % num_shards] + pos
        hi, hw = ell_pack(halo_rows[d], buf_coords, halo_ws[d], nd)
        l_idx.append(li)
        l_w.append(lw)
        h_idx.append(hi)
        h_w.append(hw)

    def stack_pad(mats):
        k = max(m.shape[1] for m in mats)
        return np.stack([np.pad(m, ((0, 0), (0, k - m.shape[1]))) for m in mats])

    return HaloPartition(
        local_idx=jnp.asarray(stack_pad(l_idx).astype(np.int32)),
        local_w=jnp.asarray(stack_pad(l_w).astype(np.float32)),
        halo_idx=jnp.asarray(stack_pad(h_idx).astype(np.int32)),
        halo_w=jnp.asarray(stack_pad(h_w).astype(np.float32)),
        send_steps=tuple(jnp.asarray(s) for s in send_steps),
        num_shards=int(num_shards),
        num_nodes=int(num_nodes),
        rows_per_shard=int(nd),
        debug_checksums=bool(debug_checksums),
    )


def _assert_checksums(expected, got):
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), rtol=1e-5, atol=1e-6,
        err_msg="halo exchange checksum mismatch (corrupted boundary features)",
    )


def _ell_block(idx, w, table):
    """out[i] = sum_k w[i,k] * table[idx[i,k]] (small static K loop)."""
    acc = jnp.zeros((idx.shape[0], table.shape[1]), dtype=table.dtype)
    k = idx.shape[1]
    chunk = 8
    for start in range(0, k, chunk):
        ic = idx[:, start : start + chunk]
        wc = w[:, start : start + chunk]
        acc = acc + jnp.einsum("nc,ncf->nf", wc, jnp.take(table, ic, axis=0))
    return acc


def _ring_exchange(x_local, send_steps, axis: str, d_count: int, debug_checksums: bool):
    """Run the per-step ring permutes; returns the concatenated receive
    buffer [Σ_k s_k, F] (a zeros row when there are no peers).

    The k permutes have no data dependencies: XLA issues them concurrently
    and the latency-hiding scheduler overlaps them with whatever local
    compute the caller schedules before consuming the buffer."""
    chunks = []
    for k, sidx in enumerate(send_steps, start=1):
        chunk = jnp.take(x_local, sidx[0], axis=0)  # [s_k, F]
        perm = [(j, (j + k) % d_count) for j in range(d_count)]
        recv = jax.lax.ppermute(chunk, axis, perm)
        if debug_checksums:
            # Checksum rides the same permutation: bit-exact transport gives
            # identical same-shape reductions on both ends.
            expect = jax.lax.ppermute(
                jnp.sum(chunk.astype(jnp.float32))[None], axis, perm
            )
            got = jnp.sum(recv.astype(jnp.float32))[None]
            jax.debug.callback(_assert_checksums, expect, got)
        chunks.append(recv)
    if not chunks:
        return jnp.zeros((1, x_local.shape[1]), x_local.dtype)
    return jnp.concatenate(chunks, axis=0)


def halo_propagate(part: HaloPartition, x: jnp.ndarray, mesh: Mesh, axis: str = "nodes") -> jnp.ndarray:
    """Distributed propagation: ring halo exchange overlapped with local
    aggregation.  x: [num_shards*rows_per_shard, F] sharded on axis."""
    d = mesh.shape[axis]
    n_steps = len(part.send_steps)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(axis, None, None), P(axis, None, None),  # local idx/w
            P(axis, None, None), P(axis, None, None),  # halo idx/w
            tuple(P(axis, None) for _ in range(n_steps)),  # ring send plan
            P(axis, None),  # x
        ),
        out_specs=P(axis, None),
    )
    def _run(l_idx, l_w, h_idx, h_w, send_steps, x_local):
        l_idx, l_w = l_idx[0], l_w[0]
        h_idx, h_w = h_idx[0], h_w[0]
        # 1. Launch the ring exchange (issued first so it overlaps step 2).
        recv_flat = _ring_exchange(x_local, send_steps, axis, d, part.debug_checksums)
        # 2. Local aggregation (no dependence on recv → overlaps the permutes).
        out = _ell_block(l_idx, l_w, x_local)
        # 3. Halo aggregation from the receive buffer.
        out = out + _ell_block(h_idx, h_w, recv_flat)
        return out

    return _run(part.local_idx, part.local_w, part.halo_idx, part.halo_w, part.send_steps, x)


def pad_node_features(x: np.ndarray, part: HaloPartition) -> np.ndarray:
    """Pad [N, F] features to num_shards*rows_per_shard rows."""
    total = part.num_shards * part.rows_per_shard
    if x.shape[0] < total:
        x = np.pad(x, ((0, total - x.shape[0]), (0, 0)))
    return x


# ----------------------------------------------------------------------------
# Pluggable adjacency: lets the DirectGCN model run distributed unchanged.
# ----------------------------------------------------------------------------

import contextlib
import threading

_MESH_CTX = threading.local()


@contextlib.contextmanager
def active_mesh(mesh: Mesh):
    """Make `mesh` the ambient mesh for HaloAdj propagation."""
    prev = getattr(_MESH_CTX, "mesh", None)
    _MESH_CTX.mesh = mesh
    try:
        with mesh:
            yield
    finally:
        _MESH_CTX.mesh = prev


def current_mesh() -> Mesh:
    mesh = getattr(_MESH_CTX, "mesh", None)
    if mesh is None:
        raise RuntimeError("HaloAdj propagation requires an `active_mesh(mesh)` context")
    return mesh


@struct.dataclass
class HaloAdj:
    """Adjacency variant whose propagation is the distributed halo exchange.

    Drop-in for ops.spmm formats inside a DeviceGraph: the DirectGCN model
    calls ``ops.spmm.propagate`` which dispatches here, so the full training
    step runs edge-partitioned without any model changes.  Backward is the
    transpose partition (prebuilt), mirroring the single-device custom VJP.
    """

    fwd: HaloPartition
    bwd: HaloPartition  # transpose orientation
    axis: str = struct.field(pytree_node=False, default="nodes")

    @property
    def n_out(self) -> int:
        return self.fwd.num_shards * self.fwd.rows_per_shard


@jax.custom_vjp
def _halo_propagate_cv(fwd: HaloPartition, bwd: HaloPartition, x: jnp.ndarray):
    return halo_propagate(fwd, x, current_mesh())


def _halo_cv_fwd(fwd, bwd, x):
    return halo_propagate(fwd, x, current_mesh()), (fwd, bwd)


def _halo_cv_bwd(res, g):
    fwd, bwd = res
    dx = halo_propagate(bwd, g, current_mesh())
    zero_part = lambda p: jax.tree_util.tree_map(
        lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        p,
    )
    return (zero_part(fwd), zero_part(bwd), dx)


_halo_propagate_cv.defvjp(_halo_cv_fwd, _halo_cv_bwd)


def propagate_halo(adj: HaloAdj, x: jnp.ndarray) -> jnp.ndarray:
    return _halo_propagate_cv(adj.fwd, adj.bwd, x)


def build_halo_adjacency(
    src, tgt, w, num_nodes: int, num_shards: int, axis: str = "nodes",
    debug_checksums: bool = False,
) -> HaloAdj:
    return HaloAdj(
        fwd=build_halo_partition(src, tgt, w, num_nodes, num_shards, debug_checksums),
        bwd=build_halo_partition(tgt, src, w, num_nodes, num_shards, debug_checksums),
        axis=axis,
    )


# ----------------------------------------------------------------------------
# Batched tri-matrix exchange: one collective serves all three propagation
# operators of a DirectGCN layer.
# ----------------------------------------------------------------------------


@struct.dataclass
class TriHaloPartition:
    """Three per-matrix halo ELL tables over ONE shared exchange.

    The three DirectGCN operators (𝒜_in, 𝒜_out, undirected) have
    near-identical sparsity patterns (all contained in the symmetric closure
    of the same edge set, reference: graph_utils.py:198-287), so their
    per-peer recv sets almost coincide.  Sharing the union recv set turns
    the 3 fwd exchanges per layer into ONE [S_u, 3F] ring exchange — the
    same bytes, a third of the collective launches and padding waste (the
    latency term that dominates weak-scaling at small per-shard work)."""

    parts: Tuple[HaloPartition, HaloPartition, HaloPartition]  # share the plan
    send_steps: Tuple[jnp.ndarray, ...]  # shared union ring plan

    @property
    def rows_per_shard(self) -> int:
        return self.parts[0].rows_per_shard


def build_tri_halo_partition(
    coos, num_nodes: int, num_shards: int, debug_checksums: bool = False
) -> TriHaloPartition:
    """``coos``: three (src, tgt, w) triples.  Builds per-matrix partitions
    whose halo indices all point into the SHARED union receive buffer."""
    nd = -(-num_nodes // num_shards)
    d_count = num_shards

    # Union recv sets across the three matrices, per (device, peer).
    union_sets = [[np.empty(0, np.int64)] * d_count for _ in range(d_count)]
    per_matrix = []
    for src, tgt, w in coos:
        src = np.asarray(src, np.int64)
        tgt = np.asarray(tgt, np.int64)
        w = np.asarray(w, np.float32)
        owner_t = np.minimum(tgt // nd, d_count - 1)
        owner_s = np.minimum(src // nd, d_count - 1)
        per_matrix.append((src, tgt, w, owner_t, owner_s))
        for dd in range(d_count):
            mask_d = owner_t == dd
            remote = owner_s[mask_d] != dd
            g_src = src[mask_d][remote]
            peers = owner_s[mask_d][remote]
            for p in range(d_count):
                sel = peers == p
                if sel.any():
                    union_sets[dd][p] = np.union1d(union_sets[dd][p], g_src[sel])

    send_steps, buf_off = _ring_plan(union_sets, nd, d_count)
    send_steps_j = tuple(jnp.asarray(s) for s in send_steps)

    from protgram_directgcn_tpu.ops.spmm import _ell_one_sided

    parts = []
    for src, tgt, w, owner_t, owner_s in per_matrix:
        l_idx, l_w, h_idx, h_w = [], [], [], []
        for dd in range(d_count):
            mask_d = owner_t == dd
            is_local = owner_s[mask_d] == dd
            lr = tgt[mask_d][is_local] - dd * nd
            ls = src[mask_d][is_local] - dd * nd
            lw = w[mask_d][is_local]
            hr = tgt[mask_d][~is_local] - dd * nd
            hp = owner_s[mask_d][~is_local]
            hg = src[mask_d][~is_local]
            hw = w[mask_d][~is_local]
            buf = np.zeros(len(hg), np.int64)
            for p in range(d_count):
                sel = hp == p
                if sel.any():
                    pos = np.searchsorted(union_sets[dd][p], hg[sel])
                    buf[sel] = buf_off[(dd - p) % d_count] + pos
            li, lwm = _ell_one_sided(ls, lr, lw, nd)
            hi, hwm = _ell_one_sided(buf, hr, hw, nd)
            l_idx.append(li)
            l_w.append(lwm)
            h_idx.append(hi)
            h_w.append(hwm)

        def stack_pad(mats):
            k = max(m.shape[1] for m in mats)
            return np.stack([np.pad(m, ((0, 0), (0, k - m.shape[1]))) for m in mats])

        parts.append(
            HaloPartition(
                local_idx=jnp.asarray(stack_pad(l_idx).astype(np.int32)),
                local_w=jnp.asarray(stack_pad(l_w).astype(np.float32)),
                halo_idx=jnp.asarray(stack_pad(h_idx).astype(np.int32)),
                halo_w=jnp.asarray(stack_pad(h_w).astype(np.float32)),
                send_steps=send_steps_j,
                num_shards=int(d_count),
                num_nodes=int(num_nodes),
                rows_per_shard=int(nd),
                debug_checksums=bool(debug_checksums),
            )
        )
    return TriHaloPartition(parts=tuple(parts), send_steps=send_steps_j)


def tri_halo_propagate(tri: TriHaloPartition, xs, mesh: Mesh, axis: str = "nodes"):
    """One exchange, three propagations.  ``xs``: three [N, F] arrays (the
    three per-path projections of a DirectGCN layer); returns three [N, F]
    aggregates."""
    d = mesh.shape[axis]
    f = xs[0].shape[1]
    p0, p1, p2 = tri.parts
    n_steps = len(tri.send_steps)
    debug = p0.debug_checksums

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            tuple(P(axis, None) for _ in range(n_steps)),  # shared ring plan
            tuple(P(axis, None, None) for _ in range(12)),  # 3x local/halo idx/w
            tuple(P(axis, None) for _ in range(3)),  # xs
        ),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
    )
    def _run(send_steps, tables, xs_local):
        tables = [t[0] for t in tables]
        xs_local = list(xs_local)
        # 1. One ring exchange for all three: concat the projections' rows
        #    -> per-step [s_k, 3F] chunks.
        cat = jnp.concatenate(xs_local, axis=1)  # [Nd, 3F]
        recv_flat = _ring_exchange(cat, send_steps, axis, d, debug)
        # 2. Local aggregation for all three (overlaps the permutes).
        outs = []
        for m in range(3):
            l_idx, l_w, h_idx, h_w = tables[4 * m : 4 * m + 4]
            out = _ell_block(l_idx, l_w, xs_local[m])
            out = out + _ell_block(h_idx, h_w, recv_flat[:, m * f : (m + 1) * f])
            outs.append(out)
        return tuple(outs)

    tables = tuple(
        t
        for p in (p0, p1, p2)
        for t in (p.local_idx, p.local_w, p.halo_idx, p.halo_w)
    )
    return _run(tri.send_steps, tables, tuple(xs))


@struct.dataclass
class TriHaloAdj:
    """Layer-level distributed operator: all three propagation matrices with
    a shared fwd/bwd exchange.  Consumed by the DirectGCN fused layer via
    ``ops.spmm.propagate3``."""

    fwd: TriHaloPartition
    bwd: TriHaloPartition  # transpose orientation
    axis: str = struct.field(pytree_node=False, default="nodes")


@jax.custom_vjp
def _tri_propagate_cv(fwd: TriHaloPartition, bwd: TriHaloPartition, x0, x1, x2):
    return tri_halo_propagate(fwd, (x0, x1, x2), current_mesh())


def _tri_cv_fwd(fwd, bwd, x0, x1, x2):
    return tri_halo_propagate(fwd, (x0, x1, x2), current_mesh()), (fwd, bwd)


def _tri_cv_bwd(res, gs):
    fwd, bwd = res
    dxs = tri_halo_propagate(bwd, gs, current_mesh())
    zero_part = lambda p: jax.tree_util.tree_map(  # noqa: E731
        lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
        if jnp.issubdtype(a.dtype, jnp.integer)
        else jnp.zeros_like(a),
        p,
    )
    return (zero_part(fwd), zero_part(bwd)) + tuple(dxs)


_tri_propagate_cv.defvjp(_tri_cv_fwd, _tri_cv_bwd)


def propagate_tri(adj: TriHaloAdj, x_in, x_out, x_und):
    return _tri_propagate_cv(adj.fwd, adj.bwd, x_in, x_out, x_und)


def build_tri_halo_adjacency(
    coos, num_nodes: int, num_shards: int, axis: str = "nodes",
    debug_checksums: bool = False,
) -> TriHaloAdj:
    """``coos``: three (src, tgt, w) triples for (𝒜_in, 𝒜_out, undirected)."""
    return TriHaloAdj(
        fwd=build_tri_halo_partition(coos, num_nodes, num_shards, debug_checksums),
        bwd=build_tri_halo_partition(
            [(t, s, w) for s, t, w in coos], num_nodes, num_shards, debug_checksums
        ),
        axis=axis,
    )
