"""N-gram graph containers: host-side arrays + device-side adjacency pytrees.

Replaces the reference's pickled ``DirectedNgramGraph`` of torch sparse COO
tensors (reference: graph_utils.py:90-287) with:

- ``NgramGraph``: an immutable host container — sorted n-gram vocabulary plus
  unique weighted edges as numpy arrays.  Node id == rank of the n-gram in
  sorted order (reference: data_builder.py:164-172).  Saved as ``.npz``
  (arrays, not pickle).
- ``DeviceGraph``: the three propagation operators (𝒜_in, 𝒜_out, undirected
  sym-norm) materialised in a TPU-friendly adjacency format.  The propagation
  matrices are recomputed from raw edges at load time, matching the
  reference's deliberate recompute-after-unpickle
  (reference: protgram_directgcn_trainer.py:294-299).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from protgram_directgcn_tpu.graph import transforms
from protgram_directgcn_tpu.ops.spmm import Adjacency, build_adjacency


@struct.dataclass
class DeviceGraph:
    """Device-resident propagation operators for one n-gram level.

    ``num_nodes`` is the node space the operators act on.  For the hypercube
    format (`ops/hypercube.py`) that space is the padded character hypercube
    [alphabet^n]; ``node_map`` then holds the device id of each real node
    (None for formats operating directly on real ids).
    """

    p_in: Adjacency  # from 𝒜_in  (built from A_in_w = A_out_wᵀ)
    p_out: Adjacency  # from 𝒜_out (built from A_out_w)
    p_und: Adjacency  # undirected sym-norm matrix
    num_nodes: int = struct.field(pytree_node=False, default=0)
    node_map: Optional[jnp.ndarray] = None  # [N_real] int32 device id per real node
    # Optional layer-level fused operator covering all three matrices at
    # once (the distributed TriHaloAdj: one halo exchange per layer instead
    # of three).  Consumed by ops.spmm.propagate3; None -> per-matrix path.
    tri: Optional[object] = None


@dataclasses.dataclass
class NgramGraph:
    """Directed weighted n-gram transition graph (host side)."""

    n: int
    vocab: np.ndarray  # [N] of str (unicode), sorted ascending; id == index
    src: np.ndarray  # [E] int32 unique edge sources
    tgt: np.ndarray  # [E] int32 unique edge targets
    weight: np.ndarray  # [E] float32 transition counts
    epsilon_propagation: float = 1e-9

    # Lazily computed caches.
    _node_to_idx: Optional[Dict[str, int]] = dataclasses.field(default=None, repr=False)

    @property
    def num_nodes(self) -> int:
        return len(self.vocab)

    @property
    def num_edges(self) -> int:
        return len(self.src)

    @property
    def node_to_idx(self) -> Dict[str, int]:
        if self._node_to_idx is None:
            self._node_to_idx = {s: i for i, s in enumerate(self.vocab.tolist())}
        return self._node_to_idx

    # ------------------------------------------------------------------
    # Propagation math (host, scipy) — see graph/transforms.py for parity
    # notes against reference graph_utils.py.
    # ------------------------------------------------------------------

    def a_out_w(self):
        return transforms.coalesce_coo(self.src, self.tgt, self.weight, self.num_nodes)

    def mathcal_a_out(self):
        return transforms.directgcn_propagation_matrix(self.a_out_w(), self.epsilon_propagation)

    def mathcal_a_in(self):
        # A_in_w = A_out_wᵀ (reference: graph_utils.py:158)
        return transforms.directgcn_propagation_matrix(
            self.a_out_w().T.tocsr(), self.epsilon_propagation
        )

    def undirected_norm(self):
        return transforms.undirected_normalized_matrix(self.src, self.tgt, self.num_nodes)

    def to_device(
        self, mode: str = "auto", feat_dim: int = 128, dtype=jnp.float32,
        hbm_budget: int = 10 << 30,
    ) -> DeviceGraph:
        """Materialise device propagation operators.

        Edge orientation note: the reference feeds sparse-matrix ``indices()``
        to PyG propagate, which aggregates ``x[row]`` at ``col`` — i.e.
        computes 𝒜ᵀx.  The 𝒜 matrices are symmetric by construction, so we
        pass (row→col) edges to our (src→tgt, aggregate-at-tgt) operator and
        match exactly (reference: protgram_directgcn_trainer.py:362-367).
        """
        n = self.num_nodes
        if mode == "hypercube":
            # Gather-free padded node space [alphabet^n]; the returned graph's
            # num_nodes is the hypercube size and node_map holds real ids.
            from protgram_directgcn_tpu.ops.hypercube import (
                build_hypercube,
                vocab_char_codes,
            )

            codes, alpha = vocab_char_codes(self.vocab)
            # Three matrices share one chip; ``hbm_budget`` is what the
            # caller leaves them (HierarchicalTrainer subtracts its model
            # residency — params, Adam moments, remat saves — first).
            from protgram_directgcn_tpu.ops.block import BankBudgetError

            per_matrix_budget = hbm_budget // 3

            def hyper_from(m):
                s, t, v = transforms.csr_to_coo_arrays(m)
                # Fallback chain dual -> rs -> pk by padded-footprint
                # accounting: dual is fastest (g-major K1 banks), rs drops
                # the g-major copies (~+4 ms/prop K1), pk packs [A*A, G]
                # (~6x leaner than rs; einsum compute path) — the layout
                # that keeps 5-gram training under a 16 GB chip when the
                # model's own residency (params + Adam moments + remat
                # saves) crowds out the banks.
                last_exc = None
                for layouts in ("dual", "rs", "pk"):
                    try:
                        return build_hypercube(
                            s, t, v, codes, alpha, weights_dtype=dtype,
                            bank_layouts=layouts, max_block_bytes=per_matrix_budget,
                        )
                    except BankBudgetError as exc:
                        # Budget overflow only: a structural
                        # BlockStructureError propagates — no layout helps.
                        last_exc = exc
                raise last_exc

            p_in = hyper_from(self.mathcal_a_in())
            return DeviceGraph(
                p_in=p_in,
                p_out=hyper_from(self.mathcal_a_out()),
                p_und=hyper_from(self.undirected_norm()),
                num_nodes=p_in.n_out,
                node_map=p_in.node_map,
            )

        node_keys = None
        if self.n >= 2 and n:
            from protgram_directgcn_tpu.ops.block import ngram_node_keys

            node_keys = ngram_node_keys(self.vocab)

        def adj_from(m):
            s, t, v = transforms.csr_to_coo_arrays(m)
            return build_adjacency(
                s, t, v, n, mode=mode, feat_dim=feat_dim, dtype=dtype, node_keys=node_keys
            )

        return DeviceGraph(
            p_in=adj_from(self.mathcal_a_in()),
            p_out=adj_from(self.mathcal_a_out()),
            p_und=adj_from(self.undirected_norm()),
            num_nodes=n,
        )

    # ------------------------------------------------------------------
    # Vectorized vocabulary lookup (replaces dict .get loops).
    # ------------------------------------------------------------------

    def lookup(self, ngrams: np.ndarray) -> np.ndarray:
        """Map n-gram strings to ids; -1 where absent.  O(log N) searchsorted."""
        pos = np.searchsorted(self.vocab, ngrams)
        pos = np.clip(pos, 0, self.num_nodes - 1)
        found = self.vocab[pos] == ngrams
        return np.where(found, pos, -1).astype(np.int64)


def save_graph(graph: NgramGraph, path: os.PathLike) -> None:
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        n=np.int64(graph.n),
        vocab=graph.vocab.astype(np.str_),
        src=graph.src.astype(np.int32),
        tgt=graph.tgt.astype(np.int32),
        weight=graph.weight.astype(np.float32),
        epsilon=np.float64(graph.epsilon_propagation),
    )


def load_graph(path: os.PathLike) -> NgramGraph:
    with np.load(path, allow_pickle=False) as z:
        return NgramGraph(
            n=int(z["n"]),
            vocab=z["vocab"],
            src=z["src"],
            tgt=z["tgt"],
            weight=z["weight"],
            epsilon_propagation=float(z["epsilon"]),
        )
