"""ProtGram-DirectGCN TPU: a TPU-native n-gram protein graph GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
iebeid/ProtGram-DirectGCN (the reference implementation):

- directed, weighted n-gram transition graphs built from protein FASTA
  (reference: src/pipeline/data_builder.py),
- the DirectGCN model family: dual-path directed propagation with learned
  hierarchical gating (reference: src/models/protgram_directgcn.py),
- hierarchical per-n-gram-level training with feature cascading
  (reference: src/pipeline/protgram_directgcn_trainer.py),
- protein-level embedding pooling, PCA export, PPI link-prediction
  evaluation, and a GNN benchmark suite.

The compute path is TPU-first: static-shape ELL/dense adjacency formats
selected by a roofline model, Pallas SpMM kernels for large sparse graphs,
bf16 matmuls on the MXU, and jax.sharding-based multi-chip partitioning.
"""

__version__ = "0.1.0"

from protgram_directgcn_tpu.config import Config  # noqa: F401
