"""Typed configuration for the ProtGram-DirectGCN TPU framework.

Replaces the reference's single hard-coded god-object (reference:
config.py:13-172) with nested, typed dataclasses plus CLI/JSON/env override
paths.  The semantic knob set is preserved: workflow stage toggles,
per-level task-type map, cluster-training knobs, eval registry
(reference: config.py:20-26, 89-94, 98-104, 143-148).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional


@dataclass
class PathsConfig:
    """Filesystem layout (reference: config.py:29-46)."""

    project_root: Path = field(default_factory=lambda: Path(".").resolve())
    base_data_dir: Optional[Path] = None
    base_output_dir: Optional[Path] = None
    input_fasta: Optional[Path] = None
    interactions_positive: Optional[Path] = None
    interactions_negative: Optional[Path] = None

    def __post_init__(self):
        if self.base_data_dir is None:
            self.base_data_dir = self.project_root / "data"
        if self.base_output_dir is None:
            self.base_output_dir = self.base_data_dir / "results"
        if self.input_fasta is None:
            self.input_fasta = self.base_data_dir / "sequences/uniprot_sprot.fasta"
        if self.interactions_positive is None:
            self.interactions_positive = self.base_data_dir / "ground_truth/positive_interactions.csv"
        if self.interactions_negative is None:
            self.interactions_negative = self.base_data_dir / "ground_truth/negative_interactions.csv"

    @property
    def graph_objects_dir(self) -> Path:
        return self.base_output_dir / "1_graph_objects"

    @property
    def gcn_embeddings_dir(self) -> Path:
        return self.base_output_dir / "2_gcn_embeddings"

    @property
    def word2vec_embeddings_dir(self) -> Path:
        return self.base_output_dir / "2_word2vec_embeddings"

    @property
    def transformer_embeddings_dir(self) -> Path:
        return self.base_output_dir / "2_transformer_embeddings"

    @property
    def evaluation_results_dir(self) -> Path:
        return self.base_output_dir / "3_evaluation_results"

    @property
    def benchmarking_results_dir(self) -> Path:
        return self.base_output_dir / "4_benchmarking_results"

    @property
    def checkpoints_dir(self) -> Path:
        return self.base_output_dir / "checkpoints"

    @property
    def id_mapping_output_file(self) -> Path:
        return self.base_output_dir / "mappings/gcn_id_mapping.tsv"


@dataclass
class StagesConfig:
    """Workflow stage toggles (reference: config.py:20-26)."""

    run_gcn_pipeline: bool = True
    run_word2vec_pipeline: bool = False
    run_transformer_pipeline: bool = False
    run_benchmarking_pipeline: bool = False
    run_main_ppi_evaluation: bool = False
    run_dummy_test: bool = False
    cleanup_dummy_data: bool = False


@dataclass
class GraphBuilderConfig:
    """N-gram graph ETL knobs (reference: config.py:60-61, 85)."""

    ngram_max_n: int = 3
    workers: int = field(default_factory=lambda: max(1, (os.cpu_count() or 2) - 4))
    propagation_epsilon: float = 1e-9
    # Sequence padding semantics: leading space on the very first sequence,
    # trailing space on all (reference: data_builder.py:29-35).
    add_boundary_spaces: bool = True
    # Chunk size (#sequences) for the streaming ETL shards.
    sequences_per_shard: int = 50_000
    # Use the native C++ ETL kernels when buildable (numpy fallback otherwise).
    use_native: bool = True


@dataclass
class GCNConfig:
    """DirectGCN model + hierarchical trainer knobs (reference: config.py:60-113)."""

    hidden_layer_dims: List[int] = field(default_factory=lambda: [256, 128, 64])
    one_gram_init_dim: int = 512
    epochs_per_level: int = 500
    lr: float = 1e-3
    dropout_rate: float = 0.5
    weight_decay: float = 1e-4
    l2_reg_lambda: float = 1e-7
    use_lr_scheduler: bool = True
    lr_scheduler_patience: int = 10
    lr_scheduler_factor: float = 0.5
    use_early_stopping: bool = True
    early_stopping_patience: int = 25
    early_stopping_min_delta: float = 1e-5
    propagation_epsilon: float = 1e-9
    max_pe_len: int = 512
    use_vector_coeffs: bool = True
    task_types_per_level: Dict[int, str] = field(
        default_factory=lambda: {1: "next_node", 2: "next_node", 3: "next_node"}
    )
    default_task_type: str = "community"
    closest_aa_k_hops: int = 3
    # Cluster-GCN-style partitioned training (reference: config.py:98-104).
    use_cluster_training: bool = True
    cluster_training_threshold_nodes: int = 10_000
    target_nodes_per_cluster: int = 500
    min_clusters: int = 2
    max_clusters: int = 500
    # Device-resident cap for the prepared cluster batches: above it they
    # stay host-side and stream to the device per step (one batch resident).
    cluster_device_budget_bytes: int = 4 << 30
    # Dense [budget, budget] subgraph blocks up to this node budget (MXU
    # speed); padded-ELL blocks beyond it (a 5k-node dense block is 100 MB
    # while its edges are ~100 KB).
    cluster_dense_max_budget: int = 1024
    # When the level's operators compile to the gather-free hypercube format
    # anyway, full-batch beats cluster mini-batching — route there.
    cluster_auto_fullbatch: bool = True
    # Post-training export.
    apply_pca: bool = True
    pca_target_dim: int = 64
    run_sanity_check_ppi: bool = True
    sanity_check_epochs: int = 10
    sanity_check_test_split: float = 0.2
    # In-training orbax checkpoint cadence (epochs); 0 disables.
    checkpoint_every_epochs: int = 100
    # TPU-specific memory-governed knobs.  All four default to "auto": the
    # trainer's residency plan (pipeline/trainer.py _level_plan) picks the
    # cheapest tier that fits the chip — f32/no-remat/Adam (torch parity) on
    # small levels, escalating through remat to the proven 5-gram
    # configuration (bf16 compute + bf16 node params + remat + factored
    # moments) as the estimate approaches the device's HBM.  Explicit values
    # override the corresponding field at every tier.
    # Compute dtype for matmuls/propagation ("auto"|"bfloat16"|"float32").
    compute_dtype: str = "auto"
    # Storage dtype for per-node gates/constant ("auto"|"bfloat16"|"float32"
    # — see models/directgcn.py DirectGCNConfig.node_param_dtype; optimizer
    # moments stay f32 regardless, trainer _f32_state).
    node_param_dtype: str = "auto"
    # Optimizer for the per-node tables (5 gates + the [N, out] constants):
    # "auto" keeps torch-parity Adam unless its full moments would overflow
    # the chip alongside banks + activations (5-gram scale), then switches
    # those leaves to factored-second-moment Adafactor (state: MBs instead
    # of GBs); "on"/"off" force either way.
    node_param_factored: str = "auto"
    # Rematerialise GCN layers on backward ("auto"|True|False).
    remat: Any = "auto"
    # Sparse format selection: "auto" picks dense vs ELL by a roofline byte
    # model; can be forced to "dense", "ell", or "pallas".
    spmm_mode: str = "auto"
    # What to do when NO memory tier fits the level on the chip(s) — e.g. the
    # reference-default [256, 128, 64] dims at 5-gram scale on one 16 GB v5e
    # (3.7 GB of bf16 per-node constants + moments + carries exceed HBM even
    # fully staged).  "degrade": halve hidden_layer_dims until the plan fits
    # and log the substitution loudly (out-of-the-box runs complete end to
    # end); "error": raise immediately with the two one-line fixes (set
    # parallel.mesh_nodes >= K, or set gcn.hidden_layer_dims = [...]) instead
    # of dying minutes into compilation.
    oversize_policy: str = "degrade"


@dataclass
class Word2VecConfig:
    """Skip-gram residue embedder knobs (reference: config.py:116-123)."""

    vector_size: int = 100
    window: int = 5
    min_count: int = 1
    epochs: int = 5
    negative: int = 5
    pooling_strategy: str = "mean"
    apply_pca: bool = True
    batch_size: int = 8192
    # gensim-parity SGD schedule: linear decay lr -> min_alpha over training
    # (reference: word2vec_embedder.py:89-100).
    lr: float = 0.025
    min_alpha: float = 1e-4
    # Frequent-word subsampling threshold (gensim `sample`); 0 disables.
    sample: float = 1e-3


@dataclass
class TransformerConfig:
    """Transformer inference embedder knobs (reference: config.py:126-133)."""

    models_to_run: List[Dict[str, Any]] = field(
        default_factory=lambda: [
            {"name": "ProtBERT", "hf_id": "Rostlab/prot_bert", "is_t5": False, "batch_size_multiplier": 1}
        ]
    )
    max_length: int = 1024
    base_batch_size: int = 16
    pooling_strategy: str = "mean"
    apply_pca: bool = True
    # When no HF checkpoint is cached locally (offline pods), emit seeded
    # per-residue projection embeddings (AA-composition baseline) instead of
    # producing nothing.
    offline_fallback: bool = True
    fallback_dim: int = 64


@dataclass
class EvalConfig:
    """PPI link-prediction evaluation knobs (reference: config.py:136-172)."""

    early_stopping_patience: int = 10
    perform_h5_integrity_check: bool = True
    # Standardize edge features to zero mean / unit variance per CV fold
    # (train-fold statistics only; streaming-safe).  Default OFF for exact
    # reference parity — the reference MLP has no input normalization
    # (reference: src/models/mlp.py:39-73), which leaves raw (un-PCA'd)
    # embedding exports at chance (VERDICT r3 weak #5).  Turning this on
    # lifts them without touching the stored artifacts.
    standardize_features: bool = False
    sample_negative_pairs: Optional[int] = 100_000
    embedding_files_to_evaluate: List[Dict[str, Any]] = field(default_factory=list)
    edge_embedding_method: str = "concatenate"
    n_folds: int = 5
    mlp_dense1_units: int = 128
    mlp_dropout1_rate: float = 0.4
    mlp_dense2_units: int = 64
    mlp_dropout2_rate: float = 0.4
    mlp_l2_reg: float = 1e-5
    batch_size: int = 1024
    epochs: int = 300
    learning_rate: float = 1e-3
    k_values_for_table: List[int] = field(default_factory=lambda: [50, 100])
    # Edge-feature matrices larger than this stream per batch from the
    # vector store instead of materialising (reference generator pipeline,
    # ppi_main.py:147-150).
    max_in_memory_feature_bytes: int = 2 << 30
    main_embedding_for_stats: str = "ProtGramDirectGCN"
    statistical_test_alpha: float = 0.05
    plot_training_history: bool = True


@dataclass
class BenchmarkConfig:
    """GNN zoo benchmark suite knobs (reference: config.py:49-57)."""

    node_classification_datasets: List[str] = field(
        default_factory=lambda: ["KarateClub", "Cora", "CiteSeer", "PubMed", "Cornell", "Texas", "Wisconsin"]
    )
    save_embeddings: bool = True
    apply_pca_to_embeddings: bool = True
    pca_target_dim: int = 64
    test_on_undirected: bool = True
    split_ratios: Dict[str, float] = field(default_factory=lambda: {"train": 0.1, "val": 0.1, "test": 0.8})
    # The reference trains EVERY benchmark model (zoo + DirectGCN) with
    # Adam(lr=EVAL_LEARNING_RATE=1e-3, wd=5e-4) for EVAL_EPOCHS=300
    # (reference: gnn_benchmarker.py:334-339, config.py:166-167).  1e-2
    # diverges DirectGCN (its 3-path sums + per-node tables explode).
    epochs: int = 300
    lr: float = 0.001
    weight_decay: float = 5e-4
    # (No hidden_dim knob: per-model hidden dims are fixed to the
    # reference's per-model hyperparameters, gnn_benchmarker.py:384-392.)
    # Directory containing real dataset raw files (<Name>/raw/...) in the
    # standard Planetoid/WebKB layouts; synthetic stand-ins are used when
    # absent (no network egress).  Set via --set benchmark.dataset_root=...
    # (tools/fetch_datasets.py downloads + checksum-validates them in
    # egress-enabled environments.)
    dataset_root: Optional[Path] = None
    # Datasets whose rows are averaged over ``n_seeds`` seeds (init AND
    # split re-drawn): KarateClub's 10%-of-34 val split makes single-seed
    # best-val checkpointing near-random.
    seed_average_datasets: List[str] = field(default_factory=lambda: ["KarateClub"])
    n_seeds: int = 10
    # Adds the ProtGramDirectGCN_norm context row: the same deep
    # architecture fed the production sqrt-normalized 𝒜 operators it was
    # designed for (the raw-adjacency adapter collapses deep stacks —
    # adjudicated in experiments/exp_benchmark_collapse.py) plus a
    # non-degenerate decoder width.
    normalized_row: bool = True
    norm_row_dropout: float = 0.2
    norm_row_decoder_floor: int = 8


@dataclass
class ParallelConfig:
    """Device-mesh / partitioning knobs.

    No reference counterpart — the reference is single-process single-device
    (SURVEY.md section 2.3); this subsystem is new TPU-native work.
    """

    # Mesh axis sizes; None -> single-device training.  Setting mesh_nodes
    # (e.g. --set parallel.mesh_nodes=8) makes HierarchicalTrainer build a
    # ("nodes", "feat") mesh and train every level distributed.
    mesh_nodes: Optional[int] = None
    mesh_feats: int = 1
    # Distributed propagation strategy:
    #   "hypercube" — the gather-free hypercube format sharded along its
    #             key axis: kernels stay local, the two relayouts become
    #             regular all-to-alls (parallel/hyper_shard.py); falls back
    #             to "halo" per level when the format doesn't apply;
    #   "halo"  — explicit edge-partitioned halo exchange (shard_map
    #             all_to_all overlapped with local aggregation,
    #             parallel/halo.py) with the batched tri-matrix exchange;
    #   "gspmd" — row-sharded adjacency + GSPMD-inserted collectives
    #             (parallel/mesh.py shard_device_graph).
    mode: str = "halo"
    # Edge partitioning strategy for multi-chip: "block" (contiguous node
    # ranges) or "bfs" (locality-grown partitions).
    partition_strategy: str = "block"
    # Batched tri exchange for the hypercube mode (HyperShardTri: ONE
    # all_to_all pair per layer direction instead of three).  "auto" uses it
    # on TPU meshes only — it amortises ICI collective latency, while on
    # the CPU test mesh the batched buffers just add copies (SCALING_r04:
    # hyper_shard_tri retains 0.51 vs per-matrix 0.74 at 8 virtual
    # devices); "on"/"off" force either way.
    hyper_tri: str = "auto"
    # Debug: assert cross-shard checksums on exchanged halo features.
    debug_checksums: bool = False


@dataclass
class Config:
    """Top-level framework configuration."""

    random_state: int = 42
    debug_verbose: bool = False
    paths: PathsConfig = field(default_factory=PathsConfig)
    stages: StagesConfig = field(default_factory=StagesConfig)
    graph_builder: GraphBuilderConfig = field(default_factory=GraphBuilderConfig)
    gcn: GCNConfig = field(default_factory=GCNConfig)
    word2vec: Word2VecConfig = field(default_factory=Word2VecConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    benchmark: BenchmarkConfig = field(default_factory=BenchmarkConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    id_mapping_mode: str = "regex"  # 'regex' | 'api' | 'none'

    # ------------------------------------------------------------------
    # Override mechanisms (the reference had none; users edited config.py).
    # ------------------------------------------------------------------

    def apply_overrides(self, overrides: Dict[str, Any]) -> "Config":
        """Apply dotted-path overrides, e.g. {"gcn.lr": 3e-4}."""
        for key, value in overrides.items():
            obj: Any = self
            parts = key.split(".")
            for part in parts[:-1]:
                obj = getattr(obj, part)
            leaf = parts[-1]
            if not hasattr(obj, leaf):
                raise KeyError(f"Unknown config key: {key}")
            current = getattr(obj, leaf)
            if isinstance(current, Path) and isinstance(value, str):
                value = Path(value)
            setattr(obj, leaf, value)
        return self

    @classmethod
    def from_json(cls, path: os.PathLike) -> "Config":
        with open(path) as f:
            overrides = json.load(f)
        return cls().apply_overrides(_flatten(overrides))

    def to_dict(self) -> Dict[str, Any]:
        def convert(obj):
            if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
                return {f.name: convert(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
            if isinstance(obj, Path):
                return str(obj)
            if isinstance(obj, dict):
                return {k: convert(v) for k, v in obj.items()}
            if isinstance(obj, list):
                return [convert(v) for v in obj]
            return obj

        return convert(self)


def _flatten(nested: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    for k, v in nested.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict) and not k.endswith("_per_level") and k not in (
            "split_ratios",
        ):
            flat.update(_flatten(v, key + "."))
        else:
            flat[key] = v
    return flat
