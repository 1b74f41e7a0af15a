"""Multi-chip production-trainer integration tests (8 virtual CPU devices).

VERDICT r1 item 2: `ParallelConfig` must be consumed by the production
trainer — `main.py --stages graph,gcn --set parallel.mesh_nodes=8` trains
every level end-to-end on the mesh.  The reference has no distributed
counterpart (SURVEY.md §2.3); the single-device analogue of this contract is
trainer.run() (reference: protgram_directgcn_trainer.py:271-426).
"""

import os

import numpy as np
import pytest

from protgram_directgcn_tpu.config import Config
from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
from protgram_directgcn_tpu.graph.structure import load_graph
from protgram_directgcn_tpu.pipeline.labels import generate_labels
from protgram_directgcn_tpu.pipeline.trainer import HierarchicalTrainer


def dist_config(tmp_path, mode, mesh_nodes=8, mesh_feats=1, **gcn_overrides):
    cfg = Config()
    cfg.paths.project_root = tmp_path
    cfg.paths.base_data_dir = tmp_path / "data"
    cfg.paths.base_output_dir = tmp_path / "out"
    cfg.graph_builder.ngram_max_n = 2
    cfg.gcn.hidden_layer_dims = [16, 8]
    cfg.gcn.one_gram_init_dim = 12
    cfg.gcn.epochs_per_level = 6
    cfg.gcn.max_pe_len = 12
    cfg.gcn.apply_pca = False
    cfg.gcn.run_sanity_check_ppi = False
    cfg.gcn.checkpoint_every_epochs = 0
    cfg.id_mapping_mode = "none"
    cfg.parallel.mesh_nodes = mesh_nodes
    cfg.parallel.mesh_feats = mesh_feats
    cfg.parallel.mode = mode
    for k, v in gcn_overrides.items():
        setattr(cfg.gcn, k, v)
    return cfg


@pytest.fixture
def built_graphs(toy_fasta, tmp_path):
    out = tmp_path / "graphs"
    NgramGraphBuilder(n_max=2).run(fasta_path=toy_fasta, output_dir=out)
    return out


@pytest.mark.parametrize("mode", ["halo", "gspmd"])
def test_distributed_level_trains(mode, built_graphs, tmp_path, toy_fasta):
    """One level trains on the 8-device mesh; embeddings come back for the
    real nodes only, finite and L2-normalized."""
    cfg = dist_config(tmp_path, mode, use_early_stopping=False, use_lr_scheduler=False)
    trainer = HierarchicalTrainer(cfg)
    g = load_graph(built_graphs / "ngram_graph_n2.npz")
    x = trainer._initial_features(g, None, None, 0)[:, :16]
    y, nc = generate_labels(g, "next_node", seed=0)
    params, embeds, model_cfg, dg = trainer.train_level(g, x, y, nc)
    assert embeds.shape == (g.num_nodes, cfg.gcn.hidden_layer_dims[-1])
    assert np.isfinite(embeds).all()
    norms = np.linalg.norm(embeds, axis=1)
    np.testing.assert_allclose(norms, np.ones_like(norms), rtol=1e-3)
    # The model was built over the shard-padded node space.
    assert model_cfg.num_nodes % 8 == 0
    assert model_cfg.num_nodes >= g.num_nodes


def test_distributed_matches_single_device(built_graphs, tmp_path, toy_fasta):
    """Halo-distributed training reaches the same embeddings as single-device
    full-batch training (same seeds, dropout off -> deterministic up to
    collective reduction order)."""
    g = load_graph(built_graphs / "ngram_graph_n2.npz")
    results = {}
    for name, mesh_nodes in (("single", None), ("dist", 8)):
        cfg = dist_config(
            tmp_path, "halo", mesh_nodes=mesh_nodes,
            use_early_stopping=False, use_lr_scheduler=False,
            dropout_rate=0.0, epochs_per_level=5, spmm_mode="ell",
        )
        trainer = HierarchicalTrainer(cfg)
        x = trainer._initial_features(g, None, None, 0)[:, :16]
        y, nc = generate_labels(g, "next_node", seed=0)
        _, embeds, _, _ = trainer.train_level(g, x, y, nc)
        results[name] = embeds
    np.testing.assert_allclose(results["single"], results["dist"], rtol=5e-3, atol=5e-3)


def test_distributed_mesh_feats_axis(built_graphs, tmp_path, toy_fasta):
    """2D mesh (4 node shards x 2 feature shards) trains a level."""
    cfg = dist_config(
        tmp_path, "gspmd", mesh_nodes=4, mesh_feats=2,
        use_early_stopping=False, use_lr_scheduler=False,
    )
    trainer = HierarchicalTrainer(cfg)
    g = load_graph(built_graphs / "ngram_graph_n2.npz")
    x = trainer._initial_features(g, None, None, 0)[:, :16]
    y, nc = generate_labels(g, "next_node", seed=0)
    _, embeds, _, _ = trainer.train_level(g, x, y, nc)
    assert embeds.shape == (g.num_nodes, 8)
    assert np.isfinite(embeds).all()


def test_halo_debug_checksums(built_graphs, tmp_path, toy_fasta):
    """parallel.debug_checksums=True asserts send/recv checksums on every
    halo exchange (and a healthy run passes them)."""
    cfg = dist_config(tmp_path, "halo", epochs_per_level=2)
    cfg.parallel.debug_checksums = True
    trainer = HierarchicalTrainer(cfg)
    g = load_graph(built_graphs / "ngram_graph_n2.npz")
    x = trainer._initial_features(g, None, None, 0)[:, :16]
    y, nc = generate_labels(g, "next_node", seed=0)
    _, embeds, _, dg = trainer.train_level(g, x, y, nc)
    assert dg.p_in.fwd.debug_checksums
    assert np.isfinite(embeds).all()


def test_main_cli_distributed_e2e(toy_fasta, tmp_path):
    """The VERDICT acceptance command: main.py --stages graph,gcn
    --set parallel.mesh_nodes=8 runs end-to-end on the 8-device mesh."""
    import main as cli

    out = tmp_path / "cli_out"
    rc = cli.main([
        "--stages", "graph,gcn",
        "--fasta", str(toy_fasta),
        "--out", str(out),
        "--set", "parallel.mesh_nodes=8",
        "--set", "graph_builder.ngram_max_n=2",
        "--set", "gcn.hidden_layer_dims=[16,8]",
        "--set", "gcn.one_gram_init_dim=12",
        "--set", "gcn.epochs_per_level=4",
        "--set", "gcn.apply_pca=false",
        "--set", "gcn.run_sanity_check_ppi=false",
        "--set", "gcn.checkpoint_every_epochs=0",
        "--set", "id_mapping_mode=none",
    ])
    assert rc == 0
    h5 = out / "2_gcn_embeddings" / "gcn_n2_embeddings.h5"
    assert os.path.exists(h5)
    import h5py

    with h5py.File(h5, "r") as hf:
        assert set(hf.keys()) == {"P001", "P002", "P003"}
