"""GNN zoo model tests + benchmarker smoke test."""

import jax
import numpy as np
import pytest

from protgram_directgcn_tpu.bench.datasets import karate_club, load_dataset, synthetic_stand_in
from protgram_directgcn_tpu.models.zoo import ZOO_MODELS


@pytest.fixture(scope="module")
def karate():
    return karate_club()


@pytest.mark.parametrize("name", list(ZOO_MODELS.keys()))
def test_zoo_model_shapes_and_grads(karate, name):
    ds = karate
    cls = ZOO_MODELS[name]
    kwargs = dict(hidden_dim=16, num_layers=2, dropout_rate=0.5)
    if name == "GAT":
        kwargs = dict(hidden_dim=8, heads=4, num_layers=2, dropout_rate=0.6)
    model = cls(edge_index=ds.edge_index, num_nodes=ds.num_nodes, in_dim=ds.x.shape[1],
                out_dim=ds.num_classes, **kwargs)
    params = model.init_params(jax.random.PRNGKey(0))
    logits, emb = model.apply(params, ds.x.astype(np.float32))
    assert logits.shape == (ds.num_nodes, ds.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
    # Train-mode with dropout differs from eval.
    lt, _ = model.apply(params, ds.x.astype(np.float32), train=True, rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(lt)).all()

    # Gradients flow.
    import jax.numpy as jnp

    y = jnp.asarray(ds.y)

    def loss(p):
        lg, _ = model.apply(p, ds.x.astype(np.float32))
        lp = jax.nn.log_softmax(lg, -1)
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], 1))

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in flat)


def test_gcn_matches_normalization_oracle(karate):
    """First GCN layer (no dropout, eval) equals D̂^-1/2(A+I)D̂^-1/2 X W + b."""
    ds = karate
    model = ZOO_MODELS["GCN"](edge_index=ds.edge_index, num_nodes=ds.num_nodes,
                              in_dim=ds.x.shape[1], hidden_dim=5, out_dim=5, num_layers=1)
    params = model.init_params(jax.random.PRNGKey(0))
    out, _ = model.apply(params, ds.x.astype(np.float32))
    n = ds.num_nodes
    a = np.zeros((n, n))
    a[ds.edge_index[1], ds.edge_index[0]] = 1.0  # out[i] sums over sources j->i
    a = a + np.eye(n)
    deg = a.sum(0)
    dinv = deg ** -0.5
    norm = dinv[:, None] * a * dinv[None, :]
    want = norm @ (ds.x @ np.asarray(params["layers"][0]["w"])) + np.asarray(params["layers"][0]["b"])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_gat_attention_sums_to_one(karate):
    ds = karate
    model = ZOO_MODELS["GAT"](edge_index=ds.edge_index, num_nodes=ds.num_nodes,
                              in_dim=ds.x.shape[1], hidden_dim=8, out_dim=2, heads=2)
    params = model.init_params(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    from protgram_directgcn_tpu.ops.segment import segment_softmax

    z = (jnp.asarray(ds.x) @ params["layers"][0]["w"]).reshape(ds.num_nodes, 2, 8)
    a_src = jnp.sum(z * params["layers"][0]["att_src"], -1)
    a_dst = jnp.sum(z * params["layers"][0]["att_dst"], -1)
    logits = jax.nn.leaky_relu(a_src[model.src] + a_dst[model.tgt], negative_slope=0.2)
    alpha = segment_softmax(logits, model.tgt, ds.num_nodes)
    sums = jax.ops.segment_sum(alpha, model.tgt, num_segments=ds.num_nodes)
    np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-4)


def test_synthetic_stand_in_learnable():
    ds = synthetic_stand_in("Cornell", seed=0)
    assert ds.synthetic
    assert ds.num_nodes == 183
    assert ds.num_classes == 5
    assert ds.edge_index.max() < ds.num_nodes


def test_load_dataset_fallback_logs():
    ds = load_dataset("Cora", root=None)
    assert ds.synthetic
    assert ds.num_nodes == 2708


def test_benchmarker_smoke(tmp_path):
    from protgram_directgcn_tpu.config import Config
    from protgram_directgcn_tpu.bench.gnn_benchmarker import GNNBenchmarker

    cfg = Config()
    cfg.paths.base_output_dir = tmp_path
    cfg.gcn.hidden_layer_dims = [16, 8]
    cfg.benchmark.test_on_undirected = True
    cfg.benchmark.save_embeddings = True
    cfg.benchmark.pca_target_dim = 4
    cfg.benchmark.n_seeds = 2  # exercise seed averaging without the full 10
    results = GNNBenchmarker(cfg).run(epochs=2, datasets=["KarateClub"])
    models = {r["model"] for r in results}
    assert "ProtGramDirectGCN" in models
    assert "ProtGramDirectGCN_shallow" in models  # context row, see benchmarker
    assert "ProtGramDirectGCN_norm" in models  # production-operator row
    assert len(models) == 10
    # Seed-averaged rows carry the spread (KarateClub is seed-averaged).
    assert all(r["n_seeds"] == 2 and "test_accuracy_std" in r for r in results)
    assert all("test_accuracy" in r for r in results)
    # Provenance stamp rides every row into the CSVs (KarateClub is real).
    assert all(r["synthetic"] is False for r in results)
    import pandas as pd

    df = pd.read_csv(tmp_path / "4_benchmarking_results" / "gnn_benchmark_FULL_SUMMARY.csv")
    assert "synthetic" in df.columns
    assert (tmp_path / "4_benchmarking_results" / "gnn_benchmark_FULL_SUMMARY.csv").exists()
    assert (tmp_path / "4_benchmarking_results" / "KarateClub_Original" / "benchmark_GCN_history.csv").exists()
    assert (tmp_path / "4_benchmarking_results" / "KarateClub_Original" / "GCN_node_embeddings.h5").exists()
    # Tracked run (VERDICT r1 item 8: MLflow-analogue run records).
    from protgram_directgcn_tpu.utils.metrics import read_metrics

    records = read_metrics(tmp_path / "4_benchmarking_results" / "run_benchmark")
    assert {r["model"] for r in records if "model" in r} == models
    assert (tmp_path / "4_benchmarking_results" / "run_benchmark" / "params.json").exists()


def test_decoder_hidden_floor():
    """decoder_hidden_floor=1 keeps the reference formula (final//2, min 1);
    raising it widens only degenerate heads (the 2-class width-1 bottleneck,
    experiments/exp_benchmark_collapse.py)."""
    from protgram_directgcn_tpu.models.directgcn import (
        DirectGCNConfig, init_directgcn_params,
    )

    for floor, final, want in ((1, 2, 1), (8, 2, 8), (8, 64, 32), (1, 64, 32)):
        cfg = DirectGCNConfig(
            layer_dims=(10, final), num_nodes=5, num_classes=2, n_gram_len=0,
            decoder_hidden_floor=floor,
        )
        p = init_directgcn_params(jax.random.PRNGKey(0), cfg)
        assert p["decoder"]["w1"].shape == (final, want)
        assert p["decoder"]["w2"].shape == (want, 2)


def test_normalized_adapter_matches_scipy_oracle(karate):
    """The normalized benchmark adapter feeds the production A-operators:
    propagate == scipy directgcn_propagation_matrix @ x (float64 oracle)."""
    import jax.numpy as jnp
    import numpy as np

    from protgram_directgcn_tpu.bench.gnn_benchmarker import _directgcn_device_graph
    from protgram_directgcn_tpu.graph.transforms import (
        coalesce_coo, directgcn_propagation_matrix,
    )
    from protgram_directgcn_tpu.ops.spmm import propagate

    ds = karate
    n = ds.num_nodes
    g = _directgcn_device_graph(ds, feat_dim=8, normalized=True)
    x = np.random.default_rng(0).normal(size=(n, 8)).astype(np.float32)
    a_out = coalesce_coo(
        ds.edge_index[0].astype(np.int32), ds.edge_index[1].astype(np.int32),
        np.ones(ds.edge_index.shape[1], np.float32), n,
    )
    # adapter convention: propagate(build(s,t,w), x)[t] += w*x[s] => M[t,s]=w;
    # csr_to_coo_arrays feeds (row, col) as (s, t), so the device op applies
    # the scipy matrix TRANSPOSED — the A-operators are symmetric, so the
    # oracle is direct.
    for dev_m, a_w in ((g.p_out, a_out), (g.p_in, a_out.T.tocsr())):
        want = directgcn_propagation_matrix(a_w).astype(np.float64) @ x.astype(np.float64)
        got = np.asarray(propagate(dev_m, jnp.asarray(x)), np.float64)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        m = directgcn_propagation_matrix(a_w)
        np.testing.assert_allclose((m - m.T).toarray(), 0.0, atol=1e-7)
