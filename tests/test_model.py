"""DirectGCN model parity tests against a dense numpy oracle that literally
implements the reference layer dataflow (protgram_directgcn.py:93-135)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from protgram_directgcn_tpu.graph.structure import DeviceGraph
from protgram_directgcn_tpu.models.directgcn import (
    DirectGCNConfig,
    directgcn_apply,
    init_directgcn_params,
)
from protgram_directgcn_tpu.ops import spmm
from tests.conftest import random_graph_arrays


def make_device_graph(rng, n, mode="ell"):
    """Three random symmetric-ish propagation operators + their dense mirrors."""
    mats = []
    adjs = []
    for _ in range(3):
        src, tgt, w = random_graph_arrays(rng, n=n, e=4 * n)
        at = np.zeros((n, n), dtype=np.float64)
        np.add.at(at, (tgt, src), w)
        mats.append(at)
        adjs.append(spmm.build_adjacency(src, tgt, w, n, mode=mode))
    dg = DeviceGraph(p_in=adjs[0], p_out=adjs[1], p_und=adjs[2], num_nodes=n)
    return dg, mats


def oracle_layer(p, mats, x):
    """Literal 6-propagation reference layer in float64 numpy."""
    at_in, at_out, at_und = mats
    p = {k: np.asarray(v, np.float64) if v is not None else None for k, v in p.items()}
    x = np.asarray(x, np.float64)
    h_main_in = at_in @ (x @ p["w_main_in"])
    h_shared_in = at_in @ (x @ p["w_shared"])
    ic = (h_main_in + p["b_main_in"]) + (h_shared_in + p["b_shared_in"])
    h_main_out = at_out @ (x @ p["w_main_out"])
    h_shared_out = at_out @ (x @ p["w_shared"])
    oc = (h_main_out + p["b_main_out"]) + (h_shared_out + p["b_shared_out"])
    h_main_und = at_und @ (x @ p["w_und"])
    h_shared_und = at_und @ (x @ p["w_shared"])
    uc = (h_main_und + p["b_und"]) + (h_shared_und + p["b_shared_und"])
    directed = p["c_directed"] * (p["c_in"] * ic + p["c_out"] * oc)
    undirected = p["c_undirected"] * uc
    return p["c_all"] * (undirected + directed) + p["constant"]


def oracle_forward(params, mats, x, cfg):
    """Full reference forward in float64 (eval mode, no dropout)."""
    h = np.asarray(x, np.float64)
    if "pe_table" in params and h.shape[1] == cfg.n_gram_len * cfg.one_gram_dim:
        pe = np.asarray(params["pe_table"], np.float64)
        pos = min(cfg.n_gram_len, cfg.max_pe_len)
        hr = h.reshape(-1, cfg.n_gram_len, cfg.one_gram_dim).copy()
        hr[:, :pos, :] += pe[:pos][None]
        h = hr.reshape(h.shape)
    for layer_p, rp in zip(params["layers"], params["res_projs"]):
        g = oracle_layer(layer_p, mats, h)
        res = h if rp is None else h @ np.asarray(rp["w"], np.float64) + np.asarray(rp["b"], np.float64)
        z = g + res
        h = np.where(z >= 0, z, 0.01 * z)
    dec = params["decoder"]
    zz = np.maximum(h @ np.asarray(dec["w1"], np.float64) + np.asarray(dec["b1"], np.float64), 0)
    logits = zz @ np.asarray(dec["w2"], np.float64) + np.asarray(dec["b2"], np.float64)
    log_sm = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)).sum(1, keepdims=True)) - logits.max(1, keepdims=True)
    emb = h / (np.linalg.norm(h, axis=1, keepdims=True) + cfg.l2_eps)
    return log_sm, emb


N = 40


@pytest.fixture
def setup(rng):
    dg, mats = make_device_graph(rng, N)
    cfg = DirectGCNConfig(
        layer_dims=(16, 24, 8), num_nodes=N, num_classes=5, n_gram_len=2, one_gram_dim=0
    )
    params = init_directgcn_params(jax.random.PRNGKey(0), cfg)
    x = rng.normal(size=(N, 16)).astype(np.float32)
    return dg, mats, cfg, params, x


@pytest.mark.parametrize("fused", [True, False])
def test_forward_matches_oracle(setup, fused):
    dg, mats, cfg, params, x = setup
    cfg = DirectGCNConfig(**{**cfg.__dict__, "fused": fused})
    log_sm, emb = directgcn_apply(params, dg, jnp.asarray(x), cfg)
    o_log_sm, o_emb = oracle_forward(params, mats, x, cfg)
    np.testing.assert_allclose(np.asarray(log_sm), o_log_sm, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(emb), o_emb, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fused", [True, False])
def test_bf16_compute_dtype_tracks_f32(setup, fused):
    """compute_dtype="bfloat16" (the AMP-autocast analogue) stays within
    mixed-precision tolerance of the f32 path and still returns f32."""
    dg, mats, cfg, params, x = setup
    cfg_f32 = DirectGCNConfig(**{**cfg.__dict__, "fused": fused})
    cfg_bf16 = DirectGCNConfig(
        **{**cfg.__dict__, "fused": fused, "compute_dtype": "bfloat16"}
    )
    a, ea = directgcn_apply(params, dg, jnp.asarray(x), cfg_f32)
    b, eb = directgcn_apply(params, dg, jnp.asarray(x), cfg_bf16)
    # bf16 compute keeps the whole tail (gating, decoder, stored log_sm) in
    # bf16 — at 5-gram hypercube scale every f32 [A, G, ·] buffer is ~2 GB.
    # Softmax math itself runs in f32 (torch-AMP-equivalent stability).
    assert b.dtype == jnp.bfloat16
    b = b.astype(jnp.float32)
    scale = float(np.abs(np.asarray(a)).max())
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) <= 0.03 * scale
    assert float(np.abs(np.asarray(ea) - np.asarray(eb)).max()) <= 0.05


def test_fused_equals_unfused(setup):
    dg, mats, cfg, params, x = setup
    cfg_f = DirectGCNConfig(**{**cfg.__dict__, "fused": True})
    cfg_u = DirectGCNConfig(**{**cfg.__dict__, "fused": False})
    a, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg_f)
    b, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg_u)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_pe_applied_at_level1(rng):
    n = 20
    dg, mats = make_device_graph(rng, n)
    d1 = 8
    cfg = DirectGCNConfig(
        layer_dims=(d1, 8), num_nodes=n, num_classes=3, n_gram_len=1,
        one_gram_dim=d1, max_pe_len=16,
    )
    params = init_directgcn_params(jax.random.PRNGKey(1), cfg)
    assert "pe_table" in params and params["pe_table"].shape == (16, d1)
    x = rng.normal(size=(n, d1)).astype(np.float32)
    got, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg)
    want, _ = oracle_forward(params, mats, x, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_subgraph_original_indices(rng):
    """Per-node gates must be gathered by original id for subgraph batches
    (reference: protgram_directgcn.py:116-128)."""
    n_full, n_sub = 30, 10
    dg, mats = make_device_graph(rng, n_sub)
    cfg = DirectGCNConfig(layer_dims=(8, 8), num_nodes=n_full, num_classes=3, n_gram_len=2, one_gram_dim=0)
    params = init_directgcn_params(jax.random.PRNGKey(2), cfg)
    orig = jnp.asarray(rng.choice(n_full, n_sub, replace=False).astype(np.int32))
    x = rng.normal(size=(n_sub, 8)).astype(np.float32)
    out, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg, original_indices=orig)
    # Oracle: slice the per-node params to the subgraph.
    sliced = dict(params)
    sliced["layers"] = [dict(params["layers"][0])]
    for name in ("c_in", "c_out", "c_directed", "c_undirected", "c_all", "constant"):
        sliced["layers"][0][name] = np.asarray(params["layers"][0][name])[np.asarray(orig)]
    want, _ = oracle_forward(sliced, mats, x, cfg)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-5)


def test_dropout_only_in_train(setup):
    dg, mats, cfg, params, x = setup
    a, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg, train=False)
    b, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg, train=True, rng=jax.random.PRNGKey(3))
    d, _ = directgcn_apply(params, dg, jnp.asarray(x), cfg, train=True, rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_grads_flow_to_all_params(setup):
    dg, mats, cfg, params, x = setup
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 5, N))

    def loss_fn(p):
        log_sm, _ = directgcn_apply(p, dg, jnp.asarray(x), cfg)
        return -jnp.mean(log_sm[jnp.arange(N), labels])

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # Every layer weight gets nonzero gradient.
    for lp in grads["layers"]:
        for k in ("w_main_in", "w_main_out", "w_und", "w_shared"):
            assert np.abs(np.asarray(lp[k])).max() > 0


def test_remat_matches_plain_forward_and_grads(rng):
    """cfg.remat=True (jax.checkpoint per layer) changes memory, not math."""
    dg, _ = make_device_graph(rng, N)
    base = dict(layer_dims=(16, 24, 8), num_nodes=N, num_classes=5, n_gram_len=2)
    cfg = DirectGCNConfig(**base)
    cfg_r = DirectGCNConfig(**base, remat=True)
    params = init_directgcn_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, 16))

    out, emb = directgcn_apply(params, dg, x, cfg)
    out_r, emb_r = directgcn_apply(params, dg, x, cfg_r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb_r), rtol=1e-6)

    def loss(p, c):
        lo, _ = directgcn_apply(p, dg, x, c)
        return jnp.sum(lo[:, 0])

    gp = jax.grad(lambda p: loss(p, cfg))(params)
    gr = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_remat_paths_matches_plain_on_rg_carry(rng):
    """cfg.remat_paths (per-path checkpoints in the rg fused layer) changes
    memory scheduling, not math: forward and grads equal the plain path."""
    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.graph import transforms
    from protgram_directgcn_tpu.graph.structure import DeviceGraph
    from protgram_directgcn_tpu.ops import hypercube

    seqs = [
        ("P1", "MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ"),
        ("P2", "MKLVTAYIAKQRRQISFVK"),
    ]
    g = NgramGraphBuilder(n_max=2).build_from_sequences(seqs)[1]
    codes, alpha = hypercube.vocab_char_codes(g.vocab)

    def hyper(m):
        s, t, v = transforms.csr_to_coo_arrays(m)
        return hypercube.build_hypercube(s, t, v, codes, alpha)

    p_in = hyper(g.mathcal_a_in())
    dg = DeviceGraph(
        p_in=p_in, p_out=hyper(g.mathcal_a_out()), p_und=hyper(g.undirected_norm()),
        num_nodes=p_in.n_out, node_map=p_in.node_map,
    )
    a, gd = p_in.feature_shape
    base = dict(
        layer_dims=(16, 24, 8), num_nodes=dg.num_nodes, num_classes=5,
        n_gram_len=2, max_pe_len=0, dropout=0.0,
    )
    cfg = DirectGCNConfig(**base, remat=True)
    cfg_rp = DirectGCNConfig(**base, remat=True, remat_paths=True)
    params = init_directgcn_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (a, gd, 16))

    # remat_paths distributes the gate product into the paths
    # (out = Σ gate_k·path_k + const), so results differ from the plain
    # nested combine only by f32 reassociation.
    out, _ = directgcn_apply(params, dg, x, cfg, flatten_rg=False)
    out_rp, _ = directgcn_apply(params, dg, x, cfg_rp, flatten_rg=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rp), rtol=1e-4, atol=1e-6)

    def loss(p, c):
        lo, _ = directgcn_apply(p, dg, x, c, flatten_rg=False)
        return jnp.sum(lo[..., 0])

    gp = jax.grad(lambda p: loss(p, cfg))(params)
    gr = jax.grad(lambda p: loss(p, cfg_rp))(params)
    for a_, b_ in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6)
