"""Sweep the fixed benchmark variant: production-normalized operators +
decoder-bottleneck floor, deep [256,128,64], KarateClub, seed-averaged."""
import jax

jax.config.update("jax_platforms", "cpu")

import itertools
import numpy as np
import jax.numpy as jnp
import optax

from protgram_directgcn_tpu.bench.datasets import karate_club
from protgram_directgcn_tpu.bench.gnn_benchmarker import seeded_split
from protgram_directgcn_tpu.graph.structure import DeviceGraph
from protgram_directgcn_tpu.graph.transforms import (
    coalesce_coo, directgcn_propagation_matrix, undirected_normalized_matrix,
    csr_to_coo_arrays,
)
from protgram_directgcn_tpu.ops.spmm import build_adjacency
from protgram_directgcn_tpu.models.directgcn import (
    DirectGCNConfig, directgcn_apply, init_directgcn_params,
)
import jax.random as jr

ds = karate_club()
n, c = ds.num_nodes, ds.num_classes
src = ds.edge_index[0].astype(np.int32)
tgt = ds.edge_index[1].astype(np.int32)
ones = np.ones(len(src), np.float32)

a = coalesce_coo(src, tgt, ones, n)
m_out = directgcn_propagation_matrix(a.T)
m_in = directgcn_propagation_matrix(a)
und = undirected_normalized_matrix(src, tgt, n)


def build(m, feat_dim):
    s, t, w = csr_to_coo_arrays(m)
    return build_adjacency(s, t, w, n, feat_dim=feat_dim)


x = jnp.asarray(ds.x)
y = jnp.asarray(ds.y.astype(np.int32))


def run(depth_dims, seed, lr, dropout, dec_floor, epochs=300):
    layer_dims = tuple([n] + depth_dims + [c])
    cfg = DirectGCNConfig(layer_dims=layer_dims, num_nodes=n, num_classes=c,
                          n_gram_len=0, one_gram_dim=0, max_pe_len=0,
                          dropout=dropout, use_vector_coeffs=True)
    graph = DeviceGraph(p_in=build(m_in, max(layer_dims)),
                        p_out=build(m_out, max(layer_dims)),
                        p_und=build(und, max(layer_dims)), num_nodes=n)
    masks = seeded_split(n, {"train": 0.1, "val": 0.1, "test": 0.8}, seed)
    train_mask = jnp.asarray(masks[0])
    params = init_directgcn_params(jax.random.PRNGKey(seed), cfg)
    if dec_floor > 1:
        fdim = layer_dims[-1]
        h = max(dec_floor, fdim // 2)
        k1, k2 = jr.split(jax.random.PRNGKey(seed + 1))
        lim1 = (1.0 / fdim) ** 0.5
        lim2 = (1.0 / h) ** 0.5
        params["decoder"] = {
            "w1": jr.uniform(k1, (fdim, h), jnp.float32, -lim1, lim1),
            "b1": jnp.zeros((h,)),
            "w2": jr.uniform(k2, (h, c), jnp.float32, -lim2, lim2),
            "b2": jnp.zeros((c,)),
        }

    opt = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(lr))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits, _ = directgcn_apply(p, graph, x, cfg, train=True, rng=rng)
            logp = jax.nn.log_softmax(logits, axis=-1)
            per = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            return jnp.sum(per * train_mask) / jnp.maximum(train_mask.sum(), 1.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def ev(params):
        logits, _ = directgcn_apply(params, graph, x, cfg, train=False)
        return jnp.argmax(logits, -1)

    rng = jax.random.PRNGKey(seed * 31 + 5)
    best_val, best_test = -1.0, 0.0
    for epoch in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        pred = np.asarray(ev(params))
        correct = pred == np.asarray(y)
        av, at = correct[masks[1]].mean(), correct[masks[2]].mean()
        if av >= best_val:
            best_val, best_test = av, at
    return best_test


SEEDS = list(range(6))
for depth_dims, lr, dropout, dec_floor in itertools.product(
        ([256, 128, 64], [64]), (1e-3, 5e-3), (0.5, 0.2), (8,)):
    accs = [run(depth_dims, s, lr, dropout, dec_floor) for s in SEEDS]
    print(f"dims={depth_dims} lr={lr} drop={dropout} floor={dec_floor}: "
          f"mean={np.mean(accs):.3f} accs={[f'{a:.2f}' for a in accs]}", flush=True)
