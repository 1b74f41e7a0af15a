"""Link-prediction MLP (JAX) — the evaluation head for PPI tasks.

Functional equivalent of the reference's Keras MLP
(reference: src/models/mlp.py:39-73): Dense(relu, L2) → Dropout →
Dense(relu, L2) → Dropout → Dense(1, sigmoid), Adam + binary cross-entropy,
with class weighting support.  Runs batched on TPU via one jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass(frozen=True)
class MLPConfig:
    input_dim: int
    dense1_units: int = 128
    dropout1_rate: float = 0.4
    dense2_units: int = 64
    dropout2_rate: float = 0.4
    l2_reg: float = 1e-5
    learning_rate: float = 1e-3


def _glorot(key, shape):
    limit = (6.0 / (shape[0] + shape[1])) ** 0.5
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_mlp_params(key: jax.Array, cfg: MLPConfig) -> Dict[str, jnp.ndarray]:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": _glorot(k1, (cfg.input_dim, cfg.dense1_units)),
        "b1": jnp.zeros(cfg.dense1_units),
        "w2": _glorot(k2, (cfg.dense1_units, cfg.dense2_units)),
        "b2": jnp.zeros(cfg.dense2_units),
        "w3": _glorot(k3, (cfg.dense2_units, 1)),
        "b3": jnp.zeros(1),
    }


def mlp_logits(params, x, cfg: MLPConfig, train: bool = False, rng: Optional[jax.Array] = None):
    h = jax.nn.relu(x @ params["w1"] + params["b1"])
    if train and rng is not None and cfg.dropout1_rate > 0:
        r1, r2 = jax.random.split(rng)
        keep = 1.0 - cfg.dropout1_rate
        h = jnp.where(jax.random.bernoulli(r1, keep, h.shape), h / keep, 0.0)
    else:
        r2 = None
    h = jax.nn.relu(h @ params["w2"] + params["b2"])
    if train and r2 is not None and cfg.dropout2_rate > 0:
        keep = 1.0 - cfg.dropout2_rate
        h = jnp.where(jax.random.bernoulli(r2, keep, h.shape), h / keep, 0.0)
    return (h @ params["w3"] + params["b3"])[:, 0]


class MLPTrainer:
    """Mini-batch Adam training over (features, labels) batch iterators."""

    def __init__(self, cfg: MLPConfig, seed: int = 42):
        self.cfg = cfg
        self.params = init_mlp_params(jax.random.PRNGKey(seed), cfg)
        self.opt = optax.adam(cfg.learning_rate)
        self.opt_state = self.opt.init(self.params)
        self.rng = jax.random.PRNGKey(seed + 1)
        self._step = self._make_step()

    def _make_step(self):
        cfg, opt = self.cfg, self.opt

        @jax.jit
        def step(params, opt_state, x, y, sample_w, rng):
            def loss_fn(p):
                logits = mlp_logits(p, x, cfg, train=True, rng=rng)
                bce = optax.sigmoid_binary_cross_entropy(logits, y)
                primary = jnp.sum(bce * sample_w) / jnp.maximum(jnp.sum(sample_w), 1e-8)
                l2 = cfg.l2_reg * (
                    jnp.sum(jnp.square(p["w1"])) + jnp.sum(jnp.square(p["w2"])) + jnp.sum(jnp.square(p["w3"]))
                )
                return primary + l2

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def fit_epoch(
        self,
        batches: Iterator[Tuple[np.ndarray, np.ndarray]],
        class_weight: Optional[Dict[int, float]] = None,
    ) -> float:
        total, count = 0.0, 0
        for x_np, y_np in batches:
            x = jnp.asarray(x_np.astype(np.float32))
            y = jnp.asarray(y_np.astype(np.float32))
            if class_weight:
                w = np.where(y_np > 0, class_weight.get(1, 1.0), class_weight.get(0, 1.0))
            else:
                w = np.ones_like(y_np, dtype=np.float32)
            self.rng, sub = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, x, y, jnp.asarray(w.astype(np.float32)), sub
            )
            total += float(loss)
            count += 1
        return total / max(count, 1)

    def predict_proba(self, x_np: np.ndarray) -> np.ndarray:
        logits = mlp_logits(self.params, jnp.asarray(x_np.astype(np.float32)), self.cfg)
        return np.asarray(jax.nn.sigmoid(logits))
