"""Keras-vs-JAX eval-MLP head-to-head on IDENTICAL fold features (VERDICT r4 #5).

TensorFlow 2.21 is installed, so the reference's actual Keras MLP
(reference: src/models/mlp.py:39-73, imported VERBATIM from /root/reference)
and our JAX MLP (protgram_directgcn_tpu/models/mlp.py) train on the exact
same per-fold feature matrices, folds, class weights, and protocol
(reference: ppi_main.py:86-166 — StratifiedKFold(5), concatenate edge
features, balanced class weights, batch 1024, EarlyStopping on val_loss
patience 10 restore-best).  Two rows:

- parity: raw features (the reference applies no input normalization) —
  adjudicates r4's assumption that AUC~0.54 on raw RAW-set features is
  reference behavior, not our bug.
- std: per-fold train-statistics standardization (our opt-in flag).

Inputs: the family-structured corpus artifacts from run_results_r03.py
(data/results_r03).  Output: artifacts/results_r05/MLP_HEADTOHEAD_r05.json
with per-fold AUC/F1 for both frameworks and their deltas.

Run: python experiments/run_results_r03.py && python experiments/run_mlp_headtohead_r05.py
"""

from __future__ import annotations

import json
import os
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

ROOT = pathlib.Path("/root/repo/data/results_r03")
OUT = pathlib.Path("/root/repo/artifacts/results_r05")

EPOCHS = 150
PATIENCE = 10
BATCH = 1024
SEED = 42


def load_fold_data():
    """Pairs + concatenate edge features, exactly as pipeline/ppi.py builds them."""
    from protgram_directgcn_tpu.utils import embeddings as emb_utils
    from protgram_directgcn_tpu.utils import io as uio

    pos, neg = [], []
    for batch in uio.stream_interaction_pairs(ROOT / "ground_truth" / "positive_interactions.csv", 1, 8192):
        pos.extend(batch)
    for batch in uio.stream_interaction_pairs(ROOT / "ground_truth" / "negative_interactions.csv", 0, 8192):
        neg.extend(batch)
    pairs = pos + neg
    rng = np.random.default_rng(SEED)
    rng.shuffle(pairs)

    h5 = ROOT / "results" / "2_gcn_embeddings" / "gcn_n3_embeddings.h5"
    with uio.EmbeddingStore(h5) as store:
        keys = store.get_keys()
        usable = [p for p in pairs if p[0] in keys and p[1] in keys]
        vectors = {pid: store[pid] for pid in keys}
    dim = next(iter(vectors.values())).shape[0]
    feats = np.zeros((len(usable), dim * 2), dtype=np.float32)
    labels = np.zeros(len(usable), dtype=np.int32)
    for i, (a, b, y) in enumerate(usable):
        feats[i] = emb_utils.make_edge_feature(vectors[a], vectors[b], "concatenate")
        labels[i] = y
    return feats, labels


def class_weights(y):
    """Balanced weights exactly as the reference computes them
    (reference: ppi_main.py:113-121)."""
    n = len(y)
    n_pos = int(y.sum())
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    return {0: (1.0 / n_neg) * (n / 2.0), 1: (1.0 / n_pos) * (n / 2.0)}


def eval_preds(y_true, proba):
    from sklearn.metrics import f1_score, roc_auc_score

    return {
        "auc": float(roc_auc_score(y_true, proba)),
        "f1": float(f1_score(y_true, (proba >= 0.5).astype(int))),
    }


def run_keras_fold(x_tr, y_tr, x_te, y_te, cw, seed):
    """The reference MLP, imported verbatim and trained per its protocol."""
    import tensorflow as tf

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from src.models.mlp import MLP as RefMLP

    tf.keras.utils.set_random_seed(seed)
    mlp_params = {"dense1_units": 128, "dropout1_rate": 0.4,
                  "dense2_units": 64, "dropout2_rate": 0.4, "l2_reg": 1e-5}
    model = RefMLP(x_tr.shape[1], mlp_params, 1e-3).build()
    model.fit(
        x_tr, y_tr, batch_size=BATCH, epochs=EPOCHS,
        validation_data=(x_te, y_te), class_weight=cw, verbose=0,
        callbacks=[tf.keras.callbacks.EarlyStopping(
            monitor="val_loss", patience=PATIENCE, restore_best_weights=True)],
    )
    return model.predict(x_te, batch_size=BATCH, verbose=0).ravel()


def run_jax_fold(x_tr, y_tr, x_te, y_te, cw, seed):
    """Our MLP under the same protocol (early stop on val loss, restore best)."""
    from protgram_directgcn_tpu.models.mlp import MLPConfig, MLPTrainer

    cfg = MLPConfig(input_dim=x_tr.shape[1])
    trainer = MLPTrainer(cfg, seed=seed)
    rng = np.random.default_rng(seed)
    best_val, best_params, stall = np.inf, trainer.params, 0

    def batches(x, y, shuffle=False):
        idx = rng.permutation(len(x)) if shuffle else np.arange(len(x))
        for i in range(0, len(idx), BATCH):
            sel = idx[i:i + BATCH]
            yield x[sel], y[sel].astype(np.float32)

    for _ in range(EPOCHS):
        trainer.fit_epoch(batches(x_tr, y_tr, shuffle=True), cw)
        proba = trainer.predict_proba(x_te)
        eps = 1e-7
        val = float(np.mean(-(y_te * np.log(proba + eps) + (1 - y_te) * np.log(1 - proba + eps))))
        if val < best_val - 1e-6:
            best_val, best_params, stall = val, jax.tree.map(lambda a: a, trainer.params), 0
        else:
            stall += 1
            if stall >= PATIENCE:
                break
    trainer.params = best_params
    return trainer.predict_proba(x_te)


def main():
    from sklearn.model_selection import StratifiedKFold

    OUT.mkdir(parents=True, exist_ok=True)
    feats, labels = load_fold_data()
    print(f"features {feats.shape}, positives {labels.sum()}/{len(labels)}", flush=True)
    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=SEED)
    folds = list(skf.split(np.zeros(len(labels)), labels))

    results = {"rows": {}, "note": (
        "Identical fold features/folds/class-weights/protocol through the "
        "reference Keras MLP (verbatim import) and the JAX MLP. parity row = "
        "raw features (reference applies no normalization); std row = "
        "per-fold train-stat standardization.")}
    for tag, standardize in (("parity", False), ("std", True)):
        fold_rows = []
        for fi, (tr, te) in enumerate(folds):
            x_tr, x_te = feats[tr], feats[te]
            y_tr, y_te = labels[tr], labels[te]
            if standardize:
                mu = x_tr.mean(0, dtype=np.float64)
                sd = x_tr.std(0, dtype=np.float64) + 1e-8
                x_tr = ((x_tr - mu) / sd).astype(np.float32)
                x_te = ((x_te - mu) / sd).astype(np.float32)
            cw = class_weights(y_tr)
            keras_m = eval_preds(y_te, run_keras_fold(x_tr, y_tr, x_te, y_te, cw, SEED + fi))
            jax_m = eval_preds(y_te, run_jax_fold(x_tr, y_tr, x_te, y_te, cw, SEED + fi))
            fold_rows.append({"fold": fi, "keras": keras_m, "jax": jax_m,
                              "delta_auc": round(jax_m["auc"] - keras_m["auc"], 4),
                              "delta_f1": round(jax_m["f1"] - keras_m["f1"], 4)})
            print(f"[{tag}] fold {fi}: keras auc={keras_m['auc']:.4f} "
                  f"jax auc={jax_m['auc']:.4f}", flush=True)
        agg = {
            side: {
                "auc_mean": round(float(np.mean([r[side]["auc"] for r in fold_rows])), 4),
                "auc_std": round(float(np.std([r[side]["auc"] for r in fold_rows])), 4),
                "f1_mean": round(float(np.mean([r[side]["f1"] for r in fold_rows])), 4),
            }
            for side in ("keras", "jax")
        }
        agg["mean_abs_delta_auc"] = round(float(np.mean([abs(r["delta_auc"]) for r in fold_rows])), 4)
        results["rows"][tag] = {"folds": fold_rows, "aggregate": agg}
        print(f"[{tag}] aggregate: {agg}", flush=True)

    with open(OUT / "MLP_HEADTOHEAD_r05.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", OUT / "MLP_HEADTOHEAD_r05.json")


if __name__ == "__main__":
    main()
