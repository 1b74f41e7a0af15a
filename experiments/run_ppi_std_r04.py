"""PPI rerun over the r03 artifact embeddings with and without
eval.standardize_features (VERDICT r3 next-step #7).

Uses the committed data/results_r03 corpus + H5 embedding artifacts: the RAW
(un-PCA'd) rows evaluated at chance in r3 (AUC 0.539 / 0.483,
artifacts/results_r03/evaluation_summary.txt) because the reference-parity
MLP takes features raw.  This run reports both rows: parity (flag off) and
standardized (flag on), RAW sets only (the PCA rows were already strong).

Writes artifacts/results_r04/evaluation_{parity,std}/ + a JSON comparison.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = pathlib.Path("/root/repo/data/results_r03")
OUT = pathlib.Path("/root/repo/artifacts/results_r04")

from protgram_directgcn_tpu.config import Config
from protgram_directgcn_tpu.pipeline.ppi import PPIPipeline


def make_cfg(standardize: bool) -> Config:
    cfg = Config()
    cfg.paths.base_data_dir = ROOT
    cfg.paths.base_output_dir = ROOT / "results"
    cfg.paths.interactions_positive = ROOT / "ground_truth" / "positive_interactions.csv"
    cfg.paths.interactions_negative = ROOT / "ground_truth" / "negative_interactions.csv"
    cfg.eval.n_folds = 5
    cfg.eval.epochs = 150
    cfg.eval.early_stopping_patience = 10
    cfg.eval.standardize_features = standardize
    # RAW sets only — the point of the flag.
    cfg.eval.embedding_files_to_evaluate = [
        {"name": "ProtGramDirectGCN",
         "path": ROOT / "results" / "2_gcn_embeddings" / "gcn_n3_embeddings.h5"},
        {"name": "Word2Vec",
         "path": ROOT / "results" / "2_word2vec_embeddings" / "word2vec_dim100_mean.h5"},
    ]
    return cfg


def main():
    rows = {}
    for tag, std in (("parity", False), ("std", True)):
        out_dir = OUT / f"evaluation_{tag}"
        results = PPIPipeline(make_cfg(std)).run(output_dir=out_dir)
        rows[tag] = {
            r["embedding_name"]: {
                "auc": round(r["test_auc"], 4), "auc_std": round(r["test_auc_std"], 4),
                "f1": round(r["test_f1"], 4),
            }
            for r in results
        }
        print(f"[{tag}] {rows[tag]}", flush=True)
    comparison = {
        "note": ("eval.standardize_features=False is exact reference parity "
                 "(reference: src/models/mlp.py:39-73 — no input "
                 "normalization); True standardizes per CV fold on train "
                 "statistics only."),
        "rows": rows,
    }
    with open(OUT / "PPI_STANDARDIZE_r04.json", "w") as f:
        json.dump(comparison, f, indent=1)
    print("wrote", OUT / "PPI_STANDARDIZE_r04.json")


if __name__ == "__main__":
    main()
