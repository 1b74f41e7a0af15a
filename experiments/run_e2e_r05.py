"""Round-5 end-to-end regression proof ON TPU with the final r5 code.

Re-runs the r3 downstream-quality pipeline (same family-structured
synthetic corpus and provenance stamping — experiments/run_results_r03.py)
through the CURRENT code on the real tunneled TPU chip:
graph ETL -> hierarchical DirectGCN (staged/lean defaults) -> Word2Vec
(streaming epochs) -> transformer fallback -> PPI CV over every discovered
embedding set.

The last full-pipeline TPU proof was r1; r2-r5 changed the trainer
(staged step, lean syncs, rg-native constants), word2vec (streaming),
and ppi (fold standardization) — this run shows the production defaults
still compose end-to-end on hardware.

Run: python experiments/run_e2e_r05.py      (TPU, ~20-40 min)
Artifacts: artifacts/results_r05/E2E_r05.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax

from run_results_r03 import make_corpus  # noqa: E402 (pure numpy helper)

# run_results_r03 pins CPU at import; undo for this TPU run.
jax.config.update("jax_platforms", None)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np  # noqa: E402

ROOT = "/root/repo/data/results_r05_e2e"
OUT = "/root/repo/artifacts/results_r05"


def main():
    rng = np.random.default_rng(7)
    os.makedirs(ROOT, exist_ok=True)
    os.makedirs(OUT, exist_ok=True)
    proteins, pos, neg = make_corpus(rng)

    fasta = os.path.join(ROOT, "proteins.fasta")
    with open(fasta, "w") as f:
        for pid, seq, _ in proteins:
            f.write(f">sp|{pid}|{pid}_SYN\n{seq}\n")
    gt_dir = os.path.join(ROOT, "ground_truth")
    os.makedirs(gt_dir, exist_ok=True)
    pos_csv = os.path.join(gt_dir, "positive_interactions.csv")
    neg_csv = os.path.join(gt_dir, "negative_interactions.csv")
    for path, pairs in ((pos_csv, pos), (neg_csv, neg)):
        with open(path, "w") as f:
            f.write("protein1,protein2\n")
            for a, b in pairs:
                f.write(f"{a},{b}\n")
    print(f"[e2e] corpus: {len(proteins)} proteins, {len(pos)}+/{len(neg)}- pairs",
          flush=True)

    from pathlib import Path

    from protgram_directgcn_tpu.config import Config

    cfg = Config()
    cfg.paths.base_data_dir = Path(ROOT)
    cfg.paths.base_output_dir = Path(ROOT) / "results"
    cfg.paths.input_fasta = Path(fasta)
    cfg.paths.interactions_positive = Path(pos_csv)
    cfg.paths.interactions_negative = Path(neg_csv)
    cfg.graph_builder.ngram_max_n = 3
    cfg.gcn.hidden_layer_dims = [128, 64]
    cfg.gcn.epochs_per_level = 300
    cfg.gcn.run_sanity_check_ppi = True
    cfg.gcn.pca_target_dim = 64
    cfg.word2vec.epochs = 5
    cfg.eval.n_folds = 5
    cfg.eval.epochs = 150
    cfg.eval.early_stopping_patience = 10

    t0 = time.time()
    stage_s = {}

    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.pipeline.trainer import HierarchicalTrainer

    NgramGraphBuilder(cfg).run()
    stage_s["graph"] = round(time.time() - t0, 1)
    gcn_h5 = HierarchicalTrainer(cfg).run()
    stage_s["gcn"] = round(time.time() - t0 - sum(stage_s.values()), 1)
    print(f"[e2e] GCN embeddings: {gcn_h5}", flush=True)

    from protgram_directgcn_tpu.pipeline.word2vec import Word2VecEmbedder

    w2v_h5 = Word2VecEmbedder(cfg).run()
    stage_s["word2vec"] = round(time.time() - t0 - sum(stage_s.values()), 1)

    from protgram_directgcn_tpu.pipeline.transformer import TransformerEmbedder

    tr_h5 = TransformerEmbedder(cfg).run()
    stage_s["transformer"] = round(time.time() - t0 - sum(stage_s.values()), 1)

    from protgram_directgcn_tpu.pipeline.ppi import PPIPipeline

    results = PPIPipeline(cfg).run(output_dir=cfg.paths.evaluation_results_dir)
    stage_s["ppi"] = round(time.time() - t0 - sum(stage_s.values()), 1)

    summary = {
        "provenance": "synthetic family-structured corpus (r3 generator), "
                      "re-run on the REAL TPU chip with the final r5 code "
                      "(staged/lean trainer defaults, streaming word2vec)",
        "backend": jax.default_backend(),
        "total_s": round(time.time() - t0, 1),
        "stage_s": stage_s,
        "embedding_sets": sorted(
            str(getattr(r, "embedding_name", r)) if not isinstance(r, dict)
            else r.get("embedding_name", str(r))
            for r in (results or [])
        ) if not isinstance(results, dict) else sorted(results),
        "results": results,
    }
    with open(os.path.join(OUT, "E2E_r05.json"), "w") as f:
        json.dump(summary, f, indent=1, default=str)
    print(f"[e2e] DONE backend={summary['backend']} total={summary['total_s']}s",
          flush=True)


if __name__ == "__main__":
    main()
