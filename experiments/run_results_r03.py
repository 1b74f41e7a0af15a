"""Round-3 downstream-quality run (VERDICT r2 missing #2 / item #5).

Produces committed evidence that the pipelines LEARN: a full
graph -> hierarchical DirectGCN -> Word2Vec -> transformer-fallback -> PPI
CV evaluation on a SYNTHETIC-but-structured corpus (no network egress, so
no real Swiss-Prot/STRING data exists in this environment; provenance is
stamped on every artifact).

Corpus design: 300 proteins in 12 families; each family shares 2-3
conserved motifs inserted into random backbones.  Positive pairs = same
family, negatives = cross family — so an embedder that captures sequence
composition/motifs separates the classes (AUC >> 0.5), and a broken one
does not.  This mirrors the reference's dummy-mode philosophy
(reference: ppi_main.py:40-65) at a scale where learning is measurable.

Run: python experiments/run_results_r03.py   (CPU, ~15 min)
Artifacts: artifacts/results_r03/ (committed) + data/results_r03/ (scratch).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

AA = "ACDEFGHIKLMNPQRSTVWY"
ROOT = "/root/repo/data/results_r03"
OUT = "/root/repo/artifacts/results_r03"


def make_corpus(rng, n_families=12, per_family=25):
    """Family-structured proteins + interaction pairs."""
    motifs = {
        fam: ["".join(rng.choice(list(AA), rng.integers(12, 19))) for _ in range(4)]
        for fam in range(n_families)
    }
    proteins = []  # (id, seq, family)
    for fam in range(n_families):
        for j in range(per_family):
            # ~45% of residues are family motifs (half the positions carry
            # the family signal after pooling), the rest random backbone —
            # enough for composition/structure embedders to separate
            # families, while random pairs within a family keep the task
            # non-trivial.
            backbone = "".join(rng.choice(list(AA), rng.integers(60, 120)))
            seq = backbone
            for m in rng.permutation(motifs[fam])[: rng.integers(3, 5)]:
                pos = int(rng.integers(0, len(seq)))
                seq = seq[:pos] + m + seq[pos:]
            proteins.append((f"F{fam:02d}P{j:03d}", seq, fam))
    rng.shuffle(proteins)

    ids = [p[0] for p in proteins]
    fam_of = {pid: fam for pid, _, fam in proteins}
    pos, neg = set(), set()
    while len(pos) < 2000:
        a, b = rng.choice(ids, 2, replace=False)
        if fam_of[a] == fam_of[b]:
            pos.add((a, b))
    while len(neg) < 2000:
        a, b = rng.choice(ids, 2, replace=False)
        if fam_of[a] != fam_of[b]:
            neg.add((a, b))
    return proteins, sorted(pos), sorted(neg)


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
    print(f"[results] corpus: {len(proteins)} proteins, {len(pos)}+/{len(neg)}- pairs")

    from protgram_directgcn_tpu.config import Config

    cfg = Config()
    cfg.paths.base_data_dir = __import__("pathlib").Path(ROOT)
    cfg.paths.base_output_dir = __import__("pathlib").Path(ROOT) / "results"
    cfg.paths.input_fasta = __import__("pathlib").Path(fasta)
    cfg.paths.interactions_positive = __import__("pathlib").Path(pos_csv)
    cfg.paths.interactions_negative = __import__("pathlib").Path(neg_csv)
    cfg.graph_builder.ngram_max_n = 3
    cfg.gcn.hidden_layer_dims = [128, 64]
    cfg.gcn.epochs_per_level = 300
    cfg.gcn.run_sanity_check_ppi = True
    cfg.gcn.pca_target_dim = 64
    cfg.word2vec.epochs = 5
    cfg.eval.n_folds = 5
    cfg.eval.epochs = 150
    cfg.eval.early_stopping_patience = 10

    # --- stage 1+2: graph -> hierarchical DirectGCN -> pooled embeddings ---
    from protgram_directgcn_tpu.graph.builder import NgramGraphBuilder
    from protgram_directgcn_tpu.pipeline.trainer import HierarchicalTrainer

    NgramGraphBuilder(cfg).run()
    gcn_h5 = HierarchicalTrainer(cfg).run()
    print(f"[results] GCN embeddings: {gcn_h5}")

    # --- stage 3: Word2Vec baseline ----------------------------------------
    from protgram_directgcn_tpu.pipeline.word2vec import Word2VecEmbedder

    w2v_h5 = Word2VecEmbedder(cfg).run()
    print(f"[results] Word2Vec embeddings: {w2v_h5}")

    # --- stage 4: transformer fallback baseline ----------------------------
    from protgram_directgcn_tpu.pipeline.transformer import TransformerEmbedder

    tr_h5 = TransformerEmbedder(cfg).run()
    print(f"[results] transformer embeddings: {tr_h5}")

    # --- stage 5: PPI CV evaluation over all sets --------------------------
    from protgram_directgcn_tpu.pipeline.ppi import PPIPipeline

    results = PPIPipeline(cfg).run(output_dir=cfg.paths.evaluation_results_dir)
    summary = {
        "provenance": "synthetic family-structured corpus (no network egress; "
                      "see experiments/run_results_r03.py)",
        "synthetic": True,
        "n_proteins": len(proteins),
        "n_pos": len(pos),
        "n_neg": len(neg),
        "results": [
            {k: v for k, v in r.items() if k != "roc_data_representative"}
            for r in results
        ],
    }
    with open(os.path.join(OUT, "ppi_results_r03.json"), "w") as f:
        json.dump(summary, f, indent=1)
    # Copy the human-readable evaluation artifacts.
    ev_dir = str(cfg.paths.evaluation_results_dir)
    for name in ("evaluation_summary.txt",):
        src = os.path.join(ev_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(OUT, name))
    for r in results:
        print(
            f"[results] {r['embedding_name']}: AUC={r['test_auc']:.4f}"
            f"±{r['test_auc_std']:.4f} F1={r['test_f1']:.4f}"
        )
    print("[results] done")


if __name__ == "__main__":
    main()
