"""Round-5 benchmark statistical hardening (VERDICT r4 #6).

Runs the full 7-dataset zoo benchmark with the 10-seed protocol extended to
EVERY dataset (init and split re-drawn per seed) and both DirectGCN variants
(raw-adapter parity row + _norm context row), then computes per-dataset
PAIRED Wilcoxon signed-rank tests of each DirectGCN variant vs every zoo
model over the per-seed test accuracies.

Datasets without raw files run as stamped synthetic stand-ins (no egress in
this environment — every row carries synthetic=True); point
benchmark.dataset_root at real raw files to upgrade the evidence.

Writes artifacts/results_r05/benchmark_summary_r05.md + the CSVs under
artifacts/results_r05/4_benchmarking_results/.
Run: python experiments/run_benchmark_r05.py [epochs] [n_seeds]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

OUT = Path("/root/repo/artifacts/results_r05")
# Cheapest-first so a wall-clock kill keeps the most datasets; the big
# synthetic PubMed (6 seeds) runs last.
DATASETS = ["KarateClub", "Cornell", "Texas", "Wisconsin", "Cora", "CiteSeer", "PubMed"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from protgram_directgcn_tpu.config import Config
    from protgram_directgcn_tpu.bench.gnn_benchmarker import GNNBenchmarker

    cfg = Config()
    cfg.paths.base_output_dir = OUT
    cfg.benchmark.seed_average_datasets = list(DATASETS)
    cfg.benchmark.n_seeds = n_seeds
    cfg.benchmark.save_embeddings = False  # seed-averaged rows are the point

    t0 = time.time()
    results = []
    # Dataset-at-a-time so a wall-clock kill keeps completed datasets; the
    # big synthetic PubMed runs at 6 seeds (CPU budget).
    bench = GNNBenchmarker(cfg)
    for name in DATASETS:
        cfg.benchmark.n_seeds = 6 if name == "PubMed" else n_seeds
        results += bench.run(epochs=epochs, datasets=[name])
        with open(OUT / "benchmark_rows_r05.json", "w") as f:
            json.dump(results, f, indent=1, default=float)
        # Incremental summary so a wall-clock kill keeps a valid artifact.
        write_summary(results, epochs, n_seeds)
        print(f"[{name}] done ({time.time() - t0:.0f}s)", flush=True)
    print(f"benchmark done in {time.time() - t0:.0f}s", flush=True)


def write_summary(results, epochs, n_seeds):
    # ---- paired Wilcoxon per dataset-variant: DirectGCN rows vs the zoo.
    from scipy.stats import wilcoxon

    by_variant = {}
    for r in results:
        if "error" in r or "seed_test_accuracies" not in r:
            continue
        by_variant.setdefault(r["dataset"], {})[r["model"]] = r

    lines = [
        "# GNN benchmark, round 5 — seed-averaged rows + paired Wilcoxon",
        "",
        f"Protocol: {n_seeds} seeds per (dataset, model) — parameter init AND "
        f"10/10/80 split re-drawn per seed — {epochs} epochs, best-val "
        "checkpoint per seed.  Every non-KarateClub dataset is a stamped "
        "SYNTHETIC stand-in (no egress; see bench/datasets.py).  Wilcoxon is "
        "the paired signed-rank test over per-seed test accuracies "
        "(reference: results_utils.py's statistical-test block).",
        "",
    ]
    for variant in sorted(by_variant):
        rows = by_variant[variant]
        lines.append(f"## {variant}")
        lines.append("")
        lines.append("| model | test acc (mean±std) | vs ProtGramDirectGCN_norm p | vs ProtGramDirectGCN p |")
        lines.append("|---|---|---|---|")
        norm_scores = rows.get("ProtGramDirectGCN_norm", {}).get("seed_test_accuracies")
        raw_scores = rows.get("ProtGramDirectGCN", {}).get("seed_test_accuracies")

        def pval(a, b):
            if a is None or b is None or len(a) != len(b) or len(a) < 5:
                return "—"
            if np.allclose(a, b):
                return "1.0"
            try:
                return f"{wilcoxon(a, b).pvalue:.3f}"
            except ValueError:
                return "—"

        for model in sorted(rows):
            r = rows[model]
            s = r["seed_test_accuracies"]
            lines.append(
                f"| {model} | {r['test_accuracy']:.4f}±{r['test_accuracy_std']:.4f} "
                f"| {pval(norm_scores, s) if model != 'ProtGramDirectGCN_norm' else '·'} "
                f"| {pval(raw_scores, s) if model != 'ProtGramDirectGCN' else '·'} |"
            )
        lines.append("")

    md = "\n".join(lines)
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "benchmark_summary_r05.md").write_text(md)
    with open(OUT / "benchmark_rows_r05.json", "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("wrote", OUT / "benchmark_summary_r05.md")


if __name__ == "__main__":
    main()
