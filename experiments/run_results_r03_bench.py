"""Round-3 benchmark-suite artifact run (VERDICT r2 item #5, second half).

Runs the full GNN benchmark suite — 7 datasets x {original, undirected} x
(7 zoo models + DirectGCN) at the reference's hyperparameters — and commits
the summary CSV + a readable accuracy table.  KarateClub is real; the other
datasets are seeded synthetic stand-ins (no network egress), stamped
synthetic=True in every result row.

Run: python experiments/run_results_r03_bench.py   (CPU, ~1-2 h)
"""

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

OUT = "/root/repo/artifacts/results_r03"


def main():
    from protgram_directgcn_tpu.config import Config
    from protgram_directgcn_tpu.bench.gnn_benchmarker import GNNBenchmarker

    cfg = Config()
    cfg.paths.base_output_dir = __import__("pathlib").Path(
        "/root/repo/data/results_r03/bench"
    )
    cfg.gcn.hidden_layer_dims = [256, 128, 64]  # reference default stack
    results = GNNBenchmarker(cfg).run()

    os.makedirs(OUT, exist_ok=True)
    src_csv = str(cfg.paths.benchmarking_results_dir / "gnn_benchmark_FULL_SUMMARY.csv")
    shutil.copy(src_csv, os.path.join(OUT, "gnn_benchmark_FULL_SUMMARY.csv"))

    # Readable accuracy table: dataset x model test accuracy.
    import pandas as pd

    df = pd.DataFrame([r for r in results if "test_accuracy" in r])
    pivot = df.pivot_table(
        index="dataset", columns="model", values="test_accuracy"
    ).round(4)
    lines = [
        "# GNN benchmark accuracies (round 3)",
        "",
        "Test accuracy at the best validation epoch, 200 epochs, reference",
        "hyperparameters.  KarateClub is real data; all other datasets are",
        "seeded synthetic stand-ins (`synthetic` column in the CSV).",
        "",
        pivot.to_markdown(),
        "",
        "Mean accuracy by model:",
        "",
        df.groupby("model")["test_accuracy"].mean().round(4).sort_values(
            ascending=False
        ).to_markdown(),
    ]
    with open(os.path.join(OUT, "benchmark_summary.md"), "w") as f:
        f.write("\n".join(str(l) for l in lines) + "\n")
    print(pivot)
    print("[bench] artifacts written to", OUT)


if __name__ == "__main__":
    main()
