"""Finish the r5 seed-averaged benchmark: CiteSeer + PubMed.

The round-5 wall clock killed experiments/run_benchmark_r05.py mid-CiteSeer
(CiteSeer_Undirected had 7/10 model histories and neither CiteSeer nor
PubMed rows made it into benchmark_rows_r05.json).  This driver re-runs the
two missing datasets with the same protocol (10 seeds for CiteSeer, 6 for
the big synthetic PubMed stand-in), MERGES the rows into the existing
artifact, and rewrites the incremental summary after each dataset so a kill
keeps whatever completed.

Run: python experiments/run_benchmark_r05_finish.py [epochs]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

OUT = Path("/root/repo/artifacts/results_r05")
ROWS = OUT / "benchmark_rows_r05.json"
DATASETS = ["CiteSeer", "PubMed"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    from experiments.run_benchmark_r05 import write_summary
    from protgram_directgcn_tpu.bench.gnn_benchmarker import GNNBenchmarker
    from protgram_directgcn_tpu.config import Config

    results = json.loads(ROWS.read_text()) if ROWS.exists() else []
    done = {r["dataset"].rsplit("_", 1)[0] for r in results}

    cfg = Config()
    cfg.paths.base_output_dir = OUT
    cfg.benchmark.seed_average_datasets = list(DATASETS)
    cfg.benchmark.save_embeddings = False

    t0 = time.time()
    bench = GNNBenchmarker(cfg)
    for name in DATASETS:
        if name in done:
            print(f"[{name}] already present, skipping", flush=True)
            continue
        cfg.benchmark.n_seeds = 6 if name == "PubMed" else 10
        results += bench.run(epochs=epochs, datasets=[name])
        with open(ROWS, "w") as f:
            json.dump(results, f, indent=1, default=float)
        write_summary(results, epochs, 10)
        print(f"[{name}] done ({time.time() - t0:.0f}s)", flush=True)
    print(f"benchmark finish done in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
