"""KarateClub seed-averaged benchmark rows for r4 artifacts."""
import jax
jax.config.update("jax_platforms", "cpu")
from protgram_directgcn_tpu.config import Config

cfg = Config()
from pathlib import Path
cfg.paths.base_output_dir = Path("artifacts/results_r04")
b = None
from protgram_directgcn_tpu.bench.gnn_benchmarker import GNNBenchmarker
b = GNNBenchmarker(cfg)
res = b.run(datasets=["KarateClub"])
import json
print(json.dumps(res, indent=1, default=float))
