"""Round-3 scaling run: curves on the REAL cached 5-gram graph (VERDICT r2
item #3) over the 8-virtual-device CPU mesh; writes SCALING_r03.json.

Run: python experiments/run_scaling_r03.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

from protgram_directgcn_tpu.bench.scaling import fivegram_scaling_report  # noqa: E402

NOTE = (
    "8 virtual CPU devices on ONE host. Unlike SCALING_r02 (synthetic "
    "pattern toys), every curve here runs the CACHED 5-gram bench graph "
    "(2.51M nodes / 12.6M edges, the BASELINE-named workload) with real "
    "edge values; hyper_shard scatters the REAL banks (bf16). The graph is "
    "fixed while shards grow, so on shared hardware the ideal is constant "
    "aggregate throughput; aggregate_retention(D) = rate(D)/rate(1) is the "
    "sharding-overhead measure. The halo curves ride the r3 per-step ring "
    "exchange (no global-s_max padding)."
)


def main():
    results = {"note": NOTE}
    results.update(fivegram_scaling_report())
    with open("/root/repo/SCALING_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    for curve in ("halo", "tri_halo", "hyper_shard"):
        last = results[curve][-1]
        print(
            f"{curve}: D={last['shards']} retention={last['aggregate_retention']:.3f}"
        )


if __name__ == "__main__":
    main()
