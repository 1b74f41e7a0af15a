"""Round-4 scaling (VERDICT r3 items #4/#5): the four real-5-gram curves —
halo, tri_halo, hyper_shard (now with the issue-early/consume-late z
exchange), and the NEW gspmd row-sharded ELL curve — measured with more
repeats than r3 to beat the 2-core virtual-mesh scheduling noise the r3
verdict flagged (best-of-5 outer repeats per point instead of 2).

Writes SCALING_r04.json.  Run ALONE on the host (no concurrent TPU jobs:
the r3 halo D=8 point was distorted by a concurrent remote compile).

Run: python experiments/run_scaling_r04.py [repeats]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

NOTE = (
    "8 virtual CPU devices on ONE 2-core host; real 5-gram bench graph "
    "(2.51M nodes / 12.6M edges).  The graph is FIXED while shards grow, so "
    "the shared-hardware ideal is constant aggregate throughput; "
    "aggregate_retention(D) = rate(D)/rate(1).  r4 changes vs r3: the "
    "hyper_shard z all-to-all is issued right after K1 and consumed only "
    "after K2's independent local terms (TPU async-collective overlap; on "
    "CPU it is order-only), and every point is the best of 5 outer repeats "
    "(r3 used 2) because this host's thread scheduling dominated the r3 "
    "curves (superlinear 2.2x at D=2 bounded the noise).  gspmd is the "
    "row-sharded ELL path XLA parallelizes itself (VERDICT r3 weak #7: "
    "measure or demote)."
)


def main():
    from protgram_directgcn_tpu.bench import scaling as sc

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    # Patch the time_chain repeat count by running the report with a wrapper:
    # fivegram_scaling_report's inner time_chain does 2 outer repeats; do the
    # extra repeats at this level by taking the elementwise best over runs.
    t0 = time.time()
    best = None
    runs = max(1, (repeats + 1) // 2)  # each report call already takes best-of-2
    for r in range(runs):
        res = sc.fivegram_scaling_report(shard_counts=[1, 2, 4, 8])
        if best is None:
            best = res
            continue
        for curve in ("halo", "tri_halo", "hyper_shard", "hyper_shard_tri", "gspmd"):
            for i, pt in enumerate(res[curve]):
                if pt["edges_per_s"] > best[curve][i]["edges_per_s"]:
                    best[curve][i] = pt
        print(f"[run {r + 1}/{runs}] {time.time() - t0:.0f}s", file=sys.stderr)

    # Recompute retention/efficiency from the merged best rates.
    for curve in ("halo", "tri_halo", "hyper_shard", "hyper_shard_tri", "gspmd"):
        base = best[curve][0]["edges_per_s"]
        for pt in best[curve]:
            pt["aggregate_retention"] = pt["edges_per_s"] / base
            pt["efficiency"] = (pt["edges_per_s"] / pt["shards"]) / base

    best["note"] = NOTE
    with open("/root/repo/SCALING_r04.json", "w") as f:
        json.dump(best, f, indent=1)
    for curve in ("halo", "tri_halo", "hyper_shard", "hyper_shard_tri", "gspmd"):
        pts = best[curve]
        print(curve, [round(p["aggregate_retention"], 3) for p in pts])


if __name__ == "__main__":
    main()
