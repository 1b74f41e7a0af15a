"""Round-4 scaling (VERDICT r3 items #4/#5): five real-5-gram curves —
halo, tri_halo, hyper_shard (issue-early/consume-late z exchange),
hyper_shard_tri (the NEW batched layer-level exchange), and gspmd
(row-sharded ELL, XLA-materialised collectives) — measured with more
repeats than r3 to beat the 2-core virtual-mesh scheduling noise.

Each (curve, run) executes in its OWN SUBPROCESS: XLA:CPU's collective
rendezvous watchdog hard-aborts the process when 8 virtual-device threads
skew past 40 s on this 2-core host (it killed the first r4 attempt at
tri_halo D=8 while a concurrent TPU job stole CPU), and an abort must only
lose that one curve-run.  Run ALONE on the host.

Writes SCALING_r04.json.  Run: python experiments/run_scaling_r04.py [repeats]
"""

import json
import subprocess
import sys
import time

CURVES = ("hyper_shard", "hyper_shard_tri", "gspmd", "halo", "tri_halo")

NOTE = (
    "8 virtual CPU devices on ONE 2-core host; real 5-gram bench graph "
    "(2.51M nodes / 12.6M edges).  The graph is FIXED while shards grow, so "
    "the shared-hardware ideal is constant aggregate throughput; "
    "aggregate_retention(D) = rate(D)/rate(1).  r4 changes vs r3: the "
    "hyper_shard z all-to-all is issued right after K1 and consumed only "
    "after K2's independent local terms (TPU async-collective overlap; on "
    "CPU it is order-only); hyper_shard_tri is the NEW batched layer-level "
    "operator (ONE all_to_all pair per direction for all three matrices); "
    "gspmd is the row-sharded ELL path XLA parallelises itself (VERDICT r3 "
    "weak #7: measure or demote); and every point is the best over "
    "2 x best-of-2 subprocess runs (r3 used one best-of-2) because this "
    "host's thread scheduling dominated the r3 curves (superlinear 2.2x at "
    "D=2 bounded the noise)."
)

CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
from protgram_directgcn_tpu.bench.scaling import fivegram_scaling_report
res = fivegram_scaling_report(shard_counts=[1, 2, 4, 8], curves=[sys.argv[1]])
print("RESULT_JSON:" + json.dumps(res))
"""


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    t0 = time.time()
    best = {"note": NOTE}
    for r in range(repeats):
        for curve in CURVES:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, curve],
                capture_output=True, text=True, timeout=3600,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("RESULT_JSON:")),
                None,
            )
            if line is None:
                print(f"[run {r}] {curve} FAILED (rc={p.returncode}): "
                      f"{p.stderr[-300:]}", file=sys.stderr)
                continue
            res = json.loads(line[len("RESULT_JSON:"):])
            best.setdefault("graph", res["graph"])
            pts = res[curve]
            if curve not in best:
                best[curve] = pts
            else:
                for i, pt in enumerate(pts):
                    if pt["edges_per_s"] > best[curve][i]["edges_per_s"]:
                        best[curve][i] = pt
            print(f"[run {r}] {curve} done ({time.time() - t0:.0f}s)",
                  file=sys.stderr)

    for curve in CURVES:
        if curve not in best:
            continue
        base = best[curve][0]["edges_per_s"]
        for pt in best[curve]:
            pt["aggregate_retention"] = pt["edges_per_s"] / base
            pt["efficiency"] = (pt["edges_per_s"] / pt["shards"]) / base

    with open("/root/repo/SCALING_r04.json", "w") as f:
        json.dump(best, f, indent=1)
    for curve in CURVES:
        if curve in best:
            print(curve, [round(p["aggregate_retention"], 3) for p in best[curve]])


if __name__ == "__main__":
    main()
