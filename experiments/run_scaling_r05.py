"""Round-5 scaling (VERDICT r4 #3): sound statistics + decomposition.

Methodology changes vs r4 (whose best-over-subprocess-points produced
retentions > 1.0 because each point could draw its best from a DIFFERENT
run than its D=1 denominator):

- every subprocess run measures the FULL [1, 2, 4, 8] curve in-process, so
  each run has its own same-process D=1 baseline;
- retention(D) is computed WITHIN each run, then the MEDIAN across >= 5
  runs is reported (median-of-ratios); rates are medians too;
- each in-child point is best-of-3 (scheduler noise only adds time).

Extra curves for the hyper_shard decomposition:
- hyper_shard_nocomm  — PROTGRAM_HS_NOCOMM=1 replaces the all_to_alls with
  identity (same local gathers/assembles/einsums, no wire): the compute-only
  ceiling.  retention(full)/retention(nocomm) isolates the wire share.
- hyper_shard_bf16w   — PROTGRAM_HS_WIRE=bf16 halves the all_to_all bytes
  (the production TPU wire is bf16 already; this measures the lever on the
  f32 CPU curves).

Run ALONE on the host (XLA:CPU collective watchdog aborts on >40 s thread
skew).  Writes SCALING_r05.json.
Usage: python experiments/run_scaling_r05.py [runs]
"""

import json
import os
import subprocess
import sys
import time

# (curve, env overrides, child curve name, max runs): the halo-family
# children cost 20-35 min each on this 2-core host (12.6M-edge ring
# exchanges), so they get fewer runs than the flagship hyper family.
VARIANTS = [
    ("hyper_shard", {}, "hyper_shard", None),
    ("hyper_shard_nocomm", {"PROTGRAM_HS_NOCOMM": "1"}, "hyper_shard", None),
    ("hyper_shard_bf16w", {"PROTGRAM_HS_WIRE": "bf16"}, "hyper_shard", None),
    ("hyper_shard_tri", {}, "hyper_shard_tri", None),
    ("gspmd", {}, "gspmd", None),
    ("halo", {}, "halo", 2),
    ("tri_halo", {}, "tri_halo", 2),
]

NOTE = (
    "8 virtual CPU devices on ONE 2-core host; real 5-gram bench graph.  "
    "Each run is one subprocess measuring the full D=[1,2,4,8] curve with "
    "its OWN D=1 baseline; reported retention is the MEDIAN across runs of "
    "within-run retention (ratio medians; r4's best-over-runs-per-point "
    "mixed baselines and produced retentions > 1).  Points are best-of-3 "
    "in-child.  hyper_shard_nocomm replaces the all_to_alls with identity "
    "(compute-only ceiling); hyper_shard_bf16w uses a bf16 wire."
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


def median(xs):
    xs = sorted(xs)
    k = len(xs)
    return xs[k // 2] if k % 2 else 0.5 * (xs[k // 2 - 1] + xs[k // 2])


def aggregate(raw, graph, runs):
    out = {"note": NOTE, "graph": graph, "runs": runs}
    for name, _, _, _ in VARIANTS:
        series = raw.get(name, [])
        if not series:
            continue
        pts = []
        n_pts = min(len(s) for s in series)
        for i in range(n_pts):
            d = series[0][i]["shards"]
            rates = [s[i]["edges_per_s"] for s in series]
            rets = [s[i]["edges_per_s"] / s[0]["edges_per_s"] for s in series]
            pts.append({
                "shards": d,
                "edges_per_s_median": round(median(rates), 1),
                "edges_per_s_all": [round(x, 1) for x in rates],
                "aggregate_retention_median": round(median(rets), 4),
                "aggregate_retention_all": [round(x, 4) for x in rets],
            })
        out[name] = pts
    return out


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    t0 = time.time()
    raw = {name: [] for name, _, _, _ in VARIANTS}
    graph = None
    for r in range(runs):
        for name, env_extra, child_curve, cap in VARIANTS:
            if cap is not None and r >= cap:
                continue
            env = dict(os.environ, **env_extra)
            p = subprocess.run(
                [sys.executable, "-c", CHILD, child_curve],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            line = next(
                (ln for ln in p.stdout.splitlines() if ln.startswith("RESULT_JSON:")),
                None,
            )
            if line is None:
                print(f"[run {r}] {name} FAILED (rc={p.returncode}): "
                      f"{p.stderr[-300:]}", file=sys.stderr, flush=True)
                continue
            res = json.loads(line[len("RESULT_JSON:"):])
            graph = graph or res.get("graph")
            raw[name].append(res[child_curve])
            base = res[child_curve][0]["edges_per_s"]
            rets = [round(pt["edges_per_s"] / base, 3) for pt in res[child_curve]]
            print(f"[run {r}] {name}: within-run retention {rets} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
            # Checkpoint after every child so a wall-clock kill keeps data.
            with open("/root/repo/SCALING_r05.json", "w") as f:
                json.dump(aggregate(raw, graph, runs), f, indent=1)

    out = aggregate(raw, graph, runs)
    with open("/root/repo/SCALING_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r05.json", file=sys.stderr)
    for name, _, _, _ in VARIANTS:
        if name in out:
            print(name, [(p["shards"], p["aggregate_retention_median"])
                         for p in out[name]], file=sys.stderr)


if __name__ == "__main__":
    main()
