"""Top-up runs for SCALING_r05.json (VERDICT r4 #3 statistics).

Adds extra subprocess runs of selected curves and MERGES them into the
existing SCALING_r05.json (run_scaling_r05.py rebuilds from scratch and
would discard prior runs + the decomposition key).  Same child + same
within-run ratio-of-medians methodology.

Run ALONE on the host.  Usage:
    python experiments/run_scaling_r05_more.py [extra_runs] [variant,...]
Defaults: 2 extra runs of hyper_shard,hyper_shard_nocomm,gspmd.
"""

import json
import os
import subprocess
import sys
import time

SCALING = "/root/repo/SCALING_r05.json"

ENVS = {
    "hyper_shard": ({}, "hyper_shard"),
    "hyper_shard_nocomm": ({"PROTGRAM_HS_NOCOMM": "1"}, "hyper_shard"),
    "hyper_shard_bf16w": ({"PROTGRAM_HS_WIRE": "bf16"}, "hyper_shard"),
    "hyper_shard_tri": ({}, "hyper_shard_tri"),
    "gspmd": ({}, "gspmd"),
    "halo": ({}, "halo"),
    "tri_halo": ({}, "tri_halo"),
}

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


def merge_run(data, name, pts):
    cur = data.get(name)
    if not cur:
        return
    base = pts[0]["edges_per_s"]
    for i, p in enumerate(cur):
        if i >= len(pts):
            break
        p["edges_per_s_all"].append(round(pts[i]["edges_per_s"], 1))
        p["aggregate_retention_all"].append(
            round(pts[i]["edges_per_s"] / base, 4)
        )
        p["edges_per_s_median"] = round(median(p["edges_per_s_all"]), 1)
        p["aggregate_retention_median"] = round(
            median(p["aggregate_retention_all"]), 4
        )
    data["runs"][name] = len(cur[0]["edges_per_s_all"])


def main():
    extra = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    wanted = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["hyper_shard", "hyper_shard_nocomm", "gspmd"]
    )
    t0 = time.time()
    for r in range(extra):
        for name in wanted:
            env_extra, child_curve = ENVS[name]
            env = dict(os.environ, **env_extra)
            p = subprocess.run(
                [sys.executable, "-c", CHILD, child_curve],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            line = next(
                (ln for ln in p.stdout.splitlines()
                 if ln.startswith("RESULT_JSON:")), None,
            )
            if line is None:
                print(f"[extra {r}] {name} FAILED (rc={p.returncode}): "
                      f"{p.stderr[-300:]}", file=sys.stderr, flush=True)
                continue
            res = json.loads(line[len("RESULT_JSON:"):])
            with open(SCALING) as f:
                data = json.load(f)
            merge_run(data, name, res[child_curve])
            with open(SCALING, "w") as f:
                json.dump(data, f, indent=1)
            rets = [p2["aggregate_retention_median"] for p2 in data[name]]
            print(f"[extra {r}] {name}: medians now {rets} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
