"""Chase the r5 staged-step profile anomaly (MEMWALL_r05.json per_stage):
path2.1 at 233 ms and path1.2 at 176 ms vs ~90 ms for sibling paths with
IDENTICAL modeled HBM traffic (17.15 GB).  Worth ~0.23 s/step if fixable.

Method: PROTGRAM_PATH_PROBE=R re-runs each path's COMPILED program R times
on copies of its donated args immediately before the production call
(pipeline/trainer.py _probe_path).  If probe reps match the slow production
time, the program is intrinsically slow at that device state; if reps are
fast, the production call pays a transient (allocator/defrag/first-touch)
cost.

Run on TPU, idle host: python experiments/exp_path_anomaly_r5.py
Writes experiments/PATHPROBE_r05.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ["PROTGRAM_STAGE_TIMING"] = "1"
os.environ.setdefault("PROTGRAM_PATH_PROBE", "2")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from experiments.exp_memwall_r5 import (  # noqa: E402
    build_graph,
    log,
    make_step_inputs,
    run_steps,
)


def main():
    dg = build_graph(jnp)
    step, params, opt_state, inputs = make_step_inputs(jax, jnp, dg)
    times, losses = run_steps(jax, jnp, step, params, opt_state, dg, inputs,
                              3, "probe")
    out = {"step_times_s": [round(t, 3) for t in times],
           "probe_reps": int(os.environ["PROTGRAM_PATH_PROBE"]),
           "stages": {}}
    for tag, samples in sorted(step.stage_times.items()):
        steady = samples[1:] if len(samples) > 1 else samples
        if tag.startswith("probe"):
            out["stages"][tag] = {
                "all_copy_ms": [round(s[0] * 1e3, 1) for s in samples],
                "all_exec_ms": [round(s[1] * 1e3, 1) for s in samples],
            }
        else:
            out["stages"][tag] = {
                "mean_stage_ms": round(
                    float(np.mean([s[0] for s in steady])) * 1e3, 1),
                "all_stage_ms": [round(s[0] * 1e3, 1) for s in samples],
            }
    with open("/root/repo/experiments/PATHPROBE_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    for tag in sorted(out["stages"]):
        log(f"{tag}: {out['stages'][tag]}")


if __name__ == "__main__":
    main()
