"""Round-3 scaling, part 2: the synthetic ngram/uniform curves through the
NEW ring exchange (VERDICT r2 item #4's bar: adversarial retention >= 0.75
at 8 shards, ngram unharmed), plus a clean re-measure of the real-5-gram
halo curve whose D=8 point in part 1 ran concurrently with a TPU compile on
this 2-core host.  Merges everything into SCALING_r03.json.

Run: python experiments/run_scaling_r03b.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def main():
    from protgram_directgcn_tpu.bench.scaling import (
        fivegram_scaling_report,
        weak_scaling_report,
    )

    with open("/root/repo/SCALING_r03.json") as f:
        results = json.load(f)

    results["ngram"] = [p.__dict__ for p in weak_scaling_report(graph="ngram")]
    results["uniform"] = [p.__dict__ for p in weak_scaling_report(graph="uniform")]
    # Clean re-run of the real-graph halo curve (no concurrent jobs).
    redo = fivegram_scaling_report(shard_counts=[1, 2, 4, 8])
    results["halo"] = redo["halo"]
    results["tri_halo"] = redo["tri_halo"]
    results["hyper_shard"] = redo["hyper_shard"]

    with open("/root/repo/SCALING_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    for curve in ("ngram", "uniform", "halo", "tri_halo", "hyper_shard"):
        last = results[curve][-1]
        print(f"{curve}: D={last['shards']} retention={last['aggregate_retention']:.3f}")


if __name__ == "__main__":
    main()
