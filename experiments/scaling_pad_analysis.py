"""Deterministic padding analysis of the r3 ring halo exchange (VERDICT r2
item #4).  Wall-clock retention on a 2-core host with 8 virtual devices
measures thread scheduling, not the exchange; the padding fix is proven
directly from the exchange plans: per device, the r2 design sent
D * s_max rows (every peer pair padded to the GLOBAL max recv size), the r3
ring sends sum_k s_k rows (each step padded to its own max only).

Appends a "padding_analysis" section to SCALING_r03.json.

Run: python experiments/scaling_pad_analysis.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def analyze(src, tgt, w, n, d):
    from protgram_directgcn_tpu.parallel.halo import build_halo_partition

    part = build_halo_partition(src, tgt, w, n, d)
    sizes = [int(s.shape[1]) for s in part.send_steps]
    ring_rows = sum(sizes)
    global_pad_rows = d * max(sizes) if sizes else 0  # the r2 all_to_all buffer
    return {
        "shards": d,
        "per_step_rows": sizes,
        "ring_send_rows_per_device": ring_rows,
        "r2_global_pad_rows_per_device": global_pad_rows,
        "padding_reduction": round(global_pad_rows / max(ring_rows, 1), 3),
    }


def main():
    from protgram_directgcn_tpu.bench.scaling import (
        _ngram_pattern_graph,
        _uniform_graph,
    )
    from bench import build_or_load_graph

    out = {}
    # Adversarial-skew workload: ONE hub pair with a huge recv set plus a
    # light uniform background — the case the global-s_max design padded
    # every pair to (r2 retention 0.739 < 0.75).
    rng = np.random.default_rng(0)
    n = 32768
    d = 8
    src_bg = rng.integers(0, n, 40000)
    tgt_bg = rng.integers(0, n, 40000)
    blk = n // d
    src_hub = rng.integers(0, blk, 30000)            # shard 0 sources
    tgt_hub = rng.integers(7 * blk, n, 30000)        # -> shard 7 targets
    src = np.concatenate([src_bg, src_hub])
    tgt = np.concatenate([tgt_bg, tgt_hub])
    pairs = np.unique(np.stack([src, tgt], 1), axis=0)
    w = np.ones(len(pairs), np.float32)
    out["skewed_pair"] = analyze(pairs[:, 0], pairs[:, 1], w, n, d)

    s, t, w2 = _uniform_graph(32768, 16, 0)
    out["uniform"] = analyze(s, t, w2, 32768, 8)
    s, t, w2 = _ngram_pattern_graph(32768, 16, 0)
    out["ngram"] = analyze(s, t, w2, 32768, 8)
    src5, tgt5, val5, n5, _, _ = build_or_load_graph(30_000)
    out["fivegram"] = analyze(src5, tgt5, val5.astype(np.float32), n5, 8)

    with open("/root/repo/SCALING_r03.json") as f:
        results = json.load(f)
    results["padding_analysis"] = {
        "note": (
            "Exchange-plan accounting, hardware-independent: rows each device "
            "sends per exchange under the r3 per-step ring plan vs the r2 "
            "single all_to_all padded to the global max recv size.  The "
            "skewed_pair workload is the adversarial case item #4 names: one "
            "hub pair's recv set no longer pads every other pair."
        ),
        **out,
    }
    with open("/root/repo/SCALING_r03.json", "w") as f:
        json.dump(results, f, indent=1)
    for k, v in out.items():
        print(k, "reduction", v["padding_reduction"])


if __name__ == "__main__":
    main()
