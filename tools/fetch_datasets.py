"""Download the real benchmark datasets into a ``benchmark.dataset_root``.

This environment has no network egress, so the benchmark suite substitutes
stamped synthetic stand-ins (bench/datasets.py).  In an egress-enabled
environment, run this once and pass the root to the suite:

    python tools/fetch_datasets.py --root /data/benchmark_datasets
    python main.py ... --set benchmark.dataset_root=/data/benchmark_datasets

Sources are the SAME raw files the reference's PyG loaders download
(reference: src/benchmarks/gnn_benchmarker.py:54-119): Planetoid ind.* raws
from the kimiyoung/planetoid repository and WebKB out1_* raws from the
geom-gcn repository.  After download, every dataset is validated three ways:

1. parse: the production parsers (bench/datasets._parse_planetoid /
   _parse_webkb) must load it,
2. shape: node/feature/class counts must equal the published dataset shapes,
3. checksum: sha256 of every raw file is recorded to ``checksums.json`` in
   the root; re-running verifies against the recorded values (or against a
   pinned file passed via --verify-against) so silent upstream changes are
   caught.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANETOID_BASE = "https://github.com/kimiyoung/planetoid/raw/master/data"
WEBKB_BASE = (
    "https://raw.githubusercontent.com/graphdml-uiuc-jlu/geom-gcn/master/new_data"
)

PLANETOID = ("Cora", "CiteSeer", "PubMed")
WEBKB = ("Cornell", "Texas", "Wisconsin")
PLANETOID_SUFFIXES = ("x", "tx", "allx", "y", "ty", "ally", "graph", "test.index")

# Published dataset shapes (nodes, features, classes) — validation layer 2.
EXPECTED_SHAPES = {
    "Cora": (2708, 1433, 7),
    "CiteSeer": (3327, 3703, 6),
    "PubMed": (19717, 500, 3),
    "Cornell": (183, 1703, 5),
    "Texas": (183, 1703, 5),
    "Wisconsin": (251, 1703, 5),
}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _download(url: str, dest: str) -> None:
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    print(f"  GET {url}")
    with urllib.request.urlopen(url, timeout=60) as r, open(dest, "wb") as f:
        f.write(r.read())


def fetch(root: str, names, verify_against: str | None) -> int:
    from protgram_directgcn_tpu.bench.datasets import (
        _parse_planetoid,
        _parse_webkb,
    )

    pinned = {}
    if verify_against:
        with open(verify_against) as f:
            pinned = json.load(f)
    checks_path = os.path.join(root, "checksums.json")
    if os.path.exists(checks_path) and not pinned:
        with open(checks_path) as f:
            pinned = json.load(f)

    recorded = {}
    failures = 0
    for name in names:
        print(f"[{name}]")
        raw = os.path.join(root, name, "raw")
        files = []
        if name in PLANETOID:
            for s in PLANETOID_SUFFIXES:
                fn = f"ind.{name.lower()}.{s}"
                dest = os.path.join(raw, fn)
                if not os.path.exists(dest):
                    _download(f"{PLANETOID_BASE}/{fn}", dest)
                files.append(dest)
        elif name in WEBKB:
            for fn in ("out1_node_feature_label.txt", "out1_graph_edges.txt"):
                dest = os.path.join(raw, fn)
                if not os.path.exists(dest):
                    _download(f"{WEBKB_BASE}/{name.lower()}/{fn}", dest)
                files.append(dest)
        else:
            print(f"  unknown dataset {name}; skipping")
            continue

        # 3. checksums
        for path in files:
            rel = os.path.relpath(path, root)
            digest = _sha256(path)
            recorded[rel] = digest
            if rel in pinned and pinned[rel] != digest:
                print(f"  CHECKSUM MISMATCH {rel}: {digest} != pinned {pinned[rel]}")
                failures += 1

        # 1+2. parse + shape validation through the production loaders
        ds = (
            _parse_planetoid(root, name)
            if name in PLANETOID
            else _parse_webkb(root, name)
        )
        if ds is None:
            print("  PARSE FAILED (files missing or malformed)")
            failures += 1
            continue
        got = (ds.num_nodes, ds.x.shape[1], ds.num_classes)
        want = EXPECTED_SHAPES[name]
        status = "ok" if got == want else f"SHAPE MISMATCH (want {want})"
        if got != want:
            failures += 1
        print(f"  nodes={got[0]} features={got[1]} classes={got[2]} edges="
              f"{ds.edge_index.shape[1]} [{status}]")

    with open(checks_path, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
    print(f"checksums recorded to {checks_path}")
    return failures


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--root", required=True, help="dataset root to populate")
    ap.add_argument("--datasets", nargs="*", default=list(PLANETOID + WEBKB))
    ap.add_argument(
        "--verify-against",
        help="pinned checksums.json to validate downloads against",
    )
    args = ap.parse_args()
    failures = fetch(args.root, args.datasets, args.verify_against)
    if failures:
        print(f"{failures} validation failure(s)")
        sys.exit(1)
    print("all datasets validated")


if __name__ == "__main__":
    main()
