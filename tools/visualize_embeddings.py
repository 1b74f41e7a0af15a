"""Headless t-SNE embedding visualizer.

Re-design of the reference's PyQt5 GUI viewer (reference:
src/visualization/visualization_main.py:32-158, visualization_worker.py:33-175)
as a CLI: loads one or more H5 embedding files, samples up to --max-points
vectors, runs t-SNE with auto-clamped perplexity, and renders a labeled
scatter PNG (one color per input file).
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np


def generate_tsne_figure(h5_paths, output_png: str, max_points: int = 2000,
                         perplexity: float = 30.0, seed: int = 42) -> int:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    vectors, labels = [], []
    rng = np.random.default_rng(seed)
    for path in h5_paths:
        with h5py.File(path, "r") as hf:
            keys = list(hf.keys())
            if len(keys) > max_points:
                keys = [keys[i] for i in rng.choice(len(keys), max_points, replace=False)]
            for k in keys:
                v = hf[k][:].astype(np.float32).ravel()
                vectors.append(v)
                labels.append(os.path.basename(path))
    if not vectors:
        print("no vectors loaded")
        return 1
    dim = min(len(v) for v in vectors)
    mat = np.stack([v[:dim] for v in vectors])

    # Perplexity auto-clamp (reference: visualization_worker.py:43-45).
    perplexity = min(perplexity, max(1.0, (len(mat) - 1) / 3.0))
    ts = TSNE(n_components=2, perplexity=perplexity, random_state=seed, init="pca")
    pts = ts.fit_transform(mat)

    plt.figure(figsize=(10, 8))
    for name in sorted(set(labels)):
        sel = np.array([l == name for l in labels])
        plt.scatter(pts[sel, 0], pts[sel, 1], s=8, alpha=0.7, label=name)
    plt.legend()
    plt.title(f"t-SNE of {len(mat)} embeddings (perplexity={perplexity:.1f})")
    os.makedirs(os.path.dirname(os.path.abspath(output_png)), exist_ok=True)
    plt.savefig(output_png, dpi=150)
    plt.close()
    print(f"saved t-SNE figure to {output_png}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description="t-SNE scatter of H5 embeddings")
    p.add_argument("h5_files", nargs="+")
    p.add_argument("-o", "--output", default="tsne.png")
    p.add_argument("--max-points", type=int, default=2000)
    p.add_argument("--perplexity", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    return generate_tsne_figure(args.h5_files, args.output, args.max_points, args.perplexity, args.seed)


if __name__ == "__main__":
    sys.exit(main())
