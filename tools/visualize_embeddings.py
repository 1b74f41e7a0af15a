"""Headless t-SNE embedding visualizer.

Re-design of the reference's PyQt5 GUI viewer (reference:
src/visualization/visualization_main.py:32-158, visualization_worker.py:90-175)
as a CLI with the same three embedding modes:

- ``per_protein``  (default): 1-D datasets are points; 2-D [L, D] per-residue
  datasets are mean-pooled to one point per protein (so mixed files work).
  One scatter, one color per input file.
- ``per_residue``: each 2-D [L, D] dataset becomes its OWN figure (a scatter
  of residue rows), mirroring the reference's per-protein figures
  (reference: visualization_worker.py:126-139); capped by --max-proteins.
- ``multi_set``: every dataset's rows are points labeled by the dataset key
  (1-D entries contribute one row), the reference's generic_multiple_sets.
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np


def _tsne(mat: np.ndarray, perplexity: float, seed: int) -> np.ndarray:
    from sklearn.manifold import TSNE

    # Perplexity auto-clamp (reference: visualization_worker.py:43-45).
    perplexity = min(perplexity, max(1.0, (len(mat) - 1) / 3.0))
    return TSNE(
        n_components=2, perplexity=perplexity, random_state=seed, init="pca"
    ).fit_transform(mat)


def _scatter(pts: np.ndarray, labels, title: str, output_png: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(10, 8))
    if labels is None:
        plt.scatter(pts[:, 0], pts[:, 1], s=8, alpha=0.7)
    else:
        labels = np.asarray(labels)
        for name in sorted(set(labels.tolist())):
            sel = labels == name
            plt.scatter(pts[sel, 0], pts[sel, 1], s=8, alpha=0.7, label=str(name))
        if len(set(labels.tolist())) <= 25:
            plt.legend(fontsize=7)
    plt.title(title)
    out_dir = os.path.dirname(os.path.abspath(output_png))
    os.makedirs(out_dir, exist_ok=True)
    plt.savefig(output_png, dpi=150)
    plt.close()
    print(f"saved t-SNE figure to {output_png}")


def generate_tsne_figure(
    h5_paths, output_png: str, max_points: int = 2000,
    perplexity: float = 30.0, seed: int = 42, mode: str = "per_protein",
    max_proteins: int = 8,
) -> int:
    rng = np.random.default_rng(seed)

    if mode == "per_residue":
        # One figure per 2-D [L, D] dataset (reference behaviour: a scatter
        # of residue embeddings per protein, visualization_worker.py:126-139).
        stem, ext = os.path.splitext(output_png)
        made = 0
        for path in h5_paths:
            with h5py.File(path, "r") as hf:
                for k in list(hf.keys()):
                    if made >= max_proteins:
                        break
                    data = hf[k][:].astype(np.float32)
                    if data.ndim != 2 or data.shape[0] < 4:
                        print(f"skipping {k}: not a per-residue [L, D] dataset")
                        continue
                    if data.shape[0] > max_points:
                        sel = rng.choice(data.shape[0], max_points, replace=False)
                        data = data[sel]
                    pts = _tsne(data, perplexity, seed)
                    _scatter(
                        pts, None,
                        f"t-SNE of per-residue embeddings: {k} ({data.shape[0]} residues)",
                        f"{stem}_{k}{ext or '.png'}",
                    )
                    made += 1
        if not made:
            print("no per-residue datasets found")
            return 1
        return 0

    mat, labels, _ids = load_embedding_vectors(h5_paths, mode, max_points, rng)
    if mat is None:
        print("no vectors loaded")
        return 1

    pts = _tsne(mat, perplexity, seed)
    _scatter(pts, labels, f"t-SNE of {len(mat)} embeddings ({mode})", output_png)
    return 0


def load_embedding_vectors(h5_paths, mode: str, max_points: int, rng):
    """Load (matrix, labels, ids) from embedding H5 files for the
    per_protein / multi_set scatter modes (shared by the headless CLI above
    and the interactive viewer, tools/visualize_gui.py)."""
    vectors, labels, ids = [], [], []
    for path in h5_paths:
        with h5py.File(path, "r") as hf:
            keys = list(hf.keys())
            if mode == "per_protein" and len(keys) > max_points:
                keys = [keys[i] for i in rng.choice(len(keys), max_points, replace=False)]
            for k in keys:
                data = hf[k][:].astype(np.float32)
                if mode == "multi_set":
                    rows = data.reshape(1, -1) if data.ndim == 1 else data
                    for row in rows:
                        vectors.append(row)
                        labels.append(k)
                        ids.append(k)
                else:  # per_protein: pool per-residue matrices to one point
                    v = data.mean(axis=0) if data.ndim == 2 else data
                    vectors.append(v)
                    labels.append(os.path.basename(path))
                    ids.append(k)
    if not vectors:
        return None, [], []
    dims = {len(v) for v in vectors}
    if len(dims) > 1:
        # Mixed widths across files: clamp to the common prefix (PCA'd and
        # raw sets can coexist on one plot, as in the reference GUI).
        dim = min(dims)
        print(f"mixed embedding dims {sorted(dims)}; clamping to {dim}")
        vectors = [v[:dim] for v in vectors]
    mat = np.stack(vectors)
    if len(mat) > max_points:
        sel = rng.choice(len(mat), max_points, replace=False)
        mat = mat[sel]
        labels = [labels[i] for i in sel]
        ids = [ids[i] for i in sel]
    return mat, labels, ids


def main(argv=None):
    p = argparse.ArgumentParser(description="t-SNE scatter of H5 embeddings")
    p.add_argument("h5_files", nargs="+")
    p.add_argument("-o", "--output", default="tsne.png")
    p.add_argument("--max-points", type=int, default=2000)
    p.add_argument("--perplexity", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--mode", choices=["per_protein", "per_residue", "multi_set"],
        default="per_protein",
    )
    p.add_argument("--max-proteins", type=int, default=8,
                   help="per_residue mode: figures to emit at most")
    args = p.parse_args(argv)
    return generate_tsne_figure(
        args.h5_files, args.output, args.max_points, args.perplexity, args.seed,
        mode=args.mode, max_proteins=args.max_proteins,
    )


if __name__ == "__main__":
    sys.exit(main())
