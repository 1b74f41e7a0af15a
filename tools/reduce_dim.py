"""Standalone global-PCA H5→H5 tool.

Equivalent of the reference's reduce-dim.py (reference: reduce-dim.py:7-102):
collect all vectors from an H5 embedding file, mean-impute NaNs, PCA to the
target dimension, rewrite per-key.
"""

from __future__ import annotations

import argparse
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def process_with_global_pca(input_h5: str, output_h5: str, target_dim: int = 64, seed: int = 42) -> int:
    from sklearn.decomposition import PCA

    with h5py.File(input_h5, "r") as hf:
        keys = list(hf.keys())
        if not keys:
            print("input H5 is empty")
            return 1
        mat = np.stack([hf[k][:].astype(np.float32) for k in keys])

    # Mean-impute NaNs per column (reference: reduce-dim.py:59-69).
    col_mean = np.nanmean(mat, axis=0)
    col_mean = np.where(np.isfinite(col_mean), col_mean, 0.0)
    nan_mask = ~np.isfinite(mat)
    if nan_mask.any():
        print(f"imputing {int(nan_mask.sum())} non-finite values with column means")
        mat[nan_mask] = np.broadcast_to(col_mean, mat.shape)[nan_mask]

    actual = min(target_dim, mat.shape[0], mat.shape[1])
    pca = PCA(n_components=actual, random_state=seed)
    reduced = pca.fit_transform(mat)
    print(f"PCA {mat.shape} -> {reduced.shape}, explained variance "
          f"{float(np.sum(pca.explained_variance_ratio_)):.4f}")

    os.makedirs(os.path.dirname(os.path.abspath(output_h5)), exist_ok=True)
    with h5py.File(output_h5, "w") as hf:
        for key, vec in zip(keys, reduced):
            hf.create_dataset(key, data=vec.astype(np.float16))
    print(f"wrote {len(keys)} reduced embeddings to {output_h5}")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description="Global PCA dimensionality reduction for H5 embeddings")
    p.add_argument("input_h5")
    p.add_argument("output_h5")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    return process_with_global_pca(args.input_h5, args.output_h5, args.dim, args.seed)


if __name__ == "__main__":
    sys.exit(main())
