"""Embedding post-processing: PCA, L2 norm, pooling, edge features.

The embedding algebra shared by all pipelines
(reference: src/utils/models_utils.py:82-382), vectorized.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from protgram_directgcn_tpu.utils.io import logger


def l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """x / (||x|| + eps) row-wise (reference: models_utils.py:138-147)."""
    if x.ndim == 1:
        return x / (np.linalg.norm(x) + eps)
    return x / (np.linalg.norm(x, axis=1, keepdims=True) + eps)


def apply_pca(
    embeddings: Dict[str, np.ndarray],
    target_dim: int,
    random_seed: int,
    output_dtype=np.float16,
) -> Optional[Dict[str, np.ndarray]]:
    """StandardScaler + PCA with dim clamped to min(target, dim, n_samples),
    float16 output (reference: models_utils.py:87-136)."""
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    items = [(k, v.astype(np.float32)) for k, v in embeddings.items() if v is not None and v.size > 0]
    if not items:
        logger.error("PCA: no valid embeddings provided")
        return None
    ids = [k for k, _ in items]
    mat = np.stack([v for _, v in items]).astype(np.float32)
    n_samples, dim = mat.shape
    actual = min(target_dim, dim, n_samples)
    if actual <= 0:
        return {k: v.astype(output_dtype) for k, v in items}
    if actual < target_dim:
        logger.warning("PCA: adjusted target dim %d -> %d", target_dim, actual)
    scaled = StandardScaler().fit_transform(mat)
    pca = PCA(n_components=actual, random_state=random_seed)
    out = pca.fit_transform(scaled)
    logger.info(
        "PCA %s -> %s (explained variance %.4f)",
        mat.shape, out.shape, float(np.sum(pca.explained_variance_ratio_)),
    )
    return {pid: vec.astype(output_dtype) for pid, vec in zip(ids, out)}


def pool_residue_embeddings(res: np.ndarray, strategy: str = "mean", dim_if_empty: Optional[int] = None) -> np.ndarray:
    """Mean/sum/max pooling of per-residue vectors (reference: models_utils.py:181-195)."""
    if res is None or res.shape[0] == 0:
        return np.zeros(dim_if_empty, dtype=np.float32) if dim_if_empty else np.array([], np.float32)
    if strategy == "sum":
        return np.sum(res, axis=0)
    if strategy == "max":
        return np.max(res, axis=0)
    return np.mean(res, axis=0)


def pool_ngram_embeddings_for_proteins(
    protein_sequences: Sequence[Tuple[str, str]],
    n_val: int,
    vocab: np.ndarray,
    ngram_embeddings: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Mean-pool n-gram node embeddings to per-protein vectors.

    Array re-design of the reference's inverted-index scatter-add
    (reference: models_utils.py:209-262): every protein's raw-sequence
    n-grams are looked up in the sorted vocab (searchsorted) and
    segment-mean-pooled; proteins with no in-vocab n-grams are dropped.
    """
    if not protein_sequences:
        return {}
    dim = ngram_embeddings.shape[1]
    num_prot = len(protein_sequences)
    sums = np.zeros((num_prot, dim), dtype=np.float32)
    counts = np.zeros(num_prot, dtype=np.int64)

    n_vocab = len(vocab)
    for p_idx, (_, seq) in enumerate(protein_sequences):
        if len(seq) < n_val:
            continue
        grams = np.array(
            [seq[i : i + n_val] for i in range(len(seq) - n_val + 1)], dtype=vocab.dtype
        )
        pos = np.searchsorted(vocab, grams)
        pos = np.clip(pos, 0, n_vocab - 1)
        found = vocab[pos] == grams
        ids = pos[found]
        if len(ids):
            sums[p_idx] = ngram_embeddings[ids].astype(np.float32).sum(axis=0)
            counts[p_idx] = len(ids)

    out: Dict[str, np.ndarray] = {}
    for p_idx, (pid, _) in enumerate(protein_sequences):
        if counts[p_idx] > 0:
            out[pid] = (sums[p_idx] / counts[p_idx]).astype(ngram_embeddings.dtype)
    return out


_EDGE_METHODS = ("concatenate", "average", "hadamard", "l1_distance", "l2_distance")


def make_edge_feature(emb1: np.ndarray, emb2: np.ndarray, method: str) -> np.ndarray:
    """Combine two protein vectors into one edge feature
    (reference: models_utils.py:302-313)."""
    if method == "average":
        return ((emb1.astype(np.float32) + emb2.astype(np.float32)) / 2.0).astype(np.float16)
    if method == "hadamard":
        return emb1 * emb2
    if method == "l1_distance":
        return np.abs(emb1 - emb2)
    if method == "l2_distance":
        return (emb1 - emb2) ** 2
    return np.concatenate((emb1, emb2))  # concatenate (default)


def generate_edge_features_batched(
    interaction_pairs: Sequence[Tuple[str, str, int]],
    protein_embeddings: Dict[str, np.ndarray],
    method: str,
    batch_size: int,
    embedding_dim: int,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (features[float16], labels[int32]) batches for link prediction
    (reference: models_utils.py:275-324)."""
    feats: List[np.ndarray] = []
    labels: List[int] = []
    for p1, p2, label in interaction_pairs:
        e1 = protein_embeddings.get(p1)
        e2 = protein_embeddings.get(p2)
        if e1 is None or e2 is None or e1.size == 0 or e2.size == 0:
            continue
        if e1.shape[0] != embedding_dim or e2.shape[0] != embedding_dim:
            continue
        feats.append(make_edge_feature(e1, e2, method))
        labels.append(label)
        if len(feats) == batch_size:
            yield np.array(feats, np.float16), np.array(labels, np.int32)
            feats, labels = [], []
    if feats:
        yield np.array(feats, np.float16), np.array(labels, np.int32)
