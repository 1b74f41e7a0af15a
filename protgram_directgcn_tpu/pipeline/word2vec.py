"""Residue-level skip-gram embedder — first-party JAX replacement for gensim.

Capability parity with the reference's Word2Vec pipeline
(reference: src/pipeline/word2vec_embedder.py:31-160): skip-gram with
negative sampling (sg=1, hs=0) over the per-residue FASTA corpus, window 5,
min_count filtering, per-protein mean/sum/max pooling, H5 + optional PCA.

TPU-first re-design: the residue vocabulary is tiny (~25 symbols), so the
whole model is two [V, D] tables and training is a single jitted SGD step
over large batches of (center, context, negatives) triples sampled with the
unigram^0.75 distribution — batched MXU-friendly math instead of gensim's
C hot loop.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from protgram_directgcn_tpu.config import Config
from protgram_directgcn_tpu.utils import embeddings as emb_utils
from protgram_directgcn_tpu.utils.io import ensure_dir, logger, parse_fasta, write_h5_embeddings


class SkipGramModel:
    """Tiny-vocabulary skip-gram with negative sampling."""

    def __init__(self, vocab: List[str], dim: int, lr: float = 0.025, seed: int = 42):
        self.vocab = vocab
        self.token_to_id = {t: i for i, t in enumerate(vocab)}
        v = len(vocab)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        # gensim-style init: input vectors uniform(-0.5/dim, 0.5/dim), output zero.
        self.params = {
            "in": jax.random.uniform(k1, (v, dim), jnp.float32, -0.5 / dim, 0.5 / dim),
            "out": jnp.zeros((v, dim), jnp.float32),
        }
        self.opt = optax.adam(1e-3)
        self.opt_state = self.opt.init(self.params)
        self._step = self._make_step()

    def _make_step(self):
        opt = self.opt

        @jax.jit
        def step(params, opt_state, center, context, negatives):
            def loss_fn(p):
                vc = p["in"][center]  # [B, D]
                uo = p["out"][context]  # [B, D]
                un = p["out"][negatives]  # [B, K, D]
                pos = jax.nn.log_sigmoid(jnp.sum(vc * uo, axis=-1))
                neg = jax.nn.log_sigmoid(-jnp.einsum("bd,bkd->bk", vc, un)).sum(-1)
                return -jnp.mean(pos + neg)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def train(self, corpus_ids: List[np.ndarray], window: int, negative: int,
              epochs: int, batch_size: int, counts: np.ndarray, seed: int = 42) -> float:
        """Train over (center, context) pairs from all sequences."""
        centers, contexts = [], []
        for ids in corpus_ids:
            L = len(ids)
            if L < 2:
                continue
            for off in range(1, window + 1):
                if L > off:
                    centers.append(ids[:-off])
                    contexts.append(ids[off:])
                    centers.append(ids[off:])
                    contexts.append(ids[:-off])
        if not centers:
            return float("nan")
        centers = np.concatenate(centers)
        contexts = np.concatenate(contexts)

        # Unigram^0.75 negative-sampling distribution.
        p = counts.astype(np.float64) ** 0.75
        p /= p.sum()
        rng = np.random.default_rng(seed)
        loss_val = float("nan")
        for epoch in range(epochs):
            perm = rng.permutation(len(centers))
            for i in range(0, len(perm), batch_size):
                sel = perm[i : i + batch_size]
                negs = rng.choice(len(self.vocab), size=(len(sel), negative), p=p)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state,
                    jnp.asarray(centers[sel]), jnp.asarray(contexts[sel]), jnp.asarray(negs),
                )
            loss_val = float(loss)
            logger.info("skip-gram epoch %d/%d loss %.4f", epoch + 1, epochs, loss_val)
        return loss_val

    def vectors(self) -> np.ndarray:
        return np.asarray(self.params["in"])

    def save(self, path: os.PathLike):
        np.savez_compressed(path, vocab=np.array(self.vocab), vectors=self.vectors())

    @classmethod
    def load(cls, path: os.PathLike) -> "SkipGramModel":
        with np.load(path, allow_pickle=False) as z:
            vocab = [str(t) for t in z["vocab"]]
            vectors = z["vectors"]
        model = cls(vocab, vectors.shape[1])
        model.params = {"in": jnp.asarray(vectors), "out": model.params["out"]}
        return model


class Word2VecEmbedder:
    """run() contract: residue skip-gram → per-protein pooled H5 (+PCA)."""

    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config()

    def run(self, fasta_path: Optional[os.PathLike] = None,
            output_dir: Optional[os.PathLike] = None) -> Optional[str]:
        cfg = self.config
        w2v = cfg.word2vec
        fasta_path = fasta_path or cfg.paths.input_fasta
        output_dir = ensure_dir(output_dir or cfg.paths.word2vec_embeddings_dir)
        t0 = time.time()

        sequences = list(parse_fasta(fasta_path))
        if not sequences:
            logger.error("no sequences for word2vec at %s", fasta_path)
            return None

        # Vocabulary with min_count filtering.
        from collections import Counter

        counter = Counter()
        for _, seq in sequences:
            counter.update(seq)
        vocab = sorted(t for t, c in counter.items() if c >= w2v.min_count)
        counts = np.array([counter[t] for t in vocab], dtype=np.int64)
        logger.info("skip-gram vocab: %d residue symbols", len(vocab))

        model = SkipGramModel(vocab, w2v.vector_size, lr=w2v.lr, seed=cfg.random_state)
        tok = model.token_to_id
        corpus_ids = [
            np.array([tok[c] for c in seq if c in tok], dtype=np.int32) for _, seq in sequences
        ]
        model.train(corpus_ids, w2v.window, w2v.negative, w2v.epochs,
                    w2v.batch_size, counts, seed=cfg.random_state)
        model_path = os.path.join(str(output_dir), f"word2vec_model_dim{w2v.vector_size}.npz")
        model.save(model_path)
        logger.info("skip-gram model saved to %s (%.1fs)", model_path, time.time() - t0)

        # Optional id mapping from the GCN pipeline's TSV (reference behavior:
        # word2vec_embedder.py:54-61).
        id_map: Dict[str, str] = {}
        map_file = cfg.paths.id_mapping_output_file
        if cfg.id_mapping_mode != "none" and os.path.exists(str(map_file)):
            with open(map_file) as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) == 2:
                        id_map[parts[0]] = parts[1]

        vectors = model.vectors()
        protein_embeddings: Dict[str, np.ndarray] = {}
        for pid, seq in sequences:
            ids = np.array([tok[c] for c in seq if c in tok], dtype=np.int64)
            if len(ids) == 0:
                continue
            pooled = emb_utils.pool_residue_embeddings(
                vectors[ids], w2v.pooling_strategy, w2v.vector_size
            )
            protein_embeddings[id_map.get(pid, pid)] = pooled.astype(np.float16)

        h5_path = os.path.join(
            str(output_dir), f"word2vec_dim{w2v.vector_size}_{w2v.pooling_strategy}.h5"
        )
        write_h5_embeddings(h5_path, protein_embeddings)
        logger.info("word2vec embeddings saved: %s (%d proteins)", h5_path, len(protein_embeddings))

        if w2v.apply_pca and protein_embeddings:
            pca = emb_utils.apply_pca(protein_embeddings, cfg.gcn.pca_target_dim, cfg.random_state)
            if pca:
                dim = next(iter(pca.values())).shape[0]
                pca_path = os.path.join(
                    str(output_dir),
                    f"word2vec_dim{w2v.vector_size}_{w2v.pooling_strategy}_pca{dim}.h5",
                )
                write_h5_embeddings(pca_path, pca)
                logger.info("word2vec PCA embeddings saved: %s", pca_path)
        return h5_path
