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

from protgram_directgcn_tpu.config import Config
from protgram_directgcn_tpu.utils import embeddings as emb_utils
from protgram_directgcn_tpu.utils.io import ensure_dir, logger, parse_fasta, write_h5_embeddings


class SkipGramModel:
    """Tiny-vocabulary skip-gram with negative sampling.

    Training dynamics follow gensim's (reference:
    word2vec_embedder.py:89-100): plain SGD whose learning rate decays
    linearly from ``lr`` to ``min_alpha`` over the planned number of
    updates, *dynamic* context windows (per-center reduced window b ~
    U{1..window}), and frequent-word subsampling (``sample`` threshold),
    with the window/subsample draws resampled every epoch.  Pairs are
    generated streaming, per sequence block — nothing is materialised for
    the whole corpus.
    """

    def __init__(self, vocab: List[str], dim: int, lr: float = 0.025, seed: int = 42,
                 min_alpha: float = 1e-4):
        self.vocab = vocab
        self.token_to_id = {t: i for i, t in enumerate(vocab)}
        self.lr = float(lr)
        self.min_alpha = float(min_alpha)
        v = len(vocab)
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        # gensim-style init: input vectors uniform(-0.5/dim, 0.5/dim), output zero.
        self.params = {
            "in": jax.random.uniform(k1, (v, dim), jnp.float32, -0.5 / dim, 0.5 / dim),
            "out": jnp.zeros((v, dim), jnp.float32),
        }
        self._step = self._make_step()

    def _make_step(self):
        @jax.jit
        def step(params, lr, center, context, negatives):
            def loss_fn(p):
                vc = p["in"][center]  # [B, D]
                uo = p["out"][context]  # [B, D]
                un = p["out"][negatives]  # [B, K, D]
                pos = jax.nn.log_sigmoid(jnp.sum(vc * uo, axis=-1))
                neg = jax.nn.log_sigmoid(-jnp.einsum("bd,bkd->bk", vc, un)).sum(-1)
                return -jnp.mean(pos + neg)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
            return params, loss

        return step

    @staticmethod
    def _block_pairs(ids: np.ndarray, window: int, rng: np.random.Generator):
        """Skip-gram pairs of one (already subsampled) sequence under a
        per-center dynamic window: center i pairs with neighbours within
        b_i ~ U{1..window} (gensim's reduced-window sampling)."""
        L = len(ids)
        if L < 2:
            return None
        b = rng.integers(1, window + 1, L)
        cs, xs = [], []
        for off in range(1, min(window, L - 1) + 1):
            keep_f = b[: L - off] >= off  # center on the left
            keep_b = b[off:] >= off  # center on the right
            cs.append(ids[: L - off][keep_f])
            xs.append(ids[off:][keep_f])
            cs.append(ids[off:][keep_b])
            xs.append(ids[: L - off][keep_b])
        return np.concatenate(cs), np.concatenate(xs)

    def train(self, corpus_ids, window: int, negative: int,
              epochs: int, batch_size: int, counts: np.ndarray, seed: int = 42,
              sample: float = 1e-3, block_pairs: int = 1 << 20) -> float:
        """Stream epochs of subsampled, dynamic-window skip-gram pairs.

        ``corpus_ids`` is either a list of per-sequence id arrays or a
        ZERO-ARG CALLABLE returning a fresh iterator of them — the streaming
        form: each epoch re-reads the corpus from its source (as gensim's
        trainer re-streams its corpus file per epoch,
        reference: word2vec_embedder.py:89-100), so nothing scales with
        corpus size in memory and the ~100M-residue in-memory ceiling
        disappears."""
        corpus_iter = corpus_ids if callable(corpus_ids) else (lambda: iter(corpus_ids))
        counts = np.asarray(counts, np.float64)
        freq = counts / max(1.0, counts.sum())
        if sample and sample > 0:
            # gensim keep probability: min(1, sqrt(s/f) + s/f).
            ratio = sample / np.maximum(freq, 1e-12)
            keep_prob = np.minimum(1.0, np.sqrt(ratio) + ratio)
        else:
            keep_prob = np.ones(len(counts))

        # Planned updates for the linear LR decay: expected kept tokens x
        # expected window (dynamic window mean = (window+1)/2, both sides).
        kept_total = sum(float(keep_prob[ids].sum()) for ids in corpus_iter() if len(ids))
        planned_pairs = max(1.0, epochs * kept_total * (window + 1))

        # Unigram^0.75 negative-sampling distribution.
        p = counts**0.75
        p /= p.sum()
        rng = np.random.default_rng(seed)
        loss_val = float("nan")
        processed = 0.0

        def flush(buf_c, buf_x):
            nonlocal loss_val, processed
            cs = np.concatenate(buf_c)
            xs = np.concatenate(buf_x)
            perm = rng.permutation(len(cs))
            for i in range(0, len(perm) - batch_size + 1, batch_size):
                sel = perm[i : i + batch_size]
                negs = rng.choice(len(self.vocab), size=(batch_size, negative), p=p)
                alpha = max(self.min_alpha, self.lr * (1.0 - processed / planned_pairs))
                self.params, loss = self._step(
                    self.params, jnp.float32(alpha),
                    jnp.asarray(cs[sel]), jnp.asarray(xs[sel]), jnp.asarray(negs),
                )
                processed += batch_size
                loss_val = float(loss)
            tail = len(perm) % batch_size
            return ([cs[perm[-tail:]]], [xs[perm[-tail:]]]) if tail else ([], [])

        for epoch in range(epochs):
            buf_c, buf_x, buffered = [], [], 0
            for ids in corpus_iter():
                if len(ids) < 2:
                    continue
                kept = ids[rng.random(len(ids)) < keep_prob[ids]]
                pairs = self._block_pairs(kept, window, rng)
                if pairs is None:
                    continue
                buf_c.append(pairs[0])
                buf_x.append(pairs[1])
                buffered += len(pairs[0])
                if buffered >= block_pairs:
                    buf_c, buf_x = flush(buf_c, buf_x)
                    buffered = sum(len(c) for c in buf_c)
            if buffered:
                flush(buf_c, buf_x)  # leftover tail of the epoch is dropped
            logger.info("skip-gram epoch %d/%d loss %.4f (alpha %.5f)",
                        epoch + 1, epochs,
                        loss_val,
                        max(self.min_alpha, self.lr * (1.0 - processed / planned_pairs)))
        return loss_val

    def vectors(self) -> np.ndarray:
        return np.asarray(self.params["in"])

    def save(self, path: os.PathLike):
        np.savez_compressed(path, vocab=np.array(self.vocab), vectors=self.vectors())

    def save_word2vec_format(self, path: os.PathLike, binary: bool = True):
        """Write the standard word2vec C format — the interchange format
        ``gensim.models.KeyedVectors.load_word2vec_format`` reads, so
        downstream gensim consumers of the reference's ``.model`` artifact
        (reference: word2vec_embedder.py:102-104) can load this framework's
        vectors without gensim being installed HERE.

        Binary layout (BYTE-IDENTICAL to gensim's ``_save_word2vec_format``):
        ascii header ``"<vocab> <dim>\\n"``, then per token ``b"<token> "``
        followed by ``dim`` little-endian float32s — no separator after the
        vector (the original word2vec.c adds a ``\\n`` there; gensim does
        not, and its loader accepts both).  Text layout: header then one
        ``"<token> v1 v2 ..."`` line per token (``repr`` floats, as gensim
        writes them)."""
        vecs = self.vectors().astype(np.float32)
        with open(path, "wb") as f:
            f.write(f"{len(self.vocab)} {vecs.shape[1]}\n".encode("utf8"))
            for token, row in zip(self.vocab, vecs):
                if binary:
                    f.write(token.encode("utf8") + b" ")
                    f.write(row.astype("<f4").tobytes())
                else:
                    f.write(
                        (token + " " + " ".join(repr(float(v)) for v in row) + "\n").encode("utf8")
                    )

    @classmethod
    def load_word2vec_format(cls, path: os.PathLike, binary: bool = True) -> "SkipGramModel":
        """Read the word2vec C format back (gensim-loader semantics: the
        token is bytes-up-to-space with leading newlines skipped, so both
        gensim files and word2vec.c files with per-row trailing ``\\n``
        parse)."""
        with open(path, "rb") as f:
            n_vocab, dim = (int(v) for v in f.readline().split())
            vocab, rows = [], np.empty((n_vocab, dim), dtype=np.float32)
            for i in range(n_vocab):
                word = b""
                while True:
                    ch = f.read(1)
                    if not ch:
                        raise ValueError(f"truncated word2vec file at token {i}")
                    if ch == b" ":
                        break
                    if ch != b"\n":  # skip word2vec.c row separators
                        word += ch
                if binary:
                    rows[i] = np.frombuffer(f.read(dim * 4), dtype="<f4")
                else:
                    parts = (word + b" " + f.readline()).split()
                    word = parts[0]
                    rows[i] = [float(v) for v in parts[1:]]
                vocab.append(word.decode("utf8"))
        model = cls(vocab, dim)
        model.params = {"in": jnp.asarray(rows), "out": model.params["out"]}
        return model

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

        # Vocab pass: one STREAMING sweep over the FASTA (the corpus is never
        # materialised in memory at any point in this pipeline — each of the
        # vocab / train / pooling passes re-streams from disk, matching the
        # reference's streamed corpus, reference: word2vec_embedder.py:31-160).
        from collections import Counter

        counter = Counter()
        n_seqs = 0
        for _, seq in parse_fasta(fasta_path):
            counter.update(seq)
            n_seqs += 1
        if n_seqs == 0:
            logger.error("no sequences for word2vec at %s", fasta_path)
            return None
        vocab = sorted(t for t, c in counter.items() if c >= w2v.min_count)
        counts = np.array([counter[t] for t in vocab], dtype=np.int64)
        logger.info("skip-gram vocab: %d residue symbols (%d sequences)", len(vocab), n_seqs)

        model = SkipGramModel(vocab, w2v.vector_size, lr=w2v.lr,
                              seed=cfg.random_state, min_alpha=w2v.min_alpha)
        tok = model.token_to_id

        def corpus_stream():
            for _, seq in parse_fasta(fasta_path):
                yield np.array([tok[c] for c in seq if c in tok], dtype=np.int32)

        model.train(corpus_stream, w2v.window, w2v.negative, w2v.epochs,
                    w2v.batch_size, counts, seed=cfg.random_state, sample=w2v.sample)
        model_path = os.path.join(str(output_dir), f"word2vec_model_dim{w2v.vector_size}.npz")
        model.save(model_path)
        # Gensim-interchange artifact alongside the npz (the reference saves
        # a gensim ``.model``; this is the portable equivalent).
        kv_path = os.path.join(
            str(output_dir), f"word2vec_model_dim{w2v.vector_size}.vectors.bin"
        )
        model.save_word2vec_format(kv_path, binary=True)
        logger.info(
            "skip-gram model saved to %s (+ gensim-format %s) (%.1fs)",
            model_path, kv_path, time.time() - t0,
        )

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
        for pid, seq in parse_fasta(fasta_path):
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
