"""Transformer protein-embedding baseline (ProtBERT/ProtT5-style inference).

Capability parity with the reference's TF/HuggingFace embedder
(reference: src/pipeline/transformer_embedder.py:32-198): space-separated
residue tokenization with U/Z/O/B→X, batched inference with max-length
truncation, residue-vector extraction (BERT drops CLS; T5 truncates),
pooling, PCA, H5 export.

This environment has no network egress: models load only from the local
HuggingFace cache (``local_files_only=True``); if unavailable the stage
logs and skips gracefully rather than failing the pipeline.
"""

from __future__ import annotations

import os
import re
import time
from typing import Dict, Optional

import numpy as np

from protgram_directgcn_tpu.config import Config
from protgram_directgcn_tpu.utils import embeddings as emb_utils
from protgram_directgcn_tpu.utils.io import ensure_dir, logger, parse_fasta, write_h5_embeddings


def extract_residue_embeddings(raw: np.ndarray, seq_len: int, is_t5: bool) -> np.ndarray:
    """BERT: drop CLS then take seq_len tokens; T5: truncate to seq_len
    (reference: models_utils.py:149-163)."""
    if seq_len <= 0 or raw.shape[0] == 0:
        return raw[:0]
    if is_t5:
        return raw[: min(raw.shape[0], seq_len)]
    if raw.shape[0] <= 1:
        return raw[:0]
    return raw[1 : min(raw.shape[0], seq_len + 1)]


class TransformerEmbedder:
    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config()

    def _load_model(self, hf_id: str):
        try:
            import torch
            from transformers import AutoModel, AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(hf_id, local_files_only=True)
            model = AutoModel.from_pretrained(hf_id, local_files_only=True)
            model.eval()
            return tokenizer, model
        except Exception as e:
            logger.warning("transformer model %s unavailable locally (%s); skipping", hf_id, e)
            return None, None

    def _embed_with_model(self, name: str, hf_id: str, is_t5: bool, batch_mult: int,
                          sequences, output_dir) -> Optional[str]:
        import torch

        tcfg = self.config.transformer
        tokenizer, model = self._load_model(hf_id)
        if model is None:
            return None
        batch_size = tcfg.base_batch_size * max(1, batch_mult)
        pooled: Dict[str, np.ndarray] = {}
        t0 = time.time()
        with torch.no_grad():
            for i in range(0, len(sequences), batch_size):
                batch = sequences[i : i + batch_size]
                # Space-separated residues, rare residues mapped to X
                # (reference: transformer_embedder.py:91-92).
                texts = [" ".join(re.sub(r"[UZOB]", "X", seq)) for _, seq in batch]
                enc = tokenizer(
                    texts, return_tensors="pt", padding=True, truncation=True,
                    max_length=tcfg.max_length,
                )
                out = model(**enc).last_hidden_state.cpu().numpy()
                mask = enc["attention_mask"].cpu().numpy()
                for j, (pid, seq) in enumerate(batch):
                    valid = out[j][mask[j] > 0]
                    res = extract_residue_embeddings(valid, len(seq), is_t5)
                    if res.shape[0]:
                        pooled[pid] = emb_utils.pool_residue_embeddings(
                            res, tcfg.pooling_strategy
                        ).astype(np.float16)
        logger.info("[%s] embedded %d proteins in %.1fs", name, len(pooled), time.time() - t0)
        if not pooled:
            return None
        h5_path = os.path.join(str(output_dir), f"{name.lower()}_{tcfg.pooling_strategy}.h5")
        write_h5_embeddings(h5_path, pooled)
        if tcfg.apply_pca:
            pca = emb_utils.apply_pca(pooled, self.config.gcn.pca_target_dim, self.config.random_state)
            if pca:
                dim = next(iter(pca.values())).shape[0]
                write_h5_embeddings(
                    os.path.join(str(output_dir), f"{name.lower()}_{tcfg.pooling_strategy}_pca{dim}.h5"),
                    pca,
                )
        return h5_path

    def run(self, fasta_path: Optional[os.PathLike] = None,
            output_dir: Optional[os.PathLike] = None):
        cfg = self.config
        fasta_path = fasta_path or cfg.paths.input_fasta
        output_dir = ensure_dir(output_dir or cfg.paths.transformer_embeddings_dir)
        sequences = list(parse_fasta(fasta_path))
        if not sequences:
            logger.error("no sequences for transformer embedding at %s", fasta_path)
            return []
        outputs = []
        for spec in cfg.transformer.models_to_run:
            path = self._embed_with_model(
                spec["name"], spec["hf_id"], spec.get("is_t5", False),
                spec.get("batch_size_multiplier", 1), sequences, output_dir,
            )
            if path:
                outputs.append(path)
        if not outputs and cfg.transformer.offline_fallback:
            path = self._embed_residue_projection(sequences, output_dir)
            if path:
                outputs.append(path)
        return outputs

    def _embed_residue_projection(self, sequences, output_dir) -> Optional[str]:
        """Offline fallback: seeded per-residue projection embeddings.

        Each residue type maps to a fixed Gaussian vector, so mean pooling
        yields (smoothed) amino-acid-composition features — a legitimate
        sequence-only baseline that keeps the downstream PPI comparison
        runnable when no HF checkpoint is cached locally."""
        tcfg = self.config.transformer
        rng = np.random.default_rng(self.config.random_state)
        alphabet = "ACDEFGHIKLMNPQRSTVWYX"
        dim = tcfg.fallback_dim
        table = {ch: rng.standard_normal(dim).astype(np.float32) for ch in alphabet}
        pooled: Dict[str, np.ndarray] = {}
        for pid, seq in sequences:
            seq = re.sub(r"[UZOB]", "X", seq)
            res = np.stack([table.get(ch, table["X"]) for ch in seq]) if seq else np.zeros((0, dim), np.float32)
            if res.shape[0]:
                pooled[pid] = emb_utils.pool_residue_embeddings(
                    res, tcfg.pooling_strategy
                ).astype(np.float16)
        if not pooled:
            return None
        logger.info(
            "no HF checkpoint available; wrote residue-projection fallback "
            "embeddings for %d proteins (AA-composition baseline)", len(pooled)
        )
        h5_path = os.path.join(
            str(output_dir), f"residue_projection_{tcfg.pooling_strategy}.h5"
        )
        write_h5_embeddings(h5_path, pooled)
        return h5_path
