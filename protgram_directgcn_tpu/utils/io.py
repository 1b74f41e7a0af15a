"""Data IO: FASTA parsing, interaction ground truth, HDF5 embedding store,
protein ID mapping.

Functional equivalents of the reference's L1 utilities
(reference: src/utils/data_utils.py, src/utils/models_utils.py:26-79) with
the same file-format contracts (FASTA in, HDF5 `{protein_id: vector}` out,
CSV/TSV interaction pairs) but no Biopython/pandas dependencies on the hot
paths.
"""

from __future__ import annotations

import logging
import os
import re
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Set, Tuple, Union

import h5py
import numpy as np

logger = logging.getLogger("protgram_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    # Third-party imports (orbax/absl) may attach root handlers; avoid
    # duplicate emission of our records through the root logger.
    logger.propagate = False


# ----------------------------------------------------------------------------
# FASTA
# ----------------------------------------------------------------------------


def parse_fasta(path: Union[str, os.PathLike]) -> Iterator[Tuple[str, str]]:
    """Stream (protein_id, sequence) from a FASTA file.

    Header id extraction matches the reference: prefer the accession between
    the first two '|' separators (``sp|ID|...``), else the first whitespace
    token (reference: data_utils.py:181-213).  Sequence lines are upper-cased
    and concatenated.
    """
    protein_id: Optional[str] = None
    parts: List[str] = []
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if protein_id and parts:
                    yield protein_id, "".join(parts)
                header = line[1:]
                bar = header.split("|")
                protein_id = bar[1] if len(bar) > 1 and bar[1] else header.split()[0]
                parts = []
            elif protein_id is not None:
                parts.append(line.upper())
    if protein_id and parts:
        yield protein_id, "".join(parts)


class FastaCorpus:
    """Iterable of per-residue token lists for Word2Vec-style training
    (reference: data_utils.py:215-226)."""

    def __init__(self, fasta_files: Sequence[Union[str, os.PathLike]]):
        self.fasta_files = list(fasta_files)

    def __iter__(self) -> Iterator[List[str]]:
        for path in self.fasta_files:
            for _, seq in parse_fasta(path):
                if seq:
                    yield list(seq)


# ----------------------------------------------------------------------------
# Interaction ground truth
# ----------------------------------------------------------------------------


def _parse_pair_line(line: str) -> Optional[Tuple[str, str]]:
    parts = [p.strip() for p in line.strip().replace('"', "").split(",")]
    if len(parts) < 2:
        parts = [p.strip() for p in line.strip().replace('"', "").split("\t")]
    if len(parts) >= 2 and parts[0] and parts[1]:
        return parts[0], parts[1]
    return None


def load_interaction_pairs(
    path: Union[str, os.PathLike],
    label: int,
    sample_n: Optional[int] = None,
    random_state: Optional[int] = None,
) -> List[Tuple[str, str, int]]:
    """Load (p1, p2, label) pairs from a CSV/TSV file with optional sampling
    (reference: data_utils.py:63-96)."""
    if not os.path.exists(path):
        logger.warning("Interaction file not found: %s", path)
        return []
    pairs: List[Tuple[str, str, int]] = []
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        for line in f:
            parsed = _parse_pair_line(line)
            if parsed:
                pairs.append((parsed[0], parsed[1], label))
    if sample_n is not None and 0 < sample_n < len(pairs):
        rng = np.random.default_rng(random_state)
        idx = rng.choice(len(pairs), size=sample_n, replace=False)
        pairs = [pairs[i] for i in sorted(idx)]
    return pairs


def stream_interaction_pairs(
    path: Union[str, os.PathLike],
    label: int,
    batch_size: int,
    sample_n: Optional[int] = None,
    random_state: Optional[int] = None,
) -> Iterator[List[Tuple[str, str, int]]]:
    """Stream pairs in batches with reservoir-style line sampling
    (reference: data_utils.py:98-144)."""
    if not os.path.exists(path):
        logger.warning("Interaction file not found: %s", path)
        return
    keep: Optional[Set[int]] = None
    if sample_n is not None:
        with open(path, "r", encoding="utf-8", errors="ignore") as f:
            total = sum(1 for _ in f)
        if 0 < sample_n < total:
            rng = np.random.default_rng(random_state)
            keep = set(rng.choice(total, sample_n, replace=False).tolist())
    batch: List[Tuple[str, str, int]] = []
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        for i, line in enumerate(f):
            if keep is not None and i not in keep:
                continue
            parsed = _parse_pair_line(line)
            if parsed:
                batch.append((parsed[0], parsed[1], label))
                if len(batch) == batch_size:
                    yield batch
                    batch = []
    if batch:
        yield batch


def get_required_ids_from_files(paths: Sequence[Union[str, os.PathLike]]) -> Set[str]:
    """All unique protein IDs across interaction files (reference: data_utils.py:33-61)."""
    required: Set[str] = set()
    for path in paths:
        if not os.path.exists(path):
            logger.warning("File not found during ID gathering: %s", path)
            continue
        with open(path, "r", encoding="utf-8", errors="ignore") as f:
            for line in f:
                parsed = _parse_pair_line(line)
                if parsed:
                    required.add(parsed[0])
                    required.add(parsed[1])
    return required


# ----------------------------------------------------------------------------
# Protein ID mapping (regex mode; API mode gated on network availability)
# ----------------------------------------------------------------------------

_UNIPROT_RE = re.compile(r"^(?:sp|tr)\|([OPQ]?[A-Z0-9]{5,9}(?:-\d+)?)\|", re.IGNORECASE)
_UNIREF_RE = re.compile(r"^(UniRef\d{2,3})_([A-Z0-9]+)", re.IGNORECASE)
_PLAIN_RE = re.compile(r"^([OPQ]?[A-Z0-9]{5,9}(?:-\d+)?)")


def extract_canonical_id(header: str) -> Optional[str]:
    """Canonical UniProt accession from a FASTA header
    (reference: data_utils.py:322-331)."""
    hid = header.strip().lstrip(">")
    m = _UNIPROT_RE.match(hid)
    if m:
        return m.group(1)
    m = _UNIREF_RE.match(hid)
    if m:
        return m.group(2)
    first = hid.split()[0] if hid.split() else hid
    m = _PLAIN_RE.match(first)
    if m:
        return m.group(1)
    return first or None


def generate_api_id_map(
    fasta_path: Union[str, os.PathLike],
    from_db: str = "UniRef50",
    to_db: str = "UniProtKB",
    batch_size: int = 500,
    poll_interval: float = 2.0,
    timeout: float = 300.0,
    output_file: Optional[Union[str, os.PathLike]] = None,
) -> Dict[str, str]:
    """UniProt REST ID-mapping (submit job, poll, fetch results) in batches
    (reference: data_utils.py:250-320).  Requires network access; on any
    failure a batch is skipped and mapping degrades gracefully (the
    reference's behavior, data_utils.py:314-319)."""
    import json
    import time as _time
    import urllib.parse
    import urllib.request

    candidate_ids: List[str] = []
    seen = set()
    with open(fasta_path, "r", encoding="utf-8", errors="ignore") as f:
        for line in f:
            if not line.startswith(">"):
                continue
            header = line[1:].strip()
            bar = header.split("|")
            cid = bar[1] if len(bar) > 1 and bar[1] else header.split()[0]
            if cid not in seen:
                seen.add(cid)
                candidate_ids.append(cid)

    id_map: Dict[str, str] = {}
    base = "https://rest.uniprot.org/idmapping"
    for start in range(0, len(candidate_ids), batch_size):
        batch = candidate_ids[start : start + batch_size]
        try:
            payload = urllib.parse.urlencode(
                {"ids": ",".join(batch), "from": from_db, "to": to_db}
            ).encode()
            with urllib.request.urlopen(f"{base}/run", data=payload, timeout=30) as resp:
                job_id = json.load(resp).get("jobId")
            if not job_id:
                raise RuntimeError("no jobId returned")
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                with urllib.request.urlopen(f"{base}/status/{job_id}", timeout=30) as resp:
                    status = json.load(resp)
                if status.get("jobStatus") in (None, "FINISHED") or "results" in status:
                    break
                _time.sleep(poll_interval)
            with urllib.request.urlopen(f"{base}/results/{job_id}?size=500", timeout=30) as resp:
                results = json.load(resp).get("results", [])
            for entry in results:
                frm, to = entry.get("from"), entry.get("to")
                if isinstance(to, dict):
                    to = to.get("primaryAccession") or to.get("id")
                if frm and to:
                    id_map[frm] = to
        except Exception as e:
            logger.warning("UniProt API mapping batch %d failed (%s); skipping", start // batch_size, e)
            continue
    if output_file and id_map:
        os.makedirs(os.path.dirname(str(output_file)) or ".", exist_ok=True)
        with open(output_file, "w", encoding="utf-8") as f:
            for orig, mapped in id_map.items():
                f.write(f"{orig}\t{mapped}\n")
    return id_map


def generate_regex_id_map(fasta_path: Union[str, os.PathLike], output_file: Optional[Union[str, os.PathLike]] = None) -> Dict[str, str]:
    """FASTA-id → canonical-accession map via header regexes
    (reference: data_utils.py:333-391).  Writes a TSV if output_file given."""
    id_map: Dict[str, str] = {}
    with open(fasta_path, "r", encoding="utf-8", errors="ignore") as f:
        for line in f:
            if not line.startswith(">"):
                continue
            header = line[1:].strip()
            bar = header.split("|")
            record_id = bar[1] if len(bar) > 1 and bar[1] else header.split()[0]
            canonical = extract_canonical_id(header)
            if not canonical:
                continue
            if record_id != canonical:
                id_map.setdefault(record_id, canonical)
            first_word = header.split()[0]
            if first_word != canonical:
                id_map.setdefault(first_word, canonical)
    if output_file and id_map:
        os.makedirs(os.path.dirname(str(output_file)) or ".", exist_ok=True)
        with open(output_file, "w", encoding="utf-8") as f:
            for orig, mapped in id_map.items():
                f.write(f"{orig}\t{mapped}\n")
    return id_map


# ----------------------------------------------------------------------------
# HDF5 embedding store
# ----------------------------------------------------------------------------


def write_h5_embeddings(path: Union[str, os.PathLike], embeddings: Dict[str, np.ndarray]) -> None:
    """Write `{protein_id: vector}` HDF5 (the L4 output contract,
    reference: protgram_directgcn_trainer.py:402-407)."""
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    with h5py.File(path, "w") as hf:
        for key, vec in embeddings.items():
            if vec is not None:
                hf.create_dataset(key, data=vec)


class EmbeddingStore:
    """Lazy dict-like random access over HDF5 embeddings, context-managed
    (reference: models_utils.py:26-79).  Values returned as float16."""

    def __init__(self, h5_path: Union[str, os.PathLike]):
        self.h5_path = str(h5_path)
        self._file: Optional[h5py.File] = None
        self._keys: Optional[Set[str]] = None

    def __enter__(self) -> "EmbeddingStore":
        if not os.path.exists(self.h5_path):
            raise FileNotFoundError(f"Embedding file not found: {self.h5_path}")
        self._file = h5py.File(self.h5_path, "r")
        self._keys = set(self._file.keys())
        return self

    def __exit__(self, *exc):
        if self._file is not None:
            self._file.close()
            self._file = None
            self._keys = None

    def _check(self):
        if self._keys is None:
            raise RuntimeError("EmbeddingStore used outside of context manager.")

    def __contains__(self, key: str) -> bool:
        self._check()
        return key in self._keys

    def __getitem__(self, key: str) -> np.ndarray:
        self._check()
        if key not in self._keys:
            raise KeyError(f"Key '{key}' not found in {self.h5_path}")
        return self._file[key][:].astype(np.float16)

    def __len__(self) -> int:
        return len(self._keys) if self._keys is not None else 0

    def get_keys(self) -> Set[str]:
        self._check()
        return set(self._keys)


def check_h5_integrity(path: Union[str, os.PathLike], num_samples: int = 5, rng: Optional[np.random.Generator] = None) -> bool:
    """Spot-check an HDF5 embedding file for NaN/Inf/empty vectors
    (reference: data_utils.py:444-491).  Returns True if healthy."""
    if not os.path.exists(path) or not h5py.is_hdf5(path):
        logger.error("H5 integrity: %s missing or not HDF5", path)
        return False
    rng = rng or np.random.default_rng(0)
    ok = True
    with h5py.File(path, "r") as hf:
        keys = list(hf.keys())
        if not keys:
            logger.warning("H5 integrity: %s has no embeddings", path)
            return False
        sample = [keys[i] for i in rng.choice(len(keys), min(num_samples, len(keys)), replace=False)]
        for key in sample:
            emb = hf[key][:]
            if emb.size == 0 or np.isnan(emb).any() or np.isinf(emb).any():
                logger.warning("H5 integrity: bad vector for key %s in %s", key, path)
                ok = False
    return ok


def ensure_dir(path: Union[str, os.PathLike]) -> Path:
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    return p
