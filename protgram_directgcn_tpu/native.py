"""ctypes loader for the native C++ ETL kernels (native/ngram_etl.cpp).

Compiles the shared library on first use (g++ via the checked-in Makefile)
and caches it; every entry point has a vectorized-numpy fallback in
graph/builder.py, so the framework degrades gracefully without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from protgram_directgcn_tpu.utils.io import logger

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libngram_etl.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "ngram_etl.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        logger.warning("native ETL build failed (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native ETL load failed (%s); using numpy fallback", e)
            return None
        lib.pack_ngrams_batch.restype = ctypes.c_int64
        lib.pack_ngrams_batch.argtypes = [_u8p, _i64p, ctypes.c_int64, ctypes.c_int32, _u64p, _i64p]
        lib.emit_pairs.restype = ctypes.c_int64
        lib.emit_pairs.argtypes = [_i64p, _i64p, ctypes.c_int64, ctypes.c_uint64, _u64p]
        lib.aggregate_u64.restype = ctypes.c_int64
        lib.aggregate_u64.argtypes = [_u64p, ctypes.c_int64, _u64p, _i64p]
        lib.merge_aggregates.restype = ctypes.c_int64
        lib.merge_aggregates.argtypes = [_u64p, _i64p, ctypes.c_int64, _u64p, _i64p, ctypes.c_int64, _u64p, _i64p]
        lib.lookup_sorted.restype = None
        lib.lookup_sorted.argtypes = [_u64p, ctypes.c_int64, _u64p, ctypes.c_int64, _i64p]
        _lib = lib
        logger.info("native ETL kernels loaded from %s", _LIB_PATH)
        return _lib


# ----------------------------------------------------------------------------
# High-level wrappers (numpy in/out)
# ----------------------------------------------------------------------------


def pack_ngrams_batch(seq_bytes_list, n: int):
    """Pack n-gram keys for a list of byte arrays.  Returns (keys, counts)."""
    lib = get_lib()
    offsets = np.zeros(len(seq_bytes_list) + 1, dtype=np.int64)
    for i, b in enumerate(seq_bytes_list):
        offsets[i + 1] = offsets[i] + len(b)
    data = np.concatenate([np.frombuffer(bytes(b), dtype=np.uint8) for b in seq_bytes_list]) if seq_bytes_list else np.empty(0, np.uint8)
    max_windows = int(sum(max(0, len(b) - n + 1) for b in seq_bytes_list))
    out = np.empty(max_windows, dtype=np.uint64)
    counts = np.empty(len(seq_bytes_list), dtype=np.int64)
    total = lib.pack_ngrams_batch(np.ascontiguousarray(data), offsets, len(seq_bytes_list), n, out, counts)
    return out[:total], counts


def emit_pairs(ids: np.ndarray, counts: np.ndarray, nn: int) -> np.ndarray:
    lib = get_lib()
    max_pairs = int(np.maximum(counts - 1, 0).sum())
    out = np.empty(max_pairs, dtype=np.uint64)
    written = lib.emit_pairs(
        np.ascontiguousarray(ids, np.int64), np.ascontiguousarray(counts, np.int64),
        len(counts), np.uint64(nn), out,
    )
    return out[:written]


def aggregate_u64(keys: np.ndarray):
    lib = get_lib()
    keys = np.ascontiguousarray(keys, np.uint64).copy()
    out_keys = np.empty(len(keys), dtype=np.uint64)
    out_counts = np.empty(len(keys), dtype=np.int64)
    u = lib.aggregate_u64(keys, len(keys), out_keys, out_counts)
    return out_keys[:u].copy(), out_counts[:u].copy()


def merge_aggregates(ka, ca, kb, cb):
    lib = get_lib()
    out_keys = np.empty(len(ka) + len(kb), dtype=np.uint64)
    out_counts = np.empty(len(ka) + len(kb), dtype=np.int64)
    u = lib.merge_aggregates(
        np.ascontiguousarray(ka, np.uint64), np.ascontiguousarray(ca, np.int64), len(ka),
        np.ascontiguousarray(kb, np.uint64), np.ascontiguousarray(cb, np.int64), len(kb),
        out_keys, out_counts,
    )
    return out_keys[:u].copy(), out_counts[:u].copy()


def lookup_sorted(vocab_keys: np.ndarray, keys: np.ndarray) -> np.ndarray:
    lib = get_lib()
    out = np.empty(len(keys), dtype=np.int64)
    lib.lookup_sorted(
        np.ascontiguousarray(vocab_keys, np.uint64), len(vocab_keys),
        np.ascontiguousarray(keys, np.uint64), len(keys), out,
    )
    return out


def available() -> bool:
    return get_lib() is not None
