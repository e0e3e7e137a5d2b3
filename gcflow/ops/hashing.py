"""Shared vectorized 64-bit content hashing for the dedup/curation ops.

``word_hashes`` is the single primitive: a seeded polars/ahash pass over a
flat Arrow string array — process-stable for a fixed polars version and
seed, vectorized in Rust, no per-row Python.  ``gram_hashes`` lifts it to
word n-grams as a polynomial fold over each length-``g`` window, so gram
STRINGS never need to be materialized just to be hashed.  Every consumer
(shingling, MinHash, SimHash, Bloom decontamination, the streaming dedup
index) derives its keys from these two, which keeps driver-built and
worker-built hashes of the same content identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HASH_SEED = 7
POLY = np.uint64(1099511628211)  # FNV-64 prime


def word_hashes(words: pa.Array) -> np.ndarray:
    """Seeded 64-bit hash per element of a flat string array."""
    import os
    import sys

    if "polars" not in sys.modules:
        # Ray already runs one task per CPU — polars' default
        # all-cores-per-process thread pool would oversubscribe the node
        # by ~num_cpus². Must be set before the first polars import.
        os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    if len(words) == 0:
        return np.empty(0, dtype=np.uint64)
    return pl.from_arrow(words).hash(seed=HASH_SEED).to_numpy().astype(np.uint64)


def gram_hashes(wh: np.ndarray, g: int) -> np.ndarray:
    """Hash of every length-``g`` window over the flat word-hash array
    (positions spanning doc boundaries are filtered by the caller)."""
    nw = len(wh) - g + 1
    if nw <= 0:
        return np.empty(0, dtype=np.uint64)
    acc = np.zeros(nw, dtype=np.uint64)
    for j in range(g):
        acc = acc * POLY + wh[j : j + nw]
    return acc


def gram_hash_scalar(gram: str) -> int:
    """Scalar twin of ``gram_hashes`` over one space-separated gram (or a
    single word) — for tests and reference implementations."""
    acc = np.uint64(0)
    for v in word_hashes(pa.array(gram.split(" "), type=pa.string())):
        acc = acc * POLY + v
    return int(acc)
