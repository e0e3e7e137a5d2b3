"""Embedding quantization: symmetric per-vector int8 scalar quantization.

At 100 TB an fp32 embedding table is the storage/IO bottleneck of every
similarity stage; int8 symmetric quantization (scale = max|x| / 127 per
vector, codes = round(x / scale)) cuts it 4× with ~0.1% cosine error and
is the standard ANN-index storage layout.  The op is a stateless
vectorized ``map_batches`` pass — no shuffle, no driver traffic — over
zero-copy Arrow list columns (one flat values-buffer reduce per batch
via ``np.maximum.reduceat``).

``quantize_embeddings`` returns the real coded Dataset
(vec_id, scale, q list<int8>); ``q_emb_quantize_int8`` projects
SQL-comparable per-vector checksums (code sum / L1) so the whole kernel
— including round-half-away-from-zero parity with DuckDB ``round`` — is
exactly oracled.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

QUANT_LEVELS = 127


def _flat_f64(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat float64 values, row offsets) of a list<float> column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # zero chunks edge
        arr = pa.array([], type=pa.list_(pa.float32()))
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    return vals, offs


def _quant_codes(vals: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-vector symmetric int8 codes + scales over the flat buffer.

    Rounding is half-away-from-zero to match SQL ``round`` (numpy's
    ``np.round`` is half-to-even and would diverge on exact .5 ties)."""
    n = len(offs) - 1
    if n == 0:
        return np.empty(0, np.int8), np.empty(0, np.float64)
    empty = offs[:-1] == offs[1:]
    if len(vals) == 0:
        amax = np.zeros(n)
    else:
        # reduceat rejects start == len(vals) (trailing empty vectors);
        # clip, then zero every empty segment's bogus single-element value
        amax = np.maximum.reduceat(np.abs(vals), np.minimum(offs[:-1], len(vals) - 1))
    amax[empty] = 0.0                       # empty vectors
    scale = amax / QUANT_LEVELS
    denom = np.repeat(np.where(amax > 0, amax, 1.0), np.diff(offs))
    t = vals * float(QUANT_LEVELS) / denom
    t[np.repeat(amax == 0, np.diff(offs))] = 0.0
    codes = np.where(t >= 0, np.floor(t + 0.5), np.ceil(t - 0.5))
    return np.clip(codes, -QUANT_LEVELS, QUANT_LEVELS).astype(np.int8), scale


def quantize_embeddings(sf_dir: str) -> rd.Dataset:
    """embeddings → (vec_id, scale, q list<int8>): the 4×-smaller stored
    layout an ANN index would persist."""

    def f(t: pa.Table) -> pa.Table:
        vals, offs = _flat_f64(t["embedding"])
        codes, scale = _quant_codes(vals, offs)
        q = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), pa.array(codes, type=pa.int8())
        )
        return pa.table(
            {
                "vec_id": pa.compute.cast(t["vec_id"], pa.int64()),
                "scale": pa.array(scale, type=pa.float64()),
                "q": q,
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(f, batch_format="pyarrow")


def q_emb_quantize_int8(sf_dir: str):
    """SQL-comparable checksums of the int8 quantization kernel."""

    def f(t: pa.Table) -> pa.Table:
        vals, offs = _flat_f64(t["embedding"])
        codes, scale = _quant_codes(vals, offs)
        c64 = codes.astype(np.int64)
        empty = offs[:-1] == offs[1:]
        if len(c64) == 0:
            sums = l1 = np.zeros(max(len(offs) - 1, 0), np.int64)
        else:
            starts = np.minimum(offs[:-1], len(c64) - 1)
            sums = np.where(empty, 0, np.add.reduceat(c64, starts))
            l1 = np.where(empty, 0, np.add.reduceat(np.abs(c64), starts))
        return pa.table(
            {
                "vec_id": pa.compute.cast(t["vec_id"], pa.int64()),
                "n_dims": pa.array(np.diff(offs), type=pa.int64()),
                "scale": pa.array(scale, type=pa.float64()),
                "q_sum": pa.array(sums, type=pa.int64()),
                "q_l1": pa.array(l1, type=pa.int64()),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).map_batches(f, batch_format="pyarrow")


QUANTIZE_QUERIES = {"emb_quantize_int8": q_emb_quantize_int8}

QUANTIZE_ORACLES = {
    # identical double-precision expression tree: element→DOUBLE, ×127,
    # ÷ per-vector max|x|, round half-away, BIGINT checksums
    "emb_quantize_int8": f"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 y -> abs(CAST(y AS DOUBLE)))) AS amax
  FROM embeddings
)
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS n_dims,
       amax / {QUANT_LEVELS} AS scale,
       CAST(CASE WHEN amax = 0 THEN 0 ELSE list_sum(list_transform(embedding,
            y -> CAST(round(CAST(y AS DOUBLE) * {QUANT_LEVELS}.0 / amax) AS BIGINT)))
            END AS BIGINT) AS q_sum,
       CAST(CASE WHEN amax = 0 THEN 0 ELSE list_sum(list_transform(embedding,
            y -> abs(CAST(round(CAST(y AS DOUBLE) * {QUANT_LEVELS}.0 / amax) AS BIGINT))))
            END AS BIGINT) AS q_l1
FROM s
""",
}
