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


# ------------------------------------------------- product quantization
# Jégou et al. 2011 ("Product Quantization for Nearest Neighbor
# Search"): split each vector into M subspaces and vector-quantize each
# subspace with its own k-codeword codebook — M log2(k)-bit codes per
# vector (here 8 bytes for a 64-dim fp32 vector = 32×) with far lower
# distortion than scalar quantization at the same rate; the storage/IVF
# layout every billion-scale ANN system uses.
#
# Training is a FUSED multi-codebook Lloyd: ONE streaming pass per
# iteration assigns every subspace of every vector (a single batched
# argmin over the (M, k) codebooks) and emits per-(subspace, cell)
# partials — (M × k) rows of d_sub × 8 bytes reach the driver per
# iteration, independent of corpus size, M× cheaper than M separate
# k-means fits and identical arithmetic.  Codebook init is
# deterministic (vectors vec_id < k, subsliced).  Iterative training is
# not SQL-expressible → rows-only; pytest pins codes + distortion
# against a serial numpy twin and checks the rate/distortion sanity vs
# int8.

PQ_M = 8          # subspaces (64-dim → 8 dims each)
PQ_K = 16         # codewords per subspace (4-bit codes)
PQ_ITERS = 5


def pq_fit(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
           iters: int = PQ_ITERS) -> np.ndarray:
    """(m, k, d_sub) codebooks via fused distributed Lloyd."""
    import pyarrow.parquet as pq_

    from .cluster import _init_centroids

    src = os.path.join(sf_dir, "embeddings.parquet")
    first = pq_.ParquetFile(src).read_row_group(0, columns=["embedding"])
    dim = len(first["embedding"][0])
    ds = rd.read_parquet(src, columns=["embedding"])
    return pq_fit_from(ds, _init_centroids(src, k), dim, m=m, k=k, iters=iters)


def pq_fit_cached(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
                  iters: int = PQ_ITERS,
                  cache_root: str = "/tmp/gcflow_pqfit") -> np.ndarray:
    """``pq_fit`` behind a disk cache keyed by (corpus identity, params),
    for callers where the codebook is INDEX BUILD, not the measured op —
    the PQ search amortizes its build across query batches exactly like
    the IVF/LSH/IVF-PQ sidecars (similarity.py ``build_*`` protocol).
    ``q_emb_pq`` deliberately does NOT use this: live Lloyd training is
    what that op measures.  Publish is race-safe: train to a pid-unique
    .npy then ``os.replace`` (atomic on one fs); losers overwrite with
    an identical array (deterministic init → deterministic codebook)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    key = (
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}"
        f"|pq{m}x{k}|it{iters}"
    )
    import hashlib as _hl

    path = os.path.join(
        cache_root, _hl.md5(key.encode()).hexdigest()[:16] + ".npy"
    )
    if os.path.exists(path):
        return np.load(path)
    C = pq_fit(sf_dir, m=m, k=k, iters=iters)
    os.makedirs(cache_root, exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp.npy"  # .npy suffix: np.save appends otherwise
    np.save(tmp, C)
    os.replace(tmp, path)
    return C


def pq_fit_from(ds: rd.Dataset, init_vecs: np.ndarray, dim: int,
                m: int = PQ_M, k: int = PQ_K,
                iters: int = PQ_ITERS) -> np.ndarray:
    """The fused multi-codebook Lloyd core over ANY Dataset with an
    ``embedding`` list column (raw vectors, residuals, …); ``init_vecs``
    is a deterministic (k, dim) seed matrix."""
    import ray

    assert dim % m == 0, (dim, m)
    d_sub = dim // m
    C = init_vecs.reshape(k, m, d_sub).transpose(1, 0, 2).copy()

    for _ in range(iters):
        cref = ray.put(C)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            Cl = ray.get(_cref)            # (m, k, d_sub)
            vals, offs = _flat_f64(t["embedding"])
            V = vals.reshape(-1, m, d_sub)  # (n, m, d_sub)
            # ‖v−c‖² argmin via the expanded form per subspace
            d2 = -2.0 * np.einsum("nmd,mkd->nmk", V, Cl) + (
                Cl * Cl
            ).sum(axis=2)[None, :, :]
            a = np.argmin(d2, axis=2)       # (n, m)
            rows = {"m": [], "cell": [], "n": [], "s": []}
            for mi in range(m):
                cells, counts = np.unique(a[:, mi], return_counts=True)
                sums = np.zeros((len(cells), d_sub))
                np.add.at(sums, np.searchsorted(cells, a[:, mi]), V[:, mi, :])
                rows["m"].extend([mi] * len(cells))
                rows["cell"].extend(cells.tolist())
                rows["n"].extend(counts.tolist())
                rows["s"].extend(sums.tobytes()[i * d_sub * 8:(i + 1) * d_sub * 8]
                                 for i in range(len(cells)))
            return pa.table(
                {
                    "m": pa.array(rows["m"], type=pa.int64()),
                    "cell": pa.array(rows["cell"], type=pa.int64()),
                    "n": pa.array(rows["n"], type=pa.int64()),
                    "s": pa.array(rows["s"], type=pa.binary()),
                }
            )

        def merge(g: pa.Table) -> pa.Table:
            if len(g) == 0:
                return pa.schema(
                    [("m", pa.int64()), ("cell", pa.int64()),
                     ("n", pa.int64()), ("s", pa.binary())]
                ).empty_table()
            n = int(g["n"].to_numpy().sum())
            s = np.zeros(d_sub)
            # deterministic accumulation order (float sums reassociate)
            for b in sorted(g["s"].to_pylist()):
                s += np.frombuffer(b, dtype=np.float64)
            return pa.table(
                {
                    "m": g["m"][:1], "cell": g["cell"][:1],
                    "n": pa.array([n], type=pa.int64()),
                    "s": pa.array([s.tobytes()], type=pa.binary()),
                }
            )

        got = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["m", "cell"])
            .map_groups(merge, batch_format="pyarrow")
            .to_pandas()
        )
        for _, r in got.iterrows():
            if r["n"] > 0:
                C[int(r["m"]), int(r["cell"])] = (
                    np.frombuffer(r["s"], dtype=np.float64) / r["n"]
                )
    return C


def pq_encode(ds: rd.Dataset, C: np.ndarray) -> rd.Dataset:
    """(vec_id, codes binary[m], recon_err float64) — streaming pass."""
    import ray

    m, k, d_sub = C.shape
    cref = ray.put(C)

    def encode(t: pa.Table, _cref=cref) -> pa.Table:
        Cl = ray.get(_cref)
        vals, offs = _flat_f64(t["embedding"])
        V = vals.reshape(-1, m, d_sub)
        d2 = -2.0 * np.einsum("nmd,mkd->nmk", V, Cl) + (
            Cl * Cl
        ).sum(axis=2)[None, :, :]
        a = np.argmin(d2, axis=2).astype(np.uint8)       # (n, m)
        recon = np.take_along_axis(
            Cl[None, :, :, :].repeat(len(V), axis=0),
            a[:, :, None, None].astype(np.int64), axis=2,
        )[:, :, 0, :]
        err = ((V - recon) ** 2).sum(axis=(1, 2))
        n = len(V)
        codes = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None,
             pa.py_buffer((np.arange(n + 1, dtype=np.int32) * m).tobytes()),
             pa.py_buffer(a.tobytes())],
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "codes": codes,
                "recon_err": pa.array(err, type=pa.float64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def q_emb_pq(sf_dir: str):
    """Product-quantize every embedding: (vec_id, codes, recon_err)."""
    C = pq_fit(sf_dir)
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    return pq_encode(ds, C)


QUANTIZE_QUERIES["emb_pq"] = q_emb_pq
# iterative codebook training is not SQL-expressible — rows-only
