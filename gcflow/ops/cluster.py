"""Distributed k-means over the embedding corpus — the iterative-ML
operator shape: per-iteration E-step fully in the distributed plane,
M-step over tiny mergeable partials.

Scale contract (the part that must hold at 10^12 rows):
- The corpus NEVER reaches the driver.  Each iteration is one streaming
  ``map_batches`` pass: assign rows to the broadcast centroids, emit ONE
  partial row per (batch, cluster) = (cluster, n, sum-vector as packed
  float64 bytes).  Partials merge with ``groupby(cluster).map_groups``
  (k groups, each holding #batches small rows), so the driver receives
  exactly k rows of dim×8 bytes per iteration.
- Only the k×dim centroid matrix is broadcast (``ray.put``) per
  iteration.
- Initialization is deterministic: the vectors of ``vec_id < k`` via a
  row-filtered parquet read (no scan).

Iterative algorithms are not SQL-expressible → registered rows-only;
pytest asserts exact agreement of the (cluster, n) result with an
in-memory numpy twin at sf0.001 and that inertia is non-increasing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

KM_K = 8
KM_ITERS = 5


def _init_centroids(src: str, k: int) -> np.ndarray:
    t = pq.read_table(
        src, columns=["vec_id", "embedding"], filters=[("vec_id", "<", k)]
    )
    ids = t["vec_id"].to_numpy()
    V = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return V[np.argsort(ids)]


def _embedding_matrix(t: pa.Table) -> np.ndarray:
    """Default row-matrix extractor: the ``embedding`` list column."""
    return np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)


def kmeans_fit(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS) -> np.ndarray:
    """Lloyd iterations with distributed E-step; returns centroids."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    C = _init_centroids(src, k)
    ds = rd.read_parquet(src, columns=["embedding"])
    return lloyd_iterations(ds, C, iters)


def lloyd_iterations(
    ds: rd.Dataset, C: np.ndarray, iters: int, to_matrix=_embedding_matrix
) -> np.ndarray:
    """The distributed Lloyd core over ANY Dataset: ``to_matrix`` maps a
    batch to its float64 row matrix (list column, packed binary, …).
    Scale contract as in the module docstring — per-iteration driver
    traffic is exactly k rows of dim×8 bytes."""
    for _ in range(iters):
        cref = ray.put(C)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            Cl = ray.get(_cref)
            V = to_matrix(t)
            # squared-euclidean argmin via the expanded form (‖v‖² is
            # constant per row → argmin over -2 v·c + ‖c‖²)
            d = -2.0 * (V @ Cl.T) + (Cl * Cl).sum(axis=1)[None, :]
            a = np.argmin(d, axis=1)
            cells, counts = np.unique(a, return_counts=True)
            sums = np.zeros((len(cells), V.shape[1]))
            np.add.at(sums, np.searchsorted(cells, a), V)
            return pa.table(
                {
                    "cluster": pa.array(cells.astype(np.int64)),
                    "n": pa.array(counts.astype(np.int64)),
                    "vsum": pa.array([s.tobytes() for s in sums], type=pa.binary()),
                }
            )

        def merge(g: pa.Table) -> pa.Table:
            n = int(pc.sum(g["n"]).as_py())
            s = np.zeros(len(C[0]))
            for b in g["vsum"].to_pylist():
                s += np.frombuffer(b, dtype=np.float64)
            return pa.table(
                {
                    "cluster": pa.array([g["cluster"][0].as_py()], type=pa.int64()),
                    "n": pa.array([n], type=pa.int64()),
                    "vsum": pa.array([s.tobytes()], type=pa.binary()),
                }
            )

        merged = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(merge, batch_format="pyarrow")
            .to_pandas()
        )
        Cn = C.copy()  # empty clusters keep their centroid
        for _, row in merged.iterrows():
            if row["n"] > 0:
                Cn[int(row["cluster"])] = (
                    np.frombuffer(row["vsum"], dtype=np.float64) / row["n"]
                )
        C = Cn
    return C


def q_emb_kmeans(sf_dir: str, k: int = KM_K, iters: int = KM_ITERS):
    """Cluster-size profile after ``iters`` Lloyd rounds: (cluster, n),
    one row per cluster, deterministic given the fixed init."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    C = kmeans_fit(sf_dir, k=k, iters=iters)
    cref = ray.put(C)
    ds = rd.read_parquet(src, columns=["embedding"])

    def assign_count(t: pa.Table) -> pa.Table:
        Cl = ray.get(cref)
        V = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        d = -2.0 * (V @ Cl.T) + (Cl * Cl).sum(axis=1)[None, :]
        a = np.argmin(d, axis=1)
        cells, counts = np.unique(a, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(cells.astype(np.int64)),
                "np_": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(assign_count, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("np_", alias_name="n"))
        .to_pandas()
        .sort_values("cluster")
    )
    return pa.table(
        {
            "cluster": pa.array(out["cluster"], type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
        }
    )


CLUSTER_QUERIES = {
    "emb_kmeans": q_emb_kmeans,
}

CLUSTER_ORACLES = {
    # iterative (5 Lloyd rounds) → not SQL-expressible; rows-only, with
    # an exact numpy-twin equality test in pytest
}
