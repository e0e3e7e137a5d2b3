"""Similarity search over the embedding column.

- ``emb_ann_topk``: brute-force cosine top-k — the exactness baseline.
  The (small) query matrix is broadcast once with ``ray.put``; each batch
  does one numpy matmul against it and emits only its block-local top-k
  partials, which a tiny final reduce merges.  Shuffle volume:
  O(batches × queries × k), never O(corpus).
- ``emb_lsh_search``: the scale path — random-hyperplane LSH signatures;
  each batch probes only rows whose signature lies within hamming
  distance 2 of a query's signature (a vectorized popcount mask), emits
  block-local top-k partials, and a tiny reduce merges them.  The corpus
  never leaves the distributed plane; only the 8-query matrix is
  broadcast.  Approximate, so rows-only for the driver, with recall vs
  brute force asserted in pytest.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

N_QUERIES = 8
TOP_K = 10


def _read_queries(sf_dir: str):
    """Row-filtered read of ONLY the tiny query set (the driver must never
    load the full embedding corpus — at scale that is the job's input)."""
    qt = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    qids = qt["vec_id"].to_numpy()
    Q = np.vstack(qt["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    order = np.argsort(qids)
    return qids[order], Q[order]


def q_emb_ann_topk(sf_dir: str):
    """Exact top-k neighbours (cosine) for queries vec_id < N_QUERIES,
    self excluded; rank ties broken by vec_id ascending."""
    qids, Q = _read_queries(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qref = ray.put((qids, Qn))

    class PartialTopK:
        def __init__(self, r):
            self.qids, self.Qn = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            V = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            sims = self.Qn @ Vn.T  # queries × block
            out_q, out_v, out_c = [], [], []
            for qi, qid in enumerate(self.qids):
                s = sims[qi]
                keep = ids != qid
                order = np.lexsort((ids[keep], -s[keep]))[:TOP_K]
                sel = np.flatnonzero(keep)[order]
                out_q.extend([int(qid)] * len(sel))
                out_v.extend(ids[sel].tolist())
                out_c.extend(s[sel].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_v, type=pa.int64()),
                    "cos": pa.array(out_c, type=pa.float64()),
                }
            )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(
        PartialTopK, fn_constructor_args=(qref,), batch_format="pyarrow",
        batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    return _topk_reduce(partials)


def _topk_reduce(partials):
    """Tiny final reduce over block-local top-k partials (O(blocks × k × q)
    rows): global top-k per query, ties broken by neighbor_id ascending."""
    partials = partials.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    top = partials.groupby("query_id", sort=True).head(TOP_K).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.table(
        {
            "query_id": pa.array(top["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(top["neighbor_id"], type=pa.int64()),
            "rank": pa.array(top["rank"], type=pa.int64()),
        }
    )


N_PLANES = 8  # 2^8 buckets


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def q_emb_lsh_search(sf_dir: str):
    """Approximate top-k via random-hyperplane signatures, fully
    distributed: only the query matrix (+ its signatures and the plane
    matrix) is broadcast.  Each batch signs its own rows, masks to rows
    within hamming distance 2 of a query's signature (vectorized popcount
    over the XOR), computes cosine against the masked rows only, and emits
    block-local top-k partials; ``_topk_reduce`` merges the tiny partials.
    Shuffle volume O(blocks × queries × k) — never O(corpus)."""
    rng = np.random.RandomState(7)
    qids, Q = _read_queries(sf_dir)
    dim = Q.shape[1]
    planes = rng.normal(size=(N_PLANES, dim))
    qbits = (Q @ planes.T) > 0
    qsigs = (qbits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    ref = ray.put((qids, Qn, qsigs, planes))

    class Probe:
        def __init__(self, r):
            self.qids, self.Qn, self.qsigs, self.planes = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy()
            V = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            bits = (V @ self.planes.T) > 0
            sig = (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)
            # rows × queries hamming distances (8-bit sigs → one popcount LUT)
            ham = _POPCOUNT8[(sig[:, None] ^ self.qsigs[None, :]) & 0xFF]
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            out_q, out_v, out_c = [], [], []
            for qi, qid in enumerate(self.qids):
                probe = (ham[:, qi] <= 2) & (ids != qid)
                if not probe.any():
                    continue
                cand_ids = ids[probe]
                sims = Vn[probe] @ self.Qn[qi]
                top = np.lexsort((cand_ids, -sims))[:TOP_K]
                out_q.extend([int(qid)] * len(top))
                out_v.extend(cand_ids[top].tolist())
                out_c.extend(sims[top].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "neighbor_id": pa.array(out_v, type=pa.int64()),
                    "cos": pa.array(out_c, type=pa.float64()),
                }
            )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    partials = ds.map_batches(
        Probe, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=4096, concurrency=(1, 4),
    ).to_pandas()
    return _topk_reduce(partials)


SIMILARITY_QUERIES = {
    "emb_ann_topk": q_emb_ann_topk,
    "emb_lsh_search": q_emb_lsh_search,
}

SIMILARITY_ORACLES = {
    "emb_ann_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS c
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {TOP_K}
""",
    # emb_lsh_search: approximate → rows-only
}
