"""Similarity search over the embedding column.

- ``emb_ann_topk``: brute-force cosine top-k — the exactness baseline.
  The (small) query matrix is broadcast once with ``ray.put``; each batch
  does one numpy matmul against it and emits only its block-local top-k
  partials, which a tiny final reduce merges.  Shuffle volume:
  O(batches × queries × k), never O(corpus).
- ``emb_lsh_search``: the scale path — random-hyperplane LSH bucketing
  (signature groupby), probing only matching buckets; approximate, so
  rows-only for the driver, with recall vs brute force asserted in pytest.
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


def _read_emb(sf_dir: str):
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy()
    E = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return ids, E


def q_emb_ann_topk(sf_dir: str):
    """Exact top-k neighbours (cosine) for queries vec_id < N_QUERIES,
    self excluded; rank ties broken by vec_id ascending."""
    qids, Q = _read_emb(sf_dir)
    qmask = qids < N_QUERIES
    Qn = Q[qmask] / np.linalg.norm(Q[qmask], axis=1, keepdims=True)
    qref = ray.put((qids[qmask], Qn))

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
    # tiny final reduce: global top-k per query with the same tie-break
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


def q_emb_lsh_search(sf_dir: str):
    """Approximate top-k via random-hyperplane signatures: corpus bucketed
    by 8-bit signature (a groupby at scale); each query probes only
    buckets within hamming distance 2 of its own signature."""
    rng = np.random.RandomState(7)
    ids, E = _read_emb(sf_dir)
    dim = E.shape[1]
    planes = rng.normal(size=(N_PLANES, dim))
    planes_ref = ray.put(planes)
    qmask = ids < N_QUERIES

    class Signature:
        def __init__(self, r):
            self.planes = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            V = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            bits = (V @ self.planes.T) > 0
            sig = (bits * (1 << np.arange(N_PLANES))).sum(axis=1)
            return t.append_column("sig", pa.array(sig, type=pa.int64()))

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    signed = ds.map_batches(
        Signature, fn_constructor_args=(planes_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    ).to_pandas()

    qsig = {}
    Qn = {}
    for _, row in signed[signed["vec_id"] < N_QUERIES].iterrows():
        v = np.asarray(row["embedding"], dtype=np.float64)
        Qn[row["vec_id"]] = v / np.linalg.norm(v)
        qsig[row["vec_id"]] = int(row["sig"])

    sigs = signed["sig"].to_numpy()
    all_ids = signed["vec_id"].to_numpy()
    V = np.vstack(signed["embedding"].to_numpy()).astype(np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    out_q, out_v, out_r = [], [], []
    for qid, qs in sorted(qsig.items()):
        ham = np.array([bin(int(s) ^ qs).count("1") for s in sigs])
        probe = (ham <= 2) & (all_ids != qid)
        cand_ids = all_ids[probe]
        sims = Vn[probe] @ Qn[qid]
        order = np.lexsort((cand_ids, -sims))[:TOP_K]
        for r, k in enumerate(order, 1):
            out_q.append(int(qid))
            out_v.append(int(cand_ids[k]))
            out_r.append(r)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_v, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


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
