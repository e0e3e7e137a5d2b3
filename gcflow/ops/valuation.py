"""Distributed kNN-Shapley data valuation over the embedding corpus
(Jia et al. 2019, "Efficient Task-Specific Data Valuation for Nearest
Neighbor Algorithms" — the exact closed form, not Monte Carlo).

For a validation point (x_v, y_v) and train points sorted by distance
ascending (alpha_1 nearest), with u_i = 1[y_{alpha_i} = y_v]:

    s_{alpha_N} = u_N / N
    s_{alpha_i} = s_{alpha_{i+1}}
                  + (u_i - u_{i+1}) * min(K, i) / (K * i)

i.e. a SUFFIX SUM over descending rank — the same shape as the
global-rank / running-total ops (quantile.py:q_evt_value_rank), so it
distributes the same way:

1. ONE streaming pass computes (train, val) distance pairs against the
   broadcast validation matrix (V x d, ray.put once) — the corpus is
   read exactly once; the pair set (N*V rows) is materialized so the
   bounds / counts / suffix passes scan it instead of re-executing the
   distance lineage (the dsir materialize() lesson, ADVICE r4).
2. Pairs are range-bucketed on distance; a (val, bucket) count collect
   (<= V*B rows) gives every bucket its global start rank.
3. One map_groups per (val, bucket): sort locally, build the interior
   delta terms from GLOBAL ranks, reverse-cumsum them (LS_p).
4. A V*B-row summary collect (first/last u, interior sum) lets the
   driver chain the per-bucket suffix constants in O(V*B) scalar work —
   the recurrence never runs element-by-element anywhere.
5. Final streaming pass adds the per-bucket constant and a vec_id-keyed
   mean over validation points yields the Shapley value.

Scale contract: nothing corpus-sized reaches the driver (collects are
V*B rows); the only all-to-all is the (val, bucket) shuffle of the pair
set.  The validation set must be SMALL (a fixed benchmark set; guarded
at 4096) — here it is a closed form of vec_id so the DuckDB oracle can
mirror it, the same trick the multimodal kernels use.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

K_NN = 5
VAL_MOD = 61          # vec_id % VAL_MOD == 0 → validation point
SHAP_BUCKETS = 64     # distance-range buckets; raise with the corpus
VAL_CEILING = 4096    # valuation is O(N*V): keep the val side a benchmark


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"],
    )


def _matrix(t: pa.Table) -> np.ndarray:
    return np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)


def q_emb_knn_shapley(sf_dir: str, k: int = K_NN, val_mod: int = VAL_MOD):
    """``val_mod`` picks the validation set (vec_id % val_mod == 0).  The
    default is sized for the sf tables; a production call points this at
    a FIXED benchmark set — scale val_mod with the corpus so V stays
    constant (the stress harness does exactly that), because valuation
    cost is O(N*V) by construction."""

    def val_only(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.asarray(t["vec_id"]) % val_mod == 0))

    val = (
        _emb(sf_dir)
        .map_batches(val_only, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    if len(val) > VAL_CEILING:
        raise ValueError(
            f"validation set {len(val)} exceeds {VAL_CEILING}; kNN-Shapley "
            "cost is O(N*V) — point this op at a fixed benchmark set"
        )
    W = np.vstack(val["embedding"].to_numpy()).astype(np.float64)
    vlab = val["label"].to_numpy().astype(np.int64)
    vids = val["vec_id"].to_numpy().astype(np.int64)
    ref = ray.put((vids, vlab, W))

    def make_pairs(t: pa.Table, _ref=ref, _vm=val_mod) -> pa.Table:
        ids_v, labs_v, M = ray.get(_ref)
        mask = np.asarray(t["vec_id"]) % _vm != 0
        t = t.filter(pa.array(mask))
        if len(t) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "val_id": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.float64()),
                    "u": pa.array([], pa.float64()),
                }
            )
        V = _matrix(t)
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        labs = np.asarray(t["label"], dtype=np.int64)
        n, v = len(ids), len(ids_v)
        # per-val squared distance; the naive (x-w)^2 sum rounds like the
        # oracle's sequential list_sum (drift ~1e-16, far below rank gaps)
        D = np.empty((n, v))
        for j in range(v):
            D[:, j] = ((V - M[j]) ** 2).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, v), type=pa.int64()),
                "val_id": pa.array(np.tile(ids_v, n), type=pa.int64()),
                "dist": pa.array(D.ravel(), type=pa.float64()),
                "u": pa.array(
                    (labs[:, None] == labs_v[None, :]).astype(np.float64).ravel(),
                    type=pa.float64(),
                ),
            }
        )

    pairs = _emb(sf_dir).map_batches(make_pairs, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Max, Min

    bounds = pairs.aggregate(Min("dist"), Max("dist"))
    lo, hi = bounds["min(dist)"], bounds["max(dist)"]
    cuts = np.linspace(lo, hi, SHAP_BUCKETS + 1)[1:-1]

    def bucketize(t: pa.Table) -> pa.Table:
        b = np.searchsorted(cuts, np.asarray(t["dist"]), side="right").astype(np.int64)
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    bk = pairs.map_batches(bucketize, batch_format="pyarrow")

    counts = (
        bk.groupby(["val_id", "bucket"]).count().to_pandas().sort_values(["val_id", "bucket"])
    )
    offsets: dict[tuple[int, int], int] = {}
    sizes: dict[tuple[int, int], int] = {}
    n_train: dict[int, int] = {}
    for vid, grp in counts.groupby("val_id"):
        acc = 0
        for b, c in zip(grp["bucket"], grp["count()"]):
            offsets[(int(vid), int(b))] = acc
            sizes[(int(vid), int(b))] = int(c)
            acc += int(c)
        n_train[int(vid)] = acc

    def suffix_local(t: pa.Table, _offs=offsets, _k=k) -> pa.Table:
        vid = int(t["val_id"][0].as_py())
        b = int(t["bucket"][0].as_py())
        t = t.sort_by([("dist", "ascending"), ("vec_id", "ascending")])
        u = np.asarray(t["u"])
        m = len(u)
        off = _offs[(vid, b)]
        ig = off + np.arange(1, m)  # global 1-based rank of elements 1..m-1
        delta = (u[:-1] - u[1:]) * np.minimum(_k, ig) / (_k * ig)
        ls = np.concatenate((np.cumsum(delta[::-1])[::-1], [0.0]))
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "val_id": t["val_id"],
                "bucket": t["bucket"],
                "p": pa.array(np.arange(1, m + 1), type=pa.int64()),
                "u": t["u"],
                "ls": pa.array(ls, type=pa.float64()),
            }
        )

    sorted1 = (
        bk.groupby(["val_id", "bucket"])
        .map_groups(suffix_local, batch_format="pyarrow")
        .materialize()
    )

    # V*B-row summary collect: first/last u and the interior suffix total
    def summarize(t: pa.Table, _sizes=sizes) -> pa.Table:
        vids_ = np.asarray(t["val_id"])
        bs = np.asarray(t["bucket"])
        ps = np.asarray(t["p"])
        msz = np.fromiter(
            (_sizes[(int(v_), int(b_))] for v_, b_ in zip(vids_, bs)),
            dtype=np.int64,
            count=len(t),
        )
        keep = (ps == 1) | (ps == msz)
        return t.filter(pa.array(keep)).select(["val_id", "bucket", "p", "u", "ls"])

    summ = sorted1.map_batches(summarize, batch_format="pyarrow").to_pandas()

    const: dict[tuple[int, int], float] = {}
    for vid, grp in summ.groupby("val_id"):
        vid = int(vid)
        n = n_train[vid]
        firsts = {
            int(r.bucket): (float(r.u), float(r.ls))
            for r in grp[grp.p == 1].itertuples()
        }
        lasts = {
            int(r.bucket): float(r.u)
            for r in grp[
                grp.p == grp.bucket.map(lambda b: sizes[(vid, int(b))])
            ].itertuples()
        }
        s_first_next = u_first_next = None
        for b in sorted(firsts, reverse=True):
            end_rank = offsets[(vid, b)] + sizes[(vid, b)]
            if s_first_next is None:  # globally farthest bucket
                c = lasts[b] / n
            else:
                db = (
                    (lasts[b] - u_first_next)
                    * min(k, end_rank)
                    / (k * end_rank)
                )
                c = db + s_first_next
            const[(vid, b)] = c
            u_first_next = firsts[b][0]
            s_first_next = firsts[b][1] + c

    def finalize(t: pa.Table, _const=const) -> pa.Table:
        vids_ = np.asarray(t["val_id"])
        bs = np.asarray(t["bucket"])
        cs = np.fromiter(
            (_const[(int(v_), int(b_))] for v_, b_ in zip(vids_, bs)),
            dtype=np.float64,
            count=len(t),
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "s": pa.array(np.asarray(t["ls"]) + cs, type=pa.float64()),
            }
        )

    out = (
        sorted1.map_batches(finalize, batch_format="pyarrow")
        .groupby("vec_id")
        .mean("s")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["vec_id", "shapley"]), batch_format="pyarrow"
    )


VALUATION_QUERIES = {"emb_knn_shapley": q_emb_knn_shapley}

VALUATION_ORACLES = {
    "emb_knn_shapley": f"""
WITH val AS (
  SELECT vec_id AS val_id, CAST(label AS BIGINT) AS vlabel, embedding AS vemb
  FROM embeddings WHERE vec_id % {VAL_MOD} = 0
), tr AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding
  FROM embeddings WHERE vec_id % {VAL_MOD} <> 0
), pairs AS (
  SELECT t.vec_id, v.val_id,
         list_sum(list_transform(list_zip(t.embedding, v.vemb),
           x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
              * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))) AS dist,
         CASE WHEN t.label = v.vlabel THEN 1.0 ELSE 0.0 END AS u
  FROM tr t CROSS JOIN val v
), r AS (
  SELECT vec_id, val_id, dist, u,
         row_number() OVER (PARTITION BY val_id ORDER BY dist, vec_id) AS i,
         count(*) OVER (PARTITION BY val_id) AS n,
         lead(u) OVER (PARTITION BY val_id ORDER BY dist, vec_id) AS u_next
  FROM pairs
), d AS (
  SELECT vec_id, val_id, i,
         CASE WHEN i < n
              THEN (u - u_next) * least({K_NN}, i) / ({K_NN} * i)
              ELSE u / n END AS term
  FROM r
), s AS (
  SELECT vec_id, val_id,
         sum(term) OVER (PARTITION BY val_id ORDER BY i DESC) AS s
  FROM d
)
SELECT vec_id, avg(s) AS shapley FROM s GROUP BY 1
""",
}
