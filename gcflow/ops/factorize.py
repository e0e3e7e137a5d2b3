"""Distributed ALS matrix factorization over the customer×part purchase
matrix — the train-embeddings-from-interactions operator (Zhou et al.
2008, "Large-scale Parallel Collaborative Filtering for the Netflix
Prize"; the Spark MLlib ALS shape).  Each alternating step solves every
entity's d×d ridge system from ITS OWN interaction rows:

- Interactions are built once (orders ⋈ lineitem repartition join,
  integer quantities summed per (cust, part) — exact in any order) and
  materialized: a few ints per purchase pair, ~1% of the lineitem
  bytes.
- A half-step co-locates each entity's rows with ONE hash-bucket
  shuffle, broadcasts the OPPOSITE side's factor matrix via ``ray.put``
  (parts here; at 10^9-entity scale you broadcast whichever side is
  catalog-sized and route the other through a factor repartition join —
  the bucket sweep is unchanged), and solves all of a bucket's entities
  in one vectorized batch: per-row outer products accumulated with
  ``np.add.at`` into (n_entities, d, d) normal matrices, then one
  batched ``np.linalg.solve``.  No per-entity Python.
- Rows are sorted inside each bucket before accumulation, and bucket
  outputs are reassembled in entity order, so factors are
  bit-deterministic across runs (float sums never reassociate).
- Init is deterministic (unit vectors keyed by id hash); driver state
  per half-step is one factor matrix, bounded by the
  ``ALS_BROADCAST_MAX`` ceiling.

Iterative optimization is not SQL-expressible → rows-only; pytest pins
factors and the fit against a serial numpy twin running identical
arithmetic and asserts the objective decreases monotonically.

Reference-semantics analogue: gclog-parser trains nothing (SURVEY.md
§2.6) — beyond-parity LLM-data layer.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

ALS_DIM = 8
ALS_ITERS = 4
ALS_LAMBDA = 0.1
ALS_BUCKETS = 64
ALS_BROADCAST_MAX = 2_000_000  # rows ceiling for a factor-matrix broadcast


def interactions_ds(sf_dir: str) -> rd.Dataset:
    """(cust, part, qty int64) summed purchase quantities."""
    from .dedup import _ensure_schema, _join_partitions
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    nparts = _join_partitions(li.count(), orders.count())
    joined = li.join(
        orders, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cust": pc.cast(t["o_custkey"], pa.int64()),
                "part": pc.cast(t["l_partkey"], pa.int64()),
                "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
            }
        )

    return _ensure_schema(
        joined.map_batches(project, batch_format="pyarrow"),
        pa.schema(
            [("cust", pa.int64()), ("part", pa.int64()), ("qty", pa.int64())]
        ),
    ).groupby(["cust", "part"]).aggregate(Sum("qty", alias_name="qty"))


def _init_factors(ids: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic unit-ish init keyed by id: F[i, id % dim] = 1."""
    F = np.full((len(ids), dim), 0.1, dtype=np.float64)
    F[np.arange(len(ids)), ids % dim] += 1.0
    return F


def _half_step(inter: rd.Dataset, solve_col: str, other_col: str,
               other_ids: np.ndarray, other_F: np.ndarray,
               lam: float) -> tuple[np.ndarray, np.ndarray]:
    """Solve every `solve_col` entity's ridge system given the other
    side's factors; returns (sorted entity ids, factors)."""
    if len(other_ids) > ALS_BROADCAST_MAX:
        raise ValueError(
            f"{other_col} factor matrix has {len(other_ids)} rows — over "
            f"the {ALS_BROADCAST_MAX} broadcast ceiling; route it through "
            "a factor repartition join instead"
        )
    dim = other_F.shape[1]
    # other_ids is sorted (np.sort / sort_values upstream): binary-search
    # lookup instead of a dense max_id+1 position array, which would blow
    # up on SPARSE id spaces long before the row ceiling triggers
    ref = ray.put((other_ids, other_F))
    out_schema = pa.schema([("eid", pa.int64()), ("f", pa.binary())])

    def add_bucket(t: pa.Table) -> pa.Table:
        e = t[solve_col].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array(e % ALS_BUCKETS, type=pa.int64())
        )

    def sweep(g: pa.Table, _r=ref) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        oids, F = ray.get(_r)
        e = g[solve_col].to_numpy(zero_copy_only=False)
        o = g[other_col].to_numpy(zero_copy_only=False)
        r = g["qty"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((o, e))          # bit-stable accumulation
        e, o, r = e[order], o[order], r[order]
        uniq, inv = np.unique(e, return_inverse=True)
        V = F[np.searchsorted(oids, o)]      # (rows, d)
        A = np.zeros((len(uniq), dim, dim))
        np.add.at(A, inv, V[:, :, None] * V[:, None, :])
        b = np.zeros((len(uniq), dim))
        np.add.at(b, inv, V * r[:, None])
        A += lam * np.eye(dim)[None, :, :]
        X = np.linalg.solve(A, b)
        return pa.table(
            {
                "eid": pa.array(uniq, type=pa.int64()),
                "f": pa.array(
                    [X[i].tobytes() for i in range(len(uniq))],
                    type=pa.binary(),
                ),
            }
        )

    got = (
        inter.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .to_pandas()
    )
    got = got.sort_values("eid").reset_index(drop=True)
    ids = got["eid"].to_numpy()
    F = np.vstack(
        [np.frombuffer(b, dtype=np.float64) for b in got["f"]]
    ) if len(got) else np.zeros((0, dim))
    return ids, F


def als_fit(sf_dir: str, dim: int = ALS_DIM, iters: int = ALS_ITERS,
            lam: float = ALS_LAMBDA):
    """Returns (cust_ids, U, part_ids, V) after `iters` alternations."""
    inter = interactions_ds(sf_dir).materialize()
    # distinct-id collects are ENTITY-sized (the same order as the factor
    # matrices the algorithm broadcasts anyway, behind the same ceiling)
    # — never the interaction table itself
    part_ids = np.sort(
        inter.groupby("part").count().to_pandas()["part"].to_numpy()
    )
    if len(part_ids) > ALS_BROADCAST_MAX:
        raise ValueError(
            f"part side has {len(part_ids)} entities — over the "
            f"{ALS_BROADCAST_MAX} factor-broadcast ceiling"
        )
    V_ids, V = part_ids, _init_factors(part_ids, dim)
    U_ids, U = np.zeros(0, dtype=np.int64), np.zeros((0, dim))
    for _ in range(iters):
        U_ids, U = _half_step(inter, "cust", "part", V_ids, V, lam)
        V_ids, V = _half_step(inter, "part", "cust", U_ids, U, lam)
    return U_ids, U, V_ids, V


def q_rel_als_factors(sf_dir: str):
    """(kind, entity_id, f0..f{d-1}): the fitted customer and part
    factor embeddings."""
    U_ids, U, V_ids, V = als_fit(sf_dir)
    kind = ["cust"] * len(U_ids) + ["part"] * len(V_ids)
    ids = np.concatenate([U_ids, V_ids])
    F = np.vstack([U, V])
    cols = {
        "kind": pa.array(kind),
        "entity_id": pa.array(ids, type=pa.int64()),
    }
    for j in range(F.shape[1]):
        cols[f"f{j}"] = pa.array(F[:, j], type=pa.float64())
    return pa.table(cols)


FACTORIZE_QUERIES = {
    "rel_als_factors": q_rel_als_factors,
}

# iterative alternating least squares is not SQL-expressible — rows-only
# (pytest twin asserts factor equality with a serial fit)
FACTORIZE_ORACLES: dict[str, str] = {}
