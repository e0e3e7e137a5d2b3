"""Wide relational operators over the TPC-H-ish tables — demonstrates the
engine's groupby / broadcast-join / sort / distinct paths with partial
(in-batch) aggregation before the small final shuffle.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum


def _read(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def q_rel_q1(sf_dir: str):
    """TPC-H Q1-style grouped aggregate: partial per-batch pyarrow group_by
    → tiny final groupby over (returnflag, linestatus) partials."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # exact integer fixed-point: prices have 2 decimals, discounts 2,
        # disc_price 4 — int64 sums are bit-exact vs the SQL oracle (float
        # sums differ across engines by summation order)
        qty = pc.cast(t["l_quantity"], pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)), pa.int64())
        disc_e2 = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)), pa.int64())
        dp_e4 = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
                    10000.0,
                )
            ),
            pa.int64(),
        )
        t2 = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": qty,
                "price_c": price_c,
                "dp_e4": dp_e4,
                "disc_e2": disc_e2,
            }
        )
        g = t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"),
                ("price_c", "sum"),
                ("dp_e4", "sum"),
                ("disc_e2", "sum"),
                ([], "count_all"),
            ]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sq", "sp", "sd", "sdisc", "cnt"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(*[Sum(c, alias_name=c) for c in ["sq", "sp", "sd", "sdisc", "cnt"]])
        .to_pandas()
    )
    out = pa.Table.from_pydict(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": agg["sq"].astype("int64"),
            "sum_base_price_cents": agg["sp"].astype("int64"),
            "sum_disc_price_e4": agg["sd"].astype("int64"),
            "sum_disc_e2": agg["sdisc"].astype("int64"),
            "n": agg["cnt"].astype("int64"),
        }
    )
    return out.sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


# ceiling for tables attached via driver-side broadcast: nation is bounded
# at 25 rows by the data model; anything that GROWS with scale (customer,
# orders, lineitem) must go through the repartition join instead
BROADCAST_MAX_ROWS = 10_000


def q_rel_nation_revenue(sf_dir: str):
    """orders ⋈ customer ⋈ nation, scale-first: orders are pre-aggregated
    per custkey inside each batch (the combiner keeps the shuffle at one
    row per (batch, custkey)), then joined to the customer projection with
    a hash-partitioned repartition join — per-node memory is
    O(rows / partitions), nothing scale-growing ever reaches the driver.
    Only the 25-row nation table is attached driver-side, behind an
    enforced broadcast ceiling."""
    from .dedup import _ensure_schema, _join_partitions

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    if len(nation) > BROADCAST_MAX_ROWS:
        raise ValueError(
            f"nation has {len(nation)} rows — exceeds the "
            f"{BROADCAST_MAX_ROWS}-row broadcast ceiling; route it through "
            "the repartition join instead"
        )

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    # both counts come from parquet metadata (pre-transform), no execution;
    # orders bounds the partial row count from above
    nparts = _join_partitions(orders.count(), cust.count())

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()),
            }
        )
        g = t2.group_by(["o_custkey"]).aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_custkey", "sp", "cnt"])

    partials = _ensure_schema(
        orders.map_batches(partial, batch_format="pyarrow"),
        pa.schema(
            [("o_custkey", pa.int64()), ("sp", pa.int64()), ("cnt", pa.int64())]
        ),
    )
    joined = partials.join(
        cust, "inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def to_nation(t: pa.Table) -> pa.Table:
        g = pa.table(
            {"n_nationkey": t["c_nationkey"], "sp": t["sp"], "cnt": t["cnt"]}
        ).group_by(["n_nationkey"]).aggregate([("sp", "sum"), ("cnt", "sum")])
        return g.rename_columns(["n_nationkey", "sp", "cnt"])

    agg = (
        joined.map_batches(to_nation, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("sp", alias_name="sp"), Sum("cnt", alias_name="cnt"))
        .to_pandas()  # ≤ 25 rows
    ).merge(nation, on="n_nationkey")
    agg = agg.sort_values("n_name")
    return pa.Table.from_pydict(
        {
            "n_name": agg["n_name"],
            "n_orders": agg["cnt"].astype("int64"),
            "total_price_cents": agg["sp"].astype("int64"),
        }
    )


def q_rel_topk_orders(sf_dir: str):
    """Distributed top-k: sort + limit with a total tie-break."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_rel_distinct_segments(sf_dir: str):
    """Distinct values (set op): in-batch dedup partial → global unique."""
    ds = _read(sf_dir, "customer", columns=["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.Table.from_pydict({"c_mktsegment": pa.array(vals, type=pa.string())})


def q_rel_order_status(sf_dir: str):
    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        t2 = pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "cents": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()),
            }
        )
        g = t2.group_by(["o_orderstatus"]).aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderstatus", "sp", "cnt"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderstatus")
        .aggregate(Sum("sp", alias_name="sp"), Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = pa.Table.from_pydict(
        {
            "o_orderstatus": agg["o_orderstatus"],
            "n": agg["cnt"].astype("int64"),
            "total_price_cents": agg["sp"].astype("int64"),
        }
    )
    return out.sort_by([("o_orderstatus", "ascending")])


def q_rel_top_order_per_cust(sf_dir: str):
    """Per-key argmax (the row_number()=1 window shape): each customer's
    single highest-totalprice order, ties by orderkey ascending.  The
    reduction is associative, so it runs as per-batch partial argmax →
    ONE shuffle of partials keyed hash(cust)%NB → bucket sweep (same
    pattern as stitch/sessions — never a per-customer map_groups)."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    num_buckets = 64

    def first_per_cust(t: pa.Table) -> pa.Table:
        import numpy as np

        cust = t["o_custkey"].to_numpy()
        okey = t["o_orderkey"].to_numpy()
        cents = t["cents"].to_numpy() if "cents" in t.schema.names else pc.cast(
            pc.round(pc.multiply(t["o_totalprice"], 100.0)), pa.int64()
        ).to_numpy()
        order = np.lexsort((okey, -cents, cust))
        cust_s, okey_s, cents_s = cust[order], okey[order], cents[order]
        first = np.empty(len(cust_s), dtype=bool)
        if len(first):
            first[0] = True
            first[1:] = cust_s[1:] != cust_s[:-1]
        b = (
            (cust_s[first].astype("uint64") * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(40)
        ) % num_buckets
        return pa.table(
            {
                "o_custkey": pa.array(cust_s[first], type=pa.int64()),
                "o_orderkey": pa.array(okey_s[first], type=pa.int64()),
                "cents": pa.array(cents_s[first], type=pa.int64()),
                "bucket": pa.array(b.astype("int64"), type=pa.int64()),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        out = first_per_cust(g)
        return out.drop_columns(["bucket"]).rename_columns(
            ["o_custkey", "o_orderkey", "total_price_cents"]
        )

    partials = ds.map_batches(first_per_cust, batch_format="pyarrow")
    return partials.groupby("bucket").map_groups(sweep, batch_format="pyarrow")


RELATIONAL_QUERIES = {
    "rel_q1": q_rel_q1,
    "rel_nation_revenue": q_rel_nation_revenue,
    "rel_topk_orders": q_rel_topk_orders,
    "rel_distinct_segments": q_rel_distinct_segments,
    "rel_order_status": q_rel_order_status,
    "rel_top_order_per_cust": q_rel_top_order_per_cust,
}

RELATIONAL_ORACLES = {
    "rel_top_order_per_cust": """
WITH ranked AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS total_price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY round(o_totalprice * 100) DESC, o_orderkey ASC
         ) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, total_price_cents FROM ranked WHERE rn = 1
""",
    "rel_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_e2,
       count(*) AS n
FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
""",
    "rel_nation_revenue": """
SELECT n_name, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_cents
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY 1
""",
    "rel_topk_orders": """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
    "rel_distinct_segments": """
SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1
""",
    "rel_order_status": """
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_price_cents
FROM orders GROUP BY 1 ORDER BY 1
""",
}


# ------------------------------------------------------------------ TPC-H Q3
# The shipping-priority query — the canonical selective THREE-table
# repartition-join plan: filter every side at the read (segment,
# order date, ship date), pre-aggregate lineitem revenue per order
# inside each batch (the combiner bounds the shuffle at one row per
# (batch, orderkey)), then two hash-partitioned joins whose partition
# counts track the larger side.  Revenue is integer cents (round at
# e4 precision like rel_q1) so the float-summation order can never
# diverge from the oracle.

Q3_CUTOFF = "1998-06-01"
Q3_SEGMENT = "BUILDING"


def q_rel_q3(sf_dir: str, k: int = 10):
    """Top-k unshipped orders by revenue for one market segment:
    (l_orderkey, revenue_e4, o_orderdate)."""
    import numpy as np

    from .dedup import _ensure_schema, _join_partitions

    cutoff = np.datetime64(Q3_CUTOFF, "us")

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def cust_keys(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["c_mktsegment"], Q3_SEGMENT)
        return pa.table(
            {"c_custkey": pc.cast(t.filter(keep)["c_custkey"], pa.int64())}
        )

    cust_keys_ds = _ensure_schema(
        cust.map_batches(cust_keys, batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64())]),
    )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def order_rows(t: pa.Table) -> pa.Table:
        cut = pa.scalar(cutoff).cast(t["o_orderdate"].type)
        keep = pc.less(t["o_orderdate"], cut)
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
            }
        )

    orders_f = _ensure_schema(
        orders.map_batches(order_rows, batch_format="pyarrow"),
        pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
             ("o_orderdate", pa.timestamp("us"))]
        ),
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        cut = pa.scalar(cutoff).cast(t["l_shipdate"].type)
        keep = pc.greater(t["l_shipdate"], cut)
        t = t.filter(keep)
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    10000.0,
                )
            ),
            pa.int64(),
        )
        g = pa.table(
            {"l_orderkey": pc.cast(t["l_orderkey"], pa.int64()), "rev": rev}
        ).group_by(["l_orderkey"]).aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    li_p = _ensure_schema(
        li.map_batches(li_partial, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
    )

    nparts = _join_partitions(orders.count(), li.count())
    # orders ⋈ segment customers (semi-join via inner on keys)
    o_cust = orders_f.join(
        cust_keys_ds, "inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    joined = li_p.join(
        o_cust, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "o_orderdate": t["o_orderdate"],
                    "rev": t["rev"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["l_orderkey", "o_orderdate"])
        .aggregate(Sum("rev", alias_name="revenue_e4"))
    )
    top = (
        agg.to_pandas()
        .sort_values(
            ["revenue_e4", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
        )
        .head(k)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "l_orderkey": pa.array(top["l_orderkey"], type=pa.int64()),
            "revenue_e4": pa.array(top["revenue_e4"], type=pa.int64()),
            "o_orderdate": pa.array(top["o_orderdate"], type=pa.timestamp("us")),
        }
    )


RELATIONAL_QUERIES["rel_q3"] = q_rel_q3

RELATIONAL_ORACLES["rel_q3"] = f"""
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# ------------------------------------------------------- integrity audit
# Referential-integrity audit — the data-quality gate a pipeline runs
# before training joins: for each FK edge, how many child rows have no
# parent (and how many distinct orphan keys).  Pure anti-join counts,
# computed WITHOUT Acero: child keys are pre-counted per batch (the
# combiner bounds the shuffle at one row per (batch, key)), parent keys
# deduped per batch, then ONE key-hash bucket sweep per edge classifies
# each key run — a run with child rows and no parent flag is an orphan.
# Output one row per audited edge, so the result is driver-tiny no
# matter the corpus.

FK_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)
FK_BUCKETS = 64


def q_rel_fk_check(sf_dir: str):
    """(child_table, fk, n_orphan_rows, n_orphan_keys) per FK edge."""
    import numpy as np

    from .dedup import _ensure_schema

    out_rows = []
    for child, ckey, parent, pkey in FK_EDGES:
        child_ds = _read(sf_dir, child, columns=[ckey])
        parent_ds = _read(sf_dir, parent, columns=[pkey])

        def child_partial(t: pa.Table, _k=ckey) -> pa.Table:
            g = t.group_by([_k]).aggregate([([], "count_all")])
            g = g.rename_columns(["key", "nc"])
            return pa.table(
                {
                    "key": pc.cast(g["key"], pa.int64()),
                    "nc": pc.cast(g["nc"], pa.int64()),
                }
            )

        def parent_partial(t: pa.Table, _k=pkey) -> pa.Table:
            keys = pc.unique(pc.cast(t[_k], pa.int64()))
            return pa.table(
                {
                    "key": keys,
                    "nc": pa.array(
                        np.zeros(len(keys), dtype=np.int64) - 1
                    ),  # parent marker: nc = -1
                }
            )

        schema = pa.schema([("key", pa.int64()), ("nc", pa.int64())])
        tagged = _ensure_schema(
            child_ds.map_batches(child_partial, batch_format="pyarrow"),
            schema,
        ).union(
            _ensure_schema(
                parent_ds.map_batches(parent_partial, batch_format="pyarrow"),
                schema,
            )
        )

        def add_bucket(t: pa.Table) -> pa.Table:
            k = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = (
                (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
            ) % FK_BUCKETS
            return t.append_column("bucket", pa.array(b.astype(np.int64)))

        def sweep(g: pa.Table) -> pa.Table:
            # per key run: orphan iff no parent marker present
            if len(g) == 0:
                return pa.table(
                    {"rows": pa.array([], pa.int64()),
                     "keys": pa.array([], pa.int64())}
                )
            k = g["key"].to_numpy(zero_copy_only=False)
            nc = g["nc"].to_numpy(zero_copy_only=False)
            order = np.argsort(k, kind="stable")
            ks, ncs = k[order], nc[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            ends = np.append(starts[1:], len(ks))
            has_parent = np.minimum.reduceat(ncs, starts) < 0
            child_rows = np.add.reduceat(np.maximum(ncs, 0), starts)
            orphan = (~has_parent) & (child_rows > 0)
            return pa.table(
                {
                    "rows": pa.array([int(child_rows[orphan].sum())],
                                     type=pa.int64()),
                    "keys": pa.array([int(orphan.sum())], type=pa.int64()),
                }
            )

        agg = (
            tagged.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(sweep, batch_format="pyarrow")
            .to_pandas()  # ≤ FK_BUCKETS rows
        )
        out_rows.append(
            (child, ckey, int(agg["rows"].sum()), int(agg["keys"].sum()))
        )
    return pa.table(
        {
            "child_table": pa.array([r[0] for r in out_rows]),
            "fk": pa.array([r[1] for r in out_rows]),
            "n_orphan_rows": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "n_orphan_keys": pa.array([r[3] for r in out_rows], type=pa.int64()),
        }
    )


RELATIONAL_QUERIES["rel_fk_check"] = q_rel_fk_check

RELATIONAL_ORACLES["rel_fk_check"] = """
SELECT 'orders' AS child_table, 'o_custkey' AS fk,
       count(*) FILTER (c_custkey IS NULL) AS n_orphan_rows,
       count(DISTINCT o_custkey) FILTER (c_custkey IS NULL) AS n_orphan_keys
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem', 'l_orderkey',
       count(*) FILTER (o_orderkey IS NULL),
       count(DISTINCT l_orderkey) FILTER (o_orderkey IS NULL)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'customer', 'c_nationkey',
       count(*) FILTER (n_nationkey IS NULL),
       count(DISTINCT c_nationkey) FILTER (n_nationkey IS NULL)
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""


Q5_REGION = "ASIA"
Q5_FROM = "1996-01-01"
Q5_TO = "1997-01-01"
# broadcast ceiling for the supplier→nation map (TPC-H supplier is
# 10k rows/SF — a dict of ints; the enforced ceiling keeps the pattern
# honest if the table ever stops being broadcast-sized)
Q5_SUPP_BROADCAST_MAX = 5_000_000


def q_rel_q5(sf_dir: str):
    """TPC-H Q5 (local supplier volume): revenue per nation of one
    region and order-date year where the CUSTOMER and the SUPPLIER sit
    in the same nation — the canonical 6-table join-ordering showcase.
    (n_name, revenue_e4), revenue descending.

    Join plan (smallest sides collapse first, ONE repartition join per
    big⋈big edge): region⋈nation fold to a 5-entry nationkey→name dict
    on the driver; supplier folds to a suppkey→nationkey dict broadcast
    once via ray.put (ceiling-enforced); customers of the region's
    nations and date-filtered orders meet in repartition join #1;
    lineitem rows attach their supplier nation from the broadcast dict
    and pre-aggregate per (l_orderkey, s_nation) IN BATCH before
    repartition join #2 — the same-nation filter and the final
    nation-keyed sum stay streaming.  Revenue in integer e4 units so
    float association order can never diverge from the oracle."""
    import numpy as np

    import ray

    from .dedup import _ensure_schema, _join_partitions

    # tiny dimension folds (region: 5 rows, nation: 25) — driver-side
    reg = _read(sf_dir, "region").take_all()
    rkey = next(r["r_regionkey"] for r in reg if r["r_name"] == Q5_REGION)
    nat = _read(sf_dir, "nation").take_all()
    nation_name = {
        r["n_nationkey"]: r["n_name"] for r in nat if r["n_regionkey"] == rkey
    }
    nkeys = set(nation_name)

    n_supp = _read(sf_dir, "supplier").count()
    if n_supp > Q5_SUPP_BROADCAST_MAX:
        raise NotImplementedError(
            "supplier exceeds the broadcast ceiling — route through a "
            "suppkey-keyed repartition join instead"
        )
    st = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp_nation = dict(
        zip(st["s_suppkey"].astype("int64"), st["s_nationkey"].astype("int64"))
    )
    sref = ray.put(supp_nation)
    nref = ray.put(nkeys)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def cust_rows(t: pa.Table, r) -> pa.Table:
        nk = ray.get(r) if not isinstance(r, set) else r
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(cn, list(nk))
        return pa.table(
            {
                "c_custkey": pc.cast(t.filter(pa.array(keep))["c_custkey"], pa.int64()),
                "c_nationkey": pa.array(cn[keep], type=pa.int64()),
            }
        )

    cust_f = _ensure_schema(
        cust.map_batches(cust_rows, fn_args=(nref,), batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
    )

    lo = np.datetime64(Q5_FROM, "us")
    hi = np.datetime64(Q5_TO, "us")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_rows(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"]
        keep = pc.and_(
            pc.greater_equal(od, pa.scalar(lo).cast(od.type)),
            pc.less(od, pa.scalar(hi).cast(od.type)),
        )
        t = t.filter(keep)
        return pa.table(
            {
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            }
        )

    orders_f = _ensure_schema(
        orders.map_batches(order_rows, batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
    )

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(t: pa.Table, r) -> pa.Table:
        sn = ray.get(r) if not isinstance(r, dict) else r
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = np.array([sn.get(int(k), -1) for k in np.unique(sk)])
        uniq, inv = np.unique(sk, return_inverse=True)
        nat_row = s_nat[inv]
        rev = pc.cast(
            pc.round(
                pc.multiply(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    10000.0,
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table(
                {
                    "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                    "s_nationkey": pa.array(nat_row, type=pa.int64()),
                    "rev": rev,
                }
            )
            .group_by(["l_orderkey", "s_nationkey"])
            .aggregate([("rev", "sum")])
        )
        return g.rename_columns(["l_orderkey", "s_nationkey", "rev"])

    li_p = _ensure_schema(
        li.map_batches(li_partial, fn_args=(sref,), batch_format="pyarrow"),
        pa.schema(
            [("l_orderkey", pa.int64()), ("s_nationkey", pa.int64()),
             ("rev", pa.int64())]
        ),
    )

    nparts = _join_partitions(orders.count(), li.count())
    o_cust = orders_f.join(
        cust_f, "inner", num_partitions=nparts,
        on=("o_custkey",), right_on=("c_custkey",),
    )
    joined = li_p.join(
        o_cust, "inner", num_partitions=nparts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def same_nation(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "s_nationkey" not in t.column_names:
            return pa.schema(
                [("nationkey", pa.int64()), ("rev", pa.int64())]
            ).empty_table()
        keep = pc.equal(t["s_nationkey"], t["c_nationkey"])
        t = t.filter(keep)
        return pa.table(
            {
                "nationkey": pc.cast(t["s_nationkey"], pa.int64()),
                "rev": t["rev"],
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        joined.map_batches(same_nation, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(Sum("rev", alias_name="revenue_e4"))
        .to_pandas()  # ≤ 5 rows
    )
    agg["n_name"] = agg["nationkey"].map(nation_name)
    agg = agg.sort_values(
        ["revenue_e4", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return pa.table(
        {
            "n_name": pa.array(agg["n_name"], type=pa.string()),
            "revenue_e4": pa.array(agg["revenue_e4"], type=pa.int64()),
        }
    )


RELATIONAL_QUERIES["rel_q5"] = q_rel_q5

RELATIONAL_ORACLES["rel_q5"] = f"""
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS BIGINT) AS revenue_e4
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '{Q5_FROM}'
  AND o_orderdate <  TIMESTAMP '{Q5_TO}'
GROUP BY n_name
"""
