"""Windowed/sessionized aggregation over the ``events`` stream table —
the streaming-shaped custom operator (Ray Data has no event-time windows).

Sessions use the bucket-sweep pattern (same as the stitch stage):
``groupby(hash(user)%NB)`` co-locates each user's rows in ONE of NB
groups, and a single vectorized numpy sweep sessionizes *all* users of
the bucket in one call — the per-group ~1ms map_groups machinery is paid
NB times, not once per user.  Partitioning assumption: all rows of one
user fit one bucket group (guaranteed by hashing the user key).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

SESSION_GAP_S = 1800
N_SESSION_BUCKETS = 64


def q_evt_sessions(sf_dir: str):
    """Session windows per user (gap > 30 min starts a new session):
    (user_id, session_id, n_events, t_min, t_max)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    gap_us = SESSION_GAP_S * 1_000_000

    def sweep(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        tsi = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "session_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "t_min": pa.array([], type=pa.timestamp("us")),
                    "t_max": pa.array([], type=pa.timestamp("us")),
                }
            )
        order = np.lexsort((tsi, uid))
        u, s = uid[order], tsi[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = s[1:] - s[:-1]
        brk = new_user | (gap > gap_us)
        # per-row session index within its user: cumulative within-user
        # breaks minus the value at the user's first row
        within = np.cumsum(brk & ~new_user)
        first_of_user = np.flatnonzero(new_user)
        user_idx = np.cumsum(new_user) - 1
        sid = within - within[first_of_user][user_idx]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:] - 1, n - 1]
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "session_id": pa.array(sid[starts], type=pa.int64()),
                "n_events": pa.array(ends - starts + 1, type=pa.int64()),
                "t_min": pa.array(s[starts].astype("datetime64[us]"), type=pa.timestamp("us")),
                "t_max": pa.array(s[ends].astype("datetime64[us]"), type=pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


def q_evt_type_windows(sf_dir: str):
    """Tumbling 1-hour windows: (event_type, window_start, n) — the
    groupby-expressible window shape (floor(ts) bucketing, no state)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        win = ts.astype("datetime64[h]").astype("datetime64[us]")
        t2 = pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pa.array(win, type=pa.timestamp("us")),
            }
        )
        g = t2.group_by(["event_type", "window_start"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "window_start", "np"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("np", alias_name="n"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "window_start": pa.array(out["window_start"], type=pa.timestamp("us")),
            "n": pa.array(out["n"], type=pa.int64()),
        }
    )


HOP_MIN = 30  # hop; window length = 2 × hop (1 hour)


def q_evt_hopping_windows(sf_dir: str):
    """Hopping (sliding) 1-hour windows with a 30-minute hop: every event
    belongs to exactly two windows (its 30-min bucket's window and the one
    starting 30 min earlier).  Explode-to-window-starts inside map_batches
    (vectorized, 2 rows/event) → partial in-batch counts → small final
    groupby: the groupby-expressible sliding-window shape, no state."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )
    hop_us = HOP_MIN * 60 * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        tsi = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        bucket = (tsi // hop_us) * hop_us
        starts = np.concatenate([bucket, bucket - hop_us])
        t2 = pa.table(
            {
                "event_type": pa.concat_arrays(
                    [t["event_type"].combine_chunks()] * 2
                )
                if isinstance(t["event_type"], pa.ChunkedArray)
                else pa.concat_arrays([t["event_type"]] * 2),
                "window_start": pa.array(
                    starts.astype("datetime64[us]"), type=pa.timestamp("us")
                ),
            }
        )
        g = t2.group_by(["event_type", "window_start"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "window_start", "np"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("np", alias_name="n"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "window_start": pa.array(out["window_start"], type=pa.timestamp("us")),
            "n": pa.array(out["n"], type=pa.int64()),
        }
    )


WINDOW_QUERIES = {
    "evt_sessions": q_evt_sessions,
    "evt_type_windows": q_evt_type_windows,
    "evt_hopping_windows": q_evt_hopping_windows,
}

WINDOW_ORACLES = {
    "evt_sessions": f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_S} SECOND
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       min(ts) AS t_min, max(ts) AS t_max
FROM s GROUP BY 1, 2
""",
    "evt_type_windows": """
SELECT event_type, date_trunc('hour', ts) AS window_start, count(*) AS n
FROM events GROUP BY 1, 2
""",
    "evt_hopping_windows": """
WITH g AS (
  SELECT event_type, time_bucket(INTERVAL '30 minutes', ts) AS b FROM events
), x AS (
  SELECT event_type, b AS ws FROM g
  UNION ALL
  SELECT event_type, b - INTERVAL '30 minutes' FROM g
)
SELECT event_type, ws AS window_start, count(*) AS n
FROM x GROUP BY 1, 2
""",
}


# ----------------------------------------------------------- funnel analysis
# Ordered multi-stage sequence matching (the product-analytics "funnel"
# and the event-sequence operator of a behavioral training-data
# pipeline): for each user, the earliest completion of
# view → click → purchase, where each stage must occur strictly after
# the previous stage's chosen event.  Earliest-completion semantics
# (stage k = FIRST qualifying event after stage k-1) is the standard
# greedy funnel and is optimal: taking the earliest stage-k event never
# excludes a later completion.
#
# Shape: rows are filtered to the three stage types AT THE READ
# (column-pruned + type-pruned before the shuffle), co-located per user
# by the session bucket sweep, and each bucket resolves ALL its users'
# funnels in exactly ``n_stages`` vectorized reduceat passes — stage
# k's per-row eligibility mask compares against the user's stage-k-1
# position broadcast by np.repeat; no per-user Python loop.

FUNNEL_STAGES = ("view", "click", "purchase")


def q_evt_funnel(sf_dir: str):
    """(user_id, ts_view, ts_click, ts_purchase) for every user who
    completes the funnel, each timestamp the earliest valid choice."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    stages = FUNNEL_STAGES
    out_names = ["user_id"] + [f"ts_{s}" for s in stages]
    empty = pa.schema(
        [("user_id", pa.int64())]
        + [(f"ts_{s}", pa.timestamp("us")) for s in stages]
    ).empty_table()

    def prune_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t["event_type"], value_set=pa.array(stages)))
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = (
            (uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        ) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    INF = np.iinfo(np.int64).max

    def sweep(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return empty
        uid = g["user_id"].to_numpy()
        tsi = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tsi, uid))
        u, s, e = uid[order], tsi[order], et[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        seg_starts = np.flatnonzero(new_user)
        seg_len = np.diff(np.append(seg_starts, n))
        # stage-by-stage: per-user EARLIEST timestamp of a qualifying
        # event, strictly LATER than the previous stage's chosen
        # timestamp — the comparison is on ts values (not sort
        # positions), so same-(user, ts) events of different stages can
        # never satisfy a stage transition, exactly like the oracle's
        # `e.ts > prev.ts` predicate.
        prev = np.full(len(seg_starts), np.iinfo(np.int64).min, dtype=np.int64)
        stage_ts = []
        for st in stages:
            prev_row = np.repeat(prev, seg_len)
            cand = np.where((e == st) & (s > prev_row), s, INF)
            first = np.minimum.reduceat(cand, seg_starts)
            stage_ts.append(first)
            prev = first  # users already at INF stay at INF (s > INF never)
        done = stage_ts[-1] < INF
        if not done.any():
            return empty
        cols = {"user_id": pa.array(u[seg_starts][done], type=pa.int64())}
        for st, p in zip(stages, stage_ts):
            cols[f"ts_{st}"] = pa.array(p[done].astype("datetime64[us]"))
        return pa.table(cols)

    return (
        ds.map_batches(prune_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .map_batches(lambda t: t.select(out_names) if len(t) else empty,
                     batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_funnel"] = q_evt_funnel

WINDOW_ORACLES["evt_funnel"] = """
WITH a AS (
  SELECT user_id, min(ts) AS ts_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
b AS (
  SELECT e.user_id, min(e.ts) AS ts_click
  FROM events e JOIN a USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > a.ts_view GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS ts_purchase
  FROM events e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > b.ts_click GROUP BY 1
)
SELECT a.user_id, ts_view, ts_click, ts_purchase
FROM a JOIN b USING (user_id) JOIN c USING (user_id)
"""


# --------------------------------------------------------- resample + ffill
# Time-series regularization — the feature-engineering resample: each
# user's event stream becomes a dense HOURLY grid from their first to
# their last event, carrying the hour's LAST observed value
# (deterministic last-observation-carried-forward; empty hours
# forward-fill).  Close-value semantics (copy, never average) keep the
# floats bit-exact against the SQL oracle — no cross-engine summation
# order to reconcile.
#
# Shape: one user-bucket shuffle (the session sweep pattern); each
# bucket builds ALL its users' grids vectorized — per-user grid via
# repeat/arange offsets, closes scattered by hour index, gap rows
# forward-filled with one np.maximum.accumulate (safe across user
# boundaries because every user's first grid hour contains their first
# event).  Output rows = Σ per-user grid lengths; nothing reaches the
# driver.

HOUR_US = 3_600_000_000


def q_evt_resample(sf_dir: str):
    """(user_id, hour, value, n_events, filled): dense per-user hourly
    series, last-observation per hour, gaps forward-filled."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "value"],
    )
    empty = pa.schema(
        [("user_id", pa.int64()), ("hour", pa.timestamp("us")),
         ("value", pa.float64()), ("n_events", pa.int64()),
         ("filled", pa.bool_())]
    ).empty_table()

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = (
            (uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        ) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return empty
        uid = g["user_id"].to_numpy()
        tsi = g["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).astype(np.int64)
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, tsi, uid))
        u, h, v = uid[order], tsi[order] // HOUR_US, val[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        seg_starts = np.flatnonzero(new_user)
        seg_ends = np.append(seg_starts[1:], n) - 1
        h0, h1 = h[seg_starts], h[seg_ends]
        glen = h1 - h0 + 1
        total = int(glen.sum())
        goff = np.cumsum(glen) - glen
        # per-user dense hour grid
        grid_pos = np.arange(total, dtype=np.int64) - np.repeat(goff, glen)
        out_user = np.repeat(u[seg_starts], glen)
        out_hour = np.repeat(h0, glen) + grid_pos
        # scatter: each event row targets its user's grid slot; rows are
        # (ts, event_id)-sorted, so the LAST write per slot is the close
        slot = np.repeat(goff, np.diff(np.append(seg_starts, n))) + (
            h - np.repeat(h0, np.diff(np.append(seg_starts, n)))
        )
        closes = np.full(total, np.nan)
        closes[slot] = v          # later duplicates overwrite = close
        n_events = np.zeros(total, dtype=np.int64)
        np.add.at(n_events, slot, 1)
        # forward-fill: index of the last observed slot at or before i
        # (every user's slot 0 is observed, so no cross-user bleed)
        obs = n_events > 0
        last_obs = np.maximum.accumulate(
            np.where(obs, np.arange(total, dtype=np.int64), 0)
        )
        return pa.table(
            {
                "user_id": pa.array(out_user, type=pa.int64()),
                "hour": pa.array(
                    (out_hour * HOUR_US).astype("datetime64[us]"),
                    type=pa.timestamp("us"),
                ),
                "value": pa.array(closes[last_obs], type=pa.float64()),
                "n_events": pa.array(n_events, type=pa.int64()),
                "filled": pa.array(~obs),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_resample"] = q_evt_resample

WINDOW_ORACLES["evt_resample"] = """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS h, ts, event_id, value
  FROM events
),
ranked AS (
  SELECT user_id, h, value,
         row_number() OVER (PARTITION BY user_id, h
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, h) AS n
  FROM b
),
hourly AS (
  SELECT user_id, h, value AS close_value, n FROM ranked WHERE rn = 1
),
bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY 1),
grid AS (
  SELECT user_id, h0 + to_hours(CAST(i AS BIGINT)) AS h
  FROM bounds,
       LATERAL (SELECT unnest(range(0,
                  CAST(date_diff('hour', h0, h1) AS BIGINT) + 1)) AS i) t
),
joined AS (
  SELECT g.user_id, g.h, hh.close_value, coalesce(hh.n, 0) AS n_events
  FROM grid g LEFT JOIN hourly hh ON g.user_id = hh.user_id AND g.h = hh.h
)
SELECT user_id, h AS hour,
       last_value(close_value IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY h
               ROWS UNBOUNDED PRECEDING) AS value,
       CAST(n_events AS BIGINT) AS n_events,
       n_events = 0 AS filled
FROM joined
"""


# ------------------------------------------------------- rollup aggregation
# Multi-level (OLAP GROUPING SETS) aggregation — the reporting rollup:
# counts and integer-cents value sums at THREE levels at once —
# (event_type, hour-of-day), (event_type), and grand total — matching
# SQL GROUP BY ROLLUP exactly.  One streaming pass computes per-batch
# partials for the FINEST level only; the coarser levels are derived
# from the finest inside the final (tiny, ≤ types × 24 rows) reduce —
# no second corpus pass, no extra shuffle.  NULL grouping keys are
# rendered as the sentinel '*' so the schema stays non-null and the
# value-hash is stable.


def _type_hour_fine(sf_dir: str):
    """ONE streaming pass → the finest (event_type, hour-of-day) level as
    a tiny pandas frame (≤ types × 24 rows): in-batch groupby combiner,
    integer-cents sums, one small-key shuffle.  Every coarser ROLLUP /
    CUBE level derives from this frontier driver-side — no second corpus
    pass."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.cast(pc.hour(t["ts"]), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["value"], 100.0)), pa.int64())
        g = pa.table(
            {
                "event_type": t["event_type"],
                "hour": hour,
                "cents": cents,
            }
        ).group_by(["event_type", "hour"]).aggregate(
            [("cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["event_type", "hour", "sp", "np"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("sp", alias_name="value_cents"),
                   Sum("np", alias_name="n"))
        .to_pandas()  # ≤ types × 24 rows — the aggregation frontier, tiny
    )


def q_evt_rollup(sf_dir: str):
    """(event_type, hour, n, value_cents) at rollup levels: finest =
    (type, hour-of-day), then per-type totals (hour='*'), then the
    grand total (type='*', hour='*')."""
    fine = _type_hour_fine(sf_dir)
    per_type = (
        fine.groupby("event_type", as_index=False)[["value_cents", "n"]]
        .sum()
        .assign(hour="*")
    )
    total = {
        "event_type": "*",
        "hour": "*",
        "value_cents": int(fine["value_cents"].sum()),
        "n": int(fine["n"].sum()),
    }
    fine = fine.assign(hour=fine["hour"].astype(str))
    import pandas as pd

    out = pd.concat(
        [fine, per_type, pd.DataFrame([total])], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "hour": pa.array(out["hour"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
            "value_cents": pa.array(out["value_cents"], type=pa.int64()),
        }
    )


def q_evt_cube(sf_dir: str):
    """GROUP BY CUBE (event_type, hour-of-day): the rollup's three levels
    PLUS the per-hour marginals (event_type='*') — the full 2²-grouping
    lattice an OLAP dashboard reads in one query.  Same design as the
    rollup: the corpus is scanned ONCE for the finest level; all three
    coarser levels are driver-side sums over that ≤ types × 24-row
    frontier (integer cents, so association order can never matter)."""
    fine = _type_hour_fine(sf_dir)
    per_type = (
        fine.groupby("event_type", as_index=False)[["value_cents", "n"]]
        .sum()
        .assign(hour="*")
    )
    per_hour = (
        fine.groupby("hour", as_index=False)[["value_cents", "n"]]
        .sum()
        .assign(event_type="*")
    )
    total = {
        "event_type": "*",
        "hour": "*",
        "value_cents": int(fine["value_cents"].sum()),
        "n": int(fine["n"].sum()),
    }
    import pandas as pd

    fine = fine.assign(hour=fine["hour"].astype(str))
    per_hour = per_hour.assign(hour=per_hour["hour"].astype(str))
    out = pd.concat(
        [fine, per_type, per_hour, pd.DataFrame([total])], ignore_index=True
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "hour": pa.array(out["hour"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
            "value_cents": pa.array(out["value_cents"], type=pa.int64()),
        }
    )


WINDOW_QUERIES["evt_rollup"] = q_evt_rollup
WINDOW_QUERIES["evt_cube"] = q_evt_cube

WINDOW_ORACLES["evt_cube"] = """
SELECT CASE WHEN GROUPING(event_type) = 1 THEN '*' ELSE event_type END AS event_type,
       CASE WHEN GROUPING(h) = 1 THEN '*' ELSE CAST(h AS VARCHAR) END AS hour,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h, value FROM events)
GROUP BY CUBE (event_type, h)
"""

WINDOW_ORACLES["evt_rollup"] = """
SELECT coalesce(event_type, '*') AS event_type,
       CASE WHEN GROUPING(h) = 1 THEN '*' ELSE CAST(h AS VARCHAR) END AS hour,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS h, value FROM events)
GROUP BY ROLLUP (event_type, h)
"""


def q_evt_user_lag(sf_dir: str):
    """(event_id, user_id, gap_us): per-user lag — microseconds since the
    user's previous event (NULL for each user's first event), ordered by
    (ts, event_id) within the user.  The partitioned window-function
    twin of ``quantile.q_evt_value_rank``'s global rank: users are
    hash-bucketed (the sessions-op pattern) and each bucket resolves ALL
    its users' lags in one vectorized lexsort sweep — no per-user tiny
    groups, no global sort."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "gap_us": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((eid, tsi, uid))
        u, s = uid[order], tsi[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = s[1:] - s[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid[order], type=pa.int64()),
                "user_id": pa.array(u, type=pa.int64()),
                "gap_us": pa.array(
                    np.ma.masked_array(gap, mask=new_user), type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_lag"] = q_evt_user_lag
WINDOW_ORACLES["evt_user_lag"] = """
SELECT event_id, user_id,
       CAST(date_diff(
         'microsecond',
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
         ts
       ) AS BIGINT) AS gap_us
FROM events
"""


def q_evt_user_cumsum(sf_dir: str):
    """(event_id, user_id, cum_cents): per-user RUNNING TOTAL — the
    partitioned cumulative-aggregate window function (``sum(...) OVER
    (PARTITION BY user ORDER BY ts, event_id)``), the feature-engineering
    staple (lifetime spend so far, tokens consumed so far, ...).

    Same distributed shape as ``q_evt_user_lag``: users hash-bucketed,
    ONE vectorized lexsort sweep per bucket resolves every user's prefix
    sums (segment-offset cumsum — no per-user tiny groups, no global
    sort).  Money math is integer-exact across engines: cents =
    floor(value·100) on the identical float64 in both, summed as int64,
    so the oracle hash is bitwise regardless of window-sum association
    order.  NULL values contribute nothing and rows before a user's
    first non-NULL value yield NULL, matching SQL window-sum semantics.
    Scale: the bucket count is the parallelism knob; each bucket's
    state is its own rows only — nothing corpus-sized on the driver."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], type=pa.int64()),
                    "user_id": pa.array([], type=pa.int64()),
                    "cum_cents": pa.array([], type=pa.int64()),
                }
            )
        nonnull = ~np.isnan(val)
        cents = np.zeros(n, dtype=np.int64)
        cents[nonnull] = np.floor(val[nonnull] * 100.0).astype(np.int64)
        order = np.lexsort((eid, tsi, uid))
        u, c, nn = uid[order], cents[order], nonnull[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        # segment-offset cumsum: one global prefix sum, then subtract each
        # user's start offset (broadcast by run length)
        cs = np.cumsum(c)
        starts = np.flatnonzero(new_user)
        seg_len = np.diff(np.append(starts, n))
        base = np.repeat(np.where(starts > 0, cs[starts - 1], 0), seg_len)
        cum = cs - base
        # SQL window sum is NULL until the user's first non-NULL value
        csn = np.cumsum(nn.astype(np.int64))
        base_n = np.repeat(np.where(starts > 0, csn[starts - 1], 0), seg_len)
        all_null_so_far = (csn - base_n) == 0
        return pa.table(
            {
                "event_id": pa.array(eid[order], type=pa.int64()),
                "user_id": pa.array(u, type=pa.int64()),
                "cum_cents": pa.array(
                    np.ma.masked_array(cum, mask=all_null_so_far), type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_cumsum"] = q_evt_user_cumsum
WINDOW_ORACLES["evt_user_cumsum"] = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS cum_cents
FROM events
"""


# α deliberately NON-terminating (0.3, not 1/4): with a dyadic α and
# cents-valued inputs the ewma terminates in decimal and lands EXACTLY on
# round-to-N-decimals halfway points (…4375), where the two engines'
# ±1e-14 floats round in opposite directions — observed as 2/1000 flips
# under the pytest 6-decimal normalize.  A non-terminating α makes the
# values generic reals, so boundary adjacency is measure-zero.
EWMA_ALPHA = 0.3


def q_evt_user_ewma(sf_dir: str):
    """(event_id, user_id, ewma): per-user EXPONENTIALLY WEIGHTED moving
    average of ``value`` ordered by (ts, event_id) — the telemetry
    smoothing / feature-decay window (load-average style):
    e_0 = v_0, e_i = (1-α)·e_{i-1} + α·v_i with α = 0.3.

    This is a LINEAR RECURRENCE, not a cumulative aggregate — the class
    the prefix-sum trick (q_evt_user_cumsum) cannot express directly.
    Vectorization is DEPTH-SYNCHRONOUS: loop over position p, advance
    ALL the bucket's user runs one step per iteration (segments sorted
    by length descending so the active set is a contiguous prefix and
    every gather is a slice).  Outer loop = deepest run in the bucket,
    each step O(active users), total O(n) — never per row.  This shape
    is also the numerically correct one: the closed-form alternative
    (e_i = (1-α)^i·Σ α·v_t·(1-α)^(-t)) pushes terms through a shared
    rescaled prefix sum whose magnitude grows like (1-α)^(-depth), and
    the segment-offset subtraction then cancels catastrophically —
    measured 0.04 ABSOLUTE errors on this corpus before the rewrite,
    4 × 10¹² ulps.  The recurrence needs no powers at all.  Same
    distributed shape as the lag/cumsum family: users hash-bucketed,
    one lexsort sweep per bucket, nothing corpus-sized on the driver.
    NaN/NULL values are excluded from the series in both engines; the
    SQL oracle is the closed-form self-join (fine THERE: each output
    row's terms are summed directly, nothing is shared or rescaled,
    and terms older than ~250 steps underflow identically on both
    sides).  The emitted value is rounded to 6 decimals in BOTH
    engines: shallow ewma values of cents-valued inputs are SHORT
    DECIMALS (e_k has k+2 decimals), which sit exactly on
    6-significant-digit halfway points where the engines' ±1ulp floats
    format apart (observed 2/10000); rounding is exact for those and
    collapses the ±1e-15 recurrence-vs-closed-form noise everywhere
    else, making the emitted column bitwise across engines."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )
    a, b = EWMA_ALPHA, 1.0 - EWMA_ALPHA

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        bk = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(bk.astype(np.int64)))

    empty = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()), ("ewma", pa.float64())]
    ).empty_table()

    def sweep(g: pa.Table) -> pa.Table:
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(val)
        if not keep.any():
            return empty
        uid = g["user_id"].to_numpy()[keep]
        eid = g["event_id"].to_numpy()[keep]
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)[keep]
        )
        v = val[keep]
        n = len(uid)
        order = np.lexsort((eid, tsi, uid))
        u, v = uid[order], v[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_user)
        seg_len = np.diff(np.append(starts, n))
        # sort segments by depth DESCENDING: the set still active at
        # position p is then always the prefix sl > p, so each step's
        # state update is a contiguous slice, not a scatter-gather
        deep = np.argsort(-seg_len, kind="stable")
        st, sl = starts[deep], seg_len[deep]
        neg_sl = -sl  # ascending, for searchsorted
        out = np.empty(n, dtype=np.float64)
        state = np.empty(len(st), dtype=np.float64)
        for p in range(int(sl[0])):
            n_act = np.searchsorted(neg_sl, -(p + 0.5))     # segments with sl > p
            idx = st[:n_act] + p
            if p == 0:
                state[:n_act] = v[idx]                       # e_0 = v_0 init
            else:
                state[:n_act] = b * state[:n_act] + a * v[idx]
            out[idx] = state[:n_act]
        return pa.table(
            {
                "event_id": pa.array(eid[order], type=pa.int64()),
                "user_id": pa.array(u, type=pa.int64()),
                "ewma": pa.array(np.round(out, 6), type=pa.float64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_ewma"] = q_evt_user_ewma
WINDOW_ORACLES["evt_user_ewma"] = """
WITH e AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
)
SELECT a.event_id, a.user_id,
       round(sum(b.value * CASE WHEN b.rn = 1 THEN power(0.7, a.rn - 1)
                                ELSE 0.3 * power(0.7, a.rn - b.rn) END),
             6) AS ewma
FROM e a JOIN e b ON a.user_id = b.user_id AND b.rn <= a.rn
GROUP BY 1, 2
"""


# ----------------------------------------------- time-range rolling mean
# Per-user trailing one-hour mean of ``value`` — the RANGE-frame window
# function (feature engineering for burst/velocity signals).  Same
# bucket sweep as the lag/cumsum ops, with the window bounds resolved by
# TWO global searchsorted calls per bucket via the segment-offset trick:
# each user's timestamps are lifted by seg_id*OFFSET with OFFSET larger
# than any user's time span plus the window, so the lifted key array is
# globally sorted and a lookback can never cross into the previous
# user's segment.  Window sums come from prefix-sum differences (NULL
# values excluded, matching avg()/count() OVER semantics; RANGE peers —
# equal timestamps — are included on both engines).

ROLLING_WINDOW_US = 3_600_000_000  # 1 hour


def q_evt_user_rolling_mean(sf_dir: str, window_us: int = ROLLING_WINDOW_US):
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    empty = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("rolling_mean", pa.float64()),
            ("n_window", pa.int64()),
        ]
    )

    def sweep(g: pa.Table, _w=window_us) -> pa.Table:
        n = len(g)
        if n == 0:
            return empty.empty_table()
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, tsi, uid))
        u, s, v = uid[order], tsi[order], val[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        seg = np.cumsum(new_user) - 1
        span = int(s.max() - s.min()) if n else 0
        offset = span + _w + 1
        assert (seg[-1] + 1) * offset < 2**62, "segment-offset overflow"
        key = seg * offset + (s - s.min())
        lo = np.searchsorted(key, key - _w, side="left")
        hi = np.searchsorted(key, key, side="right")
        ok = np.isfinite(v)
        pv = np.concatenate(([0.0], np.cumsum(np.where(ok, v, 0.0))))
        pn = np.concatenate(([0], np.cumsum(ok.astype(np.int64))))
        cnt = pn[hi] - pn[lo]
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = (pv[hi] - pv[lo]) / cnt
        return pa.table(
            {
                "event_id": pa.array(eid[order], type=pa.int64()),
                "user_id": pa.array(u, type=pa.int64()),
                "rolling_mean": pa.array(
                    np.ma.masked_array(mean, mask=cnt == 0), type=pa.float64()
                ),
                "n_window": pa.array(cnt, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_rolling_mean"] = q_evt_user_rolling_mean
WINDOW_ORACLES["evt_user_rolling_mean"] = """
SELECT event_id, user_id,
       avg(value) OVER w AS rolling_mean,
       CAST(count(value) OVER w AS BIGINT) AS n_window
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def q_evt_top_users_per_type(sf_dir: str, k: int = 3):
    """(event_type, user_id, n, rank): the top-k most-active users per
    event type — grouped heavy hitters, the per-tenant/per-channel
    leaderboard shape.  Users are HASH-BUCKETED (the sessions-op
    pattern) so each bucket owns its users' complete totals: per-batch
    (type, user) count partials compress the shuffle, one bucket sweep
    totals them and emits only the bucket's local top-k per type, and
    the driver merges types × buckets × k tiny rows.  Ties break by
    user_id ascending, mirrored in the SQL window oracle."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id"],
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"event_type": t["event_type"], "user_id": t["user_id"]})
            .group_by(["event_type", "user_id"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "user_id", "n"])
        )
        uid = g["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return g.append_column("bucket", pa.array(b.astype(np.int64)))

    out_schema = pa.schema(
        [("event_type", pa.string()), ("user_id", pa.int64()), ("n", pa.int64())]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        t = (
            pa.table(
                {"event_type": g["event_type"], "user_id": g["user_id"], "n": g["n"]}
            )
            .group_by(["event_type", "user_id"])
            .aggregate([("n", "sum")])
            .rename_columns(["event_type", "user_id", "n"])
        )
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        keep = []
        for grp in np.unique(et):
            m = np.flatnonzero(et == grp)
            order = np.lexsort((uid[m], -n[m]))[:k]
            keep.extend(m[order].tolist())
        keep = np.array(sorted(keep), dtype=np.int64)
        return pa.table(
            {
                "event_type": pa.array(et[keep]),
                "user_id": pa.array(uid[keep], type=pa.int64()),
                "n": pa.array(n[keep], type=pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .to_pandas()  # types × buckets × k tiny rows
    )
    parts = parts.sort_values(
        ["event_type", "n", "user_id"], ascending=[True, False, True], kind="stable"
    )
    top = parts.groupby("event_type", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("event_type").cumcount() + 1
    return pa.table(
        {
            "event_type": pa.array(top["event_type"]),
            "user_id": pa.array(top["user_id"], type=pa.int64()),
            "n": pa.array(top["n"], type=pa.int64()),
            "rank": pa.array(top["rank"], type=pa.int64()),
        }
    )


WINDOW_QUERIES["evt_top_users_per_type"] = q_evt_top_users_per_type
WINDOW_ORACLES["evt_top_users_per_type"] = """
WITH c AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, user_id, n,
         row_number() OVER (
           PARTITION BY event_type ORDER BY n DESC, user_id ASC
         ) AS rank
  FROM c
)
SELECT event_type, user_id, n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
"""


def q_evt_user_first_last(sf_dir: str):
    """(user_id, n, first_value, last_value): each user's first and last
    event value in (ts, event_id) order — the FIRST_VALUE/LAST_VALUE
    window pair, the entry/exit feature of a behavioral pipeline.  Same
    bucket sweep as the lag op: users hash-bucketed, one vectorized
    lexsort per bucket resolves every user's boundaries; values are
    COPIED, never combined, so floats hash bit-exact vs the window
    mirror."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    out_schema = pa.schema(
        [("user_id", pa.int64()), ("n", pa.int64()),
         ("first_value", pa.float64()), ("last_value", pa.float64())]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        val = g["value"].to_numpy(zero_copy_only=False)
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.lexsort((eid, tsi, uid))
        u, v = uid[order], val[order]
        n = len(u)
        first = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:] - 1, n - 1]
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "n": pa.array(ends - starts + 1, type=pa.int64()),
                "first_value": pa.array(v[starts], type=pa.float64()),
                "last_value": pa.array(v[ends], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_first_last"] = q_evt_user_first_last
WINDOW_ORACLES["evt_user_first_last"] = """
WITH r AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, CAST(any_value(n) AS BIGINT) AS n,
       max(CASE WHEN rn = 1 THEN value END) AS first_value,
       max(CASE WHEN rn = n THEN value END) AS last_value
FROM r GROUP BY 1
"""


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_evt_user_pivot(sf_dir: str):
    """(user_id, n_click, n_error, n_purchase, n_signup, n_view,
    sum_value_cents): the per-user activity FEATURE VECTOR — the pivot /
    one-hot-count matrix a downstream model trains on.  Wide-from-long
    with no per-type passes: ONE streaming pass builds in-batch
    (user, type) count partials + value-cents sums, users hash-bucketed
    (each bucket owns its users' complete totals), one vectorized
    bincount pivot per bucket.  Integer cents keep the sum column
    bitwise regardless of association order.  The type set is the
    pipeline's fixed routing taxonomy (R1's dispatch analogue), so the
    wide schema is static — the condition for pivot to stream."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value"],
    )
    type_idx = {t: i for i, t in enumerate(PIVOT_TYPES)}
    k = len(PIVOT_TYPES)

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("ti", pa.int64()), ("n", pa.int64()),
         ("cents", pa.int64()), ("bucket", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        cents = pc.cast(
            pc.round(pc.multiply(t["value"], 100.0)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ti = np.array([type_idx[x] for x in np.unique(et)])
        uniq_t, inv_t = np.unique(et, return_inverse=True)
        uniq_u, inv_u = np.unique(uid, return_inverse=True)
        key = inv_u * len(uniq_t) + inv_t
        n = np.bincount(key, minlength=len(uniq_u) * len(uniq_t))
        c = np.bincount(key, weights=cents.astype(np.float64),
                        minlength=len(uniq_u) * len(uniq_t)).astype(np.int64)
        nz = np.flatnonzero(n)
        users = uniq_u[nz // len(uniq_t)]
        b = ((users.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(40)) % N_SESSION_BUCKETS
        return pa.table(
            {
                "user_id": pa.array(users, type=pa.int64()),
                "ti": pa.array(ti[nz % len(uniq_t)], type=pa.int64()),
                "n": pa.array(n[nz], type=pa.int64()),
                "cents": pa.array(c[nz], type=pa.int64()),
                "bucket": pa.array(b.astype(np.int64), type=pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("user_id", pa.int64())]
        + [(f"n_{t}", pa.int64()) for t in PIVOT_TYPES]
        + [("sum_value_cents", pa.int64())]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        ti = g["ti"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(uid, return_inverse=True)
        mat = np.zeros((len(uniq), k), dtype=np.int64)
        np.add.at(mat, (inv, ti), n)
        cents = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        cols = {"user_id": pa.array(uniq, type=pa.int64())}
        for i, t in enumerate(PIVOT_TYPES):
            cols[f"n_{t}"] = pa.array(mat[:, i], type=pa.int64())
        cols["sum_value_cents"] = pa.array(cents, type=pa.int64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_pivot"] = q_evt_user_pivot
WINDOW_ORACLES["evt_user_pivot"] = """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1
"""


_US_PER_DAY = 86_400 * 1_000_000


def _week_start_day(us: np.ndarray) -> np.ndarray:
    """Monday-aligned week start (days since epoch) — day 0 (1970-01-01)
    is a Thursday, so weekday(Monday=0) = (day + 3) % 7; matches DuckDB
    date_trunc('week', ts) exactly (verified on both epoch edges)."""
    day = us // _US_PER_DAY
    return day - ((day + 3) % 7)


def q_evt_cohort_retention(sf_dir: str):
    """(cohort_week, week_offset, n_users): the cohort RETENTION matrix —
    users grouped by the week of their FIRST event, counted in every
    later week they were active (the growth-analytics staple, and the
    data-freshness view of a training-event stream).

    One user-bucket sweep does everything user-local: each bucket
    lexsorts its users' rows once, takes the per-user first timestamp
    as the cohort, dedups (user, active-week) pairs in-bucket and emits
    per-(cohort, offset) PARTIAL counts — users are hash-bucketed, so a
    user's pairs never straddle buckets and the partials are exact.
    The final groupby merges ≤ buckets × weeks² tiny rows."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    part_schema = pa.schema(
        [("cohort_day", pa.int64()), ("week_offset", pa.int64()),
         ("n", pa.int64())]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return part_schema.empty_table()
        uid = g["user_id"].to_numpy()
        us = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.lexsort((us, uid))
        u, s = uid[order], us[order]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        wk = _week_start_day(s)
        cohort = np.repeat(wk[first], np.diff(np.append(np.flatnonzero(first), len(u))))
        off = (wk - cohort) // 7
        # dedup (user, offset) — a user counts once per active week
        key = np.stack([u, off], axis=1)
        uniq_rows = np.unique(
            np.concatenate([key, cohort[:, None]], axis=1), axis=0
        )
        co, of = uniq_rows[:, 2], uniq_rows[:, 1]
        pair = np.unique(np.stack([co, of], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(pair[0][:, 0], type=pa.int64()),
                "week_offset": pa.array(pair[0][:, 1], type=pa.int64()),
                "n": pa.array(pair[1], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .groupby(["cohort_day", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()  # ≤ weeks² rows
        .sort_values(["cohort_day", "week_offset"])
    )
    return pa.table(
        {
            "cohort_week": pa.array(
                (out["cohort_day"].to_numpy() * _US_PER_DAY).astype(
                    "datetime64[us]"
                ),
                type=pa.timestamp("us"),
            ),
            "week_offset": pa.array(out["week_offset"], type=pa.int64()),
            "n_users": pa.array(out["n_users"], type=pa.int64()),
        }
    )


WINDOW_QUERIES["evt_cohort_retention"] = q_evt_cohort_retention
WINDOW_ORACLES["evt_cohort_retention"] = """
WITH f AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
  FROM events GROUP BY 1
), a AS (
  SELECT DISTINCT e.user_id, f.cohort,
         CAST((epoch(CAST(date_trunc('week', e.ts) AS TIMESTAMP))
               - epoch(f.cohort)) // (7 * 86400) AS BIGINT) AS week_offset
  FROM events e JOIN f USING (user_id)
)
SELECT cohort AS cohort_week, week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2
"""


def q_evt_transitions(sf_dir: str):
    """(from_type, to_type, n): the per-user event-type TRANSITION
    matrix — consecutive-event bigrams in (ts, event_id) order within
    each user (the Markov-chain view of behavior streams; the funnel
    op's unordered complement).  Same user-bucket sweep: one lexsort
    per bucket, consecutive pairs masked at user boundaries, in-bucket
    (from, to) counts — ≤ types² rows per bucket reach the final tiny
    groupby."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "event_type", "ts"],
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    part_schema = pa.schema(
        [("from_type", pa.string()), ("to_type", pa.string()), ("n", pa.int64())]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return part_schema.empty_table()
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy(zero_copy_only=False)
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        order = np.lexsort((eid, tsi, uid))
        u, e = uid[order], et[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return part_schema.empty_table()
        pairs = (
            pa.table(
                {
                    "from_type": pa.array(e[:-1][same]),
                    "to_type": pa.array(e[1:][same]),
                }
            )
            .group_by(["from_type", "to_type"])
            .aggregate([([], "count_all")])
        )
        return pairs.rename_columns(["from_type", "to_type", "n"])

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ types² rows
        .sort_values(["from_type", "to_type"])
    )
    return pa.table(
        {
            "from_type": pa.array(out["from_type"], type=pa.string()),
            "to_type": pa.array(out["to_type"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
        }
    )


WINDOW_QUERIES["evt_transitions"] = q_evt_transitions
WINDOW_ORACLES["evt_transitions"] = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# ------------------------------------------ per-user inter-arrival stats
# The cadence profile of a user/session stream: per user, how many
# events, and the mean / max gap between consecutive ones — the
# engagement-frequency feature (and the input to activity-based session
# timeout tuning).  The AGGREGATED twin of ``q_evt_user_lag``: same
# hash-bucketed lexsort sweep, but each bucket reduces its users' gap
# runs to one row per user via segment-offset reduceat — so the output
# (and the shuffle after the sweep: none) is O(users), not O(events).
#
# Cross-engine float parity: gaps are summed as exact int64 µs and only
# then pushed through the identical double ops (÷1e6, ÷n_gaps) the
# oracle applies, so mean_gap_s hashes bitwise.


def q_evt_user_interarrival(sf_dir: str):
    """(user_id, n_events, max_gap_us, mean_gap_s): per-user event count
    and consecutive-event gap stats ordered by (ts, event_id); gap
    columns are NULL for single-event users."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts"],
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        tsi = (
            g["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        n = len(uid)
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "max_gap_us": pa.array([], type=pa.int64()),
                "mean_gap_s": pa.array([], type=pa.float64()),
            }
        )
        if n == 0:
            return empty
        order = np.lexsort((eid, tsi, uid))
        u, s = uid[order], tsi[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, n])
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = s[1:] - s[:-1]
        gap[starts] = 0  # first event of each user contributes no gap
        gsum = np.add.reduceat(gap, starts)
        gmax = np.maximum.reduceat(gap, starts)
        n_gaps = counts - 1
        has = n_gaps > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_s = (gsum.astype(np.float64) / 1e6) / n_gaps
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "n_events": pa.array(counts, type=pa.int64()),
                "max_gap_us": pa.array(
                    np.ma.masked_array(gmax, mask=~has), type=pa.int64()
                ),
                "mean_gap_s": pa.array(
                    np.ma.masked_array(mean_s, mask=~has), type=pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_interarrival"] = q_evt_user_interarrival
WINDOW_ORACLES["evt_user_interarrival"] = """
WITH g AS (
  SELECT user_id,
         date_diff(
           'microsecond',
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
           ts
         ) AS gap
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(gap) AS BIGINT) AS max_gap_us,
       CASE WHEN count(gap) > 0
            THEN (CAST(sum(gap) AS DOUBLE) / 1000000.0) / count(gap)
       END AS mean_gap_s
FROM g GROUP BY 1
"""


# --------------------------------------------- sliding-window burst max
# Peak event rate per type: the maximum number of events falling in any
# 5-minute sliding window anchored at an event — the burst/alerting
# statistic ("did this error type ever exceed N in 5 minutes?").
#
# Scale shape — HALO (ghost-cell) time partitioning, new to this repo:
# a naive per-type groupby puts an entire type's 10^12-row history in
# one group.  Instead events land in (type, UTC-hour) cells, and —
# because windows look FORWARD — every event within WINDOW of an
# hour's START is DUPLICATED into the PREVIOUS hour's cell flagged
# halo=1: a halo row is counted as a window MEMBER but never STARTS a
# window, so each cell resolves every window that starts inside it
# locally and exactly (windows anchored late in hour h see their
# members from early hour h+1 via the halo).  Per-cell work is one
# sort + one vectorized searchsorted two-pointer; the final reduce is
# a tiny per-type max.  Shuffle volume = rows × (1 + window/hour).

BURST_WINDOW_US = 5 * 60 * 1_000_000
BURST_CELL_US = 3_600 * 1_000_000


def q_evt_burst(sf_dir: str):
    """(event_type, burst): max events in any closed [t, t+5min] window
    anchored at an event of that type."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def cellize(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        tsi = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cell = tsi // BURST_CELL_US
        base = pa.table(
            {
                "event_type": et,
                "ts_us": pa.array(tsi, type=pa.int64()),
                "cell": pa.array(cell, type=pa.int64()),
                "halo": pa.array(np.zeros(len(tsi), dtype=bool)),
            }
        )
        # closed window [t, t+W]: an event at exactly cell_start + W can
        # still close a window anchored at the previous cell's end, so
        # the halo condition is <= (not <)
        spill = tsi <= cell * BURST_CELL_US + BURST_WINDOW_US
        if not spill.any():
            return base
        ghost = pa.table(
            {
                "event_type": et.filter(pa.array(spill)),
                "ts_us": pa.array(tsi[spill], type=pa.int64()),
                "cell": pa.array(cell[spill] - 1, type=pa.int64()),
                "halo": pa.array(np.ones(int(spill.sum()), dtype=bool)),
            }
        )
        return pa.concat_tables([base, ghost])

    def cell_max(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema(
                [("event_type", pa.string()), ("burst_partial", pa.int64())]
            ).empty_table()
        ts = g["ts_us"].to_numpy()
        halo = g["halo"].to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        starts = np.flatnonzero(~halo[order])
        if len(starts) == 0:
            return pa.schema(
                [("event_type", pa.string()), ("burst_partial", pa.int64())]
            ).empty_table()
        # closed window [t, t+W]: side='right' includes the endpoint
        hi = np.searchsorted(ts, ts[starts] + BURST_WINDOW_US, side="right")
        best = int((hi - starts).max())
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()], type=pa.string()),
                "burst_partial": pa.array([best], type=pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    out = (
        ds.map_batches(cellize, batch_format="pyarrow")
        .groupby(["event_type", "cell"])
        .map_groups(cell_max, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Max("burst_partial", alias_name="burst"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "burst": pa.array(out["burst"], type=pa.int64()),
        }
    )


WINDOW_QUERIES["evt_burst"] = q_evt_burst
WINDOW_ORACLES["evt_burst"] = """
WITH w AS (
  SELECT event_type,
         count(*) OVER (PARTITION BY event_type ORDER BY ts
                        RANGE BETWEEN CURRENT ROW AND INTERVAL 5 MINUTE FOLLOWING) AS c
  FROM events
)
SELECT event_type, CAST(max(c) AS BIGINT) AS burst FROM w GROUP BY 1
"""


# --------------------------------------------- longest activity streak
# Gaps-and-islands: per user, the longest run of CONSECUTIVE active
# days — the retention/engagement streak feature.  One user-bucket
# sweep (the sessions machinery) resolves every user's streak in a
# single vectorized pass: lexsort (day, user), in-bucket (user, day)
# dedup, then run detection on day diffs with user-boundary masking —
# never a per-user group, nothing driver-side.  The SQL mirror is the
# classic row_number islands construction.


def q_evt_user_streak(sf_dir: str):
    """(user_id, n_active_days, streak_days): distinct active days and
    the longest consecutive-day run per user (UTC days)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        day = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        ) // 86_400_000_000
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        # in-batch (user, day) dedup — the combiner that keeps shuffle
        # volume at O(distinct user-days), never O(events)
        tt = pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64)),
                "day": pa.array(day, type=pa.int64()),
                "bucket": pa.array(b.astype(np.int64)),
            }
        )
        return tt.group_by(["user_id", "day", "bucket"]).aggregate([])

    def sweep(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        day = g["day"].to_numpy()
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_active_days": pa.array([], type=pa.int64()),
                "streak_days": pa.array([], type=pa.int64()),
            }
        )
        if len(uid) == 0:
            return empty
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        # cross-batch dedup of (user, day)
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        n = len(u)
        new_user = np.r_[True, u[1:] != u[:-1]]
        # a row CONTINUES a streak iff same user and day == prev day + 1
        cont = np.r_[False, (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)]
        # run id = cumulative count of run starts; run start = ~cont
        run_id = np.cumsum(~cont) - 1
        run_len = np.bincount(run_id)
        # per-user max run: runs are contiguous in user order
        run_user_start = np.flatnonzero(~cont)
        run_uid = u[run_user_start]
        user_starts_in_runs = np.flatnonzero(np.r_[True, run_uid[1:] != run_uid[:-1]])
        streak = np.maximum.reduceat(run_len, user_starts_in_runs)
        starts = np.flatnonzero(new_user)
        n_days = np.diff(np.r_[starts, n])
        return pa.table(
            {
                "user_id": pa.array(u[starts], type=pa.int64()),
                "n_active_days": pa.array(n_days, type=pa.int64()),
                "streak_days": pa.array(streak, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_streak"] = q_evt_user_streak
WINDOW_ORACLES["evt_user_streak"] = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM d
), i AS (
  SELECT user_id, day, day - CAST(rn AS INTEGER) AS grp FROM r
), runs AS (
  SELECT user_id, grp, count(*) AS len FROM i GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS streak_days
FROM runs GROUP BY 1
"""


# ------------------------------------------ per-user behavioral entropy
# Shannon entropy of each user's event-type distribution — the
# behavioral-diversity feature (bots and single-purpose scripts sit
# near 0; broad organic users near ln(n_types)).  In-batch (user, type)
# count partials compress the shuffle to O(users × types); one
# user-bucket sweep merges partials and evaluates the entropy per user
# vectorized (segment-offset reduceat over p·ln p terms).


def q_evt_user_entropy(sf_dir: str):
    """(user_id, n_types, entropy): distinct event types and Shannon
    entropy (nats) of the user's type distribution."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "event_type"]).aggregate([([], "count_all")])
        uid = g["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % N_SESSION_BUCKETS
        return pa.table(
            {
                "user_id": g["user_id"],
                "event_type": g["event_type"],
                "n": pc.cast(g["count_all"], pa.int64()),
                "bucket": pa.array(b.astype(np.int64)),
            }
        )

    def sweep(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_types": pa.array([], type=pa.int64()),
                "entropy": pa.array([], type=pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        uid = g["user_id"].to_numpy()
        et = g["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        codes = et.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy()
        order = np.lexsort((codes, uid))
        u, c, n = uid[order], codes[order], n[order]
        # merge same (user, type) partials from different batches
        first = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        seg = np.cumsum(first) - 1
        n_m = np.bincount(seg, weights=n).astype(np.int64)
        u_m = u[first]
        user_first = np.r_[True, u_m[1:] != u_m[:-1]]
        starts = np.flatnonzero(user_first)
        n_types = np.diff(np.r_[starts, len(u_m)])
        tot = np.add.reduceat(n_m, starts).astype(np.float64)
        p = n_m.astype(np.float64) / np.repeat(tot, n_types)
        ent = -np.add.reduceat(p * np.log(p), starts)
        return pa.table(
            {
                "user_id": pa.array(u_m[starts], type=pa.int64()),
                "n_types": pa.array(n_types, type=pa.int64()),
                "entropy": pa.array(ent, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


WINDOW_QUERIES["evt_user_entropy"] = q_evt_user_entropy
WINDOW_ORACLES["evt_user_entropy"] = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
), t AS (
  SELECT user_id, sum(n) AS tot FROM c GROUP BY 1
)
SELECT c.user_id,
       CAST(count(*) AS BIGINT) AS n_types,
       -sum((CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot)) AS entropy
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY 1
"""


# ----------------------------------------------- market-basket type lift
# Association lift between event types over (user, UTC-day) baskets —
# "users who error also purchase?": lift(a,b) = P(a,b)/(P(a)·P(b)) with
# probabilities over baskets.  The scale trick is the source-overlap
# BITMASK reduction (curation.q_doc_source_overlap): the fixed small
# type taxonomy maps to bits, each basket collapses to ONE int64 mask,
# a basket-bucket sweep ORs partial masks and emits only a mask→count
# HISTOGRAM (≤2^|types| rows), and all pair/single counts derive from
# the histogram driver-side — the pair arithmetic never touches a
# basket-sized table.  Taxonomy ceiling-enforced at 63 types.

LIFT_MAX_TYPES = 63


def q_evt_type_lift(sf_dir: str):
    """(type_a, type_b, n_ab, lift): co-occurrence count over (user, day)
    baskets and association lift, for each unordered type pair."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    types = sorted(
        ds.select_columns(["event_type"]).unique("event_type")
    )
    if len(types) > LIFT_MAX_TYPES:
        raise ValueError(
            f"{len(types)} event types exceed the {LIFT_MAX_TYPES}-bit basket mask"
        )
    bit = {t: 1 << i for i, t in enumerate(types)}

    def to_masks(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy()
        day = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        ) // 86_400_000_000
        et = t["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        enc = et.dictionary_encode()
        dict_bits = np.array([bit[v] for v in enc.dictionary.to_pylist()], dtype=np.int64)
        m = dict_bits[enc.indices.to_numpy(zero_copy_only=False)]
        # in-batch basket OR: one mask per (user, day) seen in this batch
        order = np.lexsort((day, uid))
        u, d, mm = uid[order], day[order], m[order]
        first = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        seg = np.cumsum(first) - 1
        mask = np.zeros(seg[-1] + 1, dtype=np.int64)
        np.bitwise_or.at(mask, seg, mm)
        u_f, d_f = u[first], d[first]
        b = (
            (u_f.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(40)
        ) % N_SESSION_BUCKETS
        return pa.table(
            {
                "user_id": pa.array(u_f, type=pa.int64()),
                "day": pa.array(d_f, type=pa.int64()),
                "mask": pa.array(mask, type=pa.int64()),
                "bucket": pa.array(b.astype(np.int64)),
            }
        )

    def hist(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema(
                [("mask", pa.int64()), ("n_baskets", pa.int64())]
            ).empty_table()
        uid = g["user_id"].to_numpy()
        day = g["day"].to_numpy()
        m = g["mask"].to_numpy()
        order = np.lexsort((day, uid))
        u, d, mm = uid[order], day[order], m[order]
        first = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        seg = np.cumsum(first) - 1
        full = np.zeros(seg[-1] + 1, dtype=np.int64)
        np.bitwise_or.at(full, seg, mm)
        vals, counts = np.unique(full, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(vals, type=pa.int64()),
                "n_baskets": pa.array(counts, type=pa.int64()),
            }
        )

    hp = (
        ds.map_batches(to_masks, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hist, batch_format="pyarrow")
        .to_pandas()
    )
    hm = hp.groupby("mask")["n_baskets"].sum()
    masks = hm.index.to_numpy().astype(np.int64)
    cnt = hm.to_numpy().astype(np.int64)
    N = float(cnt.sum())
    k = len(types)
    present = [((masks >> i) & 1).astype(bool) for i in range(k)]
    n_single = [int(cnt[present[i]].sum()) for i in range(k)]
    ta, tb, n_ab, lift = [], [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            nij = int(cnt[present[i] & present[j]].sum())
            ta.append(types[i])
            tb.append(types[j])
            n_ab.append(nij)
            lift.append(
                nij * N / (n_single[i] * n_single[j])
                if n_single[i] and n_single[j]
                else None
            )
    return pa.table(
        {
            "type_a": pa.array(ta, type=pa.string()),
            "type_b": pa.array(tb, type=pa.string()),
            "n_ab": pa.array(n_ab, type=pa.int64()),
            "lift": pa.array(lift, type=pa.float64()),
        }
    )


WINDOW_QUERIES["evt_type_lift"] = q_evt_type_lift
WINDOW_ORACLES["evt_type_lift"] = """
WITH b AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, event_type
  FROM events
), nb AS (
  SELECT CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT DISTINCT user_id, day FROM b)
), s AS (
  SELECT event_type, count(*) AS n FROM b GROUP BY 1
), co AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS n_ab
  FROM b x
  JOIN b y ON x.user_id = y.user_id AND x.day = y.day
          AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT sa.event_type AS type_a, sb.event_type AS type_b,
       CAST(coalesce(co.n_ab, 0) AS BIGINT) AS n_ab,
       coalesce(co.n_ab, 0) * nb.n / (sa.n * sb.n) AS lift
FROM s sa
JOIN s sb ON sa.event_type < sb.event_type
LEFT JOIN co ON co.type_a = sa.event_type AND co.type_b = sb.event_type, nb
"""
