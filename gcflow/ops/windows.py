"""Windowed/sessionized aggregation over the ``events`` stream table —
the streaming-shaped custom operator (Ray Data has no event-time windows;
sessions are computed per key inside ``groupby(key).map_groups`` over the
ts-sorted group, per the documented partitioning assumption: all rows of
one user fit one group).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SESSION_GAP_S = 1800


def q_evt_sessions(sf_dir: str):
    """Session windows per user (gap > 30 min starts a new session):
    (user_id, session_id, n_events, t_min, t_max)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable")
        gap = g["ts"].diff().dt.total_seconds().fillna(0)
        sid = (gap > SESSION_GAP_S).cumsum()
        out = (
            g.assign(session_id=sid)
            .groupby("session_id", sort=True)
            .agg(n_events=("ts", "size"), t_min=("ts", "min"), t_max=("ts", "max"))
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    res = ds.groupby("user_id").map_groups(sessions, batch_format="pandas").to_pandas()
    return pa.table(
        {
            "user_id": pa.array(res["user_id"], type=pa.int64()),
            "session_id": pa.array(res["session_id"], type=pa.int64()),
            "n_events": pa.array(res["n_events"], type=pa.int64()),
            "t_min": pa.array(res["t_min"], type=pa.timestamp("us")),
            "t_max": pa.array(res["t_max"], type=pa.timestamp("us")),
        }
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


WINDOW_QUERIES = {
    "evt_sessions": q_evt_sessions,
    "evt_type_windows": q_evt_type_windows,
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
}
