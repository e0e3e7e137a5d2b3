"""As-of join over the ``events`` stream — the ad-attribution shape: for
each ``purchase`` event, the most recent ``click`` by the same user
at-or-before it (ties: latest ts, then largest event_id).

Ray Data has no as-of join; the custom operator is a bucket-swept
merge-scan:

1. ONE pass filters both sides and hash-buckets on the user key
   (``hash(user) % NB`` — the repo's standard explicit partition),
2. ONE shuffle co-locates each user's rows,
3. inside a bucket, one vectorized sweep sorts by (user, ts, event_id)
   and, per user run, matches every left row against the right side with
   a single ``np.searchsorted`` (right side sorted by (ts, id) makes the
   tie-break a plain last-position lookup).

PARTITIONING ASSUMPTION (documented per the custom-operator contract):
all rows of one user fit one bucket group — guaranteed by hashing the
key; a single pathological user bounds one task, exactly like the stitch
and session sweeps.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

LEFT_TYPE = "purchase"
RIGHT_TYPE = "click"
N_ASOF_BUCKETS = 64


def q_evt_purchase_attribution(sf_dir: str):
    """(purchase event) ⟕asof (latest prior click of the same user);
    purchases with no prior click are dropped (inner as-of)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "ts", "event_type"],
    )

    def bucket_filter(t: pa.Table) -> pa.Table:
        keep = pc.is_in(
            t["event_type"], value_set=pa.array([LEFT_TYPE, RIGHT_TYPE])
        )
        t = t.filter(keep)
        uid = t["user_id"].to_numpy().astype(np.uint64)
        b = ((uid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(
            N_ASOF_BUCKETS
        )
        return pa.table(
            {
                "bucket": pa.array(b.astype(np.int64)),
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "is_left": pc.equal(t["event_type"], LEFT_TYPE),
            }
        )

    empty = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("click_event_id", pa.int64()),
            ("click_ts", pa.timestamp("us")),
        ]
    )

    def sweep(g: pa.Table) -> pa.Table:
        n = len(g)
        if n == 0:
            return empty.empty_table()
        u = g["user_id"].to_numpy()
        t_us = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        left = g["is_left"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, t_us, u))
        u, t_us, eid, left = u[order], t_us[order], eid[order], left[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], n]
        o_eid, o_uid, o_ts, o_cid, o_cts = [], [], [], [], []
        for s, e in zip(starts, ends):
            lm = left[s:e]
            if not lm.any() or lm.all():
                continue  # no lefts or no rights for this user
            rt, rid = t_us[s:e][~lm], eid[s:e][~lm]  # sorted by (ts, id)
            lt, lid = t_us[s:e][lm], eid[s:e][lm]
            pos = np.searchsorted(rt, lt, side="right") - 1
            hit = pos >= 0
            o_eid.append(lid[hit])
            o_uid.append(np.full(int(hit.sum()), u[s], dtype=np.int64))
            o_ts.append(lt[hit])
            o_cid.append(rid[pos[hit]])
            o_cts.append(rt[pos[hit]])
        if not o_eid:
            return empty.empty_table()
        cat = lambda xs: np.concatenate(xs)
        return pa.table(
            {
                "event_id": pa.array(cat(o_eid), type=pa.int64()),
                "user_id": pa.array(cat(o_uid), type=pa.int64()),
                "ts": pa.array(cat(o_ts).astype("datetime64[us]"), type=pa.timestamp("us")),
                "click_event_id": pa.array(cat(o_cid), type=pa.int64()),
                "click_ts": pa.array(cat(o_cts).astype("datetime64[us]"), type=pa.timestamp("us")),
            }
        )

    return (
        ds.map_batches(bucket_filter, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


ASOF_QUERIES = {"evt_purchase_attribution": q_evt_purchase_attribution}

ASOF_ORACLES = {
    # equivalent ANSI formulation (no reliance on vendor ASOF tie rules):
    # latest click ts per purchase, then the largest click id at that ts
    "evt_purchase_attribution": f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{LEFT_TYPE}'
), c AS (
  SELECT event_id AS c_id, user_id, ts AS c_ts FROM events
  WHERE event_type = '{RIGHT_TYPE}'
), m AS (
  SELECT p.event_id, p.user_id, p.ts, max(c.c_ts) AS click_ts
  FROM p JOIN c ON c.user_id = p.user_id AND c.c_ts <= p.ts
  GROUP BY 1, 2, 3
)
SELECT m.event_id, m.user_id, m.ts,
       CAST(max(c.c_id) AS BIGINT) AS click_event_id, m.click_ts
FROM m JOIN c ON c.user_id = m.user_id AND c.c_ts = m.click_ts
GROUP BY 1, 2, 3, 5
""",
}


# --------------------------------------------------------------- range join
#
# Non-equi interval join: events matched to every OVERLAPPING value band
# (bands [20k, 20k+30) for k=0..9 overlap pairwise, so a value can match
# one or two bands — a true range join, not binning).  Canonical
# distributed shape: the interval table is tiny → broadcast it and match
# inside map_batches with one vectorized comparison per band; shuffle
# volume zero.  For a LARGE interval side the same operator becomes a
# co-partition on a coarse value grid (each interval replicated to the
# grid cells it spans) + per-cell sweep — documented here as the scale
# fallback, same pattern as the stitch salting.

VALUE_BANDS = [(20.0 * k, 20.0 * k + 30.0) for k in range(10)]


def q_evt_value_band_join(sf_dir: str):
    """events ⋈ bands ON lo <= value < hi (overlapping intervals):
    (event_id, band_id, lo, hi)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    lo = np.array([b[0] for b in VALUE_BANDS])
    hi = np.array([b[1] for b in VALUE_BANDS])

    def match(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        eid = t["event_id"].to_numpy()
        # events × bands containment mask (bands are few — one vectorized
        # comparison per band, no python per-row work)
        m = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
        ei, bi = np.nonzero(m)
        return pa.table(
            {
                "event_id": pa.array(eid[ei], type=pa.int64()),
                "band_id": pa.array(bi.astype(np.int64), type=pa.int64()),
                "lo": pa.array(lo[bi], type=pa.float64()),
                "hi": pa.array(hi[bi], type=pa.float64()),
            }
        )

    return ds.map_batches(match, batch_format="pyarrow")


_BANDS_SQL = ", ".join(
    f"({i}, {b[0]}, {b[1]})" for i, b in enumerate(VALUE_BANDS)
)

ASOF_QUERIES["evt_value_band_join"] = q_evt_value_band_join
ASOF_ORACLES["evt_value_band_join"] = f"""
WITH bands(band_id, lo, hi) AS (VALUES {_BANDS_SQL})
SELECT e.event_id, CAST(b.band_id AS BIGINT) AS band_id,
       CAST(b.lo AS DOUBLE) AS lo, CAST(b.hi AS DOUBLE) AS hi
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
"""
