"""Exact distributed quantiles over ``events.value`` — order statistics
without a global sort.

A full ``ds.sort`` moves every row through an all-to-all exchange to
answer three scalars; the selection algorithm here instead runs
**histogram-refinement passes** (the distributed analogue of quickselect):

1. Bounds come from the parquet ROW-GROUP STATS (no data read).
2. Each pass scans the column with ``map_batches``, bucketing values into
   ``QTL_BINS`` bins over the current interval and emitting only the
   NONZERO (bin, count) rows; a ``groupby(bin).sum`` merges them — the
   shuffle is O(bins × batches) tiny rows, never O(rows).
3. The driver walks the cumulative counts to locate each still-unresolved
   order statistic's bin.  Bins whose population fits the driver budget
   are resolved exactly (one filtered collect + sort of just that bin's
   values); oversized bins become the next pass's interval.  Each pass
   shrinks a bin's population by ~QTL_BINS×, so 10^12 rows resolve in
   ≤3 scans with a ≤5M-value collect.

Bin membership is defined ONCE per interval by an explicit driver-built
edge array + ``np.searchsorted`` (bit-exact on every worker), so the set
of values counted in a bin is literally the set a later pass or collect
sees for that bin — no float-edge drift between passes.

Quantile convention matches DuckDB ``quantile_disc``: the element at
sorted index ``max(ceil(q*n) - 1, 0)`` (verified empirically over n=4,5,
10,101 and q∈{0,.5,.9,.99,1}).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

QTL_QS = (0.5, 0.9, 0.99)
QTL_BINS = 8192
QTL_COLLECT_BUDGET = 5_000_000   # max values the driver will sort exactly
QTL_MAX_PASSES = 6


def _value_bounds(src: str) -> tuple:
    """(lo, hi, n) from parquet footer statistics — zero data read."""
    md = pq.read_metadata(src)
    col = None
    for i in range(len(md.schema)):
        if md.schema.column(i).name == "value":
            col = i
            break
    lo, hi, n = math.inf, -math.inf, 0
    for rg in range(md.num_row_groups):
        c = md.row_group(rg).column(col)
        n += md.row_group(rg).num_rows
        st = c.statistics
        if st is not None and st.has_min_max:
            lo, hi = min(lo, st.min), max(hi, st.max)
    return lo, hi, n


def _member_mask(v: np.ndarray, lo: float, hi: float, closed: bool) -> np.ndarray:
    """Interval membership: [lo, hi] when ``closed`` (the root / a last
    bin), else [lo, hi)."""
    return (v >= lo) & ((v <= hi) if closed else (v < hi))


def _hist_pass(ds: rd.Dataset, intervals: list, bins: int = QTL_BINS) -> np.ndarray:
    """One scan: per-batch counts for every (interval, bin), merged by a
    tiny groupby.  ``intervals`` rows are (lo, hi, closed); each splits
    into QTL_BINS bins via a shared edge array.  Returns
    counts[len(intervals), QTL_BINS]."""
    edge_sets = [np.linspace(lo, hi, bins + 1) for lo, hi, _ in intervals]
    ivs = list(intervals)

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        keys, cnts = [], []
        for j, ((lo, hi, closed), edges) in enumerate(zip(ivs, edge_sets)):
            sel = v[_member_mask(v, lo, hi, closed)]
            if len(sel) == 0:
                continue
            b = np.clip(
                np.searchsorted(edges, sel, side="right") - 1, 0, bins - 1
            )
            bc = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(bc)
            keys.append(j * bins + nz)
            cnts.append(bc[nz])
        if not keys:
            return pa.schema(
                [("k", pa.int64()), ("cnt", pa.int64())]
            ).empty_table()
        return pa.table(
            {
                "k": pa.array(np.concatenate(keys), type=pa.int64()),
                "cnt": pa.array(np.concatenate(cnts), type=pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("cnt")
        .to_pandas()
    )
    out = np.zeros((len(intervals), bins), dtype=np.int64)
    if len(merged):
        k = merged["k"].to_numpy()
        out[k // bins, k % bins] = merged["sum(cnt)"].to_numpy()
    return out


def _bin_interval(lo: float, hi: float, closed: bool, b: int, bins: int = QTL_BINS) -> tuple:
    """The sub-interval holding exactly the values counted in bin ``b``
    (same edges, same searchsorted semantics)."""
    edges = np.linspace(lo, hi, bins + 1)
    blo = float(edges[b])
    if b == bins - 1:
        return blo, hi, closed  # clip makes the top bin inherit the bound
    return blo, float(edges[b + 1]), False


def _collect_interval(ds: rd.Dataset, lo: float, hi: float, closed: bool) -> np.ndarray:
    """Filtered collect of one (tiny) interval's values, sorted."""

    def sel(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        m = ~np.isnan(v) & _member_mask(np.nan_to_num(v, nan=math.inf), lo, hi, closed)
        return t.filter(pa.array(m))

    vals = ds.map_batches(sel, batch_format="pyarrow").to_pandas()["value"].to_numpy()
    return np.sort(vals)


def _select_ranks(
    ds: rd.Dataset,
    lo: float,
    hi: float,
    targets_fn,
    bins: int = QTL_BINS,
    budget: int = QTL_COLLECT_BUDGET,
) -> tuple[dict, int]:
    """Exact order statistics without a global sort (the refinement loop
    shared by the disc and cont quantile flavors).

    ``targets_fn(n_nonnull) -> {key: rank}`` maps the non-NULL count to
    0-indexed ranks into the sorted non-null values — the first pass
    doubles as the counter (its root interval [lo, hi] closed covers
    every value the later passes/collects can see, so its histogram sum
    IS the denominator; no extra scan).  Returns ``({key: value}, n)``;
    ``({}, 0)`` when the column is entirely NULL/NaN."""
    resolved: dict = {}
    state: dict | None = None  # key -> (lo, hi, closed, k); set after pass 1
    n = 0
    for _ in range(QTL_MAX_PASSES):
        if state is not None:
            # degenerate intervals are single-valued — resolve without a scan
            for key in [key for key, s in state.items() if s[1] <= s[0]]:
                resolved[key] = state.pop(key)[0]
            if not state:
                break
            intervals = sorted({(s[0], s[1], s[2]) for s in state.values()})
        else:
            intervals = [(lo, hi, True)]
        hist = _hist_pass(ds, intervals, bins)
        if state is None:
            n = int(hist[0].sum())
            if n == 0:  # column is entirely NULL/NaN
                return {}, 0
            state = {
                key: (lo, hi, True, k) for key, k in targets_fn(n).items()
            }
        iv_index = {iv: j for j, iv in enumerate(intervals)}
        nxt = {}
        for key, (qlo, qhi, closed, k) in state.items():
            counts = hist[iv_index[(qlo, qhi, closed)]]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, k + 1))
            in_bin_rank = k - (int(cum[b - 1]) if b else 0)
            blo, bhi, bclosed = _bin_interval(qlo, qhi, closed, b, bins)
            if counts[b] <= budget:
                vals = _collect_interval(ds, blo, bhi, bclosed)
                resolved[key] = float(vals[in_bin_rank])
            else:
                nxt[key] = (blo, bhi, bclosed, in_bin_rank)
        state = nxt
    for key, (qlo, qhi, qcl, k) in (state or {}).items():
        # pass cap hit: collect anyway
        vals = _collect_interval(ds, qlo, qhi, qcl)
        resolved[key] = float(vals[min(k, len(vals) - 1)])
    return resolved, n


def q_evt_value_percentiles(
    sf_dir: str, bins: int = QTL_BINS, budget: int = QTL_COLLECT_BUDGET
):
    """Exact p50/p90/p99 of ``events.value`` by distributed selection
    (histogram refinement — see module docstring).  Matches DuckDB
    ``quantile_disc`` element-for-element, so the driver check is a full
    ✓SQL oracle despite no global sort ever running."""
    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=["value"])
    lo, hi, n_rows = _value_bounds(src)

    empty = pa.table(
        {"q": pa.array([], type=pa.float64()),
         "value": pa.array([], type=pa.float64())}
    )
    if n_rows == 0 or not math.isfinite(lo):
        return empty
    if hi <= lo:  # all non-null values equal — no scan needed
        return pa.table(
            {"q": pa.array(sorted(QTL_QS), type=pa.float64()),
             "value": pa.array([lo] * len(QTL_QS), type=pa.float64())}
        )

    # Rank convention matches DuckDB quantile_disc: the element at sorted
    # index max(ceil(q*n) - 1, 0), n = the NON-NULL count.
    resolved, _ = _select_ranks(
        ds,
        lo,
        hi,
        lambda n: {q: max(int(math.ceil(q * n)) - 1, 0) for q in QTL_QS},
        bins,
        budget,
    )
    if not resolved:
        return empty

    qs = sorted(resolved)
    return pa.table(
        {
            "q": pa.array(qs, type=pa.float64()),
            "value": pa.array([resolved[q] for q in qs], type=pa.float64()),
        }
    )


# ------------------------------------------------- interpolated percentiles
# quantile_cont flavor: the PERCENTILE_CONT(q) WITHIN GROUP order
# statistic — linear interpolation between the two neighboring exact
# order statistics at fractional rank RN = (n-1)·q.  Both neighbors come
# out of the SAME shared refinement loop (two rank targets per q resolve
# in the same scans), and the interpolation reproduces DuckDB's exact
# float expression lo·(CRN−RN) + hi·(RN−FRN) (verified bitwise over
# n∈{4,5,10,101,1000} × q∈{0,.5,.9,.99,1}), so the driver check is a
# full value-hash oracle despite the fractional arithmetic.
QTL_CONT_QS = (0.25, 0.5, 0.9, 0.99)


def q_evt_value_percentile_cont(
    sf_dir: str, bins: int = QTL_BINS, budget: int = QTL_COLLECT_BUDGET
):
    """Exact interpolated p25/p50/p90/p99 of ``events.value`` (DuckDB
    ``quantile_cont`` semantics) — distributed selection for the two
    neighboring order statistics per quantile, driver-side interpolation."""
    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=["value"])
    lo, hi, n_rows = _value_bounds(src)

    empty = pa.table(
        {"q": pa.array([], type=pa.float64()),
         "value": pa.array([], type=pa.float64())}
    )
    if n_rows == 0 or not math.isfinite(lo):
        return empty
    if hi <= lo:  # all non-null values equal — interpolation is the value
        return pa.table(
            {"q": pa.array(sorted(QTL_CONT_QS), type=pa.float64()),
             "value": pa.array([lo] * len(QTL_CONT_QS), type=pa.float64())}
        )

    def targets(n: int) -> dict:
        t = {}
        for q in QTL_CONT_QS:
            rn = float(n - 1) * q
            t[("f", q)] = int(math.floor(rn))
            t[("c", q)] = int(math.ceil(rn))
        return t

    resolved, n = _select_ranks(ds, lo, hi, targets, bins, budget)
    if not resolved:
        return empty

    qs = sorted(QTL_CONT_QS)
    out = []
    for q in qs:
        rn = float(n - 1) * q
        frn, crn = math.floor(rn), math.ceil(rn)
        v_lo, v_hi = resolved[("f", q)], resolved[("c", q)]
        if crn == frn:
            out.append(v_lo)
        else:  # DuckDB Interpolator: lo·(CRN−RN) + hi·(RN−FRN)
            out.append(v_lo * (crn - rn) + v_hi * (rn - frn))
    return pa.table(
        {
            "q": pa.array(qs, type=pa.float64()),
            "value": pa.array(out, type=pa.float64()),
        }
    )


# ------------------------------------------------------ equi-width histogram
# The one-pass distribution profile (dashboards, drift monitors, bin
# pruning): HIST_BINS equal-width bins between the parquet-stats bounds,
# per-batch bincount partials, ONE tiny groupby(bin) merge — the shuffle
# is O(bins × batches) rows, never O(rows).  Bin assignment and the bin's
# left edge are each ONE IEEE expression — floor((v−lo)·B/(hi−lo)) and
# lo + bin·(hi−lo)/B — spelled identically in the SQL oracle, so the
# float arithmetic is bitwise on both engines.
HIST_BINS = 64


def q_evt_value_hist(sf_dir: str, bins: int = HIST_BINS):
    """(bin, lo_edge, n) equi-width histogram of ``events.value``."""
    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=["value"])
    lo, hi, n_rows = _value_bounds(src)
    if n_rows == 0 or not math.isfinite(lo):
        return pa.table(
            {"bin": pa.array([], type=pa.int64()),
             "lo_edge": pa.array([], type=pa.float64()),
             "n": pa.array([], type=pa.int64())}
        )
    fbins = float(bins)
    width = hi - lo  # computed once; 0 ⇒ all values equal ⇒ single bin 0

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        if width > 0:
            b = np.minimum(
                np.floor((v - lo) * fbins / width), fbins - 1.0
            ).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        bc = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(bc)
        return pa.table(
            {"bin": pa.array(nz, type=pa.int64()),
             "n": pa.array(bc[nz], type=pa.int64())}
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ bins rows
        .sort_values("bin")
    )
    b = merged["bin"].to_numpy(dtype=np.int64)
    return pa.table(
        {
            "bin": pa.array(b, type=pa.int64()),
            "lo_edge": pa.array(
                lo + b.astype(np.float64) * width / fbins, type=pa.float64()
            ),
            "n": pa.array(merged["n"].to_numpy(), type=pa.int64()),
        }
    )


QUANTILE_QUERIES = {
    "evt_value_percentiles": q_evt_value_percentiles,
    "evt_value_percentile_cont": q_evt_value_percentile_cont,
    "evt_value_hist": q_evt_value_hist,
}

QUANTILE_ORACLES = {
    "evt_value_percentiles": """
SELECT CAST(0.5 AS DOUBLE) AS q, quantile_disc(value, 0.5) AS value FROM events
UNION ALL
SELECT CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events
""",
    "evt_value_percentile_cont": """
SELECT CAST(0.25 AS DOUBLE) AS q, quantile_cont(value, 0.25) AS value FROM events
UNION ALL
SELECT CAST(0.5 AS DOUBLE), quantile_cont(value, 0.5) FROM events
UNION ALL
SELECT CAST(0.9 AS DOUBLE), quantile_cont(value, 0.9) FROM events
UNION ALL
SELECT CAST(0.99 AS DOUBLE), quantile_cont(value, 0.99) FROM events
""",
    "evt_value_hist": """
WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
SELECT CAST(least(floor((value - lo) * 64.0 / (hi - lo)), 63.0) AS BIGINT) AS bin,
       lo + CAST(CAST(least(floor((value - lo) * 64.0 / (hi - lo)), 63.0) AS BIGINT) AS DOUBLE) * (hi - lo) / 64.0 AS lo_edge,
       count(*) AS n
FROM events, b WHERE value IS NOT NULL
GROUP BY 1, 2
""",
}


# ---------------------------------------------------------------------------
# Grouped exact percentiles: the same histogram-refinement selection run
# per group (event_type), with every group sharing each scan — one pass
# histograms ALL groups' unresolved intervals simultaneously, so the
# scan count stays ≤3 regardless of group count and the shuffle stays
# O(groups × bins) tiny rows.  Bounds come from a first profiling scan
# (per-group min/max/non-NaN n — parquet stats can't separate
# interleaved groups).
#
# Partitioning assumption: group cardinality is modest (tenants, event
# types, shards — thousands, not millions): every batch walks the
# unresolved-interval list.  For high-cardinality grouping use the
# t-digest sketch (ops/sketch.py) or pre-partition by group.
# ---------------------------------------------------------------------------

QTL_GROUP_BINS = 2048


def _grouped_bounds(ds: rd.Dataset, group_col: str):
    """One scan → {group: (n_non_nan, lo, hi)}.

    Groups whose values are entirely NULL/NaN survive with n=0 (and
    lo=+inf, hi=-inf) so the caller can emit (group, q, NULL) exactly
    like ``quantile_disc ... GROUP BY`` does.  Group KEYS are assumed
    non-null (a NULL key would break np.unique's object-array sort);
    pre-filter or fill NULL keys upstream if the source allows them."""

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.schema(
                [(group_col, pa.string()), ("n", pa.int64()),
                 ("lo", pa.float64()), ("hi", pa.float64())]
            ).empty_table()
        ok = ~np.isnan(v)
        uniq, inv = np.unique(g, return_inverse=True)
        n = np.bincount(inv[ok], minlength=len(uniq))
        lo = np.full(len(uniq), math.inf)
        hi = np.full(len(uniq), -math.inf)
        np.minimum.at(lo, inv[ok], v[ok])
        np.maximum.at(hi, inv[ok], v[ok])
        return pa.table(
            {
                group_col: pa.array(uniq),
                "n": pa.array(n, type=pa.int64()),
                "lo": pa.array(lo, type=pa.float64()),
                "hi": pa.array(hi, type=pa.float64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            rd.aggregate.Sum("n", alias_name="n"),
            rd.aggregate.Min("lo", alias_name="lo"),
            rd.aggregate.Max("hi", alias_name="hi"),
        )
        .to_pandas()
    )
    return {
        r[group_col]: (int(r["n"]), float(r["lo"]), float(r["hi"]))
        for _, r in merged.iterrows()
    }


def _hist_pass_grouped(
    ds: rd.Dataset, group_col: str, intervals: list, bins: int
) -> np.ndarray:
    """One scan histogramming every (group, interval) row; returns
    counts[len(intervals), bins].  ``intervals`` rows are
    (group, lo, hi, closed) with bit-exact shared edge arrays."""
    edge_sets = [np.linspace(lo, hi, bins + 1) for _, lo, hi, _ in intervals]
    ivs = list(intervals)

    def partial(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        g, v = g[ok], v[ok]
        keys, cnts = [], []
        for j, ((grp, lo, hi, closed), edges) in enumerate(zip(ivs, edge_sets)):
            sel = v[(g == grp) & _member_mask(v, lo, hi, closed)]
            if len(sel) == 0:
                continue
            b = np.clip(np.searchsorted(edges, sel, side="right") - 1, 0, bins - 1)
            bc = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(bc)
            keys.append(j * bins + nz)
            cnts.append(bc[nz])
        if not keys:
            return pa.schema([("k", pa.int64()), ("cnt", pa.int64())]).empty_table()
        return pa.table(
            {
                "k": pa.array(np.concatenate(keys), type=pa.int64()),
                "cnt": pa.array(np.concatenate(cnts), type=pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .sum("cnt")
        .to_pandas()
    )
    out = np.zeros((len(intervals), bins), dtype=np.int64)
    if len(merged):
        k = merged["k"].to_numpy()
        out[k // bins, k % bins] = merged["sum(cnt)"].to_numpy()
    return out


def _collect_group_intervals(
    ds: rd.Dataset, group_col: str, specs: list
) -> dict:
    """ONE scan collecting every pending (group, interval) selection at
    once — collect cost must not grow with group × quantile count.
    ``specs`` rows are (key, grp, lo, hi, closed); returns
    {key: sorted values}.  Total collected rows are budget-bounded by
    the caller (each spec's bin count ≤ budget)."""
    if not specs:
        return {}
    sp = list(specs)

    def sel(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        sids, vals = [], []
        for j, (_, grp, lo, hi, closed) in enumerate(sp):
            m = ok & (g == grp) & _member_mask(
                np.nan_to_num(v, nan=math.inf), lo, hi, closed
            )
            hit = v[m]
            if len(hit):
                sids.append(np.full(len(hit), j, dtype=np.int64))
                vals.append(hit)
        if not sids:
            return pa.schema(
                [("sid", pa.int64()), ("value", pa.float64())]
            ).empty_table()
        return pa.table(
            {
                "sid": pa.array(np.concatenate(sids), type=pa.int64()),
                "value": pa.array(np.concatenate(vals), type=pa.float64()),
            }
        )

    df = ds.map_batches(sel, batch_format="pyarrow").to_pandas()
    out = {}
    for j, (key, *_rest) in enumerate(sp):
        out[key] = np.sort(df.loc[df.sid == j, "value"].to_numpy())
    return out


def _grouped_select(
    ds: rd.Dataset, group_col: str, qs,
    bins: int = QTL_GROUP_BINS, budget: int = QTL_COLLECT_BUDGET,
) -> dict:
    """Grouped quantile_disc selection over any ``(group_col, value)``
    Dataset (a parquet read or a derived streaming transform — each scan
    re-executes the producing lineage, so keep it cheap or materialized).
    Returns {(group, q): value} with NaN for all-NULL groups."""
    bounds = _grouped_bounds(ds, group_col)

    resolved: dict = {}   # (grp, q) -> value
    state: dict = {}      # (grp, q) -> (lo, hi, closed, k)
    for grp, (n, lo, hi) in bounds.items():
        for q in qs:
            if n == 0:
                # all-NULL/NaN group: present in the data, no quantile —
                # (group, q, NULL), matching quantile_disc GROUP BY
                resolved[(grp, q)] = math.nan
            elif hi <= lo:
                resolved[(grp, q)] = lo
            else:
                state[(grp, q)] = (lo, hi, True, max(int(math.ceil(q * n)) - 1, 0))

    for _ in range(QTL_MAX_PASSES):
        for key in [k for k, s in state.items() if s[1] <= s[0]]:
            resolved[key] = state.pop(key)[0]
        if not state:
            break
        intervals = sorted({(k[0], s[0], s[1], s[2]) for k, s in state.items()})
        hist = _hist_pass_grouped(ds, group_col, intervals, bins)
        iv_index = {iv: j for j, iv in enumerate(intervals)}
        nxt = {}
        collects = []  # (key, grp, lo, hi, closed) — batched into ONE scan
        ranks = {}
        for (grp, q), (qlo, qhi, closed, k) in state.items():
            counts = hist[iv_index[(grp, qlo, qhi, closed)]]
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, k + 1))
            in_bin_rank = k - (int(cum[b - 1]) if b else 0)
            blo, bhi, bclosed = _bin_interval(qlo, qhi, closed, b, bins)
            if counts[b] <= budget:
                collects.append(((grp, q), grp, blo, bhi, bclosed))
                ranks[(grp, q)] = in_bin_rank
            else:
                nxt[(grp, q)] = (blo, bhi, bclosed, in_bin_rank)
        for key, vals in _collect_group_intervals(ds, group_col, collects).items():
            resolved[key] = float(vals[ranks[key]])
        state = nxt
    # pass cap hit: collect the survivors' whole intervals in one scan
    cap = [((grp, q), grp, s[0], s[1], s[2]) for (grp, q), s in state.items()]
    for key, vals in _collect_group_intervals(ds, group_col, cap).items():
        k = state[key][3]
        resolved[key] = float(vals[min(k, len(vals) - 1)])
    return resolved


def q_evt_value_percentiles_by_type(
    sf_dir: str, bins: int = QTL_GROUP_BINS, budget: int = QTL_COLLECT_BUDGET,
    qs=QTL_QS, group_col: str = "event_type",
):
    """Exact per-event-type p50/p90/p99 — grouped distributed selection.
    Matches DuckDB ``quantile_disc(...) GROUP BY event_type`` element-
    for-element; scans are shared across groups, so the pass count does
    not grow with group count."""
    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=[group_col, "value"])
    resolved = _grouped_select(ds, group_col, qs, bins, budget)

    keys = sorted(resolved)
    return pa.table(
        {
            group_col: pa.array([g for g, _ in keys]),
            "q": pa.array([q for _, q in keys], type=pa.float64()),
            "value": pa.array(
                [None if math.isnan(resolved[k]) else resolved[k] for k in keys],
                type=pa.float64(),
            ),
        }
    )


QUANTILE_QUERIES["evt_value_percentiles_by_type"] = q_evt_value_percentiles_by_type
QUANTILE_ORACLES["evt_value_percentiles_by_type"] = """
SELECT event_type, CAST(0.5 AS DOUBLE) AS q, quantile_disc(value, 0.5) AS value
FROM events GROUP BY 1
UNION ALL
SELECT event_type, CAST(0.9 AS DOUBLE), quantile_disc(value, 0.9) FROM events GROUP BY 1
UNION ALL
SELECT event_type, CAST(0.99 AS DOUBLE), quantile_disc(value, 0.99) FROM events GROUP BY 1
"""


# ------------------------------------------------------------ anomaly flags
# Tukey-fence outlier detection — the monitoring/cleaning pass over an
# event stream: an event is anomalous when its value leaves
# [q1 − 1.5·IQR, q3 + 1.5·IQR] for its event type.  The quartiles are
# the EXACT grouped quantile_disc elements from the shared-scan
# selection above (no sampled sketch), so fences — and therefore the
# flag set — are bit-identical to the SQL oracle; the flagging itself
# is one streaming pass against the driver-built (tiny,
# group-cardinality-sized) fence table broadcast via ray.put.


def q_evt_anomaly(sf_dir: str):
    """(event_id, event_type, value) of every Tukey-fence outlier."""
    import numpy as np

    import ray

    qt = q_evt_value_percentiles_by_type(sf_dir, qs=(0.25, 0.75))
    et = qt["event_type"].to_pylist()
    qq = qt["q"].to_pylist()
    vv = qt["value"].to_pylist()
    q1 = {g: v for g, q, v in zip(et, qq, vv) if q == 0.25}
    q3 = {g: v for g, q, v in zip(et, qq, vv) if q == 0.75}
    fences = {
        g: (q1[g] - 1.5 * (q3[g] - q1[g]), q3[g] + 1.5 * (q3[g] - q1[g]))
        for g in q1
        if q1[g] is not None and q3[g] is not None
    }
    ref = ray.put(fences)
    empty = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()),
         ("value", pa.float64())]
    ).empty_table()

    def flag(t: pa.Table, _r=ref) -> pa.Table:
        f = ray.get(_r)
        if len(t) == 0 or not f:
            return empty
        g = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(g, return_inverse=True)
        lo = np.array([f.get(u, (-np.inf, np.inf))[0] for u in uniq])[inv]
        hi = np.array([f.get(u, (-np.inf, np.inf))[1] for u in uniq])[inv]
        m = (v < lo) | (v > hi)
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()).filter(
                    pa.array(m)
                ),
                "event_type": t["event_type"].filter(pa.array(m)),
                "value": t["value"].filter(pa.array(m)),
            }
        )

    src = os.path.join(sf_dir, "events.parquet")
    return rd.read_parquet(
        src, columns=["event_id", "event_type", "value"]
    ).map_batches(flag, batch_format="pyarrow")


QUANTILE_QUERIES["evt_anomaly"] = q_evt_anomaly
QUANTILE_ORACLES["evt_anomaly"] = """
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q1,
         quantile_disc(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value
FROM events e JOIN q USING (event_type)
WHERE e.value < q.q1 - 1.5 * (q.q3 - q.q1)
   OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
"""


# ------------------------------------------------- distributed global rank
# row_number() over a GLOBAL (value, event_id) order — the window-function
# analogue of the selection machinery above, and the same design point:
# never materialize a global sort.  Ranks compose from (a) a deterministic
# range bucketing (linear bins between the parquet-stats bounds — the
# production swap-in for heavy value skew is sampled-quantile cut points,
# which the histogram passes above already know how to produce), (b) ONE
# tiny groupby(bucket).count() whose ≤RANK_BUCKETS rows reach the driver
# for an exclusive prefix sum, and (c) ONE hash shuffle where each bucket
# sorts only its own O(N/RANK_BUCKETS) rows and adds its broadcast offset.
RANK_BUCKETS = 64


def q_evt_value_rank(sf_dir: str, n_buckets: int = RANK_BUCKETS):
    """(event_id, value, global_rank): dense 0-based row_number over the
    global (value, event_id) ordering of non-null event values.  Size
    ``n_buckets`` so one bucket's local sort fits a worker (~rows/64
    here; at 100 TB raise it with the corpus)."""
    import ray

    src = os.path.join(sf_dir, "events.parquet")
    lo, hi, _n = _value_bounds(src)
    # interior cut points; degenerate lo==hi leaves one populated bucket
    cuts = np.linspace(lo, hi, n_buckets + 1)[1:-1]

    def bucketize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(cuts, v, side="right").astype(np.int64)
        return pa.table(
            {
                "event_id": t["event_id"],
                "value": t["value"],
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    bk = rd.read_parquet(src, columns=["event_id", "value"]).map_batches(
        bucketize, batch_format="pyarrow"
    )
    # ≤ n_buckets rows reach the driver — the only collect in the op
    counts = bk.groupby("bucket").count().to_pandas().sort_values("bucket")
    offsets: dict[int, int] = {}
    acc = 0
    for b, c in zip(counts["bucket"], counts["count()"]):
        offsets[int(b)] = acc
        acc += int(c)

    def rank_bucket(t: pa.Table, _offs=offsets) -> pa.Table:
        off = _offs[int(t["bucket"][0].as_py())]
        t = t.sort_by([("value", "ascending"), ("event_id", "ascending")])
        return pa.table(
            {
                "event_id": t["event_id"],
                "value": t["value"],
                "global_rank": pa.array(
                    off + np.arange(len(t), dtype=np.int64), type=pa.int64()
                ),
            }
        )

    return bk.groupby("bucket").map_groups(rank_bucket, batch_format="pyarrow")


QUANTILE_QUERIES["evt_value_rank"] = q_evt_value_rank
QUANTILE_ORACLES["evt_value_rank"] = """
SELECT event_id, value,
       CAST(row_number() OVER (ORDER BY value, event_id) - 1 AS BIGINT)
         AS global_rank
FROM events WHERE value IS NOT NULL
"""


# --------------------------------------------------------- trimmed mean
# Robust per-group location estimate: mean of the values inside the
# exact [p25, p75] IQR box — composes the grouped distributed selection
# above (scans shared across groups, no global sort) with ONE streaming
# filter + partial-sum pass against the broadcast per-group box.  The
# quartiles are quantile_disc-exact, so both engines trim the identical
# row set and the only fp surface is the final mean.


def q_evt_trimmed_mean(sf_dir: str):
    box = q_evt_value_percentiles_by_type(sf_dir, qs=(0.25, 0.75)).to_pandas()
    lo = {r.event_type: r.value for r in box[box.q == 0.25].itertuples()}
    hi = {r.event_type: r.value for r in box[box.q == 0.75].itertuples()}

    part_schema = pa.schema(
        [("event_type", pa.string()), ("s", pa.float64()), ("n", pa.int64())]
    )

    def partial(t: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        if len(t) == 0:
            return part_schema.empty_table()
        et = t["event_type"].to_pylist()
        v = np.asarray(t["value"])
        l = np.fromiter((_lo[e] for e in et), dtype=np.float64, count=len(et))
        h = np.fromiter((_hi[e] for e in et), dtype=np.float64, count=len(et))
        keep = (v >= l) & (v <= h)
        g = (
            t.filter(pa.array(keep))
            .group_by(["event_type"])
            .aggregate([("value", "sum"), ("value", "count")])
        )
        return pa.table(
            {
                "event_type": g["event_type"],
                "s": g["value_sum"],
                "n": pc.cast(g["value_count"], pa.int64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        s = float(pc.sum(g["s"]).as_py())
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()]),
                "trimmed_mean": pa.array([s / n], type=pa.float64()),
                "n_kept": pa.array([n], type=pa.int64()),
            }
        )

    src = os.path.join(sf_dir, "events.parquet")
    return (
        rd.read_parquet(src, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge, batch_format="pyarrow")
    )


QUANTILE_QUERIES["evt_trimmed_mean"] = q_evt_trimmed_mean
QUANTILE_ORACLES["evt_trimmed_mean"] = """
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS lo, quantile_disc(value, 0.75) AS hi
  FROM events WHERE value IS NOT NULL GROUP BY 1
)
SELECT e.event_type, sum(e.value) / count(*) AS trimmed_mean,
       CAST(count(*) AS BIGINT) AS n_kept
FROM events e JOIN q USING (event_type)
WHERE e.value IS NOT NULL AND e.value BETWEEN q.lo AND q.hi
GROUP BY 1
"""


# ------------------------------------------------------------ decile tag
# Exact NTILE(10) bucketing of every event by value — the
# percentile-bucketing feature stage (e.g. quality-score deciles for
# curriculum mixing).  Composes the global-rank op: ranks come from the
# bucket-prefix machinery (no global sort), the NTILE arithmetic is one
# vectorized expression per batch, and the only driver state is the
# total row count already collected for the rank offsets.

NTILE_K = 10


def q_evt_value_decile(sf_dir: str, k: int = NTILE_K):
    ranked = q_evt_value_rank(sf_dir)
    n = int(
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])
        .map_batches(
            lambda t: pa.table(
                {"c": pa.array([len(t.filter(pc.is_valid(t["value"])))], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .sum("c")
    )
    q, r = divmod(n, k)

    def tag(t: pa.Table) -> pa.Table:
        rank = np.asarray(t["global_rank"])
        big = r * (q + 1)  # first r buckets hold q+1 rows (NTILE semantics)
        tile = np.where(rank < big, rank // max(q + 1, 1), r + (rank - big) // max(q, 1))
        return pa.table(
            {
                "event_id": t["event_id"],
                "value": t["value"],
                "decile": pa.array(tile + 1, type=pa.int64()),
            }
        )

    return ranked.map_batches(tag, batch_format="pyarrow")


QUANTILE_QUERIES["evt_value_decile"] = q_evt_value_decile
QUANTILE_ORACLES["evt_value_decile"] = f"""
SELECT event_id, value,
       CAST(ntile({NTILE_K}) OVER (ORDER BY value, event_id) AS BIGINT) AS decile
FROM events WHERE value IS NOT NULL
"""


# ----------------------------------------------------- robust scale (MAD)
# Median absolute deviation per event type — the robust-statistics scale
# estimate (the σ replacement monitoring pipelines use when tails are
# heavy).  TWO rounds of the SAME shared-scan grouped selection: round A
# finds each type's exact median; round B runs the selection over the
# DERIVED |value − median(type)| column, computed as a streaming
# map_batches against the broadcast median dict — recomputed per scan
# rather than materialized (one subtraction per row beats holding a
# corpus-sized column in the object store at 100 TB).  Both rounds are
# quantile_disc-exact, so the oracle is a full value-hash check.


def q_evt_mad(sf_dir: str):
    """(event_type, median, mad): per-type median + median absolute
    deviation, both exact order statistics."""
    import ray

    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=["event_type", "value"])
    med = _grouped_select(ds, "event_type", (0.5,))
    meds = {grp: v for (grp, _q), v in med.items()}
    mref = ray.put(meds)

    def dev(t: pa.Table, r) -> pa.Table:
        m = ray.get(r) if not isinstance(r, dict) else r
        g = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        c = np.array([m.get(x, math.nan) for x in np.unique(g)])
        uniq, inv = np.unique(g, return_inverse=True)
        return pa.table(
            {
                "event_type": t["event_type"],
                "value": pa.array(np.abs(v - c[inv]), type=pa.float64()),
            }
        )

    dev_ds = ds.map_batches(dev, fn_args=(mref,), batch_format="pyarrow")
    mad = _grouped_select(dev_ds, "event_type", (0.5,))

    grps = sorted(meds)
    return pa.table(
        {
            "event_type": pa.array(grps),
            "median": pa.array(
                [None if math.isnan(meds[g]) else meds[g] for g in grps],
                type=pa.float64(),
            ),
            "mad": pa.array(
                [None if math.isnan(mad[(g, 0.5)]) else mad[(g, 0.5)] for g in grps],
                type=pa.float64(),
            ),
        }
    )


QUANTILE_QUERIES["evt_mad"] = q_evt_mad
QUANTILE_ORACLES["evt_mad"] = """
WITH m AS (
  SELECT event_type, quantile_disc(value, 0.5) AS median
  FROM events GROUP BY 1
)
SELECT e.event_type, any_value(m.median) AS median,
       quantile_disc(abs(e.value - m.median), 0.5) AS mad
FROM events e JOIN m ON e.event_type = m.event_type
GROUP BY 1
"""


# ------------------------------------------------------- winsorization
# Tail clamping at the exact per-type [p01, p99] — the outlier-robust
# feature transform (keep the row, cap the value) monitoring and feature
# pipelines apply before aggregation.  One grouped-selection round for
# the cut points (shared scans, see _grouped_select) + one streaming
# clamp pass against the broadcast cut dict.  The clamp only ever COPIES
# existing float values, so the output hashes bit-exact vs the SQL
# least/greatest mirror.


def q_evt_winsorize(sf_dir: str):
    """(event_id, event_type, value_w): values clamped to the exact
    per-type [quantile_disc(0.01), quantile_disc(0.99)] box."""
    import ray

    src = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(src, columns=["event_type", "value"])
    cuts = _grouped_select(ds, "event_type", (0.01, 0.99))
    box = {}
    for (grp, q), v in cuts.items():
        lo, hi = box.get(grp, (math.nan, math.nan))
        box[grp] = (v, hi) if q == 0.01 else (lo, v)
    bref = ray.put(box)

    full = rd.read_parquet(src, columns=["event_id", "event_type", "value"])

    def clamp(t: pa.Table, r) -> pa.Table:
        b = ray.get(r) if not isinstance(r, dict) else r
        g = t["event_type"].to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(g, return_inverse=True)
        lo = np.array([b.get(x, (math.nan, math.nan))[0] for x in uniq])
        hi = np.array([b.get(x, (math.nan, math.nan))[1] for x in uniq])
        w = np.minimum(np.maximum(v, lo[inv]), hi[inv])
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": t["event_type"],
                "value_w": pa.array(w, type=pa.float64()),
            }
        )

    return full.map_batches(clamp, fn_args=(bref,), batch_format="pyarrow")


QUANTILE_QUERIES["evt_winsorize"] = q_evt_winsorize
QUANTILE_ORACLES["evt_winsorize"] = """
WITH c AS (
  SELECT event_type,
         quantile_disc(value, 0.01) AS lo,
         quantile_disc(value, 0.99) AS hi
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       least(greatest(e.value, c.lo), c.hi) AS value_w
FROM events e JOIN c ON e.event_type = c.event_type
"""
