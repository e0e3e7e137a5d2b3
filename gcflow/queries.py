"""Query registry: one entry per operator/pipeline (SURVEY.md §2) +
matching DuckDB oracle SQL.

The GC-pipeline queries run over the events-derived transcripts corpus
(gcflow/transcripts.py): the Ray side *parses text* with the full grammar
+ shuffle-stitch pipeline, while the oracle reconstructs every expected
value by pure SQL arithmetic over the driver's ``events`` table — a
genuinely independent cross-check (the two sides share only the corpus
definition, which is itself hash-checked by ``gc_transcripts``).

Column names match between Ray results and oracle SQL exactly (driver
hashes after sorting columns by name).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from . import pipeline as pl
from . import transcripts as tr
from .stitch import MODE_BASIC

# Shared CTE prefix: the per-event derived quantities (mirror of
# transcripts._derive — see the constants table in gcflow/transcripts.py).
BASE_CTE = """
WITH ranked AS (
  SELECT event_id, user_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rnk
  FROM events
), base AS (
  SELECT *, event_id % 8 AS t,
    1000000 + event_id % 100000 AS hb,
    500000 + event_id % 90000 AS ha,
    2000000 AS cap,
    900000 + event_id % 50000 AS yb,
    event_id % 40000 AS ya,
    1000000 AS yc,
    1000 + event_id % 900000 AS pus
  FROM ranked
)
"""


def _events_ds(sf_dir: str, enrich: bool = False):
    path = tr.materialize_transcripts(sf_dir)
    ds = pl.read_transcripts(path)
    return pl.parse_events(ds, mode=MODE_BASIC, enrich=enrich)


# ------------------------------------------------------------------ queries

def q_gc_transcripts(sf_dir: str) -> pa.Table:
    """The synthesized transcripts table itself (generator parity check —
    per-turn text equality under stable ordering, the per-row invariant)."""
    return tr.transcripts_from_events(f"{sf_dir}/events.parquet")


def q_gc_sink_counts(sf_dir: str):
    events = _events_ds(sf_dir)
    t = pl.sink_counts(events)
    return t


def q_gc_heap_agg(sf_dir: str):
    events = _events_ds(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["sink"], "basic"))
        pause_us = pc.round(pc.multiply(b["pause_seconds"], 1e6))
        b = b.select(["event_type", "heap_before_bytes", "heap_reclaimed_bytes"]).append_column(
            "pause_us", pc.cast(pause_us, pa.int64())
        )
        g = b.group_by(["event_type"]).aggregate(
            [
                ("heap_before_bytes", "sum"),
                ("heap_reclaimed_bytes", "sum"),
                ("pause_us", "sum"),
                ([], "count_all"),
            ]
        )
        return g.rename_columns(["event_type", "hb_sum", "hr_sum", "pause_us_sum", "n"])

    from ray.data.aggregate import Sum

    partials = events.map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ["hb_sum", "hr_sum", "pause_us_sum", "n"]])
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out


def q_gc_rates(sf_dir: str):
    events = _events_ds(sf_dir)
    cols = [
        "conv_id",
        "jvm_age_seconds",
        "allocated_bytes",
        "interval_ms",
        "alloc_rate",
        "promotion_rate",
    ]
    return events.select_columns(cols)


def q_gc_enrich_route(sf_dir: str):
    events = _events_ds(sf_dir, enrich=True)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["role_class", "sink"]).aggregate([([], "count_all")])
        return g.rename_columns(["role_class", "sink", "np"])

    from ray.data.aggregate import Sum

    out = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["role_class", "sink"])
        .aggregate(Sum("np", alias_name="n"))
        .to_pandas()
        .sort_values(["role_class", "sink"])
        .reset_index(drop=True)
    )
    return out


def q_gc_top_pauses(sf_dir: str):
    events = _events_ds(sf_dir)
    top = (
        events.select_columns(["conv_id", "jvm_age_seconds", "event_type", "pause_seconds"])
        .map_batches(
            lambda t: t.filter(pc.is_valid(t["pause_seconds"])), batch_format="pyarrow"
        )
        .sort(["pause_seconds", "jvm_age_seconds"], descending=[True, False])
        .limit(20)
    )
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    pause_us = pc.cast(pc.round(pc.multiply(t["pause_seconds"], 1e6)), pa.int64())
    return t.drop_columns(["pause_seconds"]).append_column("pause_us", pause_us)


def q_gc_tenuring(sf_dir: str):
    """Stitched 3-turn tenuring events: value-level check of multi-line
    assembly + the promotedBytes quirk through the distributed pipeline."""
    events = _events_ds(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch["tenuring_new_threshold"]))
        return b.select(
            [
                "conv_id",
                "turn_idx",
                "jvm_age_seconds",
                "tenuring_desired_bytes",
                "tenuring_new_threshold",
                "promoted_bytes",
            ]
        )

    return events.map_batches(pick, batch_format="pyarrow")


def q_gc_heap_stats_sinks(sf_dir: str):
    """Heap-stats-mode pipeline over the conformance corpus (fixture
    transcripts are sf-independent): per-conversation routed counts.
    Non-SQL-expressible (multi-line {}-block stitching) → rows-only check;
    the exact expectations are asserted in tests/test_pipeline.py."""
    import ray.data as rd

    ds = rd.from_arrow(tr.fixture_transcripts())
    events = pl.parse_events(ds, mode="heap", enrich=False)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["conv_id", "sink"]).aggregate([([], "count_all")])
        return g.rename_columns(["conv_id", "sink", "np"])

    from ray.data.aggregate import Sum

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["conv_id", "sink"])
        .aggregate(Sum("np", alias_name="n"))
        .to_pandas()
        .sort_values(["conv_id", "sink"])
        .reset_index(drop=True)
    )


GC_QUERIES = {
    "gc_transcripts": q_gc_transcripts,
    "gc_heap_stats_sinks": q_gc_heap_stats_sinks,
    "gc_sink_counts": q_gc_sink_counts,
    "gc_heap_agg": q_gc_heap_agg,
    "gc_rates": q_gc_rates,
    "gc_enrich_route": q_gc_enrich_route,
    "gc_top_pauses": q_gc_top_pauses,
    "gc_tenuring": q_gc_tenuring,
}

GC_ORACLES = {
    "gc_transcripts": tr.TRANSCRIPTS_SQL,
    "gc_sink_counts": BASE_CTE
    + """
SELECT CASE WHEN t <= 4 THEN 'basic' WHEN t = 5 THEN 'cms' ELSE 'app_stopped' END AS sink,
       CASE WHEN t IN (0, 1, 4) THEN 'GC' WHEN t IN (2, 3) THEN 'Full GC'
            WHEN t = 5 THEN 'CMS-concurrent-mark' ELSE 'AppStopped' END AS event_type,
       count(*) AS n
FROM base WHERE t <> 7
GROUP BY 1, 2
ORDER BY 1, 2
""",
    "gc_heap_agg": BASE_CTE
    + """
SELECT CASE WHEN t IN (0, 1, 4) THEN 'GC' ELSE 'Full GC' END AS event_type,
       CAST(sum(hb) * 1024 AS BIGINT) AS hb_sum,
       CAST(sum(hb - ha) * 1024 AS BIGINT) AS hr_sum,
       CAST(sum(pus) AS BIGINT) AS pause_us_sum,
       count(*) AS n
FROM base WHERE t <= 4
GROUP BY 1 ORDER BY 1
""",
    "gc_rates": BASE_CTE
    + """
, ev AS (SELECT * FROM base WHERE t NOT IN (6, 7)),
scan AS (
  SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id AS DOUBLE) AS jvm_age_seconds,
         t, hb, ha, yb, ya, event_id,
         lag(t) OVER w AS pt,
         lag(ha) OVER w AS pha,
         lag(event_id) OVER w AS pe
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
), vals AS (
  SELECT conv_id, jvm_age_seconds,
    CASE WHEN t = 5 THEN 0
         WHEN pe IS NULL THEN hb * 1024
         WHEN pt = 5 THEN 0
         ELSE (hb - pha) * 1024 END AS allocated_bytes,
    CASE WHEN pe IS NULL THEN event_id * 1000
         ELSE (event_id - pe) * 1000 END AS interval_ms,
    CASE WHEN t = 4 THEN ((yb - ya) - (hb - ha)) * 1024 ELSE NULL END AS promoted
  FROM scan
)
SELECT conv_id, jvm_age_seconds, allocated_bytes, interval_ms,
       CASE WHEN interval_ms = 0 THEN 0 ELSE allocated_bytes // interval_ms END AS alloc_rate,
       CASE WHEN interval_ms = 0 OR promoted IS NULL THEN 0
            ELSE promoted // interval_ms END AS promotion_rate
FROM vals
UNION ALL
SELECT 'c' || CAST(user_id AS VARCHAR), CAST(event_id AS DOUBLE), 0, 0, 0, 0
FROM base WHERE t = 6
""",
    "gc_enrich_route": BASE_CTE
    + """
SELECT CASE event_id % 3 WHEN 0 THEN 'human' WHEN 1 THEN 'model' ELSE 'system' END AS role_class,
       CASE WHEN t <= 4 THEN 'basic' WHEN t = 5 THEN 'cms' ELSE 'app_stopped' END AS sink,
       count(*) AS n
FROM base WHERE t <> 7
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "gc_top_pauses": BASE_CTE
    + """
SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(event_id AS DOUBLE) AS jvm_age_seconds,
       CASE WHEN t IN (0, 1, 4) THEN 'GC' WHEN t IN (2, 3) THEN 'Full GC'
            ELSE 'CMS-concurrent-mark' END AS event_type,
       CASE WHEN t = 5 THEN 30000 ELSE pus END AS pause_us
FROM base WHERE t <> 6 AND t <> 7
ORDER BY CASE WHEN t = 5 THEN 0.03 ELSE pus / 1000000.0 END DESC, event_id ASC
LIMIT 20
""",
    "gc_tenuring": BASE_CTE
    + """
SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(rnk * 4 AS INTEGER) AS turn_idx,
       CAST(event_id AS DOUBLE) AS jvm_age_seconds,
       CAST(129368064 AS BIGINT) AS tenuring_desired_bytes,
       CAST(3 AS INTEGER) AS tenuring_new_threshold,
       ((yb - ya) - (hb - ha)) * 1024 AS promoted_bytes
FROM base WHERE t = 4
""",
}
