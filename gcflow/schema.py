"""Wide Arrow schema for the distributed event stream (SURVEY.md §1.5).

One stable nullable schema = the union of all five reference event shapes
(BasicGCEvent / CmsGcEvent / AppPausedEvent / DetailedGCEvent /
GCEventWithRates) plus transcript provenance keys.  The reference's
dynamic ``toExport`` per-name column explosion (BasicGCEvent.scala:31-36,
DetailedGCEvent.scala:14-21) is reproduced only at the sinks
(gcflow/sinks.py); ``list<struct>`` is the idiomatic Arrow carrier here.

Size strings are normalized to bytes eagerly at parse time
(SuffixExpander semantics, incl. the '%'→bare-number hack) so Arrow
columns stay numeric — the exported values match the reference's
*exported* (post-toBytes) values exactly.
"""

from __future__ import annotations

import pyarrow as pa

from . import events as ev

GENERATION_T = pa.struct(
    [
        ("name", pa.string()),
        ("before_bytes", pa.int64()),
        ("after_bytes", pa.int64()),
        ("capacity_bytes", pa.int64()),
    ]
)

REGION_T = pa.struct(
    [
        ("name", pa.string()),
        ("before", pa.int64()),
        ("after", pa.int64()),
        ("capacity_before", pa.int64()),
        ("capacity_after", pa.int64()),
    ]
)

EVENT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("event_seq", pa.int32()),       # index within the conversation
        ("turn_idx", pa.int32()),        # starting turn of the event
        ("role", pa.string()),           # of the starting turn (enrich input)
        ("tool", pa.string()),
        ("sink", pa.string()),           # routing key: basic|cms|app_stopped|detailed
        ("event_type", pa.string()),     # ≙ gcType
        ("gc_cause", pa.string()),
        ("ts", pa.timestamp("ms")),      # UTC epoch (naive, UTC semantics)
        ("tz_offset_min", pa.int32()),
        ("jvm_age_seconds", pa.float64()),
        ("pause_seconds", pa.float64()),
        ("heap_before_bytes", pa.int64()),
        ("heap_after_bytes", pa.int64()),
        ("heap_capacity_bytes", pa.int64()),
        ("heap_reclaimed_bytes", pa.int64()),
        ("generations", pa.list_(GENERATION_T)),
        ("regions", pa.list_(REGION_T)),
        ("tenuring_desired_bytes", pa.int64()),
        ("tenuring_new_threshold", pa.int32()),
        ("stopped_seconds", pa.float64()),
        ("seconds_to_stop", pa.float64()),
        ("promoted_bytes", pa.int64()),
        ("allocated_bytes", pa.int64()),
        ("interval_ms", pa.int64()),
        ("alloc_rate", pa.int64()),
        ("promotion_rate", pa.int64()),
    ]
)

SINK_BASIC = "basic"
SINK_CMS = "cms"
SINK_APP_STOPPED = "app_stopped"
SINK_DETAILED = "detailed"
SINK_ERROR = "error"


def route_sink(event) -> str:
    """Routing taxonomy ≙ the reference's concrete event classes (the
    dispatch of Parser.scala:55-59 and the AppStopped constant)."""
    base = event.base if isinstance(event, ev.EventWithRates) else event
    if isinstance(base, ev.DetailedGCEvent):
        return SINK_DETAILED
    if isinstance(base, ev.CmsGcEvent):
        return SINK_CMS
    if isinstance(base, ev.AppPausedEvent):
        return SINK_APP_STOPPED
    return SINK_BASIC


def rated_events_to_table(
    conv_id: str, rated: list, turn_idxs: list, roles: list, tools: list
) -> pa.Table:
    """Convert one conversation's rate-scanned events to an Arrow table.

    ``turn_idxs/roles/tools`` are per-event provenance (starting turn).
    """
    n = len(rated)
    cols = {name: [None] * n for name in EVENT_SCHEMA.names}
    for i, ewr in enumerate(rated):
        base = ewr.base
        inner = base.e if isinstance(base, ev.DetailedGCEvent) else base
        cols["conv_id"][i] = conv_id
        cols["event_seq"][i] = i
        cols["turn_idx"][i] = turn_idxs[i]
        cols["role"][i] = roles[i]
        cols["tool"][i] = tools[i]
        cols["sink"][i] = route_sink(base)
        cols["event_type"][i] = base.gc_type
        t = base.time
        if t is not None:
            cols["ts"][i] = t[0]
            cols["tz_offset_min"][i] = t[1]
        cols["jvm_age_seconds"][i] = base.jvm_age_seconds
        cols["allocated_bytes"][i] = ewr.bytes_allocated_since_last_event
        cols["interval_ms"][i] = ewr.millis_since_last_event
        cols["alloc_rate"][i] = ewr.heap_allocation_rate()
        cols["promotion_rate"][i] = ewr.promotion_rate()
        if isinstance(inner, ev.AppPausedEvent):
            cols["stopped_seconds"][i] = inner.stopped_seconds
            cols["seconds_to_stop"][i] = inner.seconds_to_stop
            continue
        cols["gc_cause"][i] = inner.gc_cause
        cols["pause_seconds"][i] = inner.pause_seconds
        if isinstance(inner, ev.BasicGCEvent):
            d = inner.heap_delta
            cols["heap_before_bytes"][i] = d.start_bytes
            cols["heap_after_bytes"][i] = d.end_bytes
            cols["heap_capacity_bytes"][i] = ev.to_bytes(d.capacity)
            cols["heap_reclaimed_bytes"][i] = d.reclaimed_bytes
            cols["generations"][i] = [
                {
                    "name": g.name,
                    "before_bytes": g.delta.start_bytes,
                    "after_bytes": g.delta.end_bytes,
                    "capacity_bytes": ev.to_bytes(g.delta.capacity),
                }
                for g in inner.generation_deltas
            ]
            cols["promoted_bytes"][i] = inner.promoted_bytes()
            if inner.tenuring is not None:
                cols["tenuring_desired_bytes"][i] = int(
                    inner.tenuring.desired_survivor_size
                )
                cols["tenuring_new_threshold"][i] = int(inner.tenuring.new_threshold)
        if isinstance(base, ev.DetailedGCEvent):
            cols["regions"][i] = [
                {
                    "name": r.name,
                    "before": ev.to_bytes(r.start),
                    "after": ev.to_bytes(r.end),
                    "capacity_before": ev.to_bytes(r.start_capacity),
                    "capacity_after": ev.to_bytes(r.end_capacity),
                }
                for r in base.regions
            ]
    arrays = [pa.array(cols[f.name], type=f.type) for f in EVENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)


def empty_events_table() -> pa.Table:
    return EVENT_SCHEMA.empty_table()
