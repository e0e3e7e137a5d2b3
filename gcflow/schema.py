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


class EventColumns:
    """Column accumulator for event rows — one instance per stitch bucket,
    shared across all its conversations (amortizes Arrow array building)."""

    __slots__ = ("cols", "n")

    def __init__(self):
        self.cols = {name: [] for name in EVENT_SCHEMA.names}
        self.n = 0

    def _pad(self, filled: set) -> None:
        for name in EVENT_SCHEMA.names:
            if name not in filled:
                self.cols[name].append(None)

    def append_event(
        self, conv_id: str, seq: int, turn_idx: int, role, tool, ewr: "ev.EventWithRates"
    ) -> None:
        c = self.cols
        base = ewr.base
        inner = base.e if isinstance(base, ev.DetailedGCEvent) else base
        c["conv_id"].append(conv_id)
        c["event_seq"].append(seq)
        c["turn_idx"].append(turn_idx)
        c["role"].append(role)
        c["tool"].append(tool)
        c["sink"].append(route_sink(base))
        c["event_type"].append(base.gc_type)
        t = base.time
        if t is not None:
            c["ts"].append(t[0])
            c["tz_offset_min"].append(t[1])
        else:
            c["ts"].append(None)
            c["tz_offset_min"].append(None)
        c["jvm_age_seconds"].append(base.jvm_age_seconds)
        c["allocated_bytes"].append(ewr.bytes_allocated_since_last_event)
        c["interval_ms"].append(ewr.millis_since_last_event)
        c["alloc_rate"].append(ewr.heap_allocation_rate())
        c["promotion_rate"].append(ewr.promotion_rate())
        if isinstance(inner, ev.AppPausedEvent):
            c["stopped_seconds"].append(inner.stopped_seconds)
            c["seconds_to_stop"].append(inner.seconds_to_stop)
            for name in (
                "gc_cause", "pause_seconds", "heap_before_bytes", "heap_after_bytes",
                "heap_capacity_bytes", "heap_reclaimed_bytes", "generations",
                "regions", "tenuring_desired_bytes", "tenuring_new_threshold",
                "promoted_bytes",
            ):
                c[name].append(None)
            return
        c["stopped_seconds"].append(None)
        c["seconds_to_stop"].append(None)
        c["gc_cause"].append(inner.gc_cause)
        c["pause_seconds"].append(inner.pause_seconds)
        if isinstance(inner, ev.BasicGCEvent):
            d = inner.heap_delta
            c["heap_before_bytes"].append(d.start_bytes)
            c["heap_after_bytes"].append(d.end_bytes)
            c["heap_capacity_bytes"].append(ev.to_bytes(d.capacity))
            c["heap_reclaimed_bytes"].append(d.reclaimed_bytes)
            c["generations"].append(
                [
                    {
                        "name": g.name,
                        "before_bytes": g.delta.start_bytes,
                        "after_bytes": g.delta.end_bytes,
                        "capacity_bytes": ev.to_bytes(g.delta.capacity),
                    }
                    for g in inner.generation_deltas
                ]
            )
            c["promoted_bytes"].append(inner.promoted_bytes())
            if inner.tenuring is not None:
                c["tenuring_desired_bytes"].append(int(inner.tenuring.desired_survivor_size))
                c["tenuring_new_threshold"].append(int(inner.tenuring.new_threshold))
            else:
                c["tenuring_desired_bytes"].append(None)
                c["tenuring_new_threshold"].append(None)
        else:  # CmsGcEvent
            for name in (
                "heap_before_bytes", "heap_after_bytes", "heap_capacity_bytes",
                "heap_reclaimed_bytes", "generations", "tenuring_desired_bytes",
                "tenuring_new_threshold", "promoted_bytes",
            ):
                c[name].append(None)
        if isinstance(base, ev.DetailedGCEvent):
            c["regions"].append(
                [
                    {
                        "name": r.name,
                        "before": ev.to_bytes(r.start),
                        "after": ev.to_bytes(r.end),
                        "capacity_before": ev.to_bytes(r.start_capacity),
                        "capacity_after": ev.to_bytes(r.end_capacity),
                    }
                    for r in base.regions
                ]
            )
        else:
            c["regions"].append(None)

    def append_error(self, conv_id: str, turn_idx: int, message: str) -> None:
        filled = {"conv_id", "event_seq", "turn_idx", "sink", "event_type", "gc_cause"}
        self.cols["conv_id"].append(conv_id)
        self.cols["event_seq"].append(0)
        self.cols["turn_idx"].append(turn_idx)
        self.cols["sink"].append(SINK_ERROR)
        self.cols["event_type"].append("ParseError")
        self.cols["gc_cause"].append(message[:200])
        self._pad(filled)

    def mark(self) -> int:
        return len(self.cols["conv_id"])

    def truncate(self, n: int) -> None:
        """Roll back to a previous :meth:`mark` (crash-abort of a
        conversation whose earlier runs already appended rows)."""
        for v in self.cols.values():
            del v[n:]

    def to_table(self) -> pa.Table:
        arrays = [pa.array(self.cols[f.name], type=f.type) for f in EVENT_SCHEMA]
        return pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)


def empty_events_table() -> pa.Table:
    return EVENT_SCHEMA.empty_table()
