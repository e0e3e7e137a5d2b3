"""Event model: typed GC events + export projection (reference parity layer).

Re-expresses the reference's event taxonomy (see SURVEY.md §1) as slotted
Python dataclasses used *inside* Ray Data ``map_groups`` stitch tasks; the
distributed representation is the wide Arrow schema in
:mod:`gcflow.schema`.  Parity citations:

- BasicGCEvent     ≙ reference BasicGCEvent.scala:11-70
- CmsGcEvent       ≙ reference CmsGcEvent.scala:11-30
- AppPausedEvent   ≙ reference AppPausedEvent.scala:11-29
- DetailedGCEvent  ≙ reference DetailedGCEvent.scala:9-26
- EventWithRates   ≙ reference GCEventWithRates.scala:8-50
- to_bytes         ≙ reference SuffixExpander.scala:4-11 ('K'→×1024,
  '%'→×1 hack; 'M' extended to ×1024² where the reference would crash)
- export ordering/conditionality ≙ the ``toExport`` methods cited above;
  the golden strings in ParserTest.scala:26-45,55-64,271-308,369-405 encode
  this ordering exactly, including the ``.distinct`` pair-dedup of
  DetailedGCEvent.scala:21 and the promotedBytes quirk of
  BasicGCEvent.scala:57-70 (first generation delta acts as "young").
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Union

APP_STOPPED_TYPE = "AppStopped"  # AppPausedEvent.scala:7-9


def to_bytes(v: str) -> int:
    """Unit-suffixed size string → bytes (SuffixExpander.scala:4-11)."""
    suffix = v[-1]
    if suffix == "K":
        return int(v[:-1]) * 1024
    if suffix == "%":
        return int(v[:-1])  # percent-used values flow through as bare numbers
    if suffix == "M":
        return int(v[:-1]) * 1024 * 1024  # grammar admits 'M' (Parser.scala:16)
    raise ValueError(f"unknown size suffix in {v!r}")


def java_div(a: int, b: int) -> int:
    """Java long division: truncate toward zero (Python // floors)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def java_double_str(x: float) -> str:
    """Render a float the way Java's ``Double.toString`` does.

    Needed for TSV/graphite golden parity: Scala stringifies doubles via
    Java, which uses plain decimal for 1e-3 <= |x| < 1e7 and scientific
    notation ("1.057E-4") outside that range, always with >=1 fractional
    digit.
    """
    if x != x or math.isinf(x):
        return str(x)
    if x == 0:
        return "0.0"
    ax = abs(x)
    if 1e-3 <= ax < 1e7:
        # python repr is plain decimal throughout this range (it only
        # switches to e-notation below 1e-4 or at/above 1e16)
        r = repr(x)
        if "." not in r:
            r += ".0"
        return r
    exp = int(math.floor(math.log10(ax)))
    mant = repr(x / (10.0**exp))
    if "." not in mant and "e" not in mant:
        mant += ".0"
    return f"{mant}E{exp}"


def format_datetime(epoch_ms: int, offset_min: int) -> str:
    """joda ``toString("yyyy-MM-dd HH:mm:ss.SSS")`` in the parsed offset
    (GCEvent.scala:18): local wall-clock of the original log line."""
    from datetime import datetime, timedelta

    dt = datetime(1970, 1, 1) + timedelta(milliseconds=epoch_ms, minutes=offset_min)
    return dt.strftime("%Y-%m-%d %H:%M:%S.") + f"{epoch_ms % 1000:03d}"


class SizeDelta:
    """start/end/capacity kept as suffixed strings, converted lazily with
    caching — mirrors SizeDelta (BasicGCEvent.scala:80-84).  (A hot-path
    class: conversions are cached because rates/exports re-read them.)"""

    __slots__ = ("start", "end", "capacity", "_sb", "_eb")

    def __init__(self, start: str, end: str, capacity: str):
        self.start = start
        self.end = end
        self.capacity = capacity
        self._sb = None
        self._eb = None

    def __eq__(self, other):
        return (
            isinstance(other, SizeDelta)
            and self.start == other.start
            and self.end == other.end
            and self.capacity == other.capacity
        )

    def __repr__(self):
        return f"SizeDelta({self.start!r}, {self.end!r}, {self.capacity!r})"

    @property
    def start_bytes(self) -> int:
        if self._sb is None:
            self._sb = to_bytes(self.start)
        return self._sb

    @property
    def end_bytes(self) -> int:
        if self._eb is None:
            self._eb = to_bytes(self.end)
        return self._eb

    @property
    def reclaimed_bytes(self) -> int:
        return self.start_bytes - self.end_bytes


@dataclass(slots=True)
class GenerationDelta:
    name: str
    delta: SizeDelta


@dataclass(slots=True)
class TenuringDistribution:
    desired_survivor_size: str
    new_threshold: str


@dataclass(slots=True)
class HeapRegion:
    name: str
    capacity: str
    used: str
    subspaces: list = field(default_factory=list)


@dataclass(slots=True)
class RegionDelta:
    name: str
    start: str
    end: str
    start_capacity: str
    end_capacity: str


# time is (epoch_ms, offset_minutes) or None — offset preserved for export
Time = Optional[tuple]


@dataclass(slots=True)
class BasicGCEvent:
    time: Time
    jvm_age_seconds: float
    gc_type: str
    gc_cause: Optional[str]
    heap_delta: SizeDelta
    generation_deltas: list
    pause_seconds: float
    tenuring: Optional[TenuringDistribution] = None
    # cached promoted_bytes (computed twice per event: export + rate)
    _promoted: object = field(default=False, compare=False, repr=False)

    @property
    def heap(self) -> Optional[SizeDelta]:
        return self.heap_delta

    @property
    def jvm_age_millis(self) -> int:
        return int(self.jvm_age_seconds * 1000)  # toLong truncation

    def promoted_bytes(self) -> Optional[int]:
        """Minor-GC promotion (BasicGCEvent.scala:57-70) including the quirk:
        ``generation("young")`` returns the first generation whose name is
        case-insensitively != "young" — in practice the *first* delta."""
        if self._promoted is not False:
            return self._promoted
        result = None
        if self.gc_type == "GC":
            young = next(
                (d for d in self.generation_deltas if d.name.lower() != "young"), None
            )
            if young is not None:
                result = young.delta.reclaimed_bytes - self.heap_delta.reclaimed_bytes
        self._promoted = result
        return result

    def to_export(self) -> list:
        seq = []
        if self.time is not None:
            seq.append(("datetime", self.time))
        seq.append(("age", self.jvm_age_seconds))
        seq.append(("type", self.gc_type))
        if self.gc_cause is not None:
            seq.append(("cause", self.gc_cause))
        seq.append(("pause", self.pause_seconds))
        d = self.heap_delta
        seq.append(("heapBefore", d.start_bytes))
        seq.append(("heapAfter", d.end_bytes))
        seq.append(("heapReclaimed", d.reclaimed_bytes))
        seq.append(("heapMax", to_bytes(d.capacity)))
        for g in self.generation_deltas:
            gd = g.delta
            seq.append((f"{g.name}Before", gd.start_bytes))
            seq.append((f"{g.name}After", gd.end_bytes))
            seq.append((f"{g.name}Reclaimed", gd.reclaimed_bytes))
            seq.append((f"{g.name}Max", to_bytes(gd.capacity)))
        promoted = self.promoted_bytes()
        if promoted is not None:
            seq.append(("promoted", promoted))
        if self.tenuring is not None:
            seq.append(("desiredSurvivorSize", self.tenuring.desired_survivor_size))
            seq.append(("newThreshold", self.tenuring.new_threshold))
        return seq


@dataclass(slots=True)
class CmsGcEvent:
    time: Time
    jvm_age_seconds: float
    gc_type: str
    gc_cause: Optional[str]
    pause_seconds: float

    @property
    def heap(self) -> Optional[SizeDelta]:
        return None

    @property
    def jvm_age_millis(self) -> int:
        return int(self.jvm_age_seconds * 1000)

    def to_export(self) -> list:
        seq = []
        if self.time is not None:
            seq.append(("datetime", self.time))
        seq.append(("age", self.jvm_age_seconds))
        seq.append(("type", self.gc_type))
        if self.gc_cause is not None:
            seq.append(("cause", self.gc_cause))
        seq.append(("pause", self.pause_seconds))
        return seq


@dataclass(slots=True)
class AppPausedEvent:
    time: Time
    jvm_age_seconds: float
    stopped_seconds: float
    seconds_to_stop: float

    gc_type: str = APP_STOPPED_TYPE

    @property
    def heap(self) -> Optional[SizeDelta]:
        return None

    @property
    def jvm_age_millis(self) -> int:
        return int(self.jvm_age_seconds * 1000)

    def to_export(self) -> list:
        seq = []
        if self.time is not None:
            seq.append(("datetime", self.time))
        seq.append(("age", self.jvm_age_seconds))
        seq.append(("type", self.gc_type))
        # %f six-decimal formatting (AppPausedEvent.scala:21-22)
        seq.append(("stoppedSeconds", "%f" % self.stopped_seconds))
        seq.append(("secondsToStop", "%f" % self.seconds_to_stop))
        return seq


@dataclass(slots=True)
class DetailedGCEvent:
    e: BasicGCEvent
    regions: list

    @property
    def time(self) -> Time:
        return self.e.time

    @property
    def gc_type(self) -> str:
        return self.e.gc_type

    @property
    def gc_cause(self) -> Optional[str]:
        return self.e.gc_cause

    @property
    def pause_seconds(self) -> float:
        return self.e.pause_seconds

    @property
    def jvm_age_seconds(self) -> float:
        return self.e.jvm_age_seconds

    @property
    def heap(self) -> Optional[SizeDelta]:
        return self.e.heap_delta

    @property
    def jvm_age_millis(self) -> int:
        return self.e.jvm_age_millis

    def to_export(self) -> list:
        seq = list(self.e.to_export())
        for r in self.regions:
            seq.append((f"{r.name}Before", to_bytes(r.start)))
            seq.append((f"{r.name}After", to_bytes(r.end)))
            seq.append((f"{r.name}CapacityBefore", to_bytes(r.start_capacity)))
            seq.append((f"{r.name}CapacityAfter", to_bytes(r.end_capacity)))
        # .distinct on (name, value) pairs, order-preserving
        # (DetailedGCEvent.scala:21)
        seen = set()
        out = []
        for pair in seq:
            if pair not in seen:
                seen.add(pair)
                out.append(pair)
        return out


GCEvent = Union[BasicGCEvent, CmsGcEvent, AppPausedEvent, DetailedGCEvent]


@dataclass(slots=True)
class EventWithRates:
    base: GCEvent
    bytes_allocated_since_last_event: int
    millis_since_last_event: int

    @property
    def time(self) -> Time:
        return self.base.time

    @property
    def gc_type(self) -> str:
        return self.base.gc_type

    @property
    def heap(self) -> Optional[SizeDelta]:
        return self.base.heap

    @property
    def jvm_age_millis(self) -> int:
        return self.base.jvm_age_millis

    @property
    def jvm_age_seconds(self) -> float:
        return self.base.jvm_age_seconds

    def heap_allocation_rate(self) -> int:
        if self.millis_since_last_event == 0:
            return 0
        return java_div(self.bytes_allocated_since_last_event, self.millis_since_last_event)

    def promotion_rate(self) -> int:
        promoted = None
        if self.millis_since_last_event != 0:
            if isinstance(self.base, BasicGCEvent):
                promoted = self.base.promoted_bytes()
            elif isinstance(self.base, DetailedGCEvent):
                promoted = self.base.e.promoted_bytes()
        if promoted is None:
            return 0
        return java_div(promoted, self.millis_since_last_event)

    def to_export(self) -> list:
        return list(self.base.to_export()) + [
            ("heapAllocated", self.bytes_allocated_since_last_event),
            ("heapAllocationRate", self.heap_allocation_rate()),
            ("promotionRate", self.promotion_rate()),
        ]


def rate_scan(events: list) -> list:
    """Ordered one-event-lookback scan (RateCalculator.scala:5-43).

    AppPausedEvent passes through with zeros and does NOT update the
    lookback state.  Runs *inside* one conv_id group — order is only
    ever per-conversation (SURVEY.md §4 ordering row).
    """
    out = []
    previous: Optional[GCEvent] = None
    for e in events:
        if isinstance(e, AppPausedEvent):
            out.append(EventWithRates(e, 0, 0))
            continue
        heap = e.heap
        if previous is None:
            allocated = heap.start_bytes if heap is not None else 0
            elapsed = e.jvm_age_millis
        else:
            prev_heap = previous.heap
            if heap is not None and prev_heap is not None:
                allocated = heap.start_bytes - prev_heap.end_bytes
            else:
                allocated = 0
            elapsed = e.jvm_age_millis - previous.jvm_age_millis
        previous = e
        out.append(EventWithRates(e, allocated, elapsed))
    return out


def export_to_seq(event) -> list:
    """``toSeq`` stringification (GCEvent.scala:16-21): datetime in
    yyyy-MM-dd HH:mm:ss.SSS, everything else via Java toString."""
    out = []
    for name, value in event.to_export():
        if name == "datetime" and isinstance(value, tuple):
            out.append((name, format_datetime(value[0], value[1])))
        elif isinstance(value, float):
            out.append((name, java_double_str(value)))
        else:
            out.append((name, str(value)))
    return out
