"""Recursive-descent re-expression of the reference's fastparse GC grammar.

This module is the semantic twin of
``/root/reference/src/main/scala/io/github/binaryfoo/gclog/Parser.scala``
(fastparse combinators), re-expressed as compiled-regex recursive descent
over plain Python strings.  It is pure (no Ray): the Ray Data pipeline
calls :func:`parse_log` / :func:`parse_with_heap_stats` inside
``groupby(conv_id).map_groups`` stitch tasks (see gcflow/stitch.py), and
:func:`incremental_parse` reproduces the reference's streaming protocol
(Parser.scala:134-151) for unit-test parity.

Rule-by-rule parity citations (reference file:line):

- Timestamp            Parser.scala:8-12   (offset-parsed, millis)
- Seconds/Number       Parser.scala:14-15
- SizeStats            Parser.scala:16-20
- DesiredSurvivorSize  Parser.scala:22-26  (+ skipped "- age" lines)
- GenerationStats      Parser.scala:28-31
- GcType/GcCause       Parser.scala:32-33
- Java8PromotionFailureFlag Parser.scala:34
- BasicEvent           Parser.scala:35-47  (heap delta = first bare SizeDelta)
- CmsEvent             Parser.scala:48-54  (scan to first " real=")
- CollectionStats dispatch Parser.scala:55-59
- TotalAppStoppedTime  Parser.scala:60-64
- GcLine               Parser.scala:66-73
- GcLog                Parser.scala:75
- HeapStat             Parser.scala:77-90  ("object" subspace filtered)
- MetaspaceStat        Parser.scala:91-97
- DetailedEvent        Parser.scala:99-111 (positional region zip)
- QuickDetailedEvent   Parser.scala:112-115 + EndsWithCurlyBracket.scala:6-14
- incrementalParse     Parser.scala:134-151 (half-first-line skip heuristic)

Failure positions: fastparse reports the furthest index reached; we track
the same via a per-parse ``Ctx.watermark`` so the incremental skip
heuristic (index <= len(first line)/2 → SkipLine) matches exactly.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import Optional

from .events import (
    AppPausedEvent,
    BasicGCEvent,
    CmsGcEvent,
    DetailedGCEvent,
    GenerationDelta,
    HeapRegion,
    RegionDelta,
    SizeDelta,
    TenuringDistribution,
)

# ---------------------------------------------------------------- terminals

_TS = re.compile(r"(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})\.(\d{3})([+-])(\d{2})(\d{2})")
_NUMBER = re.compile(r"\d+\.\d+")
_SIZE = re.compile(r"\d+[KM]")
_SIZE_STATS = re.compile(r"(\d+[KM])->(\d+[KM])\((\d+[KM])\)")
_GC_TYPE = re.compile(r"[a-zA-Z\- ]*")
_GC_CAUSE = re.compile(r"\(([a-zA-Z ]*)\) *")
_GENERATION_NAME = re.compile(r"[a-zA-Z0-9 \-]*")
_DESIRED = re.compile(r"\nDesired survivor size (\d+) bytes, new threshold (\d+) \(")
_APP_STOPPED = re.compile(
    r"Total time for which application threads were stopped: (\d+\.\d+) seconds,"
    r" Stopping threads took: (\d+\.\d+) seconds\n?"
)
_SPACE = re.compile(r" *")
_SUBSPACE_NAME = re.compile(r"[a-zA-Z]*")
_PERCENT = re.compile(r"(\d+)%")
_REGION_CHARS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ- ")


class Ctx:
    """Parse context: the subject string + furthest-failure watermark."""

    __slots__ = ("s", "watermark")

    def __init__(self, s: str):
        self.s = s
        self.watermark = 0

    def fail(self, pos: int) -> None:
        if pos > self.watermark:
            self.watermark = pos
        return None


class GrammarCrash(Exception):
    """Raised where the reference would throw (e.g. a basic event with no
    bare heap delta — ``collectFirst{...}.get`` in Parser.scala:38, or a
    region-name mismatch in the before/after zip, Parser.scala:105-108).
    The pipeline catches this per conversation and routes it to the error
    sink instead of crashing the job."""


def _timestamp(ctx: Ctx, pos: int):
    m = _TS.match(ctx.s, pos)
    if not m:
        return ctx.fail(pos)
    y, mo, d, h, mi, sec, ms, sign, oh, om = m.groups()
    offset_min = (int(oh) * 60 + int(om)) * (-1 if sign == "-" else 1)
    dt = datetime(int(y), int(mo), int(d), int(h), int(mi), int(sec), tzinfo=timezone.utc)
    epoch_ms = int((dt - datetime(1970, 1, 1, tzinfo=timezone.utc)).total_seconds()) * 1000
    epoch_ms += int(ms) - offset_min * 60000
    return (epoch_ms, offset_min), m.end()


def _lit(ctx: Ctx, pos: int, s: str):
    if ctx.s.startswith(s, pos):
        return s, pos + len(s)
    return ctx.fail(pos)


def _seconds(ctx: Ctx, pos: int):
    m = _NUMBER.match(ctx.s, pos)
    if not m:
        return ctx.fail(pos)
    return float(m.group()), m.end()


def _ignored_line(ctx: Ctx, pos: int):
    """``CharsWhile(_ != '\\n').? ~ "\\n"`` — requires the newline."""
    idx = ctx.s.find("\n", pos)
    if idx == -1:
        return ctx.fail(len(ctx.s))
    return None, idx + 1


def size_stats(ctx: Ctx, pos: int):
    m = _SIZE_STATS.match(ctx.s, pos)
    if not m:
        return ctx.fail(pos)
    return SizeDelta(m.group(1), m.group(2), m.group(3)), m.end()


def _desired_survivor(ctx: Ctx, pos: int):
    """DesiredSurvivorSize incl. trailing ignored line and the skipped
    "- age" tenuring-table lines (Parser.scala:22-26)."""
    m = _DESIRED.match(ctx.s, pos)
    if not m:
        return ctx.fail(pos)
    r = _ignored_line(ctx, m.end())
    if r is None:
        return None
    _, p = r
    while True:
        if not ctx.s.startswith("- age", p):
            ctx.fail(p)
            break
        r = _ignored_line(ctx, p + 5)
        if r is None:
            break
        _, p = r
    return TenuringDistribution(m.group(1), m.group(2)), p


def generation_stats(ctx: Ctx, pos: int):
    """[Name: 14194K->0K(1376448K)] with optional inline timestamp prefix,
    nested tenuring block and per-generation pause (Parser.scala:28-31)."""
    p = pos
    m = _NUMBER.match(ctx.s, p)
    if m and ctx.s.startswith(": ", m.end()):
        p = m.end() + 2
    r = _lit(ctx, p, "[")
    if r is None:
        return None
    _, p = r
    m = _GENERATION_NAME.match(ctx.s, p)
    name = m.group()
    p = m.end()
    stray = None
    r = _desired_survivor(ctx, p)
    if r is not None:
        stray, p = r
    r = _lit(ctx, p, ": ")
    if r is None:
        return None
    _, p = r
    r = size_stats(ctx, p)
    if r is None:
        return None
    delta, p = r
    # optional ", N.N secs"
    if ctx.s.startswith(", ", p):
        m = _NUMBER.match(ctx.s, p + 2)
        if m and ctx.s.startswith(" secs", m.end()):
            p = m.end() + 5
    r = _lit(ctx, p, "]")
    if r is None:
        return None
    _, p = r
    return (GenerationDelta(name, delta), stray), p


def _basic_event(ctx: Ctx, pos: int):
    """BasicEvent (Parser.scala:35-47): rep of (generation | heap) deltas,
    separated by " " / ", " / nothing, then ", <pause> secs]"."""
    p = pos
    m = _NUMBER.match(ctx.s, p)
    if m and ctx.s.startswith(": ", m.end()):
        p = m.end() + 2
    if ctx.s.startswith(" ", p):
        p += 1
    items = []  # (kind, value): kind g=generation+stray, h=bare heap delta
    while True:
        # sep = StringIn(" ", ", ") | Pass — PEG: the choice commits, no
        # retry of the empty branch if the item then fails
        q_sep = p
        if items:
            if ctx.s.startswith(", ", p):
                q_sep = p + 2
            elif ctx.s.startswith(" ", p):
                q_sep = p + 1
        r = generation_stats(ctx, q_sep)
        if r is not None:
            items.append(("g", r[0]))
            p = r[1]
            continue
        r = size_stats(ctx, q_sep)
        if r is not None:
            items.append(("h", r[0]))
            p = r[1]
            continue
        break
    r = _lit(ctx, p, ", ")
    if r is None:
        return None
    _, p = r
    r = _seconds(ctx, p)
    if r is None:
        return None
    pause, p = r
    r = _lit(ctx, p, " secs]")
    if r is None:
        return None
    _, p = r
    heap_delta = next((v for k, v in items if k == "h"), None)
    if heap_delta is None:
        # reference: collectFirst{...}.get throws (Parser.scala:38)
        raise GrammarCrash(f"basic event without bare heap delta at {pos}")
    generations = [v[0] for k, v in items if k == "g"]
    stray = next((v[1] for k, v in items if k == "g" and v[1] is not None), None)
    return (heap_delta, generations, pause, stray), p


def _cms_event(ctx: Ctx, pos: int):
    """CmsEvent (Parser.scala:48-54): bare "]" → pause 0, else scan to the
    first " real=<secs> secs]"."""
    if ctx.s.startswith("]", pos):
        return 0.0, pos + 1
    idx = ctx.s.find(" real=", pos)
    if idx == -1:
        return ctx.fail(len(ctx.s))
    p = idx + 6
    r = _seconds(ctx, p)
    if r is None:
        return None
    pause, p = r
    r = _lit(ctx, p, " secs]")
    if r is None:
        return None
    _, p = r
    return pause, p


def _collection_stats(ctx: Ctx, pos: int):
    """CollectionStats dispatch (Parser.scala:55-59)."""
    r = _lit(ctx, pos, "[")
    if r is None:
        return None
    _, p = r
    m = _GC_TYPE.match(ctx.s, p)
    gc_type = m.group().strip()
    p = m.end()
    cause = None
    m = _GC_CAUSE.match(ctx.s, p)
    if m:
        cause = m.group(1)
        p = m.end()
    flag = ""
    if ctx.s.startswith("--", p):
        flag = "--"
        p += 2
    tenuring = None
    r = _desired_survivor(ctx, p)
    if r is not None:
        tenuring, p = r
    if (cause is None and gc_type.startswith("CMS")) or (
        cause is not None and cause.startswith("CMS")
    ):
        r = _cms_event(ctx, p)
        if r is None:
            return None
        pause, p = r
        return CmsGcEvent(None, 0.0, gc_type, cause, pause), p
    r = _basic_event(ctx, p)
    if r is None:
        return None
    (heap_delta, generations, pause, stray), p = r
    return (
        BasicGCEvent(
            None, 0.0, gc_type + flag, cause, heap_delta, generations, pause,
            tenuring if tenuring is not None else stray,
        ),
        p,
    )


def _total_app_stopped(ctx: Ctx, pos: int):
    m = _APP_STOPPED.match(ctx.s, pos)
    if not m:
        return ctx.fail(pos)
    return (float(m.group(1)), float(m.group(2))), m.end()


# ------------------------------------------------------- fast path (perf)
#
# One compiled regex per dominant single-line event shape.  Each pattern is
# strictly narrower than the full grammar (it only matches inputs the
# descent would parse to the exact same event, consuming the same span);
# any non-match falls through to the full descent, so failure watermarks
# and tolerant-scan semantics are unchanged.

_TS_PAT = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}[+-]\d{4}"
_GEN_PAT = (
    r"(?:\d+\.\d+: )?\[[a-zA-Z0-9 \-]+: \d+[KM]->\d+[KM]\(\d+[KM]\)"
    r"(?:, \d+\.\d+ secs)?\]"
)
_FAST_BASIC = re.compile(
    # (?!CMS): a CMS-prefixed cause routes to the CMS branch in the full
    # grammar (Parser.scala:56-57) — never fast-match it as Basic
    rf"(?:({_TS_PAT}): )?(\d+\.\d+): \[((?:Full )?GC) (?:\((?!CMS)([a-zA-Z ]*)\) *)?"
    rf"((?:{_GEN_PAT}(?:, | |))*)"
    rf"(\d+[KM])->(\d+[KM])\((\d+[KM])\)"
    rf"((?:(?:, | |){_GEN_PAT})*)"
    rf", (\d+\.\d+) secs\]"
)
_FAST_GEN = re.compile(
    r"\[([a-zA-Z0-9 \-]+): (\d+[KM])->(\d+[KM])\((\d+[KM])\)(?:, \d+\.\d+ secs)?\]"
)
_FAST_APP = re.compile(
    rf"(?:({_TS_PAT}): )?(\d+\.\d+): Total time for which application threads"
    rf" were stopped: (\d+\.\d+) seconds, Stopping threads took: (\d+\.\d+)"
    rf" seconds\n?"
)
# multi-line tenuring form (CollectionStats-level DesiredSurvivorSize,
# Parser.scala:24-26,55-59): "[GC (cause)\nDesired survivor size N bytes,
# new threshold M (…)\n[- age …]* [gens] hb->ha(hc), p secs]"
_FAST_TENURING = re.compile(
    rf"(?:({_TS_PAT}): )?(\d+\.\d+): \[((?:Full )?GC)(?: \((?!CMS)([a-zA-Z ]*)\))?\n"
    rf"Desired survivor size (\d+) bytes, new threshold (\d+) \([^\n]*\n"
    rf"(?:- age[^\n]*\n)*"
    rf" ?((?:{_GEN_PAT}(?:, | |))*)"
    rf"(\d+[KM])->(\d+[KM])\((\d+[KM])\)"
    rf"((?:(?:, | |){_GEN_PAT})*)"
    rf", (\d+\.\d+) secs\]"
)
_FAST_CMS = re.compile(
    rf"(?:({_TS_PAT}): )?(\d+\.\d+): \[(CMS[a-zA-Z\-]*)"
    rf"(?:\]|: [^\n]*? real=(\d+\.\d+) secs\])"
)


def _fast_ts(group: Optional[str]):
    if group is None:
        return None
    ctx = Ctx(group)
    r = _timestamp(ctx, 0)
    return r[0]


def _fast_gc_line(ctx: Ctx, pos: int):
    m = _FAST_BASIC.match(ctx.s, pos)
    if m:
        ts, age, gtype, cause, pre, hb, ha, hc, post, pause = m.groups()
        gens = [
            GenerationDelta(g[0], SizeDelta(g[1], g[2], g[3]))
            for g in _FAST_GEN.findall(pre) + _FAST_GEN.findall(post)
        ]
        return (
            BasicGCEvent(
                _fast_ts(ts), float(age), gtype, cause,
                SizeDelta(hb, ha, hc), gens, float(pause),
            ),
            m.end(),
        )
    m = _FAST_TENURING.match(ctx.s, pos)
    if m:
        ts, age, gtype, cause, desired, thresh, pre, hb, ha, hc, post, pause = m.groups()
        gens = [
            GenerationDelta(g[0], SizeDelta(g[1], g[2], g[3]))
            for g in _FAST_GEN.findall(pre) + _FAST_GEN.findall(post)
        ]
        return (
            BasicGCEvent(
                _fast_ts(ts), float(age), gtype, cause,
                SizeDelta(hb, ha, hc), gens, float(pause),
                TenuringDistribution(desired, thresh),
            ),
            m.end(),
        )
    m = _FAST_CMS.match(ctx.s, pos)
    if m:
        ts, age, gtype, pause = m.groups()
        return (
            CmsGcEvent(
                _fast_ts(ts), float(age), gtype, None,
                float(pause) if pause is not None else 0.0,
            ),
            m.end(),
        )
    m = _FAST_APP.match(ctx.s, pos)
    if m:
        ts, age, stopped, to_stop = m.groups()
        return (
            AppPausedEvent(_fast_ts(ts), float(age), float(stopped), float(to_stop)),
            m.end(),
        )
    return None


def gc_line(ctx: Ctx, pos: int):
    """GcLine (Parser.scala:66-73): [ts: ] age: (collection | app-stopped)."""
    r = _fast_gc_line(ctx, pos)
    if r is not None:
        return r
    p = pos
    time = None
    r = _timestamp(ctx, p)
    if r is not None and ctx.s.startswith(": ", r[1]):
        time = r[0]
        p = r[1] + 2
    r = _seconds(ctx, p)
    if r is None:
        return None
    age, p = r
    r = _lit(ctx, p, ": ")
    if r is None:
        return None
    _, p = r
    r = _collection_stats(ctx, p)
    if r is not None:
        event, p = r
        event.time = time
        event.jvm_age_seconds = age
        return event, p
    r = _total_app_stopped(ctx, p)
    if r is None:
        return None
    (stopped, to_stop), p = r
    return AppPausedEvent(time, age, stopped, to_stop), p


def _region_name(ctx: Ctx, pos: int):
    """RegionName (Parser.scala:78): allowed chars, stopping after the char
    whose *suffix* starts with "total"/"used" (per-char negative lookahead)."""
    s = ctx.s
    p = pos
    n = len(s)
    while p < n and s[p] in _REGION_CHARS:
        if s.startswith("total", p + 1) or s.startswith("used", p + 1):
            p += 1
            break
        p += 1
    return s[pos:p].strip(), p


def heap_stat(ctx: Ctx, pos: int):
    """HeapStat (Parser.scala:81-90): region header + indented subspaces;
    the "object" subspace is filtered out."""
    p = _SPACE.match(ctx.s, pos).end()
    name, p = _region_name(ctx, p)
    p = _SPACE.match(ctx.s, p).end()
    r = _lit(ctx, p, "total ")
    if r is None:
        return None
    _, p = r
    m = _SIZE.match(ctx.s, p)
    if not m:
        return ctx.fail(p)
    total = m.group()
    p = m.end()
    r = _lit(ctx, p, ", used ")
    if r is None:
        return None
    _, p = r
    m = _SIZE.match(ctx.s, p)
    if not m:
        return ctx.fail(p)
    used = m.group()
    p = m.end()
    r = _ignored_line(ctx, p)
    if r is None:
        return None
    _, p = r
    subspaces = []
    while True:
        r = _heap_subspace(ctx, p)
        if r is None:
            break
        sub, p = r
        subspaces.append(sub)
    interesting = [r for r in subspaces if r.name != "object"]
    return HeapRegion(name, total, used, interesting), p


def _heap_subspace(ctx: Ctx, pos: int):
    """``eden space 66048K, 100% used [...]`` (Parser.scala:79-80)."""
    p = _SPACE.match(ctx.s, pos).end()
    m = _SUBSPACE_NAME.match(ctx.s, p)
    name = m.group()
    p = m.end()
    p = _SPACE.match(ctx.s, p).end()
    r = _lit(ctx, p, "space")
    if r is None:
        return None
    _, p = r
    p = _SPACE.match(ctx.s, p).end()
    m = _SIZE.match(ctx.s, p)
    if not m:
        return ctx.fail(p)
    capacity = m.group()
    p = m.end()
    r = _lit(ctx, p, ",")
    if r is None:
        return None
    _, p = r
    p = _SPACE.match(ctx.s, p).end()
    m = _PERCENT.match(ctx.s, p)
    if not m:
        return ctx.fail(p)
    used = m.group()
    p = m.end()
    r = _lit(ctx, p, " used")
    if r is None:
        return None
    _, p = r
    r = _ignored_line(ctx, p)
    if r is None:
        return None
    _, p = r
    return HeapRegion(name, capacity, used), p


def _metaspace_subspace(ctx: Ctx, pos: int):
    """``Metaspace used 12441K, capacity 12616K, ...`` (Parser.scala:91-93)."""
    p = _SPACE.match(ctx.s, pos).end()
    name, p = _region_name(ctx, p)
    p = _SPACE.match(ctx.s, p).end()
    r = _lit(ctx, p, "used ")
    if r is None:
        return None
    _, p = r
    m = _SIZE.match(ctx.s, p)
    if not m:
        return ctx.fail(p)
    used = m.group()
    p = m.end()
    r = _lit(ctx, p, ", capacity ")
    if r is None:
        return None
    _, p = r
    m = _SIZE.match(ctx.s, p)
    if not m:
        return ctx.fail(p)
    capacity = m.group()
    p = m.end()
    r = _ignored_line(ctx, p)
    if r is None:
        return None
    _, p = r
    return HeapRegion(name, capacity, used), p


def metaspace_stat(ctx: Ctx, pos: int):
    """MetaspaceStat (Parser.scala:94-97): head region, tail as subspaces."""
    spaces = []
    p = pos
    while True:
        r = _metaspace_subspace(ctx, p)
        if r is None:
            break
        space, p = r
        spaces.append(space)
    if not spaces:
        return None
    head = spaces[0]
    head.subspaces = spaces[1:]
    return head, p


def _heap_details(ctx: Ctx, pos: int, when: str):
    """``Heap <when> ...`` + region stats (Parser.scala:98)."""
    r = _lit(ctx, pos, "Heap " + when)
    if r is None:
        return None
    _, p = r
    r = _ignored_line(ctx, p)
    if r is None:
        return None
    _, p = r
    regions = []
    while True:
        r = heap_stat(ctx, p)
        if r is None:
            r = metaspace_stat(ctx, p)
        if r is None:
            break
        region, p = r
        regions.append(region)
    return regions, p


def detailed_event(ctx: Ctx, pos: int):
    """DetailedEvent (Parser.scala:99-111): { before <GcLine> after } with a
    positional zip of region lists (and their subspaces) into RegionDeltas,
    requiring equal names."""
    r = _lit(ctx, pos, "{")
    if r is None:
        return None
    _, p = r
    r = _heap_details(ctx, p, "before")
    if r is None:
        return None
    before, p = r
    r = gc_line(ctx, p)
    if r is None:
        return None
    event, p = r
    if not isinstance(event, BasicGCEvent):
        return ctx.fail(p)
    r = _ignored_line(ctx, p)
    if r is not None:
        p = r[1]
    r = _heap_details(ctx, p, "after")
    if r is None:
        return None
    after, p = r
    r = _lit(ctx, p, "}")
    if r is None:
        return None
    _, p = r
    deltas = []
    for b, a in zip(before, after):
        pairs = [(b, a)] + list(zip(b.subspaces, a.subspaces))
        for bb, aa in pairs:
            if bb.name != aa.name:
                # reference: MatchError in the partial function
                raise GrammarCrash(f"region mismatch {bb.name!r} vs {aa.name!r}")
            deltas.append(RegionDelta(bb.name, bb.used, aa.used, bb.capacity, aa.capacity))
    return DetailedGCEvent(event, deltas), p


def _app_stopped_event(ctx: Ctx, pos: int):
    """Standalone AppStoppedEvent used in heap-stats mode (Parser.scala:61-64)."""
    p = pos
    time = None
    r = _timestamp(ctx, p)
    if r is not None and ctx.s.startswith(": ", r[1]):
        time = r[0]
        p = r[1] + 2
    r = _seconds(ctx, p)
    if r is None:
        return None
    age, p = r
    r = _lit(ctx, p, ": ")
    if r is None:
        return None
    _, p = r
    r = _total_app_stopped(ctx, p)
    if r is None:
        return None
    (stopped, to_stop), p = r
    return AppPausedEvent(time, age, stopped, to_stop), p


# ---------------------------------------------------------------- drivers

_DIGITS = frozenset("0123456789")


def parse_log_spans(text: str) -> list:
    """``Parser.parseLog`` scan returning ``(event, start_offset)`` pairs —
    the offset locates the event's starting line (turn) for provenance."""
    ctx = Ctx(text)
    out = []
    pos = 0
    n = len(text)
    while pos < n:
        if text[pos] in _DIGITS:  # GcLine must start with a digit
            r = gc_line(ctx, pos)
            if r is not None:
                out.append((r[0], pos))
                pos = r[1]
                continue
        idx = text.find("\n", pos)
        if idx == -1:
            break
        pos = idx + 1
    return out


def parse_log(text: str, types: Optional[tuple] = None) -> list:
    """``Parser.parseLog`` (Parser.scala:119-122): tolerant whole-log scan
    ``(GcLine | IgnoredLine).rep`` with optional event-type filter."""
    events = [e for e, _ in parse_log_spans(text)]
    if types is not None:
        events = [e for e in events if isinstance(e, types)]
    return events


def parse_with_heap_stats_spans(text: str) -> list:
    """``Parser.parseWithHeapStats`` scan returning (event, start_offset)."""
    ctx = Ctx(text)
    out = []
    pos = 0
    n = len(text)
    while pos < n:
        c = text[pos]
        r = None
        if c == "{":
            r = detailed_event(ctx, pos)
        elif c in _DIGITS:
            r = _app_stopped_event(ctx, pos)
        if r is not None:
            out.append((r[0], pos))
            pos = r[1]
            continue
        idx = text.find("\n", pos)
        if idx == -1:
            break
        pos = idx + 1
    return out


def parse_with_heap_stats(text: str) -> list:
    """``Parser.parseWithHeapStats`` (Parser.scala:124-132):
    ``(DetailedEvent | AppStoppedEvent | IgnoredLine).rep``."""
    return [e for e, _ in parse_with_heap_stats_spans(text)]


SKIP_LINE = "skip"
NEED_ANOTHER_LINE = "more"


def incremental_parse(lines: str):
    """``Parser.incrementalParse`` (Parser.scala:134-151).

    Returns an event object on success, else SKIP_LINE / NEED_ANOTHER_LINE
    via the reference's heuristic: failure index <= half of the first
    buffered line → skip, else accumulate.  QuickDetailedEvent's "}"-suffix
    early-exit (EndsWithCurlyBracket.scala:6-14) is reproduced: a buffer
    starting with "{" only attempts the full DetailedEvent parse once it
    ends with "}".
    """
    ctx = Ctx(lines)
    r = gc_line(ctx, 0)
    if r is not None:
        return r[0]
    if lines.startswith("{"):
        if not lines.endswith("}"):
            ctx.fail(len(lines) - 1)
        else:
            ctx2 = Ctx(lines)
            r = detailed_event(ctx2, 0)
            if r is None:
                # reference: Parsed.Success destructure throws
                raise GrammarCrash("DetailedEvent parse failed on }-terminated buffer")
            return r[0]
    else:
        ctx.fail(0)
    nl = lines.find("\n")
    halfway = (len(lines) if nl == -1 else nl) // 2
    return SKIP_LINE if ctx.watermark <= halfway else NEED_ANOTHER_LINE
