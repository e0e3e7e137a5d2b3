"""Property-based grammar tests (hypothesis): render → parse round-trips
for randomly generated events, and tolerance under arbitrary junk."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from gcflow.events import BasicGCEvent, to_bytes
from gcflow.grammar import Ctx, gc_line, incremental_parse, parse_log

sizes = st.integers(min_value=0, max_value=10**9)
ages = st.integers(min_value=0, max_value=10**9)
pauses = st.integers(min_value=0, max_value=10**7)
gen_names = st.sampled_from(["PSYoungGen", "ParOldGen", "Metaspace", "DefNew", "Tenured", "CMS"])
causes = st.one_of(st.none(), st.sampled_from(["Allocation Failure", "Ergonomics", "System"]))


@st.composite
def basic_lines(draw):
    age = draw(ages)
    cause = draw(causes)
    gens = draw(st.lists(st.tuples(gen_names, sizes, sizes, sizes), max_size=3))
    hb, ha, hc = draw(sizes), draw(sizes), draw(sizes)
    pause = draw(pauses)
    gtype = draw(st.sampled_from(["GC", "Full GC"]))
    parts = [f"{age}.{draw(st.integers(0, 999)):03d}: [{gtype} "]
    if cause is not None:
        parts.append(f"({cause}) ")
    for name, a, b, c in gens:
        parts.append(f"[{name}: {a}K->{b}K({c}K)] ")
    parts.append(f"{hb}K->{ha}K({hc}K), 0.{pause:07d} secs]")
    return "".join(parts), (gtype, cause, gens, hb, ha, hc)


@settings(max_examples=200, deadline=None)
@given(basic_lines())
def test_rendered_basic_lines_round_trip(case):
    line, (gtype, cause, gens, hb, ha, hc) = case
    r = gc_line(Ctx(line), 0)
    assert r is not None, line
    e = r[0]
    assert isinstance(e, BasicGCEvent)
    assert e.gc_type == gtype
    assert e.gc_cause == cause
    assert to_bytes(e.heap_delta.start) == hb * 1024
    assert to_bytes(e.heap_delta.end) == ha * 1024
    assert [g.name for g in e.generation_deltas] == [g[0] for g in gens]
    for g, (name, a, b, c) in zip(e.generation_deltas, gens):
        assert g.delta.start_bytes == a * 1024
        assert g.delta.end_bytes == b * 1024


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=400))
def test_junk_never_crashes_tolerant_scan(junk):
    # tolerant whole-log scan absorbs arbitrary junk via IgnoredLine
    try:
        parse_log(junk)
    except Exception as e:  # GrammarCrash is the only sanctioned raise
        from gcflow.grammar import GrammarCrash

        assert isinstance(e, GrammarCrash)


@settings(max_examples=200, deadline=None)
@given(basic_lines())
def test_fast_path_agrees_with_descent(case):
    """The compiled fast-path regexes must produce exactly what the full
    recursive descent produces on any line both can parse."""
    import gcflow.grammar as g

    line, _ = case
    fast = g._fast_gc_line(Ctx(line), 0)
    orig = g._fast_gc_line
    g._fast_gc_line = lambda ctx, pos: None  # force the descent
    try:
        slow = gc_line(Ctx(line), 0)
    finally:
        g._fast_gc_line = orig
    assert slow is not None
    if fast is not None:
        ef, es = fast[0], slow[0]
        assert fast[1] == slow[1]  # same span consumed
        assert (ef.gc_type, ef.gc_cause, ef.pause_seconds) == (
            es.gc_type, es.gc_cause, es.pause_seconds
        )
        assert ef.heap_delta == es.heap_delta
        assert ef.generation_deltas == es.generation_deltas


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=string.ascii_letters + string.digits + " .:[](){}->,\n", max_size=200))
def test_incremental_protocol_total(junk):
    from gcflow.grammar import NEED_ANOTHER_LINE, SKIP_LINE, GrammarCrash

    try:
        r = incremental_parse(junk)
        assert r in (SKIP_LINE, NEED_ANOTHER_LINE) or hasattr(r, "gc_type")
    except GrammarCrash:
        pass
