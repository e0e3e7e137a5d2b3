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


# ---- round-2 primitives: sharded write round-trip + pair-emit brute force

import numpy as np
import pyarrow as pa


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=0, max_size=60
    ),
    st.integers(1, 6),
)
def test_write_sharded_roundtrip_conversation_aligned(rows, rows_per_file):
    """write_sharded: concatenated shards equal the input, every file is a
    contiguous slice, and no conversation straddles a file boundary."""
    import tempfile, glob, os
    import pyarrow.parquet as pq

    from gcflow import transcripts as tr

    rows = sorted(rows)
    table = pa.table(
        {
            "conv_id": pa.array([f"c{c}" for c, _ in rows], type=pa.string()),
            "turn_idx": pa.array([t for _, t in rows], type=pa.int32()),
        }
    )
    old = tr.ROWS_PER_FILE
    tr.ROWS_PER_FILE = rows_per_file
    try:
        with tempfile.TemporaryDirectory() as d:
            tr.write_sharded(table, d)
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            parts = [pq.read_table(f) for f in files]
            whole = pa.concat_tables(parts) if parts else table.slice(0, 0)
            assert whole.equals(table)
            # conversation-aligned boundaries
            for a, b in zip(parts, parts[1:]):
                if len(a) and len(b):
                    assert a["conv_id"][-1].as_py() != b["conv_id"][0].as_py()
    finally:
        tr.ROWS_PER_FILE = old


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 12)), min_size=0, max_size=80
    )
)
def test_cooccur_pairs_matches_bruteforce(ray_session, kd_rows):
    """_cooccur_pairs ≡ per-key brute-force co-occurring unique pairs."""
    import itertools

    import ray.data as rd

    from gcflow.ops.dedup import _cooccur_pairs

    t = pa.table(
        {
            "k": pa.array([np.uint64(k) for k, _ in kd_rows], type=pa.uint64()),
            "doc_id": pa.array([d for _, d in kd_rows], type=pa.int64()),
        }
    )
    out = _cooccur_pairs(rd.from_arrow(t), num_buckets=4).to_pandas()
    # a fully-empty result may come back schema-less (empty-block Ray quirk)
    got = set(zip(out["doc_a"], out["doc_b"])) if len(out) else set()
    want = set()
    byk = {}
    for k, d in kd_rows:
        byk.setdefault(k, set()).add(d)
    for docs in byk.values():
        for a, b in itertools.combinations(sorted(docs), 2):
            want.add((a, b))
    assert got == want


# ---- vec stitcher ≡ python sweep under random corpora (fuzz the fast
# paths: single-line shapes, tenuring triples, broken triples, junk,
# crash lines, conversation boundaries)

_LINE_KINDS = st.sampled_from(
    ["basic", "basic_gens", "cms", "app", "triple", "broken_triple",
     "desired_alone", "open_alone", "crash", "tail_junk"]
)


@st.composite
def _conv_lines(draw):
    kinds = draw(st.lists(_LINE_KINDS, min_size=1, max_size=8))
    lines = []
    i = draw(st.integers(1, 500))
    for kind in kinds:
        a = i * 7
        i += 1
        if kind == "basic":
            lines.append(f"{a}.000: [GC {a+9}K->{a+2}K(9000K), 0.{a%997:03d} secs]")
        elif kind == "basic_gens":
            lines.append(
                f"{a}.000: [Full GC (Ergonomics) [PSYoungGen: {a+5}K->{a%97}K(800K)]"
                f" [ParOldGen: {a+7}K->{a+1}K(900K)] {a+9}K->{a+2}K(9000K),"
                f" 0.{a%997:03d} secs] [Times: user=1.0 sys=0.0, real=0.1 secs]"
            )
        elif kind == "cms":
            lines.append(f"{a}.000: [CMS-concurrent-mark: 0.035/0.035 secs] [Times: user=0.07 sys=0.00, real=0.03 secs]")
        elif kind == "app":
            lines.append(
                f"{a}.000: Total time for which application threads were stopped:"
                f" 0.{a%997:06d} seconds, Stopping threads took: 0.0000176 seconds"
            )
        elif kind == "triple":
            lines.append(f"{a}.000: [GC (Allocation Failure)")
            lines.append(f"Desired survivor size {a*64} bytes, new threshold {1+a%14} (max 15)")
            lines.append(f" [PSYoungGen: {a+5}K->{a%97}K(800K)] {a+9}K->{a+2}K(9000K), 0.{a%997:03d} secs] [Times: user=0.2 sys=0.0, real=0.1 secs]")
        elif kind == "broken_triple":
            lines.append(f"{a}.000: [GC (Allocation Failure)")
            lines.append(f"Desired survivor size {a*64} bytes, new threshold {1+a%14} (max 15)")
            lines.append("- age   1:  123 bytes,  456 total")
            lines.append(f" [DefNew: {a+5}K->{a%97}K(800K)] {a+9}K->{a+2}K(9000K), 0.{a%997:03d} secs]")
        elif kind == "desired_alone":
            lines.append(f"Desired survivor size {a*64} bytes, new threshold 3 (max 15)")
        elif kind == "open_alone":
            lines.append(f"{a}.000: [GC (Allocation Failure)")
        elif kind == "crash":
            # basic event with generations but no bare heap delta → the
            # reference throws; whole conversation must become one error row
            lines.append(f"{a}.000: [GC [PSYoungGen: {a}K->{a}K(2K)], 0.1 secs]")
        elif kind == "tail_junk":
            lines.append("CommandLine flags: -XX:+UseParallelGC")
    return lines


@settings(max_examples=60, deadline=None)
@given(st.lists(_conv_lines(), min_size=1, max_size=4))
def test_vec_equals_python_random_corpora(ray_session, convs):
    import pandas as pd

    from gcflow import sinks
    from gcflow.stitch import stitch_bucket_py
    from gcflow.stitch_vec import stitch_bucket_vec

    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [], "tool": []}
    for ci, lines in enumerate(convs):
        for ti, line in enumerate(lines):
            rows["conv_id"].append(f"conv{ci}")
            rows["turn_idx"].append(ti)
            rows["role"].append(["user", "assistant", "tool"][ti % 3])
            rows["text"].append(line)
            rows["tool"].append(["jvm", "gc", "", "monitor"][ti % 4])
    flat = pa.table(
        {
            "conv_id": pa.array(rows["conv_id"], type=pa.string()),
            "turn_idx": pa.array(rows["turn_idx"], type=pa.int32()),
            "role": pa.array(rows["role"], type=pa.string()),
            "text": pa.array(rows["text"], type=pa.string()),
            "tool": pa.array(rows["tool"], type=pa.string()),
        }
    )
    a = stitch_bucket_py(flat, "basic")
    b = stitch_bucket_vec(flat)
    da = a.to_pandas().sort_values(["conv_id", "turn_idx", "event_seq"]).reset_index(drop=True)
    db = b.to_pandas().sort_values(["conv_id", "turn_idx", "event_seq"]).reset_index(drop=True)
    assert len(da) == len(db)
    simple = [c for c in da.columns if c not in ("generations", "regions")]
    pd.testing.assert_frame_equal(da[simple], db[simple], check_dtype=False)
    for ra, rb in zip(da.to_dict("records"), db.to_dict("records")):
        assert sinks.arrow_export_seq(ra) == sinks.arrow_export_seq(rb)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=1, max_size=12,
        ).map(" ".join),
        min_size=1, max_size=8,
    )
)
def test_shingle_segments_match_scalar_twin(texts):
    """The vectorized flat-buffer shingle path equals the per-doc scalar
    reference (set semantics, sorted ascending) on arbitrary word soup."""
    import numpy as np
    import pyarrow as pa

    from gcflow.ops.dedup import _shingle_hash_segments, _shingles, _shingle_hash64

    counts, flat = _shingle_hash_segments(pa.array(texts, type=pa.string()))
    cum = np.concatenate(([0], np.cumsum(counts)))
    for i, s in enumerate(texts):
        want = sorted(np.uint64(_shingle_hash64(x)) for x in _shingles(s))
        got = flat[cum[i] : cum[i + 1]].tolist()
        assert got == [int(w) for w in want], s


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30), st.integers(0, 7)),
        min_size=1, max_size=120,
    )
)
def test_pair_group_counts_matches_pandas(ray_session, pairs):
    """The bucketed run-length pair sweep equals pandas groupby count/min
    on arbitrary (doc_a, doc_b, val) multisets."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from gcflow.ops.dedup import _pair_group_counts

    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b", "hamming"])
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = (
        _pair_group_counts(ds, val="hamming")
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["doc_a", "doc_b"])
        .agg(n_shared=("hamming", "size"), hamming=("hamming", "min"))
        .reset_index()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["doc_a", "doc_b", "n_shared", "hamming"]].astype("int64"),
        want[["doc_a", "doc_b", "n_shared", "hamming"]].astype("int64"),
    )


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(alphabet="pqr", min_size=1, max_size=3), st.integers(0, 100)),
        min_size=1, max_size=100,
    )
)
def test_min_id_per_key_matches_pandas(ray_session, rows):
    """The bucketed keyed-min sweep equals pandas groupby(key).min(id)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from gcflow.ops.dedup import min_id_per_key

    df = pd.DataFrame(rows, columns=["h", "doc_id"])
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = sorted(min_id_per_key(ds, key="h").to_pandas().doc_id)
    want = sorted(df.groupby("h").doc_id.min())
    assert got == want
