"""Vectorized basic-mode stitcher ≡ the pure-python reference path,
including nested generation lists and export-level equality."""

import pandas as pd
import pyarrow as pa

from gcflow import sinks
from gcflow import transcripts as tr
from gcflow.stitch import stitch_bucket_py
from gcflow.stitch_vec import stitch_bucket_vec


def _flat(table: pa.Table) -> pa.Table:
    return table.select(["conv_id", "turn_idx", "role", "text", "tool"])


def _compare(flat: pa.Table):
    a = stitch_bucket_py(flat, "basic")
    b = stitch_bucket_vec(flat)
    da = a.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    db = b.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(da) == len(db)
    simple = [c for c in da.columns if c not in ("generations", "regions")]
    pd.testing.assert_frame_equal(da[simple], db[simple], check_dtype=False)
    # nested + export-level equality (covers generations ordering/values)
    for ra, rb in zip(da.to_dict("records"), db.to_dict("records")):
        assert sinks.arrow_export_seq(ra) == sinks.arrow_export_seq(rb)


def test_vec_equals_python_fixtures():
    _compare(_flat(tr.fixture_transcripts()))


def test_vec_equals_python_synthetic():
    t = tr.transcripts_from_events("/root/testdata/sf0.001/events.parquet")
    _compare(_flat(t))


def test_vec_tenuring_triple_edge_shapes():
    """Three-line tenuring fast path: matched triples, broken triples
    (descent fallback), '- age' table rows, and conv-boundary splits all
    agree with the python reference."""
    texts = [
        # clean triple
        "1.0: [GC (Allocation Failure)",
        "Desired survivor size 100 bytes, new threshold 3 (max 15)",
        " [PSYoungGen: 900K->4K(1000K)] 1000K->500K(2000K), 0.01 secs] [Times: user=0.2 sys=0.0, real=0.1 secs]",
        # open + Desired followed by a complete single-line event (the
        # grammar fails the tenuring event and re-parses the last line)
        "2.0: [GC (Allocation Failure)",
        "Desired survivor size 100 bytes, new threshold 3 (max 15)",
        "3.0: [GC (Allocation Failure)  14K->7K(20K), 0.1 secs]",
        # open + Desired + '- age' rows then close (descent handles)
        "4.0: [GC (Allocation Failure)",
        "Desired survivor size 100 bytes, new threshold 5 (max 15)",
        "- age   1:  123 bytes,  456 total",
        " [DefNew: 900K->4K(1000K)] 1000K->500K(2000K), 0.01 secs]",
        # bare triple without generation on the close line
        "5.0: [Full GC (Ergonomics)",
        "Desired survivor size 200 bytes, new threshold 1 (max 4)",
        "1000K->500K(2000K), 0.02 secs]",
    ]
    rows = {
        "conv_id": ["c"] * len(texts),
        "turn_idx": list(range(len(texts))),
        "role": ["user"] * len(texts),
        "text": texts,
        "tool": ["jvm"] * len(texts),
    }
    _compare(pa.table(rows))
    # conversation boundary between open and Desired → no cross-conv triple
    rows2 = {
        "conv_id": ["a", "b", "b"],
        "turn_idx": [0, 0, 1],
        "role": ["user"] * 3,
        "text": [texts[0], texts[1], texts[2]],
        "tool": ["jvm"] * 3,
    }
    _compare(pa.table(rows2))


def test_vec_crash_granularity_is_per_conversation():
    """A GrammarCrash aborts the WHOLE conversation into one error row
    (reference semantics) even when other lines of the conversation were
    fast-path parseable; healthy conversations are untouched."""
    rows = {
        "conv_id": ["bad", "bad", "bad", "good"],
        "turn_idx": [0, 1, 2, 0],
        "role": ["user"] * 4,
        "text": [
            "0.3: [GC 2K->1K(4K), 0.1 secs]",  # fast line BEFORE the crash
            "0.5: [GC [PSYoungGen: 1K->1K(2K)], 0.1 secs]",  # crashes
            "0.7: [GC 2K->1K(4K), 0.1 secs]",  # fast line AFTER the crash
            "0.9: [GC 2K->1K(4K), 0.1 secs]",
        ],
        "tool": ["jvm"] * 4,
    }
    flat = pa.table(rows)
    _compare(flat)
    out = stitch_bucket_vec(flat).to_pandas()
    bad = out[out.conv_id == "bad"]
    assert list(bad["sink"]) == ["error"]
    assert bad["allocated_bytes"].isna().all()
    assert list(out[out.conv_id == "good"]["sink"]) == ["basic"]


def test_vec_handles_double_event_line_and_edge_shapes():
    rows = {
        "conv_id": ["c"] * 6,
        "turn_idx": list(range(6)),
        "role": ["user"] * 6,
        "text": [
            # two complete events on ONE line → rest-guard must reject the
            # fast path and the descent must emit both
            "1.0: [GC 10K->5K(20K), 0.1 secs]2.0: [GC 12K->6K(20K), 0.1 secs]",
            # CMS-prefixed cause → CMS branch, never fast-basic
            "3.0: [GC (CMS Final Remark) [YG occupancy: 1 K (2 K)] 5K(6K), 0.2 secs] [Times: user=0.1 sys=0.0, real=0.2 secs]",
            # promotion-failure double-dash form
            "4.0: [GC-- [PSYoungGen: 9K->9K(9K)] 10K->11K(12K), 0.3 secs]",
            # empty-parens cause (cause == "" is distinct from no cause)
            "5.0: [GC ()  14K->7K(20K), 0.1 secs]",
            # M-suffixed sizes
            "6.0: [GC 3M->1M(4M), 0.1 secs]",
            "junk",
        ],
        "tool": ["jvm"] * 6,
    }
    flat = pa.table(rows)
    _compare(flat)
    out = stitch_bucket_vec(flat).to_pandas().sort_values("turn_idx")
    assert len(out[out.turn_idx == 0]) == 2  # both events from the double line
    assert (out[out.turn_idx == 1]["sink"] == "cms").all()
    assert out[out.turn_idx == 4].iloc[0]["heap_before_bytes"] == 3 * 1024 * 1024
