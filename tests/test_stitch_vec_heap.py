"""Vectorized heap-stats stitcher ≡ the pure-python reference path,
including region-delta lists, crash granularity, and edge block shapes."""

import pandas as pd
import pyarrow as pa

from gcflow import sinks
from gcflow import transcripts as tr
from gcflow.stitch import stitch_bucket_py
from gcflow.stitch_vec_heap import stitch_bucket_vec_heap


def _flat(table: pa.Table) -> pa.Table:
    return table.select(["conv_id", "turn_idx", "role", "text", "tool"])


def _compare(flat: pa.Table):
    a = stitch_bucket_py(flat, "heap")
    b = stitch_bucket_vec_heap(flat)
    da = a.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    db = b.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(da) == len(db), (len(da), len(db))
    simple = [c for c in da.columns if c not in ("generations", "regions")]
    pd.testing.assert_frame_equal(da[simple], db[simple], check_dtype=False)
    # nested + export-level equality (region deltas incl. subspaces/order)
    for ra, rb in zip(da.to_dict("records"), db.to_dict("records")):
        assert sinks.arrow_export_seq(ra) == sinks.arrow_export_seq(rb)
    return da


def test_heap_vec_equals_python_fixtures():
    """All reference fixture logs (java7/java8 heap logs incl. Metaspace
    blocks → descent; fragment corpora → fast path)."""
    da = _compare(_flat(tr.fixture_transcripts()))
    # the bench-shaped fragment conv produced fast detailed rows
    frag = da[da.conv_id == "fragment"]
    assert (frag["sink"] == "detailed").sum() == 2


def test_heap_vec_bench_corpus():
    """The heap bench corpus (fragment.txt replicated) is the fast-path
    target — vec ≡ py on a multi-conversation slice."""
    _compare(_flat(tr.heap_transcripts(n_convs=7, reps=2)))


_BLOCK = [
    "{Heap before GC invocations=1 (full 0):",
    " PSYoungGen      total 100K, used 90K [0x0,0x1,0x2)",
    "  eden space 80K, 100% used [0x0,0x1,0x1)",
    "  from space 10K, 50% used [0x1,0x1,0x2)",
    " ParOldGen       total 200K, used 150K [0x2,0x3,0x4)",
    "  object space 200K, 75% used [0x2,0x3,0x4)",
    "1.5: [GC (Allocation Failure) [PSYoungGen: 90K->10K(100K)] 240K->160K(300K), 0.0100000 secs] [Times: user=0.1 sys=0.0, real=0.1 secs]",
    "Heap after GC invocations=1 (full 0):",
    " PSYoungGen      total 100K, used 10K [0x0,0x1,0x2)",
    "  eden space 80K, 0% used [0x0,0x0,0x1)",
    "  from space 10K, 100% used [0x1,0x2,0x2)",
    " ParOldGen       total 200K, used 150K [0x2,0x3,0x4)",
    "  object space 200K, 75% used [0x2,0x3,0x4)",
    "}",
]


def _mk(texts, conv="c"):
    n = len(texts)
    return pa.table(
        {
            "conv_id": [conv] * n,
            "turn_idx": list(range(n)),
            "role": ["user"] * n,
            "text": list(texts),
            "tool": ["jvm"] * n,
        }
    )


def test_heap_vec_edge_shapes():
    """Fast blocks, junk interleave, tenuring interiors, app-stopped
    lines, truncated blocks (descent) — all agree with python."""
    texts = (
        ["junk line", "2.0: Total time for which application threads were"
         " stopped: 0.5000000 seconds, Stopping threads took: 0.0010000 seconds"]
        + _BLOCK
        + [
            # tenuring interior block
            "{Heap before GC invocations=2 (full 0):",
            " PSYoungGen      total 100K, used 90K [0x0,0x1,0x2)",
            "3.0: [GC",
            "Desired survivor size 100 bytes, new threshold 3 (max 15)",
            " [PSYoungGen: 90K->10K(100K)] 240K->160K(300K), 0.0200000 secs]",
            "Heap after GC invocations=2 (full 0):",
            " PSYoungGen      total 100K, used 10K [0x0,0x1,0x2)",
            "}",
            # truncated block (no close) → descent → no event
            "{Heap before GC invocations=3 (full 1):",
            " PSYoungGen      total 100K, used 90K [0x0,0x1,0x2)",
            "Total time for which application threads were stopped: 0.1 seconds",
        ]
    )
    _compare(_mk(texts))


def test_heap_vec_region_mismatch_crashes_conversation():
    """Zipping mismatched region names is a MatchError in the reference
    (Parser.scala:104-110) → ONE error row for the conversation, even when
    other blocks in it are valid."""
    bad_block = list(_BLOCK)
    bad_block[8] = " OtherGen       total 100K, used 10K [0x0,0x1,0x2)"
    texts = _BLOCK + bad_block
    da = _compare(_mk(texts))
    assert (da["sink"] == "error").sum() == 1
    assert len(da) == 1  # crash granularity: whole conversation → one row


def test_heap_vec_region_mismatch_rolls_back_right_conversation():
    """Multi-conversation bucket: only the conversation OWNING the
    mismatched block crashes; the neighbour's valid blocks stay fast.
    Regression for block-ordinal vs line-index rollback (codes must be
    indexed via the block's open line, not the block ordinal)."""
    bad_block = list(_BLOCK)
    bad_block[8] = " OtherGen       total 100K, used 10K [0x0,0x1,0x2)"
    ta = _mk(_BLOCK, conv="a")
    tb = _mk(_BLOCK + bad_block, conv="b")
    da = _compare(pa.concat_tables([ta, tb]))
    a_rows = da[da.conv_id == "a"]
    b_rows = da[da.conv_id == "b"]
    # a is untouched: its good block emits one detailed event, no errors
    assert (a_rows["sink"] == "detailed").sum() == 1
    assert (a_rows["sink"] == "error").sum() == 0
    # b crashes whole-conversation: exactly one error row, nothing else
    assert (b_rows["sink"] == "error").sum() == 1
    assert len(b_rows) == 1


def test_heap_vec_many_subspaces_no_ordinal_overflow():
    """A region with ≥4096 subspace rows followed by ANOTHER region: a
    12-bit sub-ordinal would overflow into the region-ordinal bits, so
    sub #4096's key collides with the next region row's key and the
    sorted-merge zip mis-pairs rows. The colliding rows share the name
    'eden' so the mis-pair is a silent wrong delta, not a name-mismatch
    crash (which would mask the bug by rolling back to python)."""
    n_sub = 4096
    subs_b = [f"  eden space {80 + i}K, 100% used [0x0,0x1,0x1)" for i in range(n_sub)]
    subs_a = [f"  eden space {80 + i}K, 0% used [0x0,0x0,0x1)" for i in range(n_sub)]
    # every row named "eden" so a mis-pair can't hide behind the
    # name-mismatch crash/rollback path
    reg1_b = " eden            total 100K, used 90K [0x0,0x1,0x2)"
    reg1_a = " eden            total 100K, used 10K [0x0,0x1,0x2)"
    reg2 = " eden            total 200K, used 150K [0x2,0x3,0x4)"
    texts = (
        [_BLOCK[0], reg1_b]
        + subs_b
        + [reg2, _BLOCK[6], _BLOCK[7], reg1_a]
        + subs_a
        + [reg2, "}"]
    )
    da = _compare(_mk(texts))
    assert (da["sink"] == "detailed").sum() == 1
    assert (da["sink"] == "error").sum() == 0
    regions = da[da["sink"] == "detailed"].iloc[0]["regions"]
    assert len(regions) == 2 + n_sub  # 2 region rows + every paired subspace


def test_heap_vec_chunked_build_deltas(monkeypatch):
    """Shrinking the blk key field forces the chunked build_deltas path;
    results must be identical to the single-call path."""
    from gcflow import stitch_vec_heap as svh

    texts = []
    for i in range(5):
        blk = list(_BLOCK)
        blk[6] = blk[6].replace("1.5:", f"{i + 1}.5:")
        texts += blk
    flat = _mk(texts)
    expected = stitch_bucket_vec_heap(flat)
    monkeypatch.setattr(svh, "MAX_ZIP_BLOCKS", 2)
    chunked = stitch_bucket_vec_heap(flat)
    assert expected.sort_by("turn_idx").equals(chunked.sort_by("turn_idx"))
    _compare(flat)  # and both agree with the python reference path


def test_heap_vec_metaspace_block_descends_correctly():
    """Blocks with Metaspace stats aren't fast-shaped — the descent must
    still produce the exact reference event."""
    texts = [
        "{Heap before GC invocations=1 (full 0):",
        " PSYoungGen      total 100K, used 90K [0x0,0x1,0x2)",
        " Metaspace       used 4078K, capacity 5688K, committed 5760K, reserved 1056768K",
        "  class space    used 511K, capacity 616K, committed 640K, reserved 1048576K",
        "1.5: [GC (Allocation Failure) [PSYoungGen: 90K->10K(100K)] 240K->160K(300K), 0.0100000 secs]",
        "Heap after GC invocations=1 (full 0):",
        " PSYoungGen      total 100K, used 10K [0x0,0x1,0x2)",
        " Metaspace       used 4078K, capacity 5688K, committed 5760K, reserved 1056768K",
        "  class space    used 511K, capacity 616K, committed 640K, reserved 1048576K",
        "}",
    ]
    da = _compare(_mk(texts))
    assert (da["sink"] == "detailed").sum() == 1
