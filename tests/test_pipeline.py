"""End-to-end Ray Data pipeline tests over the fixture transcripts +
transcripts-generator SQL-mirror parity."""

import duckdb
import pyarrow as pa
import pytest

from gcflow import pipeline as pl
from gcflow import transcripts as tr
from gcflow.stitch import MODE_BASIC, MODE_HEAP_STATS


@pytest.fixture(scope="module")
def fixture_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(tr.fixture_transcripts())


def _counts(events_ds):
    df = events_ds.to_pandas()
    return df


def test_basic_mode_fixture_counts(fixture_ds):
    """Per-conversation event counts == reference parseLog assertions
    (BASELINE.md correctness table)."""
    events = pl.parse_events(fixture_ds, mode=MODE_BASIC)
    df = events.to_pandas()
    by_conv = df.groupby("conv_id").size().to_dict()
    assert by_conv["basic-java7"] == 7
    assert by_conv["basic-java8"] == 7
    assert by_conv["details-java7"] == 7
    assert by_conv["details-java8"] == 7
    assert by_conv["heap-java7"] == 7
    assert by_conv["heap-java8"] == 7
    assert by_conv["fragment"] == 2
    assert by_conv["fragment-with-wait-times"] == 16
    # routed-sink split for the wait-times conv: 15 app_stopped + 1 basic
    fw = df[df.conv_id == "fragment-with-wait-times"]
    assert (fw["sink"] == "app_stopped").sum() == 15
    assert (fw["sink"] == "basic").sum() == 1
    # enrichment is present and dictionary-driven
    assert set(df["role_class"]) <= {"human", "model", "system", "other"}


def test_heap_stats_mode_fixture_counts(fixture_ds):
    events = pl.parse_events(fixture_ds, mode=MODE_HEAP_STATS)
    df = events.to_pandas()
    by = df.groupby(["conv_id", "sink"]).size().to_dict()
    assert by[("fragment", "detailed")] == 2
    assert by[("cms-fragment", "detailed")] == 1
    assert by[("fragment-with-wait-times", "detailed")] == 1
    assert by[("fragment-with-wait-times", "app_stopped")] == 15


def test_prefilter_equivalence(fixture_ds):
    """Dropping ignorable lines pre-shuffle must not change any event."""
    a = pl.parse_events(fixture_ds, mode=MODE_BASIC, prefilter=True, enrich=False).to_pandas()
    b = pl.parse_events(fixture_ds, mode=MODE_BASIC, prefilter=False, enrich=False).to_pandas()
    key = ["conv_id", "event_seq"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.drop(columns=["generations", "regions"]).equals(
        b.drop(columns=["generations", "regions"])
    )
    assert len(a) == len(b)


def test_rates_flow_through_pipeline(fixture_ds):
    events = pl.parse_events(fixture_ds, mode=MODE_BASIC, enrich=False)
    df = events.to_pandas()
    j7 = df[df.conv_id == "basic-java7"].sort_values("event_seq")
    assert j7.iloc[0]["allocated_bytes"] == 66048 * 1024
    assert j7.iloc[0]["interval_ms"] == 263
    assert j7.iloc[1]["alloc_rate"] == (125156 * 1024 - 59108 * 1024) // (341 - 263)


def test_sink_counts_aggregate(fixture_ds):
    events = pl.parse_events(fixture_ds, mode=MODE_BASIC, enrich=False)
    t = pl.sink_counts(events)
    d = {
        (s, e): n
        for s, e, n in zip(
            t["sink"].to_pylist(), t["event_type"].to_pylist(), t["n"].to_pylist()
        )
    }
    assert d[("app_stopped", "AppStopped")] == 15
    assert sum(n for (s, _), n in d.items() if s == "basic") > 0


def test_transcripts_sql_mirror(ray_session):
    """Python generator and the DuckDB SQL mirror produce identical tables."""
    sf = "/root/testdata/sf0.001"
    got = tr.transcripts_from_events(f"{sf}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(tr.TRANSCRIPTS_SQL).arrow()
    key = ["conv_id", "turn_idx"]
    got_df = got.to_pandas().sort_values(key).reset_index(drop=True)
    want_df = (
        want.to_pandas()
        .astype({"turn_idx": "int32"})
        .sort_values(key)
        .reset_index(drop=True)
    )[got_df.columns.tolist()]
    pa_got = pa.Table.from_pandas(got_df, schema=tr.TRANSCRIPT_SCHEMA, preserve_index=False)
    pa_want = pa.Table.from_pandas(want_df, schema=tr.TRANSCRIPT_SCHEMA, preserve_index=False)
    assert pa_got.equals(pa_want)


def test_events_pipeline_on_synthetic(ray_session):
    """Parse the events-derived corpus; analytic per-sink counts hold."""
    import ray.data as rd

    path = tr.materialize_transcripts("/root/testdata/sf0.001")
    ds = pl.read_transcripts(path)
    events = pl.parse_events(ds, mode=MODE_BASIC, enrich=False)
    df = events.to_pandas()
    # analytic expectation: events rows with t in 0..4 → basic, 5 → cms,
    # 6 → app_stopped, 7 → junk (dropped)
    import pyarrow.parquet as pq

    eid = pq.read_table(
        "/root/testdata/sf0.001/events.parquet", columns=["event_id"]
    )["event_id"].to_numpy()
    t = eid % 8
    assert (df["sink"] == "basic").sum() == int((t <= 4).sum())
    assert (df["sink"] == "cms").sum() == int((t == 5).sum())
    assert (df["sink"] == "app_stopped").sum() == int((t == 6).sum())
    assert len(df) == int((t != 7).sum())
    # the 3-turn tenuring template stitched into single events with
    # tenuring fields set
    t4 = df[df["tenuring_new_threshold"].notna()]
    assert len(t4) == int((t == 4).sum())
    assert (t4["tenuring_desired_bytes"] == 129368064).all()


@pytest.mark.parametrize("mode", [MODE_BASIC, MODE_HEAP_STATS])
def test_compressed_exchange_equivalent(ray_session, mode):
    """The lz4-compressed exchange (opt-in, the multi-node network-volume
    lever) must produce frame-identical events to the default path."""
    import pandas as pd
    import ray.data as rd

    from gcflow import transcripts as tr

    table = tr.fixture_transcripts()
    a = pl.parse_events(
        rd.from_arrow(table), mode=mode, enrich=False, compress_exchange=False
    ).to_pandas()
    b = pl.parse_events(
        rd.from_arrow(table), mode=mode, enrich=False, compress_exchange=True
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key, kind="stable").reset_index(drop=True)
    b = b.sort_values(key, kind="stable").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b)


def test_compressed_exchange_preserves_nulls(ray_session):
    """Null string columns must round-trip the lz4 exchange codec as
    nulls, not coerce to "" (repo generators never emit nulls, so the
    fixture-based equivalence test can't catch this)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    table = pa.table(
        {
            "conv_id": ["c1", "c1", "c2", "c2"],
            "turn_idx": [0, 1, 0, 1],
            "role": ["user", None, "user", "agent"],
            "text": [
                "1.5: [GC (Allocation Failure) [PSYoungGen: 90K->10K(100K)]"
                " 240K->160K(300K), 0.0100000 secs]"
                " [Times: user=0.1 sys=0.0, real=0.1 secs]",
                "junk",
                "junk",
                "2.0: Total time for which application threads were stopped:"
                " 0.5000000 seconds, Stopping threads took: 0.0010000 seconds",
            ],
            "tool": [None, "jvm", "jvm", None],
        }
    )
    a = pl.parse_events(
        rd.from_arrow(table), enrich=False, prefilter=False,
        compress_exchange=False,
    ).to_pandas()
    b = pl.parse_events(
        rd.from_arrow(table), enrich=False, prefilter=False,
        compress_exchange=True,
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = a.sort_values(key, kind="stable").reset_index(drop=True)
    b = b.sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_compressed_exchange_turn_idx_delta_roundtrip():
    """Delta-encoded turn_idx must rebuild exactly, including
    non-monotonic jumps at conversation boundaries within a bucket row."""
    import pyarrow as pa

    packed = pa.table(
        {
            "bucket": pa.array([0, 1], type=pa.int32()),
            "conv_id": [["a", "a", "b"], ["c"]],
            "turn_idx": [[5, 6, 0], [2_147_500_000]],  # > int32 value
            "role": [["u", "u", "u"], ["u"]],
            "text": [["x", "y", "z"], ["w"]],
            "tool": [["t", "t", "t"], ["t"]],
        }
    )
    z = pl._compress_packed_strcols(packed)
    got = pl._decompress_packed_turn_idx(z)
    assert got.to_pylist() == [5, 6, 0, 2_147_500_000]
    assert pl._decompress_packed_strcol(z, "conv_id").to_pylist() == [
        "a", "a", "b", "c",
    ]
