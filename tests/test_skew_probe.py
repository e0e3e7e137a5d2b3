"""Skew probe + auto dispatch: a hot conversation is detected from a
sample and routes to the salted path."""

import pyarrow as pa

from gcflow import pipeline as pl
from gcflow import transcripts as tr


def _skewed_table(hot_turns: int, n_cold: int = 50) -> pa.Table:
    rows = {k: [] for k in tr.TRANSCRIPT_SCHEMA.names}

    def add(cid, n):
        rows["conv_id"].extend([cid] * n)
        rows["turn_idx"].extend(range(n))
        rows["role"].extend(["user"] * n)
        rows["text"].extend(
            f"{i}.000: [GC {1000+i}K->{500+i}K(4000K), 0.001000 secs]" for i in range(n)
        )
        rows["tool"].extend(["jvm"] * n)
        rows["ts"].extend(range(n))

    add("hot", hot_turns)
    for c in range(n_cold):
        add(f"cold{c}", 20)
    return pa.Table.from_pydict(rows, schema=tr.TRANSCRIPT_SCHEMA)


def test_probe_detects_hot_conversation(ray_session):
    import ray.data as rd

    t = _skewed_table(hot_turns=20_000)
    est = pl.probe_skew(rd.from_arrow(t), sample_fraction=0.05)
    assert est["est_hot_conv"] == "hot"
    assert est["est_max_conv_turns"] > 10_000


def test_auto_dispatch_equivalence(ray_session):
    import pandas as pd
    import ray.data as rd

    t = _skewed_table(hot_turns=5_000)
    # low threshold forces the salted route; result must equal the plain path
    a = pl.parse_events(rd.from_arrow(t), enrich=False).to_pandas()
    b = pl.parse_events_auto(
        rd.from_arrow(t), enrich=False, salt_threshold=1_000, salt_turns=512
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    na = a.drop(columns=["generations", "regions"]).sort_values(key).reset_index(drop=True)
    nb = b.drop(columns=["generations", "regions"]).sort_values(key).reset_index(drop=True)
    assert len(na) == len(nb) == 5_000 + 50 * 20
    pd.testing.assert_frame_equal(na, nb, check_dtype=False)
