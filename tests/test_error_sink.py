"""Error-sink routing: a conversation whose text would crash the
reference grammar (collectFirst{...}.get / zip MatchError) becomes one
diagnostic row instead of failing the job."""

import pyarrow as pa
import pytest

from gcflow import pipeline as pl
from gcflow import transcripts as tr
from gcflow.grammar import GrammarCrash, parse_log


def test_grammar_crash_raises():
    # basic event with generations but NO bare heap delta → the reference
    # throws (Parser.scala:38 .get); our grammar raises GrammarCrash
    with pytest.raises(GrammarCrash):
        parse_log("0.5: [GC [PSYoungGen: 1K->1K(2K)], 0.1 secs]\n")


def test_crash_routed_to_error_sink(ray_session):
    import ray.data as rd

    rows = {
        "conv_id": ["bad", "bad", "good"],
        "turn_idx": [0, 1, 0],
        "role": ["user"] * 3,
        "text": [
            "0.5: [GC [PSYoungGen: 1K->1K(2K)], 0.1 secs]",
            "0.7: [GC 2K->1K(4K), 0.1 secs]",
            "0.9: [GC 2K->1K(4K), 0.1 secs]",
        ],
        "tool": ["jvm"] * 3,
        "ts": [1, 2, 3],
    }
    t = pa.Table.from_pydict(rows, schema=tr.TRANSCRIPT_SCHEMA)
    df = pl.parse_events(rd.from_arrow(t), enrich=False).to_pandas()
    bad = df[df.conv_id == "bad"]
    good = df[df.conv_id == "good"]
    assert list(bad["sink"]) == ["error"]
    assert list(bad["event_type"]) == ["ParseError"]
    # the healthy conversation still parses
    assert list(good["sink"]) == ["basic"]
