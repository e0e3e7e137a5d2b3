"""Streaming-actor ingest: incremental protocol parity with batch parse."""

from conftest import fixture_text

from gcflow.events import rate_scan
from gcflow.grammar import parse_log
from gcflow.streaming import StreamingSession


def test_streaming_session_matches_batch():
    """Feeding a log line-by-line through the incremental protocol yields
    the same events (count + types + rates) as whole-log parseLog — the
    reference's batch/incremental agreement (ParserTest.scala:527-556)."""
    for fixture in ["basic-java8-gc.log", "fragment-with-wait-times.txt", "fragment.txt"]:
        text = fixture_text(fixture)
        s = StreamingSession()
        for line in text.split("\n"):
            s.feed(line)
        batch = parse_log(text)
        assert [e.gc_type for e in s.events] == [e.gc_type for e in batch], fixture
        sr = rate_scan(s.events)
        br = rate_scan(batch)
        assert [e.bytes_allocated_since_last_event for e in sr] == [
            e.bytes_allocated_since_last_event for e in br
        ], fixture


def test_streaming_actor_shard(ray_session):
    import ray

    from gcflow.streaming import StreamingParser

    actor = StreamingParser.remote()
    text = fixture_text("basic-java7-gc.log")
    lines = [l for l in text.split("\n") if l]
    ray.get(actor.feed_batch.remote(["c1"] * len(lines), lines))
    ray.get(actor.feed_batch.remote(["c2"] * len(lines), lines))
    out = ray.get(actor.finish.remote())
    assert len(out["c1"]) == 7 and len(out["c2"]) == 7
    assert out["c1"][0] == ("GC", 66048 * 1024, 263)
