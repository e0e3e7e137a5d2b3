"""Streaming ingest: the reference's incremental parse protocol
(Parser.scala:134-151, SURVEY.md §3.3) as a stateful Ray actor.

The reference's caller holds a growing line buffer and feeds
``incrementalParse`` line by line; here that state lives in a
``StreamingParser`` actor — one actor per conversation shard (key-hash
bucket), fed batches in turn order.  Ray Data remains the batch engine;
this is the drop-to-actors escape hatch for genuinely incremental
sources (SURVEY.md §2.7 / the guide's streaming-shaped-workloads note).
"""

from __future__ import annotations

import ray

from . import grammar
from .events import rate_scan


class StreamingSession:
    """Per-conversation incremental state: line buffer + rate lookback
    (plain object — composable inside any actor)."""

    def __init__(self):
        self.buffer: list = []
        self.events: list = []

    def feed(self, line: str) -> list:
        """Feed one physical line; returns events completed by it
        (incremental protocol: skip / accumulate / parsed)."""
        self.buffer.append(line)
        out = []
        while self.buffer:
            r = grammar.incremental_parse("\n".join(self.buffer))
            if r == grammar.SKIP_LINE:
                self.buffer.pop(0)
                continue
            if r == grammar.NEED_ANOTHER_LINE:
                break
            out.append(r)
            self.buffer.clear()
        self.events.extend(out)
        return out


@ray.remote
class StreamingParser:
    """One shard's streaming parser: routes lines to per-conversation
    sessions; ``finish()`` returns the rate-scanned event stream per
    conversation (RateCalculator semantics, conversation-scoped)."""

    def __init__(self):
        self.sessions: dict = {}

    def feed(self, conv_id: str, line: str) -> int:
        s = self.sessions.setdefault(conv_id, StreamingSession())
        return len(s.feed(line))

    def feed_batch(self, conv_ids: list, lines: list) -> int:
        n = 0
        for c, l in zip(conv_ids, lines):
            n += self.feed(c, l)
        return n

    def finish(self) -> dict:
        return {
            conv: [
                (e.base.gc_type, e.bytes_allocated_since_last_event, e.millis_since_last_event)
                for e in rate_scan(s.events)
            ]
            for conv, s in self.sessions.items()
        }
