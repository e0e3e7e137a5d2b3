"""Multi-line event stitching + rate scan — the shuffle-shaped transform.

Re-expresses the reference's whole-log / incremental assembly semantics
(Parser.scala:75,99-151 — see SURVEY.md §2.3) as a per-conversation group
function run under ``ds.groupby("conv_id").map_groups(...)``:

* all turns of one conv_id arrive in one call (hash-partitioned shuffle),
* rows are ordered by ``turn_idx`` (≙ physical line order in a GC log),
* the joined text is scanned by the same tolerant grammar the reference
  uses (``(GcLine | IgnoredLine).rep`` or the heap-stats alternation),
* the rate scan (RateCalculator.scala:5-43) runs inside the same group —
  rate state is conversation-scoped, exactly like the reference's
  per-input-file RateCalculator (Main.scala:27 constructs a fresh one per
  file; one file ≙ one conversation).

A conversation whose text crashes the grammar (where the reference would
throw, e.g. a basic event with no bare heap delta) is routed to the
``error`` sink as a single diagnostic row instead of failing the job.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np
import pyarrow as pa

from . import events as ev
from . import grammar
from .schema import EVENT_SCHEMA, rated_events_to_table

MODE_BASIC = "basic"       # ≙ Parser.parseLog
MODE_HEAP_STATS = "heap"   # ≙ Parser.parseWithHeapStats


def stitch_group(group: pa.Table, mode: str = MODE_BASIC) -> pa.Table:
    """Group function: one conversation's turns → its event rows."""
    # sort by turn ordering key (order is per-conversation only — never
    # global; this is what lets the outer shuffle scale, SURVEY.md §4)
    order = np.argsort(group["turn_idx"].to_numpy(zero_copy_only=False), kind="stable")
    turn_idx = group["turn_idx"].to_numpy(zero_copy_only=False)[order]
    texts = group["text"].to_pylist()
    texts = [texts[i] for i in order]
    roles = group["role"].to_pylist()
    roles = [roles[i] for i in order]
    tools = group["tool"].to_pylist()
    tools = [tools[i] for i in order]
    conv_id = group["conv_id"][0].as_py()

    # line-offset index: map event start offsets back to starting turns
    text = "\n".join(texts) + "\n"
    offsets = [0]
    acc = 0
    for t in texts:
        acc += len(t) + 1
        offsets.append(acc)

    try:
        if mode == MODE_HEAP_STATS:
            spans = grammar.parse_with_heap_stats_spans(text)
        else:
            spans = grammar.parse_log_spans(text)
    except grammar.GrammarCrash as e:
        return _error_row(conv_id, int(turn_idx[0]), str(e))

    events = [s[0] for s in spans]
    line_of = [bisect_right(offsets, s[1]) - 1 for s in spans]
    rated = ev.rate_scan(events)
    return rated_events_to_table(
        conv_id,
        rated,
        [int(turn_idx[i]) for i in line_of],
        [roles[i] for i in line_of],
        [tools[i] for i in line_of],
    )


def _error_row(conv_id: str, turn_idx: int, message: str) -> pa.Table:
    cols = {name: [None] for name in EVENT_SCHEMA.names}
    cols["conv_id"] = [conv_id]
    cols["event_seq"] = [0]
    cols["turn_idx"] = [turn_idx]
    cols["sink"] = ["error"]
    cols["event_type"] = ["ParseError"]
    cols["gc_cause"] = [message[:200]]
    arrays = [pa.array(cols[f.name], type=f.type) for f in EVENT_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)
