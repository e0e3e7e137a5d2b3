"""Multi-line event stitching + rate scan — the shuffle-shaped transform.

Re-expresses the reference's whole-log / incremental assembly semantics
(Parser.scala:75,99-151 — see SURVEY.md §2.3) over an **explicit hash
partition on conv_id**: the pipeline adds ``bucket = hash64(conv_id) % NB``
and runs ``groupby("bucket").map_groups(stitch_bucket)`` — one call per
bucket sweeps *thousands* of conversations with amortized per-conversation
overhead (a per-conversation ``map_groups`` pays ~1ms of per-group
machinery per conv, which dominated wall time at 10^5+ conversations).

Within a bucket:
* rows are sorted by (conv_id, turn_idx) — order is per-conversation only,
* each conversation's joined text is scanned by the same tolerant grammar
  the reference uses (``(GcLine | IgnoredLine).rep`` or the heap-stats
  alternation),
* the rate scan (RateCalculator.scala:5-43) runs per conversation — rate
  state is conversation-scoped, exactly like the reference's per-input-file
  RateCalculator (Main.scala:27; one log file ≙ one conversation).

A conversation whose text crashes the grammar (where the reference would
throw, e.g. a basic event with no bare heap delta) is routed to the
``error`` sink as a single diagnostic row instead of failing the job.

Skew note: a single enormous conversation still lands in one bucket; the
mitigation is salting at event boundaries (split only at rows that start a
new top-level unit), planned behind a size probe — bucket processing is
already bounded by the largest conversation, not the bucket count.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np
import pandas as pd
import pyarrow as pa

from . import events as ev
from . import grammar
from .schema import EventColumns

MODE_BASIC = "basic"       # ≙ Parser.parseLog
MODE_HEAP_STATS = "heap"   # ≙ Parser.parseWithHeapStats

DEFAULT_NUM_BUCKETS = 256


def hash_buckets(conv_ids, num_buckets: int) -> np.ndarray:
    """Deterministic 64-bit string hash → bucket (vectorized, stable
    across processes — pandas hash_array uses a fixed siphash key)."""
    h = pd.util.hash_array(np.asarray(conv_ids, dtype=object))
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _stitch_one(
    cols: EventColumns,
    conv_id: str,
    texts: list,
    turn_idx: np.ndarray,
    roles: list,
    tools: list,
    mode: str,
) -> None:
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
        cols.append_error(conv_id, int(turn_idx[0]), str(e))
        return
    rated = ev.rate_scan([s[0] for s in spans])
    for i, (ewr, (_, pos)) in enumerate(zip(rated, spans)):
        line = bisect_right(offsets, pos) - 1
        cols.append_event(
            conv_id, i, int(turn_idx[line]), roles[line], tools[line], ewr
        )


def stitch_bucket(group: pa.Table, mode: str = MODE_BASIC) -> pa.Table:
    """Bucket group function: all turns of `hash(conv)%NB == b` →
    event rows for every conversation in the bucket."""
    df = pd.DataFrame(
        {
            "conv_id": group["conv_id"].to_pylist(),
            "turn_idx": group["turn_idx"].to_numpy(zero_copy_only=False),
            "text": group["text"].to_pylist(),
            "role": group["role"].to_pylist(),
            "tool": group["tool"].to_pylist(),
        }
    ).sort_values(["conv_id", "turn_idx"], kind="stable")

    conv = df["conv_id"].to_numpy()
    turn = df["turn_idx"].to_numpy()
    texts = df["text"].to_list()
    roles = df["role"].to_list()
    tools = df["tool"].to_list()

    # conversation segment boundaries
    bounds = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(conv)]))

    cols = EventColumns()
    for s, e in zip(starts, ends):
        _stitch_one(
            cols, conv[s], texts[s:e], turn[s:e], roles[s:e], tools[s:e], mode
        )
    return cols.to_table()


def stitch_group(group: pa.Table, mode: str = MODE_BASIC) -> pa.Table:
    """Single-conversation variant (kept for tests / small inputs)."""
    return stitch_bucket(group, mode)
