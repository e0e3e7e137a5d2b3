"""Ray Data pipeline assembly: read → classify/prefilter → stitch shuffle →
enrich → route → sinks + aggregates (SURVEY.md §3.4).

Stages:

1. ``read_parquet`` with column pruning (only the 6 transcript columns).
2. **Prefilter** (stateless ``map_batches``, zero-copy Arrow): vectorized
   line classification dropping rows no grammar rule can consume — the
   analogue of the reference's ``IgnoredLine`` absorption (Parser.scala:22,
   75), applied *before* the shuffle so junk never crosses the wire.
   Dropped-row counts are preserved via the ``turns_in``/``turns_kept``
   metrics of :func:`run_pipeline` (no silent caps).
3. **Stitch** — the one true shuffle: ``groupby(conv_id).map_groups`` over
   zero-copy Arrow groups (gcflow/stitch.py), ordering by ``turn_idx``
   inside each group only.
4. **Enrich** — actor-pool ``map_batches`` (gcflow/enrich.py): role/tool
   dictionary lookups, dictionaries loaded once per actor.
5. **Route/sinks** — single-pass fan-out ``write_parquet(partition_cols=
   ["sink"])`` + streaming per-sink aggregate counts with in-batch partial
   aggregation before the tiny final groupby.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .stitch import MODE_BASIC, MODE_HEAP_STATS, stitch_group

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# First characters that can begin a line participating in any event, per
# grammar rule (digits → GcLine/AppStopped; '{','}' → heap blocks; ' ' →
# indented heap/generation lines; '[' → generation continuation; ':' →
# ParNew continuation; '-' → tenuring table rows).
_KEEP_FIRST = "0123456789{}[:- "
# Non-indented letter-initial lines that still matter: "Desired survivor"
# tenuring headers, "Heap before/after" block headers, and region stat
# lines like "Metaspace   used 12441K, ..." (Space = zero-or-more in the
# reference grammar, Parser.scala:77,91).
_KEEP_RE = r"^(?:Desired survivor size |Heap |[A-Za-z][A-Za-z\- ]*?(?:total|used) )"


def prefilter_mask(text: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    first = pc.utf8_slice_codeunits(text, 0, 1)
    keep = pc.is_in(first, value_set=pa.array(list(_KEEP_FIRST)))
    keep = pc.or_(keep, pc.match_substring_regex(text, _KEEP_RE))
    return keep


def _prefilter_batch(batch: pa.Table) -> pa.Table:
    return batch.filter(prefilter_mask(batch["text"]))


def read_transcripts(path, override_num_blocks: Optional[int] = None) -> rd.Dataset:
    return rd.read_parquet(
        path, columns=TRANSCRIPT_COLUMNS, override_num_blocks=override_num_blocks
    )


def parse_events(
    ds: rd.Dataset,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
) -> rd.Dataset:
    """transcripts Dataset → wide event-row Dataset (lazy)."""
    if prefilter:
        ds = ds.map_batches(_prefilter_batch, batch_format="pyarrow", zero_copy_batch=True)
    events = ds.groupby("conv_id").map_groups(
        lambda g: stitch_group(g, mode), batch_format="pyarrow"
    )
    if enrich:
        from .enrich import EnrichStage

        events = events.map_batches(
            EnrichStage,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    return events


def sink_counts(events: rd.Dataset) -> "pa.Table":
    """Streaming per-sink aggregate counts: partial per-batch combine
    (pyarrow group_by inside map_batches) before the small shuffle —
    ≙ the reference tests' per-type ``events.size`` assertions."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["sink", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["sink", "event_type", "n_partial"])

    partials = events.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["sink", "event_type"]).sum("n_partial")
    t = pa.Table.from_pandas(out.to_pandas())
    return t.rename_columns(["sink", "event_type", "n"]).sort_by(
        [("sink", "ascending"), ("event_type", "ascending")]
    )


def run_pipeline(
    transcripts_path: str,
    out_dir: Optional[str] = None,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
) -> dict:
    """Full parse→enrich→route→aggregate job; returns metrics.

    Output layout: ``out_dir/sink=<name>/*.parquet`` (single-pass fan-out
    via hive partitioning) — per-event-type Parquet sinks (SURVEY.md S6
    mapping)."""
    ds = read_transcripts(transcripts_path)
    events = parse_events(ds, mode=mode, prefilter=prefilter, enrich=enrich)
    if out_dir is not None:
        events.write_parquet(out_dir, partition_cols=["sink"])
        events = rd.read_parquet(out_dir)
    counts = sink_counts(events)
    return {
        "sink_counts": counts,
        "events_total": int(pc.sum(counts["n"]).as_py() or 0),
    }
