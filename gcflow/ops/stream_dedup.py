"""Streaming exact dedup against a SHARED MUTABLE INDEX — the one op
family in this repo that genuinely cannot be a Dataset transform: "have I
seen this content before, across every batch processed so far?" needs
state that every parallel task reads AND writes, so it drops to raw Ray
actors by design (the sanctioned escape hatch; everything around the
index stays a normal ``map_batches`` stage).

Shape:
- ``DedupShard`` actors hold disjoint hash-space partitions of the seen
  set.  ``check_and_add`` is atomic per shard (actors are
  single-threaded), so for any distinct text EXACTLY ONE caller ever
  wins it — parallel feeds stay a valid dedup (one representative per
  distinct content), and an in-order feed degenerates to first-wins.
- The map stage hashes content vectorized (seeded 64-bit polars/ahash),
  partitions hashes by shard, and makes ONE actor call per shard per
  batch — traffic is hashes only, never text.
- Scale: shard count spreads both memory and call load across nodes
  (each shard ≈ distinct_count/S × ~80 B as a Python set).  At 10^10+
  distinct docs swap the in-memory set for sorted-run spill files inside
  the actor; the protocol does not change.

The aggregate result (kept/dropped counts) has an exact SQL oracle; the
id-level invariants (one winner per distinct text; in-order feed ==
batch exact dedup) are pytest-asserted because the parallel winner is
arrival-order dependent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .hashing import word_hashes as _word_hashes  # seeded, process-stable

STREAM_DEDUP_SHARDS = 8


@ray.remote
class DedupShard:
    """One hash-space partition of the seen-content index."""

    def __init__(self):
        self.seen = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """True where the hash is NEW; marks them seen.  Atomic per
        shard: concurrent callers serialize here, so each hash has
        exactly one winner."""
        out = np.empty(len(hashes), dtype=bool)
        seen = self.seen
        for i, h in enumerate(hashes.tolist()):
            if h in seen:
                out[i] = False
            else:
                seen.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self.seen)


class StreamDedupStage:
    """map_batches stage: vectorized content hash → one ``check_and_add``
    round-trip per shard per batch → keep-mask filter."""

    def __init__(self, shard_handles):
        self.shards = shard_handles

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        text = t["text"]
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        h = _word_hashes(text)
        shard = (h % np.uint64(len(self.shards))).astype(np.int64)
        keep = np.zeros(len(t), dtype=bool)
        pending = []
        for s in np.unique(shard):
            m = shard == s
            pending.append((m, self.shards[s].check_and_add.remote(h[m])))
        for m, ref in pending:
            keep[m] = ray.get(ref)
        return pa.table({"doc_id": pc.cast(t.filter(pa.array(keep))["doc_id"], pa.int64())})


def stream_dedup_kept(ds, num_shards: int = STREAM_DEDUP_SHARDS):
    """Run ``ds`` (doc_id, text) through the shared index; returns the
    kept doc_ids as a materialized Arrow table and tears the index down."""
    shards = [DedupShard.remote() for _ in range(num_shards)]
    try:
        kept = (
            ds.map_batches(
                StreamDedupStage,
                fn_constructor_args=[shards],
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
            .materialize()
            .to_arrow_refs()
        )
        tables = [ray.get(r) for r in kept]
        out = pa.concat_tables(
            [tb for tb in tables if tb.num_rows] or
            [pa.schema([("doc_id", pa.int64())]).empty_table()]
        )
        return out.combine_chunks()
    finally:
        for a in shards:
            ray.kill(a)


def q_doc_stream_dedup(sf_dir: str):
    """Streaming-dedup aggregate over the planted corpus: how many docs
    the shared index keeps vs drops.  Counts are deterministic (exactly
    one winner per distinct text) even though WHICH duplicate wins is
    arrival-order dependent — so the counts carry the SQL oracle and the
    id-level invariants live in pytest."""
    from .dedup import corpus_ds

    kept = stream_dedup_kept(corpus_ds(sf_dir))
    total = corpus_ds(sf_dir).count()
    return pa.table(
        {
            "n_kept": pa.array([kept.num_rows], type=pa.int64()),
            "n_dropped": pa.array([total - kept.num_rows], type=pa.int64()),
        }
    )


STREAM_DEDUP_QUERIES = {
    "doc_stream_dedup": q_doc_stream_dedup,
}

STREAM_DEDUP_ORACLES = {
    # CORPUS_SQL is dedup.py's planted-duplicates CTE
    "doc_stream_dedup": None,  # filled below (needs the import)
}

from .dedup import CORPUS_SQL as _CORPUS_SQL  # noqa: E402

STREAM_DEDUP_ORACLES["doc_stream_dedup"] = f"""
WITH {_CORPUS_SQL.split('WITH', 1)[-1]}
SELECT CAST(count(DISTINCT text) AS BIGINT) AS n_kept,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dropped
FROM corpus
"""
