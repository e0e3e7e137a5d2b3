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
3. **Stitch** — the one true shuffle, as an explicit hash partition:
   ``bucket = hash64(conv_id) % NB`` with list-packed exchange rows, then
   one ``map_groups`` sweep per bucket (gcflow/stitch.py); ordering by
   ``turn_idx`` inside conversations only.  Variants: ``parse_events_salted``
   (skew chunking) and ``parse_events_runlocal`` (shuffle-light for
   conversation-ordered input).
4. **Enrich** — actor-pool ``map_batches`` (gcflow/enrich.py): role/tool
   dictionary lookups, dictionaries loaded once per actor.
5. **Route/sinks** — fused fan-out ``SinkWriter`` stage: per-sink parquet
   files + partial (sink, event_type, n) counts in the same pass, then a
   tiny final groupby.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Sum

from .stitch import (
    DEFAULT_NUM_BUCKETS,
    MODE_BASIC,
    MODE_HEAP_STATS,
    finish_conv_bucket,
    hash_buckets,
    stitch_bucket,
    stitch_runlocal_block,
    stitch_salted_chunk,
)

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


def _ncpu() -> int:
    import ray

    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _pool_size() -> int:
    """Sink-writer actor-pool size: 1/4 of the CPUs, but together with the
    enrich pool it must always leave CPUs for upstream task operators —
    pools that reserve every CPU starve them and deadlock the streaming
    executor (observed at num_cpus=4 with 2+2 actors)."""
    n = _ncpu()
    return max(1, min(n // 4, (n - 2) // 2))


def _enrich_pool_size() -> int:
    """Enrich actor-pool MAX (pools autoscale from 1 — see
    _attach_enrich).  Ray fuses the preceding stitch map_groups INTO
    this actor pool, so this also bounds stitch parallelism — the
    dominant phase-2 compute.  Round-2 sweep at 32 CPUs: pool 8 →
    25.7s, 16 → 20.2s, 24 ≈ 20.0s, 30 → 25.4s (oversubscription) —
    and raising the cap to n - sink - 1 measured WORSE at 16 pinned
    CPUs too (106.7s vs 77.7s, round-3 diag), so n/2 stays the max.
    Floor of 2 once the session has ≥4 CPUs: at exactly 4 the old
    formula allowed a single enrich actor, capping stitch
    parallelism at 1 of 4 cores (the round-3 ladder's 4-leg
    bottleneck)."""
    n = _ncpu()
    return max(2 if n >= 4 else 1, min(n // 2, n - _pool_size() - 2))


def _tune_context() -> None:
    """Shuffle/exchange tuning: push-based sort shuffle cuts the all-to-all
    barrier cost ~30% for the stitch groupby (measured in BASELINE.md)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED


def read_transcripts(path, override_num_blocks: Optional[int] = None) -> rd.Dataset:
    """Column-pruned transcript read.  Blocks are sized to ~2 per CPU —
    tiny blocks (the 1-file default split to ~1.5MB each) make the stitch
    exchange overhead-dominated."""
    if override_num_blocks is None:
        override_num_blocks = 2 * _ncpu()
    return rd.read_parquet(
        path, columns=TRANSCRIPT_COLUMNS, override_num_blocks=override_num_blocks
    )


# string columns lz4-packed across the exchange when compression is on;
# turn_idx (int64 list) ships raw
_EXCHANGE_ZCOLS = ("text", "conv_id", "role", "tool")


def _compress_packed_strcols(packed: pa.Table) -> pa.Table:
    """Replace each packed ``list<string>`` exchange column with
    per-bucket-row ``(<col>_z, <col>_lens, <col>_nulls)``: the row's
    strings concatenated and lz4-compressed + their int32 lengths + a
    bit-packed validity mask (empty bytes when the row has no nulls, so
    the common all-valid case costs nothing).  GC-log text is extremely
    repetitive and conv_id/role/tool are near-constant within a bucket
    row (measured on the bench corpus: text alone 5.7×, all four string
    columns 3.64× total exchange reduction, 73.8 → 20.2 MB per corpus
    block, lz4 at ~3.3/1.9 GB/s compress/decompress) — on a multi-node
    cluster that is NETWORK shuffle volume.  ``turn_idx`` is
    delta-encoded within the bucket row then lz4'd: turns are consecutive
    within a conversation run, so the delta stream is almost all 1s.
    ≤ num_buckets rows per block → the per-row python loop is bounded
    and cheap."""
    codec = pa.Codec("lz4")
    out = packed
    for name in _EXCHANGE_ZCOLS:
        col = packed[name]
        blobs, lens, nulls = [], [], []
        for i in range(len(packed)):
            arr = col[i].values
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            bufs = arr.buffers()
            odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
            off = np.frombuffer(bufs[1], dtype=odt)[
                arr.offset : arr.offset + len(arr) + 1
            ]
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
                if bufs[2] is not None
                else np.empty(0, dtype=np.uint8)
            )
            lens.append((off[1:] - off[:-1]).astype(np.int32).tobytes())
            blobs.append(codec.compress(data.tobytes(), asbytes=True))
            if arr.null_count:
                m = arr.is_valid().to_numpy(zero_copy_only=False)
                nulls.append(np.packbits(m, bitorder="little").tobytes())
            else:
                nulls.append(b"")
        out = out.drop_columns([name]) \
                 .append_column(f"{name}_z", pa.array(blobs, type=pa.binary())) \
                 .append_column(f"{name}_lens", pa.array(lens, type=pa.binary())) \
                 .append_column(f"{name}_nulls", pa.array(nulls, type=pa.binary()))
    # turn_idx: frame-of-reference (delta within the bucket row) + lz4.
    # The transcript schema requires turn_idx non-null, so only values
    # travel (asserted — a null here would corrupt the cumsum rebuild).
    tcol = packed["turn_idx"]
    tblobs, tcounts = [], []
    for i in range(len(packed)):
        arr = tcol[i].values
        assert arr.null_count == 0, "turn_idx must be non-null on the exchange"
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        d = np.diff(v, prepend=np.int64(0))
        tblobs.append(codec.compress(d.tobytes(), asbytes=True))
        tcounts.append(len(v))
    out = out.drop_columns(["turn_idx"]) \
             .append_column("turn_idx_z", pa.array(tblobs, type=pa.binary())) \
             .append_column("turn_idx_n", pa.array(tcounts, type=pa.int32()))
    return out


def _decompress_packed_strcol(group: pa.Table, name: str) -> pa.Array:
    """Inverse of :func:`_compress_packed_strcols` for one column of one
    bucket group: rebuild the flattened utf8 array straight from
    offset/data buffers (no per-string python), restoring nulls from the
    bit-packed validity mask when present."""
    codec = pa.Codec("lz4")
    parts, lens_parts, masks = [], [], []
    any_null = False
    zcol, lcol, ncol = group[f"{name}_z"], group[f"{name}_lens"], group[f"{name}_nulls"]
    for i in range(len(group)):
        ln = np.frombuffer(lcol[i].as_py(), dtype=np.int32)
        total = int(ln.sum())
        parts.append(codec.decompress(zcol[i].as_py(), decompressed_size=total,
                                      asbytes=True))
        lens_parts.append(ln)
        nb = ncol[i].as_py()
        if nb:
            any_null = True
            masks.append(
                np.unpackbits(
                    np.frombuffer(nb, dtype=np.uint8),
                    count=len(ln), bitorder="little",
                ).astype(bool)
            )
        else:
            masks.append(np.ones(len(ln), dtype=bool))
    data = b"".join(parts)
    ln = (np.concatenate(lens_parts) if lens_parts
          else np.empty(0, dtype=np.int32))
    # int32 offsets: a bucket group is bounded by the bucket's share of
    # the corpus block (~tens of MB), far under the 2 GiB offset limit
    offsets = np.zeros(len(ln) + 1, dtype=np.int32)
    np.cumsum(ln, out=offsets[1:])
    validity = None
    null_count = 0
    if any_null:
        vm = np.concatenate(masks)
        null_count = int(len(vm) - vm.sum())
        validity = pa.py_buffer(np.packbits(vm, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.utf8(), len(ln),
        [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
        null_count=null_count,
    )


def _decompress_packed_turn_idx(group: pa.Table) -> pa.Array:
    """Rebuild turn_idx from the per-bucket-row delta+lz4 stream."""
    codec = pa.Codec("lz4")
    zcol, ncol = group["turn_idx_z"], group["turn_idx_n"]
    parts = []
    for i in range(len(group)):
        cnt = ncol[i].as_py()
        d = np.frombuffer(
            codec.decompress(
                zcol[i].as_py(), decompressed_size=cnt * 8, asbytes=True
            ),
            dtype=np.int64,
        )
        parts.append(np.cumsum(d))
    vals = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    return pa.array(vals, type=pa.int64())


def parse_events(
    ds: rd.Dataset,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    stitch_impl: str = "vec",
    compress_exchange: Optional[bool] = None,
) -> rd.Dataset:
    """transcripts Dataset → wide event-row Dataset (lazy).

    The stitch shuffle is an explicit hash partition: ``bucket =
    hash64(conv_id) % num_buckets`` added vectorized pre-shuffle, then ONE
    ``map_groups`` call per bucket sweeps all its conversations (per-conv
    group calls pay ~1ms of machinery each — ruinous at 10^5+ convs).
    ``ts`` is dropped before the shuffle (events re-derive time from the
    parsed text; no reason to ship it).

    ``compress_exchange`` (default: the ``GCFLOW_EXCHANGE_COMPRESS=1``
    env toggle, else off) lz4-compresses the packed text payload across
    the shuffle — a 10–40× network-volume lever for multi-node
    deployments (see :func:`_compress_packed_text`); output is
    equivalent either way (asserted in tests)."""
    if compress_exchange is None:
        compress_exchange = os.environ.get("GCFLOW_EXCHANGE_COMPRESS", "0") == "1"

    def classify(batch: pa.Table) -> pa.Table:
        """Prefilter + bucket, then PACK: group the batch by bucket and
        emit one list-packed row per bucket (≤ num_buckets rows per input
        block instead of ~100k).  The shuffle moves the same bytes but
        ~500× fewer rows — row-granular sort/exchange overhead was
        throttling the stitch stage to a fraction of the CPUs."""
        if prefilter:
            batch = batch.filter(prefilter_mask(batch["text"]))
        bucket = hash_buckets(batch["conv_id"].to_pylist(), num_buckets)
        flat = pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "text": batch["text"],
                "tool": batch["tool"],
                "bucket": pa.array(bucket, type=pa.int32()),
            }
        )
        packed = flat.group_by(["bucket"]).aggregate(
            [(c, "list") for c in ("conv_id", "turn_idx", "role", "text", "tool")]
        ).rename_columns(["bucket", "conv_id", "turn_idx", "role", "text", "tool"])
        if compress_exchange:
            packed = _compress_packed_strcols(packed)
        return packed

    def unpack_and_stitch(group: pa.Table) -> pa.Table:
        zipped = "text_z" in group.column_names
        cols = {
            "turn_idx": (
                _decompress_packed_turn_idx(group) if zipped
                else pc.list_flatten(group["turn_idx"])
            )
        }
        for c in _EXCHANGE_ZCOLS:
            cols[c] = (
                _decompress_packed_strcol(group, c) if zipped
                else pc.list_flatten(group[c])
            )
        flat = pa.table(
            {c: cols[c] for c in ("conv_id", "turn_idx", "role", "text", "tool")}
        )
        return stitch_bucket(flat, mode, impl=stitch_impl)

    _tune_context()
    ds = ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    events = ds.groupby("bucket").map_groups(unpack_and_stitch, batch_format="pyarrow")
    if enrich:
        events = _attach_enrich(events)
    return events


def _attach_enrich(events: rd.Dataset) -> rd.Dataset:
    """Enrich stage: an actor pool on real sessions, but a plain task fn
    below 4 CPUs — with two pools (enrich + sink) a 2-CPU session has
    every CPU reserved by actors and the streaming executor deadlocks
    (observed: the 2-CPU bench leg hung indefinitely)."""
    from .enrich import EnrichStage

    if _ncpu() < 4:
        stage = EnrichStage()
        return events.map_batches(
            lambda t: stage(t), batch_format="pyarrow", zero_copy_batch=True
        )
    # autoscaling (1, max) rather than a fixed-size pool: the stitch
    # groupby is a sort BARRIER, so during the entire read/classify phase
    # a fixed pool's actors sit idle while RESERVING their CPUs from the
    # streaming executor — at 16 pinned CPUs the enrich(8) + sink(4)
    # pools left phase 1 running near-sequentially (60.8s of read task
    # time over a 68s span, parallelism ≈ 1; ds.stats() diag, round 3).
    # With min=1 the pool holds one CPU until post-shuffle blocks queue,
    # then scales to the swept maximum.
    emax = _enrich_pool_size()
    return events.map_batches(
        EnrichStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        # min = max/2: enough pre-started actors that short jobs don't
        # pay the full autoscaling ramp (10M-turn headline regressed
        # 16.7 -> 21.8s with min=1), while phase 1 still gets the other
        # half of the pool's cores back during the sort barrier
        concurrency=(max(1, emax // 2), emax),
    )


def parse_events_salted(
    ds: rd.Dataset,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
    salt_turns: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> rd.Dataset:
    """Skew-aware salted variant of :func:`parse_events` (see the salting
    design note in gcflow/stitch.py).  Equivalent output to the unsalted
    path (asserted in tests); use when single conversations can exceed
    ``salt_turns`` turns — the per-chunk stage A bounds any one task's work
    by the chunk size instead of the largest conversation."""
    _tune_context()

    def classify(batch: pa.Table) -> pa.Table:
        if prefilter:
            batch = batch.filter(prefilter_mask(batch["text"]))
        conv = batch["conv_id"].to_pylist()
        salt = (
            batch["turn_idx"].to_numpy(zero_copy_only=False) // salt_turns
        ).astype(np.int64)
        h = pd.util.hash_array(np.asarray(conv, dtype=object))
        bucket = ((h + salt.astype(np.uint64) * np.uint64(0x9E3779B9)) % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "role": batch["role"],
                "text": batch["text"],
                "tool": batch["tool"],
                "salt": pa.array(salt, type=pa.int64()),
                "bucket": pa.array(bucket, type=pa.int32()),
            }
        )

    staged = ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    stage_a = staged.groupby("bucket").map_groups(
        lambda g: stitch_salted_chunk(g, mode, salt_turns), batch_format="pyarrow"
    )

    # single conversation-bucket shuffle carrying events + residues
    # together (splitting a lazy stage into two filtered branches would
    # re-execute everything upstream once per branch), IPC-packed so the
    # exchange moves blob rows, not millions of event rows
    def conv_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "cbucket",
            pa.array(hash_buckets(t["conv_id"].to_pylist(), num_buckets), type=pa.int32()),
        )

    events = (
        stage_a.map_batches(
            lambda t: _pack_by_bucket(conv_bucket(t), "cbucket"),
            batch_format="pyarrow",
        )
        .groupby("cbucket")
        .map_groups(
            lambda g: finish_conv_bucket(_unpack_blobs(g), mode, marker_based=False),
            batch_format="pyarrow",
        )
    )
    if enrich:
        events = _attach_enrich(events)
    return events


def _pack_by_bucket(batch: pa.Table, bucket_col: str) -> pa.Table:
    """Serialize each bucket's sub-table to one Arrow-IPC blob row: the
    shuffle then moves ≤ num_buckets rows per block instead of millions —
    row-granular sort overhead was the dominant exchange cost.  (Works for
    nested columns, unlike pyarrow list-aggregation packing.)"""
    buckets = batch[bucket_col].to_numpy(zero_copy_only=False)
    out_b, out_blob = [], []
    for b in np.unique(buckets):
        sub = batch.filter(pa.array(buckets == b)).drop_columns([bucket_col])
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, sub.schema) as w:
            w.write_table(sub)
        out_b.append(int(b))
        out_blob.append(sink.getvalue().to_pybytes())
    return pa.table(
        {
            bucket_col: pa.array(out_b, type=pa.int32()),
            "blob": pa.array(out_blob, type=pa.binary()),
        }
    )


def _unpack_blobs(group: pa.Table) -> pa.Table:
    tables = [
        pa.ipc.open_stream(b).read_all() for b in group["blob"].to_pylist()
    ]
    return pa.concat_tables(tables)


def probe_skew(
    ds: rd.Dataset, sample_fraction: float = 0.01, seed: int = 7
) -> dict:
    """Pre-shuffle size probe (SURVEY.md §4): estimate the largest
    conversation from a row sample instead of a full
    ``groupby(conv_id).count()`` — a hot conversation shows up in any
    uniform sample in proportion to its share of rows."""
    sample = ds.select_columns(["conv_id"]).random_sample(sample_fraction, seed=seed)

    def partial_counts(t: pa.Table) -> pa.Table:
        # in-batch combiner: the shuffle carries one row per (block, conv)
        # instead of one per sampled row
        vc = t["conv_id"].value_counts()
        return pa.table(
            {"conv_id": vc.field("values"), "np_": pc.cast(vc.field("counts"), pa.int64())}
        )

    counts = (
        sample.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("np_", alias_name="n"))
        .materialize()
    )
    if counts.count() == 0:
        return {"est_max_conv_turns": 0, "sampled_rows": 0}
    # only the single top estimate and one scalar cross to the driver —
    # the sample itself never leaves the distributed plane
    top = counts.sort("n", descending=True).limit(1).take_all()[0]
    total = counts.sum("n")
    return {
        "est_max_conv_turns": int(top["n"] / sample_fraction),
        "est_hot_conv": str(top["conv_id"]),
        "sampled_rows": int(total),
    }


def parse_events_auto(
    ds: rd.Dataset,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
    salt_threshold: int = 1_000_000,
    salt_turns: int = 100_000,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    sample_fraction: float = 0.01,
) -> rd.Dataset:
    """Skew-aware dispatch: probe conversation sizes from a sample; if the
    largest estimated conversation exceeds ``salt_threshold`` turns, use
    the salted path (chunk-bounded stage-A tasks), else the plain bucketed
    shuffle.  The probe costs one cheap column-pruned sampled pass."""
    est = probe_skew(ds, sample_fraction)
    if est["est_max_conv_turns"] > salt_threshold:
        return parse_events_salted(
            ds, mode=mode, prefilter=prefilter, enrich=enrich,
            salt_turns=salt_turns, num_buckets=num_buckets,
        )
    return parse_events(
        ds, mode=mode, prefilter=prefilter, enrich=enrich, num_buckets=num_buckets
    )


def parse_events_runlocal(
    ds: rd.Dataset,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    stitch_impl: str = "vec",
) -> rd.Dataset:
    """Shuffle-light variant (see the run-local design note in
    gcflow/stitch.py): parses each input block in place, shuffles only
    boundary residues + markers (tiny) and the numeric event rows (for
    the per-conversation rate pass).

    CONTRACT: the input must be conversation-ordered (sorted by conv_id,
    turn_idx) so each block is a contiguous slice — the realistic layout
    for logs landed in order.  For unordered inputs use
    :func:`parse_events` (full shuffle) or :func:`parse_events_salted`.

    When to use: wins when events ≪ lines (heap-at-GC-heavy logs, ~25
    lines/event — the avoided text shuffle dwarfs the event shuffle);
    measured SLOWER than the packed classic shuffle on line-dense corpora
    (~1.3 lines/event: 41s vs 20s at 10M turns/32 CPUs) because the wide
    event rows then outweigh the text.  See BASELINE.md."""
    _tune_context()

    def classify(batch: pa.Table) -> pa.Table:
        if prefilter:
            batch = batch.filter(prefilter_mask(batch["text"]))
        return batch.drop_columns(["ts"])

    staged = ds.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    stage_a = staged.map_batches(
        lambda t: stitch_runlocal_block(t, mode, impl=stitch_impl),
        batch_format="pyarrow",
    )

    def conv_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "cbucket",
            pa.array(hash_buckets(t["conv_id"].to_pylist(), num_buckets), type=pa.int32()),
        )

    # single conversation-bucket shuffle of events + residues + markers
    # (see the salted path note on branch-splitting), IPC-packed
    events = (
        stage_a.map_batches(
            lambda t: _pack_by_bucket(conv_bucket(t), "cbucket"),
            batch_format="pyarrow",
        )
        .groupby("cbucket")
        .map_groups(
            lambda g: finish_conv_bucket(_unpack_blobs(g), mode, marker_based=True),
            batch_format="pyarrow",
        )
    )
    if enrich:
        events = _attach_enrich(events)
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


class SinkWriter:
    """Fused fan-out sink + partial-count stage: each task writes its
    batch's rows to ``out_dir/sink=<name>/part-*.parquet`` directly (one
    pyarrow write per sink per batch) and emits only tiny (sink,
    event_type, n) partial-count rows downstream.  One pass over the
    events — no hive-partition shim, no read-back for the aggregate."""

    def __init__(self, out_dir: str):
        import uuid

        self.out_dir = out_dir
        self.uid = uuid.uuid4().hex[:12]
        self.part = 0
        for s in ("basic", "cms", "app_stopped", "detailed", "error"):
            os.makedirs(os.path.join(out_dir, f"sink={s}"), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        sinks = batch["sink"].to_numpy(zero_copy_only=False)
        for s in set(sinks.tolist()):
            sub = batch.filter(pa.array(sinks == s))
            path = os.path.join(
                self.out_dir, f"sink={s}", f"part-{self.uid}-{self.part:05d}.parquet"
            )
            self.part += 1
            pq.write_table(sub.drop_columns(["sink"]), path)
        g = batch.group_by(["sink", "event_type"]).aggregate([([], "count_all")])
        return g.rename_columns(["sink", "event_type", "n_partial"])


def prefilter_stats(transcripts_path) -> dict:
    """Dropped-row accounting for the prefilter (no silent caps): one
    cheap column-pruned pass counting kept vs total turns."""

    def counts(batch: pa.Table) -> pa.Table:
        kept = int(pc.sum(pc.cast(prefilter_mask(batch["text"]), pa.int64())).as_py() or 0)
        return pa.table({"n": [len(batch)], "kept": [kept]})

    t = (
        rd.read_parquet(transcripts_path, columns=["text"])
        .map_batches(counts, batch_format="pyarrow")
        .to_pandas()
    )
    return {"turns_in": int(t["n"].sum()), "turns_kept": int(t["kept"].sum())}


def run_pipeline(
    transcripts_path: str,
    out_dir: Optional[str] = None,
    mode: str = MODE_BASIC,
    prefilter: bool = True,
    enrich: bool = True,
    stats: bool = False,
    limit: Optional[int] = None,
    salt_turns: Optional[int] = None,
    stitch_impl: str = "vec",
) -> dict:
    """Full parse→enrich→route→aggregate job; returns metrics.

    Output layout: ``out_dir/sink=<name>/part-*.parquet`` — per-event-type
    Parquet fan-out sinks (SURVEY.md S6 mapping) written in the same pass
    that feeds the streaming per-sink aggregate, plus a run-level
    ``_metrics.json`` record."""
    ds = read_transcripts(transcripts_path)
    if salt_turns:
        events = parse_events_salted(
            ds, mode=mode, prefilter=prefilter, enrich=enrich, salt_turns=salt_turns
        )
    else:
        events = parse_events(
            ds, mode=mode, prefilter=prefilter, enrich=enrich, stitch_impl=stitch_impl
        )
    if limit is not None:
        events = events.limit(limit)  # ≙ reference --limit (Main.scala:28)
    if out_dir is not None:
        partials = events.map_batches(
            SinkWriter,
            fn_constructor_args=(out_dir,),
            batch_format="pyarrow",
            batch_size=32768,
            # autoscaling: see _attach_enrich — a fixed pool reserves its
            # CPUs through the pre-shuffle phase it can't help with
            concurrency=(max(1, _pool_size() // 2), _pool_size()),
        )
        out = partials.groupby(["sink", "event_type"]).sum("n_partial")
        t = pa.Table.from_pandas(out.to_pandas())
        counts = t.rename_columns(["sink", "event_type", "n"]).sort_by(
            [("sink", "ascending"), ("event_type", "ascending")]
        )
    else:
        counts = sink_counts(events)
    metrics = {
        "sink_counts": counts,
        "events_total": int(pc.sum(counts["n"]).as_py() or 0),
    }
    if stats:
        metrics.update(prefilter_stats(transcripts_path))
    if out_dir is not None:
        # run-level metrics record alongside the sinks (north rule:
        # lineage + metrics records; shard-level records live in
        # gcflow/checkpoint.py)
        import json

        record = {
            "input": str(transcripts_path),
            "mode": mode,
            "events_total": metrics["events_total"],
            "sink_counts": {
                f"{s}/{e}": int(n)
                for s, e, n in zip(
                    counts["sink"].to_pylist(),
                    counts["event_type"].to_pylist(),
                    counts["n"].to_pylist(),
                )
            },
            **{k: v for k, v in metrics.items() if k in ("turns_in", "turns_kept")},
        }
        tmp = os.path.join(out_dir, "_metrics.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, os.path.join(out_dir, "_metrics.json"))
    return metrics
