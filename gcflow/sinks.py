"""Export sinks: TSV (S3) and graphite long format (S4), reconstructed
from the wide Arrow event rows.

The reference's dynamic ``toExport`` column explosion (schema-on-first-row
TSV, OutputFormat.scala:9-22; graphite line protocol excluding datetime,
OutputFormat.scala:24-36) is reproduced here *at the sink* from the stable
Arrow schema — :func:`arrow_export_seq` is the Arrow-row twin of the event
classes' ``toSeq`` and is tested equal to it on the conformance corpus.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import pyarrow as pa

import ray.data as rd

from .events import format_datetime, java_double_str

def _present(v) -> bool:
    """Null check robust to both Arrow to_pylist (None) and pandas rows
    (NaN / NaT)."""
    return v is not None and v == v


def _istr(v) -> str:
    """Render an integer-valued field that pandas may have widened to
    float (2.0 → "2")."""
    return str(int(v))


def _aslist(v) -> list:
    if v is None or isinstance(v, float):  # None or NaN
        return []
    return list(v)


def arrow_export_seq(row: dict, with_rates: bool = True) -> list:
    """One wide Arrow event row → ordered [(name, str_value)] export.

    Reproduces toExport ordering/conditionality (BasicGCEvent.scala:20-45,
    CmsGcEvent.scala:17-25, AppPausedEvent.scala:16-24,
    DetailedGCEvent.scala:13-22 incl. the pair-distinct, and the rates
    suffix GCEventWithRates.scala:13-19)."""
    seq: list = []
    ts = row["ts"]
    if _present(ts):
        epoch_ms = int(ts.timestamp() * 1000) if hasattr(ts, "timestamp") else int(ts)
        seq.append(("datetime", format_datetime(epoch_ms, row["tz_offset_min"] or 0)))
    seq.append(("age", java_double_str(row["jvm_age_seconds"])))
    seq.append(("type", row["event_type"]))
    if row["sink"] == "app_stopped":
        seq.append(("stoppedSeconds", "%f" % row["stopped_seconds"]))
        seq.append(("secondsToStop", "%f" % row["seconds_to_stop"]))
    else:
        if _present(row["gc_cause"]):
            seq.append(("cause", row["gc_cause"]))
        seq.append(("pause", java_double_str(row["pause_seconds"])))
        if _present(row["heap_before_bytes"]):
            seq.append(("heapBefore", _istr(row["heap_before_bytes"])))
            seq.append(("heapAfter", _istr(row["heap_after_bytes"])))
            seq.append(("heapReclaimed", _istr(row["heap_reclaimed_bytes"])))
            seq.append(("heapMax", _istr(row["heap_capacity_bytes"])))
        for g in _aslist(row["generations"]):
            seq.append((f"{g['name']}Before", str(g["before_bytes"])))
            seq.append((f"{g['name']}After", str(g["after_bytes"])))
            seq.append((f"{g['name']}Reclaimed", str(g["before_bytes"] - g["after_bytes"])))
            seq.append((f"{g['name']}Max", str(g["capacity_bytes"])))
        if _present(row["promoted_bytes"]):
            seq.append(("promoted", _istr(row["promoted_bytes"])))
        if _present(row["tenuring_new_threshold"]):
            seq.append(("desiredSurvivorSize", _istr(row["tenuring_desired_bytes"])))
            seq.append(("newThreshold", _istr(row["tenuring_new_threshold"])))
        regions = _aslist(row["regions"])
        for r in regions:
            seq.append((f"{r['name']}Before", str(r["before"])))
            seq.append((f"{r['name']}After", str(r["after"])))
            seq.append((f"{r['name']}CapacityBefore", str(r["capacity_before"])))
            seq.append((f"{r['name']}CapacityAfter", str(r["capacity_after"])))
        if regions:
            seen = set()
            deduped = []
            for pair in seq:
                if pair not in seen:
                    seen.add(pair)
                    deduped.append(pair)
            seq = deduped
    if with_rates:
        seq.append(("heapAllocated", _istr(row["allocated_bytes"]) if _present(row["allocated_bytes"]) else "0"))
        seq.append(("heapAllocationRate", _istr(row["alloc_rate"]) if _present(row["alloc_rate"]) else "0"))
        seq.append(("promotionRate", _istr(row["promotion_rate"]) if _present(row["promotion_rate"]) else "0"))
    return seq


def tsv_lines(batch: pa.Table, delimiter: str = "\t", with_rates: bool = True) -> Iterable[str]:
    for row in batch.to_pylist():
        yield delimiter.join(v for _, v in arrow_export_seq(row, with_rates))


def write_tsv(
    events: rd.Dataset,
    path: str,
    delimiter: str = "\t",
    with_rates: bool = True,
    schema: str = "first",
):
    """TSV sink, two modes:

    - ``schema="first"`` (default, reference semantics): single
      sequential file with the header taken from the FIRST event
      (OutputFormat.scala:12-15).  Streams via iter_batches; inherently
      sequential because later rows may be ragged w.r.t. that header.
    - ``schema="union"`` (distributed mode for the 100× case): one cheap
      distributed key-survey pass fixes a GLOBAL header — every key any
      event emits, ordered by its earliest in-row position then name —
      after which every block writes its own shard file under ``path``
      (a directory) independently, missing keys as "".  Shards are
      atomically published (tmp + rename) and content-hash named, so a
      re-run overwrites rather than duplicates.  ``path`` must be
      shared storage on a real cluster.  Returns a small DataFrame of
      (shard, rows).
    """
    if schema == "union":
        return _write_tsv_union(events, path, delimiter, with_rates)
    if schema != "first":
        raise ValueError(f"schema must be 'first' or 'union', got {schema!r}")
    wrote_header = False
    with open(path, "w") as f:
        for batch in events.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for row in batch.to_pylist():
                seq = arrow_export_seq(row, with_rates)
                if not wrote_header:
                    f.write(delimiter.join(k for k, _ in seq) + "\n")
                    wrote_header = True
                f.write(delimiter.join(v for _, v in seq) + "\n")
    return None


def _write_tsv_union(
    events: rd.Dataset, path: str, delimiter: str, with_rates: bool
):
    """Distributed TSV: global union header (survey pass), then per-block
    shard writes.  The per-row export walk mirrors the sequential
    writer's reference semantics (arrow_export_seq is row-wise by
    contract); the distribution win is that blocks write concurrently
    and nothing event-sized ever reaches the driver."""
    import hashlib
    import uuid

    def key_pos(t: pa.Table) -> pa.Table:
        pos: dict[str, int] = {}
        for row in t.to_pylist():
            for i, (k, _) in enumerate(arrow_export_seq(row, with_rates)):
                p = pos.get(k)
                if p is None or i < p:
                    pos[k] = i
        return pa.table(
            {
                "key": pa.array(list(pos), type=pa.string()),
                "pos": pa.array([pos[k] for k in pos], type=pa.int64()),
            }
        )

    survey = (
        events.map_batches(key_pos, batch_format="pyarrow")
        .groupby("key")
        .min("pos")
        .to_pandas()  # keys are few (attribute names), never event-sized
    )
    header = list(survey.sort_values(["min(pos)", "key"])["key"])
    hidx = {k: i for i, k in enumerate(header)}
    os.makedirs(path, exist_ok=True)

    shard_schema = pa.schema([("shard", pa.string()), ("rows", pa.int64())])
    # a run OWNS the directory: clear stale shards so the directory
    # always equals exactly this run's manifest (shard names are unique
    # per write, so a re-run would otherwise accumulate)
    for f in os.listdir(path):
        if f.startswith("part-") and f.endswith(".tsv"):
            os.unlink(os.path.join(path, f))

    def write_shard(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return shard_schema.empty_table()
        lines = [delimiter.join(header)]
        for row in t.to_pylist():
            vals = [""] * len(header)
            for k, v in arrow_export_seq(row, with_rates):
                vals[hidx[k]] = v
            lines.append(delimiter.join(vals))
        blob = "\n".join(lines) + "\n"
        # content hash alone would collapse byte-identical blocks (a
        # replicated log produces them) into ONE file while the manifest
        # counts both — the uuid suffix keeps every block's shard
        # distinct regardless of content, pid, or task scheduling.
        shard = os.path.join(
            path,
            f"part-{hashlib.md5(blob.encode()).hexdigest()[:12]}"
            f"-{uuid.uuid4().hex[:8]}.tsv",
        )
        tmp = f"{shard}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            f.write(blob)
        os.replace(tmp, shard)  # atomic publish
        return pa.table(
            {"shard": [shard], "rows": pa.array([len(t) ], type=pa.int64())}
        ).cast(shard_schema)

    return (
        events.map_batches(write_shard, batch_size=4096, batch_format="pyarrow")
        .to_pandas()
    )


_GRAPHITE_EMPTY = pa.schema(
    [("path", pa.string()), ("value", pa.string()), ("epoch", pa.int64())]
)


def graphite_table(batch: pa.Table, prefix: str = "gc", with_rates: bool = True) -> pa.Table:
    """Wide→long unpivot, vectorized: one row per (event × attribute),
    excluding datetime; epoch = UTC seconds (OutputFormat.scala:24-36).
    Null-ts events are skipped (the reference NPEs there — graphite lines
    are meaningless without an epoch).

    Column-granular Arrow/numpy kernels build (parent, order, path,
    value) quadruples per attribute class; a stable lexsort restores the
    reference's per-event toExport order and a grouped first-occurrence
    filter reproduces the regions dedup (DetailedGCEvent.scala pair
    distinct).  Tested element-equal to the per-row ``arrow_export_seq``
    twin on the conformance corpus — no per-row python remains."""
    import numpy as np
    import pyarrow.compute as pc

    t = batch.filter(pc.is_valid(batch["ts"]))
    n = len(t)
    if n == 0:
        return _GRAPHITE_EMPTY.empty_table()
    epoch = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) // 1000

    parents, orders, paths, values = [], [], [], []

    def _chunked(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    def emit(parent_idx, order, path, value):
        m = len(parent_idx)
        if m == 0:
            return
        parents.append(np.asarray(parent_idx, dtype=np.int64))
        orders.append(
            np.full(m, order, dtype=np.int64)
            if np.isscalar(order) else np.asarray(order, dtype=np.int64)
        )
        paths.append(
            pa.array([f"{prefix}.{path}"] * m, type=pa.string())
            if isinstance(path, str) else _chunked(path)
        )
        values.append(_chunked(value))

    def _jd_col(col: str, idx: np.ndarray) -> pa.Array:
        # java_double_str is inherently scalar formatting; applied per
        # COLUMN over just the selected values, never per event row
        v = t[col].to_numpy(zero_copy_only=False)[idx]
        return pa.array([java_double_str(float(x)) for x in v], type=pa.string())

    def _int_col(col: str, idx: np.ndarray) -> pa.Array:
        return _chunked(pc.cast(t[col].take(pa.array(idx)), pa.string()))

    all_rows = np.arange(n, dtype=np.int64)
    is_app = pc.equal(t["sink"], "app_stopped").to_numpy(zero_copy_only=False)
    app_idx = np.flatnonzero(is_app)
    gc_idx = np.flatnonzero(~is_app)

    emit(all_rows, 0, "age", _jd_col("jvm_age_seconds", all_rows))
    emit(all_rows, 1, "type", t["event_type"])
    if len(app_idx):
        for j, col, nm in ((2, "stopped_seconds", "stoppedSeconds"),
                           (3, "seconds_to_stop", "secondsToStop")):
            v = t[col].to_numpy(zero_copy_only=False)[app_idx]
            emit(app_idx, j, nm, pa.array(np.char.mod("%f", v), type=pa.string()))
    if len(gc_idx):
        cause_i = np.flatnonzero(
            pc.is_valid(t["gc_cause"]).to_numpy(zero_copy_only=False) & ~is_app
        )
        emit(cause_i, 4, "cause", t["gc_cause"].take(pa.array(cause_i)))
        emit(gc_idx, 5, "pause", _jd_col("pause_seconds", gc_idx))
        heap_i = np.flatnonzero(
            pc.is_valid(t["heap_before_bytes"]).to_numpy(zero_copy_only=False)
            & ~is_app
        )
        for j, (nm, col) in enumerate(
            [("heapBefore", "heap_before_bytes"), ("heapAfter", "heap_after_bytes"),
             ("heapReclaimed", "heap_reclaimed_bytes"), ("heapMax", "heap_capacity_bytes")]
        ):
            emit(heap_i, 6 + j, nm, _int_col(col, heap_i))
        prom_i = np.flatnonzero(
            pc.is_valid(t["promoted_bytes"]).to_numpy(zero_copy_only=False) & ~is_app
        )
        emit(prom_i, 10_000, "promoted", _int_col("promoted_bytes", prom_i))
        ten_i = np.flatnonzero(
            pc.is_valid(t["tenuring_new_threshold"]).to_numpy(zero_copy_only=False)
            & ~is_app
        )
        emit(ten_i, 10_001, "desiredSurvivorSize", _int_col("tenuring_desired_bytes", ten_i))
        emit(ten_i, 10_002, "newThreshold", _int_col("tenuring_new_threshold", ten_i))

    def emit_list(col: str, base: int, fields: list):
        """fields = [(suffix, struct_field | callable(flat)->Array)]."""
        arr = _chunked(t[col])
        flat = pc.list_flatten(arr)
        par = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
        if len(par) == 0:
            return
        keep = ~is_app[par]
        sel = np.flatnonzero(keep)
        if len(sel) == 0:
            return
        par = par[sel]
        flat = flat.take(pa.array(sel))
        # ordinal within parent (parent indices are nondecreasing)
        first = np.concatenate(([True], par[1:] != par[:-1]))
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(par)))
        ordinal = np.arange(len(par), dtype=np.int64) - np.repeat(starts, lens)
        m = len(par)
        names = pc.struct_field(flat, "name")
        pre = pa.array([f"{prefix}."] * m, type=pa.string())
        for j, (suffix, getter) in enumerate(fields):
            val = getter(flat) if callable(getter) else pc.struct_field(flat, getter)
            emit(
                par, base + ordinal * len(fields) + j,
                pc.binary_join_element_wise(
                    pre, names, pa.array([suffix] * m, type=pa.string()), ""
                ),
                pc.cast(val, pa.string()),
            )

    emit_list(
        "generations", 100,
        [("Before", "before_bytes"), ("After", "after_bytes"),
         ("Reclaimed", lambda f: pc.subtract(
             pc.struct_field(f, "before_bytes"), pc.struct_field(f, "after_bytes"))),
         ("Max", "capacity_bytes")],
    )
    emit_list(
        "regions", 20_000,
        [("Before", "before"), ("After", "after"),
         ("CapacityBefore", "capacity_before"), ("CapacityAfter", "capacity_after")],
    )

    if with_rates:
        for j, (nm, col) in enumerate(
            [("heapAllocated", "allocated_bytes"),
             ("heapAllocationRate", "alloc_rate"),
             ("promotionRate", "promotion_rate")]
        ):
            emit(
                all_rows, 1_000_000 + j, nm,
                pc.fill_null(pc.cast(t[col], pa.string()), "0"),
            )

    par = np.concatenate(parents)
    orr = np.concatenate(orders)
    path_arr = pa.concat_arrays(paths)
    val_arr = pa.concat_arrays(values)
    sortidx = np.lexsort((orr, par))
    par, orr = par[sortidx], orr[sortidx]
    take = pa.array(sortidx)
    path_arr, val_arr = path_arr.take(take), val_arr.take(take)

    # regions dedup: the reference distincts (name, value) pairs WITHIN an
    # event iff it has regions, before the rates suffix is appended
    reg_len = pc.fill_null(
        pc.list_value_length(t["regions"]), 0
    ).to_numpy(zero_copy_only=False)
    scope = (reg_len[par] > 0) & (orr < 1_000_000)
    if scope.any():
        import pandas as pd

        dup = pd.DataFrame(
            {"p": par, "k": path_arr.to_pandas(), "v": val_arr.to_pandas()}
        ).duplicated(["p", "k", "v"], keep="first").to_numpy()
        keep = ~(dup & scope)
        if not keep.all():
            par = par[keep]
            take = pa.array(np.flatnonzero(keep))
            path_arr, val_arr = path_arr.take(take), val_arr.take(take)

    return pa.table(
        {
            "path": path_arr,
            "value": val_arr,
            "epoch": pa.array(epoch[par], type=pa.int64()),
        }
    )


def graphite_ds(events: rd.Dataset, prefix: str = "gc", with_rates: bool = True) -> rd.Dataset:
    return events.map_batches(
        lambda t: graphite_table(t, prefix, with_rates), batch_format="pyarrow"
    )


def send_graphite(
    events: rd.Dataset,
    dest: str,
    prefix: str = "gc",
    with_rates: bool = True,
    timeout: float = 30.0,
) -> int:
    """TCP graphite transport ≙ the reference's ``--dest host:port``
    (OutputSink.scala:18-36, Main.scala:51): one connection, plaintext
    line protocol ``path value epoch\\n``.  The wide→long unpivot runs
    distributed (:func:`graphite_ds`); the driver streams the (already
    reduced) metric rows over ONE socket because the protocol endpoint is
    a single carbon relay — fanning out to a carbon cluster would instead
    use ``map_batches`` with a per-actor socket keyed by metric shard.
    Returns the number of lines sent."""
    import socket

    host, port = dest.rsplit(":", 1)
    n = 0
    with socket.create_connection((host, int(port)), timeout=timeout) as sock:
        f = sock.makefile("w", encoding="utf-8", newline="\n")
        for batch in graphite_ds(events, prefix, with_rates).iter_batches(
            batch_size=8192, batch_format="pyarrow"
        ):
            for pth, val, ep in zip(
                batch["path"].to_pylist(),
                batch["value"].to_pylist(),
                batch["epoch"].to_pylist(),
            ):
                f.write(f"{pth} {val} {ep}\n")
                n += 1
        f.flush()
    return n


def graphite_lines(events: rd.Dataset, prefix: str = "gc", with_rates: bool = True, limit: Optional[int] = None) -> list:
    t = graphite_ds(events, prefix, with_rates)
    if limit is not None:
        t = t.limit(limit)
    return [
        f"{r['path']} {r['value']} {r['epoch']}" for r in t.to_pandas().to_dict("records")
    ]
