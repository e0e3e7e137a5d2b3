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
) -> None:
    """Single-file TSV with header from the FIRST event (reference
    schema-on-first-row semantics, OutputFormat.scala:12-15).  Streams via
    iter_batches — for the distributed fan-out use Parquet sinks (the TSV
    contract is inherently sequential/ragged)."""
    wrote_header = False
    with open(path, "w") as f:
        for batch in events.iter_batches(batch_size=4096, batch_format="pyarrow"):
            for row in batch.to_pylist():
                seq = arrow_export_seq(row, with_rates)
                if not wrote_header:
                    f.write(delimiter.join(k for k, _ in seq) + "\n")
                    wrote_header = True
                f.write(delimiter.join(v for _, v in seq) + "\n")


def graphite_table(batch: pa.Table, prefix: str = "gc", with_rates: bool = True) -> pa.Table:
    """Wide→long unpivot: one row per (event × attribute), excluding
    datetime; epoch = UTC seconds (OutputFormat.scala:24-36)."""
    paths, values, epochs = [], [], []
    for row in batch.to_pylist():
        ts = row["ts"]
        if not _present(ts):
            # the reference NPEs on a null event time (event.time.getMillis,
            # OutputFormat.scala:27); we skip the event instead — graphite
            # lines are meaningless without an epoch
            continue
        epoch = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 1000
        for k, v in arrow_export_seq(row, with_rates):
            if k == "datetime":
                continue
            paths.append(f"{prefix}.{k}")
            values.append(v)
            epochs.append(epoch)
    return pa.table(
        {
            "path": pa.array(paths, type=pa.string()),
            "value": pa.array(values, type=pa.string()),
            "epoch": pa.array(epochs, type=pa.int64()),
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
