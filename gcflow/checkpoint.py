"""Per-partition checkpointing with lineage + metrics records (SURVEY.md §4).

The unit of resume is an *input shard* (one or more input parquet files).
Each shard runs the full parse→enrich→route pipeline into its own output
directory ``out/shard=K/sink=<name>/...`` and, on success, atomically
writes ``out/_lineage/K.json`` recording inputs, row counts, per-sink
counts and duration.  A rerun skips every shard whose lineage record
exists — no stage reparses finished work.

At cluster scale each shard is large enough to saturate the cluster on
its own (shards are a resumability boundary, not a parallelism unit —
parallelism comes from Ray Data blocks *within* a shard).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

import pyarrow.compute as pc

from . import pipeline as pl


def shard_inputs(files: list, num_shards: int) -> list:
    files = sorted(files)
    shards = [files[i::num_shards] for i in range(num_shards)]
    return [s for s in shards if s]


def lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def completed_shards(out_dir: str) -> set:
    d = lineage_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    return {int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")}


def _remove_lineage(out_dir: str, k: int) -> None:
    try:
        os.remove(os.path.join(lineage_dir(out_dir), f"{k}.json"))
    except FileNotFoundError:
        pass


def _prune_stale_shards(out_dir: str, num_shards: int) -> list:
    """Delete shard output dirs and lineage records at indices >= num_shards
    (left behind when the shard count shrinks between runs)."""
    pruned = []
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if name.startswith("shard="):
                try:
                    k = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if k >= num_shards:
                    shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
                    pruned.append(k)
    for k in completed_shards(out_dir):
        if k >= num_shards:
            _remove_lineage(out_dir, k)
            if k not in pruned:
                pruned.append(k)
    return pruned


def run_checkpointed(
    input_files: list,
    out_dir: str,
    num_shards: int = 8,
    mode: str = "basic",
    enrich: bool = True,
    resume: bool = True,
) -> dict:
    """Run the pipeline shard-by-shard with resume; returns run metrics
    including which shards were skipped."""
    os.makedirs(lineage_dir(out_dir), exist_ok=True)
    shards = shard_inputs(input_files, num_shards)
    done = completed_shards(out_dir) if resume else set()
    ran, skipped, invalidated = [], [], []
    # A shard-count or input-list change can leave whole shard dirs (and
    # lineage records) at indices past the new shard count — readers of the
    # sink directories would double-count them.  Prune them up front.
    _prune_stale_shards(out_dir, len(shards))
    for k, files in enumerate(shards):
        if k in done:
            # a lineage record only skips the shard if it still covers the
            # SAME inputs — input-list drift silently remapping shards
            # would otherwise skip unprocessed data
            with open(os.path.join(lineage_dir(out_dir), f"{k}.json")) as f:
                record = json.load(f)
            if record.get("inputs") == files:
                skipped.append(k)
                continue
            invalidated.append(k)
        t0 = time.perf_counter()
        shard_out = os.path.join(out_dir, f"shard={k}")
        # SinkWriter appends fresh uuid-named part files; an invalidated or
        # crash-interrupted shard must start from an empty directory or the
        # old parts survive alongside the new ones and double-count.
        shutil.rmtree(shard_out, ignore_errors=True)
        _remove_lineage(out_dir, k)
        ds = pl.read_transcripts(files)
        turns_in = ds.count()
        events = pl.parse_events(ds, mode=mode, enrich=enrich)
        import pyarrow as pa

        partials = events.map_batches(
            pl.SinkWriter,
            fn_constructor_args=(shard_out,),
            batch_format="pyarrow",
            batch_size=32768,
            concurrency=(1, 8),
        )
        agg = partials.groupby(["sink", "event_type"]).sum("n_partial").to_pandas()
        if len(agg) == 0:
            counts = pa.table(
                {
                    "sink": pa.array([], type=pa.string()),
                    "event_type": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        else:
            counts = pa.Table.from_pandas(agg).rename_columns(["sink", "event_type", "n"])
        record = {
            "shard": k,
            "inputs": files,
            "turns_in": int(turns_in),
            "events_out": int(pc.sum(counts["n"]).as_py() or 0),
            "sink_counts": {
                f"{s}/{e}": int(n)
                for s, e, n in zip(
                    counts["sink"].to_pylist(),
                    counts["event_type"].to_pylist(),
                    counts["n"].to_pylist(),
                )
            },
            "duration_sec": round(time.perf_counter() - t0, 3),
        }
        tmp = os.path.join(lineage_dir(out_dir), f"{k}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f)
        os.replace(tmp, os.path.join(lineage_dir(out_dir), f"{k}.json"))
        ran.append(k)
    return {
        "ran": ran,
        "skipped": skipped,
        "invalidated": invalidated,
        "num_shards": len(shards),
    }
