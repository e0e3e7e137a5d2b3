"""CLI entry point — the Ray-Data twin of the reference CLI
(Main.scala:36-73): ``python -m gcflow.run --input <transcripts.parquet>
[--heap-stats] [--format parquet|tsv|graphite] [--delimiter C] [--prefix P]
[--limit N] [--out DIR] [--salt-turns N] [--resume]``.

Submittable via ``ray job submit -- python -m gcflow.run ...`` on a real
cluster; standalone it owns its Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gcflow")
    p.add_argument("--input", required=True, help="transcripts parquet file/dir/glob")
    p.add_argument("--out", default="/tmp/gcflow_out", help="output directory")
    p.add_argument(
        "--heap-stats", action="store_true",
        help="input includes -XX:+PrintHeapAtGC blocks (≙ reference --heap-stats)",
    )
    p.add_argument(
        "--format", default="parquet", choices=["parquet", "tsv", "graphite"],
        help="sink format (≙ reference --format; parquet = per-sink fan-out)",
    )
    p.add_argument("--delimiter", default="\t", help="TSV field delimiter")
    p.add_argument("--prefix", default="gc", help="graphite metric path prefix")
    p.add_argument("--dest", default=None, metavar="HOST:PORT",
                   help="graphite TCP destination (≙ reference --dest, "
                        "OutputSink.scala:18-36); with --format graphite, "
                        "streams lines over one socket instead of parquet")
    p.add_argument("--limit", type=int, default=None, help="emit at most N events (≙ -n)")
    p.add_argument("--no-enrich", action="store_true")
    p.add_argument("--salt-turns", type=int, default=None,
                   help="enable skew-aware salting with this chunk size")
    p.add_argument("--auto-salt", action="store_true",
                   help="probe conversation sizes from a sample and salt "
                        "automatically when a hot conversation is detected")
    p.add_argument("--run-local", action="store_true",
                   help="shuffle-light mode for conversation-ordered input "
                        "(each block a contiguous (conv,turn)-sorted slice); "
                        "wins when events are much rarer than lines")
    p.add_argument("--resume", action="store_true",
                   help="checkpointed shard runner: skip shards with lineage records")
    p.add_argument("--num-shards", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--stitch-impl", default="vec", choices=["py", "vec"],
                   help="basic-mode stitcher: extract_regex fast path "
                        "(default) or the pure-python recursive-descent sweep")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False

    from gcflow import pipeline as pl
    from gcflow import sinks
    from gcflow.stitch import MODE_BASIC, MODE_HEAP_STATS

    mode = MODE_HEAP_STATS if args.heap_stats else MODE_BASIC

    if args.resume:
        from gcflow import checkpoint as cp

        files = sorted(glob.glob(args.input)) or [args.input]
        if len(files) == 1 and os.path.isdir(files[0]):
            files = sorted(glob.glob(os.path.join(files[0], "*.parquet")))
        result = cp.run_checkpointed(
            files, args.out, num_shards=args.num_shards, mode=mode,
            enrich=not args.no_enrich, resume=True,
        )
        print(json.dumps(result))
        ray.shutdown()
        return 0

    if args.format == "parquet":
        m = pl.run_pipeline(
            args.input, out_dir=args.out, mode=mode, enrich=not args.no_enrich,
            limit=args.limit, salt_turns=args.salt_turns,
            stitch_impl=args.stitch_impl, stats=True,
        )
        counts = {
            f"{r['sink']}/{r['event_type']}": int(r["n"])
            for r in m["sink_counts"].to_pylist()
        }
        print(json.dumps({
            "format": "parquet", "out": args.out, "sink_counts": counts,
            "events_total": m["events_total"],
            "turns_in": m.get("turns_in"), "turns_kept": m.get("turns_kept"),
        }))
        ray.shutdown()
        return 0

    ds = pl.read_transcripts(args.input)
    if args.run_local:
        events = pl.parse_events_runlocal(
            ds, mode=mode, enrich=not args.no_enrich, stitch_impl=args.stitch_impl
        )
    elif args.auto_salt:
        events = pl.parse_events_auto(ds, mode=mode, enrich=not args.no_enrich)
    elif args.salt_turns:
        events = pl.parse_events_salted(
            ds, mode=mode, enrich=not args.no_enrich, salt_turns=args.salt_turns
        )
    else:
        events = pl.parse_events(
            ds, mode=mode, enrich=not args.no_enrich, stitch_impl=args.stitch_impl
        )
    if args.limit is not None:
        events = events.limit(args.limit)  # ≙ reference --limit (Main.scala:28)

    os.makedirs(args.out, exist_ok=True)
    if args.format == "tsv":
        out = os.path.join(args.out, "events.tsv")
        sinks.write_tsv(events, out, delimiter=args.delimiter)
        print(json.dumps({"format": "tsv", "path": out}))
    elif args.dest:
        n = sinks.send_graphite(events, args.dest, prefix=args.prefix)
        print(json.dumps({"format": "graphite", "dest": args.dest, "lines": n}))
    else:
        out = os.path.join(args.out, "graphite")
        sinks.graphite_ds(events, prefix=args.prefix).write_parquet(out)
        print(json.dumps({"format": "graphite", "path": out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
