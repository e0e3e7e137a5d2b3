"""Sink parity (TSV/graphite goldens from Arrow rows) + checkpoint/resume."""

import os

import pyarrow.parquet as pq
import pytest

from conftest import fixture_text

from gcflow import pipeline as pl
from gcflow import sinks
from gcflow import transcripts as tr
from gcflow.events import export_to_seq, rate_scan
from gcflow.grammar import parse_log


@pytest.fixture(scope="module")
def fragment_events(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(tr.fixture_transcripts(names=["fragment.txt"]))
    return pl.parse_events(ds, mode="basic", enrich=False)


def test_arrow_export_matches_event_export(ray_session):
    """The Arrow-row export (sink layer) must equal the event-object export
    for every event of the conformance corpus, rates included."""
    import ray.data as rd

    for fixture in ["basic-java8-gc.log", "fragment.txt", "details-java7-gc.log"]:
        events = rate_scan(parse_log(fixture_text(fixture)))
        want = ["\t".join(v for _, v in export_to_seq(e)) for e in events]
        ds = rd.from_arrow(tr.fixture_transcripts(names=[fixture]))
        rows = (
            pl.parse_events(ds, mode="basic", enrich=False)
            .to_pandas()
            .sort_values("event_seq")
        )
        got = [
            "\t".join(v for _, v in sinks.arrow_export_seq(row))
            for row in rows.to_dict("records")
        ]
        assert got == want, fixture


def test_graphite_golden(fragment_events):
    """OutputFormatTest.scala:9-29 golden: first fragment event, graphite
    long format, datetime excluded."""
    lines = sinks.graphite_lines(fragment_events, with_rates=False, limit=None)
    first_event_lines = lines[:14]
    assert first_event_lines == [
        "gc.age 524176.359 1449722814",
        "gc.type GC 1449722814",
        "gc.pause 0.18402 1449722814",
        "gc.heapBefore 3748762624 1449722814",
        "gc.heapAfter 2875555840 1449722814",
        "gc.heapReclaimed 873206784 1449722814",
        "gc.heapMax 4046913536 1449722814",
        "gc.PSYoungGenBefore 1096065024 1449722814",
        "gc.PSYoungGenAfter 78150656 1449722814",
        "gc.PSYoungGenReclaimed 1017914368 1449722814",
        "gc.PSYoungGenMax 1183580160 1449722814",
        "gc.promoted 144707584 1449722814",
        "gc.desiredSurvivorSize 248053760 1449722814",
        "gc.newThreshold 1 1449722814",
    ]


def test_tsv_sink(fragment_events, tmp_path):
    path = str(tmp_path / "out.tsv")
    sinks.write_tsv(fragment_events, path, with_rates=False)
    lines = open(path).read().rstrip("\n").split("\n")
    # header from FIRST event (schema-on-first-row), then one row per event
    assert lines[0].split("\t")[:4] == ["datetime", "age", "type", "pause"]
    assert len(lines) == 3
    assert lines[1].split("\t")[1] == "524176.359"


def test_tsv_union_schema_shards(ray_session, tmp_path):
    """schema="union" golden: a GLOBAL header covering every key any
    event emits (earliest-in-row position order), per-block shard files,
    missing keys as "" — and the per-event values agree cell-for-cell
    with the per-row export walk the sequential writer uses."""
    import ray.data as rd

    ds = rd.from_arrow(
        tr.fixture_transcripts(names=["fragment.txt", "basic-java8-gc.log"])
    )
    events = pl.parse_events(ds, mode="basic", enrich=False)
    out = str(tmp_path / "tsv_union")
    manifest = sinks.write_tsv(events, out, with_rates=False, schema="union")
    shards = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".tsv")
    )
    assert list(sorted(manifest["shard"])) == shards
    rows = []
    header = None
    for s in shards:
        lines = open(s).read().rstrip("\n").split("\n")
        if header is None:
            header = lines[0]
        assert lines[0] == header  # identical global header in every shard
        rows += lines[1:]
    cols = header.split("\t")
    # ties at in-row position 0 break by name ("age" < "datetime":
    # null-ts events start their walk at "age")
    assert cols[0] == "age" and "datetime" in cols
    assert len(rows) == int(manifest["rows"].sum())
    # every event's cells match its export walk; absent keys are ""
    want_rows = events.to_pandas().to_dict("records")
    want = set()
    for r in want_rows:
        cells = [""] * len(cols)
        for k, v in sinks.arrow_export_seq(r, with_rates=False):
            assert k in cols
            cells[cols.index(k)] = v
        want.add("\t".join(cells))
    assert set(rows) == want and len(rows) == len(want_rows)
    # re-run owns the directory: stale shards cleared, never accumulated
    manifest2 = sinks.write_tsv(events, out, with_rates=False, schema="union")
    shards2 = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".tsv")
    )
    assert shards2 == sorted(manifest2["shard"])
    assert int(manifest2["rows"].sum()) == len(want_rows)


def test_tsv_union_identical_blocks_not_collapsed(ray_session, tmp_path):
    """Byte-identical batches (a replicated log produces them) must each
    land their own shard: content-hash-only names would silently drop a
    full block while the manifest double-counts it."""
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(tr.fixture_transcripts(names=["fragment.txt"]))
    one = (
        pl.parse_events(ds, mode="basic", enrich=False)
        .limit(1)
        .take_batch(1, batch_format="pyarrow")
    )
    # 8192 copies of ONE row → map_batches(batch_size=4096) yields ≥2
    # byte-identical TSV blobs
    events = rd.from_arrow(pa.concat_tables([one] * 8192)).repartition(2)
    out = str(tmp_path / "tsv_dupblocks")
    manifest = sinks.write_tsv(events, out, with_rates=False, schema="union")
    assert len(manifest) >= 2  # really exercised the collision case
    disk_rows = 0
    for f in os.listdir(out):
        if f.endswith(".tsv"):
            disk_rows += len(open(os.path.join(out, f)).read()
                             .rstrip("\n").split("\n")) - 1  # minus header
    assert disk_rows == int(manifest["rows"].sum()) == 8192


def test_graphite_tcp_transport(fragment_events):
    """send_graphite streams the exact graphite_lines over one TCP
    connection (reference --dest host:port, OutputSink.scala:18-36)."""
    import socket
    import socketserver
    import threading

    received = []
    done = threading.Event()

    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                received.append(line.decode().rstrip("\n"))
            done.set()

    srv = socketserver.TCPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        want = sinks.graphite_lines(fragment_events, with_rates=False, limit=None)
        n = sinks.send_graphite(
            fragment_events, f"127.0.0.1:{port}", with_rates=False
        )
        assert done.wait(timeout=10)
        assert n == len(want)
        assert received == want
    finally:
        srv.shutdown()
        srv.server_close()


def test_checkpoint_resume(ray_session, tmp_path):
    from gcflow import checkpoint as cp

    # split the fixture corpus into 4 input files
    table = tr.fixture_transcripts()
    files = []
    for i in range(4):
        f = str(tmp_path / f"in_{i}.parquet")
        pq.write_table(table.slice(i * 150, 150), f)
        files.append(f)
    out = str(tmp_path / "out")
    r1 = cp.run_checkpointed(files, out, num_shards=4, enrich=False)
    assert len(r1["ran"]) == 4 and r1["skipped"] == []
    # resume: everything skipped
    r2 = cp.run_checkpointed(files, out, num_shards=4, enrich=False)
    assert r2["ran"] == [] and len(r2["skipped"]) == 4
    # drop one lineage record → only that shard reruns
    os.remove(os.path.join(cp.lineage_dir(out), "2.json"))
    r3 = cp.run_checkpointed(files, out, num_shards=4, enrich=False)
    assert r3["ran"] == [2] and len(r3["skipped"]) == 3
    # input-list drift invalidates stale lineage records instead of
    # silently skipping unprocessed data
    r4 = cp.run_checkpointed(files[:3], out, num_shards=4, enrich=False)
    assert r4["skipped"] == [0, 1, 2] and r4["invalidated"] == []
    r5 = cp.run_checkpointed(list(reversed(files)), out, num_shards=2, enrich=False)
    assert r5["invalidated"] == [0, 1] and r5["ran"] == [0, 1]


def _total_sink_rows(out_dir):
    total = 0
    for root, _, fs in os.walk(out_dir):
        if "_lineage" in root:
            continue
        for f in fs:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def test_checkpoint_rerun_output_not_duplicated(ray_session, tmp_path):
    """Invalidated/crash-interrupted shards and shard-count shrinks must not
    leave stale part files behind: total sink rows after any resume flow
    equal a fresh run's."""
    from gcflow import checkpoint as cp

    table = tr.fixture_transcripts()
    files = []
    for i in range(4):
        f = str(tmp_path / f"in_{i}.parquet")
        pq.write_table(table.slice(i * 150, 150), f)
        files.append(f)

    fresh4 = str(tmp_path / "fresh4")
    cp.run_checkpointed(files, fresh4, num_shards=4, enrich=False)
    want4 = _total_sink_rows(fresh4)
    assert want4 > 0

    out = str(tmp_path / "out")
    cp.run_checkpointed(files, out, num_shards=4, enrich=False)
    # crash-interrupted shard: lineage record lost but part files on disk
    os.remove(os.path.join(cp.lineage_dir(out), "1.json"))
    r = cp.run_checkpointed(files, out, num_shards=4, enrich=False)
    assert r["ran"] == [1]
    assert _total_sink_rows(out) == want4

    # shard-count shrink: shard dirs >= new count pruned, invalidated shards
    # rerun into clean dirs
    fresh2 = str(tmp_path / "fresh2")
    cp.run_checkpointed(files, fresh2, num_shards=2, enrich=False)
    want2 = _total_sink_rows(fresh2)
    cp.run_checkpointed(files, out, num_shards=2, enrich=False)
    assert _total_sink_rows(out) == want2
    assert not os.path.isdir(os.path.join(out, "shard=2"))
    assert cp.completed_shards(out) == {0, 1}


def test_graphite_table_matches_rowwise_export(ray_session):
    """The vectorized graphite unpivot must emit exactly the per-row
    arrow_export_seq lines (order, formatting, regions dedup, rates) over
    both basic and heap-stats conformance corpora."""
    import pyarrow as pa

    import gcflow.pipeline as pl
    from gcflow import transcripts as tr
    from ray.data import from_arrow

    for mode in ("basic", "heap"):
        events = pl.parse_events(
            from_arrow(tr.fixture_transcripts()), mode=mode
        ).to_arrow_refs()
        import ray as _ray

        table = pa.concat_tables([_ray.get(r) for r in events])
        for with_rates in (True, False):
            got = sinks.graphite_table(table, with_rates=with_rates)
            want_rows = []
            for row in table.to_pylist():
                ts = row["ts"]
                if ts is None or ts != ts:
                    continue
                epoch = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 1000
                for k, v in sinks.arrow_export_seq(row, with_rates):
                    if k == "datetime":
                        continue
                    want_rows.append((f"gc.{k}", v, epoch))
            got_rows = list(
                zip(got["path"].to_pylist(), got["value"].to_pylist(),
                    got["epoch"].to_pylist())
            )
            assert got_rows == want_rows, (mode, with_rates, len(got_rows), len(want_rows))
