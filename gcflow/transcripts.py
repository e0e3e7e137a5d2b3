"""Deterministic synthetic transcript tables (the pipeline's only input).

Two generators, both producing the exact ``input_hint`` schema
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``:

1. :func:`fixture_transcripts` — the reference conformance corpus
   (tests/fixtures/*, ported per FIXTURES.md) turn-exploded: one physical
   log line per turn, conv_id = fixture stem.  Used by pytest parity tests
   and the sf0.001 flagship smoke.

2. :func:`transcripts_from_events` — a corpus derived *deterministically*
   from the driver-provided ``events`` table, so DuckDB oracles can
   reconstruct both the transcripts and every downstream aggregate by pure
   SQL arithmetic over ``events`` (see TRANSCRIPTS_SQL — the two
   definitions are mirrors and tested against each other).  Conversations
   inherit the events table's per-user row-count skew, which exercises the
   conv_id hash shuffle realistically.
"""

from __future__ import annotations

import os
from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "fixtures")

ROLES = ["user", "assistant", "tool"]
TOOLS = ["jvm", "gc", "", "monitor"]


def fixture_transcripts(fixtures_dir: str = _FIXTURES_DIR, names=None) -> pa.Table:
    """Turn-explode the conformance corpus: text[i] = i-th line, conv_id =
    fixture stem, deterministic role/tool/ts (FIXTURES.md §1)."""
    rows = {k: [] for k in TRANSCRIPT_SCHEMA.names}
    base_us = 1_600_000_000_000_000  # fixed epoch, deterministic
    for fname in sorted(names or os.listdir(fixtures_dir)):
        stem = fname.replace("-gc.log", "").replace(".txt", "").replace(".log", "")
        with open(os.path.join(fixtures_dir, fname)) as f:
            lines = f.read().split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        for i, line in enumerate(lines):
            rows["conv_id"].append(stem)
            rows["turn_idx"].append(i)
            rows["role"].append(ROLES[i % 3])
            rows["text"].append(line)
            rows["tool"].append(TOOLS[i % 4])
            rows["ts"].append(base_us + i * 1_000_000)
    return pa.Table.from_pydict(rows, schema=TRANSCRIPT_SCHEMA)


# --- events-derived corpus: Python and SQL are definitional mirrors -------
#
# Per events row (event_id, user_id, ts):
#   rank    = row_number() over (partition by user_id order by event_id) - 1
#   t       = event_id % 8          (template selector)
#   hb      = 1000000 + event_id % 100000      heap-before, K
#   ha      = 500000  + event_id % 90000       heap-after, K  (hb > ha always)
#   cap     = 2000000                          heap capacity, K
#   yb      = 900000  + event_id % 50000       young-before, K
#   ya      =           event_id % 40000       young-after, K
#   yc      = 1000000                          young capacity, K
#   pus     = 1000 + event_id % 900000         pause, micros
#   age     = event_id (whole seconds → exact float, exact *1000 truncation)
# Template t=4 is a three-turn event (tenuring block) — exercises stitching;
# t=7 is an ignorable junk line; t=6 is an AppStopped line; t=5 a CMS line.
# turn_idx = rank*4 + line_no (sparse but ordered); role/tool/ts vary per
# line so per-turn equality is a real check.

_T4_L1 = "Desired survivor size 129368064 bytes, new threshold 3 (max 15)"
_JUNK = "CommandLine flags: -XX:InitialHeapSize=268435456 -XX:+UseParallelGC"

TRANSCRIPTS_SQL = """
WITH ranked AS (
  SELECT event_id, user_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS rnk
  FROM events
), base AS (
  SELECT *, event_id % 8 AS t,
    1000000 + event_id % 100000 AS hb,
    500000 + event_id % 90000 AS ha,
    2000000 AS cap,
    900000 + event_id % 50000 AS yb,
    event_id % 40000 AS ya,
    1000000 AS yc,
    1000 + event_id % 900000 AS pus
  FROM ranked
), lines AS (
  SELECT event_id, user_id, ts, rnk, 0 AS line_no,
    CASE t
      WHEN 0 THEN printf('%d.000: [GC %dK->%dK(%dK), 0.%06d secs]', event_id, hb, ha, cap, pus)
      WHEN 1 THEN printf('%d.000: [GC (Allocation Failure)  %dK->%dK(%dK), 0.%06d secs]', event_id, hb, ha, cap, pus)
      WHEN 2 THEN printf('%d.000: [Full GC %dK->%dK(%dK), 0.%06d secs]', event_id, hb, ha, cap, pus)
      WHEN 3 THEN printf('%d.000: [Full GC (Ergonomics) [PSYoungGen: %dK->%dK(%dK)] [ParOldGen: %dK->%dK(%dK)] %dK->%dK(%dK), 0.%06d secs] [Times: user=1.42 sys=0.02, real=0.23 secs]', event_id, yb, ya, yc, hb, ha, cap, hb, ha, cap, pus)
      WHEN 4 THEN printf('%d.000: [GC (Allocation Failure)', event_id)
      WHEN 5 THEN printf('%d.000: [CMS-concurrent-mark: 0.035/0.035 secs] [Times: user=0.07 sys=0.00, real=0.03 secs]', event_id)
      WHEN 6 THEN printf('%d.000: Total time for which application threads were stopped: 0.%06d seconds, Stopping threads took: 0.0000176 seconds', event_id, pus)
      ELSE 'CommandLine flags: -XX:InitialHeapSize=268435456 -XX:+UseParallelGC'
    END AS text
  FROM base
  UNION ALL
  SELECT event_id, user_id, ts + INTERVAL 1 SECOND, rnk, 1,
    'Desired survivor size 129368064 bytes, new threshold 3 (max 15)'
  FROM base WHERE t = 4
  UNION ALL
  SELECT event_id, user_id, ts + INTERVAL 2 SECOND, rnk, 2,
    printf(' [PSYoungGen: %dK->%dK(%dK)] %dK->%dK(%dK), 0.%06d secs] [Times: user=0.24 sys=0.01, real=0.12 secs]', yb, ya, yc, hb, ha, cap, pus)
  FROM base WHERE t = 4
)
SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
       CAST(rnk * 4 + line_no AS INTEGER) AS turn_idx,
       CASE (event_id + line_no) % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
       text,
       CASE (event_id + line_no) % 4 WHEN 0 THEN 'jvm' WHEN 1 THEN 'gc' WHEN 2 THEN '' ELSE 'monitor' END AS tool,
       ts
FROM lines
"""


def _derive(eid: np.ndarray) -> dict:
    return {
        "t": eid % 8,
        "hb": 1_000_000 + eid % 100_000,
        "ha": 500_000 + eid % 90_000,
        "cap": np.full_like(eid, 2_000_000),
        "yb": 900_000 + eid % 50_000,
        "ya": eid % 40_000,
        "yc": np.full_like(eid, 1_000_000),
        "pus": 1000 + eid % 900_000,
    }


def transcripts_from_events(
    events_path: str, replicate: int = 1
) -> pa.Table:
    """Build the transcripts table from ``events.parquet`` (see module doc).

    ``replicate`` > 1 clones the corpus under fresh conv_ids (bench-only —
    the SQL mirror covers replicate=1).
    """
    t = pq.read_table(events_path, columns=["event_id", "user_id", "ts"])
    df = t.to_pandas()
    df = df.sort_values(["user_id", "event_id"], kind="stable").reset_index(drop=True)
    df["rnk"] = df.groupby("user_id").cumcount()
    eid = df["event_id"].to_numpy()
    d = _derive(eid)
    tt = d["t"]
    hb, ha, cap, yb, ya, yc, pus = (
        d["hb"], d["ha"], d["cap"], d["yb"], d["ya"], d["yc"], d["pus"]
    )

    line0 = np.empty(len(df), dtype=object)
    for i in range(len(df)):
        e, k = int(eid[i]), int(tt[i])
        if k == 0:
            line0[i] = f"{e}.000: [GC {hb[i]}K->{ha[i]}K({cap[i]}K), 0.{pus[i]:06d} secs]"
        elif k == 1:
            line0[i] = f"{e}.000: [GC (Allocation Failure)  {hb[i]}K->{ha[i]}K({cap[i]}K), 0.{pus[i]:06d} secs]"
        elif k == 2:
            line0[i] = f"{e}.000: [Full GC {hb[i]}K->{ha[i]}K({cap[i]}K), 0.{pus[i]:06d} secs]"
        elif k == 3:
            line0[i] = (
                f"{e}.000: [Full GC (Ergonomics) [PSYoungGen: {yb[i]}K->{ya[i]}K({yc[i]}K)]"
                f" [ParOldGen: {hb[i]}K->{ha[i]}K({cap[i]}K)] {hb[i]}K->{ha[i]}K({cap[i]}K),"
                f" 0.{pus[i]:06d} secs] [Times: user=1.42 sys=0.02, real=0.23 secs]"
            )
        elif k == 4:
            line0[i] = f"{e}.000: [GC (Allocation Failure)"
        elif k == 5:
            line0[i] = (
                f"{e}.000: [CMS-concurrent-mark: 0.035/0.035 secs]"
                " [Times: user=0.07 sys=0.00, real=0.03 secs]"
            )
        elif k == 6:
            line0[i] = (
                f"{e}.000: Total time for which application threads were stopped:"
                f" 0.{pus[i]:06d} seconds, Stopping threads took: 0.0000176 seconds"
            )
        else:
            line0[i] = _JUNK

    frames = []
    base = pd.DataFrame(
        {
            "event_id": eid,
            "user_id": df["user_id"].to_numpy(),
            "ts": df["ts"].to_numpy(),
            "rnk": df["rnk"].to_numpy(),
            "line_no": 0,
            "text": line0,
        }
    )
    frames.append(base)
    m4 = tt == 4
    if m4.any():
        sub = base[m4]
        l1 = sub.copy()
        l1["line_no"] = 1
        l1["text"] = _T4_L1
        l1["ts"] = l1["ts"] + np.timedelta64(1, "s")
        frames.append(l1)
        l2 = sub.copy()
        l2["line_no"] = 2
        l2["text"] = [
            f" [PSYoungGen: {yb[i]}K->{ya[i]}K({yc[i]}K)] {hb[i]}K->{ha[i]}K({cap[i]}K),"
            f" 0.{pus[i]:06d} secs] [Times: user=0.24 sys=0.01, real=0.12 secs]"
            for i in np.flatnonzero(m4)
        ]
        l2["ts"] = l2["ts"] + np.timedelta64(2, "s")
        frames.append(l2)

    out = pd.concat(frames, ignore_index=True)
    reps = []
    for r in range(replicate):
        rep = out if r == 0 else out.copy()
        suffix = "" if replicate == 1 else f"r{r}"
        rep = rep.assign(
            conv_id="c" + rep["user_id"].astype(str) + suffix,
            turn_idx=(rep["rnk"] * 4 + rep["line_no"]).astype("int32"),
            role=pd.Series((rep["event_id"] + rep["line_no"]) % 3).map(
                dict(enumerate(ROLES))
            ),
            tool=pd.Series((rep["event_id"] + rep["line_no"]) % 4).map(
                dict(enumerate(TOOLS))
            ),
        )
        reps.append(rep[["conv_id", "turn_idx", "role", "text", "tool", "ts"]])
    final = pd.concat(reps, ignore_index=True)
    # write conversation-ordered (the realistic log layout, and the
    # contract of the run-local shuffle-light mode); orderless for oracles
    final = final.sort_values(["conv_id", "turn_idx"], kind="stable")
    return pa.Table.from_pandas(final, schema=TRANSCRIPT_SCHEMA, preserve_index=False)


def heap_transcripts(n_convs: int, reps: int = 5) -> pa.Table:
    """Deterministic heap-at-GC-heavy corpus: each conversation repeats the
    fragment.txt block structure (two {}-blocks, ~23 lines/event) — the
    heap-stats-mode benchmark input (events ≪ lines)."""
    with open(os.path.join(_FIXTURES_DIR, "fragment.txt")) as f:
        frag = [l for l in f.read().split("\n") if l != ""]
    lines = frag * reps
    n = len(lines)
    rows = {k: [] for k in TRANSCRIPT_SCHEMA.names}
    base_us = 1_600_000_000_000_000
    for c in range(n_convs):
        cid = f"h{c}"
        rows["conv_id"].extend([cid] * n)
        rows["turn_idx"].extend(range(n))
        rows["text"].extend(lines)
        rows["role"].extend(ROLES[i % 3] for i in range(n))
        rows["tool"].extend(TOOLS[i % 4] for i in range(n))
        rows["ts"].extend(base_us + i * 1_000_000 for i in range(n))
    return pa.Table.from_pydict(rows, schema=TRANSCRIPT_SCHEMA)


def materialize_heap_transcripts(
    n_convs: int, reps: int = 5, out_root: str = "/tmp/gcflow_transcripts"
) -> str:
    out_dir = os.path.join(out_root, f"heap_c{n_convs}_r{reps}_sharded")
    marker = os.path.join(out_dir, "transcripts-000.parquet")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        write_sharded(heap_transcripts(n_convs, reps), out_dir)
    return out_dir


ROWS_PER_FILE = 400_000
MAX_CORPUS_FILES = 64


def write_sharded(table: pa.Table, out_dir: str, stem: str = "transcripts") -> None:
    """Write a conversation-ordered table as multiple parquet files with
    file boundaries on conversation boundaries.  A single-file corpus is
    read by ONE Ray task (then split), serializing the scan and gating
    every downstream stage — multi-file input parallelizes the read AND
    keeps every file a contiguous slice of the (conv, turn)-sorted stream
    (the run-local mode's block contract)."""
    n = len(table)
    n_files = max(1, min(MAX_CORPUS_FILES, n // ROWS_PER_FILE))
    conv = table["conv_id"].to_numpy(zero_copy_only=False) if n_files > 1 else None
    change = (
        np.flatnonzero(conv[1:] != conv[:-1]) + 1 if conv is not None else np.array([])
    )
    if n_files > 1 and len(change):
        targets = (np.arange(1, n_files) * n) // n_files
        cuts = change[np.minimum(np.searchsorted(change, targets), len(change) - 1)]
        cuts = np.unique(np.concatenate(([0], cuts, [n])))
    else:
        cuts = np.array([0, n])
    tmps = []
    for i in range(len(cuts) - 1):
        part = table.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i]))
        tmp = os.path.join(out_dir, f"{stem}-{i:03d}.parquet.tmp")
        pq.write_table(part, tmp)
        tmps.append(tmp)
    # rename shard 000 LAST — it is the completeness marker
    for tmp in reversed(tmps):
        os.replace(tmp, tmp[:-4])


def materialize_transcripts(
    sf_dir: str, out_root: str = "/tmp/gcflow_transcripts", replicate: int = 1
) -> str:
    """Write (idempotently) the events-derived transcripts parquet for an
    sf dir; returns the corpus directory (multi-file, conversation-aligned
    shards — see :func:`write_sharded`).  Keyed by sf basename +
    replication so repeated query runs reuse it."""
    tag = os.path.basename(os.path.normpath(sf_dir)) + (
        f"_x{replicate}" if replicate != 1 else ""
    )
    out_dir = os.path.join(out_root, tag + "_sharded")
    marker = os.path.join(out_dir, "transcripts-000.parquet")
    if not os.path.exists(marker):
        os.makedirs(out_dir, exist_ok=True)
        table = transcripts_from_events(
            os.path.join(sf_dir, "events.parquet"), replicate=replicate
        )
        write_sharded(table, out_dir)
    return out_dir
