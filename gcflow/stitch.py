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


def stitch_bucket(group: pa.Table, mode: str = MODE_BASIC, impl: str = "py") -> pa.Table:
    """Bucket group function: all turns of `hash(conv)%NB == b` → event
    rows for every conversation in the bucket.

    ``impl="vec"`` (basic mode only, the default there) uses the
    extract_regex fast path (gcflow/stitch_vec.py, proven equal in
    tests).  Since the three-line tenuring construct got its own
    vectorized triple matcher, vec wins on both single-line-dominated
    logs and the tenuring-heavy bench corpus (27.4s vs 40.7s at 10M
    turns/32 CPUs, same session).  ``impl="py"`` keeps the pure
    recursive-descent sweep (reference-exact path, all modes)."""
    if impl == "vec" and mode == MODE_BASIC:
        from .stitch_vec import stitch_bucket_vec

        return stitch_bucket_vec(group)
    if impl == "vec" and mode == MODE_HEAP_STATS:
        from .stitch_vec_heap import stitch_bucket_vec_heap

        return stitch_bucket_vec_heap(group)
    return stitch_bucket_py(group, mode)


def stitch_bucket_py(group: pa.Table, mode: str = MODE_BASIC) -> pa.Table:
    """Pure-python bucket sweep (the reference-exact path for all modes)."""
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


# ----------------------------------------------------- skew-aware salting
#
# A single enormous conversation would serialize one bucket.  The salted
# path splits every conversation into chunks of ``salt_turns`` turns keyed
# (conv_id, salt = turn_idx // salt_turns) and parses each chunk locally,
# EXCEPT the lines around chunk boundaries, which are re-stitched per
# conversation in a (tiny) second shuffle:
#
#   stage A (bucket of (conv, salt)):  parse [first_safe, last_safe) of the
#       chunk; lines before the first safe-start and from the last
#       safe-start onward become *residue* rows;
#   stage B (bucket of (conv, boundary)): tail-of-chunk-k ++ head-of-
#       chunk-k+1 are adjacent line runs — parse each run independently;
#   stage C (bucket of conv): vectorized rate scan over ALL events of the
#       conversation in turn order (rates need the global per-conv event
#       sequence; events ≪ lines so this shuffle is small).
#
# A *safe start* is a line no event can cross: in basic mode any
# digit-initial line (no multi-line construct has a digit-initial interior
# line); in heap-stats mode a '{' line (blocks don't nest; every
# DetailedEvent starts at '{').  Cutting the line stream at safe starts
# and parsing segments independently therefore yields exactly the
# whole-stream events.  (Known deviation, as in the reference: a truncated
# CMS line whose " real=" scan crosses lines could straddle a cut — the
# reference's own grammar mis-handles that shape, ParserTest.scala:420-426.)

RESIDUE_SINK = "__residue"


def _safe_starts(texts: list, mode: str) -> list:
    # ASCII digits only (GC logs are ASCII; str.isdigit would also claim
    # Unicode digits and diverge from the vec twin's RE2 ``^[0-9]``)
    if mode == MODE_HEAP_STATS:
        return [i for i, t in enumerate(texts) if t.startswith("{")]
    return [i for i, t in enumerate(texts) if t[:1] in "0123456789"]


def parse_segment(
    cols: EventColumns,
    conv_id: str,
    texts: list,
    turn_idx,
    roles: list,
    tools: list,
    mode: str,
    raise_on_crash: bool = False,
) -> None:
    """Parse one contiguous line run, emitting events with rate fields
    zeroed (stage C overwrites them).  ``raise_on_crash=True`` propagates
    GrammarCrash to the caller (the vec path aborts and re-parses the
    whole conversation to reproduce the reference's conversation-level
    crash granularity) instead of emitting a run-local error row."""
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
        if raise_on_crash:
            raise
        cols.append_error(conv_id, int(turn_idx[0]), str(e))
        return
    for i, (event, pos) in enumerate(spans):
        line = bisect_right(offsets, pos) - 1
        cols.append_event(
            conv_id,
            i,
            int(turn_idx[line]),
            roles[line],
            tools[line],
            ev.EventWithRates(event, 0, 0),
        )


def stitch_salted_chunk(group: pa.Table, mode: str, salt_turns: int) -> pa.Table:
    """Stage A: parse chunk interiors, emit residue rows for boundaries.

    Output schema: EVENT_SCHEMA + res_text (residue rows use
    sink=RESIDUE_SINK, event_seq = boundary id, gc_cause = raw text is in
    res_text; role/tool/turn_idx preserved)."""
    df = pd.DataFrame(
        {
            "conv_id": group["conv_id"].to_pylist(),
            "salt": group["salt"].to_numpy(zero_copy_only=False),
            "turn_idx": group["turn_idx"].to_numpy(zero_copy_only=False),
            "text": group["text"].to_pylist(),
            "role": group["role"].to_pylist(),
            "tool": group["tool"].to_pylist(),
        }
    ).sort_values(["conv_id", "salt", "turn_idx"], kind="stable")

    conv = df["conv_id"].to_numpy()
    salt = df["salt"].to_numpy()
    key_change = np.flatnonzero((conv[1:] != conv[:-1]) | (salt[1:] != salt[:-1])) + 1
    starts = np.concatenate(([0], key_change))
    ends = np.concatenate((key_change, [len(conv)]))

    turn = df["turn_idx"].to_numpy()
    texts = df["text"].to_list()
    roles = df["role"].to_list()
    tools = df["tool"].to_list()

    cols = EventColumns()
    res = {
        k: []
        for k in ("conv_id", "salt", "kind", "turn_idx", "role", "tool", "res_text")
    }

    def emit_residue(cid, chunk_salt, kind, lo, hi):
        for j in range(lo, hi):
            res["conv_id"].append(cid)
            res["salt"].append(chunk_salt)
            res["kind"].append(kind)
            res["turn_idx"].append(int(turn[j]))
            res["role"].append(roles[j])
            res["tool"].append(tools[j])
            res["res_text"].append(texts[j])

    for s, e in zip(starts, ends):
        cid = conv[s]
        chunk_salt = int(salt[s])
        seg_texts = texts[s:e]
        safe = _safe_starts(seg_texts, mode)
        if not safe:
            # no safe start at all: the whole chunk is one residue run —
            # 'full' (extends both boundaries) unless it's the first chunk,
            # which can only extend rightward ('tail')
            emit_residue(cid, chunk_salt, "full" if chunk_salt != 0 else "tail", s, e)
            continue
        s0 = 0 if chunk_salt == 0 else safe[0]
        s_last = safe[-1]
        if s_last < s0:  # unreachable (safe non-empty, s0 <= safe[0])
            s_last = s0
        if chunk_salt != 0 and s0 > 0:
            emit_residue(cid, chunk_salt, "head", s, s + s0)
        emit_residue(cid, chunk_salt, "tail", s + s_last, e)
        parse_segment(
            cols, cid, seg_texts[s0:s_last], turn[s + s0 : s + s_last],
            roles[s + s0 : s + s_last], tools[s + s0 : s + s_last], mode,
        )

    events = cols.to_table()
    n_ev = len(events)
    n_res = len(res["conv_id"])
    res_text_col = pa.array([None] * n_ev + res["res_text"], type=pa.string())
    if n_res:
        # residue rows ride the event schema: sink=RESIDUE_SINK,
        # event_seq=salt, event_type=kind (head|tail|full)
        res_cols = EventColumns()
        for i in range(n_res):
            res_cols.append_error(res["conv_id"][i], res["turn_idx"][i], "")
        res_tab = res_cols.to_table()

        def set_col(tab, name, arr, typ):
            return tab.set_column(
                tab.schema.get_field_index(name), name, pa.array(arr, type=typ)
            )

        res_tab = set_col(res_tab, "sink", [RESIDUE_SINK] * n_res, pa.string())
        res_tab = set_col(res_tab, "event_seq", res["salt"], pa.int32())
        res_tab = set_col(res_tab, "event_type", res["kind"], pa.string())
        res_tab = set_col(res_tab, "role", res["role"], pa.string())
        res_tab = set_col(res_tab, "tool", res["tool"], pa.string())
        out = pa.concat_tables([events, res_tab])
    else:
        out = events
    return out.append_column("res_text", res_text_col)


def stitch_residue_runs(group: pa.Table, mode: str) -> pa.Table:
    """Stage B: reassemble boundary runs per conversation.

    Residue rows carry (salt, kind).  Within a conversation (sorted by
    turn_idx), a *run* is a maximal chain
    ``tail(k) ∘ full(k+1) ∘ … ∘ full(m-1) ∘ head(m)`` — a segment of kind
    head/full continues the previous run iff that run's last segment was
    tail/full of the immediately preceding salt chunk (adjacent by
    construction: tails extend to their chunk's end, heads start at their
    chunk's start).  Each run is a contiguous line slice of the original
    conversation and is parsed independently."""
    df = pd.DataFrame(
        {
            "conv_id": group["conv_id"].to_pylist(),
            "salt": group["event_seq"].to_numpy(zero_copy_only=False),
            "kind": group["event_type"].to_pylist(),
            "turn_idx": group["turn_idx"].to_numpy(zero_copy_only=False),
            "text": group["res_text"].to_pylist(),
            "role": group["role"].to_pylist(),
            "tool": group["tool"].to_pylist(),
        }
    ).sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = df["conv_id"].to_numpy()
    salt = df["salt"].to_numpy()
    kind = df["kind"].to_numpy()
    # segment = same (conv, salt, kind) contiguous block
    seg_change = np.flatnonzero(
        (conv[1:] != conv[:-1]) | (salt[1:] != salt[:-1]) | (kind[1:] != kind[:-1])
    ) + 1
    seg_starts = np.concatenate(([0], seg_change))
    seg_ends = np.concatenate((seg_change, [len(conv)]))

    turn = df["turn_idx"].to_numpy()
    texts = df["text"].to_list()
    roles = df["role"].to_list()
    tools = df["tool"].to_list()
    cols = EventColumns()

    run: list = []  # list of (start, end) slices forming the current run
    prev = None  # (conv, salt, kind) of previous segment

    def flush():
        if not run:
            return
        idxs = [j for s, e in run for j in range(s, e)]
        parse_segment(
            cols,
            conv[run[0][0]],
            [texts[j] for j in idxs],
            turn[idxs],
            [roles[j] for j in idxs],
            [tools[j] for j in idxs],
            mode,
        )

    for s, e in zip(seg_starts, seg_ends):
        key = (conv[s], int(salt[s]), kind[s])
        chains = (
            prev is not None
            and prev[0] == key[0]
            and prev[1] == key[1] - 1
            and prev[2] in ("tail", "full")
            and key[2] in ("head", "full")
        )
        if not chains:
            flush()
            run = []
        run.append((s, e))
        prev = key
    flush()
    return cols.to_table()


# ----------------------------------------------- run-local (shuffle-light)
#
# When the input is conversation-ordered (sorted by conv_id, turn_idx —
# the realistic layout for logs landed in arrival order), shuffling every
# text row just to co-locate conversations is wasted movement.  The
# run-local mode parses each INPUT BLOCK in place (no text shuffle at
# all): within a block, each conversation fragment parses its safe
# interior and emits boundary residues plus one *marker* row per parsed
# interior.  Stage B groups residues+markers per conversation (tiny):
# sorted by turn, maximal residue sequences WITHOUT an intervening marker
# are contiguous line runs (markers stand for the already-parsed spans
# between them) and are parsed independently.  Stage C is the same
# vectorized per-conversation rate pass as the salted path — the only
# sizable shuffle left is numeric event rows.
#
# CONTRACT: input blocks must be contiguous slices of a (conv_id,
# turn_idx)-sorted stream.  A block that holds a conversation's lines
# with *gaps* (other blocks holding interleaved turns) would parse a
# non-contiguous interior as if adjacent — use parse_events (full
# shuffle) or parse_events_salted for unordered inputs.

MARKER_SINK = "__marker"


def stitch_runlocal_block(batch: pa.Table, mode: str, impl: str = "vec") -> pa.Table:
    """Stage A (run-local): parse one input block in place.

    ``impl="vec"`` (default) routes every fragment's safe interior
    through the vectorized stitcher in ONE call per block
    (``interior=True`` variant of stitch_vec / stitch_vec_heap: fast
    regex claims, python descent only for residual runs, rates left to
    stage C) — stage A was the last per-fragment pure-python hot loop on
    the run-local path.  ``impl="py"`` keeps the parse_segment-per-
    fragment reference twin (proven equal in tests/test_runlocal.py)."""
    if impl == "vec":
        return _stitch_runlocal_block_vec(batch, mode)
    df = pd.DataFrame(
        {
            "conv_id": batch["conv_id"].to_pylist(),
            "turn_idx": batch["turn_idx"].to_numpy(zero_copy_only=False),
            "text": batch["text"].to_pylist(),
            "role": batch["role"].to_pylist(),
            "tool": batch["tool"].to_pylist(),
        }
    ).sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = df["conv_id"].to_numpy()
    change = np.flatnonzero(conv[1:] != conv[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(conv)]))
    turn = df["turn_idx"].to_numpy()
    texts = df["text"].to_list()
    roles = df["role"].to_list()
    tools = df["tool"].to_list()

    cols = EventColumns()
    res = {k: [] for k in ("conv_id", "turn_idx", "role", "tool", "res_text", "is_marker")}

    def emit_res(lo, hi):
        for j in range(lo, hi):
            res["conv_id"].append(conv[j])
            res["turn_idx"].append(int(turn[j]))
            res["role"].append(roles[j])
            res["tool"].append(tools[j])
            res["res_text"].append(texts[j])
            res["is_marker"].append(False)

    for s, e in zip(starts, ends):
        seg_texts = texts[s:e]
        safe = _safe_starts(seg_texts, mode)
        if not safe or safe[-1] == safe[0]:
            emit_res(s, e)  # nothing safely parseable in place
            continue
        s0, s_last = safe[0], safe[-1]
        emit_res(s, s + s0)
        emit_res(s + s_last, e)
        # marker: "the span starting at turn[s+s0] was parsed in place"
        res["conv_id"].append(conv[s])
        res["turn_idx"].append(int(turn[s + s0]))
        res["role"].append(None)
        res["tool"].append(None)
        res["res_text"].append(None)
        res["is_marker"].append(True)
        parse_segment(
            cols, conv[s], seg_texts[s0:s_last], turn[s + s0 : s + s_last],
            roles[s + s0 : s + s_last], tools[s + s0 : s + s_last], mode,
        )

    events = cols.to_table()
    n_ev = len(events)
    n_res = len(res["conv_id"])
    res_text_col = pa.array([None] * n_ev + res["res_text"], type=pa.string())
    if n_res:
        res_cols = EventColumns()
        for i in range(n_res):
            res_cols.append_error(res["conv_id"][i], res["turn_idx"][i], "")
        res_tab = res_cols.to_table()

        def set_col(tab, name, arr, typ):
            return tab.set_column(
                tab.schema.get_field_index(name), name, pa.array(arr, type=typ)
            )

        res_tab = set_col(
            res_tab, "sink",
            [MARKER_SINK if m else RESIDUE_SINK for m in res["is_marker"]],
            pa.string(),
        )
        res_tab = set_col(res_tab, "role", res["role"], pa.string())
        res_tab = set_col(res_tab, "tool", res["tool"], pa.string())
        res_tab = set_col(res_tab, "event_type", [""] * n_res, pa.string())
        out = pa.concat_tables([events, res_tab])
    else:
        out = events
    return out.append_column("res_text", res_text_col)


def _stitch_runlocal_block_vec(batch: pa.Table, mode: str) -> pa.Table:
    """Vec twin of the py stage A: classify safe starts with one Arrow
    kernel, slice every fragment's interior [first_safe, last_safe) and
    stitch ALL interiors in one ``interior=True`` vec-stitcher call;
    only the (few) boundary residue/marker rows touch python."""
    import pyarrow.compute as pc

    from .schema import EVENT_SCHEMA
    from .stitch_vec import _as_array, stitch_bucket_vec
    from .stitch_vec_heap import _concat_ranges, stitch_bucket_vec_heap

    n = len(batch)
    if n == 0:
        return EVENT_SCHEMA.empty_table().append_column(
            "res_text", pa.array([], type=pa.string())
        )
    order = pc.sort_indices(
        batch, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    t = batch.take(order)
    text = _as_array(t["text"])
    conv_arr = _as_array(t["conv_id"])
    role_arr = _as_array(t["role"])
    tool_arr = _as_array(t["tool"])
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)
    codes = _as_array(pc.dictionary_encode(t["conv_id"])).indices.to_numpy(
        zero_copy_only=False
    )

    # fragment bounds (one contiguous fragment per conversation per block)
    change = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))

    # vectorized safe-start classification — same cut rule as _safe_starts
    if mode == MODE_HEAP_STATS:
        safe = pc.starts_with(text, "{")
    else:
        safe = pc.match_substring_regex(text, r"^[0-9]")
    safe_idx = np.flatnonzero(
        pc.fill_null(safe, False).to_numpy(zero_copy_only=False)
    )

    if len(safe_idx):
        lo_pos = np.searchsorted(safe_idx, starts)  # first safe ≥ start
        hi_pos = np.searchsorted(safe_idx, ends) - 1  # last safe < end
        has_int = hi_pos > lo_pos  # ≥2 safe lines → non-empty interior
        int_lo = safe_idx[np.clip(lo_pos, 0, len(safe_idx) - 1)]
        int_hi = safe_idx[np.clip(hi_pos, 0, len(safe_idx) - 1)]
    else:
        has_int = np.zeros(len(starts), dtype=bool)
        int_lo = int_hi = np.zeros(len(starts), dtype=np.int64)

    idx_int, _ = _concat_ranges(int_lo[has_int], (int_hi - int_lo)[has_int])
    if len(idx_int):
        sub = t.take(pa.array(idx_int))
        if mode == MODE_HEAP_STATS:
            events = stitch_bucket_vec_heap(sub, interior=True)
        else:
            events = stitch_bucket_vec(sub, interior=True)
    else:
        events = EVENT_SCHEMA.empty_table()

    # boundary residues = complement of the interiors; one marker per
    # parsed interior at its first line's turn
    res_mask = np.ones(n, dtype=bool)
    res_mask[idx_int] = False
    res_rows = np.flatnonzero(res_mask)
    mark_rows = int_lo[has_int]
    n_resid = len(res_rows)
    n_mark = len(mark_rows)
    n_aux = n_resid + n_mark
    n_ev = len(events)
    if n_aux:
        aux_rows = np.concatenate((res_rows, mark_rows))
        aux_conv = conv_arr.take(pa.array(aux_rows)).to_pylist()
        aux_turn = turn[aux_rows]
        res_take = pa.array(res_rows)
        aux_role = role_arr.take(res_take).to_pylist() + [None] * n_mark
        aux_tool = tool_arr.take(res_take).to_pylist() + [None] * n_mark
        res_texts = text.take(res_take).to_pylist() + [None] * n_mark

        res_cols = EventColumns()
        for i in range(n_aux):
            res_cols.append_error(aux_conv[i], int(aux_turn[i]), "")
        res_tab = res_cols.to_table()

        def set_col(tab, name, arr, typ):
            return tab.set_column(
                tab.schema.get_field_index(name), name, pa.array(arr, type=typ)
            )

        res_tab = set_col(
            res_tab, "sink",
            [RESIDUE_SINK] * n_resid + [MARKER_SINK] * n_mark, pa.string(),
        )
        res_tab = set_col(res_tab, "role", aux_role, pa.string())
        res_tab = set_col(res_tab, "tool", aux_tool, pa.string())
        res_tab = set_col(res_tab, "event_type", [""] * n_aux, pa.string())
        out = pa.concat_tables([events, res_tab])
    else:
        res_texts = []
        out = events
    res_text_col = pa.array([None] * n_ev + res_texts, type=pa.string())
    return out.append_column("res_text", res_text_col)


def stitch_marker_runs(group: pa.Table, mode: str) -> pa.Table:
    """Stage B (run-local): per conversation, sorted by turn, a maximal
    sequence of residue rows with no marker between them is one contiguous
    line run — parse each run independently."""
    df = pd.DataFrame(
        {
            "conv_id": group["conv_id"].to_pylist(),
            "turn_idx": group["turn_idx"].to_numpy(zero_copy_only=False),
            "marker": np.asarray(group["sink"].to_pylist(), dtype=object) == MARKER_SINK,
            "text": group["res_text"].to_pylist(),
            "role": group["role"].to_pylist(),
            "tool": group["tool"].to_pylist(),
        }
    ).sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = df["conv_id"].to_numpy()
    marker = df["marker"].to_numpy()
    turn = df["turn_idx"].to_numpy()
    texts = df["text"].to_list()
    roles = df["role"].to_list()
    tools = df["tool"].to_list()

    cols = EventColumns()
    run: list = []
    run_conv = None

    def flush():
        if not run:
            return
        parse_segment(
            cols, run_conv, [texts[j] for j in run], turn[run],
            [roles[j] for j in run], [tools[j] for j in run], mode,
        )

    for i in range(len(conv)):
        if marker[i] or (run_conv is not None and conv[i] != run_conv):
            flush()
            run = []
            run_conv = None
            if marker[i]:
                continue
        if run_conv is None:
            run_conv = conv[i]
        run.append(i)
    flush()
    return cols.to_table()


def finish_conv_bucket(group: pa.Table, mode: str, marker_based: bool) -> pa.Table:
    """Final per-conversation-bucket stage shared by the salted and
    run-local paths: the group carries whole conversations' event rows AND
    their residue/marker rows (single shuffle, single upstream execution —
    filtering a lazy stage into two branches would re-execute it).  Parses
    the residue runs, unions with the in-place events, applies the
    vectorized rate pass."""
    sinks = np.asarray(group["sink"].to_pylist(), dtype=object)
    is_aux = (sinks == RESIDUE_SINK) | (sinks == MARKER_SINK)
    aux = group.filter(pa.array(is_aux))
    events = group.filter(pa.array(~is_aux)).drop_columns(["res_text"])
    if len(aux):
        if marker_based:
            extra = stitch_marker_runs(aux, mode)
        else:
            extra = stitch_residue_runs(aux, mode)
        events = pa.concat_tables([events, extra])
    return apply_rates_bucket(events)


def _segment_firsts(keys: np.ndarray) -> np.ndarray:
    """Boolean mask: first element of each equal-key run (keys sorted)."""
    first = np.empty(len(keys), dtype=bool)
    if len(keys):
        first[0] = True
        first[1:] = keys[1:] != keys[:-1]
    return first


def _jdiv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Java long division (truncate toward zero)."""
    q = np.zeros(len(a), dtype=np.int64)
    nz = b != 0
    q[nz] = np.sign(a[nz]) * np.sign(b[nz]) * (np.abs(a[nz]) // np.abs(b[nz]))
    return q


def apply_rates_bucket(group: pa.Table) -> pa.Table:
    """Stage C: vectorized per-conversation rate scan over event rows
    (RateCalculator.scala:5-43 semantics), ordered by turn_idx.  Assumes
    one event start per turn (one physical line per turn); nested columns
    pass through untouched (no pandas round-trip)."""
    conv_col = group["conv_id"]
    if isinstance(conv_col, pa.ChunkedArray):
        conv_col = conv_col.combine_chunks()  # one dictionary across chunks
    codes = conv_col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    turn = group["turn_idx"].to_numpy(zero_copy_only=False)
    # group by conv + turn order within conv is all the scan needs — no
    # lexicographic string sort required, integer codes suffice
    order = np.lexsort((turn, codes))
    t = group.take(pa.array(order))
    n = len(t)
    conv = codes[order]

    age_ms = np.floor(
        np.nan_to_num(t["jvm_age_seconds"].to_numpy(zero_copy_only=False)) * 1000
    ).astype(np.int64)
    sinks_np = np.asarray(t["sink"].to_pylist(), dtype=object)
    is_app = sinks_np == "app_stopped"
    # error rows carry NULL rate fields in the reference path (_stitch_one
    # pads them) — exclude them from the scan and keep their nulls
    is_err = sinks_np == "error"
    hb = t["heap_before_bytes"].to_numpy(zero_copy_only=False)
    ha = t["heap_after_bytes"].to_numpy(zero_copy_only=False)
    has_heap = ~pd.isna(hb)
    promoted = t["promoted_bytes"].to_numpy(zero_copy_only=False)

    sub = ~(is_app | is_err)
    conv_sub = conv[sub]
    first = _segment_firsts(conv_sub)
    ha_sub = np.nan_to_num(ha[sub])
    heap_sub = has_heap[sub]
    hb_sub = np.nan_to_num(hb[sub])
    age_sub = age_ms[sub]
    prev_ha = np.roll(ha_sub, 1)
    prev_heap = np.roll(heap_sub, 1)
    prev_age = np.roll(age_sub, 1)

    allocated = np.where(
        first,
        np.where(heap_sub, hb_sub, 0),
        np.where(heap_sub & prev_heap, hb_sub - prev_ha, 0),
    ).astype(np.int64)
    elapsed = np.where(first, age_sub, age_sub - prev_age).astype(np.int64)
    alloc_rate = _jdiv(allocated, elapsed)
    prom_sub = promoted[sub]
    prom_rate = np.zeros(len(allocated), dtype=np.int64)
    mask = (~pd.isna(prom_sub)) & (elapsed != 0)
    prom_rate[mask] = _jdiv(np.nan_to_num(prom_sub)[mask].astype(np.int64), elapsed[mask])

    def scatter(vals):
        out = np.zeros(n, dtype=np.int64)
        out[sub] = vals
        return pa.array(out, type=pa.int64(), mask=is_err)

    firsts_all = _segment_firsts(conv)
    seg_start = np.maximum.accumulate(np.where(firsts_all, np.arange(n), 0))
    seq = (np.arange(n) - seg_start).astype(np.int32)

    def set_col(tab, name, arr, typ):
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array(arr, type=typ)
        return tab.set_column(tab.schema.get_field_index(name), name, arr)

    t = set_col(t, "event_seq", seq, pa.int32())
    t = set_col(t, "allocated_bytes", scatter(allocated), pa.int64())
    t = set_col(t, "interval_ms", scatter(elapsed), pa.int64())
    t = set_col(t, "alloc_rate", scatter(alloc_rate), pa.int64())
    t = set_col(t, "promotion_rate", scatter(prom_rate), pa.int64())
    return t
