"""Vectorized stitch for basic mode: C-speed regex extraction for the
dominant single-line event shapes, python descent only for residual
segments.

``pc.extract_regex`` (RE2) runs the fast-path patterns over the whole
line array at once; lines they match become event rows via Arrow/numpy
column ops with no per-line Python.  The minority of lines they don't
match (multi-line constructs, junk, odd shapes) form maximal consecutive
runs per conversation, parsed by the exact recursive-descent grammar.
Rates + event_seq come from the shared vectorized per-conversation pass
(stitch.apply_rates_bucket).

Equivalence argument (basic mode):
- no multi-line construct has a fast-matching interior line (tenuring /
  generation continuations start with 'D', '-', ' ', ':', '['),
- a fast line is a complete event; the grammar never extends an event
  into a following line except via the tenuring rules (slow lines) and
  the cross-line CMS " real=" scan — the reference's own broken shape
  (ParserTest.scala:420-426), excluded here exactly as in the salted and
  run-local paths,
- a trailing-``rest`` guard rejects lines where the grammar would parse a
  SECOND event after the first on the same line (rest starting with a
  digit) — those fall to the descent.
Heap-stats mode keeps the pure python stitcher ({}-block interiors can't
be judged line-locally).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import events as ev
from . import grammar
from .schema import EVENT_SCHEMA, EventColumns

_TS = r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}[+-]\d{4}"
_GEN = (
    r"(?:\d+\.\d+: )?\[[a-zA-Z0-9 \-]+: \d+[KM]->\d+[KM]\(\d+[KM]\)"
    r"(?:, \d+\.\d+ secs)?\]"
)
V_BASIC = (
    rf"^(?:(?P<ts>{_TS}): )?(?P<age>\d+\.\d+): \[(?P<gt>(?:Full )?GC) "
    rf"(?P<causewrap>\((?P<cause>[a-zA-Z ]*)\) *)?"
    rf"(?P<pre>(?:{_GEN}(?:, | |))*)"
    rf"(?P<hb>\d+)(?P<hbs>[KM])->(?P<ha>\d+)(?P<has>[KM])\((?P<hc>\d+)(?P<hcs>[KM])\)"
    rf"(?P<post>(?:(?:, | |){_GEN})*)"
    rf", (?P<pause>\d+\.\d+) secs\](?P<rest>.*)$"
)
V_CMS = (
    rf"^(?:(?P<ts>{_TS}): )?(?P<age>\d+\.\d+): \[(?P<gt>CMS[a-zA-Z\-]*)"
    rf"(?:(?P<close>\])|: [^\n]*? real=(?P<pause>\d+\.\d+) secs\])(?P<rest>.*)$"
)
V_APP = (
    rf"^(?:(?P<ts>{_TS}): )?(?P<age>\d+\.\d+): Total time for which application"
    rf" threads were stopped: (?P<stop>\d+\.\d+) seconds, Stopping threads took:"
    rf" (?P<tts>\d+\.\d+) seconds(?P<rest>.*)$"
)

# --- three-line interleaved tenuring construct (grammar: _collection_stats
# cause → _desired_survivor → _basic_event on the next lines;
# Parser.scala:22-26,60-66).  Line shapes:
#   L0  "age: [GC (cause)"            (nothing after the cause close)
#   L1  "Desired survivor size N bytes, new threshold T (..."
#       (grammar ignores the rest of the line; any "- age" table rows on
#       following lines make L2 fail the close pattern → descent)
#   L2  " [Gen: a->b(c)] hb->ha(hc), pause secs]..."  (the basic-event body)
V_TEN_OPEN = (
    rf"^(?:(?P<ts>{_TS}): )?(?P<age>\d+\.\d+): \[(?P<gt>(?:Full )?GC) "
    rf"\((?P<cause>[a-zA-Z ]*)\) *$"
)
V_TEN_DESIRED = (
    r"^Desired survivor size (?P<des>\d+) bytes, new threshold (?P<thr>\d+) \(.*$"
)
V_TEN_CLOSE = (
    rf"^ ?(?P<pre>(?:{_GEN}(?:, | |))*)"
    rf"(?P<hb>\d+)(?P<hbs>[KM])->(?P<ha>\d+)(?P<has>[KM])\((?P<hc>\d+)(?P<hcs>[KM])\)"
    rf"(?P<post>(?:(?:, | |){_GEN})*)"
    rf", (?P<pause>\d+\.\d+) secs\](?P<rest>.*)$"
)

_GEN_RE = re.compile(
    r"\[([a-zA-Z0-9 \-]+): (\d+[KM])->(\d+[KM])\((\d+[KM])\)(?:, \d+\.\d+ secs)?\]"
)


def _as_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    return col


def _field(struct: pa.StructArray, name: str) -> pa.Array:
    return struct.field(name)


def _guard(struct: pa.StructArray) -> pa.ChunkedArray:
    """Valid match AND the line's remainder can't start another event
    (grammar would emit two events from one line — send to descent)."""
    valid = pc.is_valid(struct)
    rest_first = pc.utf8_slice_codeunits(pc.fill_null(_field(struct, "rest"), ""), 0, 1)
    rest_ok = pc.invert(pc.match_substring_regex(rest_first, r"^[0-9]$"))
    return pc.and_(valid, rest_ok)


def _bytes_col(digits: pa.Array, suffix: pa.Array, mask: np.ndarray) -> np.ndarray:
    d = pc.cast(pc.if_else(pc.equal(digits, ""), "0", digits), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    is_m = pc.equal(pc.fill_null(suffix, ""), "M").to_numpy(zero_copy_only=False)
    mult = np.where(is_m, 1024 * 1024, 1024)
    return np.where(mask, d * mult, 0)


def _parse_ts_rows(ts_strs: list) -> tuple:
    """Per-row timestamp parse for the (minority of) rows with a ts."""
    epochs, offsets = [], []
    for s in ts_strs:
        if not s:
            epochs.append(None)
            offsets.append(None)
            continue
        ctx = grammar.Ctx(s)
        (epoch_ms, off), _ = grammar._timestamp(ctx, 0)
        epochs.append(epoch_ms)
        offsets.append(off)
    return epochs, offsets


def stitch_bucket_vec(group: pa.Table, interior: bool = False) -> pa.Table:
    """Basic-mode bucket stitcher (vectorized fast path).

    ``interior=True`` is the run-local stage-A variant: the table holds
    per-conversation contiguous *safe interiors* (not whole
    conversations), so events are emitted with rates/event_seq left for
    stage C's :func:`gcflow.stitch.apply_rates_bucket`, and a descent
    crash re-parses the conversation's interior with
    :func:`gcflow.stitch.parse_segment` semantics (one rates-zeroed
    error row) instead of the whole-conversation ``_stitch_one``."""
    order = pc.sort_indices(
        group, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    t = group.take(order)
    text = _as_array(t["text"])

    sb = _as_array(pc.extract_regex(text, V_BASIC))
    sc = _as_array(pc.extract_regex(text, V_CMS))
    sa = _as_array(pc.extract_regex(text, V_APP))

    m_basic = _guard(sb)
    # CMS-prefixed causes route to the CMS branch in the grammar
    # (Parser.scala:56-57) — never fast-handle them as basic
    cause_cms = pc.starts_with(pc.fill_null(_field(sb, "cause"), ""), "CMS")
    m_basic = pc.and_(m_basic, pc.invert(cause_cms)).to_numpy(zero_copy_only=False)
    m_cms = _guard(sc).to_numpy(zero_copy_only=False)
    m_app = _guard(sa).to_numpy(zero_copy_only=False)
    m_cms &= ~m_basic
    m_app &= ~(m_basic | m_cms)

    codes = _as_array(pc.dictionary_encode(t["conv_id"])).indices.to_numpy(
        zero_copy_only=False
    )
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)

    # three-line tenuring triples: L0 open at i, Desired at i+1, close at
    # i+2, all in one conversation.  The L0/L1/L2 patterns are mutually
    # exclusive with each other and with the single-line patterns, so a
    # row can only be claimed once — which also means the three scans only
    # need to run over the rows the single-line patterns did NOT match.
    n_rows = len(text)
    single = m_basic | m_cms | m_app
    resid_idx = np.flatnonzero(~single)
    mo = np.zeros(n_rows, dtype=bool)
    md = np.zeros(n_rows, dtype=bool)
    m3 = np.zeros(n_rows, dtype=bool)
    if len(resid_idx):
        rtext = text.take(pa.array(resid_idx))
        so = _as_array(pc.extract_regex(rtext, V_TEN_OPEN))
        sd = _as_array(pc.extract_regex(rtext, V_TEN_DESIRED))
        s3 = _as_array(pc.extract_regex(rtext, V_TEN_CLOSE))
        mo[resid_idx] = pc.and_(
            pc.is_valid(so),
            pc.invert(pc.starts_with(pc.fill_null(_field(so, "cause"), ""), "CMS")),
        ).to_numpy(zero_copy_only=False)
        md[resid_idx] = pc.is_valid(sd).to_numpy(zero_copy_only=False)
        m3[resid_idx] = _guard(s3).to_numpy(zero_copy_only=False)
    trip = np.zeros(n_rows, dtype=bool)
    ti3 = np.array([], dtype=np.int64)
    if n_rows >= 3:
        cand = (
            mo[:-2]
            & md[1:-1]
            & m3[2:]
            & (codes[:-2] == codes[1:-1])
            & (codes[1:-1] == codes[2:])
        )
        ti3 = np.flatnonzero(cand)
        trip[ti3] = True
        trip[ti3 + 1] = True
        trip[ti3 + 2] = True

    fast = m_basic | m_cms | m_app | trip

    tables = []

    # ---- slow segments: maximal consecutive non-fast runs per conv.
    # Crash granularity is per CONVERSATION in the reference (_stitch_one
    # parses the whole conv text; GrammarCrash aborts it into one error
    # row) — so a crashed run rolls the conversation back and re-parses it
    # whole via the python path, and its fast rows are dropped below.
    slow_idx = np.flatnonzero(~fast)
    cols = EventColumns()
    crashed_codes: list = []
    if len(slow_idx):
        slow_codes = codes[slow_idx]
        brk = np.flatnonzero(
            (np.diff(slow_idx) != 1) | (slow_codes[1:] != slow_codes[:-1])
        ) + 1
        seg_starts = np.concatenate(([0], brk))
        seg_ends = np.concatenate((brk, [len(slow_idx)]))
        conv_all = t["conv_id"].to_pylist()
        text_all = text.to_pylist()
        role_all = t["role"].to_pylist()
        tool_all = t["tool"].to_pylist()
        from .stitch import _stitch_one, parse_segment

        cur_code = -1
        cur_mark = 0
        cur_crashed = False
        for s, e in zip(seg_starts, seg_ends):
            idxs = slow_idx[s:e]
            code = slow_codes[s]
            if code != cur_code:
                cur_code, cur_mark, cur_crashed = code, cols.mark(), False
            if cur_crashed:
                continue  # conversation already aborted + re-parsed whole
            try:
                parse_segment(
                    cols,
                    conv_all[idxs[0]],
                    [text_all[j] for j in idxs],
                    turn[idxs],
                    [role_all[j] for j in idxs],
                    [tool_all[j] for j in idxs],
                    "basic",
                    raise_on_crash=True,
                )
            except grammar.GrammarCrash:
                cur_crashed = True
                crashed_codes.append(code)
                cols.truncate(cur_mark)
                full = np.flatnonzero(codes == code)  # ALL rows of the conv
                reparse = parse_segment if interior else _stitch_one
                reparse(
                    cols,
                    conv_all[full[0]],
                    [text_all[j] for j in full],
                    turn[full],
                    [role_all[j] for j in full],
                    [tool_all[j] for j in full],
                    "basic",
                )
    tables.append(cols.to_table())

    if crashed_codes:  # drop crashed convs' fast rows (replaced above)
        bad = np.isin(codes, np.asarray(crashed_codes))
        m_basic &= ~bad
        m_cms &= ~bad
        m_app &= ~bad
        ti3 = ti3[~bad[ti3]]

    # ---- fast basic rows
    bi = np.flatnonzero(m_basic)
    if len(bi):
        take = pa.array(bi)
        f = {n: _field(sb, n).take(take) for n in (
            "ts", "age", "gt", "causewrap", "cause", "pre", "post",
            "hb", "hbs", "ha", "has", "hc", "hcs", "pause",
        )}
        n = len(bi)
        ones = np.ones(n, dtype=bool)
        hb_b = _bytes_col(f["hb"], f["hbs"], ones)
        ha_b = _bytes_col(f["ha"], f["has"], ones)
        hc_b = _bytes_col(f["hc"], f["hcs"], ones)
        age = pc.cast(f["age"], pa.float64())
        pause = pc.cast(f["pause"], pa.float64())
        cause = pc.if_else(
            pc.equal(pc.fill_null(f["causewrap"], ""), ""),
            pa.scalar(None, type=pa.string()),
            f["cause"],
        )
        epochs, offsets = _parse_ts_rows(f["ts"].to_pylist())
        gens_col, promoted_col = _gens_promoted(
            f["gt"], f["pre"], f["post"], hb_b, ha_b
        )
        tables.append(
            _make_table(
                t, take, sink="basic", event_type=f["gt"], gc_cause=cause,
                ts=epochs, tz=offsets, age=age, pause=pause,
                hb=hb_b, ha=ha_b, hc=hc_b, gens=gens_col, promoted=promoted_col,
            )
        )

    # ---- fast three-line tenuring triples (event row anchored at L0)
    if len(ti3):
        n = len(ti3)
        # so/sd/s3 are residual-subset arrays: map full row indices to
        # subset positions (ti3, ti3+1, ti3+2 are all non-single rows)
        p0 = pa.array(np.searchsorted(resid_idx, ti3))
        p1 = pa.array(np.searchsorted(resid_idx, ti3 + 1))
        p2 = pa.array(np.searchsorted(resid_idx, ti3 + 2))
        o = {k: _field(so, k).take(p0) for k in ("ts", "age", "gt", "cause")}
        d = {k: _field(sd, k).take(p1) for k in ("des", "thr")}
        cl = {
            k: _field(s3, k).take(p2)
            for k in ("pre", "post", "hb", "hbs", "ha", "has", "hc", "hcs", "pause")
        }
        ones = np.ones(n, dtype=bool)
        hb_b = _bytes_col(cl["hb"], cl["hbs"], ones)
        ha_b = _bytes_col(cl["ha"], cl["has"], ones)
        hc_b = _bytes_col(cl["hc"], cl["hcs"], ones)
        epochs, offsets = _parse_ts_rows(o["ts"].to_pylist())
        gens_col, promoted_col = _gens_promoted(
            o["gt"], cl["pre"], cl["post"], hb_b, ha_b,
        )
        tables.append(
            _make_table(
                t, pa.array(ti3), sink="basic", event_type=o["gt"],
                gc_cause=o["cause"], ts=epochs, tz=offsets,
                age=pc.cast(o["age"], pa.float64()),
                pause=pc.cast(cl["pause"], pa.float64()),
                hb=hb_b, ha=ha_b, hc=hc_b, gens=gens_col, promoted=promoted_col,
                tenuring_des=pc.cast(d["des"], pa.int64()),
                tenuring_thr=pc.cast(d["thr"], pa.int32()),
            )
        )

    # ---- fast CMS rows
    ci = np.flatnonzero(m_cms)
    if len(ci):
        take = pa.array(ci)
        f = {n: _field(sc, n).take(take) for n in ("ts", "age", "gt", "close", "pause")}
        pause = pc.if_else(
            pc.equal(pc.fill_null(f["close"], ""), "]"),
            pa.scalar(0.0),
            pc.cast(pc.if_else(pc.equal(f["pause"], ""), "0", f["pause"]), pa.float64()),
        )
        epochs, offsets = _parse_ts_rows(f["ts"].to_pylist())
        tables.append(
            _make_table(
                t, take, sink="cms", event_type=f["gt"],
                gc_cause=pa.nulls(len(ci), pa.string()),
                ts=epochs, tz=offsets, age=pc.cast(f["age"], pa.float64()),
                pause=pause, hb=None, ha=None, hc=None, gens=None, promoted=None,
            )
        )

    # ---- fast app-stopped rows
    ai = np.flatnonzero(m_app)
    if len(ai):
        take = pa.array(ai)
        f = {n: _field(sa, n).take(take) for n in ("ts", "age", "stop", "tts")}
        epochs, offsets = _parse_ts_rows(f["ts"].to_pylist())
        tables.append(
            _make_table(
                t, take, sink="app_stopped",
                event_type=pa.array(["AppStopped"] * len(ai)),
                gc_cause=pa.nulls(len(ai), pa.string()),
                ts=epochs, tz=offsets, age=pc.cast(f["age"], pa.float64()),
                pause=None, hb=None, ha=None, hc=None, gens=None, promoted=None,
                stopped=pc.cast(f["stop"], pa.float64()),
                to_stop=pc.cast(f["tts"], pa.float64()),
            )
        )

    out = pa.concat_tables([x for x in tables if len(x)]) if any(
        len(x) for x in tables
    ) else EVENT_SCHEMA.empty_table()
    if interior:
        return out  # stage C applies rates over the whole conversation
    from .stitch import apply_rates_bucket

    return apply_rates_bucket(out)


# Arrow twin of _GEN_RE with digits/suffix split so size conversion stays
# columnar (_bytes_col)
_GEN_ARROW_RE = (
    r"\[(?P<gnm>[a-zA-Z0-9 \-]+): (?P<gb>\d+)(?P<gbs>[KM])"
    r"->(?P<ga>\d+)(?P<gas>[KM])\((?P<gc>\d+)(?P<gcs>[KM])\)"
    r"(?:, \d+\.\d+ secs)?\]"
)


def _gens_promoted(gt, pre, post, hb_b, ha_b) -> tuple:
    """Generation structs + the promotedBytes quirk (BasicGCEvent.scala:
    promoted = first-non-'young'-generation delta − heap delta, GC only).

    Fully columnar: the k-th generation of every row is pulled by one
    C-speed ``pc.extract_regex`` pass over the still-matching rows, the
    match is stripped (``replace_substring_regex`` max_replacements=1)
    and the pass repeats — rows have ≤~4 generations, so the whole batch
    costs a handful of Arrow kernel calls instead of a python finditer
    loop over every match.  Inputs may be Arrow arrays or python lists."""

    def _arr(v):
        if isinstance(v, pa.ChunkedArray):
            return v.combine_chunks()
        if isinstance(v, pa.Array):
            return v
        return pa.array(v, type=pa.string())

    gt_a = _arr(gt)
    n = len(gt_a)
    cur = pc.binary_join_element_wise(
        pc.fill_null(_arr(pre), ""), pc.fill_null(_arr(post), ""), "\x00"
    )
    rows = np.arange(n, dtype=np.int64)
    f_names, f_b, f_a, f_c, f_rows, f_pass = [], [], [], [], [], []
    pass_k = 0
    while len(cur):
        s = pc.extract_regex(cur, _GEN_ARROW_RE)
        sel = np.flatnonzero(pc.is_valid(s).to_numpy(zero_copy_only=False))
        if len(sel) == 0:
            break
        tk = pa.array(sel)
        ss = s.take(tk)
        ones = np.ones(len(sel), dtype=bool)
        f_names.append(pc.struct_field(ss, "gnm"))
        f_b.append(_bytes_col(pc.struct_field(ss, "gb"), pc.struct_field(ss, "gbs"), ones))
        f_a.append(_bytes_col(pc.struct_field(ss, "ga"), pc.struct_field(ss, "gas"), ones))
        f_c.append(_bytes_col(pc.struct_field(ss, "gc"), pc.struct_field(ss, "gcs"), ones))
        rows = rows[sel]
        f_rows.append(rows)
        f_pass.append(np.full(len(sel), pass_k, dtype=np.int64))
        cur = pc.replace_substring_regex(
            cur.take(tk), _GEN_ARROW_RE, "", max_replacements=1
        )
        pass_k += 1

    if f_rows:
        rows_all = np.concatenate(f_rows)
        pass_all = np.concatenate(f_pass)
        order = np.lexsort((pass_all, rows_all))  # flat arrays in (row, match) order
        row_of = rows_all[order]
        names_arr = pa.concat_arrays(
            [x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in f_names]
        ).take(pa.array(order))
        before = np.concatenate(f_b)[order]
        after = np.concatenate(f_a)[order]
        cap = np.concatenate(f_c)[order]
    else:
        row_of = np.zeros(0, dtype=np.int64)
        names_arr = pa.array([], type=pa.string())
        before = after = cap = np.zeros(0, dtype=np.int64)

    counts = np.bincount(row_of, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    struct = pa.StructArray.from_arrays(
        [
            names_arr,
            pa.array(before, type=pa.int64()),
            pa.array(after, type=pa.int64()),
            pa.array(cap, type=pa.int64()),
        ],
        names=["name", "before_bytes", "after_bytes", "capacity_bytes"],
    )
    gens_col = pa.ListArray.from_arrays(pa.array(offsets), struct)
    # promotedBytes quirk: first gen whose lowered name != 'young', GC only
    promoted = np.zeros(n, dtype=np.int64)
    has_prom = np.zeros(n, dtype=bool)
    if len(row_of):
        not_young = pc.not_equal(
            pc.utf8_lower(names_arr), "young"
        ).to_numpy(zero_copy_only=False)
        is_gc = pc.equal(gt_a, "GC").to_numpy(zero_copy_only=False)
        sel = not_young & is_gc[row_of]
        # first qualifying match per row: flat arrays are in (row, match)
        # order, so the first occurrence of each row id wins
        rows_sel, first_idx = np.unique(row_of[sel], return_index=True)
        src = np.flatnonzero(sel)[first_idx]
        promoted[rows_sel] = (before[src] - after[src]) - (
            hb_b[rows_sel] - ha_b[rows_sel]
        ).astype(np.int64)
        has_prom[rows_sel] = True
    promoted_col = pa.array(promoted, type=pa.int64(), mask=~has_prom)
    return gens_col, promoted_col


def _make_table(
    src: pa.Table, take: pa.Array, sink: str, event_type, gc_cause,
    ts, tz, age, pause, hb, ha, hc, gens, promoted,
    stopped=None, to_stop=None, tenuring_des=None, tenuring_thr=None,
    regions=None,
) -> pa.Table:
    n = len(take)

    def nulls(typ):
        return pa.nulls(n, typ)

    def arr(v, typ):
        if v is None:
            return nulls(typ)
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return pc.cast(v, typ)
        if isinstance(v, np.ndarray):
            return pa.array(v, type=typ)
        return pa.array(v, type=typ)

    hb_a = arr(hb, pa.int64())
    ha_a = arr(ha, pa.int64())
    data = {
        "conv_id": src["conv_id"].take(take),
        "event_seq": nulls(pa.int32()),
        "turn_idx": pc.cast(src["turn_idx"].take(take), pa.int32()),
        "role": src["role"].take(take),
        "tool": src["tool"].take(take),
        "sink": pa.array([sink] * n, type=pa.string()),
        "event_type": arr(event_type, pa.string()),
        "gc_cause": arr(gc_cause, pa.string()),
        "ts": arr(ts, pa.timestamp("ms")),
        "tz_offset_min": arr(tz, pa.int32()),
        "jvm_age_seconds": arr(age, pa.float64()),
        "pause_seconds": arr(pause, pa.float64()),
        "heap_before_bytes": hb_a,
        "heap_after_bytes": ha_a,
        "heap_capacity_bytes": arr(hc, pa.int64()),
        "heap_reclaimed_bytes": (
            pc.subtract(hb_a, ha_a) if hb is not None else nulls(pa.int64())
        ),
        "generations": arr(gens, EVENT_SCHEMA.field("generations").type),
        "regions": arr(regions, EVENT_SCHEMA.field("regions").type),
        "tenuring_desired_bytes": arr(tenuring_des, pa.int64()),
        "tenuring_new_threshold": arr(tenuring_thr, pa.int32()),
        "stopped_seconds": arr(stopped, pa.float64()),
        "seconds_to_stop": arr(to_stop, pa.float64()),
        "promoted_bytes": arr(promoted, pa.int64()),
        "allocated_bytes": nulls(pa.int64()),
        "interval_ms": nulls(pa.int64()),
        "alloc_rate": nulls(pa.int64()),
        "promotion_rate": nulls(pa.int64()),
    }
    arrays = [data[f.name] for f in EVENT_SCHEMA]
    arrays = [
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays
    ]
    return pa.Table.from_arrays(arrays, schema=EVENT_SCHEMA)
