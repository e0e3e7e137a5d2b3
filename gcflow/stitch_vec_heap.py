"""Vectorized stitch for HEAP-STATS mode: block-boundary classification
with C-speed regexes, python descent only for blocks the fast shapes
don't cover.

A heap-stats log is a stream of ``{Heap before ... <GcLine> ... Heap
after ... }`` blocks plus digit-initial AppStopped lines and junk
(Parser.scala:98-111,124-132).  Block interiors can't be judged
line-locally — but BLOCKS can: classify every line once with
``pc.extract_regex`` (open / region / subspace / GC anchor / tenuring
triple / after / close / app-stopped), then validate each candidate
block's line-kind sequence with pure numpy prefix-sum arithmetic.  A
validated block becomes one detailed-event row via columnar ops (the
region-delta zip runs per block over pre-extracted arrays — tens of ops,
not a character-level reparse); anything else falls to maximal
consecutive descent runs parsed by the exact recursive-descent grammar,
exactly like the basic-mode vec stitcher.

Equivalence argument (heap mode):
- the heap driver only starts events at '{' lines (DetailedEvent) and
  digit-initial lines (AppStopped); a validated block is consumed by the
  grammar exactly as classified (each line kind mirrors one grammar rule
  incl. the trailing ignored-line), so claimed blocks and the grammar
  agree on both extent and values;
- a block our classifier REJECTS is left whole to the descent (all its
  lines are unclaimed, forming one contiguous run), which IS the
  reference path — including metaspace stats, non-GC interior types,
  CMS interiors and '}'-rest shapes;
- region-name mismatches in the before/after zip crash the CONVERSATION
  in the reference (MatchError, Parser.scala:104-110) — the vec path
  detects them during the zip and rolls the conversation back to the
  pure-python parse to reproduce the single error row.

Reference parity: Parser.scala:75-111 (heap stats), ParserTest.scala:
261-313 (goldens, ported in tests/test_grammar.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import grammar
from .schema import EVENT_SCHEMA, EventColumns
from .stitch_vec import (
    V_BASIC,
    V_TEN_CLOSE,
    V_TEN_DESIRED,
    _as_array,
    _bytes_col,
    _field,
    _gens_promoted,
    _make_table,
    _parse_ts_rows,
    _TS,
)

H_OPEN = r"^\{Heap before(?P<rest>.*)$"
H_AFTER = r"^Heap after(?P<rest>.*)$"
H_CLOSE = r"^\}(?P<rest>.*)$"
# region header: RegionName stops at the first "total"/"used" suffix
# (Parser.scala:78) — names containing either word are post-filtered to
# the descent so greedy-regex and grammar agree on the split point
H_REGION = (
    r"^(?P<name>[A-Za-z\- ]*)total (?P<tot>\d+)(?P<tots>[KM]),"
    r" used (?P<used>\d+)(?P<useds>[KM])(?P<rest>.*)$"
)
H_SUB = (
    r"^ *(?P<name>[A-Za-z]*) *space (?P<cap>\d+)(?P<caps>[KM]),"
    r" *(?P<pct>\d+)% used(?P<rest>.*)$"
)
H_TOPEN = (
    rf"^(?:(?P<ts>{_TS}): )?(?P<age>\d+\.\d+): \[(?P<gt>(?:Full )?GC)"
    rf"(?P<causewrap> \((?P<cause>[a-zA-Z ]*)\))? *$"
)
H_AGE = r"^- age(?P<rest>.*)$"
H_APP = (
    rf"^(?:(?P<ts>{_TS}): )?(?P<age>\d+\.\d+): Total time for which application"
    rf" threads were stopped: (?P<stop>\d+\.\d+) seconds, Stopping threads took:"
    rf" (?P<tts>\d+\.\d+) seconds(?P<rest>.*)$"
)

K_OTHER, K_OPEN, K_REG, K_SUB, K_GC, K_TOPEN, K_DES, K_AGE, K_TCLOSE, \
    K_AFTER, K_CLOSE, K_APP = range(12)


def _np_bool(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def _rest_guard(struct, extra: str = "") -> np.ndarray:
    """Valid match AND the line remainder can't start another top-level
    event after the driver resumes mid-line ('{' opens a block, a digit
    an AppStopped attempt)."""
    valid = pc.is_valid(struct)
    rest_first = pc.utf8_slice_codeunits(pc.fill_null(_field(struct, "rest"), ""), 0, 1)
    bad = pc.match_substring_regex(rest_first, r"^[0-9{]$")
    return _np_bool(pc.and_(valid, pc.invert(bad)))


def stitch_bucket_vec_heap(group: pa.Table) -> pa.Table:
    """Heap-stats-mode bucket stitcher (vectorized block fast path)."""
    order = pc.sort_indices(
        group, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    t = group.take(order)
    text = _as_array(t["text"])
    n = len(text)
    codes = _as_array(pc.dictionary_encode(t["conv_id"])).indices.to_numpy(
        zero_copy_only=False
    )
    turn = t["turn_idx"].to_numpy(zero_copy_only=False)

    s_open = _as_array(pc.extract_regex(text, H_OPEN))
    s_after = _as_array(pc.extract_regex(text, H_AFTER))
    s_close = _as_array(pc.extract_regex(text, H_CLOSE))
    s_reg = _as_array(pc.extract_regex(text, H_REGION))
    s_sub = _as_array(pc.extract_regex(text, H_SUB))
    s_gc = _as_array(pc.extract_regex(text, V_BASIC))
    s_topen = _as_array(pc.extract_regex(text, H_TOPEN))
    s_des = _as_array(pc.extract_regex(text, V_TEN_DESIRED))
    s_age = _as_array(pc.extract_regex(text, H_AGE))
    s_tclose = _as_array(pc.extract_regex(text, V_TEN_CLOSE))
    s_app = _as_array(pc.extract_regex(text, H_APP))

    def _non_cms(struct) -> np.ndarray:
        return _np_bool(
            pc.and_(
                pc.is_valid(struct),
                pc.invert(pc.starts_with(pc.fill_null(_field(struct, "cause"), ""), "CMS")),
            )
        )

    def _name_clean(struct) -> np.ndarray:
        """Region/metaspace names containing a stop word diverge between
        greedy regex and the grammar's first-suffix stop — descend."""
        nm = pc.fill_null(_field(struct, "name"), "")
        bad = pc.or_(pc.match_substring(nm, "total"), pc.match_substring(nm, "used"))
        return _np_bool(pc.and_(pc.is_valid(struct), pc.invert(bad)))

    kind = np.zeros(n, dtype=np.int8)
    # assignment order = priority; patterns are structurally exclusive,
    # ties (none known) resolve to the later assignment
    kind[_np_bool(pc.is_valid(s_sub))] = K_SUB
    kind[_name_clean(s_reg)] = K_REG
    kind[_np_bool(pc.is_valid(s_age))] = K_AGE
    kind[_np_bool(pc.is_valid(s_des))] = K_DES
    kind[_np_bool(pc.is_valid(s_tclose))] = K_TCLOSE
    kind[_non_cms(s_topen)] = K_TOPEN
    kind[_non_cms(s_gc)] = K_GC
    kind[_rest_guard(s_app)] = K_APP
    kind[_np_bool(pc.is_valid(s_open))] = K_OPEN
    kind[_np_bool(pc.is_valid(s_after))] = K_AFTER
    kind[_rest_guard(s_close)] = K_CLOSE

    # ---- block validation (pure numpy over line kinds)
    open_i = np.flatnonzero(kind == K_OPEN)
    after_i = np.flatnonzero(kind == K_AFTER)
    close_i = np.flatnonzero(kind == K_CLOSE)

    is_rs = (kind == K_REG) | (kind == K_SUB)
    cum_rs = np.concatenate(([0], np.cumsum(is_rs)))

    def all_rs(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
        ln = np.maximum(hi - lo, 0)
        return (cum_rs[np.maximum(hi, lo)] - cum_rs[lo]) == ln

    # largest index <= j whose kind is not K_AGE (for locating the
    # Desired line below a variable run of "- age" table rows)
    not_age_idx = np.where(kind != K_AGE, np.arange(n), -1)
    prev_non_age = np.maximum.accumulate(not_age_idx)

    o = open_i
    n_open = len(o)
    valid = np.zeros(n_open, dtype=bool)
    a = np.zeros(n_open, dtype=np.int64)
    c = np.zeros(n_open, dtype=np.int64)
    g = np.zeros(n_open, dtype=np.int64)
    topen = np.full(n_open, -1, dtype=np.int64)
    if n_open:
        ai = np.searchsorted(after_i, o, side="right")
        has_a = ai < len(after_i)
        a[has_a] = after_i[ai[has_a]]
        ci = np.searchsorted(close_i, np.where(has_a, a, n), side="right")
        has_c = has_a & (ci < len(close_i))
        c[has_c] = close_i[np.minimum(ci, len(close_i) - 1)][has_c]
        valid = has_c.copy()
        g = a - 1
        case_gc = valid & (kind[np.maximum(g, 0)] == K_GC)
        case_ten = valid & (kind[np.maximum(g, 0)] == K_TCLOSE)
        # tenuring anchor: Desired at d (below any "- age" run), open at d-1
        d = prev_non_age[np.maximum(g - 1, 0)]
        ok_ten = case_ten & (d >= o + 2) & (kind[np.maximum(d, 0)] == K_DES)
        tn = d - 1
        ok_ten &= kind[np.maximum(tn, 0)] == K_TOPEN
        valid &= case_gc | ok_ten
        topen = np.where(ok_ten, tn, -1)
        int1_end = np.where(case_gc, g, np.where(ok_ten, tn, g))
        valid &= all_rs(o + 1, np.maximum(int1_end, o + 1))
        valid &= (int1_end <= o + 1) | (kind[np.minimum(o + 1, n - 1)] == K_REG)
        valid &= all_rs(a + 1, np.maximum(c, a + 1))
        valid &= (c <= a + 1) | (kind[np.minimum(a + 1, n - 1)] == K_REG)
        valid &= codes[o] == codes[np.minimum(c, n - 1)]
    else:
        int1_end = np.zeros(0, dtype=np.int64)

    vb = np.flatnonzero(valid)

    # ---- pre-extract region/subspace values (vectorized, whole array)
    any_reg = (kind == K_REG).any()
    any_sub = (kind == K_SUB).any()
    if any_reg:
        reg_names = [
            s.strip() if s is not None else "" for s in _field(s_reg, "name").to_pylist()
        ]
        ones = np.ones(n, dtype=bool)
        reg_tot = _bytes_col(
            pc.fill_null(_field(s_reg, "tot"), "0"), _field(s_reg, "tots"), ones
        )
        reg_used = _bytes_col(
            pc.fill_null(_field(s_reg, "used"), "0"), _field(s_reg, "useds"), ones
        )
    if any_sub:
        sub_names = _field(s_sub, "name").to_pylist()
        ones = np.ones(n, dtype=bool)
        sub_cap = _bytes_col(
            pc.fill_null(_field(s_sub, "cap"), "0"), _field(s_sub, "caps"), ones
        )
        pct_raw = pc.fill_null(_field(s_sub, "pct"), "0")
        sub_pct = pc.cast(
            pc.if_else(pc.equal(pct_raw, ""), "0", pct_raw), pa.int64()
        ).to_numpy(zero_copy_only=False)

    def side_regions(lo: int, hi: int):
        """[(name, cap_bytes, used_val, [(sub_name, sub_cap, sub_pct)])]
        for the REGION/SUB rows in [lo, hi) — 'object' subspaces filtered
        (Parser.scala:89)."""
        out = []
        for j in range(lo, hi):
            if kind[j] == K_REG:
                out.append((reg_names[j], reg_tot[j], reg_used[j], []))
            else:  # K_SUB (validated)
                if sub_names[j] != "object":
                    out[-1][3].append((sub_names[j], sub_cap[j], sub_pct[j]))
        return out

    # ---- per-block region zip → flat delta arrays (+ crash detection).
    # A name mismatch in the before/after zip is a GrammarCrash in the
    # reference (MatchError, Parser.scala:104-110) with CONVERSATION
    # granularity: mark the conv, roll back all its rows below.
    zip_crashed: set = set()

    def build_deltas(blocks: np.ndarray):
        names: list = []
        before_v: list = []
        after_v: list = []
        capb: list = []
        capa: list = []
        offs = np.zeros(len(blocks) + 1, dtype=np.int32)
        crashed = np.zeros(len(blocks), dtype=bool)
        for bi, ob in enumerate(blocks):
            mark = len(names)
            crash = False
            before = side_regions(int(o[ob]) + 1, int(int1_end[ob]))
            after = side_regions(int(a[ob]) + 1, int(c[ob]))
            for (bn, bcap, bused, bsubs), (an, acap, aused, asubs) in zip(
                before, after
            ):
                if bn != an:
                    crash = True
                    break
                names.append(bn)
                before_v.append(bused)
                after_v.append(aused)
                capb.append(bcap)
                capa.append(acap)
                for (sbn, sbcap, sbpct), (san, sacap, sapct) in zip(bsubs, asubs):
                    if sbn != san:
                        crash = True
                        break
                    names.append(sbn)
                    before_v.append(sbpct)
                    after_v.append(sapct)
                    capb.append(sbcap)
                    capa.append(sacap)
                if crash:
                    break
            if crash:
                crashed[bi] = True
                del names[mark:]
                del before_v[mark:]
                del after_v[mark:]
                del capb[mark:]
                del capa[mark:]
            offs[bi + 1] = len(names)
        return names, before_v, after_v, capb, capa, offs, crashed

    d_names, d_before, d_after, d_capb, d_capa, d_offsets, first_crashed = (
        build_deltas(vb)
    )
    if first_crashed.any():
        zip_crashed.update(codes[vb[first_crashed]].tolist())
        # drop every block of a zip-crashed conversation (the whole conv
        # is rolled back, not just the offending block) and rebuild
        conv_bad = np.isin(codes, np.fromiter(zip_crashed, dtype=codes.dtype))
        if n_open:
            valid &= ~conv_bad[o]
        vb = np.flatnonzero(valid)
        d_names, d_before, d_after, d_capb, d_capa, d_offsets, _ = build_deltas(vb)

    # ---- claimed rows
    fast = np.zeros(n, dtype=bool)
    for ob in vb:
        fast[int(o[ob]): int(c[ob]) + 1] = True
    m_app = kind == K_APP
    if zip_crashed:
        m_app &= ~np.isin(codes, np.fromiter(zip_crashed, dtype=codes.dtype))
    fast |= m_app

    # ---- descent over unclaimed runs (crash → whole-conv rollback)
    slow_idx = np.flatnonzero(~fast)
    cols = EventColumns()
    descent_crashed: set = set()
    conv_all = t["conv_id"].to_pylist()
    from .stitch import MODE_HEAP_STATS, _stitch_one, parse_segment

    if len(slow_idx):
        slow_codes = codes[slow_idx]
        brk = np.flatnonzero(
            (np.diff(slow_idx) != 1) | (slow_codes[1:] != slow_codes[:-1])
        ) + 1
        seg_starts = np.concatenate(([0], brk))
        seg_ends = np.concatenate((brk, [len(slow_idx)]))
        text_all = text.to_pylist()
        role_all = t["role"].to_pylist()
        tool_all = t["tool"].to_pylist()

        cur_code = -1
        cur_mark = 0
        cur_crashed = False
        for s, e in zip(seg_starts, seg_ends):
            idxs = slow_idx[s:e]
            code = slow_codes[s]
            if code != cur_code:
                # zip-crashed convs are re-parsed whole below; skip their runs
                cur_code, cur_mark = code, cols.mark()
                cur_crashed = code in zip_crashed
            if cur_crashed:
                continue
            try:
                parse_segment(
                    cols,
                    conv_all[idxs[0]],
                    [text_all[j] for j in idxs],
                    turn[idxs],
                    [role_all[j] for j in idxs],
                    [tool_all[j] for j in idxs],
                    MODE_HEAP_STATS,
                    raise_on_crash=True,
                )
            except grammar.GrammarCrash:
                cur_crashed = True
                descent_crashed.add(code)
                cols.truncate(cur_mark)
                full = np.flatnonzero(codes == code)
                _stitch_one(
                    cols,
                    conv_all[full[0]],
                    [text_all[j] for j in full],
                    turn[full],
                    [role_all[j] for j in full],
                    [tool_all[j] for j in full],
                    MODE_HEAP_STATS,
                )

    # whole-conv python reparse for the zip-crashed conversations (their
    # descent runs were skipped above; this emits their single error row
    # or full event set exactly as the reference path would)
    if zip_crashed:
        text_all2 = text.to_pylist()
        role_all2 = t["role"].to_pylist()
        tool_all2 = t["tool"].to_pylist()
        for cc in sorted(zip_crashed):
            full = np.flatnonzero(codes == cc)
            _stitch_one(
                cols,
                conv_all[full[0]],
                [text_all2[j] for j in full],
                turn[full],
                [role_all2[j] for j in full],
                [tool_all2[j] for j in full],
                MODE_HEAP_STATS,
            )

    tables = [cols.to_table()]

    if descent_crashed:  # drop descent-crashed convs' fast rows
        bad = np.isin(codes, np.fromiter(descent_crashed, dtype=codes.dtype))
        drop = bad[o[vb]] if len(vb) else np.zeros(0, dtype=bool)
        if drop.any():
            surv = vb[~drop]
            d_names, d_before, d_after, d_capb, d_capa, d_offsets, _ = build_deltas(surv)
            vb = surv
        m_app &= ~bad

    # ---- regions list column for the surviving blocks
    region_struct = pa.StructArray.from_arrays(
        [
            pa.array(d_names, type=pa.string()),
            pa.array(np.asarray(d_before, dtype=np.int64), type=pa.int64()),
            pa.array(np.asarray(d_after, dtype=np.int64), type=pa.int64()),
            pa.array(np.asarray(d_capb, dtype=np.int64), type=pa.int64()),
            pa.array(np.asarray(d_capa, dtype=np.int64), type=pa.int64()),
        ],
        names=["name", "before", "after", "capacity_before", "capacity_after"],
    )
    regions_col = pa.ListArray.from_arrays(pa.array(d_offsets), region_struct)

    # ---- detailed-event rows (split by anchor shape, regions sliced)
    if len(vb):
        anchor_is_gc = kind[a[vb] - 1] == K_GC
        bsel = np.flatnonzero(anchor_is_gc)
        tsel = np.flatnonzero(~anchor_is_gc)

        def reg_slice(sel: np.ndarray):
            if len(sel) == 0:
                return None
            # per-block list slices re-packed for the selected subset
            lens = np.diff(d_offsets)
            starts = d_offsets[:-1][sel]
            offs = np.zeros(len(sel) + 1, dtype=np.int32)
            np.cumsum(lens[sel], out=offs[1:])
            take = np.concatenate(
                [np.arange(s, s + l) for s, l in zip(starts, lens[sel])]
            ) if len(sel) else np.zeros(0, dtype=np.int64)
            return pa.ListArray.from_arrays(
                pa.array(offs), region_struct.take(pa.array(take, type=pa.int64()))
            )

        if len(bsel):
            gi = a[vb[bsel]] - 1  # GC anchor line
            oi = o[vb[bsel]]      # block anchor row (turn/role/tool/provenance)
            p_g = pa.array(gi)
            f = {nm: _field(s_gc, nm).take(p_g) for nm in (
                "ts", "age", "gt", "causewrap", "cause", "pre", "post",
                "hb", "hbs", "ha", "has", "hc", "hcs", "pause",
            )}
            nrows = len(bsel)
            ones = np.ones(nrows, dtype=bool)
            hb_b = _bytes_col(f["hb"], f["hbs"], ones)
            ha_b = _bytes_col(f["ha"], f["has"], ones)
            hc_b = _bytes_col(f["hc"], f["hcs"], ones)
            cause = pc.if_else(
                pc.equal(pc.fill_null(f["causewrap"], ""), ""),
                pa.scalar(None, type=pa.string()),
                f["cause"],
            )
            epochs, offsets = _parse_ts_rows(f["ts"].to_pylist())
            gens_col, promoted_col = _gens_promoted(
                f["gt"].to_pylist(), f["pre"].to_pylist(), f["post"].to_pylist(),
                hb_b, ha_b,
            )
            tables.append(
                _make_table(
                    t, pa.array(oi), sink="detailed", event_type=f["gt"],
                    gc_cause=cause, ts=epochs, tz=offsets,
                    age=pc.cast(f["age"], pa.float64()),
                    pause=pc.cast(f["pause"], pa.float64()),
                    hb=hb_b, ha=ha_b, hc=hc_b, gens=gens_col,
                    promoted=promoted_col, regions=reg_slice(bsel),
                )
            )

        if len(tsel):
            ti = topen[vb[tsel]]
            di = ti + 1
            gi = a[vb[tsel]] - 1
            oi = o[vb[tsel]]
            p_t, p_d, p_g = pa.array(ti), pa.array(di), pa.array(gi)
            fo = {
                k: _field(s_topen, k).take(p_t)
                for k in ("ts", "age", "gt", "causewrap", "cause")
            }
            fo["cause"] = pc.if_else(
                pc.equal(pc.fill_null(fo["causewrap"], ""), ""),
                pa.scalar(None, type=pa.string()),
                fo["cause"],
            )
            fd = {k: _field(s_des, k).take(p_d) for k in ("des", "thr")}
            fc = {
                k: _field(s_tclose, k).take(p_g)
                for k in ("pre", "post", "hb", "hbs", "ha", "has", "hc", "hcs", "pause")
            }
            nrows = len(tsel)
            ones = np.ones(nrows, dtype=bool)
            hb_b = _bytes_col(fc["hb"], fc["hbs"], ones)
            ha_b = _bytes_col(fc["ha"], fc["has"], ones)
            hc_b = _bytes_col(fc["hc"], fc["hcs"], ones)
            epochs, offsets = _parse_ts_rows(fo["ts"].to_pylist())
            gens_col, promoted_col = _gens_promoted(
                fo["gt"].to_pylist(), fc["pre"].to_pylist(), fc["post"].to_pylist(),
                hb_b, ha_b,
            )
            tables.append(
                _make_table(
                    t, pa.array(oi), sink="detailed", event_type=fo["gt"],
                    gc_cause=fo["cause"], ts=epochs, tz=offsets,
                    age=pc.cast(fo["age"], pa.float64()),
                    pause=pc.cast(fc["pause"], pa.float64()),
                    hb=hb_b, ha=ha_b, hc=hc_b, gens=gens_col,
                    promoted=promoted_col, regions=reg_slice(tsel),
                    tenuring_des=pc.cast(fd["des"], pa.int64()),
                    tenuring_thr=pc.cast(fd["thr"], pa.int32()),
                )
            )

    # ---- app-stopped rows
    ai = np.flatnonzero(m_app)
    if len(ai):
        take = pa.array(ai)
        f = {nm: _field(s_app, nm).take(take) for nm in ("ts", "age", "stop", "tts")}
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
    from .stitch import apply_rates_bucket

    return apply_rates_bucket(out)
