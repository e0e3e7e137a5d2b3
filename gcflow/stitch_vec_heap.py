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

# blk field width in the packed region-zip merge key (tests shrink this to
# exercise the chunked build_deltas path)
MAX_ZIP_BLOCKS = 1 << 23


def _np_bool(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def _concat_ranges(starts: np.ndarray, lens: np.ndarray):
    """Concatenated ``[s, s+l)`` index ranges plus per-row segment ids —
    the vectorized replacement for ``[np.arange(s, s+l) for ...]``."""
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    off = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(off, lens)
    return starts[seg] + pos, seg


def _rest_guard(struct, extra: str = "") -> np.ndarray:
    """Valid match AND the line remainder can't start another top-level
    event after the driver resumes mid-line ('{' opens a block, a digit
    an AppStopped attempt)."""
    valid = pc.is_valid(struct)
    rest_first = pc.utf8_slice_codeunits(pc.fill_null(_field(struct, "rest"), ""), 0, 1)
    bad = pc.match_substring_regex(rest_first, r"^[0-9{]$")
    return _np_bool(pc.and_(valid, pc.invert(bad)))


def stitch_bucket_vec_heap(group: pa.Table, interior: bool = False) -> pa.Table:
    """Heap-stats-mode bucket stitcher (vectorized block fast path).

    ``interior=True``: run-local stage-A variant (see
    :func:`gcflow.stitch_vec.stitch_bucket_vec`) — rates/event_seq are
    left for stage C, and both crash paths (region-zip mismatch,
    descent) re-parse the conversation's interior with ``parse_segment``
    semantics instead of the whole-conversation ``_stitch_one``."""
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
        # interiors ≥2^20 lines would overflow the packed ordinal key in
        # build_deltas — route such degenerate blocks to the descent
        valid &= (int1_end - o < (1 << 20)) & (c - a < (1 << 20))
    else:
        int1_end = np.zeros(0, dtype=np.int64)

    vb = np.flatnonzero(valid)

    # ---- pre-extract region/subspace values (vectorized, whole array)
    mask_reg = kind == K_REG
    mask_sub = kind == K_SUB
    if mask_reg.any() or mask_sub.any():
        ones = np.ones(n, dtype=bool)
        reg_tot = _bytes_col(
            pc.fill_null(_field(s_reg, "tot"), "0"), _field(s_reg, "tots"), ones
        )
        reg_used = _bytes_col(
            pc.fill_null(_field(s_reg, "used"), "0"), _field(s_reg, "useds"), ones
        )
        sub_cap = _bytes_col(
            pc.fill_null(_field(s_sub, "cap"), "0"), _field(s_sub, "caps"), ones
        )
        pct_raw = pc.fill_null(_field(s_sub, "pct"), "0")
        sub_pct = pc.cast(
            pc.if_else(pc.equal(pct_raw, ""), "0", pct_raw), pa.int64()
        ).to_numpy(zero_copy_only=False)
        # unified per-row (name, value, capacity): region rows carry
        # (trimmed name, used bytes, total bytes), sub rows (name, pct,
        # capacity bytes) — exactly the RegionDelta payloads
        names_all = pc.if_else(
            pa.array(mask_reg),
            pc.utf8_trim(pc.fill_null(_field(s_reg, "name"), ""), " "),
            pc.fill_null(_field(s_sub, "name"), ""),
        )
        val_all = np.where(mask_reg, reg_used, sub_pct)
        cap_all = np.where(mask_reg, reg_tot, sub_cap)
        # 'object' subspaces are filtered before the zip (Parser.scala:89)
        drop_obj = mask_sub & _np_bool(
            pc.equal(pc.fill_null(_field(s_sub, "name"), ""), "object")
        )
    else:
        names_all = pa.nulls(n, pa.string())
        val_all = cap_all = np.zeros(n, dtype=np.int64)
        drop_obj = np.zeros(n, dtype=bool)

    # ---- vectorized region zip → flat delta arrays (+ crash detection).
    # A name mismatch in the before/after zip is a GrammarCrash in the
    # reference (MatchError, Parser.scala:104-110) with CONVERSATION
    # granularity: mark the conv, roll back all its rows below.
    zip_crashed: set = set()

    def _side_keys(starts: np.ndarray, lens: np.ndarray):
        """(row idx, block id, composite ordinal key) for one side of the
        selected blocks.  Key = (block, region ordinal, sub ordinal+1) —
        identical keys on the two sides pair exactly like the reference's
        nested zip (both zips truncate to the shorter list, so a pair
        exists iff BOTH sides have that (region, sub) ordinal)."""
        idx, blk = _concat_ranges(starts, lens)
        keep = ~drop_obj[idx]
        idx, blk = idx[keep], blk[keep]
        if len(idx) == 0:
            return idx, blk, np.zeros(0, dtype=np.int64)
        isr = mask_reg[idx]
        csr = np.cumsum(isr)
        # region ordinal within block: validated interiors start with a
        # region row, so per-segment rebasing is exact
        seg_start = np.concatenate(([True], blk[1:] != blk[:-1]))
        first = np.flatnonzero(seg_start)
        base = np.repeat((csr - isr)[first], np.diff(np.append(first, len(idx))))
        r_ord = csr - base - 1
        # sub ordinal within region (-1 for the region row itself); the
        # accumulate never leaks across blocks because every segment
        # starts with a region row
        p = np.arange(len(idx), dtype=np.int64)
        last_reg = np.maximum.accumulate(np.where(isr, p, -1))
        s_ord = np.where(isr, -1, p - last_reg - 1)
        # 20 bits per ordinal: both r_ord+1 and s_ord+1 are < interior
        # length, which the block validity guard bounds at 2^20; blk gets
        # the remaining 23 bits (callers chunk above 2^23 blocks)
        key = (blk << 40) | ((r_ord + 1) << 20) | (s_ord + 1)
        return idx, blk, key

    _MAX_BLK = MAX_ZIP_BLOCKS

    def build_deltas(blocks: np.ndarray):
        nb = len(blocks)
        if nb > _MAX_BLK:
            # keep blk inside its 23-bit key field: independent chunks,
            # re-based offsets (blocks never share delta rows)
            parts = [
                build_deltas(blocks[i : i + _MAX_BLK])
                for i in range(0, nb, _MAX_BLK)
            ]
            names = pa.concat_arrays(
                [p[0].combine_chunks() if isinstance(p[0], pa.ChunkedArray) else p[0]
                 for p in parts]
            )
            befores, afters, capbs, capas = (
                np.concatenate([p[j] for p in parts]) for j in (1, 2, 3, 4)
            )
            offs = np.zeros(nb + 1, dtype=np.int32)
            pos = 0
            base = 0
            for p in parts:
                po = p[5]
                offs[pos + 1 : pos + len(po)] = po[1:] + base
                pos += len(po) - 1
                base += po[-1]
            crashed = np.concatenate([p[6] for p in parts])
            return names, befores, afters, capbs, capas, offs, crashed
        offs = np.zeros(nb + 1, dtype=np.int32)
        crashed = np.zeros(nb, dtype=bool)
        z64 = np.zeros(0, dtype=np.int64)
        if nb == 0:
            return pa.array([], type=pa.string()), z64, z64, z64, z64, offs, crashed
        ob, ab, cb, ib = o[blocks], a[blocks], c[blocks], int1_end[blocks]
        idx_b, blk_b, key_b = _side_keys(ob + 1, np.maximum(ib - ob - 1, 0))
        idx_a, _, key_a = _side_keys(ab + 1, np.maximum(cb - ab - 1, 0))
        if len(key_b) == 0 or len(key_a) == 0:
            return pa.array([], type=pa.string()), z64, z64, z64, z64, offs, crashed
        # keys are strictly increasing on both sides → sorted-merge pair
        ins = np.searchsorted(key_a, key_b)
        hit = ins < len(key_a)
        hit[hit] = key_a[ins[hit]] == key_b[hit]
        pb = np.flatnonzero(hit)
        pa_rows = ins[pb]
        rb = idx_b[pb]
        ra = idx_a[pa_rows]
        names_b = names_all.take(pa.array(rb))
        mismatch = _np_bool(
            pc.not_equal(names_b, names_all.take(pa.array(ra)))
        )
        if mismatch.any():
            crashed[np.unique(blk_b[pb[mismatch]])] = True
            keep = ~crashed[blk_b[pb]]
            pb, pa_rows, rb, ra = pb[keep], pa_rows[keep], rb[keep], ra[keep]
            names_b = names_all.take(pa.array(rb))
        counts = np.bincount(blk_b[pb], minlength=nb)
        np.cumsum(counts, out=offs[1:])
        return names_b, val_all[rb], val_all[ra], cap_all[rb], cap_all[ra], offs, crashed

    d_names, d_before, d_after, d_capb, d_capa, d_offsets, first_crashed = (
        build_deltas(vb)
    )
    if first_crashed.any():
        # conv code of each crashed block via its OPEN-LINE index (vb is a
        # block ordinal into o, not a line index — indexing codes with it
        # would roll back an unrelated conversation)
        zip_crashed.update(codes[o[vb[first_crashed]]].tolist())
        # drop every block of a zip-crashed conversation (the whole conv
        # is rolled back, not just the offending block) and rebuild
        conv_bad = np.isin(codes, np.fromiter(zip_crashed, dtype=codes.dtype))
        if n_open:
            valid &= ~conv_bad[o]
        vb = np.flatnonzero(valid)
        d_names, d_before, d_after, d_capb, d_capa, d_offsets, _ = build_deltas(vb)

    # ---- claimed rows
    fast = np.zeros(n, dtype=bool)
    if len(vb):
        claim, _ = _concat_ranges(o[vb], c[vb] + 1 - o[vb])
        fast[claim] = True
    m_app = kind == K_APP
    if zip_crashed:
        m_app &= ~np.isin(codes, np.fromiter(zip_crashed, dtype=codes.dtype))
    fast |= m_app

    # ---- descent over unclaimed runs (crash → whole-conv rollback)
    slow_idx = np.flatnonzero(~fast)
    cols = EventColumns()
    descent_crashed: set = set()
    from .stitch import MODE_HEAP_STATS, _stitch_one, parse_segment

    conv_arr = _as_array(t["conv_id"])
    role_arr = _as_array(t["role"])
    tool_arr = _as_array(t["tool"])

    def _conv_rows(full: np.ndarray):
        tk = pa.array(full)
        return (
            conv_arr[int(full[0])].as_py(),
            text.take(tk).to_pylist(),
            turn[full],
            role_arr.take(tk).to_pylist(),
            tool_arr.take(tk).to_pylist(),
        )

    if len(slow_idx):
        slow_codes = codes[slow_idx]
        brk = np.flatnonzero(
            (np.diff(slow_idx) != 1) | (slow_codes[1:] != slow_codes[:-1])
        ) + 1
        seg_starts = np.concatenate(([0], brk))
        seg_ends = np.concatenate((brk, [len(slow_idx)]))
        # materialize ONLY the slow rows to python (the fast majority
        # never leaves Arrow)
        slow_take = pa.array(slow_idx)
        text_sl = text.take(slow_take).to_pylist()
        role_sl = role_arr.take(slow_take).to_pylist()
        tool_sl = tool_arr.take(slow_take).to_pylist()
        conv_seg = conv_arr.take(pa.array(slow_idx[seg_starts])).to_pylist()

        cur_code = -1
        cur_mark = 0
        cur_crashed = False
        for si, (s, e) in enumerate(zip(seg_starts, seg_ends)):
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
                    conv_seg[si],
                    text_sl[s:e],
                    turn[idxs],
                    role_sl[s:e],
                    tool_sl[s:e],
                    MODE_HEAP_STATS,
                    raise_on_crash=True,
                )
            except grammar.GrammarCrash:
                cur_crashed = True
                descent_crashed.add(code)
                cols.truncate(cur_mark)
                cid, txts, trns, rls, tls = _conv_rows(np.flatnonzero(codes == code))
                reparse = parse_segment if interior else _stitch_one
                reparse(cols, cid, txts, trns, rls, tls, MODE_HEAP_STATS)

    # whole-conv python reparse for the zip-crashed conversations (their
    # descent runs were skipped above; this emits their single error row
    # or full event set exactly as the reference path would)
    for cc in sorted(zip_crashed):
        cid, txts, trns, rls, tls = _conv_rows(np.flatnonzero(codes == cc))
        reparse = parse_segment if interior else _stitch_one
        reparse(cols, cid, txts, trns, rls, tls, MODE_HEAP_STATS)

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
            d_names.combine_chunks() if isinstance(d_names, pa.ChunkedArray) else d_names,
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
            offs = np.zeros(len(sel) + 1, dtype=np.int32)
            np.cumsum(lens[sel], out=offs[1:])
            take, _ = _concat_ranges(d_offsets[:-1][sel], lens[sel])
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
                f["gt"], f["pre"], f["post"], hb_b, ha_b,
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
                fo["gt"], fc["pre"], fc["post"], hb_b, ha_b,
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
    if interior:
        return out  # stage C applies rates over the whole conversation
    from .stitch import apply_rates_bucket

    return apply_rates_bucket(out)
