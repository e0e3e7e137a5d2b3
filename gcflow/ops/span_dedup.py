"""Exact duplicated-substring span detection + removal (the ExactSubstr
family: Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better", arXiv:2107.06499 §4.1), re-expressed for Ray Data.

The published algorithm builds a corpus-wide suffix array and removes
every substring of ≥ k tokens that occurs more than once.  A suffix
array is one shared mutable index — the wrong shape for a streaming
100 TB corpus — so the distributed equivalent here is the fixed-width
window decomposition: every length-``DUP_SPAN_WORDS`` word window
(stride 1) is hashed with the repo-wide vectorized content hash
(ops/hashing.py), window occurrences are routed by hash bucket so each
window's GLOBAL occurrence count is computed inside one group (the
seg-hash sweep shape of the CCNet line dedup, ops/curation.py), and a
window is *duplicated* iff its content occurs ≥ 2 times anywhere in
the corpus — intra-document repeats count, exactly as a suffix array
would.  Per document, duplicated window starts whose gaps are ≤ K
merge into maximal spans: the union of duplicated windows, which is
precisely the word range covered by some duplicated K-window (a
duplicated substring of length L ≥ K yields L−K+1 duplicated starts
and comes back as ONE span of length L).

Scale shape: the exploded table is one row per corpus word position
(~3× the text bytes as fixed-width ints) streaming through two bounded
hash shuffles — window-hash buckets for the frequency sweep, then
doc-id buckets for the span merge / text rebuild.  Nothing
corpus-sized reaches the driver; every kernel is a numpy
lexsort/run-length or an Arrow list rebuild — no per-row Python.
Window identity is the 64-bit content hash (collision odds ~2⁻⁶⁴ per
window pair): the stats path can overcount a span, never lose one,
mirroring q_doc_line_dedup; on the removal path a collision could clip
at most K collateral words — the same accepted trade called out at
ops/curation.py:595 (the exact-verify alternative would ship K words
of text per corpus position, an 8× shuffle-byte blowup for a 2⁻⁶⁴
risk).

Reference-semantics analogue: gclog-parser computes no dedup
(SURVEY.md §2.6) — this op is part of the beyond-parity LLM-data
layer the north rule asks for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .curation import _docs
from .dedup import _ensure_schema

DUP_SPAN_WORDS = 8   # K: window width == minimum reportable span length
HASH_BUCKETS = 64    # window-hash buckets for the frequency sweep
DOC_BUCKETS = 64     # doc-id buckets for span merge / rebuild

_WIN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("start", pa.int64()),
     ("win_hash", pa.int64()), ("bucket", pa.int64())]
)
_DUP_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("start", pa.int64()), ("dbucket", pa.int64())]
)
_SPAN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("span_start", pa.int64()), ("span_len", pa.int64())]
)
_CLEAN_SCHEMA = pa.schema([("doc_id", pa.int64()), ("clean_text", pa.string())])


def _window_rows(t: pa.Table) -> pa.Table:
    """One row per valid K-word window: (doc_id, start, win_hash, bucket).

    Fully vectorized: one flat word-hash pass + a K-step polynomial fold
    over the flat array (windows crossing doc boundaries are computed
    then masked — branch-free, same as ops/curation.py's overlap
    scorer)."""
    from .hashing import gram_hashes, word_hashes

    k = DUP_SPAN_WORDS
    if len(t) == 0:
        return _WIN_SCHEMA.empty_table()
    doc_ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    toks = pc.split_pattern(t["text"], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    wh = word_hashes(flat)
    gh = gram_hashes(wh, k)
    n_win = len(gh)
    if n_win == 0:
        return _WIN_SCHEMA.empty_table()
    doc_of = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    pos = np.flatnonzero(doc_of[:n_win] == doc_of[k - 1 :])
    if len(pos) == 0:
        return _WIN_SCHEMA.empty_table()
    d_idx = doc_of[pos]
    h = gh[pos]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[d_idx], type=pa.int64()),
            "start": pa.array(pos - offs[d_idx], type=pa.int64()),
            "win_hash": pa.array(h.view(np.int64), type=pa.int64()),
            "bucket": pa.array(
                (h % np.uint64(HASH_BUCKETS)).astype(np.int64), type=pa.int64()
            ),
        }
    )


def _dup_sweep(g: pa.Table) -> pa.Table:
    """Frequency sweep over one window-hash bucket: every occurrence of a
    window content lands here (routing hash == content hash), so one
    argsort run-length gives each window's global occurrence count;
    occurrences of windows seen ≥ 2 times survive, re-keyed by doc
    bucket for the span merge."""
    if len(g) == 0:
        return _DUP_SCHEMA.empty_table()
    h = g["win_hash"].to_numpy(zero_copy_only=False)
    order = np.argsort(h, kind="stable")
    hs = h[order]
    starts = np.flatnonzero(np.concatenate(([True], hs[1:] != hs[:-1])))
    runlen = np.diff(np.append(starts, len(hs)))
    keep = order[np.repeat(runlen >= 2, runlen)]
    if len(keep) == 0:
        return _DUP_SCHEMA.empty_table()
    d = g["doc_id"].to_numpy(zero_copy_only=False)[keep]
    return pa.table(
        {
            "doc_id": pa.array(d, type=pa.int64()),
            "start": pa.array(
                g["start"].to_numpy(zero_copy_only=False)[keep], type=pa.int64()
            ),
            "dbucket": pa.array(d % DOC_BUCKETS, type=pa.int64()),
        }
    )


def _span_sweep(g: pa.Table) -> pa.Table:
    """Merge one doc bucket's duplicated window starts into maximal
    spans: lexsort by (doc, start); a new span opens on a doc change or
    a start gap > K (with fixed window length K and sorted starts the
    running span end is simply last_start + K, so the gap test is
    exact interval union)."""
    k = DUP_SPAN_WORDS
    if len(g) == 0:
        return _SPAN_SCHEMA.empty_table()
    d = g["doc_id"].to_numpy(zero_copy_only=False)
    s = g["start"].to_numpy(zero_copy_only=False)
    order = np.lexsort((s, d))
    d, s = d[order], s[order]
    first = np.flatnonzero(
        np.concatenate(([True], (d[1:] != d[:-1]) | (s[1:] - s[:-1] > k)))
    )
    last = np.append(first[1:], len(s)) - 1
    return pa.table(
        {
            "doc_id": pa.array(d[first], type=pa.int64()),
            "span_start": pa.array(s[first], type=pa.int64()),
            "span_len": pa.array(s[last] + k - s[first], type=pa.int64()),
        }
    )


def _dup_starts(sf_dir: str) -> rd.Dataset:
    """(doc_id, start, dbucket) of every duplicated window occurrence."""
    wins = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            _window_rows, batch_format="pyarrow"
        ),
        _WIN_SCHEMA,
    )
    return _ensure_schema(
        wins.groupby("bucket").map_groups(_dup_sweep, batch_format="pyarrow"),
        _DUP_SCHEMA,
    )


def q_doc_dup_spans(sf_dir: str) -> rd.Dataset:
    """(doc_id, span_start, span_len): maximal word spans covered by some
    K-word window whose content occurs ≥ 2 times in the corpus."""
    return _dup_starts(sf_dir).groupby("dbucket").map_groups(
        _span_sweep, batch_format="pyarrow"
    )


def q_doc_dup_span_clean(sf_dir: str) -> rd.Dataset:
    """The ExactSubstr removal transform: every document rebuilt with all
    words covered by a duplicated window REMOVED (Lee et al. §4.1 drop
    the duplicated range; a fully-duplicated doc comes back as '').

    Shape: the duplicated (doc_id, start) pairs and the documents are
    co-located by ONE doc-bucket shuffle (span rows union-schema'd onto
    the doc rows); each bucket rebuilds its docs vectorized — coverage
    by a difference-array cumsum over the bucket's flat word buffer,
    surviving words refolded with one Arrow list rebuild + binary_join.
    Every doc row passes through, so untouched docs return unchanged."""
    k = DUP_SPAN_WORDS
    union = pa.schema(
        [("doc_id", pa.int64()), ("start", pa.int64()),
         ("text", pa.string()), ("dbucket", pa.int64())]
    )

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        return pa.table(
            {
                "doc_id": ids,
                "start": pa.nulls(len(t), pa.int64()),
                "text": pc.cast(t["text"], pa.string()),
                "dbucket": pa.array(
                    ids.to_numpy(zero_copy_only=False) % DOC_BUCKETS,
                    type=pa.int64(),
                ),
            }
        )

    def tag_dups(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "start": t["start"],
                "text": pa.nulls(len(t), pa.string()),
                "dbucket": t["dbucket"],
            }
        )

    def rebuild(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _CLEAN_SCHEMA.empty_table()
        is_doc = pc.is_valid(g["text"])
        docs_t = g.filter(is_doc)
        if len(docs_t) == 0:  # spans always share a bucket with their doc
            return _CLEAN_SCHEMA.empty_table()
        toks = pc.split_pattern(docs_t["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        ids = docs_t["doc_id"].to_numpy(zero_copy_only=False)
        sp = g.filter(pc.invert(is_doc))
        keep = np.ones(len(flat), dtype=bool)
        if len(sp) > 0:
            sd = sp["doc_id"].to_numpy(zero_copy_only=False)
            ss = sp["start"].to_numpy(zero_copy_only=False)
            id_order = np.argsort(ids)
            li = id_order[np.searchsorted(ids[id_order], sd)]
            # coverage via a difference array over the flat word buffer
            diff = np.zeros(len(flat) + 1, dtype=np.int64)
            np.add.at(diff, offs[li] + ss, 1)
            np.add.at(diff, offs[li] + np.minimum(ss + k, lens[li]), -1)
            keep = np.cumsum(diff[:-1]) == 0
        ck = np.concatenate(([0], np.cumsum(keep)))
        new_offs = ck[offs]
        segs = pa.ListArray.from_arrays(
            pa.array(new_offs, type=pa.int32()), flat.filter(pa.array(keep))
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "clean_text": pc.binary_join(segs, " "),
            }
        )

    docs = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            tag_docs, batch_format="pyarrow"
        ),
        union,
    )
    dups = _ensure_schema(
        _dup_starts(sf_dir).map_batches(tag_dups, batch_format="pyarrow"), union
    )
    return docs.union(dups).groupby("dbucket").map_groups(
        rebuild, batch_format="pyarrow"
    )


SPAN_DEDUP_QUERIES = {
    "doc_dup_spans": q_doc_dup_spans,
    "doc_dup_span_clean": q_doc_dup_span_clean,
}

_K = DUP_SPAN_WORDS

# Shared oracle CTE chain: wins → global frequency → duplicated starts.
_DUP_CTE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
wins AS (
  SELECT doc_id, i - 1 AS start, array_to_string(l[i : i + {_K} - 1], ' ') AS win
  FROM w,
       LATERAL (SELECT unnest(generate_series(1, len(l) - {_K} + 1)) AS i) t
),
freq AS (
  SELECT win FROM wins GROUP BY win HAVING count(*) >= 2
),
dup AS (
  SELECT doc_id, start FROM wins WHERE win IN (SELECT win FROM freq)
)
"""

SPAN_DEDUP_ORACLES = {
    "doc_dup_spans": _DUP_CTE
    + f"""
, flag AS (
  SELECT doc_id, start,
         CASE WHEN start - lag(start)
                        OVER (PARTITION BY doc_id ORDER BY start) <= {_K}
              THEN 0 ELSE 1 END AS brk
  FROM dup
),
grp AS (
  SELECT doc_id, start,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS UNBOUNDED PRECEDING) AS gid
  FROM flag
)
SELECT doc_id, min(start) AS span_start,
       max(start) + {_K} - min(start) AS span_len
FROM grp GROUP BY doc_id, gid
""",
    "doc_dup_span_clean": _DUP_CTE
    + f"""
, cov AS (
  SELECT DISTINCT doc_id, s.i AS idx
  FROM dup,
       LATERAL (SELECT unnest(generate_series(start, start + {_K} - 1)) AS i) s
),
wordsx AS (
  SELECT doc_id, i - 1 AS idx, l[i] AS word
  FROM w, LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) t
),
kept AS (
  SELECT wx.doc_id, wx.idx, wx.word
  FROM wordsx wx LEFT JOIN cov c ON wx.doc_id = c.doc_id AND wx.idx = c.idx
  WHERE c.idx IS NULL
)
SELECT d.doc_id,
       coalesce(k.txt, '') AS clean_text
FROM documents d
LEFT JOIN (
  SELECT doc_id, string_agg(word, ' ' ORDER BY idx) AS txt
  FROM kept GROUP BY doc_id
) k USING (doc_id)
""",
}


_NOV_PART_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("wins", pa.int64()), ("novel", pa.int64()),
     ("dbucket", pa.int64())]
)
_NOV_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_windows", pa.int64()),
     ("novel_frac", pa.float64())]
)


def q_doc_ngram_novelty(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_windows, novel_frac): per-document n-gram NOVELTY — the
    fraction of a doc's K-word stride-1 windows whose content occurs
    exactly ONCE in the whole corpus (the diversity signal
    novelty-aware samplers weight by; the complement of the ExactSubstr
    dup fraction).  Same two bounded shuffles as q_doc_dup_spans: the
    window explode routes by content-hash bucket so each window's
    global occurrence count is one in-bucket run-length; per-bucket
    per-doc (wins, novel) partials — ≤ docs × HASH_BUCKETS rows — then
    reduce inside doc-id buckets.  Docs with < K words have no windows
    and are absent, exactly like the SQL mirror.  Window identity is
    the 64-bit content hash (collision ⇒ novelty undercount at ~2⁻⁶⁴
    odds — the module-level trade)."""
    wins = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            _window_rows, batch_format="pyarrow"
        ),
        _WIN_SCHEMA,
    )

    def novelty_sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _NOV_PART_SCHEMA.empty_table()
        h = g["win_hash"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        starts = np.flatnonzero(np.concatenate(([True], hs[1:] != hs[:-1])))
        runlen = np.diff(np.append(starts, len(hs)))
        is_novel = np.repeat(runlen == 1, runlen)
        d = g["doc_id"].to_numpy(zero_copy_only=False)[order]
        uniq, inv = np.unique(d, return_inverse=True)
        wins_per = np.bincount(inv, minlength=len(uniq))
        novel_per = np.bincount(inv, weights=is_novel.astype(np.float64))
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "wins": pa.array(wins_per, type=pa.int64()),
                "novel": pa.array(novel_per.astype(np.int64), type=pa.int64()),
                "dbucket": pa.array(uniq % DOC_BUCKETS, type=pa.int64()),
            }
        )

    parts = _ensure_schema(
        wins.groupby("bucket").map_groups(novelty_sweep, batch_format="pyarrow"),
        _NOV_PART_SCHEMA,
    )

    def reduce(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return _NOV_SCHEMA.empty_table()
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(d, return_inverse=True)
        w = np.bincount(inv, weights=g["wins"].to_numpy(zero_copy_only=False).astype(np.float64)).astype(np.int64)
        nv = np.bincount(inv, weights=g["novel"].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_windows": pa.array(w, type=pa.int64()),
                "novel_frac": pa.array(nv / w, type=pa.float64()),
            }
        )

    return _ensure_schema(
        parts.groupby("dbucket").map_groups(reduce, batch_format="pyarrow"),
        _NOV_SCHEMA,
    )


SPAN_DEDUP_QUERIES["doc_ngram_novelty"] = q_doc_ngram_novelty

SPAN_DEDUP_ORACLES["doc_ngram_novelty"] = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
wins AS (
  SELECT doc_id, array_to_string(l[i : i + {_K} - 1], ' ') AS win
  FROM w,
       LATERAL (SELECT unnest(generate_series(1, len(l) - {_K} + 1)) AS i) t
),
f AS (
  SELECT win, count(*) AS c FROM wins GROUP BY 1
)
SELECT wins.doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN f.c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS novel_frac
FROM wins JOIN f USING (win)
GROUP BY 1
"""
