"""Corpus-curation operators for training-data assembly: benchmark
decontamination and GPT-style sequence packing.

Decontamination (Brown et al. 2020 §C / Gao et al. 2021 style): a small
"benchmark" set's n-grams are swept against the training corpus and any
training document containing one is flagged.  The benchmark side is tiny
by construction (eval sets are thousands of docs, the corpus is
billions), so the scale-correct shape is a bounded driver collect of the
n-gram set + a ``ray.put`` broadcast probed vectorized inside
``map_batches`` — never a shuffle join of the full corpus.  Patterns are
swept as ONE RE2 alternation via ``pc.count_substring_regex`` (RE2
compiles alternations into a single DFA pass); a production-size bench
set (≥10^5 n-grams) would swap in an Aho-Corasick automaton built once
per actor in ``__init__`` — the stage shape stays identical.

Sequence packing (the pretraining concat-and-cut layout): documents are
concatenated in deterministic ``doc_id`` order and cut every ``budget``
tokens; each document reports the sequence range it lands in.  The
global token prefix-sum is computed WITHOUT a global sort:

1. one ``map_batches`` pass bins rows into ``doc_id``-range buckets
   (bounds from the parquet footer stats — zero data read) and emits
   per-(batch, bucket) partial token sums;
2. a tiny ``groupby(bucket).sum`` (≤ n_buckets rows) reaches the driver,
   which takes the exclusive prefix sum over bucket totals;
3. one ``groupby(bucket).map_groups`` pass orders each bucket locally by
   ``doc_id`` and adds its broadcast offset — the only shuffle moves each
   row once, keyed by a range-partitioned key (no skew: doc_id is dense).

``n_buckets`` bounds both the driver collect and the per-group sort;
size it ~corpus_rows / 10^6 at scale.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

# --------------------------------------------------------- decontamination
BENCH_MOD = 29          # benchmark membership: doc_id % BENCH_MOD == 0
BENCH_NGRAM = 6         # leading n-gram length swept against the corpus
BENCH_MAX_PATTERNS = 50_000  # ceiling on the broadcast small side


def _docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


class ContaminationFilter:
    """Actor-pool stage: flags training docs containing any benchmark
    n-gram.  The alternation regex is broadcast once (``ray.put``) and
    fetched once per actor in ``__init__`` (enrich.py:35 pattern)."""

    def __init__(self, regex_ref):
        self.regex = ray.get(regex_ref) if not isinstance(regex_ref, str) else regex_ref

    def __call__(self, t: pa.Table) -> pa.Table:
        train = pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD != 0)
        if not self.regex:
            return t.select(["doc_id"]).filter(pa.array([False] * len(t)))
        hit = pc.greater(pc.count_substring_regex(t["text"], self.regex), 0)
        return t.select(["doc_id"]).filter(pc.and_(train, hit))


def bench_ngrams(sf_dir: str) -> list[str]:
    """The benchmark side's leading n-grams — a bounded driver collect of
    the SMALL side (≤ BENCH_MAX_PATTERNS, enforced)."""

    def extract(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD == 0
        sub = t.filter(pa.array(keep))
        toks = pc.split_pattern(sub["text"], " ")
        ng = pc.binary_join(pc.list_slice(toks, 0, BENCH_NGRAM), " ")
        return pa.table({"ng": ng})

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow"
    ).take_all()
    if len(rows) > BENCH_MAX_PATTERNS:
        raise ValueError(
            f"benchmark side has {len(rows)} n-grams, over the "
            f"{BENCH_MAX_PATTERNS} broadcast ceiling; use an Aho-Corasick "
            "actor stage for bench sets this large"
        )
    return sorted({r["ng"] for r in rows})


def q_doc_decontaminate(sf_dir: str):
    """Training docs contaminated by a benchmark n-gram (doc_ids)."""
    regex = "|".join(re.escape(p) for p in bench_ngrams(sf_dir))
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ContaminationFilter,
        fn_constructor_args=[ray.put(regex)],
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ------------------------------------- decontamination, Bloom scale path
#
# q_doc_decontaminate broadcasts the bench n-grams as one RE2 alternation,
# which is right for eval-set-sized pattern sets but caps out at
# BENCH_MAX_PATTERNS.  This is the ≥10^5-pattern path: the bench side is
# summarized into a FIXED-SIZE Bloom filter (built distributed, OR-merged
# on the driver — one bitmap row per batch — then ``ray.put`` once), every
# training doc's word-aligned n-grams are hashed vectorized and probed
# against the broadcast bits, and the few survivors are verified EXACTLY
# by a hash-partitioned repartition join back to the bench n-gram set
# with a final string-equality filter.  False positives cost only a
# candidate row; the result is exact.  Word hashes come from polars
# (seeded ahash — process-stable, vectorized in Rust); gram hashes are a
# polynomial fold over the window's word hashes, so gram STRINGS are only
# materialized for bloom survivors.
#
# Semantics note: this variant matches word-aligned n-grams (the standard
# decontamination definition), while q_doc_decontaminate matches raw
# substrings; bench docs shorter than BENCH_NGRAM tokens are excluded.

BLOOM_BITS_LOG2 = 17  # m = 2^17 bits (16 KiB); size ~2^30 for 10^7-gram benches
BLOOM_K = 4           # probes per key

from .hashing import gram_hashes as _gram_hashes  # noqa: E402
from .hashing import word_hashes as _word_hashes  # noqa: E402


def _bloom_positions(h: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """BLOOM_K bit positions per key via double hashing h1 + i·h2."""
    h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    mask = np.uint64(m_bits - 1)
    return [(h + np.uint64(i) * h2) & mask for i in range(BLOOM_K)]


def _bench_ngram_ds(sf_dir: str) -> rd.Dataset:
    """Distinct bench leading n-grams as (h int64, ng string) — a Dataset,
    never collected (contrast bench_ngrams' bounded driver collect)."""

    def extract(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD == 0
        sub = t.filter(pa.array(keep))
        empty = pa.table({"h": pa.array([], pa.int64()), "ng": pa.array([], pa.string())})
        if len(sub) == 0:
            return empty
        toks = pc.split_pattern(sub["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        full = pc.greater_equal(pc.list_value_length(toks), BENCH_NGRAM)
        lead = pc.list_slice(toks.filter(full), 0, BENCH_NGRAM)
        rows = len(lead)
        if rows == 0:
            return empty
        from .hashing import POLY

        flat = pc.list_flatten(lead)
        wh = _word_hashes(flat).reshape(rows, BENCH_NGRAM)
        acc = np.zeros(rows, dtype=np.uint64)
        for j in range(BENCH_NGRAM):
            acc = acc * POLY + wh[:, j]
        return pa.table(
            {
                "h": pa.array(acc.view(np.int64), type=pa.int64()),
                "ng": pc.binary_join(lead, " "),
            }
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket", pa.array((h.view(np.uint64) % np.uint64(64)).astype(np.int64))
        )

    def distinct(g: pa.Table) -> pa.Table:
        # distinct (h, ng) per bucket group — one lexsort instead of a
        # groupby whose group count equals the bench n-gram count (the
        # ≥10^5-pattern regime this path exists for)
        if len(g) == 0:
            return pa.table({"h": pa.array([], pa.int64()), "ng": pa.array([], pa.string())})
        h = g["h"].to_numpy(zero_copy_only=False)
        ng = g["ng"]
        ng = ng.combine_chunks() if isinstance(ng, pa.ChunkedArray) else ng
        codes = ng.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((h, codes))
        c, hh = codes[order], h[order]
        first = np.empty(len(c), dtype=bool)
        first[:1] = True
        first[1:] = (c[1:] != c[:-1]) | (hh[1:] != hh[:-1])
        idx = pa.array(order[first].astype(np.int64))
        return pa.table({"h": pa.array(hh[first], type=pa.int64()), "ng": ng.take(idx)})

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(extract, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct, batch_format="pyarrow")
    )


def _build_bloom(bench: rd.Dataset, m_bits: int) -> np.ndarray:
    """Distributed build: one fixed-size bitmap row per batch, OR-merged
    on the driver (driver traffic = #batches × m/8 bytes, corpus-free)."""

    def bitmap(t: pa.Table) -> pa.Table:
        words = np.zeros(m_bits // 64, dtype=np.uint64)
        if len(t):
            h = t["h"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            for pos in _bloom_positions(h, m_bits):
                np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([words.tobytes()], type=pa.binary())})

    acc = np.zeros(m_bits // 64, dtype=np.uint64)
    for row in bench.map_batches(bitmap, batch_format="pyarrow").take_all():
        acc |= np.frombuffer(row["bits"], dtype=np.uint64)
    return acc


class BloomProbeStage:
    """Actor-pool stage: hash every word-aligned n-gram of each training
    doc, keep bloom survivors, and materialize gram strings ONLY for
    them.  Bits fetched once per actor (enrich.py:35 pattern)."""

    def __init__(self, bits_ref):
        self.bits = ray.get(bits_ref)
        self.m_bits = len(self.bits) * 64

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.int64()),
             "ng": pa.array([], pa.string())}
        )
        train = t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD != 0
        sub = t.filter(pa.array(train))
        if len(sub) == 0:
            return empty
        toks = pc.split_pattern(sub["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.values
        acc = _gram_hashes(_word_hashes(flat), BENCH_NGRAM)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.maximum(n - BENCH_NGRAM + 1, 0)
        total = int(k.sum())
        if total == 0:
            return empty
        row_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.repeat(row_off[:-1], k) + (
            np.arange(total) - np.repeat(np.cumsum(k) - k, k)
        )
        h = acc[starts]
        ok = np.ones(total, dtype=bool)
        for pos in _bloom_positions(h, self.m_bits):
            ok &= (self.bits[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1) == 1
        if not ok.any():
            return empty
        doc = np.repeat(
            pc.cast(sub["doc_id"], pa.int64()).to_numpy(zero_copy_only=False), k
        )[ok]
        h, starts = h[ok], starts[ok]
        # dedupe (doc, h) — one candidate row per distinct gram per doc
        order = np.lexsort((h, doc))
        doc, h, starts = doc[order], h[order], starts[order]
        first = np.empty(len(doc), dtype=bool)
        first[:1] = True
        first[1:] = (doc[1:] != doc[:-1]) | (h[1:] != h[:-1])
        doc, h, starts = doc[first], h[first], starts[first]
        ns = len(doc)
        gather = np.repeat(starts, BENCH_NGRAM) + np.tile(np.arange(BENCH_NGRAM), ns)
        vals = flat.take(pa.array(gather, type=pa.int64()))
        grams = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (ns + 1) * BENCH_NGRAM, BENCH_NGRAM), type=pa.int32()),
            vals,
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "h": pa.array(h.view(np.int64), type=pa.int64()),
                "ng": pc.binary_join(grams, " "),
            }
        )


def q_doc_decontaminate_bloom(sf_dir: str, m_bits: int = 1 << BLOOM_BITS_LOG2):
    """Training docs containing a word-aligned benchmark n-gram — the
    unbounded-pattern-count scale path (Bloom prefilter + exact join
    verify).  Result is exact for ANY ``m_bits`` (false positives only
    add candidate rows); same output schema as doc_decontaminate."""
    from .dedup import _ensure_schema, _join_partitions

    bench = _bench_ngram_ds(sf_dir).materialize()
    bits_ref = ray.put(_build_bloom(bench, m_bits))
    cand_schema = pa.schema(
        [("doc_id", pa.int64()), ("h", pa.int64()), ("ng", pa.string())]
    )
    cand = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            BloomProbeStage,
            fn_constructor_args=[bits_ref],
            batch_format="pyarrow",
            concurrency=(1, 4),
        ),
        cand_schema,
    ).materialize()
    empty = pa.schema([("doc_id", pa.int64())]).empty_table()
    n_cand = cand.count()
    if n_cand == 0:
        return empty

    joined = cand.join(
        bench, "inner",
        num_partitions=_join_partitions(n_cand, bench.count()),
        on=("h",), right_on=("h",), right_suffix="_r",
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        # hash-collision guard: candidate gram must STRING-match the bench
        # gram (keeps the result exact however the bloom/hash behaves)
        return t.filter(pc.equal(t["ng"], t["ng_r"])).select(["doc_id"])

    return (
        joined.map_batches(verify, batch_format="pyarrow")
        .groupby("doc_id")
        .count()
        .map_batches(
            lambda t: t.select(["doc_id"]) if len(t) else empty,
            batch_format="pyarrow",
        )
    )


# --------------------------------------------------------- sequence packing
PACK_BUDGET = 512       # tokens per packed training sequence
PACK_BUCKETS = 64       # doc_id-range buckets (driver collect ≤ this)


def _id_bounds(src: str) -> tuple[int, int]:
    """(lo, hi) of doc_id from parquet footer stats — zero data read
    (quantile.py:_value_bounds shape)."""
    md = pq.read_metadata(src)
    col = next(
        i for i in range(len(md.schema)) if md.schema.column(i).name == "doc_id"
    )
    lo, hi = math.inf, -math.inf
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(col).statistics
        if st is not None and st.has_min_max:
            lo, hi = min(lo, st.min), max(hi, st.max)
    if not math.isfinite(lo):
        raise ValueError(f"no doc_id min/max statistics in {src}")
    return int(lo), int(hi)


def q_doc_pack_sequences(sf_dir: str, budget: int = PACK_BUDGET,
                         n_buckets: int = PACK_BUCKETS):
    """Concat-and-cut sequence packing: per-doc (seq_first, seq_last,
    n_seqs) under a ``budget``-token cut, docs ordered by doc_id."""
    src = os.path.join(sf_dir, "documents.parquet")
    lo, hi = _id_bounds(src)
    width = max(1, (hi - lo) // n_buckets + 1)

    def tok(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        n = pc.cast(pc.add(pc.count_substring(t["text"], " "), 1), pa.int64())
        bucket = (ids.to_numpy(zero_copy_only=False) - lo) // width
        return pa.table(
            {"doc_id": ids, "n_tokens": n,
             "bucket": pa.array(bucket, type=pa.int64())}
        )

    toks = _docs(sf_dir, ["doc_id", "text"]).map_batches(tok, batch_format="pyarrow")

    # pass 1: bucket token totals → exclusive prefix sum on the driver
    # (≤ n_buckets rows cross to the driver — bounded by construction)
    totals = toks.groupby("bucket").sum("n_tokens").to_pandas()
    totals = totals.sort_values("bucket")
    excl = totals["sum(n_tokens)"].cumsum().shift(fill_value=0).to_numpy()
    offsets = dict(zip(totals["bucket"].to_numpy(), excl.astype(np.int64)))

    # pass 2: within-bucket doc_id order + local cumsum + bucket offset
    def pack(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(n) + offsets[g["bucket"][0].as_py()]
        first = (cum - n) // budget
        last = (cum - 1) // budget
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"],
                "seq_first": pa.array(first, type=pa.int64()),
                "seq_last": pa.array(last, type=pa.int64()),
                "n_seqs": pa.array(last - first + 1, type=pa.int64()),
            }
        )

    return toks.groupby("bucket").map_groups(pack, batch_format="pyarrow")


# ------------------------------------------------- fused curation pipeline
CURATE_MIN_TOKENS = 10
CURATE_MAX_TOKENS = 10_000
CURATE_MIN_ALPHA = 0.75


def q_doc_curate(sf_dir: str):
    """The canonical assemble-a-training-corpus composition, fused into
    ONE streaming pass + ONE shuffle: per-doc length / alpha-ratio /
    Gopher-repetition filters computed together in a single
    ``map_batches`` (each batch is read once, all metrics share the
    tokenization), survivors keyed by content fingerprint, and exact
    dedup via ``groupby(fp).min(doc_id)``.  Runs over the
    planted-duplicates corpus so the dedup stage has real work; output
    is the curated keep-list (one doc_id per surviving distinct text)."""
    from .dedup import corpus_ds
    from .text import REP_DISTINCT_RATIO, REP_TOP_FRAC, rep_counts
    import hashlib

    def stage(t: pa.Table) -> pa.Table:
        n, n_distinct, top = rep_counts(t["text"])
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_alpha = pc.cast(
            pc.count_substring_regex(t["text"], "[A-Za-z]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        alpha_ratio = n_alpha.astype(np.float64) / n_chars
        top_frac = top.astype(np.float64) / n
        distinct_ratio = n_distinct.astype(np.float64) / n
        ok = (
            (n >= CURATE_MIN_TOKENS)
            & (n <= CURATE_MAX_TOKENS)
            & (alpha_ratio >= CURATE_MIN_ALPHA)
            & ~((top_frac > REP_TOP_FRAC) | (distinct_ratio < REP_DISTINCT_RATIO))
        )
        sub = t.filter(pa.array(ok))
        fp = [hashlib.md5(s.encode()).hexdigest() for s in sub["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pc.cast(sub["doc_id"], pa.int64()),
                "fp": pa.array(fp, type=pa.string()),
            }
        )

    from .dedup import min_id_per_key

    return min_id_per_key(
        corpus_ds(sf_dir).map_batches(stage, batch_format="pyarrow"), key="fp"
    )


# --------------------------------------------------------- chunking
CHUNK_SIZE = 32         # tokens per chunk
CHUNK_STRIDE = 24       # chunk start spacing (CHUNK_SIZE−stride overlap)


def q_doc_chunk(sf_dir: str, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE):
    """Overlapping token-window chunking (the RAG / context-window
    preprocessing flat_map): each doc explodes into windows starting at
    0, stride, 2·stride, …, where the LAST window is the first that
    reaches the end of the doc (shorter if the doc ends early; a doc
    with ≤ size tokens is one chunk).

    1→many with overlap, fully vectorized: tokens are flattened once per
    batch (zero-copy list buffer), chunk membership becomes pure index
    arithmetic (np.repeat / cumsum aranges), one ``take`` gathers every
    chunk's tokens, and ``ListArray.from_arrays`` + ``binary_join``
    reassembles chunk text — no per-row Python.  Stateless map_batches:
    no shuffle, no driver traffic."""

    def f(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        # chunks per doc: 1 + ceil((n - size) / stride) for n > size
        k = 1 + np.maximum(0, -(-(n - size) // stride))
        doc = np.repeat(pc.cast(t["doc_id"], pa.int64()).to_numpy(
            zero_copy_only=False), k)
        total = int(k.sum())
        # chunk_idx within doc: concatenated aranges
        idx = np.arange(total) - np.repeat(np.cumsum(k) - k, k)
        start = idx * stride
        stop = np.minimum(start + size, np.repeat(n, k))
        clen = stop - start
        # gather: flat token index per (chunk, position)
        row_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat_start = np.repeat(row_off[:-1], k) + start
        pos_total = int(clen.sum())
        within = np.arange(pos_total) - np.repeat(np.cumsum(clen) - clen, clen)
        gather = np.repeat(flat_start, clen) + within
        vals = toks.values.take(pa.array(gather, type=pa.int64()))
        chunks = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(clen))), type=pa.int32()), vals
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "chunk_idx": pa.array(idx, type=pa.int64()),
                "n_chunk_tokens": pa.array(clen, type=pa.int64()),
                "chunk_text": pc.binary_join(chunks, " "),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------- line-level dedup
# CCNet / C4-style cross-document "line" deduplication (Wenzek et al.
# 2020 §4.1; Raffel et al. 2020 §2.2 "three-sentence span" rule), adapted
# to the whitespace corpus: a "line" is a fixed SEG_WORDS-word segment
# (non-overlapping, last segment short).  Every segment is hashed, the
# global per-segment document frequency is computed by ONE
# hash-partitioned groupby (exactly how CCNet shards by line hash), and
# each document reports how many of its segment slots carry a segment
# seen in >=2 distinct documents.  At 100 TB the exploded table is
# ~words/SEG_WORDS rows of (int64, uint64) — it streams through one
# shuffle keyed by segment hash; nothing corpus-sized reaches the driver.
SEG_WORDS = 8


def _segment_hashes(t: pa.Table):
    """Per-slot segment hashes for one batch of whole documents.

    Vectorized end-to-end: one flat word-hash pass (hashing.word_hashes),
    segment hashes by a SEG_WORDS-step masked polynomial fold (each step
    touches every segment that has a word at that offset — identical to
    the scalar fold over the segment's words).  Returns
    ``(toks, nseg_per_doc, acc)`` where ``acc[k]`` is the hash of global
    slot ``k`` (slots ordered doc-major, slot-minor)."""
    from .hashing import POLY, word_hashes

    toks = pc.split_pattern(t["text"], " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    wh = word_hashes(toks.values)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.cumsum(lens) - lens
    pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
    nseg = -(-lens // SEG_WORDS)  # ceil; empty text splits to [''] → 1 seg
    seg_idx = np.repeat(np.cumsum(nseg) - nseg, lens) + pos // SEG_WORDS
    acc = np.zeros(int(nseg.sum()), dtype=np.uint64)
    off = pos % SEG_WORDS
    for j in range(SEG_WORDS):
        m = off == j  # ≤1 word per segment at each offset → no collisions
        si = seg_idx[m]
        acc[si] = acc[si] * POLY + wh[m]
    return toks, nseg, acc


def _segment_pairs(t: pa.Table) -> pa.Table:
    """Distinct (doc_id, seg_hash) pairs with in-doc multiplicity, by a
    lexsort run-length over the slot hashes.  Docs are whole within a
    batch, so in-batch-distinct pairs are globally distinct."""
    doc_ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    _, nseg, acc = _segment_hashes(t)
    seg_doc = np.repeat(doc_ids, nseg)
    order = np.lexsort((acc, seg_doc))
    sd, sh = seg_doc[order], acc[order]
    new = np.concatenate(([True], (sd[1:] != sd[:-1]) | (sh[1:] != sh[:-1])))
    first = np.flatnonzero(new)
    mult = np.diff(np.append(first, len(sd)))
    return pa.table(
        {
            "doc_id": pa.array(sd[first], type=pa.int64()),
            "seg_hash": pa.array(sh[first].view(np.int64), type=pa.int64()),
            "mult": pa.array(mult, type=pa.int64()),
        }
    )


LINE_DEDUP_SEG_BUCKETS = 64  # seg-hash buckets for the frequency sweep


def _seg_bucket(t: pa.Table) -> pa.Table:
    """Route segment rows by seg-hash bucket: every occurrence of a
    segment lands in ONE bucket, so document frequency AND the
    frequency-to-row attach both happen inside the bucket group — the
    Acero join + Count-groupby barriers collapse into one shuffle (the
    `_pair_group_counts` sweep shape, measured ~10× on tiny-group
    corpora)."""
    h = t["seg_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
    return t.append_column(
        "bucket",
        pa.array((h % np.uint64(LINE_DEDUP_SEG_BUCKETS)).astype(np.int64)),
    )


def q_doc_line_dedup(sf_dir: str):
    """Per-doc duplicated-segment stats: (doc_id, n_segments,
    n_dup_segments) where a segment is "dup" iff its content appears in
    ≥2 distinct documents.  One explode pass → ONE seg-hash-bucketed
    shuffle (each bucket computes its segments' document frequencies by
    a lexsort run-length and folds them straight into per-doc partials)
    → a tiny per-doc sum.

    Segment identity here is the 64-bit seg_hash (segment text is never
    shipped on this stats-only path): a hash collision can overcount
    n_dup_segments by one, at ~2^-64 per segment pair — acceptable for a
    non-destructive statistic.  The removal transform
    (q_doc_line_dedup_clean) verifies by exact segment text instead."""
    from ray.data.aggregate import Sum

    from .dedup import _ensure_schema

    empty = pa.schema(
        [("doc_id", pa.int64()), ("n_segments", pa.int64()),
         ("n_dup_segments", pa.int64())]
    ).empty_table()

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        sh = g["seg_hash"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        mult = g["mult"].to_numpy(zero_copy_only=False)
        order = np.argsort(sh, kind="stable")
        sh_s, d_s, m_s = sh[order], d[order], mult[order]
        new = np.concatenate(([True], sh_s[1:] != sh_s[:-1]))
        # rows are distinct per (doc, seg) → run length == doc frequency
        starts = np.flatnonzero(new)
        runlen = np.diff(np.append(starts, len(sh_s)))
        dup = np.repeat(runlen >= 2, runlen)
        uniq, inv = np.unique(d_s, return_inverse=True)
        n_seg = np.bincount(inv, weights=m_s).astype(np.int64)
        n_dup = np.bincount(inv, weights=m_s * dup).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_segments": pa.array(n_seg, type=pa.int64()),
                "n_dup_segments": pa.array(n_dup, type=pa.int64()),
            }
        )

    pairs = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_segment_pairs, batch_format="pyarrow")
        .map_batches(_seg_bucket, batch_format="pyarrow"),
        pa.schema(
            [("doc_id", pa.int64()), ("seg_hash", pa.int64()),
             ("mult", pa.int64()), ("bucket", pa.int64())]
        ),
    )
    return (
        pairs.groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_segments", alias_name="n_segments"),
            Sum("n_dup_segments", alias_name="n_dup_segments"),
        )
    )


LINE_DEDUP_BUCKETS = 256  # doc-hash buckets for the vectorized rebuild


def _slot_segment_rows(t: pa.Table) -> pa.Table:
    """One row per segment SLOT: (doc_id, slot, seg_hash, seg text).
    Segment text is materialized here because the cleaned document is
    reassembled from surviving segments downstream (CCNet ships line
    content through its hash-keyed shards the same way)."""
    doc_ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
    toks, nseg, acc = _segment_hashes(t)
    total = int(nseg.sum())
    slot = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(nseg) - nseg, nseg)
    # segment text: a list array whose row k covers slot k's word range
    row_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(row_off)
    seg_start = np.repeat(row_off[:-1], nseg) + slot * SEG_WORDS
    seg_len = np.minimum(SEG_WORDS, np.repeat(lens, nseg) - slot * SEG_WORDS)
    offsets = np.concatenate(([0], np.cumsum(seg_len)))
    # Load-bearing contiguity invariant: rebuilding the list offsets from
    # cumsum(seg_len) is correct only because slots tile each doc's word
    # range contiguously AND the docs' flat ranges are adjacent in
    # toks.values starting at 0 (a sliced/offset list array would break
    # this silently — e.g. after a combine_chunks on a sliced batch).
    assert total == 0 or (
        seg_start[0] == 0 and np.array_equal(seg_start, offsets[:-1])
    ), "segment slots must tile toks.values contiguously from offset 0"
    segs = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), toks.values)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids, nseg), type=pa.int64()),
            "slot": pa.array(slot, type=pa.int64()),
            "seg_hash": pa.array(acc.view(np.int64), type=pa.int64()),
            "seg": pc.binary_join(segs, " "),
        }
    )


def q_doc_line_dedup_clean(sf_dir: str):
    """The full CCNet/C4 removal transform: every document rebuilt with
    its cross-document duplicate segments REMOVED (a fully-duplicate doc
    comes back as an empty string, mirroring the oracle's coalesce).

    Shape: slot rows (with segment text) routed by seg-hash bucket — the
    CCNet shard key; each bucket computes its segments' document
    frequencies by one lexsort run-length over EXACT segment text
    (dictionary-encoded in-bucket; the 64-bit hash only routes, so a
    hash collision can never delete non-duplicate text) and nulls dup
    segments in place (no Acero join, no separate Count barrier) — then ONE
    doc-hash-bucketed shuffle where each bucket reassembles its docs
    vectorized (lexsort by (doc, slot), run-length list rebuild, one
    binary_join) — no per-doc Python, nothing corpus-sized on the
    driver."""
    from .dedup import _ensure_schema

    mark_empty = pa.schema(
        [("doc_id", pa.int64()), ("slot", pa.int64()),
         ("seg", pa.string()), ("bucket", pa.int64())]
    ).empty_table()

    def mark_sweep(g: pa.Table) -> pa.Table:
        # slot rows of this seg-hash bucket: doc frequency per segment by
        # a (segment, doc) lexsort run-length; dup segments nulled (the
        # row survives so a fully-dup doc still reaches the rebuild, as
        # ''); re-routed by doc-hash bucket for the reassembly shuffle.
        # The destructive decision uses EXACT segment equality, not the
        # 64-bit seg_hash: equal text always shares a bucket (same hash),
        # so dictionary-encoding the co-located text gives exact
        # within-bucket string keys — a hash collision can never delete
        # non-duplicate text (the routing hash only co-locates).
        if len(g) == 0:
            return mark_empty
        seg_exact = g["seg"]
        if isinstance(seg_exact, pa.ChunkedArray):
            seg_exact = seg_exact.combine_chunks()
        sh = seg_exact.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, sh))
        sh_s, d_s = sh[order], d[order]
        new_seg = np.concatenate(([True], sh_s[1:] != sh_s[:-1]))
        new_pair = new_seg | np.concatenate(([True], d_s[1:] != d_s[:-1]))
        run_id = np.cumsum(new_seg) - 1
        nd = np.bincount(run_id[new_pair], minlength=run_id[-1] + 1)
        dup_sorted = np.repeat(nd >= 2, np.diff(
            np.append(np.flatnonzero(new_seg), len(sh_s))
        ))
        dup = np.empty(len(sh_s), dtype=bool)
        dup[order] = dup_sorted
        seg = pc.if_else(pa.array(~dup), seg_exact, pa.scalar(None, pa.string()))
        bucket = (
            d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        ) % np.uint64(LINE_DEDUP_BUCKETS)
        return pa.table(
            {
                "doc_id": g["doc_id"],
                "slot": g["slot"],
                "seg": seg,
                "bucket": pa.array(bucket.astype(np.int64)),
            }
        )

    rebuild_empty = pa.schema(
        [("doc_id", pa.int64()), ("clean_text", pa.string())]
    ).empty_table()

    def rebuild(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return rebuild_empty
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        slot = g["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((slot, d))
        d = d[order]
        segs = g["seg"].combine_chunks().take(pa.array(order, type=pa.int64()))
        valid = ~np.asarray(segs.is_null())
        new_doc = np.concatenate(([True], d[1:] != d[:-1]))
        doc_ord = np.cumsum(new_doc) - 1
        n_out = int(new_doc.sum())
        counts = np.bincount(doc_ord[valid], minlength=n_out)
        kept = segs.filter(pa.array(valid))
        lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(counts))), type=pa.int32()), kept
        )
        return pa.table(
            {
                "doc_id": pa.array(d[new_doc], type=pa.int64()),
                "clean_text": pc.binary_join(lists, " "),
            }
        )

    slots = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_slot_segment_rows, batch_format="pyarrow")
        .map_batches(_seg_bucket, batch_format="pyarrow"),
        pa.schema(
            [("doc_id", pa.int64()), ("slot", pa.int64()),
             ("seg_hash", pa.int64()), ("seg", pa.string()),
             ("bucket", pa.int64())]
        ),
    )
    return (
        slots.groupby("bucket")
        .map_groups(mark_sweep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rebuild, batch_format="pyarrow")
    )


CURATION_QUERIES = {
    "doc_decontaminate": q_doc_decontaminate,
    "doc_decontaminate_bloom": q_doc_decontaminate_bloom,
    "doc_curate": q_doc_curate,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_chunk": q_doc_chunk,
    "doc_line_dedup": q_doc_line_dedup,
    "doc_line_dedup_clean": q_doc_line_dedup_clean,
}

CURATION_ORACLES = {
    "doc_decontaminate": f"""
WITH bench AS (
  SELECT array_to_string(string_split(text, ' ')[1:{BENCH_NGRAM}], ' ') AS ng
  FROM documents WHERE doc_id % {BENCH_MOD} = 0
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id % {BENCH_MOD} <> 0
  AND EXISTS (SELECT 1 FROM bench b WHERE contains(d.text, b.ng))
""",
    "doc_decontaminate_bloom": f"""
WITH bench AS (
  SELECT DISTINCT array_to_string(string_split(text, ' ')[1:{BENCH_NGRAM}], ' ') AS ng
  FROM documents
  WHERE doc_id % {BENCH_MOD} = 0 AND len(string_split(text, ' ')) >= {BENCH_NGRAM}
), tr AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE doc_id % {BENCH_MOD} <> 0
), grams AS (
  SELECT doc_id, array_to_string(toks[i : i + {BENCH_NGRAM} - 1], ' ') AS ng
  FROM tr, LATERAL unnest(generate_series(1, n - {BENCH_NGRAM} + 1)) AS t(i)
  WHERE n >= {BENCH_NGRAM}
)
SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (ng)
""",
    "doc_pack_sequences": f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
           OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
SELECT doc_id, n_tokens,
       (cum - n_tokens) // {PACK_BUDGET} AS seq_first,
       (cum - 1) // {PACK_BUDGET} AS seq_last,
       (cum - 1) // {PACK_BUDGET} - (cum - n_tokens) // {PACK_BUDGET} + 1 AS n_seqs
FROM s
""",
    "doc_chunk": f"""
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
), e AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(
           0,
           CASE WHEN n <= {CHUNK_SIZE} THEN 0
                ELSE CAST(ceil((n - {CHUNK_SIZE}) / {CHUNK_STRIDE}.0) AS BIGINT)
           END)) AS chunk_idx
  FROM s
)
SELECT doc_id, chunk_idx,
       least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)
         - chunk_idx * {CHUNK_STRIDE} AS n_chunk_tokens,
       array_to_string(
         toks[chunk_idx * {CHUNK_STRIDE} + 1
              : least(chunk_idx * {CHUNK_STRIDE} + {CHUNK_SIZE}, n)],
         ' ') AS chunk_text
FROM e
""",
}

# doc_curate's oracle composes dedup's planted-corpus CTE with the
# repetition/quality predicates (module-level import is safe: dedup has no
# import back into curation)
from .dedup import CORPUS_SQL as _CORPUS_SQL  # noqa: E402
from .text import REP_DISTINCT_RATIO as _RDR, REP_TOP_FRAC as _RTF  # noqa: E402

CURATION_ORACLES["doc_curate"] = f"""
WITH {_CORPUS_SQL.split('WITH')[-1] if 'WITH' in _CORPUS_SQL else _CORPUS_SQL.strip()}
, c AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus)
  GROUP BY 1, 2
), rep AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_frac,
         CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dr
  FROM c GROUP BY doc_id
), m AS (
  SELECT d.doc_id, md5(d.text) AS fp
  FROM corpus d JOIN rep r USING (doc_id)
  WHERE r.n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS}
    AND CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
          / length(d.text) >= {CURATE_MIN_ALPHA}
    AND NOT (r.top_frac > {_RTF} OR r.dr < {_RDR})
)
SELECT min(doc_id) AS doc_id FROM m GROUP BY fp
"""


# --------------------------------------------- curated-corpus shard writer

def write_curated_shards(sf_dir: str, out_dir: str, num_shards: int = 16,
                         resume: bool = True) -> dict:
    """Materialize the curated corpus (``q_doc_curate``'s keep-list applied
    back to the planted corpus) as ``num_shards`` deterministic
    hash-sharded parquet directories plus a ``_manifest.json`` — the
    end-of-pipeline layout a training job consumes.

    Resumable by construction (checkpoint.py's lineage shape, scoped to
    one table): each shard writes to ``out/shard=K/`` and records itself
    in the manifest only after its ``write_parquet`` returns; a rerun
    with ``resume=True`` skips recorded shards (a failed run re-does only
    missing ones).  Shard membership is ``hash(doc_id) % num_shards`` —
    stable across runs and cluster sizes, so resume never reassigns rows.
    One filtered streaming pass per missing shard; the keep-list is a
    Dataset side of a bucketed anti-join, never a driver set."""
    from .dedup import corpus_ds

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.json")
    manifest = {"num_shards": num_shards, "shards": {}}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prev = json.load(f)
        if prev.get("num_shards") == num_shards:
            manifest = prev

    kept = q_doc_curate(sf_dir).materialize()

    def tag_shard(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        s = (ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
            num_shards
        )
        return t.append_column("shard", pa.array(s.astype(np.int64)))

    corpus = corpus_ds(sf_dir)

    # attach the keep flag via an inner repartition join on doc_id —
    # corpus rows not in the keep-list drop out of the join
    from .dedup import _ensure_schema, _join_partitions

    kept_keyed = _ensure_schema(
        kept, pa.schema([("doc_id", pa.int64())])
    )
    n_keep = kept_keyed.count()
    # one join per RUN (materialized); the per-shard passes below are
    # block-local filters over the pinned result, not join re-executions
    joined = corpus.join(
        kept_keyed, "inner",
        num_partitions=_join_partitions(n_keep, n_keep),
        on=("doc_id",), right_on=("doc_id",), right_suffix="_r",
    ).map_batches(tag_shard, batch_format="pyarrow").materialize()
    drop_cols = [c for c in joined.schema().names if c not in ("doc_id", "text")]

    written = []
    for k in range(num_shards):
        if str(k) in manifest["shards"]:
            continue
        shard_dir = os.path.join(out_dir, f"shard={k}")
        shutil.rmtree(shard_dir, ignore_errors=True)  # partial prior write
        part = joined.filter(expr=f"shard == {k}").drop_columns(drop_cols)
        part.write_parquet(shard_dir)
        n = sum(
            pq.read_metadata(os.path.join(shard_dir, f)).num_rows
            for f in os.listdir(shard_dir)
            if f.endswith(".parquet")
        )
        manifest["shards"][str(k)] = {"rows": int(n)}
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)  # atomic publish per shard
        written.append(k)
    return {"written": written, "manifest": manifest}


CURATION_ORACLES["doc_line_dedup"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
seg AS (
  SELECT doc_id, array_to_string(ws[s + 1 : s + {SEG_WORDS}], ' ') AS seg
  FROM w, LATERAL (SELECT unnest(generate_series(0, len(ws) - 1, {SEG_WORDS})) AS s) t
),
freq AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1)
SELECT doc_id, count(*) AS n_segments,
       CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments
FROM seg JOIN freq USING (seg)
GROUP BY 1
"""


CURATION_ORACLES["doc_line_dedup_clean"] = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
seg AS (
  SELECT doc_id, s // {SEG_WORDS} AS slot,
         array_to_string(ws[s + 1 : s + {SEG_WORDS}], ' ') AS seg
  FROM w, LATERAL (SELECT unnest(generate_series(0, len(ws) - 1, {SEG_WORDS})) AS s) t
),
freq AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY 1)
SELECT doc_id,
       coalesce(string_agg(seg, ' ' ORDER BY slot) FILTER (WHERE nd < 2), '')
         AS clean_text
FROM seg JOIN freq USING (seg)
GROUP BY 1
"""


# ----------------------------------- decontamination, n-gram overlap score
#
# The two q_doc_decontaminate variants answer "is this doc contaminated at
# all?" (leading-gram substring / Bloom-verified word-aligned match).
# This op is the GPT-3-style REPORT: for every training doc, HOW MANY
# distinct benchmark n-grams occur anywhere in it (sliding word-aligned
# windows over the whole doc, not just the leading position) — the number
# an eval-overlap audit publishes per document before deciding a removal
# threshold.
#
# Scale shape: the bench side is the same bounded small side as the regex
# variant (leading grams of doc_id % BENCH_MOD == 0 docs, ceiling
# enforced), broadcast ONCE as a sorted uint64 hash array via ray.put.
# The corpus pass is one flat-buffer sweep per batch: word hashes ->
# polynomial gram hashes at EVERY in-doc window (ops/hashing.py, no gram
# strings), vectorized searchsorted membership probe, and only the sparse
# surviving candidates materialize their gram strings for EXACT
# verification against the bench string set (hash collisions cost a
# candidate row, never a wrong count).  Distinct-per-doc is a lexsort +
# run-boundary count, no per-row Python on the hot path.  For bench sides
# over the ceiling, build the probe from the Bloom path's OR-merged bits
# instead; the exact-verify step is unchanged.


def q_doc_ngram_overlap(sf_dir: str):
    """(doc_id, n_overlap): distinct bench n-grams per training doc."""
    from .hashing import POLY, gram_hash_scalar

    grams = bench_ngrams(sf_dir)  # bounded + enforced small side
    bench_hashes = np.sort(
        np.array([gram_hash_scalar(g) for g in grams], dtype=np.uint64)
    )
    bench_set = frozenset(grams)
    hashes_ref = ray.put(bench_hashes)
    set_ref = ray.put(bench_set)
    g = BENCH_NGRAM

    class OverlapScorer:
        def __init__(self):
            self.bench_hashes = ray.get(hashes_ref)
            self.bench_set = ray.get(set_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_overlap": pa.array([], pa.int64())}
            )
            # empty bench side: nothing can overlap (and the searchsorted
            # probe below would index into a zero-length array)
            if len(self.bench_hashes) == 0:
                return empty
            train = t.filter(
                pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % BENCH_MOD != 0)
            )
            if len(train) == 0:
                return empty
            toks = pc.split_pattern(train["text"], " ")
            toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
            flat = pc.list_flatten(toks)
            flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            offs = offs - offs[0]
            lens = np.diff(offs)
            n_win = len(flat) - g + 1
            if n_win <= 0:
                return empty
            wh = _word_hashes(flat)
            gh = np.zeros(n_win, dtype=np.uint64)
            for j in range(g):
                gh = gh * POLY + wh[j : j + n_win]
            doc_of = np.repeat(np.arange(len(train), dtype=np.int64), lens)
            valid = doc_of[:n_win] == doc_of[g - 1 :]
            idx = np.searchsorted(self.bench_hashes, gh)
            idx[idx == len(self.bench_hashes)] = 0
            cand = valid & (self.bench_hashes[idx] == gh)
            pos = np.nonzero(cand)[0]
            if len(pos) == 0:
                return empty
            # sparse exact verify: materialize candidate gram strings only
            parts = [flat.take(pa.array(pos + j)) for j in range(g)]
            cand_strs = parts[0]
            for p in parts[1:]:
                cand_strs = pc.binary_join_element_wise(cand_strs, p, " ")
            ok = np.fromiter(
                (s in self.bench_set for s in cand_strs.to_pylist()),
                dtype=bool,
                count=len(pos),
            )
            pos = pos[ok]
            if len(pos) == 0:
                return empty
            d, h = doc_of[pos], gh[pos]
            order = np.lexsort((h, d))
            d, h = d[order], h[order]
            first = np.concatenate([[True], (d[1:] != d[:-1]) | (h[1:] != h[:-1])])
            n_per_doc = np.bincount(d[first], minlength=len(train)).astype(np.int64)
            hit_docs = np.nonzero(n_per_doc)[0]
            ids = train["doc_id"].to_numpy(zero_copy_only=False)[hit_docs]
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_overlap": pa.array(n_per_doc[hit_docs], type=pa.int64()),
                }
            )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        OverlapScorer, batch_format="pyarrow", concurrency=(1, 4)
    )


CURATION_QUERIES["doc_ngram_overlap"] = q_doc_ngram_overlap

CURATION_ORACLES["doc_ngram_overlap"] = f"""
WITH bench AS (
  SELECT DISTINCT array_to_string(l[1:{BENCH_NGRAM}], ' ') AS ng
  FROM (SELECT string_split(text, ' ') AS l FROM documents
        WHERE doc_id % {BENCH_MOD} = 0)
  WHERE len(l) >= {BENCH_NGRAM}
),
train AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE doc_id % {BENCH_MOD} <> 0
),
grams AS (
  SELECT doc_id, array_to_string(l[i : i + {BENCH_NGRAM} - 1], ' ') AS ng
  FROM train,
       LATERAL (SELECT unnest(generate_series(1, len(l) - {BENCH_NGRAM} + 1)) AS i) t
)
SELECT doc_id, count(DISTINCT g.ng) AS n_overlap
FROM grams g JOIN bench b USING (ng)
GROUP BY doc_id
"""


# ------------------------------------------------------ epoch shuffling
# Deterministic training-epoch shuffle: every epoch induces a fresh
# pseudorandom permutation of the corpus, realized scalably as a
# (shard, shard_pos) layout — the standard shuffled-shard format a
# training loader consumes (read shards in order, each shard is one
# file; no global sort anywhere).  16 shards here = the first hex
# nibble of the per-epoch id hash so the oracle stays a one-line
# substr; the scale knob is the nibble count (k nibbles -> 16^k
# shards, sized so one shard's local rank sort fits a worker).
SHUFFLE_EPOCH = 1


def _id_epoch_u64(ids: np.ndarray, epoch: int) -> np.ndarray:
    """Vectorized splitmix64 of (doc_id, epoch) — the default hash mode.
    Stateless and process-stable: pure integer arithmetic, no seed file."""
    x = ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * np.uint64(epoch)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def q_doc_epoch_shuffle(
    sf_dir: str, epoch: int = SHUFFLE_EPOCH, hash_mode: str = "fast"
):
    """(doc_id, shard, shard_pos): deterministic epoch-``epoch`` global
    shuffle.  shard = top 4 bits of the per-epoch id hash; shard_pos =
    rank of the hash inside the shard (ties broken by doc_id).  Reading
    shard 0..15 each in shard_pos order replays one full pseudorandom
    permutation; bumping ``epoch`` yields an independent one.

    Shape: one column-pruned read of doc_id only, one vectorized hash
    pass, ONE hash shuffle on shard, and a per-shard local sort of
    O(N/n_shards) rows — never a global sort.  Dual-mode hash like
    ``doc_sample``: vectorized splitmix64 by default; md5 of
    ``"{doc_id}:{epoch}"`` in the oracle-parity mode, where the hex
    string's lexicographic order IS its numeric order so the SQL mirror
    is substr + row_number."""
    import hashlib

    def hash_shard(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        if hash_mode == "md5":
            hx = np.array(
                [
                    hashlib.md5(b"%d:%d" % (i, epoch)).hexdigest()
                    for i in ids
                ],
                dtype=object,
            )
        else:
            hx = np.char.mod("%016x", _id_epoch_u64(ids, epoch))
        # first hex nibble, vectorized: '0'..'9' -> 0..9, 'a'..'f' -> 10..15
        first = hx.astype("U1").view(np.uint32).astype(np.int64)
        shard = np.where(first >= ord("a"), first - ord("a") + 10, first - ord("0"))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "shard": pa.array(shard, type=pa.int64()),
                "h": pa.array(hx.tolist(), type=pa.string()),
            }
        )

    def rank_shard(t: pa.Table) -> pa.Table:
        t = t.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "shard": t["shard"],
                "shard_pos": pa.array(
                    np.arange(len(t), dtype=np.int64), type=pa.int64()
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(hash_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank_shard, batch_format="pyarrow")
    )


CURATION_QUERIES["doc_epoch_shuffle"] = lambda sf_dir: q_doc_epoch_shuffle(
    sf_dir, hash_mode="md5"
)

CURATION_ORACLES["doc_epoch_shuffle"] = f"""
WITH h AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_EPOCH}') AS hx
  FROM documents
)
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(hx, 1, 1)) - 1 AS BIGINT)
         AS shard,
       CAST(row_number() OVER (
              PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id
            ) - 1 AS BIGINT) AS shard_pos
FROM h
"""


# ------------------------------------------------ mixture schedule
# Deterministic multi-source interleave (the temperature-mixing analogue
# of a training loader's language schedule): each language's docs are
# pseudorandomly ordered by the per-epoch id hash, then emitted along a
# stride-scheduling virtual-time axis vt = rank / sqrt(c_lang) — a
# language with 4× the documents appears 2× as often per unit schedule
# (α = 0.5 temperature weights), every language's stream stays in its
# own shuffled order, and the whole schedule is a pure function of
# (doc_id, lang, epoch).  Composition of the two rank primitives with
# only bounded driver traffic: per-(lang, nibble) counts (≤16·n_langs
# rows) give within-language ranks, per-vt-bucket counts (≤MIX_BUCKETS
# rows) give the global position — two tiny shuffles, no global sort.
MIX_BUCKETS = 64


def q_doc_mix_schedule(
    sf_dir: str, epoch: int = SHUFFLE_EPOCH, hash_mode: str = "fast"
):
    """(doc_id, lang, sched_pos): the deterministic epoch-``epoch``
    mixing schedule over languages.  sched_pos is the dense 0-based
    global position = row_number over (vt, lang, doc_id) where
    vt = within-lang shuffled rank (1-based) / sqrt(count(lang))."""
    import hashlib

    import ray

    def hash_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        if hash_mode == "md5":
            hx = np.array(
                [hashlib.md5(b"%d:%d" % (i, epoch)).hexdigest() for i in ids],
                dtype=object,
            )
        else:
            hx = np.char.mod("%016x", _id_epoch_u64(ids, epoch))
        first = hx.astype("U1").view(np.uint32).astype(np.int64)
        nib = np.where(first >= ord("a"), first - ord("a") + 10, first - ord("0"))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "lang": t["lang"],
                "h": pa.array(hx.tolist(), type=pa.string()),
                "nib": pa.array(nib, type=pa.int64()),
            }
        )

    hashed = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        hash_rows, batch_format="pyarrow"
    ).materialize()  # consumed twice (count pass + rank pass): one hash sweep

    # ≤ 16·n_langs rows reach the driver
    cnt = hashed.groupby(["lang", "nib"]).count().to_pandas()
    cnt = cnt.sort_values(["lang", "nib"])
    lang_total = cnt.groupby("lang")["count()"].sum().to_dict()
    nib_off: dict[tuple, int] = {}
    for lang, grp in cnt.groupby("lang"):
        acc = 0
        for _, row in grp.iterrows():
            nib_off[(lang, int(row["nib"]))] = acc
            acc += int(row["count()"])

    # stage 1: within-language shuffled rank -> virtual time
    def rank_lang(t: pa.Table) -> pa.Table:
        lang = t["lang"][0].as_py()
        off = nib_off[(lang, int(t["nib"][0].as_py()))]
        t = t.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        rk = off + 1 + np.arange(len(t), dtype=np.int64)  # 1-based
        vt = rk.astype(np.float64) / np.sqrt(np.float64(lang_total[lang]))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "vt": pa.array(vt, type=pa.float64()),
            }
        )

    vts = (
        hashed.groupby(["lang", "nib"])
        .map_groups(rank_lang, batch_format="pyarrow")
    )

    # stage 2: global rank over (vt, lang, doc_id) — vt ∈ (0, sqrt(max c)]
    vt_hi = max(np.sqrt(np.float64(c)) for c in lang_total.values()) if lang_total else 1.0
    cuts = np.linspace(0.0, float(vt_hi), MIX_BUCKETS + 1)[1:-1]

    def bucketize(t: pa.Table) -> pa.Table:
        b = np.searchsorted(
            cuts, t["vt"].to_numpy(zero_copy_only=False), side="right"
        ).astype(np.int64)
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    bk = vts.map_batches(bucketize, batch_format="pyarrow").materialize()
    counts = bk.groupby("bucket").count().to_pandas().sort_values("bucket")
    offsets: dict[int, int] = {}
    acc = 0
    for b, c in zip(counts["bucket"], counts["count()"]):
        offsets[int(b)] = acc
        acc += int(c)

    def rank_bucket(t: pa.Table) -> pa.Table:
        off = offsets[int(t["bucket"][0].as_py())]
        t = t.sort_by(
            [("vt", "ascending"), ("lang", "ascending"), ("doc_id", "ascending")]
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "sched_pos": pa.array(
                    off + np.arange(len(t), dtype=np.int64), type=pa.int64()
                ),
            }
        )

    return bk.groupby("bucket").map_groups(rank_bucket, batch_format="pyarrow")


CURATION_QUERIES["doc_mix_schedule"] = lambda sf_dir: q_doc_mix_schedule(
    sf_dir, hash_mode="md5"
)

CURATION_ORACLES["doc_mix_schedule"] = f"""
WITH d AS (
  SELECT doc_id, lang,
         md5(CAST(doc_id AS VARCHAR) || ':{SHUFFLE_EPOCH}') AS hx
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS rk,
         count(*) OVER (PARTITION BY lang) AS c
  FROM d
)
SELECT doc_id, lang,
       CAST(row_number() OVER (ORDER BY rk / sqrt(c), lang, doc_id) - 1
            AS BIGINT) AS sched_pos
FROM r
"""


def q_doc_curation_funnel(sf_dir: str):
    """(stage_idx, stage, n_docs): the curation FUNNEL report — how many
    documents survive each filter of the q_doc_curate pipeline,
    cumulatively (input → length → +alpha → +repetition → exact-distinct).
    The observability number a 100 TB curation run publishes: which gate
    removes how much.

    One streaming pass computes all four cumulative masks per batch with
    the SAME expressions as q_doc_curate's fused stage (shared
    tokenization, 4 ints per batch shipped); the final distinct stage is
    the curate keep-list count itself, so the funnel can never disagree
    with the op it audits."""
    from .dedup import corpus_ds
    from .text import REP_DISTINCT_RATIO, REP_TOP_FRAC, rep_counts

    part_schema = pa.schema(
        [("n_input", pa.int64()), ("n_len", pa.int64()),
         ("n_alpha", pa.int64()), ("n_rep", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        n, n_distinct, top = rep_counts(t["text"])
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        n_alpha = pc.cast(
            pc.count_substring_regex(t["text"], "[A-Za-z]"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        alpha_ratio = n_alpha.astype(np.float64) / n_chars
        top_frac = top.astype(np.float64) / n
        distinct_ratio = n_distinct.astype(np.float64) / n
        m_len = (n >= CURATE_MIN_TOKENS) & (n <= CURATE_MAX_TOKENS)
        m_alpha = m_len & (alpha_ratio >= CURATE_MIN_ALPHA)
        m_rep = m_alpha & ~(
            (top_frac > REP_TOP_FRAC) | (distinct_ratio < REP_DISTINCT_RATIO)
        )
        return pa.table(
            {
                "n_input": pa.array([len(t)], type=pa.int64()),
                "n_len": pa.array([int(m_len.sum())], type=pa.int64()),
                "n_alpha": pa.array([int(m_alpha.sum())], type=pa.int64()),
                "n_rep": pa.array([int(m_rep.sum())], type=pa.int64()),
            }
        )

    parts = corpus_ds(sf_dir).map_batches(partial, batch_format="pyarrow").to_pandas()
    n_distinct_kept = q_doc_curate(sf_dir).count()
    stages = [
        ("input", int(parts["n_input"].sum())),
        ("length", int(parts["n_len"].sum())),
        ("alpha", int(parts["n_alpha"].sum())),
        ("repetition", int(parts["n_rep"].sum())),
        ("distinct", int(n_distinct_kept)),
    ]
    return pa.table(
        {
            "stage_idx": pa.array(range(len(stages)), type=pa.int64()),
            "stage": pa.array([s for s, _ in stages], type=pa.string()),
            "n_docs": pa.array([n for _, n in stages], type=pa.int64()),
        }
    )


CURATION_QUERIES["doc_curation_funnel"] = q_doc_curation_funnel

CURATION_ORACLES["doc_curation_funnel"] = f"""
WITH {_CORPUS_SQL.split('WITH')[-1] if 'WITH' in _CORPUS_SQL else _CORPUS_SQL.strip()}
, c AS (
  SELECT doc_id, word, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus)
  GROUP BY 1, 2
), rep AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_frac,
         CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dr
  FROM c GROUP BY doc_id
), j AS (
  SELECT d.doc_id, d.text, r.n_tokens, r.top_frac, r.dr,
         CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / length(d.text) AS ar
  FROM corpus d JOIN rep r USING (doc_id)
), f AS (
  SELECT *,
    n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS} AS p_len,
    (n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS})
      AND ar >= {CURATE_MIN_ALPHA} AS p_alpha,
    (n_tokens BETWEEN {CURATE_MIN_TOKENS} AND {CURATE_MAX_TOKENS})
      AND ar >= {CURATE_MIN_ALPHA}
      AND NOT (top_frac > {_RTF} OR dr < {_RDR}) AS p_rep
  FROM j
)
SELECT CAST(0 AS BIGINT) AS stage_idx, 'input' AS stage,
       CAST(count(*) AS BIGINT) AS n_docs FROM f
UNION ALL
SELECT 1, 'length', CAST(count(*) AS BIGINT) FROM f WHERE p_len
UNION ALL
SELECT 2, 'alpha', CAST(count(*) AS BIGINT) FROM f WHERE p_alpha
UNION ALL
SELECT 3, 'repetition', CAST(count(*) AS BIGINT) FROM f WHERE p_rep
UNION ALL
SELECT 4, 'distinct', CAST(count(DISTINCT md5(text)) AS BIGINT)
FROM f WHERE p_rep
"""


# ------------------------------------------------- source overlap matrix
# How much does source A's content overlap source B's?  The dataset-
# composition audit run before mixing crawls/dumps into one training
# corpus (near-identical sources waste epochs and skew dedup budgets).

_OVERLAP_MAX_SOURCES = 63  # source-presence bitmask must fit one int64


def q_doc_source_overlap(sf_dir: str):
    """(source_a, source_b, n_a, n_b, n_common, jaccard): pairwise
    segment-level Jaccard overlap between every pair of corpus sources —
    |distinct segments of A ∩ B| / |A ∪ B| over the same fixed
    SEG_WORDS-word segmentation the CCNet line-dedup family uses.

    Distributed shape: per-batch distinct (seg_hash, source-bit) pairs
    collapse to one int64 PRESENCE BITMASK per segment hash (sources are
    few — ceiling-enforced at 63 so the mask fits int64; beyond that use
    multi-word masks); a seg-hash bucket sweep ORs the masks per hash and
    emits only a (mask → count) HISTOGRAM per bucket, so the final
    reduce and the driver-side pair arithmetic see ≤ buckets × 2^used
    rows — never the segment table.  All pair counts derive from the one
    histogram: n_i = Σ count[mask has bit i], n_common = Σ count[mask
    has both].  Segment identity is the 64-bit polynomial hash (the
    line-dedup convention — collision odds documented there); the SQL
    oracle mirrors with exact segment strings."""
    srcs = sorted(
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["source"])
        .unique("source")
    )
    if len(srcs) > _OVERLAP_MAX_SOURCES:
        raise ValueError(
            f"{len(srcs)} sources exceed the {_OVERLAP_MAX_SOURCES}-bit "
            "presence mask; shard the overlap matrix by source group"
        )
    bit = {s: 1 << i for i, s in enumerate(srcs)}

    part_schema = pa.schema(
        [("seg_hash", pa.int64()), ("mask", pa.int64()), ("bucket", pa.int64())]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        _, nseg, acc = _segment_hashes(t)
        m = np.repeat(
            np.fromiter((bit[s] for s in t["source"].to_pylist()),
                        dtype=np.int64, count=len(t)),
            nseg,
        )
        order = np.argsort(acc, kind="stable")
        h, mm = acc[order], m[order]
        new = np.concatenate(([True], h[1:] != h[:-1]))
        first = np.flatnonzero(new)
        mask = np.bitwise_or.reduceat(mm, first)
        hh = h[first].view(np.int64)
        return pa.table(
            {
                "seg_hash": pa.array(hh, type=pa.int64()),
                "mask": pa.array(mask, type=pa.int64()),
                "bucket": pa.array(hh % 64, type=pa.int64()),
            }
        )

    hist_schema = pa.schema([("mask", pa.int64()), ("cnt", pa.int64())])

    def bucket_hist(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return hist_schema.empty_table()
        h = g["seg_hash"].to_numpy(zero_copy_only=False)
        m = g["mask"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, m = h[order], m[order]
        first = np.flatnonzero(np.concatenate(([True], h[1:] != h[:-1])))
        seg_mask = np.bitwise_or.reduceat(m, first)
        masks, cnts = np.unique(seg_mask, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(masks, type=pa.int64()),
                "cnt": pa.array(cnts, type=pa.int64()),
            }
        )

    hist = (
        _docs(sf_dir, ["text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_hist, batch_format="pyarrow")
        .groupby("mask")
        .sum("cnt")
        .to_pandas()
    )
    masks = hist["mask"].to_numpy()
    cnts = hist["sum(cnt)"].to_numpy()
    rows = {k: [] for k in ("source_a", "source_b", "n_a", "n_b",
                            "n_common", "jaccard")}
    per_src = {
        s: int(cnts[(masks >> i) & 1 == 1].sum()) for i, s in enumerate(srcs)
    }
    for i, sa in enumerate(srcs):
        for jj in range(i + 1, len(srcs)):
            sb = srcs[jj]
            both = int(cnts[((masks >> i) & 1 == 1) & ((masks >> jj) & 1 == 1)].sum())
            union = per_src[sa] + per_src[sb] - both
            rows["source_a"].append(sa)
            rows["source_b"].append(sb)
            rows["n_a"].append(per_src[sa])
            rows["n_b"].append(per_src[sb])
            rows["n_common"].append(both)
            rows["jaccard"].append(both / union if union else 0.0)
    return pa.table(
        {
            "source_a": pa.array(rows["source_a"], type=pa.string()),
            "source_b": pa.array(rows["source_b"], type=pa.string()),
            "n_a": pa.array(rows["n_a"], type=pa.int64()),
            "n_b": pa.array(rows["n_b"], type=pa.int64()),
            "n_common": pa.array(rows["n_common"], type=pa.int64()),
            "jaccard": pa.array(rows["jaccard"], type=pa.float64()),
        }
    )


CURATION_QUERIES["doc_source_overlap"] = q_doc_source_overlap

CURATION_ORACLES["doc_source_overlap"] = f"""
WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
seg AS (
  SELECT DISTINCT source,
         array_to_string(ws[s + 1 : s + {SEG_WORDS}], ' ') AS seg
  FROM w, LATERAL (SELECT unnest(generate_series(0, len(ws) - 1, {SEG_WORDS})) AS s) t
),
c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM seg GROUP BY 1),
p AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS n_common
  FROM seg a JOIN seg b ON a.seg = b.seg AND a.source < b.source
  GROUP BY 1, 2
)
SELECT ca.source AS source_a, cb.source AS source_b,
       ca.n AS n_a, cb.n AS n_b,
       COALESCE(p.n_common, 0) AS n_common,
       CAST(COALESCE(p.n_common, 0) AS DOUBLE)
         / (ca.n + cb.n - COALESCE(p.n_common, 0)) AS jaccard
FROM c ca
JOIN c cb ON ca.source < cb.source
LEFT JOIN p ON p.sa = ca.source AND p.sb = cb.source
"""
