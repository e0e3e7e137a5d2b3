"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

The source ``documents``/``embeddings`` tables contain no duplicates, so
every dedup query runs over a *derived corpus with planted duplicates*,
defined identically in Python and SQL (the oracle reconstructs the corpus
itself):

    corpus = documents
           ∪ {doc_id + 1_000_000, text + ' near duplicate copy marker'}  for doc_id % 10 == 3
           ∪ {doc_id + 2_000_000, text}                                  for doc_id % 10 == 7

Shingles are distinct word 3-grams; jaccard = |A∩B| / |A∪B| computed from
shared-shingle *counts* (exact, no float divergence between engines).

Scale notes (100 TB path, documented per SURVEY.md §4):
- the shingle-explode exact path shuffles (shingle_hash, doc_id) rows; at
  web scale, cap document-frequency per shingle and fall back to
  MinHash-LSH (the ``doc_minhash_lsh`` operator) whose shuffle volume is
  bands × docs, independent of pair counts;
- candidate verification is a repartition join on doc_id
  (``Dataset.join``): candidate pairs are joined to per-doc shingle
  sizes (Jaccard path) or shingle sets (LSH path) — no whole-corpus
  broadcast; per-node footprint is O(candidates / partitions).
"""

from __future__ import annotations

import hashlib
import os
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

NEAR_SUFFIX = " near duplicate copy marker"
JACCARD_THRESHOLD = 0.7

_EMPTY_PAIRS_TABLE = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
).empty_table()

CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' near duplicate copy marker'
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 7
)
"""


def corpus_ds(sf_dir: str) -> rd.Dataset:
    """The planted-duplicates corpus as a Dataset (mirror of CORPUS_SQL)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def plant(t: pa.Table) -> pa.Table:
        mod = t["doc_id"].to_numpy() % 10
        near = t.filter(pa.array(mod == 3))
        near = pa.table(
            {
                "doc_id": pc.add(near["doc_id"], 1_000_000),
                "text": pc.binary_join_element_wise(
                    near["text"], pa.scalar(NEAR_SUFFIX), ""
                ),
            }
        )
        exact = t.filter(pa.array(mod == 7))
        exact = pa.table(
            {"doc_id": pc.add(exact["doc_id"], 2_000_000), "text": exact["text"]}
        )
        return pa.concat_tables([t.select(["doc_id", "text"]), near, exact])

    return ds.map_batches(plant, batch_format="pyarrow")


# ------------------------------------------------------------- exact dedup

def min_id_per_key(
    ds: rd.Dataset, key: str, id_col: str = "doc_id",
    num_buckets: int = 64,
) -> rd.Dataset:
    """min(id) per distinct string key without a corpus-distinct groupby
    (which makes Ray sort millions of single-row groups — see
    ``_pair_group_counts``): hash the key into ``num_buckets`` buckets,
    then one dictionary-encode + lexsort run-reduce per bucket group.
    Keys are compared exactly (string equality within the group); the
    64-bit bucket hash only routes.  Returns Dataset[(doc_id,)]."""
    from .hashing import word_hashes

    empty = pa.schema([("doc_id", pa.int64())]).empty_table()

    def add_bucket(t: pa.Table) -> pa.Table:
        col = t[key]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        b = (word_hashes(col) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                key: col,
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    def reduce(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        col = g[key]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        codes = col.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        c, i = codes[order], ids[order]
        first = np.empty(len(c), dtype=bool)
        first[:1] = True
        first[1:] = c[1:] != c[:-1]
        return pa.table({"doc_id": pa.array(i[first], type=pa.int64())})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce, batch_format="pyarrow")
    )


def q_doc_exact_dedup(sf_dir: str):
    """Exact dedup: content-hash partition → keep min doc_id per group.

    The shuffle key is the md5 of the text (not the text itself), so only
    16-byte keys + ids cross the wire; the per-key min runs as a bucketed
    sweep (``min_id_per_key``), never a corpus-distinct groupby.  Stays a
    Dataset end-to-end — at scale the kept set is corpus-sized, so the
    survivor list must never be collected to the driver."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(h), "doc_id": t["doc_id"]})

    return min_id_per_key(
        corpus_ds(sf_dir).map_batches(add_hash, batch_format="pyarrow"), key="h"
    )


# -------------------------------------------------- shingles + exact jaccard

def _shingles(text: str) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _shingle_hash_segments(text_col, unique: bool = True) -> tuple:
    """Per-row 3-gram hashes, vectorized end-to-end: polars word hashes
    over the flat token buffer → length-3 polynomial windows
    (hashing.gram_hashes — gram strings are never materialized).
    Returns (counts int64[rows], flat uint64 values); row i's hashes are
    ``flat[cum[i]:cum[i+1]]``.  With ``unique=True`` each row's hashes
    are deduped and sorted ascending (one lexsort per batch — the lexsort
    dominates, so callers whose semantics tolerate duplicates — MinHash
    mins, the pair sweep's own (k, doc) dedupe — pass ``unique=False``).
    Replaces the per-doc ``_shingles``+digest Python loop that was the
    last row-wise hot path in the dedup family."""
    from .hashing import gram_hashes, word_hashes

    text = (
        text_col.combine_chunks()
        if isinstance(text_col, pa.ChunkedArray)
        else text_col
    )
    toks = pc.split_pattern(text, " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    rows = len(toks)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    k = np.maximum(n - 2, 0)
    total = int(k.sum())
    if total == 0:
        return np.zeros(rows, dtype=np.int64), np.empty(0, dtype=np.uint64)
    acc = gram_hashes(word_hashes(toks.values), 3)
    row_off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.repeat(row_off[:-1], k) + (
        np.arange(total) - np.repeat(np.cumsum(k) - k, k)
    )
    h = acc[starts]
    if not unique:
        return k, h
    seg = np.repeat(np.arange(rows, dtype=np.int64), k)
    order = np.lexsort((h, seg))
    hs, sg = h[order], seg[order]
    first = np.empty(total, dtype=bool)
    first[:1] = True
    first[1:] = (sg[1:] != sg[:-1]) | (hs[1:] != hs[:-1])
    hs, sg = hs[first], sg[first]
    return np.bincount(sg, minlength=rows).astype(np.int64), hs


def _shingle_rows(t: pa.Table) -> pa.Table:
    """Explode corpus rows to (k=shingle-hash64, doc_id) pairs.  Shingle
    identity travels as its 64-bit hash, not the string — 8 bytes per
    exchange row and a numeric bucket key for the sweep (collision
    chance ~n²/2⁶⁴, same tolerance as the packed verify sets)."""
    # unique=True: the pair sweep would dedupe (k, doc) anyway, but this
    # explode feeds a SHUFFLE — dedupe before the exchange, not after
    # (this corpus repeats in-doc 3-grams heavily; shipping them costs
    # ~20% end-to-end, measured at sf0.1)
    counts, hs = _shingle_hash_segments(t["text"])
    doc = np.repeat(
        pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False), counts
    )
    return pa.table(
        {
            "k": pa.array(hs, type=pa.uint64()),
            "doc_id": pa.array(doc, type=pa.int64()),
        }
    )


N_PAIR_BUCKETS = 64


def _cooccur_pairs(kd: rd.Dataset, num_buckets: int = N_PAIR_BUCKETS) -> rd.Dataset:
    """(k, doc_id) rows → co-occurring (doc_a, doc_b) pairs per distinct
    key, bucket-sweep style: groupby(hash(k)%NB) pays the per-group
    map_groups machinery NB times instead of once per distinct key
    (~1ms/group — the repo's measured stitch lesson), and one vectorized
    sweep handles every key run of the bucket."""

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(
            num_buckets
        )
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), dtype=bool)  # drop duplicate (k, doc) rows
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):  # only multi-doc runs emit pairs
            if e - s > 1:
                ids = d[s:e]  # sorted unique → doc_a < doc_b by construction
                i, j = np.triu_indices(e - s, k=1)
                out_a.append(ids[i])
                out_b.append(ids[j])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
            }
        )

    return (
        kd.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )


def _count_to_cand(t: pa.Table) -> pa.Table:
    """Drop the multiplicity from a ``_pair_group_counts`` result,
    keeping just the distinct (doc_a, doc_b) candidate pairs."""
    if len(t) == 0:
        return pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64())]
        ).empty_table()
    return t.select(["doc_a", "doc_b"])


def _pair_group_counts(
    pairs: rd.Dataset, val: str | None = None, num_buckets: int = N_PAIR_BUCKETS
) -> rd.Dataset:
    """(doc_a, doc_b) rows → one row per distinct pair with its
    multiplicity as ``n_shared`` (and, with ``val``, the per-pair min of
    that column).  A direct ``groupby([doc_a, doc_b])`` makes Ray sort
    millions of single-row groups — measured 24.6s for 2.1M pair rows at
    sf0.1 vs ~2s this way: hash the pair to ``num_buckets`` buckets, then
    ONE vectorized lexsort + run-length count per bucket group (the same
    sweep shape as ``_cooccur_pairs``)."""
    cols = [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("n_shared", pa.int64())]
    if val:
        cols.append((val, pa.int64()))
    empty = pa.schema(cols).empty_table()

    def add_bucket(t: pa.Table) -> pa.Table:
        a = pc.cast(t["doc_a"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(t["doc_b"], pa.int64()).to_numpy(zero_copy_only=False)
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
        )
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def count_group(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return empty
        a = pc.cast(g["doc_a"], pa.int64()).to_numpy(zero_copy_only=False)
        b = pc.cast(g["doc_b"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.empty(len(a), dtype=bool)
        new[:1] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(a)))
        out = {
            "doc_a": pa.array(a[starts], type=pa.int64()),
            "doc_b": pa.array(b[starts], type=pa.int64()),
            "n_shared": pa.array(cnt, type=pa.int64()),
        }
        if val:
            v = pc.cast(g[val], pa.int64()).to_numpy(zero_copy_only=False)[order]
            out[val] = pa.array(np.minimum.reduceat(v, starts), type=pa.int64())
        return pa.table(out)

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_group, batch_format="pyarrow")
    )


JOIN_PARTITIONS = 8

# Target rows per hash-join partition; the partition count scales with the
# larger join side and has NO hard ceiling (a 64-partition cap would pin
# billions of candidate rows at tens of millions of rows per partition).
# Override for memory-constrained workers via GCFLOW_JOIN_ROWS_PER_PART.
JOIN_ROWS_PER_PARTITION = int(os.environ.get("GCFLOW_JOIN_ROWS_PER_PART", 100_000))


def _sizes_ds(corpus) -> rd.Dataset:
    """Per-doc shingle-set size as a Dataset (join side, never collected)."""
    return corpus.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "sz": pa.array(_shingle_hash_segments(t["text"])[0], type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _ensure_schema(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Normalize blocks to ``schema`` — an upstream groupby/map over zero
    rows emits schema-less empty blocks that crash the Acero hash join
    ('No match for key field ...')."""

    def fix(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.map_batches(fix, batch_format="pyarrow")


def _sanitize_shuffle_output(ds: rd.Dataset, target_blocks: int = 8) -> rd.Dataset:
    """Purge the SCHEMA-LESS zero-row blocks that hash-shuffle operators
    (``groupby().map_groups()`` / aggregates) emit for empty partitions.

    Ray 2.49's map_batches never calls its UDF on a zero-column block
    (verified empirically), so :func:`_ensure_schema` alone cannot repair
    them — and an Acero hash-join partition whose inputs are ONLY such
    blocks dies with ``No match or multiple matches for key field
    reference`` once ``num_partitions`` exceeds the populated key
    cardinality of that side (found by the 24× cardinality stress:
    a 43-term vocabulary over 77 join partitions).  ``repartition``
    concatenates blocks, so the schema-less empties vanish into their
    schema-ful neighbours.  Use on the groupby-derived SMALL side of a
    join (vocabulary/group-sized — the concat is cheap there; never call
    this on a corpus-sized side)."""
    return ds.repartition(target_blocks)


def _join_partitions(n_left: int, n_right: int) -> int:
    """Partition count tracking the LARGER join side: one hash-join
    partition per ~JOIN_ROWS_PER_PARTITION rows, uncapped — fixed
    per-partition actor/barrier costs dominate tiny inputs, per-partition
    memory dominates huge ones, so the count must keep scaling with the
    input.  Sizing by the candidate side alone would funnel a corpus-sized
    right side through one aggregator."""
    return max(1, max(n_left, n_right) // JOIN_ROWS_PER_PARTITION + 1)


def _join_attach(
    cand: rd.Dataset, side: rd.Dataset, key: str, out_cols: dict,
    left_fields: dict, num_partitions: int = JOIN_PARTITIONS,
) -> rd.Dataset:
    """Repartition join: attach ``side`` columns to candidate rows on
    ``key`` = side.doc_id, then project to ``out_cols`` (old → new name).
    Hash-partitions both inputs on the key — per-node memory is
    O(rows / num_partitions), no broadcast.  ``left_fields`` declares the
    candidate schema so empty candidate sets survive the join."""
    cand = _ensure_schema(cand, pa.schema(list(left_fields.items())))
    joined = cand.join(
        side, "inner", num_partitions=num_partitions,
        on=(key,), right_on=("doc_id",), right_suffix="_r",
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({new: t[old] for old, new in out_cols.items()})

    return joined.map_batches(project, batch_format="pyarrow")


def q_doc_ngram_jaccard(sf_dir: str):
    """Exact near-dup pairs via shared-shingle counting (no LSH):
    explode → bucket-sweep pair-emit → groupby(pair).count = |A∩B| →
    jaccard from set sizes attached by a repartition join on doc_id
    (two joins, a then b — never a whole-corpus broadcast).
    Pairs with jaccard ≥ 0.7."""
    # the corpus is a small reused intermediate → pin it once instead of
    # re-executing the read+plant pipeline per consumer
    corpus = corpus_ds(sf_dir).materialize()
    sizes = _sizes_ds(corpus)
    shingle_doc = corpus.map_batches(_shingle_rows, batch_format="pyarrow")
    pairs = _cooccur_pairs(shingle_doc)
    # materialize the (corpus-small) candidate set once: Ray's hash join
    # cannot infer a schema from an entirely-empty left side, so a dup-free
    # corpus must short-circuit before the joins
    shared = _pair_group_counts(pairs).materialize()
    n_cand = shared.count()
    if n_cand == 0:
        return _EMPTY_PAIRS_TABLE
    nparts = _join_partitions(n_cand, corpus.count())
    with_a = _join_attach(
        shared, sizes, "doc_a",
        {"doc_a": "doc_a", "doc_b": "doc_b", "n_shared": "n_shared", "sz": "sz_a"},
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "n_shared": pa.int64()},
        num_partitions=nparts,
    )
    with_ab = _join_attach(
        with_a, sizes, "doc_b",
        {"doc_a": "doc_a", "doc_b": "doc_b", "n_shared": "n_shared",
         "sz_a": "sz_a", "sz": "sz_b"},
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "n_shared": pa.int64(),
         "sz_a": pa.int64()},
        num_partitions=nparts,
    )

    def verify(t: pa.Table) -> pa.Table:
        n_shared = t["n_shared"].to_numpy().astype(np.float64)
        sa = t["sz_a"].to_numpy().astype(np.float64)
        sb = t["sz_b"].to_numpy().astype(np.float64)
        # raw jaccard: identical int inputs → bit-identical float64 in
        # both engines; no rounding (tie hazards)
        jac = n_shared / (sa + sb - n_shared)
        out = pa.table(
            {
                "doc_a": pc.cast(t["doc_a"], pa.int64()),
                "doc_b": pc.cast(t["doc_b"], pa.int64()),
                "jaccard": pa.array(jac),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], JACCARD_THRESHOLD))

    return with_ab.map_batches(verify, batch_format="pyarrow")


JACCARD_PAIRS_SQL = (
    "WITH "
    + CORPUS_SQL
    + """
, words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words
),
sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.7
"""
)


# ------------------------------------------------- cross-corpus near-dup join

CROSS_REF_MOD = 7  # reference-set membership: doc_id % CROSS_REF_MOD == 0


def q_doc_cross_dedup(sf_dir: str):
    """Incremental-crawl dedup: match each NEW document against an
    existing REFERENCE corpus and report its best near-duplicate —
    (doc_id, ref_id, jaccard) for every new doc with a ref-side match at
    jaccard ≥ 0.7, keeping only the top match (max jaccard, ties to the
    smallest ref_id).  This is the merge-time question ("which existing
    doc does this new doc duplicate?") that pairwise ``ngram_jaccard``
    doesn't answer: set-restricted candidate generation + an argmax.

    Membership is pure id arithmetic (doc_id % CROSS_REF_MOD == 0 → ref
    side), so no membership table is shipped anywhere.  Candidates come
    from MinHash BAND keys, not raw shingle keys: a shingle-keyed pair
    emit is quadratic in each n-gram's *popularity* (a common 3-gram
    shared by 10⁴ documents alone emits 10⁷⁺ pairs — measured
    timing out on the ×24 replica stress corpus), while band runs only
    group docs whose 4-permutation signature agrees, i.e. true
    near-duplicate families — run length tracks family size, never gram
    frequency.  Within each bucket the ref×new cross products are
    deduped before the exchange.  Candidates are then exact-verified
    against the packed per-doc shingle sets (two repartition joins +
    the segmented sort-merge verify — LSH only gates, jaccard is exact
    and matches the SQL oracle bit-for-bit; recall ≈ 1 at ≥ 0.7 under
    the 32×4 banding, same claim the minhash path's hash-match pins),
    and one doc-bucketed sweep keeps each new doc's best match."""
    empty = pa.schema(
        [("doc_id", pa.int64()), ("ref_id", pa.int64()),
         ("jaccard", pa.float64())]
    ).empty_table()

    corpus = corpus_ds(sf_dir).materialize()
    sets = _shingle_sets_ds(corpus)
    bands = corpus.map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(
            N_PAIR_BUCKETS
        )
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def cross_sweep(g: pa.Table) -> pa.Table:
        # per band-key run: ref ids × new ids only (within-set pairs
        # never materialize); one pair dedupe per bucket before the
        # exchange — bands of the same family repeat the same pairs
        out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        if len(g) == 0:
            return out_schema.empty_table()
        k = g["k"].to_numpy()
        d = g["doc_id"].to_numpy()
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), dtype=bool)  # drop duplicate (k, doc) rows
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        is_ref = d % CROSS_REF_MOD == 0
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out_new, out_ref = [], []
        for s, e in zip(starts, ends):
            ids, r = d[s:e], is_ref[s:e]
            refs, news = ids[r], ids[~r]
            if len(refs) and len(news):
                out_new.append(np.repeat(news, len(refs)))
                out_ref.append(np.tile(refs, len(news)))
        if not out_new:
            return out_schema.empty_table()
        a, b = np.concatenate(out_new), np.concatenate(out_ref)
        po = np.lexsort((b, a))
        a, b = a[po], b[po]
        first = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        # doc_a = new, doc_b = ref for the downstream joins
        return pa.table(
            {"doc_a": pa.array(a[first], type=pa.int64()),
             "doc_b": pa.array(b[first], type=pa.int64())}
        )

    pairs = (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cross_sweep, batch_format="pyarrow")
    )

    # cross-bucket pair dedupe (the count is discarded)
    cand = _pair_group_counts(pairs).map_batches(
        _count_to_cand, batch_format="pyarrow"
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return empty
    nparts = _join_partitions(n_cand, corpus.count())
    with_a = _join_attach(
        cand, sets, "doc_a", {"doc_a": "doc_a", "doc_b": "doc_b", "sh": "sh_a"},
        {"doc_a": pa.int64(), "doc_b": pa.int64()},
        num_partitions=nparts,
    )
    with_ab = _join_attach(
        with_a, sets, "doc_b",
        {"doc_a": "doc_a", "doc_b": "doc_b", "sh_a": "sh_a", "sh": "sh_b"},
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "sh_a": pa.binary()},
        num_partitions=nparts,
    )

    def rekey(t: pa.Table) -> pa.Table:
        d = pc.cast(t["doc_a"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(d, type=pa.int64()),
                "ref_id": pc.cast(t["doc_b"], pa.int64()),
                "jaccard": t["jaccard"],
                "abucket": pa.array(d % N_PAIR_BUCKETS, type=pa.int64()),
            }
        )

    def best_match(g: pa.Table) -> pa.Table:
        # argmax per new doc: (doc, jaccard desc, ref asc) lexsort, first
        # row of each doc run wins — one sweep for the whole bucket
        if len(g) == 0:
            return empty
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        r = g["ref_id"].to_numpy(zero_copy_only=False)
        j = g["jaccard"].to_numpy(zero_copy_only=False)
        order = np.lexsort((r, -j, d))
        d, r, j = d[order], r[order], j[order]
        first = np.r_[True, d[1:] != d[:-1]]
        return pa.table(
            {
                "doc_id": pa.array(d[first], type=pa.int64()),
                "ref_id": pa.array(r[first], type=pa.int64()),
                "jaccard": pa.array(j[first]),
            }
        )

    scored = _ensure_schema(
        with_ab.map_batches(_verify_packed_sets, batch_format="pyarrow")
        .map_batches(rekey, batch_format="pyarrow"),
        pa.schema(
            [("doc_id", pa.int64()), ("ref_id", pa.int64()),
             ("jaccard", pa.float64()), ("abucket", pa.int64())]
        ),
    )
    return scored.groupby("abucket").map_groups(best_match, batch_format="pyarrow")


CROSS_DEDUP_SQL = (
    "WITH "
    + CORPUS_SQL
    + f"""
, words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words
),
sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
pairs AS (
  SELECT n.doc_id AS doc_id, r.doc_id AS ref_id, count(*) AS n_shared
  FROM ex n JOIN ex r ON n.shingle = r.shingle
  WHERE n.doc_id % {CROSS_REF_MOD} <> 0 AND r.doc_id % {CROSS_REF_MOD} = 0
  GROUP BY 1, 2
),
scored AS (
  SELECT pairs.doc_id AS doc_id, pairs.ref_id AS ref_id,
         CAST(n_shared AS DOUBLE) / (sn.sz + sr.sz - n_shared) AS jaccard
  FROM pairs
  JOIN sizes sn ON sn.doc_id = pairs.doc_id
  JOIN sizes sr ON sr.doc_id = pairs.ref_id
  WHERE CAST(n_shared AS DOUBLE) / (sn.sz + sr.sz - n_shared) >= 0.7
)
SELECT doc_id, ref_id, jaccard FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY jaccard DESC, ref_id) = 1
"""
)


# ------------------------------------------------------------- MinHash LSH

N_PERM = 128
N_BANDS = 32          # × 4 rows/band; P(candidate) ≈ 1 at jaccard ≥ 0.8
# multiply-shift universal hashing mod 2^64: odd random multipliers wrap
# thoroughly, decorrelating the per-permutation orderings (a small-multiplier
# "a*x+b mod p" family is order-preserving and breaks minhash agreement)
_rng = np.random.RandomState(42)
_PERM_A = (_rng.randint(0, 1 << 62, size=N_PERM).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_PERM_B = _rng.randint(0, 1 << 62, size=N_PERM).astype(np.uint64)


def _shingle_hash64(sh: str) -> int:
    """Scalar twin of the vectorized shingle/word hashing (hashing.py) —
    reference implementations and tests only."""
    from .hashing import gram_hash_scalar

    return gram_hash_scalar(sh)


def _minhash_signature(shingles: set) -> np.ndarray:
    x = np.fromiter((_shingle_hash64(s) for s in shingles), dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = _PERM_A[:, None] * x[None, :] + _PERM_B[:, None]  # mod 2^64
    return vals.min(axis=1)


class MinHashStage:
    """Actor-pool stage: per-doc shingling + 128-perm MinHash signature,
    exploded to (k=fused band key, doc_id) rows for the bucket sweep.

    Vectorized end-to-end: shingle hashes come from the flat-buffer
    windowed path (``_shingle_hash_segments`` — no per-doc Python, no
    memo needed), the 128 permutations are applied to ALL shingles of a
    doc-chunk in one (128, total) numpy op with per-doc
    ``np.minimum.reduceat`` segment-mins, and band hashes are a
    vectorized uint64 mix over the 4-row band chunks (bucket keys only
    gate candidates — exact verification prunes false positives, so the
    key function is free to be any deterministic mix)."""

    _CHUNK_DOCS = 128          # bounds the (128, total-shingles) temp

    def __init__(self):
        self.a = _PERM_A
        self.b = _PERM_B

    def __call__(self, t: pa.Table) -> pa.Table:
        r = N_PERM // N_BANDS
        # min over a multiset == min over the set → skip the dedupe
        counts, X = _shingle_hash_segments(t["text"], unique=False)
        nz = counts > 0
        kept = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)[nz]
        cnz = counts[nz]
        n = len(kept)
        if n == 0:
            return pa.table(
                {
                    "k": pa.array([], type=pa.uint64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        seg = np.concatenate(([0], np.cumsum(cnz)))
        starts = seg[:-1]
        sigs = np.empty((n, N_PERM), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c0 in range(0, n, self._CHUNK_DOCS):
                c1 = min(c0 + self._CHUNK_DOCS, n)
                lo, hi = seg[c0], seg[c1]
                vals = self.a[:, None] * X[None, lo:hi] + self.b[:, None]
                sigs[c0:c1] = np.minimum.reduceat(vals, starts[c0:c1] - lo, axis=1).T
            S = sigs.reshape(n, N_BANDS, r)
            h = np.zeros((n, N_BANDS), dtype=np.uint64)
            for k in range(r):  # FNV-style fold of the band's rows
                h = (h ^ S[:, :, k]) * np.uint64(0x100000001B3) + np.uint64(
                    0x9E3779B97F4A7C15
                )
            # fuse the band index into the key so equal folds from
            # different bands never bucket together
            h = h + np.arange(N_BANDS, dtype=np.uint64)[None, :] * np.uint64(
                0xBF58476D1CE4E5B9
            )
        return pa.table(
            {
                "k": pa.array(h.reshape(-1), type=pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(np.asarray(kept, dtype=np.int64), N_BANDS),
                    type=pa.int64(),
                ),
            }
        )


def _shingle_sets_ds(corpus) -> rd.Dataset:
    """Per-doc shingle set packed as a binary column of sorted 64-bit
    shingle hashes (Acero joins reject list payload columns; a packed
    scalar column joins fine and set intersections over the 64-bit hashes
    equal string-set intersections up to a ~n²/2⁶⁴ collision chance).
    The join side — never collected to the driver."""

    def pack(t: pa.Table) -> pa.Table:
        # _shingle_hash_segments already yields each row's set sorted
        # ascending in one flat buffer — the binary column is built
        # straight from (byte offsets, values) with no per-row Python
        counts, hs = _shingle_hash_segments(t["text"])
        offsets = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts * 8, out=offsets[1:])
        payload = pa.Array.from_buffers(
            pa.binary(),
            len(counts),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hs.tobytes())],
        )
        return pa.table({"doc_id": t["doc_id"], "sh": payload})

    return corpus.map_batches(pack, batch_format="pyarrow")


def q_doc_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup: shingle → minhash → band buckets (groupby) →
    candidate pairs → exact-jaccard verification via repartition join of
    candidates to per-doc shingle sets on doc_id (two joins, a then b).
    Same output contract (and oracle) as the exact n-gram path — at the
    chosen banding the LSH recall at jaccard ≥ 0.7 is ≈ 1.
    Per-node footprint is O(candidate pairs × set size / partitions),
    never O(corpus)."""
    corpus = corpus_ds(sf_dir).materialize()
    sets = _shingle_sets_ds(corpus)

    bands = corpus.map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )
    pairs = _cooccur_pairs(bands)

    cand = _pair_group_counts(pairs).map_batches(
        _count_to_cand, batch_format="pyarrow"
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:  # see q_doc_ngram_jaccard: empty left crashes join
        return _EMPTY_PAIRS_TABLE
    nparts = _join_partitions(n_cand, corpus.count())
    with_a = _join_attach(
        cand, sets, "doc_a", {"doc_a": "doc_a", "doc_b": "doc_b", "sh": "sh_a"},
        {"doc_a": pa.int64(), "doc_b": pa.int64()},
        num_partitions=nparts,
    )
    with_ab = _join_attach(
        with_a, sets, "doc_b",
        {"doc_a": "doc_a", "doc_b": "doc_b", "sh_a": "sh_a", "sh": "sh_b"},
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "sh_a": pa.binary()},
        num_partitions=nparts,
    )

    return with_ab.map_batches(_verify_packed_sets, batch_format="pyarrow")


def _packed_u64_segments(col) -> tuple:
    """Zero-copy view over a binary column whose rows are packed sorted
    uint64 arrays → (concatenated values, per-row element counts).  Reads
    the offsets + values buffers directly instead of ``to_pylist`` (which
    copies every payload into Python bytes)."""
    arr = col.combine_chunks()
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    raw = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
    return raw.view(np.uint64), ((off[1:] - off[:-1]) // 8).astype(np.int64)


def _verify_packed_sets(t: pa.Table) -> pa.Table:
    """Exact-jaccard verification of candidate pairs, fully vectorized:
    one segmented sort-merge over the batch — tag every set element with
    its pair index, lexsort (pair, value), count adjacent equal values
    within a pair (each side is unique-sorted, so an adjacent duplicate is
    exactly one A∩B hit).  Replaces the per-pair Python loop; identical
    float arithmetic (int intersection / int union) keeps the oracle
    hashes unchanged."""
    n = len(t)
    if n == 0:
        return pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
        ).empty_table()
    va, la = _packed_u64_segments(t["sh_a"])
    vb, lb = _packed_u64_segments(t["sh_b"])
    pids = np.concatenate(
        [np.repeat(np.arange(n, dtype=np.int64), la),
         np.repeat(np.arange(n, dtype=np.int64), lb)]
    )
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, pids))
    v, p = vals[order], pids[order]
    eq = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
    inter = np.bincount(p[:-1][eq], minlength=n)
    with np.errstate(invalid="ignore", divide="ignore"):
        jac = inter / (la + lb - inter)  # empty∪empty → nan → dropped
    keep = jac >= JACCARD_THRESHOLD
    mask = pa.array(keep)
    return pa.table(
        {
            "doc_a": pc.cast(t["doc_a"], pa.int64()).filter(mask),
            "doc_b": pc.cast(t["doc_b"], pa.int64()).filter(mask),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------- SimHash

def _simhash64(words: list) -> int:
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in words:
        h = np.uint64(_shingle_hash64(w))
        bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


class SimHashStage:
    """Actor-pool stage: vectorized 64-bit SimHash over word features —
    word hashes from one flat-buffer polars pass (no per-word Python, no
    memo), per-doc bit accumulation via one ``np.add.reduceat`` over the
    doc-segmented ±1 bit matrix (identical signatures to the scalar
    ``_simhash64``).  Emits (k=fused 16-bit-band key, doc_id, sig) rows
    for the bucket sweep."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from .hashing import word_hashes

        n = len(t)
        if n == 0:
            return pa.table(
                {
                    "k": pa.array([], type=pa.uint64()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "sig": pa.array([], type=pa.uint64()),
                }
            )
        text = t["text"]
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        toks = pc.split_pattern(text, " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        seg = np.concatenate(([0], np.cumsum(lens)))
        W = word_hashes(toks.values)
        shifts = np.arange(64, dtype=np.uint64)
        contrib = (
            2 * ((W[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64) - 1
        )
        acc = np.add.reduceat(contrib, np.asarray(seg[:-1]), axis=0)
        sigbits = (acc > 0).astype(np.uint64)
        sig = np.bitwise_or.reduce(sigbits << shifts[None, :], axis=1)
        band = np.arange(4, dtype=np.uint64)
        band_val = (sig[:, None] >> (band[None, :] * np.uint64(16))) & np.uint64(0xFFFF)
        k = band_val | (band[None, :] << np.uint64(16))
        return pa.table(
            {
                "k": pa.array(k.reshape(-1), type=pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(np.asarray(doc_ids, dtype=np.int64), 4), type=pa.int64()
                ),
                "sig": pa.array(np.repeat(sig, 4), type=pa.uint64()),
            }
        )


def q_doc_simhash(sf_dir: str):
    """SimHash near-dup: 64-bit signature per doc (word features), pairs
    with hamming distance ≤ 3 via bucketed prefix blocking (4 bands of 16
    bits → any pair within distance 3 shares ≥ 1 exact band), swept with
    the same hash(k)%NB bucket groupby as the other pair emitters.
    Values are implementation-defined → no SQL oracle (rows-only driver
    check); planted-duplicate recall is asserted in pytest."""
    bands = corpus_ds(sf_dir).map_batches(
        SimHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy()
        b = ((k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % np.uint64(
            N_PAIR_BUCKETS
        )
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def sweep(g: pa.Table) -> pa.Table:
        k = g["k"].to_numpy()
        d = g["doc_id"].to_numpy()
        sg = g["sig"].to_numpy()
        order = np.lexsort((d, k))
        k, d, sg = k[order], d[order], sg[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s > 1:
                ids, ss = d[s:e], sg[s:e]
                i, j = np.triu_indices(e - s, k=1)
                x = ss[i] ^ ss[j]
                ham = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1)
                m = ham <= 3
                out_a.append(ids[i][m])
                out_b.append(ids[j][m])
                out_h.append(ham[m])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        h = np.concatenate(out_h) if out_h else np.array([], dtype=np.int64)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(h, type=pa.int64()),
            }
        )

    pairs = (
        bands.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
    )
    # stays a Dataset — at scale the near-dup pair set is output-sized
    def rename(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
            ).empty_table()
        return t.select(["doc_a", "doc_b", "hamming"])

    return _pair_group_counts(pairs, val="hamming").map_batches(
        rename, batch_format="pyarrow"
    )


# ------------------------------------------------- embedding cosine near-dup

EMB_DUP_SQL = """
ecorpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.01)
  FROM embeddings WHERE vec_id % 10 = 4
)
"""


def _emb_corpus(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    E = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    mask = ids % 10 == 4
    ids2 = ids[mask] + 1_000_000
    E2 = E[mask] + 0.01
    return np.concatenate([ids, ids2]), np.vstack([E, E2])


# Hard ceiling for the exact O(N²) cosine baseline: it broadcasts the
# full normalized corpus and does block × corpus matmuls, which is the
# EXACTNESS ORACLE only — the production path is q_emb_cosine_dedup_lsh.
COSINE_EXACT_MAX_VECTORS = int(os.environ.get("GCFLOW_COSINE_EXACT_MAX", 100_000))


def q_emb_cosine_dedup(sf_dir: str):
    """Embedding-cosine near-dup, EXACT O(N²) BASELINE — oracle scale
    only.  Broadcasts the whole normalized corpus and matmuls every block
    against it; refuses corpora beyond COSINE_EXACT_MAX_VECTORS so it can
    never silently run at production scale.  The scale path is
    ``q_emb_cosine_dedup_lsh`` (bucketed candidates + join verify); this
    twin exists to oracle-check it and to serve tiny corpora.  Pairs with
    cosine ≥ 0.95 (float64 both sides; the corpus has no natural pairs
    above 0.48 so the threshold is far from any boundary)."""
    ids, E = _emb_corpus(sf_dir)
    if len(ids) > COSINE_EXACT_MAX_VECTORS:
        raise ValueError(
            f"q_emb_cosine_dedup is the exact O(N^2) oracle baseline and "
            f"refuses {len(ids)} > {COSINE_EXACT_MAX_VECTORS} vectors; use "
            f"q_emb_cosine_dedup_lsh (the scale path) instead."
        )
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    N = E / norms
    ref = ray.put((ids, N))

    class Block:
        def __init__(self, r):
            self.ids, self.N = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            rows = t["row"].to_numpy()
            sims = self.N[rows] @ self.N.T  # block × corpus
            out_a, out_b, out_c = [], [], []
            for k, i in enumerate(rows):
                (js,) = np.nonzero(sims[k] >= 0.95)
                for j in js:
                    if self.ids[i] < self.ids[j]:
                        out_a.append(int(self.ids[i]))
                        out_b.append(int(self.ids[j]))
                        out_c.append(round(float(sims[k, j]), 6))
            return pa.table(
                {
                    "vec_a": pa.array(out_a, type=pa.int64()),
                    "vec_b": pa.array(out_b, type=pa.int64()),
                    "cos": pa.array(out_c, type=pa.float64()),
                }
            )

    rows = rd.from_arrow(pa.table({"row": pa.array(range(len(ids)), type=pa.int64())}))
    return rows.map_batches(
        Block, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=256, concurrency=(1, 4),
    )




# ------------------------------ embedding near-dup, LSH-blocked (scale path)

N_EMB_TABLES = 8   # hash tables (OR over tables → recall)
N_EMB_PLANES = 12  # hyperplanes per table (AND within table → precision)
COS_DUP_THRESHOLD = 0.95


def _emb_corpus_packed_ds(sf_dir: str) -> rd.Dataset:
    """Planted-duplicate embedding corpus as a Dataset with the vector
    packed to float64 bytes (mirror of ``_emb_corpus`` / EMB_DUP_SQL;
    binary payload → joinable, see :func:`_shingle_sets_ds`)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def plant(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        E = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        mask = ids % 10 == 4
        all_ids = np.concatenate([ids, ids[mask] + 1_000_000])
        all_e = np.vstack([E, E[mask] + 0.01])
        return pa.table(
            {
                "doc_id": pa.array(all_ids, type=pa.int64()),
                "sh": pa.array([row.tobytes() for row in all_e], type=pa.binary()),
            }
        )

    return ds.map_batches(plant, batch_format="pyarrow")


class EmbSigStage:
    """Actor-pool stage: L×k random-hyperplane signatures per vector,
    exploded to (k=fused table/bucket key, doc_id) rows for the bucket
    sweep.  Planes are derived from a fixed seed on first batch (same on
    every actor — no broadcast needed)."""

    def __init__(self):
        self.planes = None

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        V = np.vstack(
            [np.frombuffer(b, dtype=np.float64) for b in t["sh"].to_pylist()]
        )
        if self.planes is None:
            rng = np.random.RandomState(11)
            self.planes = rng.normal(size=(N_EMB_TABLES, N_EMB_PLANES, V.shape[1]))
        n = len(ids)
        keys = np.empty((n, N_EMB_TABLES), dtype=np.uint64)
        shifts = 1 << np.arange(N_EMB_PLANES, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for l in range(N_EMB_TABLES):
                bits = (V @ self.planes[l].T) > 0
                bucket = (bits * shifts).sum(axis=1).astype(np.uint64)
                keys[:, l] = (
                    bucket * np.uint64(0x9E3779B97F4A7C15)
                    + np.uint64(l) * np.uint64(0xBF58476D1CE4E5B9)
                )
        return pa.table(
            {
                "k": pa.array(keys.reshape(-1), type=pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, N_EMB_TABLES), type=pa.int64()),
            }
        )


def q_emb_cosine_dedup_lsh(sf_dir: str):
    """Embedding near-dup, LSH-blocked — the scale path for
    ``emb_cosine_dedup``: hyperplane bucket blocking (8 tables × 12
    planes; a pair collides in SOME table with probability ≈ 1 at cosine
    ≥ 0.95), bucket-sweep candidate pairs, exact-cosine verification via
    repartition join of candidates to packed vectors on doc_id — no
    O(corpus) broadcast, no block×corpus matmul.  Approximate (recall vs
    the exact path asserted in pytest) → rows-only driver check."""
    corpus = _emb_corpus_packed_ds(sf_dir).materialize()
    sig_rows = corpus.map_batches(EmbSigStage, batch_format="pyarrow", concurrency=(1, 4))
    pairs = _cooccur_pairs(sig_rows)
    cand = _pair_group_counts(pairs).map_batches(
        lambda t: t.select(["doc_a", "doc_b"])
        if len(t)
        else pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]).empty_table(),
        batch_format="pyarrow",
    ).materialize()
    empty = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos", pa.float64())]
    ).empty_table()
    n_cand = cand.count()
    if n_cand == 0:
        return empty
    nparts = _join_partitions(n_cand, corpus.count())
    with_a = _join_attach(
        cand, corpus, "doc_a", {"doc_a": "doc_a", "doc_b": "doc_b", "sh": "sh_a"},
        {"doc_a": pa.int64(), "doc_b": pa.int64()},
        num_partitions=nparts,
    )
    with_ab = _join_attach(
        with_a, corpus, "doc_b",
        {"doc_a": "doc_a", "doc_b": "doc_b", "sh_a": "sh_a", "sh": "sh_b"},
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "sh_a": pa.binary()},
        num_partitions=nparts,
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        A = np.vstack([np.frombuffer(b, dtype=np.float64) for b in t["sh_a"].to_pylist()])
        B = np.vstack([np.frombuffer(b, dtype=np.float64) for b in t["sh_b"].to_pylist()])
        cos = (A * B).sum(axis=1) / (
            np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        )
        keep = cos >= COS_DUP_THRESHOLD
        return pa.table(
            {
                "vec_a": pc.cast(t["doc_a"], pa.int64()).filter(pa.array(keep)),
                "vec_b": pc.cast(t["doc_b"], pa.int64()).filter(pa.array(keep)),
                "cos": pa.array(np.round(cos[keep], 6), type=pa.float64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")


# --------------------------------- embedding near-dup, SemDeDup (k-means)

SEMDEDUP_CELL_TARGET = 4096  # target rows/cell: in-cell cost is O(n_cell²)
SEMDEDUP_K_MIN = 16          # floor keeps tiny test corpora multi-cell
SEMDEDUP_ITERS = 3
SEMDEDUP_TRAIN_MAX = 20_000  # codebook training sample ceiling (driver-side)


def _unpack_packed(col) -> np.ndarray:
    """Packed-float64 binary column → (rows, dim) matrix without a
    per-row frombuffer loop: one contiguous copy of the values buffer,
    reinterpreted (rows all share the fixed dim by construction)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    # BinaryArray keeps its offsets in buffers()[1] (int32), shifted by the
    # array's slice offset
    off = np.frombuffer(a.buffers()[1], dtype=np.int32)[
        a.offset : a.offset + len(a) + 1
    ].astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    seg = data[off[0] : off[-1]]
    if off[0] % 8:  # float64 view needs 8-byte alignment
        seg = seg.copy()
    return seg.view(np.float64).reshape(len(a), -1)


def _semdedup_codebook(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """Codebook from a bounded, deterministic strided corpus sample —
    the IVF ``_train_centroids`` pattern (similarity.py): the stride
    comes from the parquet footer row count so the sample spans the
    whole corpus; only ≤ SEMDEDUP_TRAIN_MAX vectors ever reach the
    driver (O(sample × dim)), and Lloyd runs driver-local on the
    sample — the corpus itself is never materialized for training."""
    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "embeddings.parquet")
    total = pq.read_metadata(src).num_rows
    # ceil division: floor would let the sample reach ~2× the ceiling
    # when n_est sits just under a stride boundary
    n_est = total + total // 10
    stride = max(1, -(-n_est // SEMDEDUP_TRAIN_MAX))

    def take_stride(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % stride == 0))

    samp = (
        _emb_corpus_packed_ds(sf_dir)
        .map_batches(take_stride, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    X = np.vstack([np.frombuffer(b, dtype=np.float64) for b in samp["sh"]])
    # deterministic init: the k smallest sampled doc_ids
    C = X[: min(k, len(X))].copy()
    if len(C) < k:  # degenerate tiny corpus: pad with re-used rows
        C = np.vstack([C, X[np.arange(k - len(C)) % len(X)]])
    for _ in range(iters):
        d = -2.0 * (X @ C.T) + (C * C).sum(axis=1)[None, :]
        a = np.argmin(d, axis=1)
        for j in range(k):
            m = X[a == j]
            if len(m):
                C[j] = m.mean(axis=0)  # empty cells keep their centroid
    return C


def q_emb_semdedup(sf_dir: str, k: int | None = None, iters: int = SEMDEDUP_ITERS):
    """Embedding near-dup via SemDeDup (Abbas et al. 2023): k-means the
    corpus (codebook from a bounded driver-side sample), then find
    cosine ≥ 0.95 pairs ONLY within each cell — one shuffle keyed by
    cell, per-cell pairwise cosine with memory-bounded chunked matmuls.
    Compute drops from O(N²) to O(Σ n_cell²) ≈ O(N²/k); k is derived
    from the corpus row count (parquet footer) to hold n_cell ≈
    SEMDEDUP_CELL_TARGET at any corpus scale, so in-cell cost stays a
    worker-sized constant as the corpus grows.  Approximate (a pair
    straddling a cell boundary is missed — recall vs the exact path
    asserted in pytest; emitted pairs are exact-cosine verified, so
    precision is 1) → rows-only driver check."""
    import pyarrow.parquet as pq

    if k is None:
        total = pq.read_metadata(
            os.path.join(sf_dir, "embeddings.parquet")
        ).num_rows
        n_est = total + total // 10  # the planted dups add ~10%
        k = max(SEMDEDUP_K_MIN, -(-n_est // SEMDEDUP_CELL_TARGET))
    C = _semdedup_codebook(sf_dir, k, iters)
    cref = ray.put(C)
    corpus = _emb_corpus_packed_ds(sf_dir)  # streams: assign is one pass

    def assign(t: pa.Table) -> pa.Table:
        Cl = ray.get(cref)
        V = _unpack_packed(t["sh"])
        d = -2.0 * (V @ Cl.T) + (Cl * Cl).sum(axis=1)[None, :]
        return t.append_column("cell", pa.array(np.argmin(d, axis=1).astype(np.int64)))

    empty = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos", pa.float64())]
    ).empty_table()

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return empty
        ids = pc.cast(g["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        V = _unpack_packed(g["sh"])
        N = V / np.linalg.norm(V, axis=1, keepdims=True)
        out_a, out_b, out_c = [], [], []
        for s in range(0, len(ids), 1024):  # bound the block × cell matmul
            S = N[s : s + 1024] @ N.T
            ii, jj = np.nonzero(S >= COS_DUP_THRESHOLD)
            keep = ids[s + ii] < ids[jj]
            out_a.append(ids[s + ii][keep])
            out_b.append(ids[jj][keep])
            out_c.append(np.round(S[ii[keep], jj[keep]], 6))
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    return (
        corpus.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(sweep, batch_format="pyarrow")
    )


# ------------------------------------------- duplicate clusters (components)

def q_doc_dup_clusters(sf_dir: str):
    """Near-dup pairs → duplicate CLUSTERS via iterative min-label
    propagation, fully distributed (the standard BSP connected-components
    loop): each round joins labels to edges on src (repartition join),
    re-keys the neighbour contributions to dst, unions them with the
    current labels and takes groupby(node).min(label).  Convergence is
    detected by the sum-of-labels aggregate — labels only ever decrease,
    so an unchanged sum is a fixpoint.  No per-round driver collect; the
    per-round driver traffic is one scalar.  Output: (doc_id, component)
    for every document in a pair, component = smallest doc_id reachable
    through jaccard ≥ 0.7 edges.

    Edges come from the MinHash-band path, not the exact shingle-keyed
    pair emit: both verify candidates by exact jaccard and share the
    same oracle (recall ≈ 1 at ≥ 0.7 under the 32×4 banding — the claim
    the minhash op's own hash-match pins every round), but the exact
    path's per-shingle cross products are quadratic in n-gram
    POPULARITY and time out on replica-heavy corpora (measured on the
    ×24 stress, see BASELINE.md), while band runs track near-dup family
    size.  The clustering and its compositions (near_dedup keep-list,
    SoftDeDup weights) inherit the scale-robust source."""
    pairs = q_doc_minhash_lsh(sf_dir)
    if isinstance(pairs, pa.Table):  # dup-free corpus short-circuit
        return pa.schema(
            [("doc_id", pa.int64()), ("component", pa.int64())]
        ).empty_table()

    def to_edges(t: pa.Table) -> pa.Table:
        a = pc.cast(t["doc_a"], pa.int64())
        b = pc.cast(t["doc_b"], pa.int64())
        return pa.table(
            {
                "src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
            }
        )

    edges = _ensure_schema(
        pairs.map_batches(to_edges, batch_format="pyarrow"),
        pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
    ).materialize()
    if edges.count() == 0:
        # Candidate pairs existed but none survived the jaccard verify —
        # edges.join() on a fully-empty left side crashes Ray's hash-join
        # aggregator ("No match for key field reference"), so mirror the
        # n_cand == 0 short-circuits upstream and return the empty result.
        return pa.schema(
            [("doc_id", pa.int64()), ("component", pa.int64())]
        ).empty_table()
    label_schema = pa.schema([("node", pa.int64()), ("label", pa.int64())])
    labels = _ensure_schema(
        edges.groupby("src")
        .count()  # distinct nodes, distributed
        .map_batches(
            lambda t: pa.table({"node": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        ),
        label_schema,
    ).materialize()

    def relabel_min(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return label_schema.empty_table()
        return pa.table({"node": t["node"], "label": t["min(label)"]})

    def to_contrib(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return label_schema.empty_table()
        return pa.table({"node": t["dst"], "label": t["label"]})

    prev_sum = None
    for _ in range(32):  # bound ≥ max component diameter; converges earlier
        contrib = edges.join(
            labels, "inner", num_partitions=JOIN_PARTITIONS,
            on=("src",), right_on=("node",),
        ).map_batches(to_contrib, batch_format="pyarrow")
        labels = _ensure_schema(
            labels.union(contrib)
            .groupby("node")
            .min("label")
            .map_batches(relabel_min, batch_format="pyarrow"),
            label_schema,
        ).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


def q_doc_near_dedup(sf_dir: str):
    """The keep-list a curation pipeline actually consumes: every corpus
    doc EXCEPT non-representative near-dup cluster members (jaccard ≥ 0.7
    closure, keep = the component's min doc_id).  Composition of
    q_doc_dup_clusters with a bucketed ANTI-JOIN: corpus ids (flag 0) and
    dropped ids (flag 1) route to 64 id-hash buckets, one lexsort run per
    group filters ids whose run contains a drop flag — no broadcast of
    the drop set (it scales with the dup fraction of the corpus)."""
    clusters = q_doc_dup_clusters(sf_dir)
    corpus_ids = corpus_ds(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "flag": pa.array(np.zeros(len(t), dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    empty = pa.schema([("doc_id", pa.int64()), ("flag", pa.int64())]).empty_table()

    def to_drop(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        keep = pc.not_equal(t["doc_id"], t["component"])
        ids = pc.cast(t.filter(keep)["doc_id"], pa.int64())
        return pa.table(
            {"doc_id": ids, "flag": pa.array(np.ones(len(ids), dtype=np.int64))}
        )

    if isinstance(clusters, pa.Table):  # dup-free corpus → keep everything
        tagged = corpus_ids
    else:
        tagged = corpus_ids.union(
            clusters.map_batches(to_drop, batch_format="pyarrow")
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = (ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    def anti(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema([("doc_id", pa.int64())]).empty_table()
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        fl = g["flag"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fl, ids))
        i, f = ids[order], fl[order]
        starts = np.flatnonzero(np.r_[True, i[1:] != i[:-1]])
        ends = np.r_[starts[1:], len(i)]
        # keep a corpus id iff its run carries no drop flag
        keep = f[ends - 1] == 0
        return pa.table({"doc_id": pa.array(i[starts[keep]], type=pa.int64())})

    return (
        tagged.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(anti, batch_format="pyarrow")
    )


DEDUP_QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_cross_dedup": q_doc_cross_dedup,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_simhash": q_doc_simhash,
    "emb_cosine_dedup": q_emb_cosine_dedup,
    "emb_cosine_dedup_lsh": q_emb_cosine_dedup_lsh,
    "emb_semdedup": q_emb_semdedup,
    "doc_dup_clusters": q_doc_dup_clusters,
    "doc_near_dedup": q_doc_near_dedup,
}

# recursive transitive-closure CTE over jaccard ≥ 0.7 edges — shared by the
# cluster-labeling oracle and the keep-list oracle
_DUP_WALK_SQL = (
    "WITH RECURSIVE "
    + CORPUS_SQL.strip().lstrip()
    + """
, words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
  FROM words
),
sizes AS (SELECT doc_id, len(s) AS sz FROM sh),
ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jp AS (
  SELECT doc_a, doc_b FROM p
  JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared) >= 0.7
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM jp
  UNION SELECT doc_b, doc_a FROM jp
),
walk(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT w.src, e.b FROM walk w JOIN edges e ON w.dst = e.a
)"""
)

DEDUP_ORACLES = {
    "doc_exact_dedup": "WITH " + CORPUS_SQL + """
SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text ORDER BY 1
""",
    "doc_ngram_jaccard": JACCARD_PAIRS_SQL,
    "doc_cross_dedup": CROSS_DEDUP_SQL,
    "doc_minhash_lsh": JACCARD_PAIRS_SQL,
    "doc_dup_clusters": _DUP_WALK_SQL + """
SELECT src AS doc_id, min(dst) AS component FROM walk GROUP BY 1
""",
    "doc_near_dedup": _DUP_WALK_SQL + """
, comp AS (SELECT src AS doc_id, min(dst) AS component FROM walk GROUP BY 1)
SELECT c.doc_id FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)
""",

    # doc_simhash: implementation-defined signature → rows-only check
    "emb_cosine_dedup": "WITH " + EMB_DUP_SQL + """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM ecorpus a JOIN ecorpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.95
""",
}


# ------------------------------------------------------------- soft dedup

def q_doc_softdedup_weight(sf_dir: str):
    """SoftDeDup: keep every document but DOWN-WEIGHT duplicates —
    (doc_id, weight) with weight = 1/|cluster| for members of a
    jaccard ≥ 0.7 duplicate cluster and 1.0 for unique docs, so each
    duplicate set contributes exactly one document-equivalent of
    training mass (the soft alternative to dropping near-dups, the
    frequency-reweighting family of He et al. 2024 "SoftDedup";
    1.0/int is bit-identical in both engines so the oracle
    value-hashes exactly).

    Composition: dup clusters → ONE component-keyed bucket sweep
    computes each cluster's size and emits every member's 1/n → ONE
    id-keyed bucket sweep attaches the weights to the full corpus
    (the near_dedup union shape: no Acero join, no broadcast — the
    member-weight set scales with the dup fraction, never collected)."""
    clusters = q_doc_dup_clusters(sf_dir)
    out_schema = pa.schema([("doc_id", pa.int64()), ("weight", pa.float64())])

    corpus_rows = corpus_ds(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "weight": pa.array(np.full(len(t), np.nan)),
            }
        ),
        batch_format="pyarrow",
    )
    if isinstance(clusters, pa.Table):  # dup-free corpus → all 1.0
        return corpus_rows.map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "weight": pa.array(np.ones(len(t))),
                }
            ),
            batch_format="pyarrow",
        )

    def add_cbucket(t: pa.Table) -> pa.Table:
        c = t["component"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "cbucket", pa.array(c % N_PAIR_BUCKETS, type=pa.int64())
        )

    def size_sweep(g: pa.Table) -> pa.Table:
        # every member of a component is in this bucket (routing key ==
        # component), so run length == cluster size
        if len(g) == 0:
            return out_schema.empty_table()
        c = g["component"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(c, kind="stable")
        cs, ds_ = c[order], d[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        runlen = np.diff(np.append(starts, len(cs)))
        w = np.repeat(1.0 / runlen, runlen)
        return pa.table(
            {
                "doc_id": pa.array(ds_, type=pa.int64()),
                "weight": pa.array(w, type=pa.float64()),
            }
        )

    member_w = _ensure_schema(
        clusters.map_batches(add_cbucket, batch_format="pyarrow")
        .groupby("cbucket")
        .map_groups(size_sweep, batch_format="pyarrow"),
        out_schema,
    )

    def add_ibucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "ibucket", pa.array(d % 256, type=pa.int64())
        )

    def attach(g: pa.Table) -> pa.Table:
        # per doc run: the member weight if present (≤1 member row per
        # doc), else 1.0 — fmin skips the corpus row's NaN placeholder
        if len(g) == 0:
            return out_schema.empty_table()
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        w = g["weight"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        ds_, ws = d[order], w[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        wmin = np.fmin.reduceat(ws, starts)
        return pa.table(
            {
                "doc_id": pa.array(ds_[starts], type=pa.int64()),
                "weight": pa.array(np.where(np.isnan(wmin), 1.0, wmin)),
            }
        )

    return (
        _ensure_schema(corpus_rows, out_schema)
        .union(member_w)
        .map_batches(add_ibucket, batch_format="pyarrow")
        .groupby("ibucket")
        .map_groups(attach, batch_format="pyarrow")
    )


def q_doc_split_leakage_safe(sf_dir: str, hash_mode: str = "fast"):
    """Leakage-safe train/valid/test split: every corpus document gets a
    split label, and every jaccard ≥ 0.7 near-duplicate CLUSTER lands in
    ONE split atomically — the split key is the cluster REPRESENTATIVE
    (component min doc_id), not the document itself, so eval
    contamination through near-dups straddling the boundary is
    impossible by construction (the train/test leakage mode measured by
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better").  ~90/5/5 by representative content hash: first md5 byte
    < 0xe6 → train (230/256), < 0xf3 → valid (13/256), else test.

    Composition (no join, no broadcast — the near_dedup/softdedup union
    shape): corpus rows default rep=doc_id, cluster members add
    rep=component, ONE doc-id-keyed bucket sweep takes the per-doc min
    (component ≤ doc_id always: labels only ever decrease toward the
    component minimum).  The split hash is dual-mode like the sampling
    family: vectorized seeded hash of the decimal rep by default, md5 in
    the oracle-parity mode the registry selects."""
    clusters = q_doc_dup_clusters(sf_dir)
    rep_schema = pa.schema([("doc_id", pa.int64()), ("rep", pa.int64())])
    out_schema = pa.schema([("doc_id", pa.int64()), ("split", pa.string())])

    corpus_rows = corpus_ds(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "rep": pc.cast(t["doc_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def assign_split(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        rep = t["rep"].to_numpy(zero_copy_only=False)
        dec = np.char.mod("%d", rep)  # decimal strings ≙ CAST(rep AS VARCHAR)
        if hash_mode == "md5":
            byte = np.fromiter(
                (int(hashlib.md5(s.encode()).hexdigest()[:2], 16) for s in dec),
                dtype=np.int64,
                count=len(dec),
            )
        else:
            from .hashing import word_hashes

            byte = (word_hashes(pa.array(dec)) >> np.uint64(56)).astype(np.int64)
        split = np.where(byte < 0xE6, "train", np.where(byte < 0xF3, "valid", "test"))
        return pa.table(
            {"doc_id": t["doc_id"], "split": pa.array(split, type=pa.string())}
        )

    if isinstance(clusters, pa.Table):  # dup-free corpus → rep = own id
        return corpus_rows.map_batches(assign_split, batch_format="pyarrow")

    member_rep = clusters.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "rep": pc.cast(t["component"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    def add_ibucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("ibucket", pa.array(d % 256, type=pa.int64()))

    def rep_min(g: pa.Table) -> pa.Table:
        # per doc run: min(own id, component) = the cluster representative
        if len(g) == 0:
            return rep_schema.empty_table()
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        r = g["rep"].to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        ds_, rs = d[order], r[order]
        starts = np.flatnonzero(np.r_[True, ds_[1:] != ds_[:-1]])
        rmin = np.minimum.reduceat(rs, starts)
        return pa.table(
            {
                "doc_id": pa.array(ds_[starts], type=pa.int64()),
                "rep": pa.array(rmin, type=pa.int64()),
            }
        )

    return (
        _ensure_schema(corpus_rows, rep_schema)
        .union(_ensure_schema(member_rep, rep_schema))
        .map_batches(add_ibucket, batch_format="pyarrow")
        .groupby("ibucket")
        .map_groups(rep_min, batch_format="pyarrow")
        .map_batches(assign_split, batch_format="pyarrow")
    )


DEDUP_QUERIES["doc_softdedup_weight"] = q_doc_softdedup_weight
DEDUP_QUERIES["doc_split_leakage_safe"] = partial(
    q_doc_split_leakage_safe, hash_mode="md5"
)

DEDUP_ORACLES["doc_softdedup_weight"] = _DUP_WALK_SQL + """
, comp AS (SELECT src AS doc_id, min(dst) AS component FROM walk GROUP BY 1),
csize AS (SELECT component, count(*) AS n FROM comp GROUP BY 1),
w AS (SELECT c.doc_id, 1.0 / s.n AS weight
      FROM comp c JOIN csize s USING (component))
SELECT corpus.doc_id, coalesce(w.weight, 1.0) AS weight
FROM corpus LEFT JOIN w USING (doc_id)
"""

DEDUP_ORACLES["doc_split_leakage_safe"] = _DUP_WALK_SQL + """
, comp AS (SELECT src AS doc_id, min(dst) AS component FROM walk GROUP BY 1),
rep AS (SELECT corpus.doc_id, coalesce(comp.component, corpus.doc_id) AS rep
        FROM corpus LEFT JOIN comp USING (doc_id))
SELECT doc_id,
       CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
            WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 2) < 'f3' THEN 'valid'
            ELSE 'test' END AS split
FROM rep
"""


def q_doc_dup_size_hist(sf_dir: str):
    """(cluster_size, n_clusters): the duplicate-family size histogram —
    the dedup-audit number a curation run reports (how much of the corpus
    sits in 2-copies vs 100-copy families decides whether hard dedup or
    SoftDeDup reweighting is the right move).  Thin distributed
    composition over the BSP cluster labels: ONE groupby(component)
    count (rows scale with the dup fraction, never the corpus) and ONE
    ≤distinct-sizes groupby — the histogram itself is the only thing the
    driver sees."""
    clusters = q_doc_dup_clusters(sf_dir)
    sizes = clusters.groupby("component").count()

    def rename(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "count()" not in t.column_names:
            return pa.schema([("cluster_size", pa.int64())]).empty_table()
        return pa.table({"cluster_size": pc.cast(t["count()"], pa.int64())})

    hist = (
        sizes.map_batches(rename, batch_format="pyarrow")
        .groupby("cluster_size")
        .count()
        .to_pandas()  # ≤ distinct family sizes — tiny
        .sort_values("cluster_size")
    )
    return pa.table(
        {
            "cluster_size": pa.array(hist["cluster_size"], type=pa.int64()),
            "n_clusters": pa.array(hist["count()"], type=pa.int64()),
        }
    )


DEDUP_QUERIES["doc_dup_size_hist"] = q_doc_dup_size_hist
DEDUP_ORACLES["doc_dup_size_hist"] = _DUP_WALK_SQL + """
, comp AS (SELECT src AS doc_id, min(dst) AS component FROM walk GROUP BY 1),
 sz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY 1)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY 1
"""
