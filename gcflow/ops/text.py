"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All per-row work is vectorized (pyarrow.compute kernels) except the
cryptographic fingerprint, which is a cheap per-row digest inside
``map_batches`` (stateless tasks).  Each op has an exact DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# stopword list for the language-ID heuristic (mirrored in SQL)
STOPWORDS = ("the", "a", "of", "and", "to")
LANG_THRESHOLD = 0.05


def _docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


SUBTOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _content_u64(texts, hash_mode: str) -> np.ndarray:
    """64-bit content hash per document text — the sampling family's
    shared primitive, dual-mode like the dedup family (ops/hashing.py):

    - ``"fast"`` (default): seeded vectorized polars/ahash — no per-row
      Python, process-stable; the 100-TB path.
    - ``"md5"``: top 64 bits of md5(text) — bitwise reproducible across
      engines (the SQL oracles mirror md5), per-row Python; the
      oracle-parity mode the driver-facing queries select.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if hash_mode == "md5":
        return np.fromiter(
            (
                int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
                for s in texts.to_pylist()
            ),
            dtype=np.uint64,
            count=len(texts),
        )
    from .hashing import word_hashes

    return word_hashes(texts)


def _content_hex(texts, hash_mode: str) -> pa.Array:
    """Hex content fingerprint: the full 32-hex md5 (oracle mode) or the
    16-hex rendering of the fast 64-bit hash (default).  Both sort as
    their numeric value, so smallest-k selections downstream behave the
    same in either mode."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if hash_mode == "md5":
        return pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in texts.to_pylist()],
            type=pa.string(),
        )
    from .hashing import word_hashes

    return pa.array(np.char.mod("%016x", word_hashes(texts)), type=pa.string())


def q_doc_token_count(sf_dir: str):
    """Token counting: whitespace tokens + a BPE-ish regex sub-token count
    (alpha runs / digit runs / single symbols)."""

    def f(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t["text"], " "), 1)
        n_sub = pc.count_substring_regex(t["text"], SUBTOKEN_RE)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pc.cast(n, pa.int64()),
                "n_subtokens": pc.cast(n_sub, pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_doc_sample(sf_dir: str, hash_mode: str = "fast"):
    """Deterministic content-hash sampling (~10%): keep docs whose hash
    top byte is below 0x1a — reproducible across runs, unlike seeded RNG
    sampling (the scale-correct way to sample a distributed corpus
    consistently).  Dual-mode hash (see ``_content_u64``): vectorized by
    default, md5 in the oracle-parity mode (where top-byte < 0x1a is
    exactly ``substr(md5(text),1,2) < '1a'``)."""

    def f(t: pa.Table) -> pa.Table:
        h = _content_u64(t["text"], hash_mode)
        return t.select(["doc_id"]).filter(
            pa.array((h >> np.uint64(56)) < np.uint64(0x1A))
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_doc_quality(sf_dir: str):
    """Quality scoring: char-class counts + alpha ratio (round 6)."""

    def f(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.int64())
        n_space = pc.cast(pc.count_substring(text, " "), pa.int64())
        # no rounding: both engines compute the identical single float64
        # division of identical ints (rounding would add half-even vs
        # half-away tie hazards)
        ratio = pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(n_chars, pa.float64()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": n_chars,
                "n_alpha": n_alpha,
                "n_space": n_space,
                "alpha_ratio": ratio,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_doc_lang_id(sf_dir: str):
    """Language-ID heuristic: stopword-token ratio ≥ threshold → 'en'.

    (The synthetic ``lang`` column is random w.r.t. text, so this is an
    honest heuristic op, not label recovery; the oracle recomputes the
    same deterministic function.)"""
    # \b-delimited regex count == split-token membership count for the
    # clean space-separated corpus (oracle uses list_filter on tokens)
    stop_re = r"\b(?:" + "|".join(STOPWORDS) + r")\b"

    def f(t: pa.Table) -> pa.Table:
        n_stop = pc.count_substring_regex(t["text"], stop_re)
        n_tok = pc.add(pc.count_substring(t["text"], " "), 1)
        ratio = pc.divide(
            pc.cast(n_stop, pa.float64()), pc.cast(n_tok, pa.float64())
        )
        pred = pc.if_else(
            pc.greater_equal(ratio, LANG_THRESHOLD),
            pa.scalar("en"),
            pa.scalar("unk"),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "stop_ratio": ratio,
                "pred_lang": pred,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def q_doc_fingerprint(sf_dir: str, hash_mode: str = "fast"):
    """Content fingerprint per document — dual-mode (see ``_content_hex``):
    16-hex vectorized hash by default, full md5 hex in oracle mode."""

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "fp": _content_hex(t["text"], hash_mode)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


TOP_TERMS_K = 50


def q_doc_top_terms(sf_dir: str):
    """Canonical map-reduce word count: vectorized in-batch term counting
    (split → flatten → value_counts, a per-batch COMBINER) → bucketed
    term-sum sweep with a LOCAL top-k per bucket → tiny global top-k
    sort.  Top 50 terms by total occurrences, ties by term ascending.

    The term reduce groups by a 64-way term-hash bucket, not by term — a
    term-keyed groupby's group count equals the vocabulary size (10^8+
    on web text, the slow millions-of-tiny-groups shape), and since each
    term lives wholly in one bucket, a per-bucket top-k is exact for the
    global top-k: the final sort sees ≤ 64·k rows."""

    def partial(t: pa.Table) -> pa.Table:
        from .hashing import word_hashes

        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        vc = flat.value_counts()
        vc = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
        terms = vc.field("values")
        b = (word_hashes(terms) % np.uint64(64)).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "n_partial": pc.cast(vc.field("counts"), pa.int64()),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema([("term", pa.string()), ("n", pa.int64())]).empty_table()
        terms = g["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(
            codes,
            weights=g["n_partial"].to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        vocab = enc.dictionary
        # local top-k by (n desc, term asc) — exact: terms never split
        # across buckets
        k = min(TOP_TERMS_K, len(n))
        order = pc.sort_indices(
            pa.table({"n": pa.array(n), "term": vocab}),
            sort_keys=[("n", "descending"), ("term", "ascending")],
        )[:k]
        return pa.table(
            {"term": vocab.take(order), "n": pa.array(n).take(order)}
        )

    return (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .sort(["n", "term"], descending=[True, False])
        .limit(TOP_TERMS_K)
    )


STRAT_PER_CLASS = 25


def q_doc_sample_stratified(sf_dir: str, hash_mode: str = "fast"):
    """Deterministic stratified sampling: the STRAT_PER_CLASS docs with
    the smallest content hash per predicted-language class — per-batch
    partial top-k (associative), then a final per-class reduce
    (``groupby(pred_lang).map_groups`` — class cardinality is tiny, so
    per-group machinery is fine here, unlike per-user/per-conv keys).
    Arrow end to end (sort_indices + ranked prefix filter); dual-mode
    content hash (see ``_content_hex``)."""
    import numpy as np

    stop_re = r"\b(?:" + "|".join(STOPWORDS) + r")\b"

    def classify_hash(t: pa.Table) -> pa.Table:
        n_stop = pc.count_substring_regex(t["text"], stop_re)
        n_tok = pc.add(pc.count_substring(t["text"], " "), 1)
        ratio = pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(n_tok, pa.float64()))
        pred = pc.if_else(
            pc.greater_equal(ratio, LANG_THRESHOLD), pa.scalar("en"), pa.scalar("unk")
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "pred_lang": pred,
                "h": _content_hex(t["text"], hash_mode),
            }
        )

    def head_per_class(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("pred_lang", pa.string()),
                 ("h", pa.string())]
            ).empty_table()
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("pred_lang", "ascending"), ("h", "ascending"),
                           ("doc_id", "ascending")],
            )
        )
        lang = t["pred_lang"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], lang[1:] != lang[:-1]))
        starts = np.flatnonzero(first)
        rank = np.arange(len(lang)) - np.repeat(
            starts, np.diff(np.append(starts, len(lang)))
        )
        return t.filter(pa.array(rank < STRAT_PER_CLASS))

    partials = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: head_per_class(classify_hash(t)), batch_format="pyarrow"
    )
    final = partials.groupby("pred_lang").map_groups(
        head_per_class, batch_format="pyarrow"
    )
    return final.map_batches(
        lambda t: t.select(["doc_id", "pred_lang"]), batch_format="pyarrow"
    )


KEYWORD_BUCKETS = 64


def q_doc_top_keyword(sf_dir: str):
    """Per-document keyword extraction: each doc's top term by
    (tf desc, df asc, term asc) — the integer-exact determinization of
    TF-IDF ranking (float ``tf·ln(N/df)`` ranks identically for fixed tf
    and is available by swapping the sort key, but libm ``ln`` is not
    bit-identical across engines, so the oracle-checked variant stays in
    integers).

    Scale shape — the vocabulary is corpus-sized, so nothing here is
    broadcast or collected:

    1. tf: each row IS one whole document, so (doc_id, term, tf) is
       computed exactly in-batch (pa.Table.group_by) — no shuffle.
    2. df: the tf rows are globally unique per (doc, term), so document
       frequency is ``tf.groupby(term).count()`` — one term-keyed
       exchange of pre-deduped rows.
    3. tf ⋈ df on term: hash-partitioned repartition join (dedup.py
       `_join_partitions` sizing) — per-node memory O(rows/partitions).
    4. per-doc argmax: vectorized in-batch partial argmax (one best row
       per (batch, doc)), then ONE bucket-keyed map_groups sweep
       (hash(doc_id) % KEYWORD_BUCKETS — the windows.py pattern, never
       per-doc groups).

    The corpus is read twice (tf and df lineages) rather than
    materializing the token table in the object store — two streaming
    passes beat pinning a tokens-sized intermediate at 100 TB."""
    import numpy as np

    from .dedup import (
        _ensure_schema,
        _join_partitions,
        _sanitize_shuffle_output,
    )

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False), lens
        )
        tbl = pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()), "term": pc.list_flatten(toks)}
        )
        g = tbl.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "term", "tf"])

    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def tf_ds() -> rd.Dataset:
        return _ensure_schema(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                tf_partial, batch_format="pyarrow"
            ),
            tf_schema,
        )

    def df_rename(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema([("term", pa.string()), ("df", pa.int64())]).empty_table()
        return pa.table({"term": t["term"], "df": pc.cast(t["count()"], pa.int64())})

    # sanitize: the groupby may emit schema-less empty blocks that kill
    # the term join when num_partitions > populated-term cardinality
    df_ds = _sanitize_shuffle_output(
        _ensure_schema(
            tf_ds().groupby("term").count().map_batches(
                df_rename, batch_format="pyarrow"
            ),
            pa.schema([("term", pa.string()), ("df", pa.int64())]),
        )
    )

    n_docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()
    # distinct terms per doc is bounded by doc length (~10^2 here); the
    # factor only sizes join partitions, it carries no correctness weight
    nparts = _join_partitions(n_docs * 64, n_docs * 64)
    joined = tf_ds().join(
        df_ds, "inner", num_partitions=nparts, on=("term",),
    )

    def best_per_doc(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("term", pa.string()),
                 ("tf", pa.int64()), ("df", pa.int64())]
            ).empty_table()
        t = t.select(["doc_id", "term", "tf", "df"])
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("doc_id", "ascending"), ("tf", "descending"),
                           ("df", "ascending"), ("term", "ascending")],
            )
        )
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], doc[1:] != doc[:-1]))
        return t.filter(pa.array(first))

    def bucketed(t: pa.Table) -> pa.Table:
        t = best_per_doc(t)  # partial argmax: ≤ one row per (batch, doc)
        b = t["doc_id"].to_numpy(zero_copy_only=False) % KEYWORD_BUCKETS
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    out = (
        joined.map_batches(bucketed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(best_per_doc, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "term", "tf", "df"]),
        batch_format="pyarrow",
    )


def q_doc_unigram_logprob(sf_dir: str):
    """CCNet-style language-model quality score (Wenzek et al. 2020's
    perplexity filter, with the corpus's own unigram LM standing in for
    KenLM): per-doc token-weighted mean negative log-probability under
    p(term) = corpus_count(term) / total_tokens.  High values = unusual
    vocabulary (the filter's signal).

    Distributed shape: (1) per-batch tf partials; (2) global term counts
    via the bucketed term sweep (vocabulary-sized groupby avoided — see
    q_doc_top_terms); (3) ONE term-keyed repartition join of tf to
    counts (the q_doc_top_keyword exchange shape — never a vocabulary
    broadcast); (4) per-doc partial (Σ tf·ln n, Σ tf) combiners reduced
    by a doc-bucket sweep.  The score is ln N − Σ tf·ln n / Σ tf, with
    the SQL oracle mirroring the exact same expression tree."""
    from .dedup import (
        _ensure_schema,
        _join_partitions,
        _sanitize_shuffle_output,
    )
    from .hashing import word_hashes

    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc = np.repeat(
            pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False), lens
        )
        tbl = pa.table(
            {"doc_id": pa.array(doc, type=pa.int64()), "term": pc.list_flatten(toks)}
        )
        g = tbl.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "term", "tf"])

    def tf_ds() -> rd.Dataset:
        return _ensure_schema(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                tf_partial, batch_format="pyarrow"
            ),
            tf_schema,
        )

    # global term counts: bucketed term sweep (see q_doc_top_terms)
    def term_bucket(t: pa.Table) -> pa.Table:
        terms = t["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        b = (word_hashes(terms) % np.uint64(64)).astype(np.int64)
        return pa.table(
            {"term": terms, "tf": t["tf"], "bucket": pa.array(b, type=pa.int64())}
        )

    def term_sum(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema([("term", pa.string()), ("n", pa.int64())]).empty_table()
        terms = g["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(
            codes,
            weights=g["tf"].to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        return pa.table({"term": enc.dictionary, "n": pa.array(n, type=pa.int64())})

    # sanitize: empty bucket groups come out as schema-less blocks that
    # kill the term join when num_partitions > populated-term cardinality
    counts = _sanitize_shuffle_output(
        _ensure_schema(
            tf_ds().map_batches(term_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(term_sum, batch_format="pyarrow"),
            pa.schema([("term", pa.string()), ("n", pa.int64())]),
        )
    )

    def n_tok(t: pa.Table) -> pa.Table:
        n = pc.add(pc.count_substring(t["text"], " "), 1)
        return pa.table({"n": pc.cast(n, pa.int64())})

    total = _docs(sf_dir, ["text"]).map_batches(n_tok, batch_format="pyarrow").sum("n")
    ln_total = float(np.log(np.float64(total)))

    n_docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()
    joined = tf_ds().join(
        counts, "inner",
        num_partitions=_join_partitions(n_docs * 64, n_docs * 64),
        on=("term",),
    )

    partial_schema = pa.schema(
        [("doc_id", pa.int64()), ("w", pa.int64()), ("s", pa.float64()),
         ("bucket", pa.int64())]
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return partial_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(doc, return_inverse=True)
        s = np.bincount(inv, weights=tf * np.log(n))
        w = np.bincount(inv, weights=tf).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "w": pa.array(w, type=pa.int64()),
                "s": pa.array(s, type=pa.float64()),
                "bucket": pa.array(uniq % 64, type=pa.int64()),
            }
        )

    def doc_reduce(g: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("avg_neg_logprob", pa.float64())]
        ).empty_table()
        if len(g) == 0:
            return empty
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        s = np.bincount(inv, weights=g["s"].to_numpy(zero_copy_only=False))
        w = np.bincount(
            inv, weights=g["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_tokens": pa.array(w.astype(np.int64), type=pa.int64()),
                "avg_neg_logprob": pa.array(ln_total - s / w, type=pa.float64()),
            }
        )

    return (
        joined.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(doc_reduce, batch_format="pyarrow")
    )


def q_doc_dsir_weight(sf_dir: str):
    """DSIR-style importance weight (Xie et al. 2023, Data Selection via
    Importance Resampling, with unigram LMs as the hashed-n-gram
    feature stand-in): per doc the mean log importance ratio
    ``(1/n) Σ ln p_target(term) − ln p_source(term)`` where the TARGET
    LM is estimated from the corpus's own 'en'-classified docs (the
    deterministic stop-ratio heuristic, q_doc_lang_id) and the SOURCE
    LM from the whole corpus, both add-one smoothed over the corpus
    vocabulary.  Docs whose vocabulary looks like the target domain get
    high weight — resample ∝ exp(weight) to shift a raw crawl toward
    the domain.

    Distributed shape (one extra flag on the q_doc_unigram_logprob
    plan): per-batch (doc, term, tf, is_target) partials → ONE bucketed
    term sweep producing BOTH LMs' counts (n_s, n_t) per term → one
    term-keyed repartition join → per-doc combiners → doc-bucket
    reduce.  No vocabulary broadcast, no second corpus pass for the
    target LM.  The SQL oracle mirrors the identical expression tree."""
    from .dedup import (
        _ensure_schema,
        _join_partitions,
        _sanitize_shuffle_output,
    )
    from .hashing import word_hashes

    stop_re = r"\b(?:" + "|".join(STOPWORDS) + r")\b"
    tf_schema = pa.schema(
        [("doc_id", pa.int64()), ("term", pa.string()), ("tf", pa.int64()),
         ("is_target", pa.int64())]
    )

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        n_stop = pc.cast(
            pc.count_substring_regex(t["text"], stop_re), pa.float64()
        ).to_numpy(zero_copy_only=False)
        is_tgt = (n_stop / lens >= LANG_THRESHOLD).astype(np.int64)
        doc = np.repeat(
            pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False), lens
        )
        tbl = pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "term": pc.list_flatten(toks),
                "is_target": pa.array(np.repeat(is_tgt, lens), type=pa.int64()),
            }
        )
        g = tbl.group_by(["doc_id", "term", "is_target"]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns(["doc_id", "term", "is_target", "tf"]).select(
            ["doc_id", "term", "tf", "is_target"]
        )

    tf_ds = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            tf_partial, batch_format="pyarrow"
        ),
        tf_schema,
    )

    def term_bucket(t: pa.Table) -> pa.Table:
        terms = t["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        b = (word_hashes(terms) % np.uint64(64)).astype(np.int64)
        return pa.table(
            {
                "term": terms,
                "tf": t["tf"],
                "tf_t": pc.multiply(t["tf"], t["is_target"]),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    def term_sum(g: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("term", pa.string()), ("n_s", pa.int64()), ("n_t", pa.int64())]
        )
        if len(g) == 0:
            return schema.empty_table()
        terms = g["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        mlen = len(enc.dictionary)
        n_s = np.bincount(
            codes, weights=g["tf"].to_numpy(zero_copy_only=False), minlength=mlen
        ).astype(np.int64)
        n_t = np.bincount(
            codes, weights=g["tf_t"].to_numpy(zero_copy_only=False), minlength=mlen
        ).astype(np.int64)
        return pa.table(
            {
                "term": enc.dictionary,
                "n_s": pa.array(n_s, type=pa.int64()),
                "n_t": pa.array(n_t, type=pa.int64()),
            }
        )

    # counts is consumed twice (scalar totals, then the join's small
    # side); unpinned, Ray re-executes the full corpus tokenize sweep per
    # consumer.  Materializing the vocabulary-sized counts caps the op at
    # two streaming corpus passes (counts lineage + the join's tf side) —
    # the same stance as q_doc_top_keyword: never pin a tokens-sized
    # intermediate, do pin vocab-sized ones.
    counts = _sanitize_shuffle_output(
        _ensure_schema(
            tf_ds.map_batches(term_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(term_sum, batch_format="pyarrow"),
            pa.schema(
                [("term", pa.string()), ("n_s", pa.int64()), ("n_t", pa.int64())]
            ),
        )
    ).materialize()

    # scalar totals: T_s, T_t (token totals) and V (corpus vocabulary) —
    # three tiny aggregates over the term-count Dataset
    totals = counts.map_batches(
        lambda t: pa.table(
            {
                "ts": pa.array([pc.sum(t["n_s"]).as_py() or 0], type=pa.int64()),
                "tt": pa.array([pc.sum(t["n_t"]).as_py() or 0], type=pa.int64()),
                "v": pa.array([len(t)], type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    T_s, T_t, V = (
        int(totals["ts"].sum()), int(totals["tt"].sum()), int(totals["v"].sum())
    )
    # constant per-token offset: ln((T_s+V)/(T_t+V)) under add-one smoothing
    offset = float(np.log(np.float64(T_s + V)) - np.log(np.float64(T_t + V)))

    n_docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()
    joined = tf_ds.join(
        counts, "inner",
        num_partitions=_join_partitions(n_docs * 64, n_docs * 64),
        on=("term",),
    )

    partial_schema = pa.schema(
        [("doc_id", pa.int64()), ("w", pa.int64()), ("s", pa.float64()),
         ("bucket", pa.int64())]
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return partial_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_s = t["n_s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_t = t["n_t"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(doc, return_inverse=True)
        s = np.bincount(inv, weights=tf * (np.log(n_t + 1.0) - np.log(n_s + 1.0)))
        w = np.bincount(inv, weights=tf).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "w": pa.array(w, type=pa.int64()),
                "s": pa.array(s, type=pa.float64()),
                "bucket": pa.array(uniq % 64, type=pa.int64()),
            }
        )

    def doc_reduce(g: pa.Table) -> pa.Table:
        empty = pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("dsir_logratio", pa.float64())]
        ).empty_table()
        if len(g) == 0:
            return empty
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        s = np.bincount(inv, weights=g["s"].to_numpy(zero_copy_only=False))
        w = np.bincount(
            inv, weights=g["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_tokens": pa.array(w.astype(np.int64), type=pa.int64()),
                "dsir_logratio": pa.array(s / w + offset, type=pa.float64()),
            }
        )

    return (
        joined.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(doc_reduce, batch_format="pyarrow")
    )


REP_TOP_FRAC = 0.2      # flag: most-frequent token holds > 20% of the doc
REP_DISTINCT_RATIO = 0.5  # flag: fewer than half the tokens are distinct


def rep_counts(text_col) -> tuple:
    """Per-doc (n_tokens, n_distinct, mode-count) int64 arrays, fully
    vectorized: tokens flatten once from zero-copy list buffers, get
    dictionary-encoded, and both reductions come from ONE sort of
    (doc, token-id) composite keys (run starts → distinct counts, run
    lengths → mode mass)."""
    toks = pc.split_pattern(text_col, " ")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    nrows = len(toks)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    enc = toks.values.dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = len(enc.dictionary)
    seg = np.repeat(np.arange(nrows, dtype=np.int64), n)
    sk = np.sort(seg * vocab + idx, kind="stable")
    new = np.empty(len(sk), dtype=bool)
    new[:1] = True
    new[1:] = sk[1:] != sk[:-1]
    starts = np.flatnonzero(new)
    run_len = np.diff(np.append(starts, len(sk)))
    run_seg = sk[starts] // vocab
    n_distinct = np.bincount(run_seg, minlength=nrows).astype(np.int64)
    top = np.zeros(nrows, dtype=np.int64)
    np.maximum.at(top, run_seg, run_len)
    return n, n_distinct, top


def q_doc_bigram_logprob(sf_dir: str):
    """Conditional-LM perplexity filter — the bigram upgrade of
    q_doc_unigram_logprob (one step closer to CCNet's KenLM 5-gram
    perplexity, Wenzek et al. 2020): per-doc mean negative log
    CONDITIONAL probability under the corpus's own Laplace-smoothed
    bigram LM, P(b|a) = (c(ab) + 1) / (c(a·) + V) with c(a·) the
    prefix continuation total and V the distinct unigram vocabulary.
    Low values = phrase-level fluent under corpus statistics; the
    unigram score can't see word ORDER, this can.

    Distributed shape: (1) per-batch bigram tf partials built by a
    vectorized window join over the flat token buffer (no per-row
    Python); (2) ONE prefix-hash-bucketed sweep — routing by the
    bigram's FIRST word co-locates every bigram sharing a prefix, so
    each bigram's corpus count nb AND its prefix's continuation total
    np come out of the same lexicographic pass (no second sweep, no
    separate prefix join); (3) one bigram-keyed repartition join of tf
    to (nb, np) — never a vocabulary broadcast; (4) per-doc partial
    (Σ tf·ln((nb+1)/(np+V)), Σ tf) combiners reduced by a doc-bucket
    sweep.  V is one bucketed distinct-count pass.  Docs with < 2
    tokens have no bigrams and are absent in both engines; the SQL
    oracle mirrors the identical expression tree."""
    from .dedup import (
        _ensure_schema,
        _join_partitions,
        _sanitize_shuffle_output,
    )
    from .hashing import word_hashes

    btf_schema = pa.schema(
        [("doc_id", pa.int64()), ("bigram", pa.string()), ("tf", pa.int64())]
    )

    def btf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).combine_chunks()
        n = len(flat)
        if n < 2:
            return btf_schema.empty_table()
        doc = np.repeat(
            pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False), lens
        )
        # windows (i, i+1) are bigrams iff i is not a doc's last token
        mask = np.ones(n - 1, dtype=bool)
        ends = np.cumsum(lens)
        last = ends[ends < n] - 1
        mask[last[last >= 0]] = False
        sel = pa.array(mask)
        bigram = pc.binary_join_element_wise(
            flat.slice(0, n - 1).filter(sel), flat.slice(1, n - 1).filter(sel), " "
        )
        tbl = pa.table(
            {
                "doc_id": pa.array(doc[: n - 1][mask], type=pa.int64()),
                "bigram": bigram,
            }
        )
        g = tbl.group_by(["doc_id", "bigram"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "bigram", "tf"])

    # materialized once: both the count sweep and the join consume it, and
    # Ray would otherwise re-execute the tokenize+groupby lineage per
    # consumer (the DSIR lesson — see ADVICE r4)
    btf = _ensure_schema(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            btf_partial, batch_format="pyarrow"
        ),
        btf_schema,
    ).materialize()

    def prefix_of(bg: pa.Array) -> pa.Array:
        return pc.list_element(pc.split_pattern(bg, " "), 0)

    def bigram_bucket(t: pa.Table) -> pa.Table:
        bg = t["bigram"]
        bg = bg.combine_chunks() if isinstance(bg, pa.ChunkedArray) else bg
        b = (word_hashes(prefix_of(bg)) % np.uint64(64)).astype(np.int64)
        return pa.table(
            {"bigram": bg, "tf": t["tf"], "bucket": pa.array(b, type=pa.int64())}
        )

    counts_schema = pa.schema(
        [("bigram", pa.string()), ("nb", pa.int64()), ("np", pa.int64())]
    )

    def bigram_sum(g: pa.Table) -> pa.Table:
        # every bigram sharing a prefix is in this bucket (routing key ==
        # prefix hash), so nb per bigram and np per prefix both resolve
        # locally from two dictionary-encode bincounts
        if len(g) == 0:
            return counts_schema.empty_table()
        bg = g["bigram"]
        bg = bg.combine_chunks() if isinstance(bg, pa.ChunkedArray) else bg
        enc = bg.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nb = np.bincount(
            codes,
            weights=g["tf"].to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        penc = prefix_of(enc.dictionary).dictionary_encode()
        pcodes = penc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        np_per_prefix = np.bincount(
            pcodes, weights=nb, minlength=len(penc.dictionary)
        ).astype(np.int64)
        return pa.table(
            {
                "bigram": enc.dictionary,
                "nb": pa.array(nb, type=pa.int64()),
                "np": pa.array(np_per_prefix[pcodes], type=pa.int64()),
            }
        )

    counts = _sanitize_shuffle_output(
        _ensure_schema(
            btf.map_batches(bigram_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bigram_sum, batch_format="pyarrow"),
            counts_schema,
        )
    )

    # V: distinct unigram vocabulary via one bucketed distinct-count pass
    def term_rows(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(t["text"], " ")).combine_chunks()
        b = (word_hashes(flat) % np.uint64(64)).astype(np.int64)
        return pa.table({"term": flat, "bucket": pa.array(b, type=pa.int64())})

    def distinct_count(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema([("v", pa.int64())]).empty_table()
        terms = g["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        return pa.table(
            {"v": pa.array([len(terms.dictionary_encode().dictionary)], pa.int64())}
        )

    vocab = float(
        _docs(sf_dir, ["text"]).map_batches(term_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_count, batch_format="pyarrow")
        .sum("v")
    )

    n_docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()
    joined = btf.join(
        counts, "inner",
        num_partitions=_join_partitions(n_docs * 64, n_docs * 64),
        on=("bigram",),
    )

    partial_schema = pa.schema(
        [("doc_id", pa.int64()), ("w", pa.int64()), ("s", pa.float64()),
         ("bucket", pa.int64())]
    )

    def doc_partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return partial_schema.empty_table()
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        np_ = t["np"].to_numpy(zero_copy_only=False).astype(np.float64)
        uniq, inv = np.unique(doc, return_inverse=True)
        s = np.bincount(inv, weights=tf * np.log((nb + 1.0) / (np_ + vocab)))
        w = np.bincount(inv, weights=tf).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "w": pa.array(w, type=pa.int64()),
                "s": pa.array(s, type=pa.float64()),
                "bucket": pa.array(uniq % 64, type=pa.int64()),
            }
        )

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("avg_neg_logprob", pa.float64())]
    )

    def doc_reduce(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return out_schema.empty_table()
        doc = g["doc_id"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(doc, return_inverse=True)
        s = np.bincount(inv, weights=g["s"].to_numpy(zero_copy_only=False))
        w = np.bincount(
            inv, weights=g["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table(
            {
                "doc_id": pa.array(uniq, type=pa.int64()),
                "n_bigrams": pa.array(w.astype(np.int64), type=pa.int64()),
                "avg_neg_logprob": pa.array(-s / w, type=pa.float64()),
            }
        )

    return (
        joined.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(doc_reduce, batch_format="pyarrow")
    )


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality metrics (the Rae et al. 2021 §A1.1
    repetition-filter family, adapted to token granularity): per-doc
    distinct-token ratio and most-frequent-token mass, with a ``flagged``
    verdict for docs dominated by a repeated token or a tiny vocabulary.

    Fully vectorized and shuffle-free (the metric is per-doc → stateless
    ``map_batches``): tokens are flattened once from the zero-copy list
    buffers, dictionary-encoded per batch, and BOTH metrics reduce over a
    single sort of (doc, token-id) composite keys — run starts give
    per-doc distinct counts, run lengths give the per-doc mode mass.  No
    per-row Python anywhere."""

    def f(t: pa.Table) -> pa.Table:
        n, n_distinct, top = rep_counts(t["text"])
        # identical int→float64 divisions on both engines (no rounding —
        # see q_doc_quality's tie-hazard note)
        top_frac = top.astype(np.float64) / n
        distinct_ratio = n_distinct.astype(np.float64) / n
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n, type=pa.int64()),
                "n_distinct": pa.array(n_distinct, type=pa.int64()),
                "top_token_frac": pa.array(top_frac, type=pa.float64()),
                "distinct_ratio": pa.array(distinct_ratio, type=pa.float64()),
                "flagged": pa.array(
                    (top_frac > REP_TOP_FRAC) | (distinct_ratio < REP_DISTINCT_RATIO)
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


# sensitive-term redaction: both pyarrow and DuckDB compile patterns
# with RE2, so the replacement semantics are bit-identical.  The PII
# shapes (emails, IPv4, phone-ish digit runs) are exercised in pytest —
# the synthetic corpus has no PII, so the oracle-checked demo pattern
# masks a vocabulary term set instead (the same code path).
REDACT_PATTERNS = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",  # email
    r"\b(?:\d{1,3}\.){3}\d{1,3}\b",  # IPv4
    r"\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b",  # phone-ish
)
REDACT_DEMO_PATTERN = r"\b(?:spark|window|batch)\b"
REDACT_MASK = "<mask>"


def redact(
    ds: rd.Dataset, patterns=REDACT_PATTERNS, mask: str = REDACT_MASK,
    text_col: str = "text",
) -> rd.Dataset:
    """Vectorized regex redaction over any text Dataset: each pattern is
    applied with ``pc.replace_substring_regex`` (RE2, compiled once per
    kernel dispatch), plus a per-row count of masked spans.  Stateless
    tasks — no shuffle, no driver traffic."""

    def f(t: pa.Table) -> pa.Table:
        text = t[text_col]
        n = pa.array(np.zeros(len(t), dtype=np.int64))
        for p in patterns:
            n = pc.add(n, pc.cast(pc.count_substring_regex(text, p), pa.int64()))
            text = pc.replace_substring_regex(text, p, mask)
        cols = {c: t[c] for c in t.column_names if c != text_col}
        cols["redacted"] = text
        cols["n_masked"] = n
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def q_doc_redact(sf_dir: str):
    """Demo redaction over the documents table (vocabulary-term pattern;
    the PII patterns run through the identical path in pytest)."""
    return redact(
        _docs(sf_dir, ["doc_id", "text"]), patterns=(REDACT_DEMO_PATTERN,)
    )


def q_doc_sample_temperature(sf_dir: str, hash_mode: str = "fast"):
    """Temperature-based mixture sampling (the mT5 / XLM-R multilingual
    data-balancing family, α = 0.5): each language is downsampled with
    acceptance rate sqrt(c_min / c_lang), so the sampled mixture moves
    from the corpus distribution toward uniform while the rarest
    language keeps every document.

    The per-doc uniform is the top 32 bits of the content hash
    (dual-mode, see ``_content_u64`` — vectorized by default; in the
    md5 oracle mode it equals the first 8 hex chars of md5(text), so
    determinism is integer-exact ACROSS ENGINES); the per-language
    threshold is floor(sqrt(c_min/c_l)·2³²), and sqrt/division are IEEE
    correctly-rounded (unlike pow), so DuckDB and numpy agree bitwise.
    Scale shape: one tiny per-language count pass (partial value_counts
    → groupby-sum; languages are few so the driver collect is bounded),
    then one streaming filter pass with the threshold dict captured in
    the closure — no shuffle of the corpus itself."""
    import math

    part_schema = pa.schema([("lang", pa.string()), ("n", pa.int64())])

    def lang_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        g = t.group_by(["lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "n"]).cast(part_schema)

    counts = (
        _docs(sf_dir, ["lang"])
        .map_batches(lang_counts, batch_format="pyarrow")
        .groupby("lang")
        .sum("n")
        .to_pandas()
    )
    c = dict(zip(counts["lang"], counts["sum(n)"]))
    if not c:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "lang": pa.array([], pa.string())}
        )
    nmin = min(c.values())
    thr = {l: math.floor(math.sqrt(nmin / n) * 2**32) for l, n in c.items()}

    def keep(t: pa.Table) -> pa.Table:
        us = (_content_u64(t["text"], hash_mode) >> np.uint64(32)).astype(np.int64)
        ts = np.fromiter(
            (thr[l] for l in t["lang"].to_pylist()), dtype=np.int64, count=len(t)
        )
        return t.select(["doc_id", "lang"]).filter(pa.array(us < ts))

    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        keep, batch_format="pyarrow"
    )


WEIGHTED_SAMPLE_K = 50


def q_doc_sample_weighted(sf_dir: str, k: int = WEIGHTED_SAMPLE_K,
                          hash_mode: str = "fast"):
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006
    A-ES): each doc draws a deterministic uniform u from its content
    hash and competes with key u^(1/w) — equivalently ln(u)/w — where
    the weight w is the doc's length; the global top-k by key is an
    exact weight-proportional without-replacement sample.  This is the
    standard way to subsample a corpus ∝ quality/length score without
    ever materializing or globally shuffling it.

    Distributed shape: one streaming pass computes ln-keys vectorized
    and keeps only a PER-BATCH top-k (the partial-top-N combiner
    pattern), so the final exact sort+limit runs over ≤ batches·k rows
    — never the corpus.  Determinism is dual-mode like the sampling
    family: u is the top 32 bits of the content hash (md5 oracle mode ≡
    the first 8 hex chars of md5(text), integer-exact across engines);
    ln and division are IEEE correctly-rounded so the ln-keys agree
    bitwise, and doc_id breaks exact ties (duplicate texts share u AND
    w)."""

    def lnkeys(t: pa.Table) -> pa.Table:
        u32 = (_content_u64(t["text"], hash_mode) >> np.uint64(32)).astype(
            np.float64
        )
        u = (u32 + 0.5) / 4294967296.0            # (0,1), never exactly 0
        w = np.maximum(
            t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64), 1.0
        )
        part = pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "weight": pc.cast(t["n_chars"], pa.int64()),
                "lnkey": pa.array(np.log(u) / w, type=pa.float64()),
            }
        )
        # per-batch partial top-k: only candidates that could make the
        # global top-k leave the batch
        return part.sort_by(
            [("lnkey", "descending"), ("doc_id", "ascending")]
        ).slice(0, k)

    return (
        _docs(sf_dir, ["doc_id", "text", "n_chars"])
        .map_batches(lnkeys, batch_format="pyarrow")
        .sort(key=["lnkey", "doc_id"], descending=[True, False])
        .limit(k)
    )


_STOP_SQL = "', '".join(STOPWORDS)

# the sampling/fingerprint registry entries pin hash_mode="md5": the SQL
# oracles mirror md5, so the driver-checked path is the oracle-parity
# mode; library callers get the vectorized fast mode by default
TEXT_QUERIES = {
    "doc_token_count": q_doc_token_count,
    "doc_sample": partial(q_doc_sample, hash_mode="md5"),
    "doc_quality": q_doc_quality,
    "doc_lang_id": q_doc_lang_id,
    "doc_fingerprint": partial(q_doc_fingerprint, hash_mode="md5"),
    "doc_top_terms": q_doc_top_terms,
    "doc_sample_stratified": partial(q_doc_sample_stratified, hash_mode="md5"),
    "doc_top_keyword": q_doc_top_keyword,
    "doc_repetition": q_doc_repetition,
    "doc_unigram_logprob": q_doc_unigram_logprob,
    "doc_bigram_logprob": q_doc_bigram_logprob,
    "doc_redact": q_doc_redact,
    "doc_dsir_weight": q_doc_dsir_weight,
    "doc_sample_temperature": partial(q_doc_sample_temperature, hash_mode="md5"),
    "doc_sample_weighted": partial(q_doc_sample_weighted, hash_mode="md5"),
}

TEXT_ORACLES = {
    "doc_token_count": """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_subtokens
FROM documents
""",
    "doc_sample": """
SELECT doc_id FROM documents WHERE substr(md5(text), 1, 2) < '1a'
""",
    "doc_quality": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
             / length(text) AS alpha_ratio
FROM documents
""",
    "doc_lang_id": f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w IN ('{_STOP_SQL}'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS ratio
  FROM documents
)
SELECT doc_id, ratio AS stop_ratio,
       CASE WHEN ratio >= {LANG_THRESHOLD} THEN 'en' ELSE 'unk' END AS pred_lang
FROM s
""",
    "doc_fingerprint": """
SELECT doc_id, md5(text) AS fp FROM documents
""",
    # both engines are RE2 — identical match/replace semantics
    "doc_redact": f"""
SELECT doc_id,
       regexp_replace(text, '{REDACT_DEMO_PATTERN}', '{REDACT_MASK}', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{REDACT_DEMO_PATTERN}')) AS BIGINT) AS n_masked
FROM documents
""",
    "doc_top_terms": f"""
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
GROUP BY 1 ORDER BY n DESC, term ASC LIMIT {TOP_TERMS_K}
""",
    "doc_sample_stratified": f"""
WITH s AS (
  SELECT doc_id, md5(text) AS h,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                        w -> w IN ('{_STOP_SQL}'))) AS DOUBLE)
                   / len(string_split(text, ' ')) >= {LANG_THRESHOLD}
              THEN 'en' ELSE 'unk' END AS pred_lang
  FROM documents
), r AS (
  SELECT doc_id, pred_lang,
         row_number() OVER (PARTITION BY pred_lang ORDER BY h ASC, doc_id ASC) AS rn
  FROM s
)
SELECT doc_id, pred_lang FROM r WHERE rn <= {STRAT_PER_CLASS}
""",
    "doc_dsir_weight": f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), lang AS (
  SELECT doc_id,
         CASE WHEN CAST(len(list_filter(string_split(text, ' '),
                                        w -> w IN ('{_STOP_SQL}'))) AS DOUBLE)
                   / len(string_split(text, ' ')) >= {LANG_THRESHOLD}
              THEN 1 ELSE 0 END AS is_target
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
), c AS (
  SELECT term, CAST(sum(tf.tf) AS BIGINT) AS n_s,
         CAST(sum(tf.tf * l.is_target) AS BIGINT) AS n_t
  FROM tf JOIN lang l USING (doc_id) GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_s) AS BIGINT) AS t_s, CAST(sum(n_t) AS BIGINT) AS t_t,
         CAST(count(*) AS BIGINT) AS v FROM c
)
SELECT tf.doc_id,
       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       sum(CAST(tf.tf AS DOUBLE)
             * (ln(CAST(c.n_t AS DOUBLE) + 1.0) - ln(CAST(c.n_s AS DOUBLE) + 1.0)))
           / CAST(sum(tf.tf) AS DOUBLE)
         + (SELECT ln(CAST(t_s + v AS DOUBLE)) - ln(CAST(t_t + v AS DOUBLE)) FROM tot)
         AS dsir_logratio
FROM tf JOIN c USING (term)
GROUP BY 1
""",
    "doc_unigram_logprob": """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
), n AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1
), tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf
)
SELECT tf.doc_id,
       CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
       ln(CAST((SELECT total FROM tot) AS DOUBLE))
         - sum(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE)))
             / CAST(sum(tf.tf) AS DOUBLE) AS avg_neg_logprob
FROM tf JOIN n USING (term)
GROUP BY 1
""",
    "doc_bigram_logprob": """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS bigram
  FROM w
), btf AS (
  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS tf FROM bg GROUP BY 1, 2
), bc AS (
  SELECT bigram, CAST(sum(tf) AS BIGINT) AS nb FROM btf GROUP BY 1
), pcnt AS (
  SELECT split_part(bigram, ' ', 1) AS prefix, CAST(sum(nb) AS BIGINT) AS np
  FROM bc GROUP BY 1
), voc AS (
  SELECT CAST(count(DISTINCT term) AS DOUBLE) AS v
  FROM (SELECT unnest(ws) AS term FROM w)
)
SELECT btf.doc_id,
       CAST(sum(btf.tf) AS BIGINT) AS n_bigrams,
       - sum(CAST(btf.tf AS DOUBLE)
             * ln((CAST(bc.nb AS DOUBLE) + 1.0)
                  / (CAST(p.np AS DOUBLE) + (SELECT v FROM voc))))
         / CAST(sum(btf.tf) AS DOUBLE) AS avg_neg_logprob
FROM btf
JOIN bc USING (bigram)
JOIN pcnt p ON p.prefix = split_part(btf.bigram, ' ', 1)
GROUP BY 1
""",
    "doc_repetition": f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), c AS (
  SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top_token_frac,
       CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS distinct_ratio,
       (CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) > {REP_TOP_FRAC}
        OR CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) < {REP_DISTINCT_RATIO})
         AS flagged
FROM c GROUP BY doc_id
""",
    "doc_top_keyword": """
WITH tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY 1, 2
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), r AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df FROM r WHERE rn = 1
""",
}


TEXT_ORACLES["doc_sample_temperature"] = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
m AS (SELECT min(n) AS nmin FROM c),
r AS (SELECT lang,
             CAST(floor(sqrt(CAST(m.nmin AS DOUBLE) / n) * 4294967296) AS BIGINT)
               AS thr
      FROM c, m)
SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
WHERE r.thr >= 4294967296 OR substr(md5(d.text), 1, 8) < printf('%08x', r.thr)
"""

TEXT_ORACLES["doc_sample_weighted"] = f"""
WITH s AS (
  SELECT doc_id,
         CAST(n_chars AS BIGINT) AS weight,
         ln((CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) + 0.5)
            / 4294967296.0)
           / greatest(CAST(n_chars AS DOUBLE), 1.0) AS lnkey
  FROM documents
)
SELECT doc_id, weight, lnkey FROM s
ORDER BY lnkey DESC, doc_id ASC
LIMIT {WEIGHTED_SAMPLE_K}
"""


# ------------------------------------------------------- UniMax sampling
# Chung et al. 2023 ("UniMax: Fairer and More Effective Language
# Sampling for Large-Scale Multilingual Pretraining", §3.2): allocate a
# total corpus budget across languages by WATER-FILLING — process
# languages in ascending capacity order, each taking
# min(capacity, remaining_budget / remaining_languages) — so low-resource
# languages are included whole (up to the epoch cap) and the surplus is
# split evenly among high-resource ones.  Differs from temperature
# sampling (q_doc_sample_temperature) in that quotas are exact counts
# derived from a global optimum, not per-doc acceptance probabilities.

UNIMAX_BUDGET_FRAC = 0.8   # B = floor(0.8 × corpus docs)
UNIMAX_EPOCHS = 1          # cap_l = c_l × EPOCHS (1 = no-repetition pass)
UNIMAX_MAX_LANGS = 100_000  # ceiling on the bounded language-counts collect


def unimax_quotas(counts: dict, budget: float) -> dict:
    """Driver-side water-fill over the (tiny) language-count table.
    Float64 arithmetic is mirrored VERBATIM by the recursive-CTE oracle
    (same visit order, same share division, same floor), so the integer
    quotas agree bitwise with the SQL."""
    import math

    langs = sorted(counts, key=lambda l: (float(counts[l]) * UNIMAX_EPOCHS, l))
    rem = float(budget)
    n = len(langs)
    out = {}
    for idx, l in enumerate(langs):
        q = min(float(counts[l]) * UNIMAX_EPOCHS, rem / (n - idx))
        rem -= q
        out[l] = int(math.floor(q))
    return out


def q_doc_sample_unimax(sf_dir: str, hash_mode: str = "fast"):
    """(doc_id, lang): the UniMax sample — per-language quota_l docs
    with the smallest content hash (deterministic, dual-mode hash like
    the rest of the sampling family).

    Scale shape: one partial-combined counts pass collects ONE row per
    language to the driver (bounded by UNIMAX_MAX_LANGS — language
    inventories are thousands at most); the water-fill runs on that
    data-independent state; selection reuses the stratified-sampling
    per-batch partial top-k + per-language reduce, with the quota dict
    broadcast once via ray.put."""
    import numpy as np

    import ray
    from ray.data.aggregate import Sum

    def pcount(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "np"])

    cdf = (
        _docs(sf_dir, ["lang"])
        .map_batches(pcount, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("np", alias_name="c"))
        .to_pandas()
    )
    if len(cdf) > UNIMAX_MAX_LANGS:
        raise ValueError(
            f"unimax counts collect over ceiling: {len(cdf)} langs "
            f"> {UNIMAX_MAX_LANGS}"
        )
    total = int(cdf["c"].sum())
    import math

    budget = math.floor(UNIMAX_BUDGET_FRAC * total)
    quotas = unimax_quotas(dict(zip(cdf["lang"], cdf["c"])), float(budget))
    q_ref = ray.put(quotas)

    def head_per_lang(t: pa.Table, _q=q_ref) -> pa.Table:
        # keep each language's quota_l smallest-hash rows (per-batch
        # partial: keeping quota_l per batch is a superset of the global
        # answer, so the per-lang reduce sees ≤ quota_l × batches rows)
        empty = pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()),
             ("h", pa.string())]
        ).empty_table()
        if len(t) == 0:
            return empty
        quotas = ray.get(_q)
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("lang", "ascending"), ("h", "ascending"),
                           ("doc_id", "ascending")],
            )
        )
        lang = t["lang"].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], lang[1:] != lang[:-1]))
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, len(lang)))
        rank = np.arange(len(lang)) - np.repeat(starts, runlen)
        qarr = np.repeat(
            np.array([quotas.get(l, 0) for l in lang[starts]], dtype=np.int64),
            runlen,
        )
        return t.filter(pa.array(rank < qarr))

    def hash_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "lang": t["lang"],
                "h": _content_hex(t["text"], hash_mode),
            }
        )

    partials = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        lambda t: head_per_lang(hash_rows(t)), batch_format="pyarrow"
    )
    final = partials.groupby("lang").map_groups(
        head_per_lang, batch_format="pyarrow"
    )
    return final.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


TEXT_QUERIES["doc_sample_unimax"] = partial(q_doc_sample_unimax, hash_mode="md5")

TEXT_ORACLES["doc_sample_unimax"] = f"""
WITH RECURSIVE cnt AS (
  SELECT lang, CAST(count(*) AS DOUBLE) * {UNIMAX_EPOCHS} AS cap
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(floor({UNIMAX_BUDGET_FRAC} * sum(cap) / {UNIMAX_EPOCHS})
              AS DOUBLE) AS b,
         count(*) AS nl
  FROM cnt
),
ranked AS (
  SELECT lang, cap, CAST(row_number() OVER (ORDER BY cap, lang) AS BIGINT) AS i
  FROM cnt
),
alloc AS (
  SELECT CAST(0 AS BIGINT) AS i, (SELECT b FROM tot) AS rem,
         CAST(NULL AS VARCHAR) AS lang, CAST(0 AS DOUBLE) AS quota
  UNION ALL
  SELECT r.i,
         a.rem - LEAST(r.cap, a.rem / ((SELECT nl FROM tot) - a.i)),
         r.lang,
         LEAST(r.cap, a.rem / ((SELECT nl FROM tot) - a.i))
  FROM alloc a JOIN ranked r ON r.i = a.i + 1
),
quota AS (
  SELECT lang, CAST(floor(quota) AS BIGINT) AS q FROM alloc
  WHERE lang IS NOT NULL
),
r2 AS (
  SELECT doc_id, d.lang,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY md5(text), doc_id) AS rn
  FROM documents d
)
SELECT doc_id, lang FROM r2 JOIN quota USING (lang) WHERE rn <= q
"""


# ----------------------------------------------------- character entropy
# Per-document Shannon entropy (log2) of the character distribution —
# the gibberish/boilerplate filter signal (low entropy = repeated
# characters / padding; high entropy = encoded blobs).  One streaming
# pass; the per-batch kernel never touches Python rows: it reads the
# Arrow flat byte buffer, builds (doc, char) keys, and gets per-doc
# counts from ONE np.unique + two reduceat sweeps.  Non-ASCII batches
# fall back to a utf-32 decode of the same flat buffer (codepoint
# semantics, matching DuckDB's string_split(text, '')); empty documents
# would be dropped by the oracle's unnest and are absent from the
# synthetic corpus either way.


def q_doc_char_entropy(sf_dir: str):
    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = len(text)
        arr = text.cast(pa.large_utf8())
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + n + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]]
        byte_lens = np.diff(offs)
        if len(data) and data.max() >= 128:  # non-ASCII: go per-codepoint
            joined = "".join(text.to_pylist())
            data = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
            cp_lens = pc.utf8_length(text).to_numpy().astype(np.int64)
        else:
            cp_lens = byte_lens
        seg = np.repeat(np.arange(n, dtype=np.int64), cp_lens)
        key = (seg << np.int64(21)) | data.astype(np.int64)
        uk, cnts = np.unique(key, return_counts=True)
        segk = uk >> 21
        starts = np.concatenate(([0], np.flatnonzero(np.diff(segk)) + 1))
        sizes = np.diff(np.append(starts, len(cnts)))
        tot = np.add.reduceat(cnts, starts) if len(cnts) else np.empty(0, np.int64)
        p = cnts / np.repeat(tot, sizes)
        ent_seg = (
            np.add.reduceat(-p * np.log2(p), starts) if len(cnts) else np.empty(0)
        )
        ent = np.zeros(n)
        if len(starts):
            ent[segk[starts]] = ent_seg
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(cp_lens, type=pa.int64()),
                "char_entropy": pa.array(ent, type=pa.float64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


TEXT_QUERIES["doc_char_entropy"] = q_doc_char_entropy

TEXT_ORACLES["doc_char_entropy"] = """
WITH ch AS (
  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
), e AS (
  SELECT doc_id, entropy(c) AS char_entropy FROM ch GROUP BY 1
)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars, e.char_entropy
FROM documents d JOIN e USING (doc_id)
"""


# ------------------------------------------------- per-group top-N keep
# Curation staple: keep the N highest-quality documents per language
# (quality = the alpha-ratio signal above).  Classic combiner shape —
# each batch pre-selects its own per-lang top N, so only langs*N rows
# per batch enter the shuffle, and the final per-lang selection runs on
# candidate sets of size <= batches*N.  Ordering is (alpha_ratio DESC,
# doc_id ASC); the ratio is the identical single float64 division in
# both engines, so the cut is bitwise.

TOPQ_PER_LANG = 25


def q_doc_top_quality_per_lang(sf_dir: str, n: int = TOPQ_PER_LANG):
    def score(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_alpha = pc.cast(pc.count_substring_regex(text, "[A-Za-z]"), pa.float64())
        s = pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "alpha_ratio": pc.divide(n_alpha, n_chars),
            }
        )
        return _head_per_lang(s, n)

    def _head_per_lang(t: pa.Table, n_: int) -> pa.Table:
        t = t.sort_by(
            [("lang", "ascending"), ("alpha_ratio", "descending"), ("doc_id", "ascending")]
        )
        m = len(t)
        if m == 0:
            return t
        col = t["lang"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        neq = np.asarray(pc.not_equal(col.slice(1), col.slice(0, m - 1)))
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        pos = np.arange(m) - np.repeat(starts, np.diff(np.append(starts, m)))
        return t.filter(pa.array(pos < n_))

    def final(g: pa.Table, _n=n) -> pa.Table:
        return _head_per_lang(g, _n)

    return (
        _docs(sf_dir, ["doc_id", "text", "lang"])
        .map_batches(score, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pyarrow")
    )


TEXT_QUERIES["doc_top_quality_per_lang"] = q_doc_top_quality_per_lang

TEXT_ORACLES["doc_top_quality_per_lang"] = f"""
WITH s AS (
  SELECT doc_id, lang,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio
  FROM documents
), r AS (
  SELECT doc_id, lang, alpha_ratio,
         row_number() OVER (PARTITION BY lang
                            ORDER BY alpha_ratio DESC, doc_id ASC) AS rn
  FROM s
)
SELECT doc_id, lang, alpha_ratio FROM r WHERE rn <= {TOPQ_PER_LANG}
"""


def q_doc_ccnet_bucket(sf_dir: str):
    """(doc_id, avg_neg_logprob, bucket): CCNet's head/middle/tail corpus
    partition (Wenzek et al. 2020 §4.3) — every document labeled by which
    perplexity TERCILE its LM quality score falls into (head = the
    best-scoring third, the slice CCNet trains on first).

    Distributed shape: the unigram-LM scores come from the
    ``q_doc_unigram_logprob`` plan, MATERIALIZED once so the tercile
    search never re-executes the corpus term sweep; the two cut points
    are exact order statistics located by the shared histogram-refinement
    selection (``ops.quantile._select_ranks`` — no global sort, O(bins)
    shuffle rows per pass); labeling is one streaming pass against the
    two broadcast scalars.  Cut ranks use pure INTEGER arithmetic
    (ceil(n/3) = (n+2)//3), spelled identically in the SQL oracle, so no
    float-q rounding can ever disagree.  The cut search and the label
    comparison run over scores ROUNDED to 9 decimals (both engines; the
    oracle rounds identically): parallel float summation is
    nondeterministic at the last ulp in BOTH engines (DuckDB's own
    aggregate was observed flipping a boundary doc's 16th digit run to
    run), so a doc whose score sits exactly at a tercile cut would
    otherwise flip buckets on ~1e-15 noise; 9 decimals absorbs that
    noise while no two distinct corpus scores sit within 1e-9 of a cut.
    The emitted avg_neg_logprob column stays unrounded."""
    from ray.data.aggregate import Max, Min

    from .quantile import _select_ranks

    scored = q_doc_unigram_logprob(sf_dir).materialize()

    def as_value(t: pa.Table) -> pa.Table:
        v = t["avg_neg_logprob"].to_numpy(zero_copy_only=False)
        return pa.table({"value": pa.array(np.round(v, 9), type=pa.float64())})

    vds = scored.map_batches(as_value, batch_format="pyarrow")
    agg = vds.aggregate(Min("value"), Max("value"))
    lo, hi = agg["min(value)"], agg["max(value)"]
    if hi <= lo:  # degenerate: every doc scores the same → all head
        t1 = t2 = lo
    else:
        cuts, _ = _select_ranks(
            vds,
            lo,
            hi,
            lambda n: {"t1": (n + 2) // 3 - 1, "t2": (2 * n + 2) // 3 - 1},
        )
        t1, t2 = cuts["t1"], cuts["t2"]

    def label(t: pa.Table) -> pa.Table:
        lp = np.round(t["avg_neg_logprob"].to_numpy(zero_copy_only=False), 9)
        b = np.where(lp <= t1, "head", np.where(lp <= t2, "middle", "tail"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "avg_neg_logprob": t["avg_neg_logprob"],
                "bucket": pa.array(b, type=pa.string()),
            }
        )

    return scored.map_batches(label, batch_format="pyarrow")


TEXT_QUERIES["doc_ccnet_bucket"] = q_doc_ccnet_bucket

TEXT_ORACLES["doc_ccnet_bucket"] = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
), n AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1
), tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf
), lp AS (
  SELECT tf.doc_id,
         ln(CAST((SELECT total FROM tot) AS DOUBLE))
           - sum(CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE)))
               / CAST(sum(tf.tf) AS DOUBLE) AS avg_neg_logprob
  FROM tf JOIN n USING (term)
  GROUP BY 1
), ranked AS (
  -- round to 9 decimals before cut-finding and labeling: parallel float
  -- sums are ulp-nondeterministic in both engines (the Ray side rounds
  -- identically), and a doc AT the cut must not flip buckets on noise
  SELECT round(avg_neg_logprob, 9) AS v,
         row_number() OVER (ORDER BY round(avg_neg_logprob, 9)) AS rn
  FROM lp
), ks AS (
  SELECT (count(*) + 2) // 3 AS k1, (2 * count(*) + 2) // 3 AS k2 FROM lp
), cuts AS (
  SELECT max(CASE WHEN rn = k1 THEN v END) AS t1,
         max(CASE WHEN rn = k2 THEN v END) AS t2
  FROM ranked, ks
)
SELECT doc_id, avg_neg_logprob,
       CASE WHEN round(avg_neg_logprob, 9) <= t1 THEN 'head'
            WHEN round(avg_neg_logprob, 9) <= t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM lp, cuts
"""


def q_doc_source_kl(sf_dir: str):
    """(source, n_tokens, kl): per-source distribution-drift monitor —
    KL(P_source ‖ Q_corpus) between each source's unigram term
    distribution and the whole corpus's (the data-mixing dashboard
    number: which feeds diverge from the blend, and by how many nats).
    No smoothing is needed: every source term is by construction in the
    corpus support.

    Distributed shape (the DSIR trick — both distributions from ONE
    sweep): per-batch (source, term, tf) partials → ONE term-bucketed
    sweep where each bucket combines partial rows, derives the GLOBAL
    term count as the within-bucket sum over sources, and emits per
    source the bucket-local Σ c_st·ln(c_st/c_t) and Σ c_st — sources ×
    buckets tiny rows; the driver closes the algebra with
    KL_s = Σ/N_s + ln(N/N_s).  No vocabulary broadcast, no join, no
    second corpus pass.  The SQL oracle spells the identical expression
    tree (ln of the same quotients), so the 6-sig-digit value hash
    matches."""
    from .dedup import _ensure_schema
    from .hashing import word_hashes

    tf_schema = pa.schema(
        [("source", pa.string()), ("term", pa.string()), ("tf", pa.int64())]
    )

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False), lens)
        tbl = pa.table(
            {"source": pa.array(src, type=pa.string()), "term": pc.list_flatten(toks)}
        )
        g = tbl.group_by(["source", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "term", "tf"])

    def add_bucket(t: pa.Table) -> pa.Table:
        terms = t["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        b = (word_hashes(terms) % np.uint64(64)).astype(np.int64)
        return t.append_column("bucket", pa.array(b, type=pa.int64()))

    sweep_schema = pa.schema(
        [("source", pa.string()), ("s", pa.float64()), ("n", pa.int64())]
    )

    def sweep(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return sweep_schema.empty_table()
        terms = g["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        tenc = terms.dictionary_encode()
        tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = g["source"]
        srcs = srcs.combine_chunks() if isinstance(srcs, pa.ChunkedArray) else srcs
        senc = srcs.dictionary_encode()
        scode = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = g["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_t, n_s = len(tenc.dictionary), len(senc.dictionary)
        # combine the per-batch partial rows: c_st, then c_t = Σ_s c_st
        c_st = np.bincount(scode * n_t + tcode, weights=tf, minlength=n_s * n_t)
        c_st = c_st.reshape(n_s, n_t)
        c_t = c_st.sum(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            contrib = np.where(c_st > 0, c_st * np.log(c_st / c_t), 0.0)
        return pa.table(
            {
                "source": senc.dictionary,
                "s": pa.array(contrib.sum(axis=1), type=pa.float64()),
                "n": pa.array(c_st.sum(axis=1).astype(np.int64), type=pa.int64()),
            }
        )

    tf_ds = _ensure_schema(
        _docs(sf_dir, ["source", "text"]).map_batches(
            tf_partial, batch_format="pyarrow"
        ),
        tf_schema,
    )
    parts = (
        tf_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sweep, batch_format="pyarrow")
        .to_pandas()  # sources × 64 tiny rows
    )
    agg = parts.groupby("source", sort=True).agg(s=("s", "sum"), n=("n", "sum"))
    n_total = float(agg["n"].sum())
    kl = agg["s"].to_numpy() / agg["n"].to_numpy() + np.log(
        n_total / agg["n"].to_numpy()
    )
    return pa.table(
        {
            "source": pa.array(agg.index.to_numpy(), type=pa.string()),
            "n_tokens": pa.array(agg["n"].to_numpy(), type=pa.int64()),
            "kl": pa.array(kl, type=pa.float64()),
        }
    )


TEXT_QUERIES["doc_source_kl"] = q_doc_source_kl

TEXT_ORACLES["doc_source_kl"] = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), st AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2
), t AS (
  SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1
), ns AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS nn FROM st
)
SELECT st.source, any_value(ns.n) AS n_tokens,
       sum(CAST(st.c AS DOUBLE)
           * ln(CAST(st.c AS DOUBLE) / CAST(t.ct AS DOUBLE)))
         / CAST(any_value(ns.n) AS DOUBLE)
       + ln(CAST((SELECT nn FROM tot) AS DOUBLE)
            / CAST(any_value(ns.n) AS DOUBLE)) AS kl
FROM st
JOIN t ON st.term = t.term
JOIN ns ON st.source = ns.source
GROUP BY 1
"""


def q_doc_lp_residual(sf_dir: str):
    """(doc_id, lp_residual): length-normalized LM quality — the
    residual of each doc's unigram score against the corpus-wide OLS fit
    ``avg_neg_logprob ~ ln(n_tokens)``.  Raw perplexity penalizes short
    documents (fewer tokens → noisier estimates, systematically shifted);
    regressing the length trend out leaves the signal quality filters
    actually want (a positive residual = unusual vocabulary FOR ITS
    LENGTH).

    Distributed shape: the unigram scores are MATERIALIZED once (the
    DSIR lesson); ONE streaming pass ships 5 floats per batch of
    regression moments (n, Σx, Σy, Σxy, Σx²); the driver closes the
    2-parameter normal equations; one broadcast-(a,b) residual pass.
    The SQL oracle spells the identical slope/intercept/residual
    expressions over the same moments."""
    scored = q_doc_unigram_logprob(sf_dir).materialize()

    mom_schema = pa.schema(
        [("n", pa.int64()), ("sx", pa.float64()), ("sy", pa.float64()),
         ("sxy", pa.float64()), ("sxx", pa.float64())]
    )

    def moments(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return mom_schema.empty_table()
        x = np.log(t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64))
        y = t["avg_neg_logprob"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(x)], type=pa.int64()),
                "sx": pa.array([float(x.sum())], type=pa.float64()),
                "sy": pa.array([float(y.sum())], type=pa.float64()),
                "sxy": pa.array([float((x * y).sum())], type=pa.float64()),
                "sxx": pa.array([float((x * x).sum())], type=pa.float64()),
            }
        )

    mp = scored.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = float(mp["n"].sum())
    sx, sy = float(mp["sx"].sum()), float(mp["sy"].sum())
    sxy, sxx = float(mp["sxy"].sum()), float(mp["sxx"].sum())
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n

    def resid(t: pa.Table) -> pa.Table:
        x = np.log(t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64))
        y = t["avg_neg_logprob"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lp_residual": pa.array(y - (a + b * x), type=pa.float64()),
            }
        )

    return scored.map_batches(resid, batch_format="pyarrow")


TEXT_QUERIES["doc_lp_residual"] = q_doc_lp_residual

TEXT_ORACLES["doc_lp_residual"] = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2
), nn AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1
), tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf
), lp AS (
  SELECT tf.doc_id,
         ln(CAST(sum(tf.tf) AS DOUBLE)) AS x,
         ln(CAST((SELECT total FROM tot) AS DOUBLE))
           - sum(CAST(tf.tf AS DOUBLE) * ln(CAST(nn.n AS DOUBLE)))
               / CAST(sum(tf.tf) AS DOUBLE) AS y
  FROM tf JOIN nn USING (term)
  GROUP BY 1
), m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM lp
), f AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b, n, sx, sy FROM m
), ab AS (
  SELECT b, (sy - b * sx) / n AS a FROM f
)
SELECT doc_id, y - (a + b * x) AS lp_residual FROM lp, ab
"""
