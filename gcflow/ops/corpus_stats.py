"""Corpus-statistics operators: a one-pass numeric dataset profiler and
the distributed adjacent-pair (bigram) count — the counting step of a
BPE-style tokenizer-training loop.

Both are exact, SQL-oracle-checked, and built on the repo's mergeable-
partial + bucketed-sweep idioms:

- The profiler emits ONE tiny partial row per (batch, column) —
  (n, n_null, min, max, sum) — and merges with a groupby over the
  column name (a constant-cardinality key), so driver traffic is
  #columns rows regardless of corpus size.
- The bigram count mirrors ``text.q_doc_top_terms``: vectorized
  in-batch pair construction + value_counts COMBINER, then a 64-way
  pair-hash bucketed sum with a LOCAL exact top-k per bucket (a pair
  lives wholly in one bucket), then a tiny global top-k.  A pair-keyed
  groupby would create |vocab|² tiny groups — the classic BPE-merge
  shuffle trap at web scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

PROFILE_COLUMNS = ("event_id", "user_id", "value")
BIGRAM_K = 20
_BUCKETS = 64


def q_evt_profile(sf_dir: str, columns=PROFILE_COLUMNS):
    """One-pass numeric profile of the events table: per column
    (n, n_null, vmin, vmax, vsum, vmean), everything as float64 so all
    columns share one schema row shape."""

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in columns:
            arr = pc.cast(t[c], pa.float64())
            names.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            mm = pc.min_max(arr).as_py()
            mins.append(mm["min"])
            maxs.append(mm["max"])
            sums.append(pc.sum(arr).as_py())
        return pa.table(
            {
                "col": pa.array(names, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "n_null": pa.array(nulls, type=pa.int64()),
                "vmin": pa.array(mins, type=pa.float64()),
                "vmax": pa.array(maxs, type=pa.float64()),
                "vsum": pa.array(sums, type=pa.float64()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        n_null = int(pc.sum(g["n_null"]).as_py())
        vmin = pc.min(g["vmin"]).as_py()
        vmax = pc.max(g["vmax"]).as_py()
        vsum = pc.sum(g["vsum"]).as_py()
        n_valid = n - n_null
        return pa.table(
            {
                "col": g["col"][:1],
                "n": pa.array([n], type=pa.int64()),
                "n_null": pa.array([n_null], type=pa.int64()),
                "vmin": pa.array([vmin], type=pa.float64()),
                "vmax": pa.array([vmax], type=pa.float64()),
                "vsum": pa.array([vsum], type=pa.float64()),
                "vmean": pa.array(
                    [vsum / n_valid if n_valid else None], type=pa.float64()
                ),
            }
        )

    return (
        rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=list(columns))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("col")
        .map_groups(merge, batch_format="pyarrow")
    )


def _oracle_profile(columns=PROFILE_COLUMNS) -> str:
    parts = [
        f"""SELECT '{c}' AS col, count(*) AS n,
              count(*) - count({c}) AS n_null,
              min(CAST({c} AS DOUBLE)) AS vmin,
              max(CAST({c} AS DOUBLE)) AS vmax,
              sum(CAST({c} AS DOUBLE)) AS vsum,
              sum(CAST({c} AS DOUBLE)) / count({c}) AS vmean
           FROM events"""
        for c in columns
    ]
    return " UNION ALL ".join(parts)


def q_doc_bigrams(sf_dir: str, k: int = BIGRAM_K):
    """Top-k adjacent token pairs corpus-wide (ties by pair ascending) —
    one merge-candidate scoring step of BPE training, run distributed."""

    def partial(t: pa.Table) -> pa.Table:
        from .hashing import word_hashes

        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]  # normalize sliced-view offsets to the flat view
        # adjacent positions (i, i+1) that stay inside one document:
        # drop each document's last token index
        n_flat = len(flat)
        keep = np.ones(max(n_flat - 1, 0), dtype=bool)
        last = offs[1:] - 1  # last token index per doc
        last = last[(last >= 0) & (last < len(keep))]
        keep[last] = False
        idx = np.nonzero(keep)[0]
        w1 = flat.take(pa.array(idx))
        w2 = flat.take(pa.array(idx + 1))
        pair = pc.binary_join_element_wise(w1, w2, " ")
        vc = pair.value_counts()
        vc = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
        pairs = vc.field("values")
        b = (word_hashes(pairs) % np.uint64(_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "pair": pairs,
                "n_partial": pc.cast(vc.field("counts"), pa.int64()),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    def bucket_topk(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema([("pair", pa.string()), ("n", pa.int64())]).empty_table()
        pairs = g["pair"]
        pairs = pairs.combine_chunks() if isinstance(pairs, pa.ChunkedArray) else pairs
        enc = pairs.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(
            codes,
            weights=g["n_partial"].to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        kk = min(k, len(n))
        order = pc.sort_indices(
            pa.table({"n": pa.array(n), "pair": enc.dictionary}),
            sort_keys=[("n", "descending"), ("pair", "ascending")],
        )[:kk]
        return pa.table(
            {"pair": enc.dictionary.take(order), "n": pa.array(n).take(order)}
        )

    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pyarrow")
        .sort(["n", "pair"], descending=[True, False])
        .limit(k)
    )


_ORACLE_BIGRAMS = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS l FROM documents
), zipped AS (
  SELECT unnest(list_zip(l, l[2:])) AS p FROM toks
), pairs AS (
  SELECT p[1] || ' ' || p[2] AS pair FROM zipped WHERE p[2] IS NOT NULL
)
SELECT pair, count(*) AS n FROM pairs
GROUP BY pair ORDER BY n DESC, pair ASC LIMIT {BIGRAM_K}
"""


CORPUS_STATS_QUERIES = {
    "evt_profile": q_evt_profile,
    "doc_bigrams": q_doc_bigrams,
}

CORPUS_STATS_ORACLES = {
    "evt_profile": _oracle_profile(),
    "doc_bigrams": _ORACLE_BIGRAMS,
}


def q_evt_props_extract(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` field out of the
    JSON-ish ``props`` string column with one vectorized RE2
    ``extract_regex`` pass, then aggregate per event type — the
    schema-on-read shape (attribute columns materialized from a payload
    blob at query time, never stored wide).  Both engines run the same
    RE2 pattern, so extraction semantics are identical."""

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t["event_type"], "k": k})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([("k", "sum"), ("k", "count")])
        return g.rename_columns(["event_type", "k_sum", "n"])

    return (
        rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
        )
        .map_batches(extract, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["k_sum", "n"])
        .rename_columns({"sum(k_sum)": "k_sum", "sum(n)": "n"})
    )


_ORACLE_PROPS = """
SELECT event_type,
       CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(count(regexp_extract(props, '"k": (\\d+)', 1)) AS BIGINT) AS n
FROM events
GROUP BY 1
"""

CORPUS_STATS_QUERIES["evt_props_extract"] = q_evt_props_extract
CORPUS_STATS_ORACLES["evt_props_extract"] = _ORACLE_PROPS


def q_doc_data_card(sf_dir: str):
    """(metric_idx, metric, value): the dataset CARD — the one-glance
    summary a corpus release ships (docs, token volume, length range,
    language/source coverage).  ONE streaming pass emits a few scalars
    per batch (counts, token sum/min/max, in-batch distinct lang/source
    lists); the driver folds partials and unions the tiny label sets —
    nothing corpus-sized moves."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )

    part_schema = pa.schema(
        [("n", pa.int64()), ("toks", pa.int64()), ("tmin", pa.int64()),
         ("tmax", pa.int64()), ("langs", pa.list_(pa.string())),
         ("sources", pa.list_(pa.string()))]
    )

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return part_schema.empty_table()
        ntok = pc.cast(
            pc.add(pc.count_substring(t["text"], " "), 1), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(t)], type=pa.int64()),
                "toks": pa.array([int(ntok.sum())], type=pa.int64()),
                "tmin": pa.array([int(ntok.min())], type=pa.int64()),
                "tmax": pa.array([int(ntok.max())], type=pa.int64()),
                "langs": pa.array(
                    [pc.unique(t["lang"]).to_pylist()], type=pa.list_(pa.string())
                ),
                "sources": pa.array(
                    [pc.unique(t["source"]).to_pylist()],
                    type=pa.list_(pa.string()),
                ),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    toks = int(p["toks"].sum())
    langs = set().union(*p["langs"]) if len(p) else set()
    sources = set().union(*p["sources"]) if len(p) else set()
    metrics = [
        ("n_docs", float(n)),
        ("total_tokens", float(toks)),
        ("mean_tokens", float(toks) / float(n) if n else float("nan")),
        ("min_tokens", float(p["tmin"].min()) if n else float("nan")),
        ("max_tokens", float(p["tmax"].max()) if n else float("nan")),
        ("n_langs", float(len(langs))),
        ("n_sources", float(len(sources))),
    ]
    return pa.table(
        {
            "metric_idx": pa.array(range(len(metrics)), type=pa.int64()),
            "metric": pa.array([m for m, _ in metrics], type=pa.string()),
            "value": pa.array([v for _, v in metrics], type=pa.float64()),
        }
    )


CORPUS_STATS_QUERIES["doc_data_card"] = q_doc_data_card

CORPUS_STATS_ORACLES["doc_data_card"] = """
WITH s AS (
  SELECT lang, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
)
SELECT CAST(0 AS BIGINT) AS metric_idx, 'n_docs' AS metric,
       CAST(count(*) AS DOUBLE) AS value FROM s
UNION ALL SELECT 1, 'total_tokens', CAST(sum(ntok) AS DOUBLE) FROM s
UNION ALL SELECT 2, 'mean_tokens',
       CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE) FROM s
UNION ALL SELECT 3, 'min_tokens', CAST(min(ntok) AS DOUBLE) FROM s
UNION ALL SELECT 4, 'max_tokens', CAST(max(ntok) AS DOUBLE) FROM s
UNION ALL SELECT 5, 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) FROM s
UNION ALL SELECT 6, 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM s
"""


# ---------------------------------------------- feature correlation matrix
# Pairwise Pearson correlation between per-document surface features —
# the redundancy screen run before feeding signals to a quality
# classifier (highly-correlated features add cost, not information).
# ONE streaming pass emits a single tiny moments row per batch
# (n, Σf, Σf², Σf·g per pair — 15 doubles for K=4 features); the
# driver sums the #batches partials and evaluates the K×K matrix, so
# grouped state is data-size independent (the PCA/regression shape).
# Features are closed forms both engines compute identically on the raw
# text: chars (the n_chars column), whitespace tokens, and the counts of
# the two most common letters — enough spread to make the matrix
# non-trivial.  Output: the 6 upper-triangle pairs, long form.

CORR_FEATURES = ("f_chars", "f_tokens", "f_e", "f_a")


def q_doc_feature_corr(sf_dir: str):
    """(feat_a, feat_b, r): Pearson correlation for each unordered
    feature pair (upper triangle, K=4 → 6 rows)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text", "n_chars"]
    )
    k = len(CORR_FEATURES)
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]

    def partial(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        F = np.empty((len(t), k), dtype=np.float64)
        F[:, 0] = t["n_chars"].to_numpy().astype(np.float64)
        F[:, 1] = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy()
        F[:, 2] = pc.count_substring(text, "e").to_numpy()
        F[:, 3] = pc.count_substring(text, "a").to_numpy()
        row = {"n": pa.array([len(t)], type=pa.int64())}
        for i, name in enumerate(CORR_FEATURES):
            row[f"s_{name}"] = pa.array([float(F[:, i].sum())])
            row[f"ss_{name}"] = pa.array([float((F[:, i] * F[:, i]).sum())])
        for i, j in pairs:
            row[f"sp_{i}_{j}"] = pa.array([float((F[:, i] * F[:, j]).sum())])
        return pa.table(row)

    mp = ds.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = float(mp["n"])
    s = np.array([mp[f"s_{f}"] for f in CORR_FEATURES])
    ss = np.array([mp[f"ss_{f}"] for f in CORR_FEATURES])
    var = ss - s * s / n
    fa, fb, r = [], [], []
    for i, j in pairs:
        cov = float(mp[f"sp_{i}_{j}"]) - s[i] * s[j] / n
        fa.append(CORR_FEATURES[i])
        fb.append(CORR_FEATURES[j])
        r.append(cov / np.sqrt(var[i] * var[j]) if var[i] > 0 and var[j] > 0 else None)
    return pa.table(
        {
            "feat_a": pa.array(fa, type=pa.string()),
            "feat_b": pa.array(fb, type=pa.string()),
            "r": pa.array(r, type=pa.float64()),
        }
    )


CORPUS_STATS_QUERIES["doc_feature_corr"] = q_doc_feature_corr

CORPUS_STATS_ORACLES["doc_feature_corr"] = """
WITH f AS (
  SELECT CAST(n_chars AS DOUBLE) AS f_chars,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS f_tokens,
         CAST(length(text) - length(replace(text, 'e', '')) AS DOUBLE) AS f_e,
         CAST(length(text) - length(replace(text, 'a', '')) AS DOUBLE) AS f_a
  FROM documents
)
SELECT 'f_chars' AS feat_a, 'f_tokens' AS feat_b, corr(f_chars, f_tokens) AS r FROM f
UNION ALL SELECT 'f_chars', 'f_e', corr(f_chars, f_e) FROM f
UNION ALL SELECT 'f_chars', 'f_a', corr(f_chars, f_a) FROM f
UNION ALL SELECT 'f_tokens', 'f_e', corr(f_tokens, f_e) FROM f
UNION ALL SELECT 'f_tokens', 'f_a', corr(f_tokens, f_a) FROM f
UNION ALL SELECT 'f_e', 'f_a', corr(f_e, f_a) FROM f
"""


# ------------------------------------------------- PMI collocations
# Pointwise mutual information over the corpus's FREQUENT bigrams — the
# collocation-extraction step (multi-word expressions for tokenizer /
# phrase-mining work).  Raw PMI degenerates on rare pairs, so the
# standard recipe scores only pairs above a frequency floor; here the
# candidate set is the exact top-PMI_CANDIDATES pairs by count (ties by
# pair ascending), which the bucketed pair sweep above already computes
# exactly (a pair lives wholly in one bucket).
#
# Scale shape: ONE pair-bucket shuffle (the q_doc_bigrams machinery)
# yields the candidates; their ≤2·P distinct words are then a
# DRIVER-SMALL set, so the unigram counts come from one streaming
# filtered-count pass against the broadcast word list — no term-keyed
# join, no second shuffle, no vocabulary-sized state anywhere.  The
# corpus totals (U words, B bigrams) fall out of the same pass.

PMI_CANDIDATES = 200
PMI_K = 30


def q_doc_pmi(sf_dir: str, k: int = PMI_K, p: int = PMI_CANDIDATES):
    """(pair, n_pair, n_w1, n_w2, pmi): top-k collocations by PMI among
    the corpus's top-p bigrams by count.  pmi = ln(n_pair·U²/(B·c₁·c₂))
    with U = total tokens, B = total adjacent pairs."""
    cand = q_doc_bigrams(sf_dir, k=p).to_pandas()
    words = sorted({w for pair in cand["pair"] for w in pair.split(" ")})
    word_arr = pa.array(words, type=pa.string())

    def count_pass(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        n_tok = len(flat)
        n_docs = len(t)
        hit = flat.filter(pc.is_in(flat, value_set=word_arr))
        vc = hit.value_counts()
        vc = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
        # total sentinels carry a SPACE, which no split-on-space token can
        # contain (NUL sentinels are unusable: pandas' object-string hash
        # table is NUL-terminated, so '\x00U' == '\x00B' under groupby)
        return pa.table(
            {
                "word": pa.concat_arrays(
                    [
                        vc.field("values"),
                        pa.array(["TOTAL U", "TOTAL B"], type=pa.string()),
                    ]
                ),
                "n": pa.concat_arrays(
                    [
                        pc.cast(vc.field("counts"), pa.int64()),
                        pa.array([n_tok, n_tok - n_docs], type=pa.int64()),
                    ]
                ),
            }
        )

    counts = (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .map_batches(count_pass, batch_format="pyarrow")
        .to_pandas()
        .groupby("word")["n"]
        .sum()
    )
    U = float(counts["TOTAL U"])
    B = float(counts["TOTAL B"])
    w12 = cand["pair"].str.split(" ", n=1, expand=True)
    c1 = w12[0].map(counts).astype(np.int64)
    c2 = w12[1].map(counts).astype(np.int64)
    n_ab = cand["n"].astype(np.int64)
    pmi = np.log(
        n_ab.to_numpy().astype(np.float64)
        * U
        * U
        / (B * c1.to_numpy().astype(np.float64) * c2.to_numpy().astype(np.float64))
    )
    out = pa.table(
        {
            "pair": pa.array(cand["pair"], type=pa.string()),
            "n_pair": pa.array(n_ab, type=pa.int64()),
            "n_w1": pa.array(c1, type=pa.int64()),
            "n_w2": pa.array(c2, type=pa.int64()),
            "pmi": pa.array(pmi, type=pa.float64()),
        }
    )
    order = pc.sort_indices(
        out, sort_keys=[("pmi", "descending"), ("pair", "ascending")]
    )[: min(k, len(out))]
    return out.take(order)


CORPUS_STATS_QUERIES["doc_pmi"] = q_doc_pmi

CORPUS_STATS_ORACLES["doc_pmi"] = f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS l FROM documents
), zipped AS (
  SELECT unnest(list_zip(l, l[2:])) AS p FROM toks
), pairs AS (
  SELECT p[1] AS w1, p[2] AS w2, p[1] || ' ' || p[2] AS pair
  FROM zipped WHERE p[2] IS NOT NULL
), cand AS (
  SELECT pair, min(w1) AS w1, min(w2) AS w2, count(*) AS n_pair
  FROM pairs GROUP BY pair
  ORDER BY n_pair DESC, pair ASC LIMIT {PMI_CANDIDATES}
), uni AS (
  SELECT unnest(l) AS w FROM toks
), wc AS (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS u FROM uni
), btot AS (
  SELECT CAST(count(*) AS DOUBLE) AS b FROM pairs
)
SELECT cand.pair,
       CAST(cand.n_pair AS BIGINT) AS n_pair,
       CAST(w1c.c AS BIGINT) AS n_w1,
       CAST(w2c.c AS BIGINT) AS n_w2,
       ln(CAST(cand.n_pair AS DOUBLE) * u * u / (b * w1c.c * w2c.c)) AS pmi
FROM cand
JOIN wc w1c ON w1c.w = cand.w1
JOIN wc w2c ON w2c.w = cand.w2, tot, btot
ORDER BY pmi DESC, cand.pair ASC LIMIT {PMI_K}
"""
