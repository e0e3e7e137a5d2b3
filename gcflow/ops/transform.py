"""Per-document text transforms for training-data preparation:
normalization, token-budget truncation, and the fill-in-the-middle
(FIM) rearrangement used for code/infilling model corpora.

All three are pure streaming ``map_batches`` passes over the
``documents`` table — no shuffle, no driver collect — and every per-row
kernel is vectorized (pyarrow.compute for the scalar-offset slices and
list ops; polars ``str.slice`` for the per-row-offset FIM cuts, which
is codepoint-based exactly like DuckDB ``substr``).  Each op has an
exact DuckDB oracle.

The synthetic corpus is already lowercase/single-spaced, so the
normalization op would be an identity check on raw ``text``; to make
the oracle discriminating it first applies a deterministic closed-form
perturbation of ``doc_id`` (double spaces / uppercased head / added
surrounding whitespace) IN BOTH ENGINES, the same pattern the
multimodal kernels use (multimodal.py: params closed-form-of-doc_id).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def _docs(sf_dir: str, columns) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# --------------------------------------------------------- normalization
# NFC unicode normalization + trim + whitespace collapse + lowercase —
# the standard first stage of a web-scraped text pipeline.


def _perturb(t: pa.Table) -> pa.Array:
    """Deterministic mess-maker (closed form of doc_id, mirrored in SQL):
    doc_id%3==0 → every space doubled; ==1 → first 10 chars uppercased;
    ==2 → leading '  ' and trailing ' \\t' appended."""
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    import numpy as np

    mod = pa.array(np.asarray(t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]) % 3)
    doubled = pc.replace_substring(text, " ", "  ")
    head_up = pc.binary_join_element_wise(
        pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 10)),
        pc.utf8_slice_codeunits(text, 10, None),
        "",
    )
    padded = pc.binary_join_element_wise(
        pa.nulls(len(text), pa.string()).fill_null("  "),
        text,
        pa.nulls(len(text), pa.string()).fill_null(" \t"),
        "",
    )
    out = pc.if_else(
        pc.equal(mod, 0), doubled, pc.if_else(pc.equal(mod, 1), head_up, padded)
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def normalize_text(text: pa.Array) -> pa.Array:
    """NFC → collapse runs of whitespace to one space → trim → lower.
    Collapse-before-trim matters for cross-engine parity: DuckDB's
    ``trim`` strips only spaces while pyarrow's strips all unicode
    whitespace — after the collapse both ends hold plain spaces, so the
    two agree bitwise (both regex engines are RE2; '\\s+' has identical
    semantics)."""
    n = pc.utf8_normalize(text, form="NFC")
    n = pc.replace_substring_regex(n, r"\s+", " ")
    n = pc.utf8_trim_whitespace(n)
    return pc.utf8_lower(n)


def q_doc_normalize(sf_dir: str):
    """Perturb (closed form of doc_id) then normalize; emits the cleaned
    text plus in/out codepoint counts so the oracle hash pins both the
    transform and the measurement."""

    def fn(t: pa.Table) -> pa.Table:
        messy = _perturb(t)
        clean = normalize_text(messy)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": clean,
                "n_chars_in": pc.cast(pc.utf8_length(messy), pa.int64()),
                "n_chars_out": pc.cast(pc.utf8_length(clean), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------ truncation
# Token-budget truncation: keep the first TRUNCATE_BUDGET whitespace
# tokens (the context-length guard stage of a training pipeline).

TRUNCATE_BUDGET = 32


def q_doc_truncate(sf_dir: str, budget: int = TRUNCATE_BUDGET):
    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
        kept = pc.binary_join(pc.list_slice(toks, 0, budget), " ")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "trunc_text": kept,
                "n_tokens": n_tok,
                "truncated": pc.cast(pc.greater(n_tok, budget), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------------- FIM
# Fill-in-the-middle (Bavarian et al. 2022, "Efficient Training of
# Language Models to Fill in the Middle"): cut (prefix, middle, suffix)
# and emit the PSM rearrangement prefix‖suffix‖middle with sentinels.
# The cut points are closed forms of doc_id (mirrored in SQL):
#   start = min(n//4 + doc_id%7, n),  mid_len = n//3
# Per-row-offset slicing uses polars str.slice, which is codepoint-based
# exactly like DuckDB substr (verified bitwise on non-ASCII).

FIM_PRE = "<|fim_prefix|>"
FIM_SUF = "<|fim_suffix|>"
FIM_MID = "<|fim_middle|>"


def q_doc_fim(sf_dir: str):
    import polars as pl

    os.environ.setdefault("POLARS_MAX_THREADS", "1")

    def fn(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        n = pl.col("text").str.len_chars()
        start = pl.min_horizontal(
            n // 4 + pl.col("doc_id").cast(pl.Int64) % 7, n
        ).alias("start")
        mid_len = (n // 3).alias("mid_len")
        df = df.with_columns(start, mid_len).with_columns(
            pl.col("text").str.slice(0, pl.col("start")).alias("prefix"),
            pl.col("text").str.slice(pl.col("start"), pl.col("mid_len")).alias("middle"),
            pl.col("text")
            .str.slice(pl.col("start") + pl.col("mid_len"))
            .alias("suffix"),
        )
        df = df.with_columns(
            (
                pl.lit(FIM_PRE)
                + pl.col("prefix")
                + pl.lit(FIM_SUF)
                + pl.col("suffix")
                + pl.lit(FIM_MID)
                + pl.col("middle")
            ).alias("fim_text")
        )
        return df.select(["doc_id", "prefix", "middle", "suffix", "fim_text"]).to_arrow().cast(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("prefix", pa.string()),
                    ("middle", pa.string()),
                    ("suffix", pa.string()),
                    ("fim_text", pa.string()),
                ]
            )
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


TRANSFORM_QUERIES = {
    "doc_normalize": q_doc_normalize,
    "doc_truncate": q_doc_truncate,
    "doc_fim": q_doc_fim,
}

TRANSFORM_ORACLES = {
    "doc_normalize": """
WITH messy AS (
  SELECT doc_id,
         CASE doc_id % 3
           WHEN 0 THEN replace(text, ' ', '  ')
           WHEN 1 THEN upper(substr(text, 1, 10)) || substr(text, 11)
           ELSE '  ' || text || ' ' || chr(9)
         END AS m
  FROM documents
)
SELECT doc_id,
       lower(trim(regexp_replace(nfc_normalize(m), '\\s+', ' ', 'g'))) AS norm_text,
       CAST(length(m) AS BIGINT) AS n_chars_in,
       CAST(length(lower(trim(regexp_replace(nfc_normalize(m), '\\s+', ' ', 'g')))) AS BIGINT) AS n_chars_out
FROM messy
""",
    "doc_truncate": f"""
SELECT doc_id,
       array_to_string(list_slice(string_split(text, ' '), 1, {TRUNCATE_BUDGET}), ' ') AS trunc_text,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(string_split(text, ' ')) > {TRUNCATE_BUDGET} AS BIGINT) AS truncated
FROM documents
""",
    "doc_fim": f"""
WITH cut AS (
  SELECT doc_id, text,
         least(length(text) // 4 + doc_id % 7, length(text)) AS s,
         length(text) // 3 AS ml
  FROM documents
)
SELECT doc_id,
       substr(text, 1, s) AS prefix,
       substr(text, s + 1, ml) AS middle,
       substr(text, s + ml + 1) AS suffix,
       '{FIM_PRE}' || substr(text, 1, s) || '{FIM_SUF}' || substr(text, s + ml + 1)
         || '{FIM_MID}' || substr(text, s + 1, ml) AS fim_text
FROM cut
""",
}
