"""Cardinality-stress harness: run the late-round ops on a synthetic
corpus ≥10× sf0.1's rows and report the time-vs-rows ratio (the 100×
question's evidence — BASELINE.md lever table).

Builds /tmp/gcflow_stress/{documents,events,embeddings}.parquet by
replicating the sf0.1 tables with id shifts:
- documents ×24 (120k docs): odd replicas get a one-word prefix, which
  shifts every fixed-width segment boundary (unique segments); even
  replicas are exact copies (cross-doc dup segments) — a mixed dup
  fraction rather than the all-dup pathological case.
- events ×20 (2M rows): values jittered per replica so the grouped
  percentile refinement sees distinct values, not 20-deep ties.
- embeddings ×100 (200k vectors): gaussian noise σ=0.5 per replica so
  replicas are NOT near-dups of each other; the planted ids%10==4
  near-dup structure (dedup.py _emb_corpus_packed_ds) recurs per
  replica.  At this size SemDeDup's auto-k grows past its floor
  (k = ceil(1.1·N/4096)), evidencing the k-scaling path.

Usage: python tools/stress.py [op ...]   (default: all)
Prints one JSON object per run; copy the summary row into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/gcflow_stress"
DOC_X = int(os.environ.get("STRESS_DOC_X", "24"))
EVT_X = int(os.environ.get("STRESS_EVT_X", "20"))
EMB_X = int(os.environ.get("STRESS_EMB_X", "100"))
RUNS = int(os.environ.get("STRESS_RUNS", "2"))


def _build() -> dict:
    os.makedirs(OUT, exist_ok=True)
    info = {}

    t = pq.read_table(os.path.join(BASE, "documents.parquet"))
    n = len(t)
    ids = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    parts = []
    for i in range(DOC_X):
        txt = texts if i % 2 == 0 else [f"r{i} " + s for s in texts]
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + i * n, type=pa.int64()),
                    "text": pa.array(txt, type=pa.string()),
                    "lang": t["lang"],
                    "source": t["source"],
                    "n_chars": pa.array([len(s) for s in txt], type=pa.int64()),
                }
            )
        )
    docs = pa.concat_tables(parts)
    pq.write_table(docs, os.path.join(OUT, "documents.parquet"))
    info["documents"] = {"base_rows": n, "stress_rows": len(docs)}

    t = pq.read_table(os.path.join(BASE, "events.parquet"))
    n = len(t)
    eids = t["event_id"].to_numpy()
    vals = t["value"].to_numpy(zero_copy_only=False)
    parts = []
    for i in range(EVT_X):
        parts.append(
            pa.table(
                {
                    "event_id": pa.array(eids + i * n, type=pa.int64()),
                    "ts": t["ts"],
                    "user_id": t["user_id"],
                    "event_type": t["event_type"],
                    "value": pa.array(vals + i * 1e-7, type=pa.float64()),
                    "props": t["props"],
                }
            )
        )
    evts = pa.concat_tables(parts)
    pq.write_table(evts, os.path.join(OUT, "events.parquet"))
    info["events"] = {"base_rows": n, "stress_rows": len(evts)}

    t = pq.read_table(os.path.join(BASE, "embeddings.parquet"))
    n = len(t)
    vids = t["vec_id"].to_numpy()
    E = np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float32)
    rs = np.random.RandomState(11)
    parts = []
    for i in range(EMB_X):
        Ei = E if i == 0 else E + rs.normal(0, 0.5, E.shape).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vids + i * n, type=pa.int64()),
                    "embedding": pa.array(list(Ei), type=pa.list_(pa.float32())),
                    "label": t["label"],
                }
            )
        )
    embs = pa.concat_tables(parts)
    pq.write_table(embs, os.path.join(OUT, "embeddings.parquet"))
    info["embeddings"] = {"base_rows": n, "stress_rows": len(embs)}
    return info


def _consume(res) -> int:
    if hasattr(res, "to_pandas") and not isinstance(res, pa.Table):
        return len(res.to_pandas())
    if isinstance(res, pa.Table):
        return len(res)
    return len(res)


def _time(fn, sf_dir: str) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(RUNS):
        t0 = time.perf_counter()
        rows = _consume(fn(sf_dir))
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), rows


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )

    from gcflow.ops.curation import (
        q_doc_line_dedup,
        q_doc_line_dedup_clean,
        q_doc_pack_sequences,
    )
    from gcflow.ops.dedup import (
        SEMDEDUP_CELL_TARGET,
        SEMDEDUP_K_MIN,
        q_emb_semdedup,
    )
    from gcflow.ops.corpus_stats import q_doc_data_card
    from gcflow.ops.curation import (
        q_doc_curation_funnel,
        q_doc_epoch_shuffle,
        q_doc_mix_schedule,
        q_doc_ngram_overlap,
        q_doc_source_overlap,
    )
    from gcflow.ops.quantile import (
        q_evt_mad,
        q_evt_winsorize,
        q_evt_value_hist,
        q_evt_value_percentile_cont,
        q_evt_value_percentiles_by_type,
        q_evt_value_rank,
    )
    from gcflow.ops.classifier import q_doc_quality_classifier
    from gcflow.ops.dedup import (
        q_doc_cross_dedup,
        q_doc_softdedup_weight,
        q_doc_split_leakage_safe,
    )
    from gcflow.ops.span_dedup import q_doc_dup_spans, q_doc_ngram_novelty
    from gcflow.ops.quantize import q_emb_pq
    from gcflow.ops.similarity import q_emb_ivfpq_search
    from gcflow.ops.text import (
        q_doc_bigram_logprob,
        q_doc_dsir_weight,
        q_doc_sample_unimax,
        q_doc_unigram_logprob,
    )
    from gcflow.ops.corpus_stats import q_doc_feature_corr, q_doc_pmi
    from gcflow.ops.linalg import q_emb_diversity, q_emb_outliers, q_evt_regression
    from gcflow.ops.similarity import q_emb_hard_negatives
    from gcflow.ops.text import q_doc_lp_residual, q_doc_source_kl
    from gcflow.ops.text import q_doc_ccnet_bucket, q_doc_sample_weighted
    from gcflow.ops.windows import (
        q_evt_cube,
        q_evt_top_users_per_type,
        q_evt_user_first_last,
        q_evt_cohort_retention,
        q_evt_transitions,
        q_evt_user_pivot,
        q_evt_funnel,
        q_evt_resample,
        q_evt_user_cumsum,
        q_evt_user_ewma,
        q_evt_burst,
        q_evt_type_lift,
        q_evt_user_entropy,
        q_evt_user_interarrival,
        q_evt_user_lag,
        q_evt_user_streak,
    )
    from gcflow.ops.tokenizer import q_doc_bpe_train
    from gcflow.ops.sketch import q_evt_value_tdigest_by_type
    from gcflow.ops.multimodal import q_mm_jpeg_meta, q_mm_png_meta
    from gcflow.ops.text import q_doc_char_entropy
    from gcflow.ops.transform import q_doc_fim, q_doc_normalize
    from gcflow.ops.valuation import q_emb_knn_shapley

    ops = {
        "doc_ngram_overlap": (q_doc_ngram_overlap, "documents"),
        "doc_bpe_train": (q_doc_bpe_train, "documents"),
        "doc_line_dedup": (q_doc_line_dedup, "documents"),
        "doc_line_dedup_clean": (q_doc_line_dedup_clean, "documents"),
        "doc_unigram_logprob": (q_doc_unigram_logprob, "documents"),
        "doc_dsir_weight": (q_doc_dsir_weight, "documents"),
        "doc_pack_sequences": (q_doc_pack_sequences, "documents"),
        "doc_epoch_shuffle": (q_doc_epoch_shuffle, "documents"),
        "doc_dup_spans": (q_doc_dup_spans, "documents"),
        "doc_ngram_novelty": (q_doc_ngram_novelty, "documents"),
        "doc_cross_dedup": (q_doc_cross_dedup, "documents"),
        "doc_softdedup_weight": (q_doc_softdedup_weight, "documents"),
        "doc_split_leakage_safe": (q_doc_split_leakage_safe, "documents"),
        "doc_bigram_logprob": (q_doc_bigram_logprob, "documents"),
        "doc_quality_classifier": (q_doc_quality_classifier, "documents"),
        "doc_sample_unimax": (q_doc_sample_unimax, "documents"),
        "evt_funnel": (q_evt_funnel, "events"),
        "evt_resample": (q_evt_resample, "events"),
        "emb_pq": (q_emb_pq, "embeddings"),
        "emb_ivfpq_search": (q_emb_ivfpq_search, "embeddings"),
        "evt_value_percentiles_by_type": (
            q_evt_value_percentiles_by_type, "events",
        ),
        "evt_value_rank": (q_evt_value_rank, "events"),
        "evt_user_lag": (q_evt_user_lag, "events"),
        "evt_user_cumsum": (q_evt_user_cumsum, "events"),
        "doc_mix_schedule": (q_doc_mix_schedule, "documents"),
        "emb_semdedup": (q_emb_semdedup, "embeddings"),
        "doc_normalize": (q_doc_normalize, "documents"),
        "doc_fim": (q_doc_fim, "documents"),
        "doc_char_entropy": (q_doc_char_entropy, "documents"),
        "evt_value_percentile_cont": (q_evt_value_percentile_cont, "events"),
        "evt_mad": (q_evt_mad, "events"),
        "evt_winsorize": (q_evt_winsorize, "events"),
        "evt_top_users_per_type": (q_evt_top_users_per_type, "events"),
        "evt_user_first_last": (q_evt_user_first_last, "events"),
        "evt_user_pivot": (q_evt_user_pivot, "events"),
        "evt_cohort_retention": (q_evt_cohort_retention, "events"),
        "evt_transitions": (q_evt_transitions, "events"),
        "evt_cube": (q_evt_cube, "events"),
        "evt_value_hist": (q_evt_value_hist, "events"),
        "emb_hard_negatives": (q_emb_hard_negatives, "embeddings"),
        "emb_outliers": (q_emb_outliers, "embeddings"),
        "emb_diversity": (q_emb_diversity, "embeddings"),
        "doc_ccnet_bucket": (q_doc_ccnet_bucket, "documents"),
        "doc_source_kl": (q_doc_source_kl, "documents"),
        "doc_lp_residual": (q_doc_lp_residual, "documents"),
        "doc_curation_funnel": (q_doc_curation_funnel, "documents"),
        "doc_data_card": (q_doc_data_card, "documents"),
        "mm_png_meta": (q_mm_png_meta, "documents"),
        "mm_jpeg_meta": (q_mm_jpeg_meta, "documents"),
        "doc_sample_weighted": (q_doc_sample_weighted, "documents"),
        "evt_user_ewma": (q_evt_user_ewma, "events"),
        "doc_source_overlap": (q_doc_source_overlap, "documents"),
        "evt_regression": (q_evt_regression, "events"),
        "evt_user_interarrival": (q_evt_user_interarrival, "events"),
        "doc_feature_corr": (q_doc_feature_corr, "documents"),
        "doc_pmi": (q_doc_pmi, "documents"),
        "evt_burst": (q_evt_burst, "events"),
        "evt_user_streak": (q_evt_user_streak, "events"),
        "evt_user_entropy": (q_evt_user_entropy, "events"),
        "evt_type_lift": (q_evt_type_lift, "events"),
        "evt_value_tdigest_by_type": (q_evt_value_tdigest_by_type, "events"),
        # keep V (the benchmark set) CONSTANT across scales — valuation
        # is O(N*V) by design, so the per-row scaling story is N at fixed V
        "emb_knn_shapley": (
            lambda d: q_emb_knn_shapley(d, val_mod=61 if d == BASE else 6100),
            "embeddings",
        ),
    }
    only = set(sys.argv[1:])

    info = _build()
    out: dict = {"tables": info}
    for name, (fn, table) in ops.items():
        if only and name not in only:
            continue
        base_s, base_rows = _time(fn, BASE)
        stress_s, stress_rows = _time(fn, OUT)
        rows_ratio = info[table]["stress_rows"] / info[table]["base_rows"]
        rec = {
            "base_s": base_s,
            "stress_s": stress_s,
            "rows_ratio": round(rows_ratio, 1),
            "time_ratio": round(stress_s / base_s, 2) if base_s else None,
            "base_out_rows": base_rows,
            "stress_out_rows": stress_rows,
        }
        if name == "emb_semdedup":
            for tag, nrows in (
                ("base", info[table]["base_rows"]),
                ("stress", info[table]["stress_rows"]),
            ):
                n_est = nrows + nrows // 10
                rec[f"k_{tag}"] = max(
                    SEMDEDUP_K_MIN, -(-n_est // SEMDEDUP_CELL_TARGET)
                )
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
