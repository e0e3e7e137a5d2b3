"""Benchmark harness: headline parse→enrich→route→aggregate pipeline +
representative operator queries over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns": T, "turns_per_sec": r}

--scaling: runs the headline job in two fresh processes (GRAFT_SCALE_LO/HI,
default 8 and 32 CPUs) on the same input and reports both throughputs +
scaling efficiency (the sandbox evidence for the N→4N-node criterion; see
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# replicate the events-derived corpus so the bench input is meaningfully
# large (sf0.1: 100k events × 9/8 lines × R)
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "80"))


def _grammar_probe_worker(lines_target: int = 60_000) -> float:
    """Single-core recursive-descent throughput (lines/s) — run me in a
    pinned subprocess, not in the bench driver."""
    try:
        os.sched_setaffinity(0, {0})
    except OSError:
        pass
    from gcflow.grammar import parse_log

    fixture_path = os.path.join(REPO, "tests", "fixtures", "basic-java8-gc.log")
    with open(fixture_path) as f:
        fixture = f.read()
    if not fixture.endswith("\n"):
        fixture += "\n"
    n_lines = fixture.count("\n")
    reps = max(1, lines_target // n_lines)
    blob = fixture * reps
    parse_log(blob[: len(fixture) * 2])  # warm (regex compile, imports)
    t0 = time.perf_counter()
    parse_log(blob)
    dt = time.perf_counter() - t0
    return round(n_lines * reps / dt, 1)


def _host_fingerprint() -> dict:
    """Substrate fingerprint carried in every bench JSON (round-4
    lesson: per-round sandbox VMs are NOT the same hardware — a silent
    host swap read as a 2× wall-clock regression until a hand A/B
    caught it).  membw: tools/membw.py aggregate DRAM bandwidth at P=1
    and P=32; grammar: pinned single-core parse throughput."""
    fp: dict = {}
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "membw.py"), "1", "32"],
            capture_output=True, text=True, timeout=300, check=True,
        )
        fp["membw_gbps"] = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as exc:  # fingerprint must never sink the bench
        fp["membw_error"] = str(exc)[:200]
    try:
        r = subprocess.run(
            [
                sys.executable, "-c",
                "import sys; sys.path.insert(0, %r); "
                "from bench import _grammar_probe_worker; "
                "print(_grammar_probe_worker())" % REPO,
            ],
            capture_output=True, text=True, timeout=300, check=True,
        )
        fp["grammar_lines_per_sec"] = float(r.stdout.strip().splitlines()[-1])
    except Exception as exc:
        fp["grammar_error"] = str(exc)[:200]
    return fp


def _scaling_main():
    # N and 4N parallelism levels; default 8→32.  On this 32-physical-core
    # host the 32-CPU level shares cores with raylet/driver/object-store —
    # GRAFT_SCALE_LO/HI=4/16 measures the same criterion without that
    # saturation artifact (both pairs reported in BASELINE.md).
    lo = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    host_fp = _host_fingerprint()  # before the legs: idle box, unperturbed
    out = {}
    for ncpu in (lo, hi):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            # single-box run-to-run variance is ±15-30%; min over repeats is
            # the stable capability estimator for the efficiency ratio
            GRAFT_BENCH_RUNS=os.environ.get("GRAFT_SCALE_RUNS", "3"),
            # scaling legs time the headline only — the per-operator queries
            # would just add identical constants to both legs
            GRAFT_BENCH_HEADLINE_ONLY="1",
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
            # Pin every un-scheduled thread pool to 1 thread per worker
            # process.  `ray.init(num_cpus=N)` bounds task SCHEDULING, not
            # Arrow kernel/IO pools (default: 8 IO threads per worker) or
            # BLAS — on a 32-core box a 4-CPU leg otherwise borrows host
            # cores through those pools and every N→4N ratio reads LOW
            # (see BASELINE.md round-2 confound; the 2-CPU leg measured an
            # impossible 58.8k turns/s per scheduled core).  The env
            # propagates to raylet → workers under address="local".
            OMP_NUM_THREADS="1",
            ARROW_IO_THREADS="1",
            ARROW_NUM_THREADS="1",
            OPENBLAS_NUM_THREADS="1",
            MKL_NUM_THREADS="1",
            NUMEXPR_NUM_THREADS="1",
        )
        # CPU-affinity-pin the whole leg (Ray raylet/object-store/workers all
        # inherit) to exactly N physical cores: the env vars above bound
        # per-process THREAD pools, but an un-pinned 4-CPU leg still spreads
        # its ~10 processes across all 32 host cores and reads an impossibly
        # high per-core throughput, biasing every N→4N ratio LOW (round-2
        # confound, BASELINE.md).  `taskset -c 0..N-1` emulates an N-core
        # node faithfully — everything the leg runs timeshares N cores.
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", "0-%d" % (ncpu - 1)] + cmd
        r = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        out[ncpu] = json.loads(r.stdout.strip().splitlines()[-1])
    t_lo, t_hi = out[lo]["value"], out[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"turns_per_sec_{lo}": out[lo]["turns_per_sec"],
                f"turns_per_sec_{hi}": out[hi]["turns_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "sf": out[hi]["sf"],
                "turns": out[hi]["turns"],
                "cpus": [lo, hi],
                "host_fingerprint": host_fp,
            }
        )
    )


def main():
    os.environ.setdefault("PYTHONPATH", REPO)
    # fingerprint the substrate before Ray starts (idle box, unperturbed)
    host_fp = {} if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") else _host_fingerprint()
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_tensor_extension_casting = False
    ctx.enable_progress_bars = False

    from gcflow import pipeline as pl
    from gcflow import transcripts as tr

    # untimed: materialize the corpus (in a SUBPROCESS — building a
    # 10M-row frame in this process degrades the measuring interpreter),
    # then warm the session (worker pool) with a small pipeline run and
    # the input itself with one read, so the timed section measures
    # steady-state compute + shuffle, not spin-up or cold page cache
    gen = (
        "import sys; sys.path.insert(0, %r); from gcflow import transcripts as tr; "
        "print(tr.materialize_transcripts(%r, replicate=%d)); "
        "print(tr.materialize_heap_transcripts(n_convs=8000, reps=5))"
        % (REPO, SF_DIR, REPLICATE)
    )
    out = subprocess.run(
        [sys.executable, "-c", gen], capture_output=True, text=True, check=True
    )
    path = out.stdout.strip().splitlines()[0]
    warm_path = tr.materialize_transcripts("/root/testdata/sf0.001")
    shutil.rmtree("/tmp/gcflow_warm_out", ignore_errors=True)
    pl.run_pipeline(warm_path, out_dir="/tmp/gcflow_warm_out", mode="basic")
    pl.read_transcripts(path).count()  # untimed input warm read
    import glob as _glob

    import pyarrow.parquet as pq

    def _num_rows(p):
        files = (
            sorted(_glob.glob(os.path.join(p, "*.parquet"))) if os.path.isdir(p) else [p]
        )
        return sum(pq.read_metadata(f).num_rows for f in files)

    turns = _num_rows(path)

    queries: dict = {}

    # headline: full parse→enrich→route→aggregate with partitioned sinks
    out_dir = os.environ.get("GCFLOW_BENCH_OUT", "/dev/shm/gcflow_bench_out")
    stitch_impl = os.environ.get("GCFLOW_STITCH_IMPL", "vec")
    # ±15-30% single-box run variance → min-of-2 by default for the
    # recorded headline (GRAFT_BENCH_RUNS=1 restores single-shot)
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "2"))
    runs = []
    for _ in range(n_runs):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        pl.run_pipeline(path, out_dir=out_dir, mode="basic", stitch_impl=stitch_impl)
        runs.append(round(time.perf_counter() - t0, 3))
    headline = min(runs)
    queries["gc_pipeline"] = headline
    if n_runs > 1:
        queries["gc_pipeline_runs"] = runs

    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        print(
            json.dumps(
                {
                    "metric": "parse→enrich→route→aggregate throughput",
                    "value": round(headline, 3),
                    "unit": "sec",
                    "queries": queries,
                    "sf": os.path.basename(os.path.normpath(SF_DIR)),
                    "num_cpus": NUM_CPUS,
                    "turns": int(turns),
                    "turns_per_sec": round(turns / headline, 1),
                    "replicate": REPLICATE,
                }
            )
        )
        ray.shutdown()
        return

    # heap-stats-mode headline (events ≪ lines: ~23 lines/event {}-blocks)
    heap_path = tr.materialize_heap_transcripts(n_convs=8000, reps=5)
    heap_turns = _num_rows(heap_path)
    heap_out = os.environ.get("GCFLOW_BENCH_OUT", "/dev/shm/gcflow_bench_out") + "_heap"
    shutil.rmtree(heap_out, ignore_errors=True)
    t0 = time.perf_counter()
    pl.run_pipeline(heap_path, out_dir=heap_out, mode="heap")
    heap_sec = time.perf_counter() - t0
    queries["gc_pipeline_heap"] = round(heap_sec, 3)

    # representative operator benchmarks (each timed separately)
    from gcflow.ops.curation import (
        q_doc_chunk,
        q_doc_curation_funnel,
        q_doc_curate,
        q_doc_decontaminate_bloom,
        q_doc_epoch_shuffle,
        q_doc_line_dedup,
        q_doc_line_dedup_clean,
        q_doc_mix_schedule,
        q_doc_pack_sequences,
    )
    from gcflow.ops.corpus_stats import q_doc_bigrams, q_doc_data_card
    from gcflow.ops.dedup import q_doc_exact_dedup, q_doc_minhash_lsh
    from gcflow.ops.linalg import q_emb_pca
    from gcflow.ops.quantile import (
        q_evt_mad,
        q_evt_winsorize,
        q_evt_value_hist,
        q_evt_value_percentile_cont,
        q_evt_value_percentiles_by_type,
        q_evt_value_rank,
    )
    from gcflow.ops.quantize import q_emb_quantize_int8
    from gcflow.ops.relational import q_rel_q1, q_rel_q5
    from gcflow.ops.linalg import q_emb_diversity, q_emb_outliers
    from gcflow.ops.similarity import (
        q_doc_bm25_topk,
        q_emb_ann_topk,
        q_emb_hard_negatives,
        q_emb_ivfpq_search,
        q_emb_knn_label,
        q_emb_pq_search,
    )
    from gcflow.ops.text import (
        q_doc_ccnet_bucket,
        q_doc_lp_residual,
        q_doc_sample_weighted,
        q_doc_source_kl,
    )
    from gcflow.ops.dedup import q_doc_dup_size_hist
    from gcflow.ops.windows import (
        q_evt_cube,
        q_evt_top_users_per_type,
        q_evt_user_first_last,
        q_evt_cohort_retention,
        q_evt_transitions,
        q_evt_user_pivot,
    )
    from gcflow.ops.curation import q_doc_ngram_overlap, q_doc_source_overlap
    from gcflow.ops.text import (
        q_doc_bigram_logprob,
        q_doc_dsir_weight,
        q_doc_repetition,
        q_doc_top_keyword,
        q_doc_unigram_logprob,
    )
    from gcflow.ops.classifier import q_doc_quality_classifier
    from gcflow.ops.dedup import q_doc_cross_dedup
    from gcflow.ops.span_dedup import q_doc_dup_spans, q_doc_ngram_novelty
    from gcflow.ops.tokenizer import q_doc_bpe_train
    from gcflow.ops.transform import q_doc_fim, q_doc_normalize
    from gcflow.ops.text import q_doc_char_entropy
    from gcflow.ops.corpus_stats import q_doc_feature_corr, q_doc_pmi
    from gcflow.ops.sketch import q_evt_value_tdigest_by_type
    from gcflow.ops.linalg import q_evt_regression
    from gcflow.ops.multimodal import q_mm_jpeg_meta, q_mm_png_meta
    from gcflow.ops.valuation import q_emb_knn_shapley
    from gcflow.ops.windows import (
        q_evt_burst,
        q_evt_funnel,
        q_evt_resample,
        q_evt_type_lift,
        q_evt_user_entropy,
        q_evt_user_ewma,
        q_evt_user_interarrival,
        q_evt_user_streak,
    )

    for name, fn in [
        ("rel_q1", q_rel_q1),
        ("doc_exact_dedup", q_doc_exact_dedup),
        ("doc_minhash_lsh", q_doc_minhash_lsh),
        ("emb_ann_topk", q_emb_ann_topk),
        ("doc_chunk", q_doc_chunk),
        ("doc_pack_sequences", q_doc_pack_sequences),
        ("doc_epoch_shuffle", q_doc_epoch_shuffle),
        ("doc_mix_schedule", q_doc_mix_schedule),
        ("evt_value_rank", q_evt_value_rank),
        ("doc_top_keyword", q_doc_top_keyword),
        ("emb_quantize_int8", q_emb_quantize_int8),
        ("doc_repetition", q_doc_repetition),
        ("doc_decontaminate_bloom", q_doc_decontaminate_bloom),
        ("doc_curate", q_doc_curate),
        ("doc_unigram_logprob", q_doc_unigram_logprob),
        ("doc_bigram_logprob", q_doc_bigram_logprob),
        ("doc_bm25_topk", q_doc_bm25_topk),
        ("doc_bigrams", q_doc_bigrams),
        ("emb_pca", q_emb_pca),
        ("doc_dsir_weight", q_doc_dsir_weight),
        ("doc_line_dedup", q_doc_line_dedup),
        ("doc_line_dedup_clean", q_doc_line_dedup_clean),
        ("evt_value_percentiles_by_type", q_evt_value_percentiles_by_type),
        ("doc_ngram_overlap", q_doc_ngram_overlap),
        ("doc_bpe_train", q_doc_bpe_train),
        ("doc_dup_spans", q_doc_dup_spans),
        ("doc_cross_dedup", q_doc_cross_dedup),
        ("doc_quality_classifier", q_doc_quality_classifier),
        ("evt_funnel", q_evt_funnel),
        ("evt_resample", q_evt_resample),
        ("emb_pq_search", q_emb_pq_search),
        ("emb_ivfpq_search", q_emb_ivfpq_search),
        ("emb_knn_label", q_emb_knn_label),
        ("doc_normalize", q_doc_normalize),
        ("doc_fim", q_doc_fim),
        ("doc_char_entropy", q_doc_char_entropy),
        ("emb_knn_shapley", q_emb_knn_shapley),
        ("evt_value_percentile_cont", q_evt_value_percentile_cont),
        ("evt_value_hist", q_evt_value_hist),
        ("evt_cube", q_evt_cube),
        ("evt_mad", q_evt_mad),
        ("emb_hard_negatives", q_emb_hard_negatives),
        ("emb_outliers", q_emb_outliers),
        ("doc_ccnet_bucket", q_doc_ccnet_bucket),
        ("doc_source_kl", q_doc_source_kl),
        ("evt_winsorize", q_evt_winsorize),
        ("evt_top_users_per_type", q_evt_top_users_per_type),
        ("evt_user_first_last", q_evt_user_first_last),
        ("doc_dup_size_hist", q_doc_dup_size_hist),
        ("doc_ngram_novelty", q_doc_ngram_novelty),
        ("evt_user_pivot", q_evt_user_pivot),
        ("doc_lp_residual", q_doc_lp_residual),
        ("rel_q5", q_rel_q5),
        ("evt_cohort_retention", q_evt_cohort_retention),
        ("evt_transitions", q_evt_transitions),
        ("emb_diversity", q_emb_diversity),
        ("doc_curation_funnel", q_doc_curation_funnel),
        ("doc_data_card", q_doc_data_card),
        ("mm_png_meta", q_mm_png_meta),
        ("mm_jpeg_meta", q_mm_jpeg_meta),
        ("doc_sample_weighted", q_doc_sample_weighted),
        ("evt_user_ewma", q_evt_user_ewma),
        ("doc_source_overlap", q_doc_source_overlap),
        ("evt_regression", q_evt_regression),
        ("evt_user_interarrival", q_evt_user_interarrival),
        ("doc_feature_corr", q_doc_feature_corr),
        ("doc_pmi", q_doc_pmi),
        ("evt_burst", q_evt_burst),
        ("evt_user_streak", q_evt_user_streak),
        ("evt_user_entropy", q_evt_user_entropy),
        ("evt_type_lift", q_evt_type_lift),
        ("evt_value_tdigest_by_type", q_evt_value_tdigest_by_type),
    ]:
        # min over at least 3 repeats: single-shot op timings on this box
        # swing ±50%+ (session worker-pool state; measured 4.7–10.1s for
        # the SAME minhash job in one warm session — the r2→r3
        # "regression" on this op was exactly this noise band)
        op_runs = []
        for _ in range(max(n_runs, 3)):
            t0 = time.perf_counter()
            res = fn(SF_DIR)
            if hasattr(res, "to_pandas") and not isinstance(
                res, __import__("pyarrow").Table
            ):
                res.to_pandas()  # consume lazily-built Datasets
            op_runs.append(round(time.perf_counter() - t0, 3))
        queries[name] = min(op_runs)

    print(
        json.dumps(
            {
                "metric": "parse→enrich→route→aggregate throughput",
                "value": round(headline, 3),
                "unit": "sec",
                "queries": queries,
                "sf": os.path.basename(os.path.normpath(SF_DIR)),
                "num_cpus": NUM_CPUS,
                "turns": int(turns),
                "turns_per_sec": round(turns / headline, 1),
                "heap_turns": int(heap_turns),
                "heap_turns_per_sec": round(heap_turns / heap_sec, 1),
                "replicate": REPLICATE,
                "host_fingerprint": host_fp,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling_main()
    else:
        main()
