"""Distributed quality-classifier training + scoring — the
fastText/CCNet model-based quality-filter family (Joulin et al. 2017;
Wenzek et al. 2020 §4.3 use a linear classifier over cheap text
features to score documents; GPT-3/The Pile filter on such scores).
Here the model is logistic regression fit by Newton-IRLS with
MERGEABLE sufficient statistics — the same scale shape as the
distributed PCA (ops/linalg.py):

- ONE streaming pass extracts the (tiny, d-dimensional) feature rows
  from the corpus; only this feature dataset — d float64s per doc —
  is materialized for the iterations, never the text.
- Each IRLS iteration is one ``map_batches`` pass over the feature
  dataset emitting per-batch partials (XᵀWX as d² floats, the
  penalized gradient as d floats); partials merge associatively under
  one ``groupby(k).map_groups``, so the driver receives a single
  (d², d) pair per iteration and solves the d×d Newton system —
  driver state is data-independent.
- Scoring is a final streaming pass against the broadcast weights.

The label is the corpus's own language tag (lang == 'en'), mirroring
how CCNet bootstraps its quality model from an existing corpus signal
rather than human labels.  L2 (ridge) regularization keeps the Newton
step bounded under perfect separation.  Iterative optimization is not
SQL-expressible → registered rows-only; pytest asserts near-exact
agreement of weights and scores with an in-memory numpy twin running
the identical arithmetic, plus determinism across runs.

Reference-semantics analogue: gclog-parser trains nothing (SURVEY.md
§2.6) — beyond-parity LLM-data layer.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

FEAT_DIM = 5       # bias, log1p(n_tokens), mean_word_chars, distinct_ratio, alpha_ratio
IRLS_ITERS = 8
RIDGE = 1e-3       # L2 penalty: bounds weights under perfect separation


def _feature_table(t: pa.Table) -> pa.Table:
    """(doc_id, y, f0..f4) for one batch of documents — all Arrow/numpy
    kernels over the flat token buffer (rep_counts does the one sort)."""
    from .text import rep_counts

    text = t["text"]
    n, n_distinct, _top = rep_counts(text)
    n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(
        zero_copy_only=False
    ).astype(np.float64)
    n_alpha = pc.cast(
        pc.count_substring_regex(text, "[A-Za-z]"), pa.int64()
    ).to_numpy(zero_copy_only=False).astype(np.float64)
    nf = n.astype(np.float64)
    toks = nf  # every doc has ≥1 whitespace token (empty text → [''])
    X = np.empty((len(t), FEAT_DIM), dtype=np.float64)
    X[:, 0] = 1.0
    X[:, 1] = np.log1p(nf)
    X[:, 2] = (n_chars - (nf - 1.0)) / toks   # mean chars per token
    X[:, 3] = n_distinct.astype(np.float64) / toks
    X[:, 4] = np.divide(n_alpha, n_chars, out=np.zeros_like(n_alpha),
                        where=n_chars > 0)
    y = pc.equal(t["lang"], "en").to_numpy(zero_copy_only=False)
    cols = {
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "y": pa.array(y.astype(np.float64)),
    }
    for j in range(FEAT_DIM):
        cols[f"f{j}"] = pa.array(X[:, j])
    return pa.table(cols)


def _feat_matrix(t: pa.Table):
    X = np.column_stack(
        [t[f"f{j}"].to_numpy(zero_copy_only=False) for j in range(FEAT_DIM)]
    )
    return X, t["y"].to_numpy(zero_copy_only=False)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically symmetric form: identical arithmetic in twin and tasks
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def irls_step_partials(w: np.ndarray, X: np.ndarray, y: np.ndarray):
    """Per-batch sufficient statistics of one Newton step (pre-penalty):
    (XᵀWX, Xᵀ(y − p)) for p = σ(Xw), W = diag(p(1−p))."""
    p = _sigmoid(X @ w)
    wt = p * (1.0 - p)
    H = (X * wt[:, None]).T @ X
    g = X.T @ (y - p)
    return H, g


def logreg_fit(feats: rd.Dataset, iters: int = IRLS_ITERS,
               ridge: float = RIDGE) -> np.ndarray:
    """Newton-IRLS over a feature Dataset: per-iteration one partials
    pass + one #batches-row merge; the d×d solve runs on the driver."""
    w = np.zeros(FEAT_DIM, dtype=np.float64)
    eye = np.eye(FEAT_DIM)
    for _ in range(iters):
        w_ref = ray.put(w)

        def partial(t: pa.Table, _w=w_ref) -> pa.Table:
            if len(t) == 0:  # empty block: pc.min below would yield null
                return pa.schema(
                    [("k", pa.int64()), ("b", pa.int64()),
                     ("h", pa.binary()), ("g", pa.binary())]
                ).empty_table()
            X, y = _feat_matrix(t)
            H, g = irls_step_partials(ray.get(_w), X, y)
            bmin = int(pc.min(t["doc_id"]).as_py())  # deterministic merge key
            return pa.table(
                {
                    "k": pa.array([0], type=pa.int64()),
                    "b": pa.array([bmin], type=pa.int64()),
                    "h": pa.array([H.tobytes()], type=pa.binary()),
                    "g": pa.array([g.tobytes()], type=pa.binary()),
                }
            )

        def merge(g: pa.Table) -> pa.Table:
            # accumulate in ascending batch-key order: partial ARRIVAL
            # order varies run to run, and float sums are not associative
            # — the sort makes the fitted weights bit-stable across runs
            order = np.argsort(g["b"].to_numpy(zero_copy_only=False),
                               kind="stable")
            hb, gb = g["h"].to_pylist(), g["g"].to_pylist()
            H = np.zeros((FEAT_DIM, FEAT_DIM))
            G = np.zeros(FEAT_DIM)
            for i in order:
                H += np.frombuffer(hb[i], dtype=np.float64).reshape(
                    FEAT_DIM, FEAT_DIM
                )
                G += np.frombuffer(gb[i], dtype=np.float64)
            return pa.table(
                {
                    "k": pa.array([0], type=pa.int64()),
                    "h": pa.array([H.tobytes()], type=pa.binary()),
                    "g": pa.array([G.tobytes()], type=pa.binary()),
                }
            )

        merged = (
            feats.map_batches(partial, batch_format="pyarrow")
            .groupby("k")
            .map_groups(merge, batch_format="pyarrow")
            .to_pandas()
        )
        H = np.frombuffer(merged["h"][0], dtype=np.float64).reshape(
            FEAT_DIM, FEAT_DIM
        )
        G = np.frombuffer(merged["g"][0], dtype=np.float64)
        # penalized Newton step: (H + λI) Δ = g − λw
        w = w + np.linalg.solve(H + ridge * eye, G - ridge * w)
    return w


def logreg_fit_serial(X: np.ndarray, y: np.ndarray, iters: int = IRLS_ITERS,
                      ridge: float = RIDGE) -> np.ndarray:
    """In-memory twin of :func:`logreg_fit` — identical arithmetic when
    the whole corpus is one batch (associative float sums reorder under
    multiple batches, so the pytest twin compares to tight tolerance)."""
    w = np.zeros(FEAT_DIM, dtype=np.float64)
    eye = np.eye(FEAT_DIM)
    for _ in range(iters):
        H, g = irls_step_partials(w, X, y)
        w = w + np.linalg.solve(H + ridge * eye, g - ridge * w)
    return w


def q_doc_quality_classifier(sf_dir: str):
    """(doc_id, label, quality_score): every document scored by the
    corpus-trained logistic quality model (score = P(label) under the
    fitted weights; label is the training signal lang == 'en')."""
    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    # the tiny feature rows are the reused intermediate — pin THEM, not
    # the corpus (one corpus pass total regardless of iteration count)
    feats = docs.map_batches(_feature_table, batch_format="pyarrow").materialize()
    w = logreg_fit(feats)
    w_ref = ray.put(w)

    def score(t: pa.Table, _w=w_ref) -> pa.Table:
        X, y = _feat_matrix(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "label": pa.array(y > 0.5),
                "quality_score": pa.array(_sigmoid(X @ ray.get(_w))),
            }
        )

    return feats.map_batches(score, batch_format="pyarrow")


CLASSIFIER_QUERIES = {
    "doc_quality_classifier": q_doc_quality_classifier,
}

# iterative Newton optimization is not SQL-expressible — rows-only
# (pytest twin asserts weight/score agreement with the serial fit)
CLASSIFIER_ORACLES: dict[str, str] = {}
