"""Distributed PCA over the embedding corpus — the mergeable-moments
linear-algebra operator shape (the dimensionality-reduction stage of an
embedding-curation pipeline: reduce → cluster / index / visualize).

Scale contract (what must hold at 10^12 rows):
- The corpus NEVER reaches the driver.  The fit is ONE streaming
  ``map_batches`` pass emitting a single tiny partial row per batch:
  (n, Σx as packed float64 bytes, ΣxᵀX as packed d×d float64 bytes).
  Partials merge associatively under ``groupby(k).map_groups`` (one
  group of #batches rows, each d²×8 bytes — for d=64 that is 32 KiB per
  partial, independent of corpus size), so the driver receives exactly
  one (n, Σx, ΣXᵀX) triple.
- The d×d eigendecomposition runs on the driver (microseconds for
  d ≤ 4096) — the only non-distributed step, on state whose size is
  data-independent.
- Projection is a second streaming pass against the broadcast
  (mean, components) — no shuffle at all.

Eigenvectors are sign-normalized (the element of largest magnitude is
made positive, earliest index winning ties) so the output is
deterministic across runs/backends.  Eigendecomposition is not
SQL-expressible → registered rows-only; pytest asserts near-exact
agreement of components/projections with an in-memory numpy twin at
sf0.001 and that explained-variance ratios are sorted and sum ≤ 1.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

PCA_COMPONENTS = 2


def _embedding_matrix(t: pa.Table) -> np.ndarray:
    return np.vstack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)


def pca_fit(ds: rd.Dataset, dim: int, to_matrix=_embedding_matrix):
    """One-pass distributed moment accumulation + driver-side eigh.

    Returns ``(mean, components, explained_ratio)`` where ``components``
    is (dim, dim) with columns ordered by descending eigenvalue and
    sign-normalized, and ``explained_ratio`` the per-component fraction
    of total variance.
    """

    def partial(t: pa.Table) -> pa.Table:
        V = to_matrix(t)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n": pa.array([len(V)], type=pa.int64()),
                "xsum": pa.array([V.sum(axis=0).tobytes()], type=pa.binary()),
                "xtx": pa.array([(V.T @ V).tobytes()], type=pa.binary()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        s = np.zeros(dim)
        M = np.zeros((dim, dim))
        for b in g["xsum"].to_pylist():
            s += np.frombuffer(b, dtype=np.float64)
        for b in g["xtx"].to_pylist():
            M += np.frombuffer(b, dtype=np.float64).reshape(dim, dim)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n": pa.array([n], type=pa.int64()),
                "xsum": pa.array([s.tobytes()], type=pa.binary()),
                "xtx": pa.array([M.tobytes()], type=pa.binary()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("k")
        .map_groups(merge, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(merged["n"][0])
    s = np.frombuffer(merged["xsum"][0], dtype=np.float64)
    M = np.frombuffer(merged["xtx"][0], dtype=np.float64).reshape(dim, dim)
    mean = s / n
    # covariance from raw moments: (ΣXᵀX − n·mean·meanᵀ) / (n−1)
    cov = (M - n * np.outer(mean, mean)) / max(n - 1, 1)
    w, V = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    # deterministic sign: largest-|.| element of each column positive
    flip = np.sign(V[np.argmax(np.abs(V), axis=0), np.arange(dim)])
    flip[flip == 0] = 1.0
    V = V * flip[None, :]
    total = w.sum()
    ratio = w / total if total > 0 else w
    return mean, V, ratio


def pca_project(
    ds: rd.Dataset, mean: np.ndarray, components: np.ndarray, k: int,
    id_col: str = "vec_id", to_matrix=_embedding_matrix,
) -> rd.Dataset:
    """Streaming projection onto the top-k components (broadcast once)."""
    ref = ray.put((mean, np.ascontiguousarray(components[:, :k])))

    def project(t: pa.Table, _ref=ref) -> pa.Table:
        m, W = ray.get(_ref)
        P = (to_matrix(t) - m) @ W
        cols = {id_col: t[id_col]}
        for j in range(k):
            cols[f"pc{j + 1}"] = pa.array(P[:, j], type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def q_emb_pca(sf_dir: str, k: int = PCA_COMPONENTS):
    """Top-k PCA projection of every embedding: (vec_id, pc1..pck)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    fit_ds = rd.read_parquet(src, columns=["embedding"])
    import pyarrow.parquet as pq

    # dim from the first row of the first row group (a bounded read)
    first = pq.ParquetFile(src).read_row_group(0, columns=["embedding"])
    dim = len(first["embedding"][0])
    mean, V, _ = pca_fit(fit_ds, dim)
    proj_ds = rd.read_parquet(src, columns=["vec_id", "embedding"])
    return pca_project(proj_ds, mean, V, k)


LINALG_QUERIES = {
    "emb_pca": q_emb_pca,
}

# eigendecomposition is not SQL-expressible — rows-only (pytest twin
# asserts numeric agreement with an in-memory numpy PCA)
LINALG_ORACLES: dict[str, str] = {}


# ----------------------------------------------------- label centroids
# Per-class mean embedding — the prototype/centroid extraction stage of
# an embedding-curation pipeline (class prototypes for nearest-centroid
# labeling, drift monitoring, SemDeDup-style seeding).  Same mergeable-
# moments shape as the PCA fit: each batch emits ONE tiny partial row
# per label present (label, n, Σvec packed as float64 bytes), partials
# merge associatively under a label-keyed groupby, and only k·d floats
# ever move through the shuffle — the corpus itself never reaches the
# driver and is read exactly once.  Output is long-format
# (label, dim, centroid, n) so the DuckDB unnest/avg oracle hashes it.


def q_emb_label_centroids(sf_dir: str):
    def partial(t: pa.Table) -> pa.Table:
        V = _embedding_matrix(t)
        labels = t["label"].to_numpy().astype(np.int64)
        order = np.argsort(labels, kind="stable")
        sl, Vs = labels[order], V[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sl)) + 1))
        sums = np.add.reduceat(Vs, starts, axis=0)
        ns = np.diff(np.append(starts, len(sl)))
        return pa.table(
            {
                "label": pa.array(sl[starts], type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
                "vsum": pa.array([r.tobytes() for r in sums], type=pa.binary()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        n = int(pc.sum(g["n"]).as_py())
        s = None
        for b in g["vsum"].to_pylist():
            v = np.frombuffer(b, dtype=np.float64)
            s = v.copy() if s is None else s + v
        d = len(s)
        label = g["label"][0].as_py()
        return pa.table(
            {
                "label": pa.array([label] * d, type=pa.int64()),
                "dim": pa.array(np.arange(1, d + 1), type=pa.int64()),
                "centroid": pa.array(s / n, type=pa.float64()),
                "n": pa.array([n] * d, type=pa.int64()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding", "label"]
    )
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(merge, batch_format="pyarrow")
    )


LINALG_QUERIES["emb_label_centroids"] = q_emb_label_centroids

LINALG_ORACLES["emb_label_centroids"] = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, unnest(embedding) AS v,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM embeddings
)
SELECT label, dim, avg(CAST(v AS DOUBLE)) AS centroid,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
"""


# ------------------------------------------------- nearest-centroid label
# Composes the centroid stage with a broadcast argmin pass: fit per-label
# prototypes (mergeable moments, k·d floats on the driver), ``ray.put``
# them ONCE, then one streaming pass assigns every vector the label of
# its nearest centroid.  No shuffle of the corpus — the only exchange is
# the k·d-float partials.  The per-batch kernel keeps the naive
# (v−c)² sum (batch×k×d temporaries) because it rounds identically to
# the oracle's per-dim sum; for k·d large enough to matter, switch to
# the |v|²−2vC+|c|² matmul expansion (documented fp drift ~1e-15).


def q_emb_nearest_centroid(sf_dir: str):
    cen = q_emb_label_centroids(sf_dir).to_pandas()
    piv = cen.pivot(index="label", columns="dim", values="centroid").sort_index()
    labels = piv.index.to_numpy(dtype=np.int64)  # ascending → argmin tie = min label
    C = piv.to_numpy(dtype=np.float64)
    ref = ray.put((labels, C))

    def assign(t: pa.Table, _ref=ref) -> pa.Table:
        lb, M = ray.get(_ref)
        V = _embedding_matrix(t)
        D2 = ((V[:, None, :] - M[None, :, :]) ** 2).sum(axis=2)
        j = D2.argmin(axis=1)
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "pred_label": pa.array(lb[j], type=pa.int64()),
                "dist2": pa.array(D2[np.arange(len(j)), j], type=pa.float64()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return ds.map_batches(assign, batch_format="pyarrow")


LINALG_QUERIES["emb_nearest_centroid"] = q_emb_nearest_centroid

LINALG_ORACLES["emb_nearest_centroid"] = """
WITH e AS (
  SELECT CAST(label AS BIGINT) AS label, unnest(embedding) AS v,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim, vec_id
  FROM embeddings
), c AS (
  SELECT label, dim, avg(CAST(v AS DOUBLE)) AS c FROM e GROUP BY 1, 2
), d AS (
  SELECT e.vec_id, c.label,
         sum((CAST(e.v AS DOUBLE) - c.c) * (CAST(e.v AS DOUBLE) - c.c)) AS d2
  FROM e JOIN c USING (dim) GROUP BY 1, 2
), r AS (
  SELECT vec_id, label, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
  FROM d
)
SELECT vec_id, label AS pred_label, d2 AS dist2 FROM r WHERE rn = 1
"""


# ------------------------------------------------- per-dim standardization
# Feature z-scoring of the embedding corpus — two streaming passes: one
# mergeable raw-moments pass (d floats of state: n, Σx, Σx² per dim),
# driver-side mean/σ (population, raw-moments formula — the oracle spells
# out sqrt(avg(v²)−avg(v)²) so both engines round the same way), then a
# broadcast (μ, σ) streaming transform.  Long-format output so the
# unnest oracle hashes it.


def q_emb_standardize(sf_dir: str):
    def partial(t: pa.Table) -> pa.Table:
        V = _embedding_matrix(t)
        return pa.table(
            {
                "k": pa.array([0], type=pa.int64()),
                "n": pa.array([len(V)], type=pa.int64()),
                "s1": pa.array([V.sum(axis=0).tobytes()], type=pa.binary()),
                "s2": pa.array([(V * V).sum(axis=0).tobytes()], type=pa.binary()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    parts = (
        ds.map_batches(
            lambda t: partial(t.select(["embedding"]).combine_chunks()),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    n = int(parts["n"].sum())
    s1 = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s1"]], axis=0)
    s2 = np.sum([np.frombuffer(b, dtype=np.float64) for b in parts["s2"]], axis=0)
    mu = s1 / n
    sd = np.sqrt(s2 / n - mu * mu)  # population σ via raw moments (≡ oracle)
    ref = ray.put((mu, sd))

    def zscore(t: pa.Table, _ref=ref) -> pa.Table:
        m, s = ray.get(_ref)
        V = _embedding_matrix(t)
        Z = (V - m) / s
        d = Z.shape[1]
        ids = np.asarray(t["vec_id"], dtype=np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d), type=pa.int64()),
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), len(ids)),
                    type=pa.int64(),
                ),
                "z": pa.array(Z.ravel(), type=pa.float64()),
            }
        )

    return ds.map_batches(zscore, batch_format="pyarrow")


LINALG_QUERIES["emb_standardize"] = q_emb_standardize

LINALG_ORACLES["emb_standardize"] = """
WITH e AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM embeddings
), m AS (
  SELECT dim, sum(v) / count(*) AS mu,
         sqrt(sum(v * v) / count(*) - (sum(v) / count(*)) * (sum(v) / count(*))) AS sd
  FROM e GROUP BY 1
)
SELECT e.vec_id, e.dim, (e.v - m.mu) / m.sd AS z
FROM e JOIN m USING (dim)
"""


# --------------------------------------------------- embedding outliers
# Embedding-space outlier gate (the curation pass that drops broken /
# off-distribution vectors before dedup or training): a vector is an
# outlier when its squared distance to the GLOBAL corpus centroid
# exceeds μ + 3σ of the corpus's dist² distribution.  Three bounded
# stages: (1) ONE mergeable (n, Σv) moments pass → d-float centroid on
# the driver, broadcast once; (2) one streaming pass materializes dist²
# (a single float per vector — the reuse point for both consumers);
# (3) a tiny raw-moments aggregate over dist² (σ spelled as
# sqrt(avg(x²)−avg(x)²) exactly like the oracle) and a broadcast-
# threshold flag pass.  Nothing corpus-sized ever reaches the driver.


def q_emb_outliers(sf_dir: str):
    """(vec_id, dist2, is_outlier) — centroid-distance 3σ outlier flags."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )

    def moments(t: pa.Table) -> pa.Table:
        V = _embedding_matrix(t)
        return pa.table(
            {
                "n": pa.array([len(V)], type=pa.int64()),
                "vsum": pa.array([V.sum(axis=0).tobytes()], type=pa.binary()),
            }
        )

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        return pa.table(
            {"vec_id": pa.array([], type=pa.int64()),
             "dist2": pa.array([], type=pa.float64()),
             "is_outlier": pa.array([], type=pa.bool_())}
        )
    c = np.sum(
        [np.frombuffer(b, dtype=np.float64) for b in parts["vsum"]], axis=0
    ) / n

    import ray

    cref = ray.put(c)

    def dist2(t: pa.Table, r) -> pa.Table:
        c = ray.get(r) if not isinstance(r, np.ndarray) else r
        V = _embedding_matrix(t)
        d2 = ((V - c) ** 2).sum(axis=1)
        return pa.table(
            {
                "vec_id": pc.cast(t["vec_id"], pa.int64()),
                "dist2": pa.array(d2, type=pa.float64()),
            }
        )

    scored = ds.map_batches(
        dist2, fn_args=(cref,), batch_format="pyarrow"
    ).materialize()  # one float per vector; both consumers read this

    from ray.data.aggregate import Count, Sum

    def d2_moments(t: pa.Table) -> pa.Table:
        d2 = t["dist2"].to_numpy()
        return pa.table(
            {
                "n": pa.array([len(d2)], type=pa.int64()),
                "s1": pa.array([float(d2.sum())], type=pa.float64()),
                "s2": pa.array([float((d2 * d2).sum())], type=pa.float64()),
            }
        )

    mp = scored.map_batches(d2_moments, batch_format="pyarrow").to_pandas()
    mu = float(mp["s1"].sum()) / n
    sigma = float(np.sqrt(float(mp["s2"].sum()) / n - mu * mu))
    thresh = mu + 3.0 * sigma

    def flag(t: pa.Table) -> pa.Table:
        d2 = t["dist2"].to_numpy()
        return t.append_column("is_outlier", pa.array(d2 > thresh, type=pa.bool_()))

    return scored.map_batches(flag, batch_format="pyarrow")


LINALG_QUERIES["emb_outliers"] = q_emb_outliers

LINALG_ORACLES["emb_outliers"] = """
WITH e AS (
  SELECT vec_id, unnest(embedding) AS v,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM embeddings
), c AS (
  SELECT dim, avg(CAST(v AS DOUBLE)) AS c FROM e GROUP BY 1
), d AS (
  SELECT e.vec_id,
         sum((CAST(e.v AS DOUBLE) - c.c) * (CAST(e.v AS DOUBLE) - c.c)) AS dist2
  FROM e JOIN c USING (dim) GROUP BY 1
), m AS (
  SELECT avg(dist2) AS mu,
         sqrt(avg(dist2 * dist2) - avg(dist2) * avg(dist2)) AS sigma
  FROM d
)
SELECT vec_id, dist2, dist2 > mu + 3 * sigma AS is_outlier FROM d, m
"""


# ------------------------------------------------- corpus diversity scalar
# Mean pairwise squared L2 distance over all distinct vector pairs — the
# corpus-diversity number data-selection work tracks (collapsing
# diversity under aggressive dedup/filtering is the failure it guards
# against).  O(N²) pairs collapse to a CLOSED FORM of one-pass moments:
#   E‖x−y‖² over distinct pairs = 2·n/(n−1) · (E‖x‖² − ‖E x‖²)
# so the whole statistic ships d+1 floats per batch and never compares a
# pair.  The oracle spells the identical moment expression.


def q_emb_diversity(sf_dir: str):
    """(n, mean_pair_dist2): corpus size + mean pairwise squared distance."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )

    def moments(t: pa.Table) -> pa.Table:
        V = _embedding_matrix(t)
        return pa.table(
            {
                "n": pa.array([len(V)], type=pa.int64()),
                "vsum": pa.array([V.sum(axis=0).tobytes()], type=pa.binary()),
                "s2": pa.array([float((V * V).sum())], type=pa.float64()),
            }
        )

    mp = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(mp["n"].sum())
    if n < 2:
        return pa.table(
            {"n": pa.array([n], type=pa.int64()),
             "mean_pair_dist2": pa.array([None], type=pa.float64())}
        )
    s1 = np.sum([np.frombuffer(b, dtype=np.float64) for b in mp["vsum"]], axis=0)
    s2 = float(mp["s2"].sum())
    nf = float(n)
    # 2·n/(n−1)·(E‖x‖² − ‖Ex‖²), with the moment algebra spelled exactly
    # as the oracle: (s2/n − Σ(mean²)) scaled
    mean = s1 / nf
    val = 2.0 * nf / (nf - 1.0) * (s2 / nf - float((mean * mean).sum()))
    return pa.table(
        {
            "n": pa.array([n], type=pa.int64()),
            "mean_pair_dist2": pa.array([val], type=pa.float64()),
        }
    )


LINALG_QUERIES["emb_diversity"] = q_emb_diversity

LINALG_ORACLES["emb_diversity"] = """
WITH e AS (
  SELECT vec_id, unnest(embedding) AS v,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim
  FROM embeddings
), m AS (
  SELECT dim, avg(CAST(v AS DOUBLE)) AS mu,
         sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS s2d
  FROM e GROUP BY 1
), agg AS (
  SELECT sum(s2d) AS s2, sum(mu * mu) AS mm FROM m
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings
)
SELECT CAST(n AS BIGINT) AS n,
       2.0 * n / (n - 1.0) * (s2 / n - mm) AS mean_pair_dist2
FROM agg, nn
"""


# --------------------------------------------- grouped streaming OLS
# Per-group least-squares trend fit (value ~ time) — the drift-monitor /
# feature-trend operator of a telemetry pipeline ("is the error-event
# value creeping up over the month?").  Mirrors SQL's regr_slope /
# regr_intercept / regr_r2 aggregate family.
#
# Scale contract: ONE streaming pass; each batch emits a per-group
# moments row (n, Σx, Σy, Σxx, Σxy, Σyy) via bincount on the
# dictionary-encoded group codes — six float64 accumulators per group
# per batch, merged driver-side over the tiny (#groups × #batches)
# partial table.  Nothing corpus-sized is shuffled or collected; the
# grouped-regression state is data-size independent, the same
# mergeable-moments shape as PCA above.
#
# Numerics: x is epoch-microseconds RE-ORIGINED at 2024-01-01 (a fixed
# constant mirrored in the oracle) then scaled to seconds, so Σxx stays
# ~1e17 over sf0.01 and the Sxx = Σxx − (Σx)²/n cancellation costs ≤ 2
# digits of the 15 available — comfortably inside the 6-significant-digit
# driver hash.  NaN/NULL values are masked exactly like regr_*.

REGR_ORIGIN_US = 1_704_067_200_000_000  # TIMESTAMP '2024-01-01' in epoch µs


def q_evt_regression(sf_dir: str):
    """(event_type, n, slope, intercept, r2): per-type OLS of value on
    event time (seconds since 2024-01-01)."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        x = (
            t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            - REGR_ORIGIN_US
        ).astype(np.float64) / 1e6
        y = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(y) & ~np.isnan(x)
        c, x, y = codes[ok], x[ok], y[ok]
        return pa.table(
            {
                "event_type": enc.dictionary,
                "n": pa.array(np.bincount(c, minlength=k), type=pa.int64()),
                "sx": pa.array(np.bincount(c, weights=x, minlength=k)),
                "sy": pa.array(np.bincount(c, weights=y, minlength=k)),
                "sxx": pa.array(np.bincount(c, weights=x * x, minlength=k)),
                "sxy": pa.array(np.bincount(c, weights=x * y, minlength=k)),
                "syy": pa.array(np.bincount(c, weights=y * y, minlength=k)),
            }
        )

    mp = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = mp.groupby("event_type", sort=True).sum()
    n = agg["n"].to_numpy().astype(np.float64)
    sxx = agg["sxx"].to_numpy() - agg["sx"].to_numpy() ** 2 / n
    syy = agg["syy"].to_numpy() - agg["sy"].to_numpy() ** 2 / n
    sxy = agg["sxy"].to_numpy() - agg["sx"].to_numpy() * agg["sy"].to_numpy() / n
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = sxy / sxx
        intercept = agg["sy"].to_numpy() / n - slope * agg["sx"].to_numpy() / n
        r2 = (sxy * sxy) / (sxx * syy)
    return pa.table(
        {
            "event_type": pa.array(agg.index.to_numpy(), type=pa.string()),
            "n": pa.array(agg["n"].to_numpy(), type=pa.int64()),
            "slope": pa.array(slope, type=pa.float64()),
            "intercept": pa.array(intercept, type=pa.float64()),
            "r2": pa.array(r2, type=pa.float64()),
        }
    )


LINALG_QUERIES["evt_regression"] = q_evt_regression

LINALG_ORACLES["evt_regression"] = """
WITH f AS (
  SELECT event_type, value,
         CAST(date_diff('microsecond', TIMESTAMP '2024-01-01', ts) AS DOUBLE)
           / 1000000.0 AS x
  FROM events
)
SELECT event_type,
       CAST(regr_count(value, x) AS BIGINT) AS n,
       regr_slope(value, x) AS slope,
       regr_intercept(value, x) AS intercept,
       regr_r2(value, x) AS r2
FROM f GROUP BY 1
"""
