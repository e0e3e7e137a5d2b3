"""Distinct-count operators over the ``events`` stream: exact (two-level
distributed dedup) and a HyperLogLog sketch — the mergeable-sketch shape
for 100 TB cardinality estimation.

HLL is the canonical distributed sketch: per-batch register arrays merge
by element-wise MAX, which is associative/commutative/idempotent — so
the combine tree can have any shape and re-execution is safe.  Registers
travel as one fixed 4096-byte payload per (batch, group), NOT as 4096
rows, so the shuffle moves a few KB per batch regardless of input size.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

HLL_P = 12                      # 2^12 = 4096 registers; rel. error ≈ 1.04/√m ≈ 1.6%
HLL_M = 1 << HLL_P


def q_evt_distinct_users(sf_dir: str):
    """Exact distinct users per event_type: in-batch pair dedup (combiner)
    → bucketed global pair dedup → per-type count.  Shuffle volume is
    O(distinct pairs), never O(events), and the global dedup groups by a
    64-way user-hash bucket (one lexsort per group) rather than by the
    pair itself — a pair-keyed groupby's group count equals the distinct
    user count, the millions-of-single-row-groups shape measured slow in
    dedup._pair_group_counts."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )

    def pair_dedup(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        u = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (u.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        return g.append_column("bucket", pa.array(b.astype(np.int64)))

    def to_partial(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema(
                [("event_type", pa.string()), ("np_", pa.int64())]
            ).empty_table()
        et = g["event_type"]
        et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        u = g["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((u, codes))
        c, uu = codes[order], u[order]
        first = np.empty(len(c), dtype=bool)
        first[:1] = True
        first[1:] = (c[1:] != c[:-1]) | (uu[1:] != uu[:-1])
        n = np.bincount(c[first], minlength=len(enc.dictionary))
        return pa.table(
            {
                "event_type": enc.dictionary,
                "np_": pa.array(n, type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(pair_dedup, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(to_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("np_", alias_name="n"))
        .to_pandas()
    )
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            "n": pa.array(out["n"], type=pa.int64()),
        }
    )


def _hll_ranks(uids: np.ndarray) -> tuple:
    """(register index, rank) per value — splitmix64-style avalanche so
    sequential ids fill registers uniformly."""
    h = uids.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (h + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(31)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(27)
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        w = h << np.uint64(HLL_P)  # remaining 52 bits at the top
    # rank = leading zeros of w (within 64 bits) + 1, capped for w == 0
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    # float64 exponent ≈ bit_length (off-by-one possible at 2^k boundaries
    # beyond 53 bits — a deterministic, sub-percent perturbation of an
    # approximate sketch)
    bl[nz] = np.frexp(w[nz].astype(np.float64))[1]
    rank = np.where(nz, 64 - bl + 1, 64 - HLL_P + 1).astype(np.uint8)
    return idx, rank


def q_evt_distinct_users_hll(sf_dir: str):
    """Approximate distinct users per event_type via HyperLogLog(p=12):
    per-batch registers packed as one 4096-byte payload per group, merged
    by a tiny per-type max-reduce.  Implementation-defined values →
    rows-only driver check; accuracy vs the exact twin asserted in
    pytest."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )

    def partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uid = t["user_id"].to_numpy()
        order = np.argsort(et, kind="stable")
        et, uid = et[order], uid[order]
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        ends = np.r_[starts[1:], len(et)]
        types, payloads = [], []
        for s, e in zip(starts, ends):
            idx, rank = _hll_ranks(uid[s:e])
            regs = np.zeros(HLL_M, dtype=np.uint8)
            np.maximum.at(regs, idx, rank)
            types.append(et[s])
            payloads.append(regs.tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, type=pa.string()),
                "regs": pa.array(payloads, type=pa.binary()),
            }
        )

    def merge_estimate(g: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, dtype=np.uint8)
        for b in g["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
        m = float(HLL_M)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros > 0:  # small-range linear counting
            est = m * np.log(m / zeros)
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()], type=pa.string()),
                "n_approx": pa.array([int(round(est))], type=pa.int64()),
            }
        )

    # final merge: one group per event_type (tiny cardinality — per-group
    # map_groups machinery is fine here, unlike per-user keys)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge_estimate, batch_format="pyarrow")
    )


# --------------------------------------------- count-min heavy hitters

CMS_D = 4               # hash rows; P(overestimate > εN) ≤ e^-D per query
CMS_W = 1 << 14         # counters per row; ε ≈ e / W
CMS_MERGE_BUCKETS = 16  # first-level sketch-merge fan-in
CMS_LOCAL_M = 200       # per-batch candidate terms


def _cms_rows(h: np.ndarray) -> list[np.ndarray]:
    """CMS_D column indices per key via double hashing."""
    h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
    return [((h + np.uint64(i) * h2) % np.uint64(CMS_W)) for i in range(CMS_D)]


def q_doc_top_terms_cms(sf_dir: str, k: int = 50):
    """Heavy-hitter terms via a count-min sketch — the mergeable-sketch
    path for vocabularies too large to aggregate exactly (the exact twin
    is ``doc_top_terms``).  Per-batch: one (CMS_D × CMS_W) uint64 counter
    block (fixed 512 KB regardless of vocabulary) + the batch's local
    top-M candidate terms.  Sketches merge by elementwise SUM through a
    16-way tree (never a driver collect of O(batches) payloads at once —
    the first level reduces in the distributed plane); candidates union
    through a bucketed distinct.  Final: the merged sketch is broadcast
    once and every candidate's count estimated vectorized; top-k by
    (estimate desc, term asc).  Estimates are implementation-defined →
    rows-only driver check; pytest asserts the CMS guarantee (never
    underestimates) and top-k agreement with the exact twin."""
    from .hashing import word_hashes

    import ray

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def sketch_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        vc = flat.value_counts()
        vc = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
        terms = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = word_hashes(terms)
        regs = np.zeros((CMS_D, CMS_W), dtype=np.uint64)
        for i, cols in enumerate(_cms_rows(h)):
            np.add.at(regs[i], cols, counts)
        bucket = int(h[0] % CMS_MERGE_BUCKETS) if len(h) else 0
        return pa.table(
            {
                "bucket": pa.array([bucket], type=pa.int64()),
                "regs": pa.array([regs.tobytes()], type=pa.binary()),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        acc = np.zeros(CMS_D * CMS_W, dtype=np.uint64)
        for b in g["regs"].to_pylist():
            acc += np.frombuffer(b, dtype=np.uint64)
        return pa.table(
            {
                "bucket": pa.array([0], type=pa.int64()),
                "regs": pa.array([acc.tobytes()], type=pa.binary()),
            }
        )

    level1 = (
        docs.map_batches(sketch_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()  # ≤ CMS_MERGE_BUCKETS fixed-size rows
    )
    cms = np.zeros(CMS_D * CMS_W, dtype=np.uint64)
    for row in level1:
        cms += np.frombuffer(row["regs"], dtype=np.uint64)
    cms = cms.reshape(CMS_D, CMS_W)
    cms_ref = ray.put(cms)

    def cand_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(pc.split_pattern(t["text"], " "))
        vc = flat.value_counts()
        vc = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
        terms = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        top = np.argsort(-counts, kind="stable")[:CMS_LOCAL_M]
        kept = terms.take(pa.array(top.astype(np.int64)))
        b = (word_hashes(kept) % np.uint64(64)).astype(np.int64)
        return pa.table({"term": kept, "bucket": pa.array(b, type=pa.int64())})

    def estimate(g: pa.Table) -> pa.Table:
        empty = pa.schema([("term", pa.string()), ("n_est", pa.int64())]).empty_table()
        if len(g) == 0:
            return empty
        terms = g["term"]
        terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        uniq = terms.dictionary_encode().dictionary
        h = word_hashes(uniq)
        C = ray.get(cms_ref)
        est = np.min(
            np.stack([C[i][cols] for i, cols in enumerate(_cms_rows(h))]), axis=0
        )
        return pa.table(
            {"term": uniq, "n_est": pa.array(est.astype(np.int64), type=pa.int64())}
        )

    return (
        docs.map_batches(cand_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(estimate, batch_format="pyarrow")
        .sort(["n_est", "term"], descending=[True, False])
        .limit(k)
    )


SKETCH_QUERIES = {
    "evt_distinct_users": q_evt_distinct_users,
    "evt_distinct_users_hll": q_evt_distinct_users_hll,
    "doc_top_terms_cms": q_doc_top_terms_cms,
}

SKETCH_ORACLES = {
    "evt_distinct_users": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n
FROM events GROUP BY 1
""",
    # evt_distinct_users_hll: approximate → rows-only
}


# ---------------------------------------------------------------------------
# t-digest: the mergeable QUANTILE sketch, completing the sketch family
# (cardinality = HLL, frequency = count-min, quantiles = t-digest).
#
# Construction is the one-pass "merging digest" form: sort by value,
# take each point's midpoint cumulative quantile q, bucket by the k1
# scale function k(q) = δ/2π·asin(2q−1) (bucket density ∝ 1/(q(1−q)),
# so tails get fine centroids and the middle coarse ones), then a
# bincount mean per bucket — fully vectorized, deterministic, no
# per-row Python.  Centroid sets merge by concat + re-compress, which
# is associative enough for any combine-tree shape; payloads travel as
# two packed float64 buffers (≤ δ centroids ≈ 3 KB) per (batch, lane).
# The reduce is two-level like the CMS merge: 16 content-hash lanes
# compress in parallel, then one final compress — driver traffic is
# O(δ) floats regardless of input size.
#
# Approximate by nature → rows-only; pytest bounds the rank error vs
# the exact distributed percentiles on the same column.
# ---------------------------------------------------------------------------

TDIGEST_DELTA = 200
TDIGEST_LANES = 16
TDIGEST_QS = (0.5, 0.95, 0.99)


def _td_compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Re-compress a centroid multiset to ≤ ~δ centroids (vectorized)."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    m = means[order]
    w = weights[order].astype(np.float64)
    total = w.sum()
    q = (np.cumsum(w) - w / 2.0) / total
    k = np.floor(delta / (2 * np.pi) * np.arcsin(2.0 * q - 1.0)).astype(np.int64)
    _, inv = np.unique(k, return_inverse=True)
    wsum = np.bincount(inv, weights=w)
    msum = np.bincount(inv, weights=m * w)
    return msum / wsum, wsum


def _td_quantile(means: np.ndarray, weights: np.ndarray, qs) -> np.ndarray:
    """Interpolated quantiles from a sorted centroid set."""
    cw = np.cumsum(weights) - weights / 2.0
    t = np.asarray(qs, dtype=np.float64) * weights.sum()
    return np.interp(t, cw, means)


def _td_pack(means: np.ndarray, weights: np.ndarray) -> pa.Table:
    mb, wb = means.tobytes(), weights.tobytes()
    # content-derived lane id keeps the first-level merge deterministic
    # without any runtime randomness
    import zlib

    lane = zlib.crc32(mb) % TDIGEST_LANES
    return pa.table(
        {
            "lane": pa.array([lane], type=pa.int64()),
            "means": pa.array([mb], type=pa.binary()),
            "weights": pa.array([wb], type=pa.binary()),
        }
    )


def _td_unpack_concat(g: pa.Table):
    ms = [np.frombuffer(b, dtype=np.float64) for b in g["means"].to_pylist()]
    ws = [np.frombuffer(b, dtype=np.float64) for b in g["weights"].to_pylist()]
    return np.concatenate(ms), np.concatenate(ws)


def tdigest_quantiles(
    ds: rd.Dataset, col: str, qs=TDIGEST_QS, delta: int = TDIGEST_DELTA
) -> "pa.Table":
    """Distributed t-digest over ``ds[col]``; returns (q, value) rows."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        m, w = _td_compress(v, np.ones(len(v)), delta)
        return _td_pack(m, w)

    def lane_merge(g: pa.Table) -> pa.Table:
        # one compressed digest per lane; the final (lane-count-sized)
        # merge happens driver-side below via to_arrow_refs + concat, so
        # the lane id carried out of here is irrelevant
        m, w = _td_unpack_concat(g)
        m, w = _td_compress(m, w, delta)
        return _td_pack(m, w)

    lanes = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lane")
        .map_groups(lane_merge, batch_format="pyarrow")
    )
    final = lanes.to_arrow_refs()
    import ray

    parts = [ray.get(r) for r in final]
    g = pa.concat_tables([p for p in parts if len(p)])
    m, w = _td_unpack_concat(g)
    m, w = _td_compress(m, w, delta)
    vals = _td_quantile(m, w, qs)
    return pa.table(
        {
            "q": pa.array(list(qs), type=pa.float64()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )


def q_evt_value_tdigest(sf_dir: str):
    """Approximate event-value quantiles via the mergeable t-digest."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["value"])
    return tdigest_quantiles(ds, "value")


SKETCH_QUERIES["evt_value_tdigest"] = q_evt_value_tdigest
# approximate → rows-only (pytest bounds rank error vs exact percentiles)


def grouped_tdigest_quantiles(
    ds: rd.Dataset,
    key: str,
    col: str,
    qs=TDIGEST_QS,
    delta: int = TDIGEST_DELTA,
):
    """Per-group distributed t-digest: one mergeable ≤δ-centroid digest
    per (group, batch), merged by a group-keyed groupby — so per-group
    state is data-size independent and the op scales to group
    cardinalities where the exact grouped-selection rounds
    (quantile.q_evt_value_percentiles_by_type) would thrash: the exact
    path's shared scans cost O(rounds) passes regardless of groups,
    while this is ONE pass + one tiny shuffle of δ-centroid payloads.
    Returns (key, q, value_approx) rows."""

    def partial(t: pa.Table) -> pa.Table:
        ks = t[key]
        ks = ks.combine_chunks() if isinstance(ks, pa.ChunkedArray) else ks
        enc = ks.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        codes, v = codes[ok], v[ok]
        order = np.argsort(codes, kind="stable")
        codes, v = codes[order], v[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        ends = np.r_[starts[1:], len(codes)]
        keys, mbs, wbs = [], [], []
        for s, e in zip(starts, ends):
            m, w = _td_compress(v[s:e], np.ones(e - s), delta)
            keys.append(enc.dictionary[codes[s]].as_py())
            mbs.append(m.tobytes())
            wbs.append(w.tobytes())
        return pa.table(
            {
                key: pa.array(keys, type=pa.string()),
                "means": pa.array(mbs, type=pa.binary()),
                "weights": pa.array(wbs, type=pa.binary()),
            }
        )

    def group_merge(g: pa.Table) -> pa.Table:
        m, w = _td_unpack_concat(g)
        m, w = _td_compress(m, w, delta)
        vals = _td_quantile(m, w, qs)
        return pa.table(
            {
                key: pa.array([g[key][0].as_py()] * len(qs), type=pa.string()),
                "q": pa.array(list(qs), type=pa.float64()),
                "value_approx": pa.array(vals, type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(group_merge, batch_format="pyarrow")
    )


def q_evt_value_tdigest_by_type(sf_dir: str):
    """Approximate per-type value quantiles (p50/p95/p99) via grouped
    t-digests — the sketch twin of the exact
    ``quantile.q_evt_value_percentiles_by_type`` for group cardinalities
    where exact refinement rounds are too many passes.
    Implementation-defined values → rows-only; rank error vs the exact
    twin asserted in pytest."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return grouped_tdigest_quantiles(ds, "event_type", "value")


SKETCH_QUERIES["evt_value_tdigest_by_type"] = q_evt_value_tdigest_by_type
# approximate → rows-only (no oracle), like evt_value_tdigest
