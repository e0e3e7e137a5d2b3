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
- candidate verification here broadcasts the (small) shingle-set dict of
  candidate docs; at web scale verify via a repartition join on doc_id.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

NEAR_SUFFIX = " near duplicate copy marker"
JACCARD_THRESHOLD = 0.7

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

def q_doc_exact_dedup(sf_dir: str):
    """Exact dedup: content-hash partition → keep min doc_id per group.

    The shuffle key is the md5 of the text (not the text itself), so only
    16-byte keys + ids cross the wire."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(s.encode()).hexdigest() for s in t["text"].to_pylist()]
        return pa.table({"h": pa.array(h), "doc_id": t["doc_id"]})

    kept = (
        corpus_ds(sf_dir)
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .min("doc_id")
        .to_pandas()
    )
    return pa.table({"doc_id": pa.array(sorted(kept["min(doc_id)"]), type=pa.int64())})


# -------------------------------------------------- shingles + exact jaccard

def _shingles(text: str) -> set:
    w = text.split(" ")
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _shingle_rows(t: pa.Table) -> pa.Table:
    """Explode corpus rows to (shingle, doc_id) pairs (distinct shingles)."""
    doc_ids, shingles = [], []
    for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for sh in _shingles(s):
            doc_ids.append(did)
            shingles.append(sh)
    return pa.table(
        {"shingle": pa.array(shingles), "doc_id": pa.array(doc_ids, type=pa.int64())}
    )


def _sizes_ref(corpus):
    """Broadcast doc_id → shingle-set-size (small side)."""
    sizes = (
        corpus
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "sz": pa.array(
                        [len(_shingles(s)) for s in t["text"].to_pylist()],
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return ray.put(dict(zip(sizes["doc_id"], sizes["sz"])))


def _pairs_from_groups(g: pa.Table) -> pa.Table:
    """Within one shingle (or LSH bucket) group: emit co-occurring pairs
    (vectorized triangular index — groups can be large)."""
    ids = np.unique(g["doc_id"].to_numpy())
    i, j = np.triu_indices(len(ids), k=1)
    return pa.table(
        {
            "doc_a": pa.array(ids[i], type=pa.int64()),
            "doc_b": pa.array(ids[j], type=pa.int64()),
        }
    )


def q_doc_ngram_jaccard(sf_dir: str):
    """Exact near-dup pairs via shared-shingle counting (no LSH):
    explode → groupby(shingle) pair-emit → groupby(pair).count = |A∩B| →
    jaccard from broadcast sizes.  Pairs with jaccard ≥ 0.7."""
    # the corpus is a small reused intermediate → pin it once instead of
    # re-executing the read+plant pipeline per consumer
    corpus = corpus_ds(sf_dir).materialize()
    sizes_ref = _sizes_ref(corpus)
    shingle_doc = corpus.map_batches(_shingle_rows, batch_format="pyarrow")
    pairs = shingle_doc.groupby("shingle").map_groups(
        _pairs_from_groups, batch_format="pyarrow"
    )
    shared = pairs.groupby(["doc_a", "doc_b"]).count()  # count() column: count()

    class Verify:
        def __init__(self, ref):
            self.sizes = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["doc_a"].to_numpy()
            b = t["doc_b"].to_numpy()
            n_shared = t["count()"].to_numpy().astype(np.float64)
            sa = np.array([self.sizes[x] for x in a], dtype=np.float64)
            sb = np.array([self.sizes[x] for x in b], dtype=np.float64)
            # raw jaccard: identical int inputs → bit-identical float64 in
            # both engines; no rounding (tie hazards)
            jac = n_shared / (sa + sb - n_shared)
            out = pa.table(
                {
                    "doc_a": pa.array(a, type=pa.int64()),
                    "doc_b": pa.array(b, type=pa.int64()),
                    "jaccard": pa.array(jac),
                }
            )
            return out.filter(pc.greater_equal(out["jaccard"], JACCARD_THRESHOLD))

    return shared.map_batches(
        Verify, fn_constructor_args=(sizes_ref,), batch_format="pyarrow", concurrency=(1, 4)
    )


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
    return int.from_bytes(hashlib.blake2b(sh.encode(), digest_size=8).digest(), "big")


def _minhash_signature(shingles: set) -> np.ndarray:
    x = np.fromiter((_shingle_hash64(s) for s in shingles), dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = _PERM_A[:, None] * x[None, :] + _PERM_B[:, None]  # mod 2^64
    return vals.min(axis=1)


class MinHashStage:
    """Actor-pool stage: per-doc shingling + 128-perm MinHash signature,
    exploded to (band_id, band_hash, doc_id) rows for the bucket groupby.
    Permutation tables are built once per actor (in __init__)."""

    def __init__(self):
        self.a = _PERM_A
        self.b = _PERM_B

    def __call__(self, t: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        r = N_PERM // N_BANDS
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _shingles(s)
            if not sh:
                continue
            sig = _minhash_signature(sh)
            for band in range(N_BANDS):
                chunk = sig[band * r : (band + 1) * r]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(band)
                band_hashes.append(bh)
                doc_ids.append(did)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hashes),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
            }
        )


def q_doc_minhash_lsh(sf_dir: str):
    """MinHash+LSH near-dup: shingle → minhash → band buckets (groupby) →
    candidate pairs → exact-jaccard verification against broadcast shingle
    sets.  Same output contract (and oracle) as the exact n-gram path —
    at the chosen banding the LSH recall at jaccard ≥ 0.7 is ≈ 1."""
    # broadcast full shingle sets of the corpus for candidate verification
    corpus = corpus_ds(sf_dir).materialize()
    sets_df = (
        corpus
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"],
                    "sh": pa.array(
                        [list(_shingles(s)) for s in t["text"].to_pylist()],
                        type=pa.list_(pa.string()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    sets_ref = ray.put(
        {d: frozenset(v) for d, v in zip(sets_df["doc_id"], sets_df["sh"])}
    )

    bands = corpus.map_batches(
        MinHashStage, batch_format="pyarrow", concurrency=(1, 4)
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _pairs_from_groups, batch_format="pyarrow"
    )
    cand = pairs.groupby(["doc_a", "doc_b"]).count()

    class Verify:
        def __init__(self, ref):
            self.sets = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            out_a, out_b, out_j = [], [], []
            for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
                sa, sb = self.sets[a], self.sets[b]
                inter = len(sa & sb)
                jac = inter / (len(sa) + len(sb) - inter)
                if jac >= JACCARD_THRESHOLD:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jac)
            return pa.table(
                {
                    "doc_a": pa.array(out_a, type=pa.int64()),
                    "doc_b": pa.array(out_b, type=pa.int64()),
                    "jaccard": pa.array(out_j, type=pa.float64()),
                }
            )

    return cand.map_batches(
        Verify, fn_constructor_args=(sets_ref,), batch_format="pyarrow", concurrency=(1, 4)
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


def q_doc_simhash(sf_dir: str):
    """SimHash near-dup: 64-bit signature per doc (word features), pairs
    with hamming distance ≤ 3 via bucketed prefix blocking (4 bands of 16
    bits → any pair within distance 3 shares ≥ 1 exact band).  Values are
    implementation-defined → no SQL oracle (rows-only driver check);
    planted-duplicate recall is asserted in pytest."""

    def stage(t: pa.Table) -> pa.Table:
        band_ids, band_vals, doc_ids, sigs = [], [], [], []
        for did, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = _simhash64(s.split(" "))
            for band in range(4):
                band_ids.append(band)
                band_vals.append((sig >> (band * 16)) & 0xFFFF)
                doc_ids.append(did)
                sigs.append(sig)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_val": pa.array(band_vals, type=pa.int64()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "sig": pa.array(sigs, type=pa.uint64()),
            }
        )

    bands = corpus_ds(sf_dir).map_batches(stage, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        rows = sorted(set(zip(g["doc_id"].to_pylist(), g["sig"].to_pylist())))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                if ham <= 3:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(d, type=pa.int64()),
            }
        )

    pairs = bands.groupby(["band_id", "band_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    out = pairs.groupby(["doc_a", "doc_b"]).min("hamming").to_pandas()
    return pa.table(
        {
            "doc_a": pa.array(out["doc_a"], type=pa.int64()),
            "doc_b": pa.array(out["doc_b"], type=pa.int64()),
            "hamming": pa.array(out["min(hamming)"], type=pa.int64()),
        }
    ).sort_by([("doc_a", "ascending"), ("doc_b", "ascending")])


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


def q_emb_cosine_dedup(sf_dir: str):
    """Embedding-cosine near-dup over a planted-duplicate corpus: block-
    matmul per batch against the broadcast corpus matrix; pairs with
    cosine ≥ 0.95 (float64 both sides; the corpus has no natural pairs
    above 0.48 so the threshold is far from any boundary)."""
    ids, E = _emb_corpus(sf_dir)
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




# ------------------------------------------- duplicate clusters (components)

def q_doc_dup_clusters(sf_dir: str):
    """Near-dup pairs → duplicate CLUSTERS via iterative min-label
    propagation (the standard distributed connected-components loop:
    each round every node takes the min label over itself and its
    neighbours, via a groupby — no driver-side union-find).  Output:
    (doc_id, component) for every document that appears in a pair,
    component = smallest doc_id reachable through jaccard ≥ 0.7 edges."""
    pairs = q_doc_ngram_jaccard(sf_dir).to_pandas()

    import pandas as pd

    edges = pd.concat(
        [
            pairs.rename(columns={"doc_a": "src", "doc_b": "dst"})[["src", "dst"]],
            pairs.rename(columns={"doc_b": "src", "doc_a": "dst"})[["src", "dst"]],
        ]
    )
    nodes = pd.unique(edges["src"])
    labels = rd.from_arrow(
        pa.table({"node": pa.array(nodes, type=pa.int64()),
                  "label": pa.array(nodes, type=pa.int64())})
    )
    edges_ds = rd.from_arrow(
        pa.table({"src": pa.array(edges["src"], type=pa.int64()),
                  "dst": pa.array(edges["dst"], type=pa.int64())})
    )
    edges_ref = ray.put(edges.groupby("dst")["src"].apply(list).to_dict())

    class Propagate:
        """One BSP round: label(node) := min(label(node), min over
        incoming edges of label(src)).  The (small) adjacency is
        broadcast; at web scale the same round is a join + groupby-min
        keyed on node."""

        def __init__(self, ref, label_map_ref):
            self.adj = ray.get(ref)
            self.labels = ray.get(label_map_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            node = t["node"].to_numpy()
            lab = t["label"].to_numpy().copy()
            for i, nd in enumerate(node):
                for src in self.adj.get(nd, ()):  # neighbours' labels
                    sl = self.labels.get(src, src)
                    if sl < lab[i]:
                        lab[i] = sl
            return pa.table(
                {"node": pa.array(node, type=pa.int64()),
                 "label": pa.array(lab, type=pa.int64())}
            )

    for _ in range(16):  # components here are tiny; bounded rounds
        current = labels.to_pandas()
        label_map_ref = ray.put(dict(zip(current["node"], current["label"])))
        new = labels.map_batches(
            Propagate, fn_constructor_args=(edges_ref, label_map_ref),
            batch_format="pyarrow", concurrency=2,
        ).materialize()
        new_df = new.to_pandas()
        if new_df.sort_values("node")["label"].equals(
            current.sort_values("node")["label"]
        ):
            break
        labels = new
    out = labels.to_pandas().sort_values("node")
    return pa.table(
        {"doc_id": pa.array(out["node"], type=pa.int64()),
         "component": pa.array(out["label"], type=pa.int64())}
    )


DEDUP_QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_simhash": q_doc_simhash,
    "emb_cosine_dedup": q_emb_cosine_dedup,
    "doc_dup_clusters": q_doc_dup_clusters,
}

DEDUP_ORACLES = {
    "doc_exact_dedup": "WITH " + CORPUS_SQL + """
SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text ORDER BY 1
""",
    "doc_ngram_jaccard": JACCARD_PAIRS_SQL,
    "doc_minhash_lsh": JACCARD_PAIRS_SQL,
    "doc_dup_clusters": "WITH RECURSIVE "
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
)
SELECT src AS doc_id, min(dst) AS component FROM walk GROUP BY 1
""",
    # doc_simhash: implementation-defined signature → rows-only check
    "emb_cosine_dedup": "WITH " + EMB_DUP_SQL + """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM ecorpus a JOIN ecorpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.95
""",
}
