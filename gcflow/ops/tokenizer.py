"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
subword-nmt algorithm) — the iterative merge loop a training-data
pipeline runs to learn a vocabulary over the whole corpus.

Reference parity note: the reference engine (binaryfoo/gclog-parser) has
no tokenizer — this op belongs to the LLM-data layer this repo adds on
top (like dedup/curation/DSIR), with ``doc_bigrams``
(ops/corpus_stats.py) as its one-round scoring twin.

Scale shape (what makes this 100-TB-viable):

- **The corpus is read ONCE.**  The only full-data pass builds the
  word-frequency table — the same bucketed value-counts sweep as
  ``doc_bigrams`` (a word lives wholly in one hash bucket, so the
  per-bucket sum is exact and the groupby is over 64 constant keys).
  Everything after operates on the word table, which is
  corpus-compressed: unique words grow ~O(corpus^0.7) (Heaps' law), not
  linearly.
- **The merge loop runs on sharded stateful actors** — the sanctioned
  raw-actor escape hatch (like ops/stream_dedup.py): per-round state
  (each word's current symbol sequence) is mutated in place across
  ~``num_merges`` rounds, which no Dataset transform expresses without
  re-shuffling the table every round.  Each shard holds a disjoint slice
  of the word table as ONE flat numpy symbol buffer + offsets + counts;
  a round is two vectorized calls per shard (count pairs / apply merge),
  so driver traffic per round is the shard-local distinct-pair arrays
  (bounded by the active symbol-pair vocabulary), never the words.
- **Partials are mergeable.**  Pair counts are (key, count) arrays
  summed by ``np.unique`` on the driver; at 10^9-unique-word scale the
  same arrays tree-merge like ops/sketch.py's digests, and candidate
  pruning (keep a shard's pairs with count above the cross-shard lower
  bound) bounds the transfer without breaking exactness.

Determinism: the merge chosen each round is the globally
maximum-count pair with ties broken by (left symbol id, right symbol id)
ascending — shard-count invariant because global counts are a sum and
the tie-break depends only on ids, which are assigned identically
(codepoints, then ``_NEW_BASE + rank``).  Overlapping occurrences count
naively (``"aaa"`` yields (a,a) twice) and merge greedily leftmost
(``"aaa"`` merges once), exactly like the published algorithm; the
pure-Python twin in tests/test_ops.py mirrors both choices.

No SQL oracle: the op is iterative (each round's input depends on the
previous round's argmax), outside single-statement SQL — rows-only at
the driver, twin-equality + shard-invariance + golden-merge pytest.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_BUCKETS = 64
_EOW = 0x110000          # end-of-word marker, first id past Unicode
_NEW_BASE = 0x110001     # merge r mints symbol id _NEW_BASE + r
_KEY_SHIFT = np.uint64(32)  # pair key = left << 32 | right (ids < 2^32)

BPE_NUM_MERGES = 32
BPE_SHARDS = 8


def word_count_table(sf_dir: str) -> rd.Dataset:
    """One corpus pass -> exact (word, n) frequency table, word-hash
    bucketed so each word's global count is finished inside one group."""

    def partial(t: pa.Table) -> pa.Table:
        from .hashing import word_hashes

        toks = pc.split_pattern(t["text"], " ")
        flat = pc.list_flatten(toks)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        flat = flat.filter(pc.not_equal(flat, ""))  # collapse double spaces
        vc = flat.value_counts()
        vc = vc.combine_chunks() if isinstance(vc, pa.ChunkedArray) else vc
        words = vc.field("values")
        b = (word_hashes(words) % np.uint64(_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "word": words,
                "n_partial": pc.cast(vc.field("counts"), pa.int64()),
                "bucket": pa.array(b, type=pa.int64()),
            }
        )

    def bucket_sum(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.schema([("word", pa.string()), ("n", pa.int64())]).empty_table()
        words = g["word"]
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        enc = words.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.bincount(
            codes,
            weights=g["n_partial"].to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        return pa.table({"word": enc.dictionary, "n": pa.array(n)})

    return (
        rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )


@ray.remote
class BpeShard:
    """One slice of the word table as mutable flat-buffer state.

    ``flat``    int64 symbols of every word concatenated (chars as
                codepoints + _EOW), ``offsets`` word starts with an end
    sentinel, ``counts`` per-word corpus frequencies.  Both methods are
    single numpy passes over the buffer — no per-word Python after
    ``__init__``.
    """

    def __init__(self, *tables: pa.Table):
        words: list[str] = []
        counts: list[np.ndarray] = []
        for t in tables:
            # Ray's hash shuffle emits SCHEMA-LESS zero-row blocks for
            # empty groups (see _sanitize_shuffle_output, ops/dedup.py) —
            # with a tiny vocabulary most of the 64 buckets are such
            if t.num_rows == 0:
                continue
            words.extend(t["word"].to_pylist())
            counts.append(t["n"].to_numpy(zero_copy_only=False))
        seqs = [np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32) for w in words]
        lens = np.fromiter((len(s) + 1 for s in seqs), dtype=np.int64, count=len(seqs))
        self.offsets = np.concatenate([[0], np.cumsum(lens)])
        self.flat = np.empty(int(self.offsets[-1]), dtype=np.int64)
        for i, s in enumerate(seqs):
            o = self.offsets[i]
            self.flat[o : o + len(s)] = s
            self.flat[o + len(s)] = _EOW
        self.counts = (
            np.concatenate(counts) if counts else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        self.word_arr = pa.array(words, type=pa.string())

    def _pair_mask(self) -> np.ndarray:
        """True at position i when (flat[i], flat[i+1]) lies in one word."""
        m = np.ones(max(len(self.flat) - 1, 0), dtype=bool)
        last = self.offsets[1:] - 1  # final symbol index of each word
        last = last[last < len(m)]
        m[last] = False
        return m

    def pair_counts(self):
        """Frequency-weighted adjacent-pair counts -> (keys, counts)."""
        if len(self.flat) < 2:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
        m = self._pair_mask()
        keys = (self.flat[:-1].astype(np.uint64) << _KEY_SHIFT) | self.flat[
            1:
        ].astype(np.uint64)
        lens = np.diff(self.offsets)
        w = np.repeat(self.counts, lens)[:-1]  # pair weight = its word's count
        uniq, inv = np.unique(keys[m], return_inverse=True)
        tot = np.bincount(inv, weights=w[m], minlength=len(uniq)).astype(np.int64)
        return uniq, tot

    def word_token_lengths(self) -> pa.Table:
        """(word, n_tokens) under the merges applied so far — the
        distinct-word encode table (EOW rides inside its merged token or
        stands as its own, exactly as the symbol sequence says)."""
        return pa.table(
            {
                "word": self.word_arr,
                "n_tokens": pa.array(np.diff(self.offsets), type=pa.int64()),
            }
        )

    def apply_merge(self, a: int, b: int, new_id: int) -> None:
        """Replace greedy-leftmost non-overlapping (a, b) with new_id."""
        if len(self.flat) < 2:
            return
        m = self._pair_mask()
        hit = m & (self.flat[:-1] == a) & (self.flat[1:] == b)
        pos = np.nonzero(hit)[0]
        if len(pos) == 0:
            return
        if a == b and len(pos) > 1:
            # runs of overlapping hits ("aaaa"): keep alternate positions
            new_run = np.concatenate([[True], np.diff(pos) != 1])
            run_id = np.cumsum(new_run) - 1
            run_start = np.nonzero(new_run)[0]
            pos = pos[(np.arange(len(pos)) - run_start[run_id]) % 2 == 0]
        self.flat[pos] = new_id
        drop = np.zeros(len(self.flat), dtype=bool)
        drop[pos + 1] = True
        self.flat = self.flat[~drop]
        word_of = np.searchsorted(self.offsets, pos, side="right") - 1
        removed = np.bincount(word_of, minlength=len(self.counts))
        new_lens = np.diff(self.offsets) - removed
        self.offsets = np.concatenate([[0], np.cumsum(new_lens)])


def _sym_name(sym: int, merged: dict[int, str]) -> str:
    if sym == _EOW:
        return "</w>"
    if sym >= _NEW_BASE:
        return merged[sym]
    return chr(sym)


def _make_shards(sf_dir: str, num_shards: int) -> list:
    refs = word_count_table(sf_dir).materialize().to_arrow_refs()
    groups: list[list] = [[] for _ in range(num_shards)]
    for i, r in enumerate(refs):
        groups[i % num_shards].append(r)
    # pass the block refs as *args so Ray resolves them inside the actor
    # (zero-copy from the object store; no driver-side fetch + reship)
    return [BpeShard.remote(*g) for g in groups if g]


def _train_on_shards(actors: list, num_merges: int) -> pa.Table:
    """The merge loop; mutates the shards in place and returns the
    (rank, left, right, pair, n) merge table."""
    merged_names: dict[int, str] = {}
    ranks, lefts, rights, pairs, ns = [], [], [], [], []
    for r in range(num_merges):
        parts = ray.get([a.pair_counts.remote() for a in actors])
        keys = np.concatenate([p[0] for p in parts])
        if len(keys) == 0:
            break
        cnts = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(keys, return_inverse=True)
        tot = np.bincount(inv, weights=cnts, minlength=len(uniq)).astype(np.int64)
        left = (uniq >> _KEY_SHIFT).astype(np.int64)
        right = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        best = np.lexsort((right, left, -tot))[0]
        a_sym, b_sym, n = int(left[best]), int(right[best]), int(tot[best])
        new_id = _NEW_BASE + r
        la = _sym_name(a_sym, merged_names)
        lb = _sym_name(b_sym, merged_names)
        merged_names[new_id] = la + lb
        ranks.append(r)
        lefts.append(la)
        rights.append(lb)
        pairs.append(la + lb)
        ns.append(n)
        ray.get([a.apply_merge.remote(a_sym, b_sym, new_id) for a in actors])
    return pa.table(
        {
            "rank": pa.array(ranks, type=pa.int64()),
            "left": pa.array(lefts, type=pa.string()),
            "right": pa.array(rights, type=pa.string()),
            "pair": pa.array(pairs, type=pa.string()),
            "n": pa.array(ns, type=pa.int64()),
        }
    )


def bpe_train(
    sf_dir: str,
    num_merges: int = BPE_NUM_MERGES,
    num_shards: int = BPE_SHARDS,
) -> pa.Table:
    """Learn ``num_merges`` BPE merges over the documents corpus;
    returns (rank, left, right, pair, n) in merge order."""
    actors = _make_shards(sf_dir, num_shards)
    try:
        return _train_on_shards(actors, num_merges)
    finally:
        for a in actors:
            ray.kill(a)


# ------------------------------------------------------------ BPE encode
#
# The apply side of the trainer: per-document REAL BPE token counts
# under the learned merges.  The expensive part — encoding — happens on
# the DISTINCT-WORD table only: after the merge loop the shards already
# hold every unique word's final symbol sequence, so the encode table
# (word, n_tokens) falls out of the training state for free.  The
# per-document pass is then a vectorized dictionary lookup
# (``pc.index_in`` against the broadcast vocabulary + a bincount sum) —
# no per-document BPE is ever run.  The broadcast is bounded and
# enforced (Heaps-law vocab ≪ corpus); past the ceiling, swap the
# lookup for the term-keyed repartition join the unigram-LM op uses
# (ops/text.py q_doc_unigram_logprob) — the encode side is unchanged.

VOCAB_BROADCAST_MAX = 500_000


def bpe_token_counts(
    sf_dir: str,
    num_merges: int = BPE_NUM_MERGES,
    num_shards: int = BPE_SHARDS,
):
    """(doc_id, n_bpe_tokens): real BPE token count per document under
    ``num_merges`` merges trained on this same corpus."""
    actors = _make_shards(sf_dir, num_shards)
    try:
        _train_on_shards(actors, num_merges)
        parts = ray.get([a.word_token_lengths.remote() for a in actors])
    finally:
        for a in actors:
            ray.kill(a)
    vocab = pa.concat_tables(parts).combine_chunks()
    if len(vocab) > VOCAB_BROADCAST_MAX:
        raise ValueError(
            f"vocabulary has {len(vocab)} words, over the "
            f"{VOCAB_BROADCAST_MAX} broadcast ceiling; route the lookup "
            "through a term-keyed repartition join (see q_doc_unigram_logprob)"
        )
    words_ref = ray.put(vocab["word"].combine_chunks())
    lens_ref = ray.put(vocab["n_tokens"].to_numpy(zero_copy_only=False))

    class TokenCounter:
        def __init__(self):
            self.words = ray.get(words_ref)
            self.lens = ray.get(lens_ref).astype(np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            toks = pc.split_pattern(t["text"], " ")
            toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
            flat = pc.list_flatten(toks)
            flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            lens = np.diff(offs - offs[0])
            doc_of = np.repeat(np.arange(len(t), dtype=np.int64), lens)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(keep))
            doc_of = doc_of[keep]
            idx = pc.index_in(flat, value_set=self.words)
            pos = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            if (pos < 0).any():
                raise AssertionError(
                    "document word missing from the trained vocabulary"
                )
            n = np.bincount(
                doc_of, weights=self.lens[pos], minlength=len(t)
            ).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pc.cast(t["doc_id"], pa.int64()),
                    "n_bpe_tokens": pa.array(n, type=pa.int64()),
                }
            )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 4))


def q_doc_bpe_train(sf_dir: str) -> pa.Table:
    return bpe_train(sf_dir)


def q_doc_bpe_token_count(sf_dir: str):
    return bpe_token_counts(sf_dir)


TOKENIZER_QUERIES = {
    "doc_bpe_train": q_doc_bpe_train,
    "doc_bpe_token_count": q_doc_bpe_token_count,
}
TOKENIZER_ORACLES: dict[str, str] = {}
