"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video libraries are not available in this environment, so the
*decode kernel* is stubbed (clearly marked), while everything Ray-side —
binary schema, actor-pool stage signature, small batches for large rows,
metadata extraction, output layout — is real and tested.

``mm_payload_meta`` treats the documents' text bytes as an opaque binary
payload and extracts (byte length, digest) — SQL-oracled.  The decode
stage (``DecodeStage``) is an actor-pool class whose real path raises
``NotImplementedError`` unless a decoder import succeeds; its
deterministic fake path derives fake width/height from the digest so the
distributed plumbing is exercised end-to-end in pytest.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

import ray.data as rd


def q_mm_payload_meta(sf_dir: str):
    """Binary payload metadata: n_bytes + md5 over the payload column."""

    def f(t: pa.Table) -> pa.Table:
        payloads = [s.encode() for s in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array([len(b) for b in payloads], type=pa.int64()),
                "digest": pa.array([hashlib.md5(b).hexdigest() for b in payloads]),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool decode stage for binary media columns.

    Real decoding requires an image/audio library that is NOT available in
    this container — the ``fake=False`` path is a clearly-marked stub that
    raises ``NotImplementedError``.  With ``fake=True`` (default), a
    deterministic fake decode derives (width, height, n_frames) from the
    payload digest, keeping the Ray-side plumbing (actor init, small
    ``batch_size`` for large binary rows, struct-typed output) real.
    """

    OUT_TYPE = pa.struct(
        [("width", pa.int32()), ("height", pa.int32()), ("n_frames", pa.int32())]
    )

    def __init__(self, fake: bool = True):
        self.fake = fake
        self.decoder = None
        if not fake:
            try:  # pragma: no cover - not available in this environment
                from PIL import Image  # noqa: F401

                self.decoder = Image
            except ImportError as e:
                raise NotImplementedError(
                    "real media decode requires an image library (PIL); "
                    "run with fake=True in this environment"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        metas = []
        for b in payloads:
            if self.fake:
                d = hashlib.blake2b(b, digest_size=6).digest()
                metas.append(
                    {
                        "width": 16 + d[0],
                        "height": 16 + d[1],
                        "n_frames": 1 + d[2] % 8,
                    }
                )
            else:  # pragma: no cover
                raise NotImplementedError("real decode not available")
        return batch.append_column("decoded", pa.array(metas, type=self.OUT_TYPE))


def decode_documents(sf_dir: str, concurrency=(1, 4), batch_size: int = 64) -> rd.Dataset:
    """documents → binary payload column → actor-pool decode (fake kernel).

    Small ``batch_size`` models large binary rows (batch × concurrency must
    fit worker heap)."""

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(
                    [s.encode() for s in t["text"].to_pylist()], type=pa.binary()
                ),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(to_payload, batch_format="pyarrow")
    return ds.map_batches(
        DecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStage:
    """Actor-pool resize stage: (payload, decoded) → resized payload +
    updated dims.  Real path gated like DecodeStage; the fake kernel is a
    deterministic digest transform so downstream schemas/bytes are stable."""

    def __init__(self, width: int = 32, height: int = 32, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real media resize requires an image library; fake=True here"
            )
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims = f"{self.width}x{self.height}".encode()
        out = [
            hashlib.blake2b(b + dims, digest_size=16).digest()
            for b in batch["payload"].to_pylist()
        ]
        meta = [
            {"width": self.width, "height": self.height, "n_frames": m["n_frames"]}
            for m in batch["decoded"].to_pylist()
        ]
        batch = batch.drop_columns(["payload", "decoded"])
        batch = batch.append_column("payload", pa.array(out, type=pa.binary()))
        return batch.append_column("decoded", pa.array(meta, type=DecodeStage.OUT_TYPE))


class FrameSampleStage:
    """Actor-pool frame sampler: every ``stride``-th frame of the decoded
    payload as a list<binary> column (fake kernel: per-frame digests)."""

    def __init__(self, stride: int = 2, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real frame extraction requires a video library; fake=True here"
            )
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_col = []
        for b, m in zip(batch["payload"].to_pylist(), batch["decoded"].to_pylist()):
            picked = range(0, m["n_frames"], self.stride)
            frames_col.append(
                [
                    hashlib.blake2b(b + bytes([k]), digest_size=8).digest()
                    for k in picked
                ]
            )
        return batch.append_column(
            "frames", pa.array(frames_col, type=pa.list_(pa.binary()))
        )


class FeatureExtractStage:
    """Actor-pool feature extractor: payload → fixed-dim float32 embedding
    (fake kernel: digest bytes scaled to [0,1); a real model would load in
    ``__init__`` — once per actor — and batch-infer in ``__call__``)."""

    DIM = 16

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real feature extraction requires a model runtime; fake=True here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        embs = []
        for b in batch["payload"].to_pylist():
            d = hashlib.blake2b(b, digest_size=self.DIM).digest()
            embs.append((np.frombuffer(d, dtype=np.uint8) / 255.0).astype(np.float32))
        return batch.append_column(
            "embedding", pa.array([e.tolist() for e in embs], type=pa.list_(pa.float32()))
        )


class MediaChain:
    """Fused media chain in ONE actor pool: decode → resize →
    frame-sample → feature-extract per batch.  Fusing per-record media
    ops into a single actor is the scale-correct composition — one pool
    to size, no inter-stage object-store IPC for the big binary rows,
    and no risk of several chained pools reserving every CPU and
    starving the source tasks (the streaming-executor deadlock this repo
    measured at small CPU counts)."""

    def __init__(self, width: int = 32, height: int = 32, stride: int = 2, fake: bool = True):
        self.stages = (
            DecodeStage(fake=fake),
            ResizeStage(width=width, height=height, fake=fake),
            FrameSampleStage(stride=stride, fake=fake),
            FeatureExtractStage(fake=fake),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        for stage in self.stages:
            batch = stage(batch)
        return batch


def media_pipeline(sf_dir: str, concurrency=(1, 4), batch_size: int = 64) -> rd.Dataset:
    """payload column → fused MediaChain actor pool, small batches (batch
    × concurrency × payload size must fit the worker heap)."""

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(
                    [s.encode() for s in t["text"].to_pylist()], type=pa.binary()
                ),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(to_payload, batch_format="pyarrow")
    return ds.map_batches(
        MediaChain, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


MULTIMODAL_QUERIES = {
    "mm_payload_meta": q_mm_payload_meta,
}

MULTIMODAL_ORACLES = {
    "mm_payload_meta": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
""",
}
