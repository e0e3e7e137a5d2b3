"""Multimodal column plumbing: opaque binary payloads + typed metadata.

IMAGE/VIDEO libraries are not available in this environment, so those
decode kernels are stubbed (clearly marked), while everything Ray-side —
binary schema, actor-pool stage signature, small batches for large rows,
metadata extraction, output layout — is real and tested.

AUDIO decode is REAL: the stdlib ``wave``/``audioop`` modules decode
WAV/PCM payloads (``AudioDecodeStage`` — header params, frame counts,
RMS/peak amplitude), driven by ``mm_audio_meta`` over deterministic
synthesized tones whose header metadata is a closed form of doc_id, so
the real kernel is FULL-SQL-oracled (the oracle computes the same closed
form; the kernel must reproduce it from the bytes).

``mm_payload_meta`` treats the documents' text bytes as an opaque binary
payload and extracts (byte length, digest) — SQL-oracled.  The image
decode stage (``DecodeStage``) is an actor-pool class whose real path
raises ``NotImplementedError`` unless a decoder import succeeds; its
deterministic fake path derives fake width/height from the digest so the
distributed plumbing is exercised end-to-end in pytest.
"""

from __future__ import annotations

import hashlib
import io
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


# --------------------------------------------------------------- audio
# Deterministic WAV synthesis: every header/shape parameter is a CLOSED
# FORM of doc_id, so the SQL oracle can state the expected decode output
# without decoding — the real kernel must recover it from the bytes.

AUDIO_AMP = 12000


def _audio_params(doc_id: int) -> dict:
    sr = 8000 * (1 + doc_id % 2)
    n_channels = 1 + doc_id % 2
    n_frames = (sr // 10) * (1 + doc_id % 4)          # 100ms steps → exact ms
    return {
        "sample_rate": sr,
        "n_channels": n_channels,
        "sample_width": 2,                            # 16-bit PCM
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sr,
        "freq": 200 + (doc_id % 20) * 50,
    }


def synth_wav(doc_id: int) -> bytes:
    """16-bit PCM sine tone with doc_id-derived header params."""
    import wave

    import numpy as np

    p = _audio_params(doc_id)
    t = np.arange(p["n_frames"], dtype=np.float64) / p["sample_rate"]
    mono = (AUDIO_AMP * np.sin(2 * np.pi * p["freq"] * t)).astype(np.int16)
    pcm = np.repeat(mono, p["n_channels"]).tobytes()  # interleave channels
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(p["n_channels"])
        w.setsampwidth(p["sample_width"])
        w.setframerate(p["sample_rate"])
        w.writeframes(pcm)
    return buf.getvalue()


class AudioDecodeStage:
    """REAL audio decode kernel (stdlib ``wave`` + ``audioop``, WAV/PCM):
    payload bytes → header params + frame count + RMS/peak amplitude.
    Same actor-pool shape as the gated image stages — decoder modules
    bound once in ``__init__`` (per actor), per-batch work in
    ``__call__``."""

    def __init__(self):
        import audioop
        import wave

        self._wave, self._audioop = wave, audioop

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {
            k: [] for k in ("sample_rate", "n_channels", "sample_width",
                            "n_frames", "duration_ms", "rms", "peak")
        }
        for b in batch["payload"].to_pylist():
            with self._wave.open(io.BytesIO(b), "rb") as w:
                sr, nch, sw, nf = (
                    w.getframerate(), w.getnchannels(), w.getsampwidth(),
                    w.getnframes(),
                )
                pcm = w.readframes(nf)
            rows["sample_rate"].append(sr)
            rows["n_channels"].append(nch)
            rows["sample_width"].append(sw)
            rows["n_frames"].append(nf)
            rows["duration_ms"].append(nf * 1000 // sr)
            rows["rms"].append(self._audioop.rms(pcm, sw))
            rows["peak"].append(self._audioop.max(pcm, sw))
        out = batch.drop_columns(["payload"])
        for k, v in rows.items():
            out = out.append_column(k, pa.array(v, type=pa.int64()))
        return out


def q_mm_audio_meta(sf_dir: str):
    """Synthesized WAV payloads → REAL wave/audioop decode in an actor
    pool → header metadata.  Oracled: every output column is a closed
    form of doc_id that the kernel must recover from the bytes (rms/peak
    are asserted separately in pytest — no SQL closed form)."""

    def to_wav(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array([synth_wav(i) for i in ids], type=pa.binary()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_wav, batch_format="pyarrow", batch_size=256)
    decoded = ds.map_batches(
        AudioDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )
    return decoded.map_batches(
        lambda t: t.select(
            ["doc_id", "sample_rate", "n_channels", "sample_width",
             "n_frames", "duration_ms"]
        ),
        batch_format="pyarrow",
    )


MULTIMODAL_QUERIES = {
    "mm_payload_meta": q_mm_payload_meta,
    "mm_audio_meta": q_mm_audio_meta,
}

MULTIMODAL_ORACLES = {
    "mm_payload_meta": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
""",
    # the closed-form twin of _audio_params — the Ray side must RECOVER
    # these values from the WAV bytes via the real wave/audioop kernel
    "mm_audio_meta": """
SELECT doc_id,
       CAST(8000 * (1 + doc_id % 2) AS BIGINT) AS sample_rate,
       CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
       CAST(2 AS BIGINT) AS sample_width,
       CAST((8000 * (1 + doc_id % 2) // 10) * (1 + doc_id % 4) AS BIGINT) AS n_frames,
       CAST((8000 * (1 + doc_id % 2) // 10) * (1 + doc_id % 4) * 1000
            // (8000 * (1 + doc_id % 2)) AS BIGINT) AS duration_ms
FROM documents
""",
}
