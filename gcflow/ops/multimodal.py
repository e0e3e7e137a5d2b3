"""Multimodal column plumbing: opaque binary payloads + typed metadata.

One REAL decode kernel per modality, each FULL-SQL-oracled over
deterministic synthesized payloads whose decoded values are closed forms
of doc_id (the kernel must recover them from the bytes):

- AUDIO: stdlib ``wave``/``audioop`` decode WAV/PCM
  (``AudioDecodeStage`` — header params, frame counts, RMS/peak).
- IMAGE: binary netpbm (P5/P6) decoded with numpy alone
  (``ImageDecodeStage`` — header params + exact pixel sum).
- VIDEO: YUV4MPEG2 container walked with numpy alone
  (``VideoFrameSampleStage`` — dims, frame counts, strided frame
  sampling, sampled-luma sum).

COMPRESSED formats: PNG (zlib DEFLATE + prediction filters) and
baseline JPEG (Huffman-coded DCT) are decoded for REAL with stdlib +
numpy alone (``PngDecodeStage`` / ``JpegDecodeStage`` below — the two
codec families reachable without an imaging library).  MP4-class
containers and the remaining codecs need libraries absent from this
environment; the generic ``DecodeStage``/``ResizeStage``/
``FrameSampleStage``/``FeatureExtractStage`` chain keeps those behind
clearly-marked ``NotImplementedError`` gates with deterministic fake
kernels so the Ray-side plumbing — binary schema, actor-pool signature,
small batches for large rows, struct output — is exercised end to end.

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


# --------------------------------------------------------------- image
# Deterministic netpbm (P5 gray / P6 RGB) synthesis: header params and the
# checkerboard pixel sum are CLOSED FORMS of doc_id.  netpbm is a real
# on-disk image format decodable with numpy alone, so — like the WAV
# kernel — the decode stage is REAL, not a digest fake: it must recover
# width/height/maxval from the header bytes and the pixel sum from the
# raster.

IMG_MAXVAL = 255


def _image_params(doc_id: int) -> dict:
    w = 8 + 2 * (doc_id % 8)            # even → exact half-and-half checker
    h = 8 + 2 * (doc_id % 4)
    ch = 1 if doc_id % 2 == 0 else 3
    a = doc_id % 256
    b = (7 * doc_id + 13) % 256
    return {
        "format": "P5" if ch == 1 else "P6",
        "width": w,
        "height": h,
        "maxval": IMG_MAXVAL,
        "n_channels": ch,
        "a": a,
        "b": b,
        "pixel_sum": (a + b) * (w * h // 2) * ch,
    }


def synth_netpbm(doc_id: int) -> bytes:
    """Binary netpbm checkerboard with doc_id-derived header params."""
    import numpy as np

    p = _image_params(doc_id)
    y, x = np.mgrid[0 : p["height"], 0 : p["width"]]
    plane = np.where((x + y) % 2 == 0, p["a"], p["b"]).astype(np.uint8)
    raster = np.repeat(plane[:, :, None], p["n_channels"], axis=2)
    header = f"{p['format']}\n# gcflow synthetic\n{p['width']} {p['height']}\n{p['maxval']}\n"
    return header.encode() + raster.tobytes()


def parse_netpbm(b: bytes):
    """Real binary-netpbm decode: whitespace/comment-tolerant header
    tokenizer + zero-copy numpy raster view.
    Returns (magic, width, height, maxval, pixels[h, w, ch])."""
    import numpy as np

    toks, i = [], 0
    while len(toks) < 4:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        toks.append(b[i:j])
        i = j
    i += 1  # exactly one whitespace byte separates maxval from the raster
    magic = toks[0].decode()
    ch = {"P5": 1, "P6": 3}[magic]
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * ch, offset=i)
    return magic, w, h, maxval, px.reshape(h, w, ch)


class ImageDecodeStage:
    """REAL image decode kernel (binary netpbm, numpy): payload bytes →
    header params + exact pixel sum.  Actor-pool shape identical to the
    gated generic DecodeStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rows = {k: [] for k in ("format", "width", "height", "maxval",
                                "n_channels", "pixel_sum")}
        for b in batch["payload"].to_pylist():
            magic, w, h, maxval, px = parse_netpbm(b)
            rows["format"].append(magic)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["maxval"].append(maxval)
            rows["n_channels"].append(px.shape[2])
            rows["pixel_sum"].append(int(px.sum(dtype=np.int64)))
        out = batch.drop_columns(["payload"])
        out = out.append_column("format", pa.array(rows["format"], type=pa.string()))
        for k in ("width", "height", "maxval", "n_channels", "pixel_sum"):
            out = out.append_column(k, pa.array(rows[k], type=pa.int64()))
        return out


def q_mm_image_meta(sf_dir: str):
    """Synthesized netpbm payloads → REAL numpy decode in an actor pool →
    header metadata + pixel sum.  Oracled: every output column is a
    closed form of doc_id the kernel must recover from the bytes."""

    def to_img(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array([synth_netpbm(i) for i in ids], type=pa.binary()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_img, batch_format="pyarrow", batch_size=256)
    return ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )


# --------------------------------------------------------------- video
# Deterministic YUV4MPEG2 synthesis: a real raw-video container (plain
# header + FRAME-delimited C420 planes) whose frame count and per-frame
# luma are closed forms of doc_id — the REAL frame-sampling kernel walks
# the container, samples every ``stride``-th frame and sums sampled luma.

VIDEO_STRIDE = 2


def _video_params(doc_id: int) -> dict:
    w = 16 + 2 * (doc_id % 4)
    h = 8 + 2 * (doc_id % 2)
    nf = 1 + doc_id % 5
    k = doc_id % 200                     # luma base; k + nf - 1 < 256
    ns = (nf + VIDEO_STRIDE - 1) // VIDEO_STRIDE
    return {
        "width": w,
        "height": h,
        "n_frames": nf,
        "luma_base": k,
        "n_sampled": ns,
        # sampled frames i ∈ {0, s, 2s, …}: Σ (k + i) · w·h
        "luma_sum": w * h * (ns * k + VIDEO_STRIDE * (ns * (ns - 1) // 2)),
    }


def synth_y4m(doc_id: int) -> bytes:
    """YUV4MPEG2 C420 clip: frame i's Y plane is constant (base + i),
    chroma planes neutral 128."""
    p = _video_params(doc_id)
    w, h = p["width"], p["height"]
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()]
    for i in range(p["n_frames"]):
        out.append(b"FRAME\n")
        out.append(bytes([p["luma_base"] + i]) * (w * h))
        out.append(bytes([128]) * (2 * (w // 2) * (h // 2)))
    return b"".join(out)


def parse_y4m(b: bytes):
    """Real YUV4MPEG2 parse: stream-header tags + FRAME-delimited C420
    planes.  Returns (width, height, [Y plane per frame])."""
    import numpy as np

    nl = b.index(b"\n")
    parts = b[:nl].decode().split(" ")
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    tags = {t[0]: t[1:] for t in parts[1:] if t}
    w, h = int(tags["W"]), int(tags["H"])
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    frames, i = [], nl + 1
    while i < len(b):
        fn = b.index(b"\n", i)
        if b[i : i + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        frames.append(np.frombuffer(b, np.uint8, count=w * h, offset=fn + 1))
        i = fn + 1 + frame_bytes
    return w, h, frames


class VideoFrameSampleStage:
    """REAL video frame-sampling kernel (YUV4MPEG2, numpy): walk the
    container, keep every ``stride``-th frame, report dims / frame counts
    / sampled-luma sum.  Same actor-pool shape as the gated generic
    FrameSampleStage (which still covers compressed containers needing
    ffmpeg)."""

    def __init__(self, stride: int = VIDEO_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rows = {k: [] for k in ("width", "height", "n_frames", "n_sampled",
                                "luma_sum")}
        for b in batch["payload"].to_pylist():
            w, h, frames = parse_y4m(b)
            picked = frames[:: self.stride]
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_frames"].append(len(frames))
            rows["n_sampled"].append(len(picked))
            rows["luma_sum"].append(
                int(sum(f.sum(dtype=np.int64) for f in picked))
            )
        out = batch.drop_columns(["payload"])
        for k, v in rows.items():
            out = out.append_column(k, pa.array(v, type=pa.int64()))
        return out


def q_mm_video_frames(sf_dir: str):
    """Synthesized y4m payloads → REAL frame-sampling decode in an actor
    pool.  Oracled: dims, frame counts and the sampled-luma sum are
    closed forms of doc_id recovered from the container bytes."""

    def to_vid(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array([synth_y4m(i) for i in ids], type=pa.binary()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_vid, batch_format="pyarrow", batch_size=128)
    return ds.map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=128,
        concurrency=(1, 4),
    )


# ----------------------------------------------------------------- png
# Deterministic PNG synthesis: a REAL compressed image format (zlib
# DEFLATE + per-scanline prediction filters), decodable with stdlib zlib
# + numpy alone — no imaging library needed.  Header params and the
# checkerboard pixel sum are CLOSED FORMS of doc_id; the encoder cycles
# through ALL FIVE filter types (None/Sub/Up/Average/Paeth, one per
# scanline) and splits the DEFLATE stream across two IDAT chunks, so the
# decode kernel must do real work: chunk walking + CRC verification,
# inflate, multi-IDAT reassembly, and per-filter reconstruction.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_params(doc_id: int) -> dict:
    w = 10 + 2 * (doc_id % 6)            # even → exact half-and-half checker
    h = 6 + doc_id % 5                   # ≥ 6 rows → all five filters used
    ct = 0 if doc_id % 3 == 0 else 2     # PNG color type: 0 gray, 2 RGB
    ch = 1 if ct == 0 else 3
    a = (3 * doc_id + 7) % 256
    b = (11 * doc_id + 29) % 256
    return {
        "width": w,
        "height": h,
        "bit_depth": 8,
        "color_type": ct,
        "n_channels": ch,
        "a": a,
        "b": b,
        "pixel_sum": (a + b) * (w * h // 2) * ch,
    }


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(left, up, upleft):
    """Vectorized Paeth predictor (PNG spec §9.4) over uint8 arrays."""
    import numpy as np

    l16 = left.astype(np.int16)
    u16 = up.astype(np.int16)
    ul16 = upleft.astype(np.int16)
    p = l16 + u16 - ul16
    pa_, pb_, pc_ = np.abs(p - l16), np.abs(p - u16), np.abs(p - ul16)
    return np.where(
        (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, up, upleft)
    ).astype("uint8")


def synth_png(doc_id: int) -> bytes:
    """Real PNG (8-bit gray or RGB checkerboard) with doc_id-derived
    params; scanline y uses filter type y % 5 and the DEFLATE stream is
    split across two IDAT chunks."""
    import struct
    import zlib

    import numpy as np

    p = _png_params(doc_id)
    w, h, ch = p["width"], p["height"], p["n_channels"]
    y, x = np.mgrid[0:h, 0:w]
    plane = np.where((x + y) % 2 == 0, p["a"], p["b"]).astype(np.uint8)
    raster = np.repeat(plane[:, :, None], ch, axis=2).reshape(h, w * ch)

    bpp = ch  # bytes per pixel at bit depth 8
    filtered = []
    prior = np.zeros(w * ch, dtype=np.uint8)
    for yy in range(h):
        raw = raster[yy]
        left = np.concatenate([np.zeros(bpp, np.uint8), raw[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]])
        f = yy % 5
        if f == 0:
            out = raw
        elif f == 1:
            out = raw - left                     # uint8 wrap == mod 256
        elif f == 2:
            out = raw - prior
        elif f == 3:
            out = raw - ((left.astype(np.uint16) + prior) // 2).astype(np.uint8)
        else:
            out = raw - _paeth(left, prior, upleft)
        filtered.append(bytes([f]) + out.tobytes())
        prior = raw
    z = zlib.compress(b"".join(filtered), 6)
    mid = max(1, len(z) // 2)                    # two IDAT chunks, always
    ihdr = struct.pack(">IIBBBBB", w, h, 8, p["color_type"], 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:mid])
        + _png_chunk(b"IDAT", z[mid:])
        + _png_chunk(b"IEND", b"")
    )


def parse_png(b: bytes):
    """Real PNG decode (stdlib zlib + numpy): chunk walk with CRC
    verification, multi-IDAT reassembly, inflate, and per-scanline
    filter reconstruction (all five types; Sub via per-lane cumsum,
    Average/Paeth via the spec's left-to-right recurrence).
    Returns (width, height, bit_depth, color_type, pixels[h, w, ch]).
    Supports the non-interlaced 8-bit gray/RGB subset this repo emits."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    i, ihdr, idat = 8, None, []
    while i < len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data = b[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(">I", b[i + 8 + length : i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
        raise ValueError("unsupported PNG variant (8-bit gray/RGB only)")
    ch = 1 if color_type == 0 else 3
    bpp, stride = ch, w * ch
    rows = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(rows) != h * (1 + stride):
        raise ValueError("truncated raster")
    rows = rows.reshape(h, 1 + stride)
    recon = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for yy in range(h):
        f, row = rows[yy, 0], rows[yy, 1:]
        if f == 0:
            r = row.copy()
        elif f == 1:  # Sub: per-channel-lane prefix sum mod 256
            lanes = row.reshape(w, bpp).astype(np.uint64)
            r = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            r = row + prior
        elif f in (3, 4):  # Average / Paeth: left-dependent recurrence
            r = np.zeros(stride, dtype=np.uint8)
            for xx in range(stride):
                left = int(r[xx - bpp]) if xx >= bpp else 0
                up = int(prior[xx])
                upleft = int(prior[xx - bpp]) if xx >= bpp else 0
                if f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - upleft)
                    pred = (
                        left
                        if pa_ <= pb_ and pa_ <= pc_
                        else (up if pb_ <= pc_ else upleft)
                    )
                r[xx] = (int(row[xx]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {f}")
        recon[yy] = r
        prior = r
    return w, h, bit_depth, color_type, recon.reshape(h, w, ch)


class PngDecodeStage:
    """REAL compressed-image decode kernel (PNG via stdlib zlib + numpy):
    payload bytes → header params + exact pixel sum.  The same actor-pool
    shape as the other typed kernels; this one closes the 'compressed
    media' gap for the one compressed image codec decodable without an
    imaging library (JPEG/MP4-class codecs stay behind the documented
    DecodeStage gates)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rows = {k: [] for k in ("width", "height", "bit_depth", "color_type",
                                "n_channels", "pixel_sum")}
        for b in batch["payload"].to_pylist():
            w, h, bd, ct, px = parse_png(b)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["bit_depth"].append(bd)
            rows["color_type"].append(ct)
            rows["n_channels"].append(px.shape[2])
            rows["pixel_sum"].append(int(px.sum(dtype=np.int64)))
        out = batch.drop_columns(["payload"])
        for k, v in rows.items():
            out = out.append_column(k, pa.array(v, type=pa.int64()))
        return out


def q_mm_png_meta(sf_dir: str):
    """Synthesized PNG payloads → REAL zlib+numpy decode in an actor pool
    (chunk CRC checks, two-IDAT inflate, all-five-filter reconstruction).
    Oracled: every output column is a closed form of doc_id the kernel
    must recover from the compressed bytes."""

    def to_png(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array([synth_png(i) for i in ids], type=pa.binary()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_png, batch_format="pyarrow", batch_size=256)
    return ds.map_batches(
        PngDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------- jpeg
# Baseline sequential JPEG (ITU-T T.81): a REAL entropy-coded DCT codec,
# en/decodable here with numpy + stdlib alone.  The synthesized images
# are grids of FLAT 8x8 blocks and the DC quant step is 8, so the DC
# coefficient 8*(v-128) quantizes with zero rounding error and the lossy
# codec becomes bit-exact on this fixture — every output column stays a
# closed form of doc_id.  The decoder nevertheless implements the general
# baseline path (marker walk, canonical DHT Huffman with byte-unstuffing,
# DC prediction + restart-marker resync, run-length AC with ZRL/EOB,
# zigzag dequantization, real 2-D IDCT); pytest drives the AC machinery
# with random coefficient blocks the fixture never emits.

def _zigzag_order() -> list[int]:
    """Raster index for each zigzag position (T.81 Figure 5), generated
    by diagonal traversal rather than transcribed."""
    out = []
    for s in range(15):
        ys = (
            range(min(s, 7), max(-1, s - 8), -1)
            if s % 2 == 0
            else range(max(0, s - 7), min(s, 7) + 1)
        )
        out.extend(y * 8 + (s - y) for y in ys)
    return out


_ZIGZAG = _zigzag_order()

# Annex K luminance DC table (code lengths 2..9 — exercises real
# variable-length canonical decoding).
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))

# Custom AC table covering the full baseline symbol set (EOB, ZRL, and
# every RRRRSSSS with S in 1..10): short codes for the common symbols,
# 10-bit codes for the tail.  Kraft sum 0.775 < 1 keeps the all-ones
# codeword unassigned as T.81 C.2 requires.
_AC_SHORT3 = (0x00, 0x01, 0x02, 0x11)          # EOB + tiny coeffs: 3 bits
_AC_SHORT5 = (0xF0, 0x03, 0x21, 0x12)          # ZRL + next tier: 5 bits
_AC_VALS = _AC_SHORT3 + _AC_SHORT5 + tuple(
    rs
    for rs in ([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    if rs not in _AC_SHORT3 + _AC_SHORT5
)
_AC_BITS = tuple(
    {3: len(_AC_SHORT3), 5: len(_AC_SHORT5), 10: len(_AC_VALS) - 8}.get(n, 0)
    for n in range(1, 17)
)


def _canonical_codes(bits, vals):
    """(symbol -> (code, length)) via T.81 Annex C code assignment."""
    table, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return table


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


def _jpeg_params(doc_id: int) -> dict:
    wb = 2 * (1 + doc_id % 3)                  # block columns: even → exact
    hb = 1 + doc_id % 2                        # half-and-half checker rows
    a = (5 * doc_id + 11) % 256
    b = (13 * doc_id + 17) % 256
    return {
        "width": 8 * wb,
        "height": 8 * hb,
        "n_blocks": wb * hb,
        "restart_interval": wb if doc_id % 2 == 1 else 0,
        "a": a,
        "b": b,
        "pixel_sum": 64 * (a + b) * (wb * hb // 2),
    }


# quant table, ZIGZAG order: DC step 8 (exact for integer flat blocks),
# AC step 16
_JPEG_QTAB = (8,) + (16,) * 63


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _magnitude(v: int) -> tuple[int, int]:
    """(category S, S-bit magnitude code) per T.81 F.1.2.1/F.1.2.2."""
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_blocks(blocks, restart_interval: int = 0) -> bytes:
    """Entropy-code quantized zigzag-ordered coefficient blocks into a
    JPEG scan (Huffman + stuffing + restart markers + DC prediction)."""
    w = _BitWriter()
    pred = 0
    for i, blk in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            w.pad_to_byte()
            w.out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
            pred = 0
        s, mag = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        w.write(*_DC_ENC[s])
        if s:
            w.write(mag, s)
        run = 0
        for zz in range(1, 64):
            v = int(blk[zz])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                w.write(*_AC_ENC[0xF0])        # ZRL: 16 zeros
                run -= 16
            s, mag = _magnitude(v)
            w.write(*_AC_ENC[(run << 4) | s])
            w.write(mag, s)
            run = 0
        if run:
            w.write(*_AC_ENC[0x00])            # EOB
    w.pad_to_byte()
    return bytes(w.out)


def _seg(marker: int, payload: bytes) -> bytes:
    import struct

    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(tc: int, th: int, bits, vals) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def synth_jpeg(doc_id: int) -> bytes:
    """Real baseline JPEG (grayscale, 1 component, 8-bit): flat 8x8
    checker blocks, Annex-K DC + full-coverage custom AC Huffman tables,
    DC-exact quantization, restart markers on odd doc_ids."""
    import struct

    import numpy as np

    p = _jpeg_params(doc_id)
    wb, hb = p["width"] // 8, p["height"] // 8
    blocks = []
    for bi in range(hb):
        for bj in range(wb):
            v = p["a"] if (bi + bj) % 2 == 0 else p["b"]
            blk = np.zeros(64, dtype=np.int32)
            blk[0] = v - 128                   # DC = 8*(v-128) / qDC(=8)
            blocks.append(blk)
    scan = _encode_blocks(blocks, p["restart_interval"])
    parts = [
        b"\xff\xd8",                           # SOI
        _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
        _seg(0xDB, bytes([0x00]) + bytes(_JPEG_QTAB)),
        _seg(
            0xC0,                              # SOF0: baseline sequential
            struct.pack(">BHHB", 8, p["height"], p["width"], 1)
            + bytes([1, 0x11, 0]),             # comp 1, no subsampling, qtab 0
        ),
        _seg(0xC4, _dht_payload(0, 0, _DC_BITS, _DC_VALS)),
        _seg(0xC4, _dht_payload(1, 0, _AC_BITS, _AC_VALS)),
    ]
    if p["restart_interval"]:
        parts.append(_seg(0xDD, struct.pack(">H", p["restart_interval"])))
    parts.append(_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])))
    parts.append(scan)
    parts.append(b"\xff\xd9")                  # EOI
    return b"".join(parts)


class _BitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs 0xFF 0x00
    and byte-aligns across restart markers."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        byte = self.d[self.pos]
        if byte == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt != 0x00:
                raise ValueError(
                    f"marker 0xFF{nxt:02X} inside entropy data"
                )
            self.pos += 2
        else:
            self.pos += 1
        return byte

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.acc = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, n: int) -> None:
        self.nbits = 0                         # discard pad bits
        if self.d[self.pos] != 0xFF or self.d[self.pos + 1] != 0xD0 + (n % 8):
            raise ValueError("missing or out-of-order restart marker")
        self.pos += 2


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_blocks(data, pos, n_blocks, dc_dec, ac_dec, restart_interval):
    """Entropy-decode n_blocks quantized zigzag blocks (inverse of
    _encode_blocks); returns (blocks, end_pos)."""
    import numpy as np

    r = _BitReader(data, pos)
    blocks, pred = [], 0
    for i in range(n_blocks):
        if restart_interval and i and i % restart_interval == 0:
            r.sync_restart(i // restart_interval - 1)
            pred = 0
        blk = np.zeros(64, dtype=np.int32)
        s = _huff_decode(r, dc_dec)
        pred += _extend(r.read_bits(s), s) if s else 0
        blk[0] = pred
        zz = 1
        while zz < 64:
            rs = _huff_decode(r, ac_dec)
            if rs == 0x00:                     # EOB
                break
            if rs == 0xF0:                     # ZRL
                zz += 16
                continue
            zz += rs >> 4
            if zz > 63:
                raise ValueError("AC run overflows block")
            s = rs & 0x0F
            blk[zz] = _extend(r.read_bits(s), s)
            zz += 1
        blocks.append(blk)
    return blocks, r.pos


def _idct_matrix():
    import numpy as np

    u = np.arange(8)
    m = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2
    m[0] /= np.sqrt(2)
    return m                                   # m[u, x]


def parse_jpeg(b: bytes):
    """Real baseline JPEG decode (numpy + stdlib struct): marker walk,
    canonical DHT Huffman with byte-unstuffing, DC prediction with
    restart-marker resync, run-length AC, zigzag dequantization, 2-D
    IDCT.  Supports the grayscale single-component non-subsampled subset
    this repo emits (the general multi-component/subsampled paths stay
    behind the DecodeStage env gates).
    Returns (width, height, n_blocks, restart_interval, pixels[h, w])."""
    import struct

    import numpy as np

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    qtabs, dc_dec, ac_dec = {}, None, None
    w = h = None
    restart_interval = 0
    comp_q = 0
    i = 2
    while i < len(b):
        if b[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = b[i + 1]
        if marker == 0xD9:                     # EOI
            raise ValueError("reached EOI before SOS")
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        payload = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:                     # DQT (8-bit tables only)
            j = 0
            while j < len(payload):
                pq, tq = payload[j] >> 4, payload[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(
                    payload[j + 1 : j + 65], np.uint8
                ).astype(np.int32)
                j += 65
        elif marker == 0xC0:                   # SOF0
            prec, h, w, nf = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or nf != 1 or payload[7] != 0x11:
                raise ValueError(
                    "unsupported JPEG variant (8-bit single-component "
                    "non-subsampled baseline only)"
                )
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xC4:                   # DHT
            j = 0
            while j < len(payload):
                tc = payload[j] >> 4
                bits = tuple(payload[j + 1 : j + 17])
                nv = sum(bits)
                vals = tuple(payload[j + 17 : j + 17 + nv])
                dec = {
                    (length, code): sym
                    for sym, (code, length) in _canonical_codes(bits, vals).items()
                }
                if tc == 0:
                    dc_dec = dec
                else:
                    ac_dec = dec
                j += 17 + nv
        elif marker == 0xDD:                   # DRI
            (restart_interval,) = struct.unpack(">H", payload)
        elif marker == 0xDA:                   # SOS → entropy data follows
            if w is None or dc_dec is None or ac_dec is None:
                raise ValueError("SOS before SOF0/DHT")
            i += 2 + seglen
            break
        i += 2 + seglen
    else:
        raise ValueError("no SOS marker")
    wb, hb = (w + 7) // 8, (h + 7) // 8
    blocks, _ = _decode_blocks(b, i, wb * hb, dc_dec, ac_dec, restart_interval)
    q = qtabs[comp_q]
    m = _idct_matrix()
    inv_zz = np.argsort(np.asarray(_ZIGZAG))   # raster idx -> zigzag pos
    img = np.empty((hb * 8, wb * 8), dtype=np.uint8)
    for k, blk in enumerate(blocks):
        coef = (blk * q)[inv_zz].reshape(8, 8).astype(np.float64)
        pix = m.T @ coef @ m + 128.0
        bi, bj = divmod(k, wb)
        img[bi * 8 : bi * 8 + 8, bj * 8 : bj * 8 + 8] = np.clip(
            np.rint(pix), 0, 255
        ).astype(np.uint8)
    return w, h, wb * hb, restart_interval, img[:h, :w]


class JpegDecodeStage:
    """REAL entropy-coded DCT decode kernel (baseline JPEG via numpy +
    stdlib): payload bytes → header params + exact pixel sum.  Same
    actor-pool shape as the other typed kernels; with PNG this closes
    the compressed-media gap for both codec families reachable without
    an imaging library (DEFLATE-predictive and Huffman-DCT)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        rows = {k: [] for k in ("width", "height", "n_blocks",
                                "restart_interval", "pixel_sum")}
        for b in batch["payload"].to_pylist():
            w, h, nb, ri, px = parse_jpeg(b)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_blocks"].append(nb)
            rows["restart_interval"].append(ri)
            rows["pixel_sum"].append(int(px.sum(dtype=np.int64)))
        out = batch.drop_columns(["payload"])
        for k, v in rows.items():
            out = out.append_column(k, pa.array(v, type=pa.int64()))
        return out


def q_mm_jpeg_meta(sf_dir: str):
    """Synthesized baseline JPEGs → REAL Huffman+IDCT decode in an actor
    pool.  Oracled: the DC-exact flat-block fixture makes the lossy codec
    bit-exact, so every output column is a closed form of doc_id the
    kernel must recover from the entropy-coded bytes."""

    def to_jpeg(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array([synth_jpeg(i) for i in ids], type=pa.binary()),
            }
        )

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).map_batches(to_jpeg, batch_format="pyarrow", batch_size=256)
    return ds.map_batches(
        JpegDecodeStage, batch_format="pyarrow", batch_size=256,
        concurrency=(1, 4),
    )


MULTIMODAL_QUERIES = {
    "mm_payload_meta": q_mm_payload_meta,
    "mm_audio_meta": q_mm_audio_meta,
    "mm_image_meta": q_mm_image_meta,
    "mm_video_frames": q_mm_video_frames,
    "mm_png_meta": q_mm_png_meta,
    "mm_jpeg_meta": q_mm_jpeg_meta,
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
    # closed-form twin of _image_params — recovered from netpbm bytes
    "mm_image_meta": """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'P5' ELSE 'P6' END AS format,
       CAST(8 + 2 * (doc_id % 8) AS BIGINT) AS width,
       CAST(8 + 2 * (doc_id % 4) AS BIGINT) AS height,
       CAST(255 AS BIGINT) AS maxval,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS n_channels,
       CAST(((doc_id % 256) + ((7 * doc_id + 13) % 256))
            * ((8 + 2 * (doc_id % 8)) * (8 + 2 * (doc_id % 4)) // 2)
            * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END) AS BIGINT) AS pixel_sum
FROM documents
""",
    # closed-form twin of _video_params (stride 2) — recovered from y4m bytes
    "mm_video_frames": """
WITH p AS (
  SELECT doc_id,
         16 + 2 * (doc_id % 4) AS w,
         8 + 2 * (doc_id % 2) AS h,
         1 + doc_id % 5 AS nf,
         (1 + doc_id % 5 + 1) // 2 AS ns,
         doc_id % 200 AS k
  FROM documents
)
SELECT doc_id,
       CAST(w AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(nf AS BIGINT) AS n_frames,
       CAST(ns AS BIGINT) AS n_sampled,
       CAST(w * h * (ns * k + ns * (ns - 1)) AS BIGINT) AS luma_sum
FROM p
""",
    # closed-form twin of _png_params — the kernel must recover these
    # from the DEFLATE-compressed bytes (CRC walk + inflate + unfilter)
    "mm_png_meta": """
SELECT doc_id,
       CAST(10 + 2 * (doc_id % 6) AS BIGINT) AS width,
       CAST(6 + doc_id % 5 AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 2 END AS BIGINT) AS color_type,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END AS BIGINT) AS n_channels,
       CAST((((3 * doc_id + 7) % 256) + ((11 * doc_id + 29) % 256))
            * ((10 + 2 * (doc_id % 6)) * (6 + doc_id % 5) // 2)
            * (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 3 END) AS BIGINT) AS pixel_sum
FROM documents
""",
    # closed-form twin of _jpeg_params — recovered from the Huffman
    # entropy-coded DCT bytes (the DC-exact fixture makes the lossy
    # codec bit-exact, so pixel_sum is exactly the checker closed form)
    "mm_jpeg_meta": """
WITH p AS (
  SELECT doc_id,
         2 * (1 + doc_id % 3) AS wb,
         1 + doc_id % 2 AS hb,
         (5 * doc_id + 11) % 256 AS a,
         (13 * doc_id + 17) % 256 AS b
  FROM documents
)
SELECT doc_id,
       CAST(8 * wb AS BIGINT) AS width,
       CAST(8 * hb AS BIGINT) AS height,
       CAST(wb * hb AS BIGINT) AS n_blocks,
       CAST(CASE WHEN doc_id % 2 = 1 THEN wb ELSE 0 END AS BIGINT)
           AS restart_interval,
       CAST(64 * (a + b) * (wb * hb // 2) AS BIGINT) AS pixel_sum
FROM p
""",
}
