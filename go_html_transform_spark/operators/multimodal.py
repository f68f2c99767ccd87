"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested. Codecs come in two tiers: a REAL dependency-free tier
(stdlib-`wave` PCM WAV audio, binary PPM/PGM images, concatenated-PPM video
frames — `_real_decode`/`_decode_ppm`) that executes the non-fake path end
to end on formats this container can parse, and a deterministic FAKE tier
(``fake=True``, features seeded by a JVM-computable content digest) that
stays oracle-checkable for the DuckDB crosscheck. Formats outside the real
tier (JPEG/MP3/MP4 — codecs this container doesn't ship) fail fast with
``NotImplementedError``; on a cluster with PIL/librosa/ffmpeg, swap
`_real_decode`'s dispatch.

Scale notes: media blobs are large — the batch iterator processes one Arrow
batch at a time (bounded memory), `spark.sql.execution.arrow.maxRecordsPerBatch`
is the knob; feature extraction keys by content hash so replicated blobs
dedupe upstream with operators/dedup.exact_dedup before decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

N_FEATURES = 8


def with_content_hash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side content hash — dedupe key and fake-decoder seed."""
    return df.withColumn("content_hash", F.xxhash64(F.col(payload_col)))


def _content_digest(payload: bytes) -> int:
    """Byte-sum content digest mod P — SQL-expressible (DuckDB:
    list_sum(list_transform(string_split(text,''), c -> ascii(c)))), so
    the fake features below are oracle-checkable end to end."""
    from go_html_transform_spark.operators.dedup import MINHASH_P

    if not payload:
        return 0
    return int(np.frombuffer(payload, dtype=np.uint8).sum()) % MINHASH_P


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for the codec: features from the affine
    MinHash family over the byte-sum digest (integer-valued doubles —
    bit-exact in any engine; round 1 used np.random, which no oracle
    could reproduce). REPLACE with the real decoder (PIL/librosa/ffmpeg)
    on a cluster that ships codecs."""
    from go_html_transform_spark.operators.dedup import (
        MINHASH_A,
        MINHASH_B,
        MINHASH_P,
    )

    s = _content_digest(payload)
    a = np.array(
        [(2 * j + 1) * MINHASH_A % MINHASH_P for j in range(N_FEATURES)],
        dtype=np.int64,
    )
    b = np.array(
        [j * MINHASH_B % MINHASH_P for j in range(N_FEATURES)], dtype=np.int64
    )
    return ((s * a + b) % MINHASH_P).astype(np.float64)


# ---------------------------------------------------------------------------
# Real (dependency-free) codecs: PCM WAV via stdlib `wave`, binary PPM/PGM
# images, and concatenated-PPM "video" (MJPEG-style frame stream). These
# make the non-fake decode path honest end-to-end on formats this container
# can actually parse; anything else still fails fast with the codec error.
# ---------------------------------------------------------------------------


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(samples as float64 in [-1, 1], sample_rate) from a PCM RIFF/WAV."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    return x, sr


def _decode_ppm(payload: bytes, offset: int = 0) -> tuple[int, int, int, np.ndarray, int]:
    """Parse one binary PPM (P6) / PGM (P5) image starting at ``offset``.
    Returns (width, height, channels, pixels uint8, next_offset) so a
    concatenated frame stream can be walked frame by frame."""
    magic = payload[offset : offset + 2]
    if magic not in (b"P6", b"P5"):
        raise NotImplementedError(f"unsupported image magic {magic!r}")
    channels = 3 if magic == b"P6" else 1
    pos = offset + 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = w * h * channels
    pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return w, h, channels, pix, pos + n


def _image_features(w: int, h: int, channels: int, pix: np.ndarray) -> np.ndarray:
    x = pix.astype(np.float64)
    per_ch = x.reshape(-1, channels)
    return np.array(
        [
            float(w),
            float(h),
            float(x.mean()),
            float(x.std()),
            float(x.min()),
            float(x.max()),
            float(per_ch[:, 0].mean()),
            float(per_ch[:, -1].mean()),
        ]
    )


def _audio_features(x: np.ndarray, sr: int) -> np.ndarray:
    if len(x) == 0:
        return np.zeros(N_FEATURES)
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return np.array(
        [
            float(len(x)),
            float(sr),
            float(x.mean()),
            float(x.std()),
            float(x.min()),
            float(x.max()),
            float(np.sqrt((x * x).mean())),
            zc / max(1, len(x) - 1),
        ]
    )


def _real_decode(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: RIFF/WAV audio or PPM/PGM image. Raises
    for formats this container has no codec for — the honest boundary."""
    if payload is None or len(payload) < 2:
        return np.zeros(N_FEATURES)
    if payload[:4] == b"RIFF":
        return _audio_features(*_decode_wav(payload))
    if payload[:2] in (b"P6", b"P5"):
        w, h, c, pix, _ = _decode_ppm(payload)
        return _image_features(w, h, c, pix)
    raise NotImplementedError(
        f"no codec for payload magic {bytes(payload[:4])!r}; supported "
        "real formats: PCM WAV (RIFF), binary PPM/PGM"
    )


def decode_media(
    df: DataFrame,
    kind: str | None = None,
    fake: bool = False,
    batch_meta: bool = True,
) -> DataFrame:
    """media rows -> (media_id, kind, content_hash, features:array<double>).

    ``fake=False`` runs the REAL dependency-free codecs (PCM WAV audio,
    binary PPM/PGM images — _real_decode) and fails fast on any other
    format; ``fake=True`` keeps the deterministic oracle-checkable stub.

    ``mapInPandas`` streaming iterator: one Arrow batch in, one out —
    payload bytes never accumulate beyond a batch.
    """
    src = with_content_hash(df)
    if kind is not None:
        src = src.filter(F.col("kind") == kind)

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("content_hash", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    decode = _fake_decode if fake else _real_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content_hash": pdf["content_hash"],
                    "features": [list(f) for f in feats],
                }
            )

    return src.select("media_id", "kind", "payload", "content_hash").mapInPandas(
        decode_batches, out_schema
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands (media_id, n_frames) into the
    frame indices to decode — pure Column arithmetic; the decode itself is
    the stubbed codec above."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Image resize: (media_id, payload, meta) -> same schema with the
    payload re-encoded at (width, height) and meta updated.

    ``fake=False`` REALLY resizes binary PPM/PGM payloads — decode
    (_decode_ppm), nearest-neighbor resample (numpy index gather), P6/P5
    re-encode — and raises on formats without a codec here. ``fake=True``
    keeps the deterministic content-digest stub (stable across runs and
    partitionings so the distributed pipeline — Arrow batch iterator,
    schema round-trip, meta rewrite — is oracle-testable).

    Scale: one Arrow batch of blobs in flight per task (mapInPandas
    iterator); resize is embarrassingly parallel, so the only knobs that
    matter are maxRecordsPerBatch vs blob size and upstream content-hash
    dedupe so replicated blobs are resized once."""
    src = with_content_hash(df.filter(F.col("kind") == "image"))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField(
                "meta",
                MEDIA_SCHEMA["meta"].dataType,
            ),
        ]
    )
    n_bytes = max(1, width * height // 64)

    def real_resize(p: bytes) -> bytes:
        w, h, c, pix, _ = _decode_ppm(p)
        img = pix.reshape(h, w, c)
        ys = (np.arange(height) * h) // height
        xs = (np.arange(width) * w) // width
        out = img[ys][:, xs]  # nearest-neighbor gather
        magic = b"P6" if c == 3 else b"P5"
        header = magic + f"\n{width} {height}\n255\n".encode()
        return header + out.tobytes()

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            metas = []
            for p in pdf["payload"]:
                if fake:
                    seed = _content_digest(p)
                    # deterministic pseudo-pixels (affine digest walk)
                    raw = (seed + 31 * np.arange(n_bytes, dtype=np.int64)) % 251
                    payloads.append(raw.astype(np.uint8).tobytes())
                else:
                    payloads.append(real_resize(p))
                metas.append(
                    {"width": width, "height": height,
                     "sample_rate": None, "n_frames": None}
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return src.select("media_id", "kind", "payload").mapInPandas(
        resize_batches, out_schema
    )


def extract_frames(
    df: DataFrame,
    every_n: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Video frame extraction: frame_sample_plan x payload -> one feature
    row per sampled frame. Codec STUBBED like decode_media: with
    ``fake=True`` each frame's feature vector derives deterministically
    from (content digest, frame_idx) — stable across runs/partitionings;
    without it, NotImplementedError.

    Plan shape: the sample plan is pure Column arithmetic on metadata;
    payload travels ONCE per media row into the Arrow batch, frames
    explode INSIDE the Python worker (never shipping the blob per
    frame through an exchange).

    ``fake=False`` decodes a REAL concatenated-PPM frame stream (binary
    P6 images back to back — the dependency-free analogue of MJPEG):
    every ``every_n``-th frame is parsed and emits its image-stat
    feature vector. Other containers raise (no ffmpeg here)."""
    src = df.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField(
                "features", T.ArrayType(T.DoubleType()), nullable=False
            ),
        ]
    )

    def fake_frame(payload: bytes, fi: int) -> list[float]:
        seed = _content_digest(payload)
        base = (seed * 1315423911 + fi * 2654435761) % (1 << 31)
        vec = (
            (base + 97 * np.arange(N_FEATURES, dtype=np.int64)) % 1000
        ) / 1000.0
        return vec.tolist()

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                if fake:
                    if n_frames is None or n_frames <= 0:
                        continue
                    for fi in range(0, int(n_frames), every_n):
                        ids.append(mid)
                        idxs.append(fi)
                        feats.append(fake_frame(payload, fi))
                    continue
                # real path: walk the concatenated-PPM stream; only the
                # sampled frames' pixels are materialized as features
                off, fi = 0, 0
                while off < len(payload):
                    w, h, c, pix, off = _decode_ppm(payload, off)
                    if fi % every_n == 0:
                        ids.append(mid)
                        idxs.append(fi)
                        feats.append(list(_image_features(w, h, c, pix)))
                    fi += 1
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "features": feats}
            )

    return src.mapInPandas(frame_batches, out_schema)


def chunk_audio(
    df: DataFrame,
    chunk_seconds: int = 5,
    fake: bool = False,
) -> DataFrame:
    """Audio chunking: split each audio payload into fixed-duration
    windows — (media_id, chunk_idx, start_s, payload_slice). The chunk
    COUNT comes from metadata (sample_rate x assumed bytes/sample vs
    payload length); slicing the real byte range is plumbing that works
    on any payload, so this path has no codec stub to gate — decode of a
    slice still goes through decode_media.

    Chunk boundaries are pure arithmetic; the blob is sliced inside the
    Arrow batch (one pass, bounded memory)."""
    _ = fake  # kept for signature symmetry with the codec-gated ops
    src = df.filter(F.col("kind") == "audio").select(
        "media_id", "payload", F.col("meta.sample_rate").alias("sample_rate")
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("start_s", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, blobs = [], [], [], []
            for mid, payload, sr in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"]
            ):
                if payload is None or sr is None or sr <= 0:
                    continue
                step = int(sr) * 2 * chunk_seconds  # 16-bit mono bytes
                if step <= 0:
                    continue
                n = (len(payload) + step - 1) // step
                for ci in range(n):
                    ids.append(mid)
                    idxs.append(ci)
                    starts.append(ci * chunk_seconds)
                    blobs.append(bytes(payload[ci * step : (ci + 1) * step]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "start_s": starts,
                    "payload": blobs,
                }
            )

    return src.mapInPandas(chunk_batches, out_schema)
