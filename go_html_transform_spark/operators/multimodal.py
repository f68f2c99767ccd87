"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested; the actual codec step is STUBBED (this container ships
no image/audio libraries). ``decode_media`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder (seeded by
a JVM-computed content hash) produces stable feature vectors so the
distributed pipeline around the codec is fully exercisable.

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


def decode_media(
    df: DataFrame,
    kind: str | None = None,
    fake: bool = False,
    batch_meta: bool = True,
) -> DataFrame:
    """media rows -> (media_id, kind, content_hash, features:array<double>).

    ``mapInPandas`` streaming iterator: one Arrow batch in, one out —
    payload bytes never accumulate beyond a batch.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )
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

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
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
    """Image resize plumbing: (media_id, payload, meta) -> same schema with
    the payload re-encoded at (width, height) and meta updated. The codec
    is STUBBED like decode_media (no image libs in this container): with
    ``fake=True`` the "resized" payload is a deterministic content-digest
    byte stream of length width*height//64 — stable across runs and
    partitionings so the distributed pipeline (Arrow batch iterator,
    schema round-trip, meta rewrite) is fully testable; without it,
    NotImplementedError.

    Scale: one Arrow batch of blobs in flight per task (mapInPandas
    iterator); resize is embarrassingly parallel, so the only knobs that
    matter are maxRecordsPerBatch vs blob size and upstream content-hash
    dedupe so replicated blobs are resized once."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic stub resizer"
        )
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

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            metas = []
            for p in pdf["payload"]:
                seed = _content_digest(p)
                # deterministic pseudo-pixels from the digest (affine walk)
                raw = (seed + 31 * np.arange(n_bytes, dtype=np.int64)) % 251
                payloads.append(raw.astype(np.uint8).tobytes())
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
    frame through an exchange)."""
    if not fake:
        raise NotImplementedError(
            "video codecs are not available in this environment; "
            "pass fake=True for the deterministic stub extractor"
        )
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

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, feats = [], [], []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                if n_frames is None or n_frames <= 0:
                    continue
                seed = _content_digest(payload)
                for fi in range(0, int(n_frames), every_n):
                    base = (seed * 1315423911 + fi * 2654435761) % (1 << 31)
                    vec = (
                        (base + 97 * np.arange(N_FEATURES, dtype=np.int64))
                        % 1000
                    ) / 1000.0
                    ids.append(mid)
                    idxs.append(fi)
                    feats.append(vec.tolist())
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
