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


def _fake_decode(payload: bytes, seed: int) -> np.ndarray:
    """Deterministic stand-in for the codec: features derived from the
    content hash, independent of payload size. REPLACE with the real
    decoder (PIL/librosa/ffmpeg) on a cluster that ships codecs."""
    rng = np.random.default_rng(seed & 0x7FFFFFFF)
    return rng.random(N_FEATURES)


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
            feats = [
                _fake_decode(p, h)
                for p, h in zip(pdf["payload"], pdf["content_hash"])
            ]
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
