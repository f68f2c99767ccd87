"""Sinks: the RenderNodes analogue (/root/reference/h5/h5.go:40-54) —
serialize the transformed corpus back out.

On a production cluster the sink is an Iceberg table
(``df.writeTo(tbl).append()``) and lineage records the Iceberg
``snapshot_id``. The sandbox has no Iceberg runtime jars, so the writer
degrades to partitioned parquet and the "snapshot id" becomes a content
fingerprint; the interface is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_sequences(
    df: DataFrame,
    target: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = ("source",),
) -> None:
    """Write the sequence table. ``target`` is an Iceberg table name when a
    catalog is configured, else a parquet path. Partitioned by low-
    cardinality ``source`` (20 values) — NOT by doc_id (10^8 values would
    be a small-files disaster at 10^12 rows)."""
    spark = df.sparkSession
    if "." in target and iceberg_available(spark):
        writer = df.writeTo(target)
        (writer.append if mode == "append" else writer.createOrReplace)()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def snapshot_id(spark: SparkSession, source_path: str) -> str:
    """Input snapshot identifier for lineage rows. Iceberg: the current
    snapshot-id. Parquet sandbox: a cheap content fingerprint (file list +
    sizes hashed JVM-side)."""
    try:
        files = spark.read.parquet(source_path).inputFiles()
    except Exception:
        return "unknown"
    fp = spark.createDataFrame([(f,) for f in sorted(files)], "f string").agg(
        F.sum(F.xxhash64("f")).alias("h")
    )
    return f"parquet:{fp.collect()[0].h & 0xFFFFFFFFFFFF:012x}"
