"""Incremental maintenance of corpus statistics over ManifestTable
snapshots — the "don't rescan 100 TB to update a histogram" layer.

Every sketch in operators/sketches.py that the stats suite maintains is
EXACTLY mergeable:

* token tf            — union + groupBy sum
* count-min sketch    — cell-wise sum (the CMS merge property, pinned in
                        tests/test_sketches.py)
* length histogram    — bucket-wise sum
* KMV distinct sketch — union, distinct, re-take the k smallest

so stats(snapshot N) == merge(stats(snapshot N-1), stats(new files)),
bit-exactly — not approximately. ``update`` therefore scans ONLY the
data files the manifest added since the last maintained snapshot: at a
10^12-row table receiving 0.1% daily appends, the daily stats job reads
0.1% of the data instead of 100 TB.

State layout (all under ``store``):

    <store>/v-<snapshot>/<stat>/   parquet per maintained stat
    <store>/META                   atomic pointer {snapshot, version dir}

The META pointer is os.replace()'d after all stat dirs of the new
version are written — a killed update leaves the previous version
intact (the manifest_table commit discipline).

Append-only contract: ManifestTable.append() only ever ADDS files, so
the delta is well-defined. ``update`` detects a non-append history
(files vanished — an overwrite) and falls back to a full recompute of
the current snapshot, which is always correct.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_html_transform_spark.operators import dedup as D
from go_html_transform_spark.operators import sketches as SK
from go_html_transform_spark.sources.manifest_table import ManifestTable

STATS = ("tf", "cms", "len_hist", "kmv")


class IncrementalCorpusStats:
    def __init__(self, spark: SparkSession, store: str):
        self.spark = spark
        self.store = store
        os.makedirs(store, exist_ok=True)

    # -- pointer ---------------------------------------------------------

    def _meta(self) -> dict:
        try:
            with open(os.path.join(self.store, "META")) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"snapshot": 0, "version": None, "paths": []}

    def last_snapshot(self) -> int:
        return self._meta()["snapshot"]

    def stat(self, name: str) -> DataFrame:
        """Current maintained stat as a DataFrame (raises before the
        first update)."""
        meta = self._meta()
        if meta["version"] is None:
            raise ValueError("no maintained stats yet — call update()")
        return self.spark.read.parquet(
            os.path.join(self.store, meta["version"], name)
        )

    # -- stat computation ------------------------------------------------

    def _compute(self, df: DataFrame) -> dict[str, DataFrame]:
        return {
            "tf": SK.token_frequencies(df),
            "cms": SK.count_min_sketch(df),
            "len_hist": SK.length_histogram(df),
            "kmv": SK.kmv_sketch(df, D.shingles3(F.col("tokens"))),
        }

    def _merge(
        self, old: dict[str, DataFrame], delta: dict[str, DataFrame]
    ) -> dict[str, DataFrame]:
        tf = (
            old["tf"].unionByName(delta["tf"])
            .groupBy("token")
            .agg(F.sum("tf").alias("tf"))
        )
        cms = (
            old["cms"].unionByName(delta["cms"])
            .groupBy("r", "cell")
            .agg(F.sum("cnt").alias("cnt"))
        )
        lh = (
            old["len_hist"].unionByName(delta["len_hist"])
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        kmv = (
            old["kmv"].unionByName(delta["kmv"])
            .select("h")
            .distinct()
            .orderBy("h")
            .limit(SK.KMV_K)
        )
        return {"tf": tf, "cms": cms, "len_hist": lh, "kmv": kmv}

    # -- update ----------------------------------------------------------

    def update(self, table: ManifestTable) -> dict:
        """Advance the maintained stats to the table's current snapshot.
        Returns {"snapshot", "files_scanned", "mode"} where mode is
        "noop" | "incremental" | "full"."""
        meta = self._meta()
        cur = table.current_snapshot_id()
        if cur == meta["snapshot"]:
            return {"snapshot": cur, "files_scanned": 0, "mode": "noop"}

        cur_paths = [f.path for f in table.files(snapshot=cur)]
        old_paths = set(meta["paths"])
        appended_only = old_paths.issubset(set(cur_paths))
        new_paths = [p for p in cur_paths if p not in old_paths]

        if meta["version"] is not None and appended_only and new_paths:
            delta_df = self.spark.read.parquet(*new_paths)
            stats = self._merge(
                {s: self.stat(s) for s in STATS}, self._compute(delta_df)
            )
            mode, scanned = "incremental", len(new_paths)
        elif meta["version"] is not None and appended_only:
            # snapshot bumped with zero new files (empty append)
            stats = {s: self.stat(s) for s in STATS}
            mode, scanned = "incremental", 0
        else:
            # first update, or an overwrite broke append-only: recompute
            full_df = table.scan(self.spark, snapshot=cur)
            stats = self._compute(full_df)
            mode, scanned = "full", len(cur_paths)

        vdir = f"v-{cur}"
        vpath = os.path.join(self.store, vdir)
        if os.path.exists(vpath):
            shutil.rmtree(vpath)
        for name, df in stats.items():
            df.write.parquet(os.path.join(vpath, name))
        tmp = os.path.join(self.store, "META.tmp")
        with open(tmp, "w") as f:
            json.dump({"snapshot": cur, "version": vdir, "paths": cur_paths}, f)
        os.replace(tmp, os.path.join(self.store, "META"))
        # retire the superseded version dir (readers of the old pointer
        # finished before the swap in this single-driver model)
        if meta["version"] and meta["version"] != vdir:
            shutil.rmtree(os.path.join(self.store, meta["version"]),
                          ignore_errors=True)
        return {"snapshot": cur, "files_scanned": scanned, "mode": mode}
