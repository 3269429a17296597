"""Per-stage checkpoint + lineage manifests for resumability (SURVEY §7
step 7; north rule: "resumable from checkpoint with per-partition lineage
+ metrics").

The reference's resumability is idempotent temp-file protocol + hash-named
outputs (server.py:384-396). Here every pipeline stage can be materialized
through a ``LineageStore``:

- ``run_stage``: stage output parquet + a JSON manifest recording per-file
  rows and order-insensitive content checksums; a completed manifest makes
  re-runs read-through (idempotent restarts).
- ``run_bucketed_stage``: hash-bucketed incremental execution — input rows
  are assigned to ``n_buckets`` by a deterministic key; a restart
  anti-joins completed buckets away and processes the whole remainder as
  ONE bucket-partitioned Spark job (dynamic partition overwrite keeps
  finished buckets intact). This is the per-partition resume unit: at
  10^12-turn scale a stage is thousands of buckets and a preemption costs
  the remainder job, never completed buckets.

All metadata is plain JSON on the filesystem the output lives on (on a
real cluster: the object store next to the Iceberg tables).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageStore:
    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------

    def _mpath(self, stage: str) -> str:
        return os.path.join(self.base, f"{stage}.manifest.json")

    def _dpath(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def read_manifest(self, stage: str) -> dict | None:
        p = self._mpath(stage)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def _write_manifest(self, stage: str, payload: dict) -> None:
        tmp = self._mpath(stage) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f)
        os.replace(tmp, self._mpath(stage))  # atomic publish

    def _partition_metrics(self, spark: SparkSession, path: str) -> list[dict]:
        df = spark.read.parquet(path)
        cols = df.columns
        per_file = (
            df.withColumn("_file", F.input_file_name())
            .groupBy("_file")
            .agg(
                F.count("*").alias("rows"),
                F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("checksum"),
            )
            .collect()
        )
        return [
            {"file": os.path.basename(r["_file"]), "rows": r["rows"], "checksum": str(r["checksum"])}
            for r in per_file
        ]

    # -- whole-stage checkpoint --------------------------------------------

    def run_stage(self, spark: SparkSession, stage: str, build_fn) -> DataFrame:
        """Materialize ``build_fn()`` once; subsequent calls (including
        after a restart) read the parquet back without recompute."""
        man = self.read_manifest(stage)
        path = self._dpath(stage)
        if man and man.get("status") == "complete":
            return spark.read.parquet(path)
        df = build_fn()
        df.write.mode("overwrite").parquet(path)
        parts = self._partition_metrics(spark, path)
        self._write_manifest(
            stage,
            {
                "status": "complete",
                "stage": stage,
                "rows": sum(p["rows"] for p in parts),
                "partitions": parts,
                "ts": time.time(),
            },
        )
        return spark.read.parquet(path)

    # -- bucketed incremental stage ----------------------------------------

    def run_bucketed_stage(
        self,
        spark: SparkSession,
        stage: str,
        input_df: DataFrame,
        bucket_cols: list[str],
        transform_fn,
        n_buckets: int = 16,
    ) -> DataFrame:
        """Process ``input_df`` in deterministic hash buckets; resume skips
        completed buckets. ``transform_fn(df)`` must be keyed within
        ``bucket_cols`` groups (no cross-bucket joins — any group keyed by
        ``bucket_cols`` lands in exactly one bucket by construction) and
        preserve the ``_bucket`` column it receives.

        All REMAINING buckets run as ONE Spark job with
        ``partitionBy(_bucket)`` dynamic-overwrite output: completed
        buckets' directories are untouched (dynamic mode only replaces
        partitions present in the written data), and throughput is the
        cluster's, not one-bucket-at-a-time. The bucket remains the
        resume unit — a restart anti-joins ``done_buckets`` away; a crash
        mid-job redoes only the remainder job (in-job task failures are
        Spark's own retry domain)."""
        man = self.read_manifest(stage) or {
            "status": "in_progress",
            "stage": stage,
            "n_buckets": n_buckets,
            "done_buckets": [],
        }
        if man.get("status") == "complete":
            return spark.read.parquet(self._dpath(stage))
        done = set(man.get("done_buckets", []))

        bucketed = input_df.withColumn(
            "_bucket", F.pmod(F.hash(*bucket_cols), F.lit(n_buckets))
        )
        path = self._dpath(stage)
        remaining = bucketed
        if done:
            remaining = bucketed.where(~F.col("_bucket").isin(*sorted(done)))
        part = transform_fn(remaining)
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            part.write.mode("overwrite").partitionBy("_bucket").parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        man["done_buckets"] = sorted(set(range(n_buckets)))
        man["status"] = "complete"
        man["ts"] = time.time()
        parts = self._partition_metrics(spark, path)
        man["rows"] = sum(p["rows"] for p in parts)
        man["partitions"] = parts
        self._write_manifest(stage, man)
        return spark.read.parquet(path)
