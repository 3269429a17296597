"""Per-stage checkpoint + lineage manifests for resumability (SURVEY §7
step 7; north rule: "resumable from checkpoint with per-partition lineage
+ metrics").

The reference's resumability is idempotent temp-file protocol + hash-named
outputs (server.py:384-396) — crucially *hash-named*: a changed input gets
a new temp file, never a stale read. Here every pipeline stage can be
materialized through a ``LineageStore`` with the same two properties:

- ``run_stage``: stage output parquet + a JSON manifest recording row
  count (captured via ``df.observe`` **during the write** — the stage
  pays exactly one scan; per-file checksums are an opt-in second pass,
  ``verify=True``, for audit jobs only), wall time, and a caller-supplied
  ``fingerprint`` of (config, inputs, code version). A completed manifest
  makes re-runs read-through (idempotent restarts) — but ONLY while the
  fingerprint still matches; a changed fingerprint invalidates the stage
  instead of silently returning stale parquet.
- ``run_bucketed_stage``: hash-bucketed incremental execution — input rows
  are assigned to ``n_buckets`` by a deterministic key; remaining buckets
  run as ``progress_jobs`` bucket-partitioned sub-jobs (dynamic partition
  overwrite keeps finished buckets intact), with the manifest updated
  after each sub-job. Resume granularity is therefore
  ``n_buckets / progress_jobs`` buckets: a preemption costs at most the
  in-flight sub-job, never completed sub-jobs. The tradeoff is explicit —
  each sub-job re-scans the input to filter its buckets (``_bucket`` is a
  computed column, so the filter cannot push down), so ``progress_jobs``
  trades input scans for resume granularity; set it to 1 for
  scan-once/no-intermediate-progress, higher when preemption is likely.

All metadata is plain JSON on the filesystem the output lives on (on a
real cluster: the object store next to the Iceberg tables).
"""

from __future__ import annotations

import itertools
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

# distinguishes the current bucketed-partition directory layout
# (``_bucket=N/``); manifests written by older code (``bucket=N/`` dirs)
# lack the marker and are treated as stale rather than resumed against a
# conflicting layout.
_BUCKET_LAYOUT = "_bucket"

_obs_counter = itertools.count()


def _chunk_key(chunk) -> str:
    return ",".join(str(b) for b in sorted(chunk))


def _chunk_rows_map(man: dict) -> dict:
    """Per-chunk row counts, keyed by the chunk's bucket ids so a chunk
    re-run after a crash-between-write-and-manifest overwrites its entry
    instead of double-counting. Manifests written before this key existed
    carry their accumulated total forward as a one-time baseline."""
    rows_by = man.get("rows_by_chunk")
    if rows_by is None:
        rows_by = man["rows_by_chunk"] = (
            {"_legacy": man["rows_done"]} if man.get("rows_done") else {}
        )
    return rows_by


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
        """Audit pass: per-file rows + order-insensitive content checksums.
        A FULL second scan of the stage output — opt-in (``verify=True``)
        because at 100 TB it doubles stage read I/O; the default row
        metric comes free from ``df.observe`` at write time."""
        df = spark.read.parquet(path)
        cols = [c for c in df.columns if c != "_bucket"]
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

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        build_fn,
        fingerprint: str | None = None,
        verify: bool = False,
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Materialize ``build_fn()`` once; subsequent calls (including
        after a restart) read the parquet back without recompute — unless
        ``fingerprint`` no longer matches the manifest's, in which case
        the stage is recomputed (config/input/code drift invalidation).

        Row count is observed during the single write pass; ``verify=True``
        additionally runs the per-file checksum audit scan.

        ``extra_metrics`` (name -> aggregate Column) ride the SAME
        write-pass observation and land in the manifest as strings under
        ``"metrics"`` — callers that need an aggregate of the stage
        output (e.g. the CC convergence signature) read it from the
        manifest instead of paying a second full scan of the parquet
        they just wrote. Absent from manifests written before this field
        existed — callers must fall back to scanning when missing."""
        man = self.read_manifest(stage)
        path = self._dpath(stage)
        if man and man.get("status") == "complete":
            if fingerprint is None or man.get("fingerprint") == fingerprint:
                return spark.read.parquet(path)
            # fingerprint drift: fall through and recompute
        if extra_metrics and "rows" in extra_metrics:
            raise ValueError(
                "extra_metrics name 'rows' is reserved (the built-in row "
                "count) — a duplicate alias would corrupt the manifest"
            )
        t0 = time.time()
        df = build_fn()
        obs = Observation(f"lineage_{stage}_{next(_obs_counter)}")
        aggs = [F.count(F.lit(1)).alias("rows")]
        for name, col in (extra_metrics or {}).items():
            aggs.append(col.alias(name))
        df.observe(obs, *aggs).write.mode("overwrite").parquet(path)
        got = obs.get
        payload = {
            "status": "complete",
            "stage": stage,
            "rows": got["rows"],
            "fingerprint": fingerprint,
            "wall_sec": round(time.time() - t0, 3),
            "ts": time.time(),
        }
        if extra_metrics:
            payload["metrics"] = {k: str(got[k]) for k in extra_metrics}
        if verify:
            payload["partitions"] = self._partition_metrics(spark, path)
        self._write_manifest(stage, payload)
        return spark.read.parquet(path)

    # -- file-bucketed incremental stage -----------------------------------

    def run_file_bucketed_stage(
        self,
        spark: SparkSession,
        stage: str,
        input_df: DataFrame,
        transform_fn,
        n_buckets: int = 16,
        progress_jobs: int = 4,
        fingerprint: str | None = None,
        files: list[str] | None = None,
    ) -> DataFrame:
        """Incremental stage for PER-ROW transforms over a bare file scan:
        buckets are groups of input FILES (deterministic name hash) and
        each sub-job READS ONLY its buckets' files — unlike
        :meth:`run_bucketed_stage`, whose computed ``_bucket`` filter
        cannot push down and therefore rescans the full input once per
        sub-job (measured +28% on the 30M-turn extract at
        ``progress_jobs=4``). Here total scan cost across all sub-jobs is
        one pass, so resume granularity is ~free.

        Caller contract (enforced by the pipeline, not checkable here):
        ``transform_fn`` must be row-local — rows co-bucket by file, not
        by any key, so ANY cross-row grouping inside the transform sees
        only a file-subset. For keyed transforms use
        :meth:`run_bucketed_stage`.

        ``input_df`` must be a bare scan (no filters/projections): the
        sub-jobs re-read the listed files directly, so any plan on top
        of the scan would be silently dropped — callers verify via
        plan-leaf inspection before routing here (see
        ``resolve_entities``). Bucket->file assignment is stable across
        driver restarts (crc32 of the file path), and the fingerprint
        carries the input identity, so resume never mixes file sets."""
        import zlib
        from functools import reduce

        # the caller (resolve_entities) already listed the files to gate
        # the route — accept that listing instead of paying a second
        # O(files) driver walk; None keeps this method self-sufficient
        if files is None:
            files = sorted(input_df.inputFiles())
        if not files:
            raise ValueError(
                "run_file_bucketed_stage requires file-backed input; use "
                "run_bucketed_stage (hash buckets) for in-memory relations"
            )
        man = self.read_manifest(stage)
        if man is not None and (
            man.get("layout") != f"{_BUCKET_LAYOUT}-files"
            or man.get("n_buckets") != n_buckets
            or (fingerprint is not None and man.get("fingerprint") != fingerprint)
        ):
            man = None
        path = self._dpath(stage)
        if man is None and os.path.exists(path):
            shutil.rmtree(path)  # see run_bucketed_stage: stale-dir hazard
        if man is None:
            man = {
                "status": "in_progress",
                "stage": stage,
                "layout": f"{_BUCKET_LAYOUT}-files",
                "n_buckets": n_buckets,
                "fingerprint": fingerprint,
                "done_buckets": [],
            }
        if man.get("status") == "complete":
            return spark.read.parquet(path)
        done = set(man.get("done_buckets", []))
        remaining = [b for b in range(n_buckets) if b not in done]

        bucket_files: dict[int, list[str]] = {b: [] for b in range(n_buckets)}
        for f in files:
            bucket_files[zlib.crc32(f.encode()) % n_buckets].append(f)
        schema = input_df.schema
        n_jobs = max(1, min(progress_jobs, len(remaining)))
        chunks = [remaining[i::n_jobs] for i in range(n_jobs)]
        # Deliberately NO scan-split-size tuning here: shrinking
        # spark.sql.files.maxPartitionBytes so each bucket's scan yields
        # >= cores partitions (to skip the transform's parallelism-floor
        # repartition) was A/B-measured at the 30M-turn corpus and LOST —
        # stage wall +21% (mean 255.5s tuned vs 211.9s untuned,
        # .scratch/fb_tune_ab.json): Arrow-UDF scans pay per-task worker
        # batch-pipeline setup, so many small scan tasks cost more than
        # the one narrow repartition shuffle they avoid.
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        t0 = time.time()
        rows_by = _chunk_rows_map(man)
        try:
            for chunk in chunks:
                parts = [
                    transform_fn(
                        spark.read.schema(schema).parquet(*bucket_files[b])
                    ).withColumn("_bucket", F.lit(b))
                    for b in chunk
                    if bucket_files[b]
                ]
                if parts:
                    out = reduce(lambda x, y: x.unionByName(y), parts)
                    obs = Observation(f"lineage_{stage}_{next(_obs_counter)}")
                    out.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                        "overwrite"
                    ).partitionBy("_bucket").parquet(path)
                    # keyed (not accumulated): a crash between the parquet
                    # write and this manifest write re-runs the chunk, and
                    # a re-recorded key overwrites instead of double-counting
                    rows_by[_chunk_key(chunk)] = int(obs.get["rows"])
                    man["rows_done"] = sum(rows_by.values())
                done.update(chunk)  # file-less buckets complete trivially
                man["done_buckets"] = sorted(done)
                self._write_manifest(stage, man)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        man["status"] = "complete"
        man["rows"] = man.get("rows_done", 0)
        man["wall_sec"] = round(time.time() - t0, 3)
        man["ts"] = time.time()
        self._write_manifest(stage, man)
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
        progress_jobs: int = 4,
        fingerprint: str | None = None,
    ) -> DataFrame:
        """Process ``input_df`` in deterministic hash buckets; resume skips
        completed buckets. ``transform_fn(df)`` must be keyed within
        ``bucket_cols`` groups (no cross-bucket joins — any group keyed by
        ``bucket_cols`` lands in exactly one bucket by construction) and
        preserve the ``_bucket`` column it receives.

        Remaining buckets run as ``min(progress_jobs, remaining)``
        bucket-partitioned Spark sub-jobs with ``partitionBy(_bucket)``
        dynamic-overwrite output; the manifest's ``done_buckets`` is
        updated after EACH sub-job, so a preemption costs at most one
        in-flight sub-job (in-job task failures remain Spark's own retry
        domain). Completed buckets' directories are untouched — dynamic
        mode only replaces partitions present in the written data.

        Manifests from the pre-``_bucket=`` layout (no ``layout`` marker)
        or with a different ``n_buckets``/``fingerprint`` are stale: the
        stage restarts from zero buckets rather than resuming against
        incompatible output."""
        man = self.read_manifest(stage)
        if man is not None and (
            man.get("layout") != _BUCKET_LAYOUT
            or man.get("n_buckets") != n_buckets
            or (fingerprint is not None and man.get("fingerprint") != fingerprint)
        ):
            man = None  # incompatible prior run: restart from scratch
        path = self._dpath(stage)
        if man is None and os.path.exists(path):
            # restart-from-scratch MUST clear prior output: dynamic
            # partition overwrite only replaces partitions present in the
            # newly written data, so a stale ``_bucket=N`` dir from an
            # invalidated/um-manifested run would survive (and duplicate
            # or resurrect rows) whenever the new run writes fewer or
            # different buckets
            shutil.rmtree(path)
        if man is None:
            man = {
                "status": "in_progress",
                "stage": stage,
                "layout": _BUCKET_LAYOUT,
                "n_buckets": n_buckets,
                "fingerprint": fingerprint,
                "done_buckets": [],
            }
        if man.get("status") == "complete":
            return spark.read.parquet(path)
        done = set(man.get("done_buckets", []))
        remaining = [b for b in range(n_buckets) if b not in done]

        bucketed = input_df.withColumn(
            "_bucket", F.pmod(F.hash(*bucket_cols), F.lit(n_buckets))
        )
        n_jobs = max(1, min(progress_jobs, len(remaining)))
        chunks = [remaining[i::n_jobs] for i in range(n_jobs)]
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        t0 = time.time()
        rows_by = _chunk_rows_map(man)
        try:
            for chunk in chunks:
                part = transform_fn(bucketed.where(F.col("_bucket").isin(chunk)))
                obs = Observation(f"lineage_{stage}_{next(_obs_counter)}")
                part.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                    "overwrite"
                ).partitionBy("_bucket").parquet(path)
                # keyed (not accumulated): see run_file_bucketed_stage
                rows_by[_chunk_key(chunk)] = int(obs.get["rows"])
                done.update(chunk)
                man["done_buckets"] = sorted(done)
                man["rows_done"] = sum(rows_by.values())
                self._write_manifest(stage, man)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        man["status"] = "complete"
        man["rows"] = man.get("rows_done", 0)
        man["wall_sec"] = round(time.time() - t0, 3)
        man["ts"] = time.time()
        self._write_manifest(stage, man)
        return spark.read.parquet(path)
