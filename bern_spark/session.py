"""SparkSession factory with the scale-oriented defaults this engine assumes.

The reference is single-node (server.py:522-523 bounded queue; one GPU);
scale-out is this rebuild's reason for being, so every knob that matters at
100 TB is set explicitly here and documented.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "bern_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the ER pipeline.

    Local testing uses ``local[N]``; on a real cluster the same configs hold
    (shuffle partitions scale with input via AQE coalescing).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 32)))
    )

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-plan — coalesce small shuffle partitions, split
        # skewed ones (the hot-block defense the reference never needs
        # because its "blocks" are single documents).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the only Python<->JVM path we allow (input_hint: no
        # per-row Python). Batch size mirrors the reference's explicit
        # micro-batching (run_ner.py:73 predict_batch_size) but at Arrow
        # scale.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Scalar @udf (if any ever appears) exchanges Arrow batches, not
        # pickled rows (optimization guide §4.3/§9).
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        # Scan-parallelism floor: a table written as one file with few row
        # groups otherwise scans in 1-2 tasks and serializes every
        # downstream row-local computation on it (measured: single-file
        # 131 MB lineitem -> 2 scan tasks on 32 cores). Scale-adaptive by
        # construction — it is a MINIMUM, and at real scale input splits
        # >> cores so it is a no-op (guide §6 "minPartitionNum sets a
        # floor on scan parallelism").
        .config("spark.sql.files.minPartitionNum", str(cpus))
        # Join sizing: STATIC size estimates are routinely wrong after
        # projections (guide §3.1) — with the old static-64MB threshold
        # the planner broadcast the column-pruned 6M-row lineitem fact
        # table in the Q3-shaped join (~25 MB estimated, ~140 MB real
        # rows built single-threaded). Keep the static threshold at the
        # conservative default and let AQE promote joins to broadcast
        # from EXACT runtime sizes instead; dictionary dims (J1-J9) are
        # all explicitly F.broadcast-hinted and unaffected.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Allow shuffled-hash where the planner's size conditions hold
        # (guide §3.1/§9): no sort on either side, spills per partition.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # Deterministic session timezone for timestamp round-trips.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
