"""LineageStore: idempotent restarts, bucketed resume, manifests,
fingerprint invalidation, single-scan metrics."""

import json
import os

from pyspark.sql import functions as F

from bern_spark.lineage import LineageStore


def test_run_stage_idempotent(spark, tmp_path):
    store = LineageStore(str(tmp_path))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    a = store.run_stage(spark, "s1", build)
    assert a.count() == 100 and calls["n"] == 1
    b = store.run_stage(spark, "s1", build)
    assert b.count() == 100 and calls["n"] == 1  # no recompute

    man = store.read_manifest("s1")
    assert man["status"] == "complete"
    assert man["rows"] == 100  # observed at write time — no second scan
    assert man["wall_sec"] >= 0
    assert "partitions" not in man  # checksum audit is opt-in


def test_run_stage_verify_opt_in(spark, tmp_path):
    store = LineageStore(str(tmp_path))
    store.run_stage(
        spark, "sv", lambda: spark.range(50).withColumn("v", F.col("id") * 3),
        verify=True,
    )
    man = store.read_manifest("sv")
    assert man["rows"] == 50
    assert all("checksum" in p and p["rows"] > 0 for p in man["partitions"])
    assert sum(p["rows"] for p in man["partitions"]) == 50


def test_run_stage_fingerprint_invalidates(spark, tmp_path):
    """A changed fingerprint (config/input/code drift) must recompute the
    stage instead of returning stale parquet — VERDICT r2 'what's wrong' #3."""
    store = LineageStore(str(tmp_path))
    calls = {"n": 0}

    def build_v1():
        calls["n"] += 1
        return spark.range(10).withColumn("v", F.lit("old"))

    def build_v2():
        calls["n"] += 1
        return spark.range(10).withColumn("v", F.lit("new"))

    a = store.run_stage(spark, "sf", build_v1, fingerprint="fp-A")
    assert a.where(F.col("v") == "old").count() == 10 and calls["n"] == 1
    # same fingerprint: read-through
    b = store.run_stage(spark, "sf", build_v2, fingerprint="fp-A")
    assert b.where(F.col("v") == "old").count() == 10 and calls["n"] == 1
    # changed fingerprint: stale parquet must NOT be returned
    c = store.run_stage(spark, "sf", build_v2, fingerprint="fp-B")
    assert c.where(F.col("v") == "new").count() == 10 and calls["n"] == 2
    assert store.read_manifest("sf")["fingerprint"] == "fp-B"


def test_bucketed_stage_resume_no_duplicates(spark, tmp_path):
    store = LineageStore(str(tmp_path))
    inp = spark.range(1000).withColumn("k", F.col("id").cast("string"))

    def transform(df):
        return df.withColumn("out", F.length("k"))

    out = store.run_bucketed_stage(spark, "b1", inp, ["k"], transform, n_buckets=4)
    assert out.count() == 1000

    # simulate a crash after 2 buckets: rewind the manifest, rerun
    man = store.read_manifest("b1")
    man["status"] = "in_progress"
    man["done_buckets"] = man["done_buckets"][:2]
    man.pop("rows_done", None)
    with open(os.path.join(str(tmp_path), "b1.manifest.json"), "w") as f:
        json.dump(man, f)

    out2 = store.run_bucketed_stage(spark, "b1", inp, ["k"], transform, n_buckets=4)
    assert out2.count() == 1000  # completed buckets kept, rest redone, no dupes
    assert out2.select("id").distinct().count() == 1000
    assert store.read_manifest("b1")["status"] == "complete"


def test_bucketed_stage_records_incremental_progress(spark, tmp_path):
    """done_buckets must be persisted after each sub-job, not only at the
    end — a preemption costs at most the in-flight sub-job (ADVICE r2)."""
    store = LineageStore(str(tmp_path))
    inp = spark.range(400).withColumn("k", F.col("id").cast("string"))
    snapshots = []

    def transform(df):
        # read the manifest as each sub-job STARTS: with progress_jobs=4
        # over 8 buckets the later sub-jobs must see earlier ones recorded
        man = store.read_manifest("bp")
        snapshots.append(len((man or {}).get("done_buckets", [])))
        return df.withColumn("out", F.length("k"))

    out = store.run_bucketed_stage(
        spark, "bp", inp, ["k"], transform, n_buckets=8, progress_jobs=4
    )
    assert out.count() == 400
    assert snapshots == [0, 2, 4, 6]  # incremental, 2 buckets per sub-job
    man = store.read_manifest("bp")
    assert man["status"] == "complete" and sorted(man["done_buckets"]) == list(range(8))
    assert man["rows"] == 400


def test_bucketed_stage_legacy_manifest_restarts(spark, tmp_path):
    """A manifest without the current layout marker (pre-``_bucket=`` code)
    must restart the stage rather than resume against conflicting dirs."""
    store = LineageStore(str(tmp_path))
    legacy = {
        "status": "in_progress",
        "stage": "bl",
        "n_buckets": 4,
        "done_buckets": [0, 1],
    }
    with open(os.path.join(str(tmp_path), "bl.manifest.json"), "w") as f:
        json.dump(legacy, f)
    inp = spark.range(100).withColumn("k", F.col("id").cast("string"))
    out = store.run_bucketed_stage(
        spark, "bl", inp, ["k"], lambda df: df, n_buckets=4
    )
    assert out.count() == 100  # all buckets ran; legacy progress discarded
    man = store.read_manifest("bl")
    assert man["layout"] == "_bucket" and man["status"] == "complete"


def test_bucketed_stage_invalidation_clears_stale_output(spark, tmp_path):
    """Restart-from-scratch (layout/n_buckets/fingerprint drift) must
    delete prior output: dynamic overwrite only replaces partitions
    present in the new data, so a stale _bucket=N dir would otherwise
    survive and duplicate rows (review finding: 143 rows where 100 exist)."""
    store = LineageStore(str(tmp_path))
    inp = spark.range(100).withColumn("k", F.col("id").cast("string"))
    out = store.run_bucketed_stage(spark, "bi", inp, ["k"], lambda d: d, n_buckets=8)
    assert out.count() == 100
    out2 = store.run_bucketed_stage(spark, "bi", inp, ["k"], lambda d: d, n_buckets=4)
    assert out2.count() == 100
    assert out2.select("id").distinct().count() == 100
    # fingerprint drift on same n_buckets also clears
    out3 = store.run_bucketed_stage(
        spark, "bi", inp, ["k"], lambda d: d, n_buckets=4, fingerprint="fpX"
    )
    assert out3.count() == 100
    assert out3.select("id").distinct().count() == 100
