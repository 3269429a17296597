"""LineageStore: idempotent restarts, bucketed resume, manifests."""

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
    assert man["rows"] == 100
    assert all("checksum" in p and p["rows"] > 0 for p in man["partitions"])


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
    with open(os.path.join(str(tmp_path), "b1.manifest.json"), "w") as f:
        json.dump(man, f)

    out2 = store.run_bucketed_stage(spark, "b1", inp, ["k"], transform, n_buckets=4)
    assert out2.count() == 1000  # completed buckets kept, rest redone, no dupes
    assert out2.select("id").distinct().count() == 1000
    assert store.read_manifest("b1")["status"] == "complete"
