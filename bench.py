#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

--scaling additionally runs the full ER pipeline at two parallelism
levels (local[8] vs local[32]) on identical input and reports turns/sec
at both plus scaling efficiency (the north rule's two-cluster-size
criterion, evidenced per BASELINE.md since no real cluster exists here).
Results land in the same JSON line under "scaling".
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "er_pipeline",
    "er_mentions",
    "er_normalize_counts",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_quality",
    "doc_fingerprint",
    "knn_cosine",
    "lsh_cosine_buckets",
    "pricing_summary",
    "top_revenue_orders",
    "events_sessionize",
]


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def run_headline(sf_dir: str) -> dict[str, float]:
    from bern_spark.entry_queries import QUERIES
    from bern_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        _force(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


def run_scaling(sf_dir: str, cores=(8, 32)) -> dict:
    """Same ER job, same input, two parallelism levels -> turns/sec both +
    efficiency. Each level gets a fresh SparkContext."""
    from pyspark.sql import SparkSession

    from bern_spark.entry_queries import er_pipeline_on_documents

    out = {}
    n_rows = None
    for c in cores:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        from bern_spark.session import get_spark

        spark = get_spark(f"bench_scale_{c}", master=f"local[{c}]",
                          shuffle_partitions=max(c * 2, 16))
        spark.sparkContext.setLogLevel("ERROR")
        if n_rows is None:
            import pyarrow.parquet as pq

            n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
        t0 = time.time()
        _force(er_pipeline_on_documents(spark, sf_dir))
        dt = time.time() - t0
        out[f"local[{c}]"] = {
            "sec": round(dt, 2),
            "turns_per_sec": round(n_rows / dt, 2),
        }
        spark.stop()
    lo, hi = f"local[{cores[0]}]", f"local[{cores[1]}]"
    speedup = out[lo]["sec"] / out[hi]["sec"]
    ideal = cores[1] / cores[0]
    out["speedup"] = round(speedup, 3)
    out["efficiency"] = round(speedup / ideal, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    result: dict = {
        "metric": "headline_query_wall_sec",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if "--scaling" in sys.argv:
        result["scaling"] = run_scaling(sf_dir)
        result["queries"] = {}
        result["value"] = result["scaling"]["local[32]"]["sec"]
    else:
        times = run_headline(sf_dir)
        result["queries"] = times
        result["value"] = round(sum(times.values()), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
