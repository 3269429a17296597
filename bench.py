#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "sf": ...}.

The official stdout line is kept COMPACT (medians only): round 4's line
carried per-query raw sample arrays + streaming details and outgrew the
driver's tail capture, landing BENCH_r04.json with "parsed": null. Full
per-query stats (min/max/mean/std/samples), calibration probes,
calibration-normalized medians, and streaming details are side-filed to
$SPARK_GRAFT_BENCH_STATS (default /root/repo/BENCH_STATS.json); the
stdout line references it via "stats_file".

Methodology (A5 — the reference's own harness reports mean/std/min/max
over tries, service_checker.py:174-182): each query gets
$SPARK_GRAFT_BENCH_WARMUP discarded warmup runs (page cache + JIT + Arrow
worker spin-up) then $SPARK_GRAFT_BENCH_REPEATS timed runs; the headline
per-query number is the MEDIAN, with min/max/mean/std under
"queries_stats". n=1 walls on a 200-stage job were measured 1.8x
run-to-run (VERDICT r3) — single-shot numbers are noise.

--scaling additionally runs the full ER pipeline at two parallelism
levels (local[4] vs local[16]) on identical input and reports turns/sec
at both plus scaling efficiency (the north rule's two-cluster-size
criterion, evidenced per BASELINE.md since no real cluster exists here).
Results land in the same JSON line under "scaling".

--streaming runs the streaming path (stateless candidate matching ->
stateful cross-batch dedup, availableNow trigger) over a ~1M-turn file
stream and reports turns/sec under "streaming".
"""

from __future__ import annotations

import json
import os
import statistics
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


def _calibrate(spark) -> dict:
    """Fixed-work probes whose walls depend only on box state (CPU
    steal, cache pressure) — never on engine code. Recorded beside the
    query walls so cross-round deltas can be attributed: if calibration
    moved, the box moved (this VM measured ~50% uniform shifts between
    hours from host tenancy, BENCH.md r4); if only queries moved, the
    code did."""
    import hashlib

    def py_once():
        t0 = time.time()
        h = b"calibration"
        for _ in range(200_000):
            h = hashlib.sha256(h).digest()
        return time.time() - t0

    def spark_once():
        t0 = time.time()
        # decimal sum: ANSI mode overflows long on summed 64-bit hashes
        spark.range(200_000_000).selectExpr(
            "sum(cast(xxhash64(id) as decimal(38,0)))"
        ).collect()
        return time.time() - t0

    spark_once()  # discard: JIT/codegen warm (7.5s cold vs 3.2s warm)
    return {
        "python_sha256_200k_sec": round(min(py_once() for _ in range(3)), 3),
        "spark_xxhash_200m_sec": round(min(spark_once() for _ in range(2)), 3),
    }


def _timed(fn, warmup: int, repeats: int) -> dict:
    """Run fn() warmup (discarded) + repeats (timed) times; A5-style
    stats. Median is the headline: robust to one GC/compaction outlier."""
    for _ in range(warmup):
        fn()
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(round(time.time() - t0, 3))
    return {
        "median": round(statistics.median(samples), 3),
        "mean": round(statistics.fmean(samples), 3),
        "min": min(samples),
        "max": max(samples),
        "std": round(statistics.pstdev(samples), 3) if len(samples) > 1 else 0.0,
        "n": len(samples),
        "samples": samples,
    }


LOWDUP_DOCS = 50_000  # ~1% near-dup rate corpus for the banded-pairs bench
EXPORT_DOCS = 5_000  # bounded deterministic slice for the TFRecord-export row


def _lowdup_dir(spark) -> str:
    """Cached low-dup documents corpus (the driver's synthetic documents
    are near-dup-saturated, so banded-verify walls there measure the
    corpus, not the engine — VERDICT r2). Deterministic, generated once."""
    import glob

    corpus = f"/root/repo/.scratch/lowdup_docs_{LOWDUP_DOCS}"
    if not glob.glob(f"{corpus}/documents.parquet/_SUCCESS"):
        from bern_spark.datagen_spark import lowdup_documents

        lowdup_documents(spark, LOWDUP_DOCS).write.mode("overwrite").parquet(
            f"{corpus}/documents.parquet"
        )
    return corpus


def run_headline(sf_dir: str) -> tuple[dict[str, float], dict[str, dict]]:
    from bern_spark.entry_queries import QUERIES
    from bern_spark.session import get_spark

    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # SPARK_GRAFT_BENCH_QUERIES (comma list) restricts the run — used by
    # the CI artifact-shape guard (tests/test_round5.py) to exercise the
    # real main() path in seconds rather than minutes
    subset_env = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    subset = {s.strip() for s in subset_env.split(",")} if subset_env else None
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    medians: dict[str, float] = {}
    stats: dict[str, dict] = {}
    stats["_calibration"] = _calibrate(spark)

    def bench_one(name: str, thunk):
        s = _timed(thunk, warmup, repeats)
        stats[name] = s
        medians[name] = s["median"]

    for name in HEADLINE:
        if subset is not None and name not in subset:
            continue
        fn = QUERIES[name]
        bench_one(name, lambda fn=fn: _force(fn(spark, sf_dir)))
    # engine-measuring variants: IVF ANN on the sf embeddings, banded
    # near-dup pairs on the controlled-dup-rate corpus (50k docs, ~1% dup)
    if subset is None or "ivf_topk" in subset:
        bench_one("ivf_topk", lambda: _force(QUERIES["ivf_topk"](spark, sf_dir)))
    if subset is None:
        ld = _lowdup_dir(spark)
        bench_one(
            f"dedup_minhash_pairs_lowdup{LOWDUP_DOCS // 1000}k",
            lambda: _force(QUERIES["dedup_minhash_pairs"](spark, ld)),
        )
        # training-data export job (W1-W6 -> TFRecord shards): wall for a
        # bounded deterministic slice; examples/sec lands in the stats
        import shutil

        from bern_spark.entry_queries import _docs_as_turns
        from bern_spark.jobs.export_tfrecords import build_vocab, export_tfrecords

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .orderBy("doc_id")
            .limit(EXPORT_DOCS)
        )
        # same docs->turns mapping as the driver-checked queries (shared
        # helper: the bench slice must never drift from the contract shape)
        turns = _docs_as_turns(docs)
        # limit() collapses to one partition — restore engine parallelism
        # (the framing UDF chain inherits input partitioning), then
        # persist so the timed runs bench the export, not the scan+sort
        # (persist, NOT localCheckpoint: checkpoint blocks are not
        # releasable and would stay pinned through the streaming run)
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        turns = turns.repartition(cpus).persist()
        turns.count()
        vocab = build_vocab(turns)
        out_dir = "/root/repo/.scratch/bench_tfrecord_export"
        records = {"n": 0}

        def _export():
            shutil.rmtree(out_dir, ignore_errors=True)
            manifest = export_tfrecords(turns, vocab, out_dir, shards=32)
            records["n"] = sum(r["n_records"] for r in manifest.collect())

        bench_one("tfrecord_export", _export)
        stats["tfrecord_export"]["examples"] = records["n"]
        stats["tfrecord_export"]["examples_per_sec"] = round(
            records["n"] / stats["tfrecord_export"]["median"], 1
        )
        shutil.rmtree(out_dir, ignore_errors=True)
        turns.unpersist()
        # Capacity-plan row (stats-only, NOT in the official medians so
        # the tfrecord_export series stays round-comparable): one export
        # over the 50k-doc lowdup corpus — 10x the official slice, so
        # the three chained Python-stage launches that dominate the 5k
        # wall amortize away and examples/sec/core approaches the
        # sustained framing throughput a 100 TB plan extrapolates from.
        if os.environ.get("SPARK_GRAFT_BENCH_EXPORT_SCALE", "1") != "0":
            # persist (NOT localCheckpoint): checkpoint blocks are not
            # releasable and would stay pinned in the block manager
            # through the rest of the bench process — including the
            # tenancy-sensitive streaming run in this same JVM
            big = _docs_as_turns(
                spark.read.parquet(f"{_lowdup_dir(spark)}/documents.parquet")
            ).repartition(cpus).persist()
            big.count()
            big_vocab = build_vocab(big)
            t0 = time.time()
            shutil.rmtree(out_dir, ignore_errors=True)
            manifest = export_tfrecords(big, big_vocab, out_dir, shards=64)
            n_big = sum(r["n_records"] for r in manifest.collect())
            dt = time.time() - t0
            shutil.rmtree(out_dir, ignore_errors=True)
            big.unpersist()
            stats["tfrecord_export_50k"] = {
                "sec": round(dt, 2),
                "examples": n_big,
                "examples_per_sec": round(n_big / dt, 1),
                "examples_per_sec_per_core": round(n_big / dt / cpus, 1),
                "cores": cpus,
                "method": "single run over the 50k lowdup corpus "
                "(launch overhead amortized; capacity-plan row)",
            }
    return medians, stats


_CORPUS_ALIASES = {60_000: "60k", 600_000: "600k", 6_000_000: "6m"}


def run_scaling(
    sf_dir: str, cores=(4, 16), n_convs: int | None = None, use_lineage: bool = True
) -> dict:
    """North-rule N vs 4N evidence: the SAME full-pipeline job on the SAME
    input at two parallelism levels -> turns/sec both + efficiency.

    Input is the deterministic distributed transcripts corpus
    (datagen_spark), generated once and cached as parquet: scaling
    efficiency is a property of compute-dominant workloads, so the corpus
    must be large enough that per-stage fixed costs stop dominating
    (default 6M convs ~ 30M turns; override SPARK_GRAFT_SCALE_CONVS).
    Cores default to (4, 16): Arrow-UDF stages run one Python worker per
    task beside the JVM threads, so N must satisfy 2*4N <= physical cores
    or oversubscription degrades the 4N run.

    ``use_lineage``: run with the LineageStore as the stage medium (a
    FRESH store per config — no cross-config resume) — the cluster-mode
    code path where stage tables are parquet on storage, not
    localCheckpoint blocks in one JVM's block manager. The 30M-turn
    round-1 run measured ~2x per-turn degradation from exactly that
    block-manager pressure.
    """
    import glob
    import shutil

    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession

    from bern_spark.session import get_spark

    n_convs = n_convs or int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "6000000"))
    alias = _CORPUS_ALIASES.get(n_convs, str(n_convs))
    corpus = f"/root/repo/.scratch/scale_corpus_{alias}"
    if not glob.glob(f"{corpus}/_SUCCESS"):
        spark = get_spark("bench_scale_gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        from bern_spark.datagen_spark import scale_corpus

        tr, _, _ = scale_corpus(spark, n_convs, per_type=100)
        tr.write.mode("overwrite").parquet(corpus)
        spark.stop()
    n_rows = sum(
        pq.read_metadata(f).num_rows for f in glob.glob(f"{corpus}/*.parquet")
    )

    # SPARK_GRAFT_SCALE_SHUFFLE overrides the pinned shuffle-partition
    # count (default 4*max(cores), identical for both legs — see below);
    # used for the one-leg partitions-scale-with-cores check (BENCH.md).
    shuffle_override = os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE")

    out = {"corpus_turns": n_rows}
    for c in cores:
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        # IDENTICAL shuffle partitioning for both legs (4 * the larger
        # core count): the two runs then execute the same physical plan
        # with the same per-partition volumes, isolating executor count —
        # partitions scaled with cores would give the smaller run fatter
        # partitions and more spill, inflating measured efficiency.
        spark = get_spark(
            f"bench_scale_{c}",
            master=f"local[{c}]",
            shuffle_partitions=int(shuffle_override) if shuffle_override else 4 * max(cores),
        )
        spark.sparkContext.setLogLevel("ERROR")
        from bern_spark.datagen_spark import scale_corpus
        from bern_spark.pipeline import ERConfig, resolve_entities

        tr = spark.read.parquet(corpus)
        _, lex, dicts = scale_corpus(spark, 0, per_type=100)
        store = None
        if use_lineage:
            from bern_spark.lineage import LineageStore

            ldir = f"/root/repo/.scratch/scale_lineage_{alias}_c{c}"
            shutil.rmtree(ldir, ignore_errors=True)  # fresh: no resume
            store = LineageStore(ldir)
        t0 = time.time()
        res = resolve_entities(tr, lex, dicts, config=ERConfig(), lineage_store=store)
        _force(res["mentions"])
        dt = time.time() - t0
        leg = {
            "sec": round(dt, 2),
            "turns_per_sec": round(n_rows / dt, 2),
        }
        if use_lineage:
            # per-stage wall decomposition (manifests record wall_sec at
            # write time): the evidence for what part of the job floor
            # does/doesn't scale with cores
            stage_walls = {}
            for mf in sorted(glob.glob(f"{ldir}/*.manifest.json")):
                with open(mf) as f:
                    m = json.load(f)
                if "wall_sec" in m:
                    stage_walls[m["stage"]] = m["wall_sec"]
            leg["stage_wall_sec"] = stage_walls
            leg["tail_sec"] = round(dt - sum(stage_walls.values()), 2)
        out[f"local[{c}]"] = leg
        spark.stop()
        if use_lineage:
            shutil.rmtree(ldir, ignore_errors=True)
    if len(cores) >= 2:
        lo, hi = f"local[{cores[0]}]", f"local[{cores[1]}]"
        speedup = out[lo]["sec"] / out[hi]["sec"]
        ideal = cores[1] / cores[0]
        out["speedup"] = round(speedup, 3)
        out["efficiency"] = round(speedup / ideal, 3)
    return out


STREAM_CONVS = 200_000  # ~1M turns (JVM-state scale path)
STREAM_PY_CONVS = 20_000  # ~100k turns (per-key Python-state custom op)


def run_streaming(repeats: int | None = None) -> dict:
    """Streaming-path throughput, availableNow trigger, same code the
    correctness tests pin (test_streaming_multimodal.py):

    - ``dedup_builtin``: stateless candidate matching (broadcast lexicon,
      anchored Arrow UDF) -> dropDuplicatesWithinWatermark (JVM state) at
      ~1M turns — the scale path.
    - ``dedup_custom``: the applyInPandasWithState operator (event-time
      TTL, deterministic first occurrence) at ~100k turns — it pays a
      pandas group invocation per distinct key (~13 core-ms measured), so
      it is benched at a corpus size that keeps the official run bounded;
      its turns/sec is a per-key-cost number, not an engine ceiling.

    The official ``dedup_builtin`` number is an INTERLEAVED median (its
    repeats are spread across the whole streaming-bench wall, with the
    custom run between them): the latency-bound streaming job amplifies
    host tenancy ~4x more than any batch query (r5 measured 13-56s for
    identical code+input within one hour), so a single sample is
    meaningless — the median of interleaved repeats is the same
    discipline ``run_headline`` applies to batch queries, and the raw
    per-run samples ride in the side-filed stats so a reader can see the
    spread. ``repeats`` defaults to 3 (env SPARK_GRAFT_STREAM_REPEATS);
    no separate warmup — the median absorbs the first run's stream-init
    cost. ``dedup_custom`` stays a single run when repeats > 1: at
    ~100s/run it would dominate the bench wall, and its number is a
    documented per-key-cost disclosure, not the engine headline."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    from bern_spark.datagen_spark import scale_corpus
    from bern_spark.session import get_spark
    from bern_spark.streaming.incremental import (
        streaming_candidate_mentions,
        streaming_dedup_mentions,
        streaming_dedup_mentions_builtin,
    )

    spark = get_spark("bench_stream")
    spark.sparkContext.setLogLevel("ERROR")
    _, lex, _ = scale_corpus(spark, 0, per_type=100)

    def corpus_for(n_convs: int) -> tuple[str, int]:
        corpus = f"/root/repo/.scratch/stream_corpus_{n_convs}"
        if not glob.glob(f"{corpus}/_SUCCESS"):
            tr, _, _ = scale_corpus(spark, n_convs, per_type=100)
            tr.write.mode("overwrite").parquet(corpus)
        n = sum(
            pq.read_metadata(f).num_rows for f in glob.glob(f"{corpus}/*.parquet")
        )
        return corpus, n

    def drive(n_convs: int, dedup_fn, tag: str) -> tuple[float, int]:
        corpus, n_rows = corpus_for(n_convs)
        schema = spark.read.parquet(corpus).schema
        ckpt = f"/root/repo/.scratch/stream_bench_ckpt_{tag}"
        shutil.rmtree(ckpt, ignore_errors=True)
        stream = spark.readStream.schema(schema).parquet(corpus)
        deduped = dedup_fn(streaming_candidate_mentions(stream, lex))
        t0 = time.time()
        q = (
            deduped.writeStream.format("noop")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        shutil.rmtree(ckpt, ignore_errors=True)
        return round(dt, 2), n_rows

    if repeats is None:
        repeats = int(os.environ.get("SPARK_GRAFT_STREAM_REPEATS", "3"))
    repeats = max(1, repeats)
    variants = [
        # (name, convs, fn, tag, n_runs)
        ("dedup_builtin", STREAM_CONVS, streaming_dedup_mentions_builtin,
         "builtin", repeats),
        ("dedup_custom", STREAM_PY_CONVS, streaming_dedup_mentions,
         "custom", 1 if repeats > 1 else repeats),
    ]
    samples: dict[str, list[float]] = {v[0]: [] for v in variants}
    turns: dict[str, int] = {}
    for rnd in range(repeats):
        for name, n_convs, fn, tag, n_runs in variants:  # interleaved
            if rnd >= n_runs:
                continue
            sec, n_rows = drive(n_convs, fn, tag)
            samples[name].append(sec)
            turns[name] = n_rows
    out: dict = {}
    for name, *_rest in variants:
        n = len(samples[name])
        # statistics.median averages the middle two for even n — the
        # upper-middle pick would systematically report the SLOWER of
        # two samples while labeling it a median
        med = round(statistics.median(samples[name]), 2)
        out[name] = {
            "corpus_turns": turns[name],
            "sec": med,
            "turns_per_sec": round(turns[name] / med, 2),
            "samples_sec": samples[name],
            "method": (
                f"interleaved median-of-{n}" if n > 1
                else "single run (per-key-cost disclosure)"
            ),
        }
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
        # SPARK_GRAFT_SCALE_CORES="4,16" overrides the leg list; a single
        # value runs one leg (used with SPARK_GRAFT_SCALE_SHUFFLE for the
        # partitions-scale-with-cores check, BENCH.md)
        cores = tuple(
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALE_CORES", "4,16").split(",")
        )
        sc = run_scaling(sf_dir, cores=cores)
        result["scaling"] = sc
        result["queries"] = {}
        result["value"] = max(
            v["sec"] for k, v in sc.items() if isinstance(v, dict) and "sec" in v
        )
    elif "--streaming" in sys.argv:
        st = run_streaming()
        result["streaming"] = st
        result["queries"] = {}
        result["value"] = st["dedup_builtin"]["sec"]
    else:
        medians, stats = run_headline(sf_dir)
        result["queries"] = medians
        result["value"] = round(sum(medians.values()), 3)
        # Calibration-normalized medians: wall / spark_xxhash_200m_sec.
        # The fixed-work probe moves with the box (host tenancy shifted
        # absolute walls up to ~50% between hours, BENCH.md r4), so the
        # normalized numbers are the round-over-round comparable series.
        cal = stats["_calibration"]["spark_xxhash_200m_sec"]
        normalized = {k: round(v / cal, 3) for k, v in medians.items()}
        streaming: dict = {}
        if os.environ.get("SPARK_GRAFT_BENCH_STREAMING", "1") != "0":
            try:
                # streaming-path throughput rides along (corpus cached
                # after first run); failures must not void batch numbers
                streaming = run_streaming()
            except Exception as e:  # noqa: BLE001
                streaming = {"error": f"{type(e).__name__}: {e}"}
            # only the two throughput scalars ride in the official line
            result["streaming_turns_per_sec"] = {
                k: v["turns_per_sec"]
                for k, v in streaming.items()
                if isinstance(v, dict) and "turns_per_sec" in v
            }
        stats_path = os.environ.get(
            "SPARK_GRAFT_BENCH_STATS", "/root/repo/BENCH_STATS.json"
        )
        with open(stats_path, "w") as f:
            json.dump(
                {
                    "queries": medians,
                    "queries_stats": stats,
                    "queries_normalized": normalized,
                    "calibration": stats["_calibration"],
                    "streaming": streaming,
                },
                f,
                indent=1,
            )
        result["stats_file"] = stats_path
    line = json.dumps(result)
    # the official line must stay machine-readable: the driver's tail
    # capture truncated round 4's stats-laden line (BENCH_r04.json
    # "parsed": null). Guarded here and by tests/test_round5.py.
    assert len(line) < 4096, f"official bench line too long ({len(line)}B)"
    print(line)


if __name__ == "__main__":
    main()
