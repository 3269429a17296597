"""Physical-plan assertions (SURVEY §4) + pipeline-level lineage resume."""

import pytest
from pyspark.sql import functions as F


def test_normalization_joins_are_broadcast(spark, dfs, dicts):
    from bern_spark.operators.normalize import normalize_drug
    from bern_spark.plans import assert_broadcast_join, assert_no_row_python

    m = spark.createDataFrame([("aspirin", "drug", "1")], ["mention", "etype", "mention_id"])
    out = normalize_drug(m, dicts["dict_drug"])
    assert_broadcast_join(out)
    assert_no_row_python(out)


def test_scan_filter_pushdown(spark, tmp_path):
    from bern_spark.plans import assert_pushed_filters

    p = str(tmp_path / "t")
    spark.range(100).withColumn("v", F.col("id") * 2).write.parquet(p)
    df = spark.read.parquet(p).where(F.col("id") > 50).select("v")
    assert_pushed_filters(df, "GreaterThan(id,50)")


def test_pipeline_udfs_are_arrow(spark, dfs, dicts):
    from bern_spark.operators.extract import extract_mentions
    from bern_spark.plans import assert_no_row_python

    assert_no_row_python(extract_mentions(dfs["transcripts"], dfs["lexicon"]))


def test_pipeline_resume_via_lineage_store(spark, dfs, dicts, tmp_path):
    from bern_spark.lineage import LineageStore
    from bern_spark.pipeline import ERConfig, resolve_entities

    store = LineageStore(str(tmp_path))
    res1 = resolve_entities(
        dfs["transcripts"], dfs["lexicon"], dicts, id_merge=dfs["id_merge"],
        lineage_store=store,
    )
    n1 = res1["mentions"].count()
    manifests = [store.read_manifest(f"stage_{i:02d}") for i in (1, 2, 3, 4)]
    assert all(m and m["status"] == "complete" for m in manifests)

    # "restart": same store -> stages read back from parquet, same result
    res2 = resolve_entities(
        dfs["transcripts"], dfs["lexicon"], dicts, id_merge=dfs["id_merge"],
        lineage_store=store,
    )
    assert res2["mentions"].count() == n1
    got1 = res1["mentions"].select("conv_id", "turn_idx", "start", "etype", "oid")
    got2 = res2["mentions"].select("conv_id", "turn_idx", "start", "etype", "oid")
    assert got1.exceptAll(got2).count() == 0


def test_pipeline_resume_invalidates_on_input_change(spark, dfs, dicts, tmp_path):
    """Changing an input (here: the lexicon) between two resolve_entities
    calls on the SAME store must re-run the stages, not read stale stage
    parquet (VERDICT r2 'what's wrong' #3 / fingerprinted manifests)."""
    from bern_spark.lineage import LineageStore
    from bern_spark.pipeline import resolve_entities

    store = LineageStore(str(tmp_path))
    res1 = resolve_entities(
        dfs["transcripts"], dfs["lexicon"], dicts, lineage_store=store
    )
    res1["mentions"].count()
    fp1 = store.read_manifest("stage_01")["fingerprint"]

    # config drift must also invalidate (fingerprint covers ERConfig)
    from bern_spark.pipeline import ERConfig

    lex2 = dfs["lexicon"].where(F.col("etype") != "drug")
    res2 = resolve_entities(dfs["transcripts"], lex2, dicts, lineage_store=store)
    assert res2["mentions"].where(F.col("etype") == "drug").count() == 0
    fp2 = store.read_manifest("stage_01")["fingerprint"]
    assert fp2 != fp1  # stages re-ran under the new input fingerprint

    res3 = resolve_entities(
        dfs["transcripts"], lex2, dicts,
        config=ERConfig(score_threshold=0.999), lineage_store=store,
    )
    res3["mentions"].count()
    assert store.read_manifest("stage_01")["fingerprint"] != fp2
