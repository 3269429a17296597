"""End-to-end gate: pairwise F1 >= 0.99, golden mention parity, invariants
(SURVEY §5 rebuild test plan; BASELINE.md targets)."""

import pytest
from pyspark.sql import functions as F

from bern_spark.functions.text import canonical_text
from bern_spark.pipeline import ERConfig, pairwise_f1, resolve_entities


@pytest.fixture(scope="module")
def result(spark, dfs, dicts):
    res = resolve_entities(
        dfs["transcripts"], dfs["lexicon"], dicts, id_merge=dfs["id_merge"],
        config=ERConfig(),
    )
    res["mentions"] = res["mentions"].persist()
    res["annotations"] = res["annotations"].persist()
    return res


def test_pairwise_f1_gate(result, dfs):
    m = pairwise_f1(result["labels"], dfs["labeled_pairs"])
    assert m["f1"] >= 0.99, m


def test_golden_mention_parity(result, dfs):
    got = result["mentions"].select("conv_id", "turn_idx", "start", "end", "mention", "etype")
    want = dfs["golden_mentions"].select("conv_id", "turn_idx", "start", "end", "mention", "etype")
    missing = want.exceptAll(got).count()
    extra = got.exceptAll(want).count()
    assert missing == 0 and extra == 0, (missing, extra)


def test_per_turn_text_equality(result, dfs):
    canon = dfs["transcripts"].select(
        "conv_id", "turn_idx", canonical_text("text").alias("ct")
    )
    ann = result["annotations"]
    assert ann.count() == dfs["transcripts"].count()
    bad = ann.join(canon, ["conv_id", "turn_idx"]).where(F.col("text") != F.col("ct")).count()
    assert bad == 0


def test_span_substring_equality(result):
    ex = result["annotations"].select("text", F.explode("denotations").alias("d"))
    bad = ex.where(
        F.expr("substring(text, d.start+1, d.end-d.start)") != F.col("d.mention")
    ).count()
    assert bad == 0


def test_same_oid_same_cluster(result):
    m = result["mentions"].where(F.col("oid") != "CUI-less")
    n = (
        m.groupBy("etype", "oid")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n == 0


def test_id_merge_unifies_old_oids(result, dfs):
    # mentions normalized to an old gene oid must share a cluster with the
    # canonical oid's mentions (J6 fixpoint vs reference one-hop)
    edges = {(r.src_oid, r.dst_oid) for r in dfs["id_merge"].collect()}
    chains = [s for (s, d) in edges if s != d]
    if not chains:
        pytest.skip("no merge edges in fixture")
    labels = {r.node: r.cluster_id for r in result["surface_labels"].collect()}
    for s, d in edges:
        a, b = f"oid:gene:{s}", f"oid:gene:{d}"
        if a in labels and b in labels:
            assert labels[a] == labels[b], (s, d)


def test_mention_count_conservation(result):
    # A2 analog: every extracted mention survives normalization exactly once
    m = result["mentions"]
    assert m.groupBy("etype", "mention_id").count().where(F.col("count") > 1).count() == 0
