"""Blocking (distinct-surface pairing, token keys, LSH bands, salting)
and pairwise scoring."""

import pytest
from pyspark.sql import functions as F

from bern_spark.operators.blocking import (
    candidate_pairs,
    surface_nodes,
    with_block_keys,
)
from bern_spark.operators.scoring import score_pairs


def _surfaces(spark, rows):
    return spark.createDataFrame(rows, ["etype", "surface"])


def test_surface_nodes_dedups_occurrences(spark):
    m = spark.createDataFrame(
        [("aspirin", "drug"), ("aspirin", "drug"), ("aspirin", "gene")],
        ["mention", "etype"],
    )
    got = {(r.etype, r.surface) for r in surface_nodes(m).collect()}
    assert got == {("drug", "aspirin"), ("gene", "aspirin")}


def test_block_keys_token_and_full(spark):
    m = with_block_keys(_surfaces(spark, [("drug", "Beta-Blocker X")]))
    r = m.collect()[0]
    assert r.block_key == "drug:beta"  # first alnum token, tmchem'd
    assert r.block_key_full == "drug:fk:betablockerx"
    assert len(r.bands) == 4


def test_candidate_pairs_same_key_and_order(spark):
    m = with_block_keys(
        _surfaces(spark, [("drug", "aspirin"), ("drug", "Aspirin!"), ("gene", "aspirin")])
    )
    pairs = candidate_pairs(m, use_lsh=False).collect()
    got = {(p.etype, p.mention_a, p.mention_b) for p in pairs}
    # same etype + same key pairs once, canonical order; never cross-etype
    assert got == {("drug", "Aspirin!", "aspirin")}


def test_lsh_catches_typo_pair(spark):
    m = with_block_keys(
        _surfaces(spark, [("drug", "pembrolizumab"), ("drug", "zembrolizumab")])
    )
    pairs = candidate_pairs(m, use_lsh=True).collect()
    assert {(p.mention_a, p.mention_b) for p in pairs} == {("pembrolizumab", "zembrolizumab")}


def test_salting_caps_block_size(spark):
    # 60 distinct surfaces sharing one token key -> salted into shards
    m = with_block_keys(
        _surfaces(spark, [("drug", f"hot blend{i:03d}") for i in range(60)])
    )
    pairs = candidate_pairs(m, max_block_size=10, use_lsh=False)
    n = pairs.count()
    assert 0 < n < 60 * 59 / 2  # far below the unsalted quadratic


def test_scoring_short_circuit_and_threshold(spark):
    pairs = spark.createDataFrame(
        [
            ("b", "Beta Blocker", "beta-blocker", "drug"),
            ("b", "aspirin", "wildly different", "drug"),
            ("b", "BRCA1 gene", "brca1", "gene"),
            ("b", "c.123A>G", "c.124A>G", "mutation"),
        ],
        ["block_key", "mention_a", "mention_b", "etype"],
    )
    out = {r.mention_a: r.score for r in score_pairs(pairs, threshold=0.85).collect()}
    assert out.get("Beta Blocker") == 1.0  # tmchem-equal short circuit
    assert "aspirin" not in out  # below threshold
    assert out.get("BRCA1 gene") == pytest.approx(1.0)  # gene-suffix strip + case
    assert "c.123A>G" not in out  # mutation: exact-equivalence only
