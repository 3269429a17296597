"""Blocking (token keys, LSH bands, salting) and pairwise scoring."""

import pytest
from pyspark.sql import functions as F

from bern_spark.operators.blocking import candidate_pairs, with_block_keys
from bern_spark.operators.scoring import score_pairs


def _mentions(spark, rows):
    return spark.createDataFrame(
        [(f"m{i:04d}", m, e) for i, (m, e) in enumerate(rows)],
        ["mention_id", "mention", "etype"],
    )


def test_block_keys_token_and_full(spark):
    m = with_block_keys(_mentions(spark, [("Beta-Blocker X", "drug")]))
    r = m.collect()[0]
    assert r.block_key == "drug:beta"  # first alnum token, tmchem'd
    assert r.block_key_full == "drug:fk:betablockerx"
    assert len(r.bands) == 4


def test_candidate_pairs_same_key_and_order(spark):
    m = with_block_keys(
        _mentions(spark, [("aspirin", "drug"), ("Aspirin!", "drug"), ("aspirin", "gene")])
    )
    pairs = candidate_pairs(m, use_lsh=False).collect()
    keys = {(p.mention_id_a, p.mention_id_b) for p in pairs}
    assert ("m0000", "m0001") in keys  # same etype, same key
    assert all(a < b for a, b in keys)  # canonical order
    assert not any({"m0002"} & {a, b} for a, b in keys if (a, b) != ("m0000", "m0001")) or True
    # cross-etype never pairs
    for p in pairs:
        assert p.etype in ("drug", "gene")
        assert (p.mention_id_a, p.mention_id_b) != ("m0000", "m0002")
        assert (p.mention_id_a, p.mention_id_b) != ("m0001", "m0002")


def test_lsh_catches_typo_pair(spark):
    m = with_block_keys(
        _mentions(spark, [("pembrolizumab", "drug"), ("zembrolizumab", "drug")])
    )
    # different first tokens -> token key misses; LSH bands must pair them
    pairs = candidate_pairs(m, use_lsh=True).collect()
    assert {(p.mention_id_a, p.mention_id_b) for p in pairs} == {("m0000", "m0001")}


def test_salting_caps_block_size(spark):
    rows = [(f"samekey{i}", "drug") for i in range(60)]
    # same first token "samekey..." — actually distinct; force same key via
    # identical mention surfaces
    rows = [("hotblock", "drug")] * 60
    m = with_block_keys(
        spark.createDataFrame(
            [(f"m{i:04d}", "hotblock", "drug") for i in range(60)],
            ["mention_id", "mention", "etype"],
        )
    )
    pairs = candidate_pairs(m, max_block_size=10, use_lsh=False)
    # per-pair shard membership caps pair count far below 60*59/2=1770
    n = pairs.count()
    assert 0 < n < 600


def test_scoring_short_circuit_and_threshold(spark):
    pairs = spark.createDataFrame(
        [
            ("b", "a1", "a2", "Beta Blocker", "beta-blocker", "drug"),
            ("b", "a3", "a4", "aspirin", "wildly different", "drug"),
            ("b", "a5", "a6", "BRCA1 gene", "brca1", "gene"),
            ("b", "a7", "a8", "c.123A>G", "c.124A>G", "mutation"),
        ],
        ["block_key", "mention_id_a", "mention_id_b", "mention_a", "mention_b", "etype"],
    )
    out = {(r.mention_id_a): r.score for r in score_pairs(pairs, threshold=0.85).collect()}
    assert out.get("a1") == 1.0  # tmchem-equal short circuit
    assert "a3" not in out  # below threshold
    assert out.get("a5") == pytest.approx(1.0)  # gene-suffix strip + case
    assert "a7" not in out  # mutation: exact-equivalence only
