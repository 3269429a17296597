"""Extraction operator: candidates, lexicon join, W9 overlap, P5 filter."""

import pytest
from pyspark.sql import functions as F

from bern_spark.operators.extract import extract_mentions, with_canonical_text


def _transcripts(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("role", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    return spark.createDataFrame(
        [(c, i, "user", t, None, None) for (c, i, t) in rows], schema=schema
    )


def _lexicon(spark, rows):
    return spark.createDataFrame(rows, ["etype", "surface", "weight"])


@pytest.fixture(scope="module")
def simple(spark):
    lex = _lexicon(
        spark,
        [
            ("drug", "aspirin", 0.8),
            ("gene", "BRCA1", 0.8),
            ("gene", "BRCA1 gene", 0.8),
            ("disease", "weird syndrome", 0.8),
            ("drug", "clash", 0.9),
            ("gene", "clash", 0.6),
            ("drug", "evenly", 0.7),
            ("gene", "evenly", 0.7),
            ("species", "patients", 0.8),
            ("species", "Danio rerio", 0.8),
        ],
    )
    return lex


def _extract(spark, lex, rows, **kw):
    df = extract_mentions(_transcripts(spark, rows), lex, **kw)
    return {
        (r.conv_id, r.turn_idx, r.start, r.end, r.etype): r.mention
        for r in df.collect()
    }


def test_basic_offsets_and_multiword(spark, simple):
    got = _extract(spark, simple, [("c1", 0, "take aspirin for weird syndrome now")])
    assert got[("c1", 0, 5, 12, "drug")] == "aspirin"
    assert got[("c1", 0, 17, 31, "disease")] == "weird syndrome"


def test_longest_match_wins_same_etype(spark, simple):
    got = _extract(spark, simple, [("c1", 0, "the BRCA1 gene variant")])
    # only the longer gene mention survives containment pruning
    assert ("c1", 0, 4, 9, "gene") not in got
    assert got[("c1", 0, 4, 14, "gene")] == "BRCA1 gene"


def test_w9_overlap_keeps_higher_score(spark, simple):
    got = _extract(spark, simple, [("c1", 0, "clash here")])
    assert ("c1", 0, 0, 5, "drug") in got  # 0.9 beats 0.6
    assert ("c1", 0, 0, 5, "gene") not in got


def test_w9_tie_keeps_both(spark, simple):
    got = _extract(spark, simple, [("c1", 0, "evenly matched")])
    assert ("c1", 0, 0, 6, "drug") in got
    assert ("c1", 0, 0, 6, "gene") in got


def test_species_stoplist_filter(spark, simple):
    got = _extract(spark, simple, [("c1", 0, "patients with Danio rerio")])
    assert not any(k[4] == "species" and got[k] == "patients" for k in got)
    assert got[("c1", 0, 14, 25, "species")] == "Danio rerio"
    off = _extract(
        spark, simple, [("c1", 0, "patients here")], apply_species_filter=False
    )
    assert ("c1", 0, 0, 8, "species") in off


def test_offsets_on_canonical_text(spark, simple):
    # exotic unicode space (1:1 map) keeps offsets aligned
    got = _extract(spark, simple, [("c1", 0, "take aspirin now")])
    assert got[("c1", 0, 5, 12, "drug")] == "aspirin"


def test_canonical_text_projection(spark):
    t = _transcripts(spark, [("c1", 0, "a b\r\nc")])
    out = with_canonical_text(t).select("text").collect()[0][0]
    assert out == "a b  c"
