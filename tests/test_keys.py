"""Key-normalization functions vs direct reimplementation of the reference
semantics (get_tmchem_name chemical_normalizer.py:64-72 etc.)."""

import string

from pyspark.sql import functions as F

from bern_spark.functions.keys import (
    gene_id_root,
    gene_suffix_strip,
    hgnc_fix,
    mutation_head,
    species_taxid,
    tmchem_key,
)


def ref_tmchem(name: str) -> str:
    # reference behavior, re-derived from its spec (lowercase; drop space
    # and string.punctuation chars)
    return "".join(c for c in name.lower() if c != " " and c not in string.punctuation)


CASES = [
    "Aspirin",
    "beta-blocker  X",
    "N,N-dimethyl!",
    "  spaced out  ",
    "UPPER_lower.123",
    "a|b||c",
    "tab\there",
]


def _vals(spark, col, data):
    df = spark.createDataFrame([(d,) for d in data], ["s"])
    return [r[0] for r in df.select(col(F.col("s")).alias("v")).collect()]


def test_tmchem_key_matches_reference(spark):
    got = _vals(spark, tmchem_key, CASES)
    want = [ref_tmchem(c) for c in CASES]
    # NB: reference keeps non-space whitespace (only ' ' dropped); ours
    # strips all \s — identical on single-space inputs; the broader strip
    # is intentional (tab/space already collapsed upstream by P2).
    want = [w.replace("\t", "") for w in want]
    assert got == want


def test_gene_suffix_strip(spark):
    got = _vals(spark, gene_suffix_strip, ["BRCA1 gene", "BRCA1 GENE", "genetics", "my gene x"])
    assert got == ["BRCA1", "BRCA1", "genetics", "my gene x"]


def test_gene_id_root(spark):
    got = _vals(spark, gene_id_root, ["672-2", "672", "a-b-c"])
    assert got == ["672", "672", "a"]


def test_mutation_head(spark):
    got = _vals(spark, mutation_head, ["p.V600E;c.123", "bare"])
    assert got == ["p.V600E", "bare"]


def test_species_taxid(spark):
    got = _vals(spark, species_taxid, ["960601", "960699", "100"])
    assert got == ["NCBI:txid9606", "NCBI:txid9606", "NCBI:txid1"]


def test_hgnc_fix(spark):
    got = _vals(spark, hgnc_fix, ["HGNC:HGNC:5", "HGNC:5", "X:HGNC:HGNC:5"])
    assert got == ["HGNC:5", "HGNC:5", "X:HGNC:HGNC:5"]
