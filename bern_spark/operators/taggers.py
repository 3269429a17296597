"""Regex taggers: miRNA and pathway (SURVEY §2.10 U4, §2.3 J11).

The reference tags miRNAs with a prefix x suffix regex grid
(miRNA_normalizer.py:8-26, applied at :135-151) and pathways with a
dictionary-derived alternation + ``' pathway'`` (pathway_normalizer.py:
30-56). Both are generator "UDTFs": one text -> many mention rows. Here
each is an Arrow-batched pandas UDF emitting ``array<struct<start,end,
mention>>`` exploded relationally — the canonical Spark UDTF pattern.

J11 (miRNA code resolution, miRNA_normalizer.py:64-133): regex-extracted
numeric code -> candidate mirbase ids with a species-prefix preference
cascade (hsa- > mmu- > first) — a broadcast join + row_number ladder.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# prefix x suffix grid in one alternation, case-insensitive, word-bounded
# (reference grid: (hsa|mmu)? x (mir|let|lin)-num[letter](-3p/-5p)?)
MIRNA_RE = re.compile(
    r"\b(?:(?:hsa|mmu)-)?(?:mir|mirna|let|lin)-?[0-9]{1,3}[a-z]?(?:-[35]p)?\b",
    re.IGNORECASE,
)

_SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("mention", T.StringType()),
        ]
    )
)


@F.pandas_udf(_SPAN_TYPE)
def mirna_spans_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in texts:
        yield batch.map(
            lambda t: [
                (m.start(), m.end(), m.group(0)) for m in MIRNA_RE.finditer(t or "")
            ]
        )


def make_pathway_udf(names: list[str]):
    """Dictionary-driven pattern build at the driver
    (pathway_normalizer.py:30-38): alternation of dictionary names, each
    optionally followed by ``pathway``."""
    if not names:
        alt = r"(?!x)x"  # matches nothing
    else:
        alt = "|".join(re.escape(n) for n in sorted(names, key=len, reverse=True))
    rx = re.compile(rf"\b(?:{alt})(?: pathway)?\b", re.IGNORECASE)

    @F.pandas_udf(_SPAN_TYPE)
    def pathway_spans_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in texts:
            yield batch.map(
                lambda t: [
                    (m.start(), m.end(), m.group(0)) for m in rx.finditer(t or "")
                ]
            )

    return pathway_spans_udf


def tag_regex_mentions(
    turns: DataFrame, etype: str, spans_udf, score: float = 0.8
) -> DataFrame:
    """Explode a span-UDF over canonical turn text into mention rows with
    the extraction schema (conv_id, turn_idx, start, end, mention, etype,
    score, mention_id)."""
    ex = turns.select(
        "conv_id", "turn_idx", F.explode(spans_udf(F.col("text"))).alias("s")
    )
    return ex.select(
        "conv_id",
        "turn_idx",
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.mention").alias("mention"),
        F.lit(etype).alias("etype"),
        F.lit(score).alias("score"),
        F.concat_ws(
            "|", "conv_id", F.col("turn_idx").cast("string"), F.col("s.start").cast("string")
        ).alias("mention_id"),
    )


def mirna_code(col) -> F.Column:
    """J11 key: numeric code from the mention — strip -3p/-5p, take the
    digit run, strip leading zeros (miRNA_normalizer.py:65-82)."""
    c = F.regexp_replace(col, r"(?i)-[35]p$", "")
    code = F.regexp_extract(c, r"([0-9]{1,3}[a-z]?)", 1)
    return F.regexp_replace(code, r"^0+", "")


def normalize_mirna(mentions: DataFrame, mirna_dict: DataFrame) -> DataFrame:
    """J11: join on extracted code; candidates ranked by species prefix
    preference (hsa- > mmu- > rest, then oid for determinism); first wins
    (the reference's 5-branch ladder, miRNA_normalizer.py:84-133).

    ``mirna_dict``: (oid, name) with names like ``hsa-mir-21``.
    """
    d = F.broadcast(
        mirna_dict.select(
            "oid",
            "name",
            mirna_code(F.col("name")).alias("code"),
            F.when(F.lower("name").startswith("hsa-"), 0)
            .when(F.lower("name").startswith("mmu-"), 1)
            .otherwise(2)
            .alias("pref"),
        )
    )
    j = mentions.withColumn("code", mirna_code(F.col("mention"))).join(
        d, "code", "left"
    )
    w = Window.partitionBy("etype", "mention_id").orderBy("pref", "oid")
    out = (
        j.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk", "code", "name", "pref")
    )
    return out.withColumn("oid", F.coalesce("oid", F.lit("CUI-less")))
