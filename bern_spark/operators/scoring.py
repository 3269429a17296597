"""Pairwise mention scoring (SURVEY §7 step 5).

The reference's scoring surface is the mean-softmax span score
(ops.py:219-230) used to arbitrate overlaps (W9); the graft's pairwise
match score combines Jaro-Winkler, normalized Levenshtein, and token
Jaccard over the two surfaces — batched in an **iterator-form pandas UDF**
(the FastPredict pattern: per-executor init once, fast_predict2.py:20-74
-> free with iterator UDFs, SURVEY §2.10 U1).

Scale design: scores are computed once per **distinct surface pair**, not
per mention pair — the distinct-pair relation is orders of magnitude
smaller under Zipfian surface distributions (the "cancer" block has one
distinct pair). The mention-pair relation then broadcast-joins the scored
distinct pairs back.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bern_spark.functions.keys import tmchem_key
from bern_spark.functions.pytext import jaro_winkler, levenshtein_sim, token_jaccard


@F.pandas_udf(T.DoubleType())
def pair_score_udf(it: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
    """Blended string similarity in [0,1] per (surface_a, surface_b)."""
    for a, b in it:
        out = []
        for x, y in zip(a, b):
            x = x or ""
            y = y or ""
            if x == y:
                out.append(1.0)
                continue
            xl, yl = x.lower(), y.lower()
            if xl == yl:
                out.append(0.99)
                continue
            jw = jaro_winkler(xl, yl)
            lv = levenshtein_sim(xl, yl)
            tj = token_jaccard(x, y)
            out.append(0.5 * jw + 0.35 * lv + 0.15 * tj)
        yield pd.Series(out)


def score_pairs(
    pairs: DataFrame,
    threshold: float = 0.85,
    etype_thresholds: dict[str, float] | None = None,
) -> DataFrame:
    """Score candidate pairs; return edges above threshold.

    Distinct-surface-pair optimization: canonicalize (lo, hi) surface order
    so (a,b) and (b,a) share one scored row, score distinct pairs, join
    back. Identical tmChem keys short-circuit to 1.0 without touching
    Python (the J1 key equivalence is a match by construction).
    """
    # P8: the " gene" suffix is non-distinguishing for gene mentions
    # (normalize.py:540-548 strips it before lookup); strip it before
    # scoring so "BRCA1" ~ "BRCA1 gene" compare on the informative part.
    strip = lambda c: F.when(  # noqa: E731
        F.col("etype") == "gene", F.regexp_replace(c, "(?i) gene$", "")
    ).otherwise(c)
    with_surf = (
        pairs.withColumn("_sa", strip(F.col("mention_a")))
        .withColumn("_sb", strip(F.col("mention_b")))
        .withColumn("_lo", F.least("_sa", "_sb"))
        .withColumn("_hi", F.greatest("_sa", "_sb"))
        .drop("_sa", "_sb")
    )

    distinct = with_surf.select("_lo", "_hi").dropDuplicates()
    distinct = distinct.withColumn(
        "_score",
        F.when(tmchem_key(F.col("_lo")) == tmchem_key(F.col("_hi")), F.lit(1.0)).otherwise(
            pair_score_udf(F.col("_lo"), F.col("_hi"))
        ),
    )
    scored = with_surf.join(distinct, on=["_lo", "_hi"], how="left").drop("_lo", "_hi")
    scored = scored.withColumnRenamed("_score", "score")
    # per-etype thresholds: mutations default to exact-equivalence only —
    # the reference's J3 join is deliberately fuzz-free
    # (mutation_normalizer.py:48-49)
    th = {"mutation": 0.999, **(etype_thresholds or {})}
    thr_col = F.lit(threshold)
    for et, t in th.items():
        thr_col = F.when(F.col("etype") == et, F.lit(t)).otherwise(thr_col)
    return scored.where(F.col("score") >= thr_col)
