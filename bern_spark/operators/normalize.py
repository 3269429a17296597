"""Normalization: dictionary lookups as broadcast hash joins (SURVEY §2.3).

Every reference normalizer is a socket/file-IPC dict lookup
(normalize.py:298-636, normalizers/*.py); here each becomes a broadcast
left-outer join with ``CUI-less`` on miss (chemical_normalizer.py:52-55).
The fragile positional zip identity of the reference
(zip(norm_out_f, norm_in_f), normalize.py:571-576) is replaced by carrying
``mention_id`` through every join (J10).

Scale notes: all dictionaries are small dims -> ``F.broadcast``; no
shuffle is introduced by this module at all. The per-etype thread fan-out
of the reference (normalize.py:255-267) collapses into independent
branches of one DataFrame plan, unioned by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bern_spark.functions.keys import (
    gene_id_root,
    gene_suffix_strip,
    hgnc_fix,
    mutation_head,
    species_fallback_key,
    species_taxid,
    tmchem_key,
)

CUI_LESS = "CUI-less"


def _bcast_lookup(dict_df: DataFrame, key_expr, out_name: str) -> DataFrame:
    """Dictionary keyed for joining: (join_key, oid) with first-wins dedup
    (reference dict load overwrites -> last wins; we pick min(oid) for
    determinism under parallel load, documented deviation)."""
    return F.broadcast(
        dict_df.select(key_expr(F.col("name")).alias("join_key"), "oid")
        .groupBy("join_key")
        .agg(F.min("oid").alias(out_name))
    )


def normalize_drug(mentions: DataFrame, dict_drug: DataFrame) -> DataFrame:
    """J1: tmChem key join (chemical_normalizer.py:25-72). Miss -> CUI-less."""
    d = _bcast_lookup(dict_drug, tmchem_key, "oid")
    return (
        mentions.withColumn("join_key", tmchem_key(F.col("mention")))
        .join(d, "join_key", "left")
        .drop("join_key")
        .withColumn("oid", F.coalesce("oid", F.lit(CUI_LESS)))
    )


def normalize_species(mentions: DataFrame, dict_species: DataFrame) -> DataFrame:
    """J2: exact match, then lowercase fallback (species_normalizer.py:24-58),
    then J9 taxid transform (normalize.py:486-495)."""
    exact = F.broadcast(
        dict_species.groupBy(F.col("name").alias("join_key")).agg(F.min("oid").alias("oid_exact"))
    )
    # fallback lowercases only the QUERY (species_normalizer.py:49-50:
    # ``name.lower() in species2oid`` — dict keys stay raw), so an
    # all-caps mention does NOT match a capitalized dictionary name.
    lower = F.broadcast(
        dict_species.groupBy(F.col("name").alias("join_key")).agg(F.min("oid").alias("oid_lower"))
    )
    out = (
        mentions.withColumn("join_key", F.col("mention"))
        .join(exact, "join_key", "left")
        .drop("join_key")
        .withColumn("join_key", species_fallback_key(F.col("mention")))
        .join(lower, "join_key", "left")
        .drop("join_key")
        .withColumn("_oid", F.coalesce("oid_exact", "oid_lower"))
        .drop("oid_exact", "oid_lower")
    )
    return out.withColumn(
        "oid",
        F.when(F.col("_oid").isNull(), F.lit(CUI_LESS)).otherwise(species_taxid(F.col("_oid"))),
    ).drop("_oid")


def normalize_mutation(mentions: DataFrame, dict_mutation: DataFrame) -> DataFrame:
    """J3: exact join on the ``;``-head of the normalized name (P9,
    normalize.py:208-212); deliberately NO lowercase fallback
    (mutation_normalizer.py:48-49)."""
    d = _bcast_lookup(dict_mutation, lambda c: c, "oid")
    return (
        mentions.withColumn("join_key", mutation_head(F.col("mention")))
        .join(d, "join_key", "left")
        .drop("join_key")
        .withColumn("oid", F.coalesce("oid", F.lit(CUI_LESS)))
    )


def normalize_disease(mentions: DataFrame, dict_disease: DataFrame) -> DataFrame:
    """J4: disease lookup (sieve jar stand-in) on the tmChem-style key; the
    reference's multi-ID tab-packing becomes an array downstream (J8)."""
    d = _bcast_lookup(dict_disease, tmchem_key, "oid")
    return (
        mentions.withColumn("join_key", tmchem_key(F.col("mention")))
        .join(d, "join_key", "left")
        .drop("join_key")
        .withColumn("oid", F.coalesce("oid", F.lit(CUI_LESS)))
    )


def normalize_gene(
    mentions: DataFrame,
    dict_gene: DataFrame,
    dict_gene_oldbest: DataFrame,
    dict_gene_freq: DataFrame,
) -> DataFrame:
    """J5: the 3-dictionary first-match cascade (normalize.py:584-589) as
    three broadcast left joins + coalesce; gene ids root-truncated at ``-``
    (normalize.py:578-580) and the `" gene"` suffix stripped from the
    lookup key (P8, normalize.py:540-548)."""
    key = lambda c: gene_suffix_strip(c)  # noqa: E731
    d1 = _bcast_lookup(dict_gene, lambda c: c, "oid1")
    d2 = _bcast_lookup(dict_gene_oldbest, lambda c: c, "oid2")
    d3 = _bcast_lookup(dict_gene_freq, lambda c: c, "oid3")
    out = (
        mentions.withColumn("join_key", key(F.col("mention")))
        .join(d1, "join_key", "left")
        .join(d2, "join_key", "left")
        .join(d3, "join_key", "left")
        .drop("join_key")
        .withColumn("_oid", F.coalesce("oid1", "oid2", "oid3"))
        .drop("oid1", "oid2", "oid3")
    )
    return out.withColumn(
        "oid",
        F.when(F.col("_oid").isNull(), F.lit(CUI_LESS)).otherwise(gene_id_root(F.col("_oid"))),
    ).drop("_oid")


def attach_metadata(normalized: DataFrame, meta: DataFrame, etype: str) -> DataFrame:
    """J7/J8: left-join external ids; miss keeps the bare id
    (normalize.py:594-603). Multi-IDs stay an array (not tab-packed).
    Gene ext ids get the HGNC:HGNC: cleanup (normalize.py:114)."""
    fixed = meta.select(
        "oid",
        F.transform(F.col("ext_ids"), hgnc_fix).alias("ext_ids")
        if etype == "gene"
        else F.col("ext_ids"),
    )
    return normalized.join(F.broadcast(fixed), "oid", "left").withColumn(
        "norm_ids",
        F.when(F.col("oid") == CUI_LESS, F.array(F.lit(CUI_LESS))).otherwise(
            F.concat(
                F.coalesce(F.col("ext_ids"), F.array().cast("array<string>")),
                F.array(F.concat(F.lit("BERN:"), F.col("oid"))),
            )
        ),
    ).drop("ext_ids")


def normalize_all(
    mentions: DataFrame,
    dicts: dict[str, DataFrame],
) -> DataFrame:
    """Route each etype through its normalizer and union by name — the
    DataFrame form of the reference's per-type thread fan-out
    (normalize.py:255-267). ``dicts`` holds dict_/meta_ tables by name.

    Unknown etypes (e.g. regex-tagger types without a dictionary) pass
    through as CUI-less.
    """
    parts = []
    e = lambda t: mentions.where(F.col("etype") == t)  # noqa: E731
    parts.append(normalize_drug(e("drug"), dicts["dict_drug"]))
    parts.append(normalize_species(e("species"), dicts["dict_species"]))
    parts.append(normalize_mutation(e("mutation"), dicts["dict_mutation"]))
    parts.append(normalize_disease(e("disease"), dicts["dict_disease"]))
    parts.append(
        normalize_gene(
            e("gene"),
            dicts["dict_gene"],
            dicts["dict_gene_oldbest"],
            dicts["dict_gene_freq"],
        )
    )
    known = {"drug", "species", "mutation", "disease", "gene"}
    rest = mentions.where(~F.col("etype").isin(*known)).withColumn("oid", F.lit(CUI_LESS))
    parts.append(rest)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cuiless_ratio(normalized: DataFrame) -> DataFrame:
    """A4 (normalize.py:626-635): per-etype share of unresolved mentions."""
    return normalized.groupBy("etype").agg(
        F.count("*").alias("n_mentions"),
        F.avg(F.when(F.col("oid") == CUI_LESS, 1.0).otherwise(0.0)).alias("cuiless_ratio"),
    )
