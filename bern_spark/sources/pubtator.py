"""PubTator-format source scan and sinks (SURVEY §2.1 S1/S2/S7/S8).

The reference parses PubTator files with a stateful line loop
(pubtator2dict_list, convert.py:9-100: ``pmid|t|title`` / ``pmid|a|abstract``
/ 6-col tab mention lines, blank-line separated). The Spark-idiomatic
re-expression needs NO stateful parse: every non-blank line carries its
pmid, so classification + field extraction are per-line projections and
document assembly is a groupBy — embarrassingly parallel, splittable at
arbitrary file offsets (a property the reference's sequential parser
lacks and the 100 TB path requires).

Sinks reproduce the PubAnnotation JSON shape (get_pub_annotation,
convert.py:467-504) and the PubTator text shape (get_pubtator,
convert.py:559-586, entity lines sorted by start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# allowed mutation types filter (P6, convert.py:104,190)
MUTATION_TYPES = ["ProteinMutation", "DNAMutation", "SNP"]


def read_pubtator(spark: SparkSession, path: str, filter_mutation_types: bool = True) -> DataFrame:
    """Scan PubTator text into one row per document:
    (pmid, title, abstract, mutations: array<struct<start,end,mention,
    mutation_type,normalized_name>>).

    Span convention: input lines are exclusive-end already (tmVar offsets);
    kept as-is (SURVEY §1.2 fixes exclusive-end at every boundary).
    """
    return parse_pubtator_lines(spark.read.text(path), filter_mutation_types)


def parse_pubtator_lines(lines: DataFrame, filter_mutation_types: bool = True) -> DataFrame:
    """The same scan over any one-column ``value`` relation of PubTator
    lines — the shared kernel behind the file scan (S1), the string scan
    (S2: one-row ``spark.read.text`` equivalence), and the remote fetch
    (S4, sources/remote.py), which explodes HTTP response bodies into
    exactly this shape."""
    lines = lines.where(F.length(F.trim("value")) > 0)

    title = lines.where(F.col("value").rlike(r"^[^|\t]+\|t\|")).select(
        F.regexp_extract("value", r"^([^|\t]+)\|t\|", 1).alias("pmid"),
        F.regexp_replace("value", r"^[^|\t]+\|t\|", "").alias("title"),
    )
    abstract = lines.where(F.col("value").rlike(r"^[^|\t]+\|a\|")).select(
        F.regexp_extract("value", r"^([^|\t]+)\|a\|", 1).alias("pmid"),
        F.regexp_replace("value", r"^[^|\t]+\|a\|", "").alias("abstract"),
    )
    # 6-col mutation rows (schema check = column count, convert.py:63-91;
    # malformed rows are quarantined, not errors — the PERMISSIVE analog)
    parts = F.split("value", "\t")
    mut_lines = lines.where(~F.col("value").rlike(r"^[^|\t]+\|[ta]\|"))
    mutations = mut_lines.where(F.size(parts) == 6).select(
        parts.getItem(0).alias("pmid"),
        F.struct(
            parts.getItem(1).cast("int").alias("start"),
            parts.getItem(2).cast("int").alias("end"),
            parts.getItem(3).alias("mention"),
            parts.getItem(4).alias("mutation_type"),
            parts.getItem(5).alias("normalized_name"),
        ).alias("m"),
    )
    if filter_mutation_types:
        mutations = mutations.where(F.col("m.mutation_type").isin(MUTATION_TYPES))
    # 'No text' mention drop (P7, convert.py:434-435)
    mutations = mutations.where(~F.col("m.mention").contains("No text"))
    muts = mutations.groupBy("pmid").agg(
        F.sort_array(F.collect_list("m")).alias("mutations")  # O1 sort by start
    )
    out = (
        title.join(abstract, "pmid", "full")
        .join(muts, "pmid", "left")
        .select(
            "pmid",
            F.coalesce("title", F.lit("")).alias("title"),
            F.coalesce("abstract", F.lit("")).alias("abstract"),
            F.coalesce(
                "mutations",
                F.array().cast(
                    "array<struct<start:int,end:int,mention:string,"
                    "mutation_type:string,normalized_name:string>>"
                ),
            ).alias("mutations"),
        )
    )
    return out


def quarantine_pubtator(spark: SparkSession, path: str) -> DataFrame:
    """Malformed rows (wrong column count) routed to a quarantine relation
    instead of the reference's returned error strings (convert.py:64-65)."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    parts = F.split("value", "\t")
    return lines.where(
        ~F.col("value").rlike(r"^[^|\t]+\|[ta]\|") & (F.size(parts) != 6)
    ).select(F.col("value").alias("raw"), F.lit("bad_column_count").alias("reason"))


def pubtator_docs_to_transcripts(docs: DataFrame) -> DataFrame:
    """Map PubTator documents to the transcripts input shape: one turn per
    document, text = title + ' ' + abstract (the reference's content
    concatenation, ops.py:176-180 / normalize.py:186-193)."""
    text = F.when(
        F.length("abstract") > 0, F.concat("title", F.lit(" "), "abstract")
    ).otherwise(F.col("title"))
    return docs.select(
        F.col("pmid").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("doc").alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def to_pub_annotation(annotations: DataFrame, project: str = "bern_spark") -> DataFrame:
    """S7: PubAnnotation JSON sink shape (convert.py:467-504): one JSON
    string per turn with sorted denotations; ``sourcedb``/``sourceid``
    map to conv_id/turn_idx. Write with ``df.write.text``."""
    deno = F.transform(
        F.col("denotations"),
        lambda d: F.struct(
            # etype is part of the id: W9 score ties deliberately keep
            # both etype rows at one span, which must not collide to one
            # denotation id (mirrors the etype-scoped clustering node)
            F.concat_ws(
                "|", F.col("conv_id"), F.col("turn_idx"), d["start"], d["etype"]
            ).alias("id"),
            F.struct(d["start"].alias("begin"), d["end"].alias("end")).alias("span"),
            d["etype"].alias("obj"),
            d["norm_ids"].alias("ids"),
        ),
    )
    return annotations.select(
        F.to_json(
            F.struct(
                F.lit(project).alias("project"),
                F.col("conv_id").alias("sourcedb"),
                F.col("turn_idx").cast("string").alias("sourceid"),
                F.col("text"),
                deno.alias("denotations"),
            )
        ).alias("value")
    )


def to_pubtator(annotations: DataFrame) -> DataFrame:
    """S8: PubTator text sink (convert.py:559-586): ``id|t|text`` then one
    tab-separated line per denotation sorted by start, blank-line
    terminated. One output row per turn; write with ``df.write.text``."""
    doc_id = F.concat_ws("_", "conv_id", F.col("turn_idx").cast("string"))
    head = F.concat(doc_id, F.lit("|t|"), F.col("text"))
    ent_lines = F.transform(
        F.col("denotations"),
        lambda d: F.concat_ws(
            "\t",
            doc_id,
            d["start"].cast("string"),
            d["end"].cast("string"),
            d["mention"],
            d["etype"],
            F.array_join(d["norm_ids"], "|"),
        ),
    )
    return annotations.select(
        F.concat(
            F.array_join(F.concat(F.array(head), ent_lines), "\n"), F.lit("\n")
        ).alias("value")
    )
