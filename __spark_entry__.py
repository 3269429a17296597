"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship ER pipeline (documents mapped to the
transcripts input shape) at sf0.001; ``queries``/``oracle_sql`` expose the
operator inventory from SURVEY.md §2 plus the training-data ops, each with
a DuckDB oracle where SQL-expressible — including the full-pipeline
``er_pipeline`` entry (SQL_ER_PIPELINE re-derives every stage
relationally); the sole rows-only entry is ``ner_framing`` (WordPiece/
sentence kernels, golden-tested; its relational skeleton is oracled as
``ner_framing_shape``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from bern_spark.entry_queries import er_pipeline_on_documents

    return er_pipeline_on_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bern_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bern_spark.entry_queries import ORACLES

    return dict(ORACLES)
