"""Distributed deterministic corpus generator for scale runs.

The driver-side ``datagen.generate`` builds full golden fixtures (labeled
pairs, golden mentions) and is fine at test scale; for throughput/scaling
runs the corpus itself must be generated IN Spark — ``spark.range``
partitions the conv-id space and an Arrow-batched generator builds each
conversation from ``random.Random(seed ^ conv_idx)``, so output is
byte-identical regardless of partitioning or core count (required for the
same-input two-parallelism scaling evidence).
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bern_spark.datagen import SPECIES_STOPLIST, _FILLER, make_entities

_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def scale_corpus(
    spark: SparkSession,
    n_convs: int,
    per_type: int = 100,
    seed: int = 2019,
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, dict[str, DataFrame]]:
    """Return (transcripts, lexicon, dicts) with transcripts generated
    distributively. Entities/dictionaries are driver-built (small dims)."""
    rng = random.Random(seed)
    entities = make_entities(rng, per_type)
    surfaces = [(e.etype, s) for e in entities for s in e.surfaces]
    stop = list(SPECIES_STOPLIST)
    roles = ["user", "assistant", "tool"]
    tools = [None, "search", "lookup", "calc"]
    base_ts = 1700000000

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for ci in pdf["id"]:
                r = random.Random(seed * 1_000_003 + int(ci))
                n_turns = 2 + r.randrange(7)
                for ti in range(n_turns):
                    words = []
                    for _ in range(2 + r.randrange(5)):
                        words.append(r.choice(_FILLER))
                    for _ in range(r.randrange(4)):
                        roll = r.random()
                        if roll < 0.06:
                            words.append(r.choice(stop))
                        else:
                            words.append(r.choice(surfaces)[1])
                        for _ in range(1 + r.randrange(3)):
                            words.append(r.choice(_FILLER))
                    rows.append(
                        (
                            f"c{int(ci):08d}",
                            ti,
                            roles[ti % 3],
                            " ".join(words),
                            r.choice(tools),
                            # bounded horizon: wraps every 1M convs so ts
                            # stays within pandas' ns-timestamp range at
                            # any corpus size
                            base_ts + (int(ci) % 1_000_000) * 60 + ti,
                        )
                    )
            out = _pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )
            out["ts"] = _pd.to_datetime(out["ts"], unit="s")
            yield out

    parts = partitions or max(32, n_convs // 2000)
    transcripts = (
        spark.range(0, n_convs, numPartitions=parts).mapInPandas(gen, schema=_SCHEMA)
    )

    lex_rows = []
    seen = set()
    for et, s in surfaces:
        if (et, s) not in seen:
            seen.add((et, s))
            lex_rows.append((et, s, 0.8))
    for s in stop:
        if ("species", s) not in seen:
            lex_rows.append(("species", s, 0.8))
    lexicon = spark.createDataFrame(lex_rows, ["etype", "surface", "weight"])

    dict_schema = T.StructType(
        [T.StructField("oid", T.StringType()), T.StructField("name", T.StringType())]
    )
    meta_schema = T.StructType(
        [
            T.StructField("oid", T.StringType()),
            T.StructField("ext_ids", T.ArrayType(T.StringType())),
        ]
    )
    by_type: dict[str, list] = {t: [] for t in ("gene", "disease", "drug", "species", "mutation")}
    for e in entities:
        if e.oid is None:
            continue
        for name in e.dict_names:
            by_type[e.etype].append((e.oid, name))
    dicts = {
        f"dict_{t}": spark.createDataFrame(v or [("_", "_")], dict_schema)
        for t, v in by_type.items()
    }
    dicts["dict_gene_oldbest"] = spark.createDataFrame([], dict_schema)
    dicts["dict_gene_freq"] = spark.createDataFrame([], dict_schema)
    for k in ("meta_gene", "meta_disease", "meta_drug"):
        dicts[k] = spark.createDataFrame([], meta_schema)
    return transcripts, lexicon, dicts


def lowdup_documents(
    spark: SparkSession,
    n_docs: int,
    doc_len: int = 60,
    dup_every: int = 100,
    vocab: int = 50_000,
    seed: int = 2019,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic documents corpus with a ~``1/dup_every`` near-dup
    rate, for benching banded near-dup detection ON THE ENGINE (the
    driver's synthetic documents share a ~30-word vocabulary, so every
    pair is a near-dup and banded-verify walls there measure the corpus):
    doc ``i`` with ``i % dup_every == 0`` (i>0) re-generates doc
    ``i-1``'s token sequence with its last token replaced — a true
    near-dup (Jaccard ~= (doc_len-1)/(doc_len+1) over distinct tokens) —
    while unrelated docs draw ``doc_len`` tokens from a ``vocab``-sized
    synthetic vocabulary (expected pairwise overlap ~doc_len^2/vocab
    tokens, Jaccard ~0). Pure Catalyst (seeded xxhash64 token picks), so
    output is byte-identical at any partitioning/core count."""
    base = spark.range(n_docs, numPartitions=partitions)
    is_dup = (F.col("id") % dup_every == 0) & (F.col("id") > 0)
    src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
    pick = lambda p: F.concat(  # noqa: E731
        F.lit("w"), F.pmod(F.xxhash64(src, p, F.lit(seed)), F.lit(vocab))
    )
    body = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(doc_len - 2)), pick)
    )
    last = F.when(is_dup, F.lit("variant")).otherwise(pick(F.lit(doc_len - 1)))
    return base.select(
        F.col("id").cast("long").alias("doc_id"),
        F.concat_ws(" ", body, last).alias("text"),
    )
