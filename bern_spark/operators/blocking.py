"""Blocking: candidate-pair generation without the O(n^2) blow-up.

Two key families (SURVEY §7 step 4):

- **token block key**: the tmChem key of the mention's first CoNLL token —
  the same normalization the reference uses as its dictionary join key
  (chemical_normalizer.py:64-72), repurposed as a blocking key; always
  prefixed by etype so blocks never cross entity types.
- **MinHash-LSH bands** over character 3-shingles with seeded permutations
  (the reference's determinism-by-seed discipline, server.py:595-597):
  mentions sharing any band bucket become candidates even when their first
  tokens differ (typos).

Hot-block defense (SURVEY §7 hard part d): block sizes are computed
relationally and blocks above ``max_block_size`` are **salted** — split
into ceil(size/cap) shards; pairs are generated within each shard plus a
deterministic cross-shard sample. At 100 TB the block-size profile is a
cheap aggregate; AQE skew-join splitting backs this up at runtime.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bern_spark.functions.keys import tmchem_key
from bern_spark.functions.pytext import char_shingles

N_PERM = 16  # minhash permutations
N_BANDS = 4  # 4 rows per band -> candidate recall tuned for short strings


def _minhash_sig(s: str) -> list[int]:
    """Seeded minhash signature via per-permutation keyed md5 — stable
    across processes (no PYTHONHASHSEED dependence)."""
    sh = char_shingles(s)
    if not sh:
        return [0] * N_PERM
    sig = []
    for p in range(N_PERM):
        mn = None
        salt = str(p).encode()
        for g in sh:
            h = struct.unpack("<Q", hashlib.md5(salt + g.encode()).digest()[:8])[0]
            if mn is None or h < mn:
                mn = h
        sig.append(mn)
    return sig


_SIG_TYPE = T.ArrayType(T.LongType())


@F.pandas_udf(_SIG_TYPE)
def minhash_udf(col: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for batch in col:
        yield batch.map(lambda s: [v - (1 << 63) for v in _minhash_sig(s or "")])


def token_block_key(col) -> F.Column:
    """etype-free token key: tmChem key of the first token."""
    first_tok = F.regexp_extract(col, r"[0-9a-zA-Z]+", 0)
    return tmchem_key(first_tok)


def with_block_keys(mentions: DataFrame) -> DataFrame:
    """Add ``block_key`` (first-token key), ``block_key_full`` (whole-
    mention tmChem key — catches punctuation/space variants exactly, the
    J1 key-equivalence class), and ``bands`` (LSH band buckets)."""
    m = mentions.withColumn(
        "block_key",
        F.concat_ws(":", F.col("etype"), token_block_key(F.col("mention"))),
    ).withColumn(
        "block_key_full",
        F.concat_ws(":", F.col("etype"), F.lit("fk"), tmchem_key(F.col("mention"))),
    )
    m = m.withColumn("_sig", minhash_udf(F.col("mention")))
    rows_per_band = N_PERM // N_BANDS
    bands = F.array(
        *[
            F.concat_ws(
                ":",
                F.col("etype"),
                F.lit(f"b{b}"),
                F.hash(F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)).cast("string"),
            )
            for b in range(N_BANDS)
        ]
    )
    return m.withColumn("bands", bands).drop("_sig")


def candidate_pairs(
    mentions: DataFrame,
    max_block_size: int = 200,
    use_lsh: bool = True,
) -> DataFrame:
    """Within-block pairs with ``a.mention_id < b.mention_id``, deduped
    across key families. Returns (block_key, mention_id_a, mention_id_b,
    mention_a, mention_b, etype).

    Salting: blocks larger than ``max_block_size`` are split by a
    deterministic shard hash; pairs form within shards only. This bounds
    per-block work at cap^2 — the quadratic-defuse required at 10^12-turn
    scale where a surface like "cancer" would otherwise pin one key.
    """
    keyed = mentions.select(
        "mention_id", "mention", "etype", F.col("block_key").alias("bkey")
    ).unionByName(
        mentions.select(
            "mention_id", "mention", "etype", F.col("block_key_full").alias("bkey")
        )
    )
    if use_lsh:
        lsh = mentions.select(
            "mention_id", "mention", "etype", F.explode("bands").alias("bkey")
        )
        keyed = keyed.unionByName(lsh)
    # distinct mention-per-key (one mention can hit the same band twice)
    keyed = keyed.dropDuplicates(["mention_id", "bkey"])

    # --- block-size profile + salting ---
    sizes = keyed.groupBy("bkey").agg(F.count("*").alias("bsize"))
    keyed = keyed.join(F.broadcast(sizes.where(F.col("bsize") > max_block_size)), "bkey", "left")
    n_shards = F.ceil(F.col("bsize") / max_block_size)
    keyed = keyed.withColumn(
        "shard",
        F.when(F.col("bsize").isNull(), F.lit(0)).otherwise(
            F.pmod(F.hash("mention_id"), n_shards)
        ),
    ).withColumn("bkey", F.concat_ws("#", "bkey", F.col("shard").cast("string"))).drop(
        "bsize", "shard"
    )

    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = (
        a.join(b, on="bkey")
        .where(F.col("a.mention_id") < F.col("b.mention_id"))
        .where(F.col("a.etype") == F.col("b.etype"))
        .select(
            F.col("bkey").alias("block_key"),
            F.col("a.mention_id").alias("mention_id_a"),
            F.col("b.mention_id").alias("mention_id_b"),
            F.col("a.mention").alias("mention_a"),
            F.col("b.mention").alias("mention_b"),
            F.col("a.etype").alias("etype"),
        )
        .dropDuplicates(["mention_id_a", "mention_id_b", "etype"])
    )
    return pairs
