"""Deterministic corpus sampling for training-data pipelines: split
assignment and sequence packing.

Neither exists in the reference (it is an annotation service, not a
training-data producer), but both are table-stakes for the 100 TB
pretraining pipeline this engine targets, and both are designed for the
properties that matter there:

- **content-keyed determinism**: assignment depends only on the row's
  key (+ an explicit salt), never on ``rand()``, partitioning, or row
  order — re-running on a re-sharded copy of the corpus yields the
  identical split, and adding documents never moves existing ones
  between splits (the leakage hazard of fractional ``randomSplit``).
- **cross-engine checkability**: the hash is md5 (identical hex in
  Spark, DuckDB, Python), so the driver's DuckDB oracle re-derives
  assignments exactly — no engine-specific hash in the contract.
- **shuffle discipline**: split assignment is row-local (zero shuffle);
  packing shuffles once on the shard key and packs within shards via a
  window cumsum — no global ordering, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix bucket space for SPLIT boundaries; 8 hex chars = 32 bits of
# hash, quantized to 10k only where weight resolution is the point
N_BUCKETS = 10_000


def _md5_hash32(key_col, salt: str) -> F.Column:
    """Deterministic 32-bit value from md5(key ':' salt): first 8 hex
    chars parsed base-16 — byte-identical in DuckDB via
    ``('0x' || substr(md5(k || ':' || salt), 1, 8))::BIGINT`` (parity
    pinned by tests/test_round6.py). NULL keys yield NULL (``concat``
    propagates, matching SQL ``||``), so both engines route NULLs the
    same way downstream."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _md5_bucket(key_col, salt: str) -> F.Column:
    """Split-boundary bucket in [0, N_BUCKETS); see :func:`_md5_hash32`."""
    return _md5_hash32(key_col, salt) % N_BUCKETS


def assign_splits(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with
    the given weights (default train/val/test = 98/1/1).

    Boundaries are cumulative over splits in the ORDER GIVEN (Python
    dicts preserve insertion order; order is part of the contract —
    reordering weights reassigns rows). Weights are normalized, so
    {"a": 2, "b": 1} means 2/3 : 1/3. A weight too small to round to at
    least one bucket of the 10k boundary space (or large enough to
    squeeze a later split to zero) raises instead of silently emitting
    an unreachable split — a training job must never discover an empty
    validation set by reading zero files. NULL keys land in the LAST
    split (the hash is NULL, every bound comparison is NULL-false —
    identical routing to the SQL oracle's CASE ELSE). Row-local — no
    shuffle, no jobs; a 10^12-row corpus pays one codegen'd
    projection."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative: {weights}")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    names = list(weights)
    bounds = []
    acc = 0.0
    prev = 0
    for name in names[:-1]:
        acc += weights[name] / total
        bound = int(round(acc * N_BUCKETS))
        if bound <= prev:
            raise ValueError(
                f"split '{name}' rounds to zero buckets at weight "
                f"{weights[name]!r} (boundary space {N_BUCKETS}) — it would "
                "silently receive no rows"
            )
        bounds.append(bound)
        prev = bound
    if bounds and bounds[-1] >= N_BUCKETS:
        raise ValueError(
            f"split '{names[-1]}' rounds to zero buckets — earlier weights "
            "consume the whole boundary space"
        )
    bucket = _md5_bucket(F.col(key_col), salt)
    expr = None
    for name, bound in zip(names[:-1], bounds):
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def pack_documents(
    docs: DataFrame,
    budget_tokens: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Assign documents to fixed-token-budget packing bins:
    (doc_id, n_tokens, shard, bin_id, offset_tokens).

    Pretraining dataloaders want sequences packed to a fixed token
    budget. A strictly-sequential greedy pack is inherently serial, so
    the distributed shape packs WITHIN deterministic shards: documents
    hash (md5, content-keyed) into ``n_shards`` shards, and inside each
    shard a window cumsum over ``id_col`` order assigns
    ``bin_id = floor(tokens_before / budget)`` — one shuffle on the
    shard key, each shard's bins packed tight, bins addressable as
    (shard, bin_id). A document may straddle its bin boundary
    (``offset_tokens + n_tokens > (bin_id+1) * budget``); the consumer
    either truncates at the boundary or carries the tail into the next
    sequence (GPT-style document packing does exactly this). Token
    count is the CoNLL token count (same regex as the W2 tokenizer), so
    the driver oracle re-derives it relationally.

    At 100 TB: ``n_shards`` bounds per-window state (one running sum
    per shard); pick it >= cluster cores so packing parallelizes, and
    small enough that shard bin sequences stay long (bins per shard ~
    corpus_tokens / (n_shards * budget)). The shard comes from the full
    32-bit hash (NOT the 10k split-boundary space — quantizing first
    would skew shard load ~11% at 1024 shards and leave every shard
    past 10k permanently empty). Duplicate ``id_col`` values are
    ordered by (id, n_tokens) so the OUTPUT multiset stays
    deterministic even then (rows tying on both carry interchangeable
    assignments)."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    from bern_spark.functions.pytext import _TOKEN_RE  # single source of truth

    n_tok = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(_TOKEN_RE.pattern), 0)
    ).cast("long")
    d = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (_md5_hash32(F.col(id_col), salt) % n_shards).alias("shard"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col, "n_tokens")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return d.select(
        id_col,
        "n_tokens",
        "shard",
        F.floor(before / budget_tokens).cast("long").alias("bin_id"),
        (before % budget_tokens).cast("long").alias("offset_tokens"),
    )
