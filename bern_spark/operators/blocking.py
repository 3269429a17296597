"""Blocking: candidate-pair generation without the O(n^2) blow-up.

Pairing operates on **distinct (etype, surface) strings**, never mention
occurrences — the Spark form of the reference's name-level batching
(normalize.py:196-219 dedups mentions by name before the normalizer
round-trip). Identical surfaces are linked to one surface node by star
edges in the clustering graph, so a surface occurring 10^9 times in a
10^12-turn corpus contributes ONE node here, and the hot-block quadratic
("cancer" pinning a key) collapses to the distinct-vocabulary quadratic.

Key families (SURVEY §7 step 4):

- **token block key**: tmChem key (chemical_normalizer.py:64-72) of the
  first CoNLL token, etype-prefixed;
- **full-surface key**: tmChem key of the whole surface — the J1
  key-equivalence class (catches punctuation/space variants exactly);
- **MinHash-LSH bands** over character 3-shingles with seeded
  permutations (deterministic: JVM xxhash64 with per-permutation seeds —
  no PYTHONHASHSEED exposure, no Python at all), catching typo variants
  whose token keys differ.

Hot-block defense for *distinct-surface* blocks that are still large:
block sizes are profiled relationally and oversized blocks are salted
into shards; AQE skew-join splitting backs this up at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bern_spark.functions.keys import tmchem_key

N_PERM = 16  # minhash permutations
N_BANDS = 4  # 4 rows per band


def _shingle_array(surface) -> F.Column:
    """Character 3-shingles of the lowercased, space-collapsed surface as
    a row-local Catalyst array (mirror of pytext.char_shingles; duplicates
    are harmless under min)."""
    norm = F.trim(F.regexp_replace(F.lower(surface), r"\s+", " "))
    return F.when(
        F.length(norm) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 2),
            lambda i: norm.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array(norm))


def _perm_min(sh: F.Column, seed: str) -> F.Column:
    """Min over shingles of xxhash64(seed || shingle) for one seeded
    permutation. The seed is captured via THIS function's scope, not a
    lambda default arg: ``lambda g, p=p`` has two parameters, which
    PySpark's ``transform`` treats as an (element, index) lambda — ``p``
    silently binds to the index Column and ``F.lit(str(p))`` embeds that
    Column's repr (containing a per-construction lambda-variable id) as
    the seed. Signatures were then stable within one plan but DIFFERENT
    across plan constructions — breaking cross-run determinism and
    resume parity (found by the round-5 bucketed-vs-whole-stage test)."""
    lit_seed = F.lit(seed)
    return F.array_min(F.transform(sh, lambda g: F.xxhash64(F.concat(lit_seed, g))))


def minhash_signature(surface) -> F.Column:
    """N_PERM seeded-permutation minima, entirely inside whole-stage
    codegen: per permutation p, min over shingles of xxhash64(p || g).
    Replaces a per-row Python md5 loop (16 digests x shingles per
    surface) with JVM hashing — same statistical contract (independent
    uniform permutations), zero Python worker involvement."""
    sh = _shingle_array(surface)
    return F.array(*[_perm_min(sh, str(p)) for p in range(N_PERM)])


def token_block_key(col) -> F.Column:
    first_tok = F.regexp_extract(col, r"[0-9a-zA-Z]+", 0)
    return tmchem_key(first_tok)


def surface_nodes(mentions: DataFrame) -> DataFrame:
    """Distinct (etype, surface) relation from a mentions DataFrame."""
    return mentions.select("etype", F.col("mention").alias("surface")).dropDuplicates()


def with_block_keys(surfaces: DataFrame) -> DataFrame:
    """Add ``block_key`` (first-token key), ``block_key_full``
    (whole-surface tmChem key), and ``bands`` (LSH band buckets) to a
    distinct-surface relation. Minhash runs once per DISTINCT surface —
    vocabulary-bounded, not corpus-bounded — and is pure Catalyst
    (no Python worker in the blocking path at all)."""
    m = surfaces.withColumn(
        "block_key",
        F.concat_ws(":", F.col("etype"), token_block_key(F.col("surface"))),
    ).withColumn(
        "block_key_full",
        F.concat_ws(":", F.col("etype"), F.lit("fk"), tmchem_key(F.col("surface"))),
    )
    m = m.withColumn("_sig", minhash_signature(F.col("surface")))
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
    surfaces: DataFrame,
    max_block_size: int = 200,
    use_lsh: bool = True,
) -> DataFrame:
    """Within-block distinct-surface pairs, ``surface_a < surface_b``,
    deduped across key families. Returns (block_key, mention_a, mention_b,
    etype) — column names match the scoring stage's contract.

    Salting: blocks larger than ``max_block_size`` split into shards by a
    deterministic surface hash, bounding per-block pair work at cap^2 per
    shard. Cross-shard recall is a DISCLOSED tradeoff, partially
    recoverable via representative bridge pairs: each shard's
    lexicographic-min surface additionally pairs with the block's overall
    min (one bridge pair per shard), so a true match (x, y) split across
    shards can be recovered by transitive clustering — but only when every
    hop in x–shardRep–blockRep–shardRep'–y independently scores above
    threshold, which unrelated representative surfaces generally won't.
    The mechanism adds connectivity, not guaranteed recall; no false
    merges are introduced (bridges still have to *score*).
    ``salting_stats`` reports which blocks sharded so the recall exposure
    is measurable.
    """
    # (surface, etype, bkey) built ROW-LOCAL (round-7): the key families
    # of one surface collapse into one array_distinct'd array + explode —
    # the input is a distinct-surface relation, so rows are unique by
    # construction and the old 3-way union + corpus-of-vocab-sized
    # dropDuplicates shuffle disappears (guide §2.4).
    key_arr = F.array(F.col("block_key"), F.col("block_key_full"))
    if use_lsh:
        key_arr = F.concat(key_arr, F.col("bands"))
    keyed = surfaces.select(
        "surface", "etype", F.explode(F.array_distinct(key_arr)).alias("bkey")
    )

    sizes = keyed.groupBy("bkey").agg(F.count("*").alias("bsize"))
    keyed = keyed.join(
        F.broadcast(sizes.where(F.col("bsize") > max_block_size)), "bkey", "left"
    )
    n_shards = F.ceil(F.col("bsize") / max_block_size)
    keyed = keyed.withColumn(
        "shard",
        F.when(F.col("bsize").isNull(), F.lit(0)).otherwise(
            F.pmod(F.hash("surface"), n_shards)
        ),
    )
    # bridge pairs for sharded blocks: shard-min <-> block-min (every key
    # family prefixes etype into bkey, so a block is single-etype)
    sharded = keyed.where(F.col("bsize").isNotNull())
    shard_reps = sharded.groupBy("bkey", "etype", "shard").agg(
        F.min("surface").alias("rep")
    )
    block_reps = shard_reps.groupBy("bkey", "etype").agg(F.min("rep").alias("brep"))
    bridges = (
        shard_reps.join(block_reps, ["bkey", "etype"])
        .where(F.col("rep") != F.col("brep"))
        .select(
            F.concat_ws("#", "bkey", F.lit("rep")).alias("block_key"),
            F.least("rep", "brep").alias("mention_a"),
            F.greatest("rep", "brep").alias("mention_b"),
            "etype",
        )
    )

    skeyed = keyed.withColumn(
        "bkey", F.concat_ws("#", "bkey", F.col("shard").cast("string"))
    ).drop("bsize", "shard")
    a = skeyed.alias("a")
    b = skeyed.alias("b")
    within = (
        a.join(b, on="bkey")
        .where(F.col("a.etype") == F.col("b.etype"))
        .where(F.col("a.surface") < F.col("b.surface"))
        .select(
            F.col("bkey").alias("block_key"),
            F.col("a.surface").alias("mention_a"),
            F.col("b.surface").alias("mention_b"),
            F.col("a.etype").alias("etype"),
        )
    )
    return within.unionByName(bridges).dropDuplicates(["mention_a", "mention_b", "etype"])


def salting_stats(surfaces: DataFrame, max_block_size: int = 200, use_lsh: bool = True) -> DataFrame:
    """Observability for the hot-block defense: one row per block that
    got sharded — (bkey, bsize, n_shards). Pair volume capped at
    bsize*cap per block instead of bsize^2; the bridge pairs above keep
    cross-shard matches reachable, but a spike here means the block keys
    are too coarse and deserves a look."""
    # same row-local key construction as candidate_pairs (kept identical
    # so the reported stats always describe the real pairing blocks)
    key_arr = F.array(F.col("block_key"), F.col("block_key_full"))
    if use_lsh:
        key_arr = F.concat(key_arr, F.col("bands"))
    keyed = surfaces.select(
        "surface", "etype", F.explode(F.array_distinct(key_arr)).alias("bkey")
    )
    return (
        keyed.groupBy("bkey")
        .agg(F.count("*").alias("bsize"))
        .where(F.col("bsize") > max_block_size)
        .withColumn("n_shards", F.ceil(F.col("bsize") / max_block_size))
    )
