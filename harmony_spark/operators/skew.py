"""Shuffle-management utilities for skewed and co-located workloads.

AQE's skew-join splitting handles most skew at runtime
(spark.sql.adaptive.skewJoin, on in harmony_spark.session); these are
the explicit tools for the cases AQE can't fix. Measured guidance
(PERFORMANCE.md): do NOT salt algebraic aggregates — Catalyst's
map-side partial aggregation already collapses a hot key per mapper and
salting only adds a shuffle stage; salt when the operator has no
map-side combine (joins on the probe side, collect_list/exact-distinct
aggregates) and AQE cannot split the key further:

  * salted_aggregate — a hot grouping key overwhelms one reducer even
    with AQE (skew is in the AGG, not a join). Two-stage: salt the key,
    partial-agg on (key, salt), final-agg on key. Classic map-side
    spreading; results are exactly equal to the direct aggregate.
  * salted_join — a hot join key on the big side: replicate the small
    side per salt, spread the big side across salts.
  * bucketed co-located join — both sides pre-bucketed on the join key
    at write time: the join plans NO shuffle at read time. This is the
    100 TB answer for repeatedly-joined fact tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame, key: str, agg_exprs: dict[str, str], n_salts: int = 16
) -> DataFrame:
    """Two-stage aggregate for skewed keys. agg_exprs: {col: 'sum'|'count'}.

    Stage 1 reduces each (key, salt) partial on the mappers' shuffle;
    stage 2 combines n_salts rows per key — the hot key's work is spread
    across n_salts reducers.
    """
    salt = (F.rand(seed=0) * n_salts).cast("int")
    stage1_aggs, stage2_aggs = [], []
    for col, how in agg_exprs.items():
        if how == "sum":
            stage1_aggs.append(F.sum(col).alias(f"_p_{col}"))
            stage2_aggs.append(F.sum(f"_p_{col}").alias(f"sum_{col}"))
        elif how == "count":
            stage1_aggs.append(F.count(col).alias(f"_p_{col}"))
            stage2_aggs.append(F.sum(f"_p_{col}").cast("long").alias(f"count_{col}"))
        else:
            raise ValueError(f"unsupported agg {how!r}")
    return (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*stage1_aggs)
        .groupBy(key)
        .agg(*stage2_aggs)
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Equi-join with a salted key: big rows get a random salt, small
    rows are replicated across every salt. Exact same result set as the
    plain join; the hot key's matches spread over n_salts tasks."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", (F.rand(seed=1) * n_salts).cast("int"))
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 8, sort_by: str | None = None
) -> None:
    """Persist a table bucketed (and optionally sorted) on the join key.
    Joins between tables bucketed the same way plan no Exchange."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed saved tables — shuffle-free by layout."""
    return spark.table(left_table).join(spark.table(right_table), key)


def self_pairs_skew_safe(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    hot_threshold: int = 100_000,
    n_blocks: int = 8,
) -> DataFrame:
    """All intra-bucket ordered pairs (id_a < id_b) per key, with HOT
    buckets decomposed into block-pair tasks.

    The plain bucket-local self-join (q35) is 100 TB-safe only while
    every bucket is small: one boilerplate-heavy band bucket with 1M
    members puts 5e11 comparisons on ONE reducer, and AQE cannot split
    it (the skew is inside a single join key, and splitting a self-join
    key misses cross-split pairs). The fix is the triangle replication
    scheme (cf. Okcan & Riedewald's 1-Bucket-Theta, SIGMOD'11): rows of
    a hot bucket are hashed into n blocks; each unordered block pair
    (i<=j) becomes its own shuffle key, so the bucket's |B|^2 work
    spreads over n(n+1)/2 tasks at a replication cost of ~n/2 copies
    per row — tunable, and paid ONLY by buckets over the threshold.

    Detection is one aggregation; the hot-key list is broadcast (hot
    buckets are few by nature — that is what makes them hot). Cold
    buckets take the plain self-join path unchanged.

    The input is localCheckpoint-ed first: this operator references it
    from five places (hot-key detection, both cold self-join legs, both
    hot triangle legs), and without materialization Spark re-derives
    the whole upstream subtree — e.g. a MinHash band table's 8 md5
    chains per document — once per reference. At scale the band table
    is exactly the intermediate you would persist.
    """
    df = df.localCheckpoint(eager=False)
    keys = [F.col(k) for k in key_cols]
    hot_keys = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("_bucket_n"))
        .where(F.col("_bucket_n") > hot_threshold)
        .select(*key_cols)
        .withColumn("_hot", F.lit(True))
    )
    tagged = df.join(F.broadcast(hot_keys), key_cols, "left")

    cold = tagged.where(F.col("_hot").isNull()).drop("_hot")
    ca, cb = cold.alias("a"), cold.alias("b")
    cold_pairs = ca.join(
        cb,
        [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]
        + [F.col(f"a.{id_col}") < F.col(f"b.{id_col}")],
    ).select(
        *[F.col(f"a.{k}") for k in key_cols],
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )

    hot = tagged.where(F.col("_hot")).drop("_hot").withColumn(
        "_blk", F.pmod(F.xxhash64(id_col), F.lit(n_blocks)).cast("int")
    )
    # left leg: a row in block p serves tasks (p, j) for j >= p
    # right leg: a row in block q serves tasks (i, q) for i <= q
    left = hot.withColumn("_i", F.col("_blk")).withColumn(
        "_j", F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1)))
    )
    right = hot.withColumn("_j", F.col("_blk")).withColumn(
        "_i", F.explode(F.sequence(F.lit(0), F.col("_blk")))
    )
    la, rb = left.alias("a"), right.alias("b")
    same_task = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols] + [
        F.col("a._i") == F.col("b._i"),
        F.col("a._j") == F.col("b._j"),
    ]
    # diagonal tasks (i==j) order ids to avoid dup/self pairs; off-
    # diagonal blocks are disjoint, so each unordered pair appears in
    # exactly one task — normalize orientation on output instead
    orient = (F.col("a._i") != F.col("a._j")) | (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    hot_pairs = la.join(rb, same_task + [orient]).select(
        *[F.col(f"a.{k}") for k in key_cols],
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
    )
    return cold_pairs.unionByName(hot_pairs)
