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
