"""Spatial analytics: grid-bucketed neighbor joins (q263).

The canonical big-big spatial join problem: "find all point pairs
within radius r" is O(N^2) stated naively. The scale pattern is the
uniform grid — hash every point into an r-wide cell, join each point's
cell against the 3x3 neighborhood of the other side's cells (any pair
within r must fall in adjacent cells), and verify the exact distance
on the candidates only. The same decomposition LSH uses for cosine
candidates (extensions/dedup.py) applied to metric space; at 100 TB
the join is cell-keyed equi work with AQE handling dense-city skew,
and no point ever compares against a point two cells away.

Coordinates here are synthesized deterministically from md5(custkey)
(the test tables carry no geo columns); distances are exact integer
squared-Euclidean, so the radius predicate has no float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.registry import register

__all__ = ["q263"]

_SP_R = 20000  # radius in map units; the synthetic world is 1e6 x 1e6


@register(
    "q263_spatial_neighbor_join",
    oracle=f"""
        WITH pts AS (
          SELECT c_custkey AS id, c_nationkey AS nk,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-x'),
                                      1, 8)) AS BIGINT) % 1000000 AS x,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-y'),
                                      1, 8)) AS BIGINT) % 1000000 AS y
          FROM customer
        ),
        prs AS (
          SELECT a.id AS a_id, b.id AS b_id,
                 (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
                 CASE WHEN a.nk = b.nk THEN 1 ELSE 0 END AS same_nk
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= {_SP_R} * {_SP_R}
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(same_nk), 0) AS BIGINT) AS n_same_nation,
               CAST(COALESCE(MIN(d2), 0) AS BIGINT) AS min_dist2,
               CAST(COALESCE(SUM(d2), 0) AS BIGINT) AS sum_dist2
        FROM prs
    """,
    doc=f"Radius-{_SP_R} neighbor self-join over md5-synthesized "
    "customer coordinates on a 1M x 1M map: pair count, same-nation "
    "pair count, and exact integer squared-distance stats. The "
    "oracle runs the literal O(N^2) distance predicate; the engine "
    "runs the GRID decomposition — each point lands in one r-wide "
    "cell, one side explodes into its 3x3 cell neighborhood (a "
    "constant 9x fan-out), and the join is EQUI on cell id, so "
    "candidates are only ever cell-adjacent and each surviving pair "
    "is found exactly once (the non-exploded side's cell is unique). "
    "This is the standard scale plan for spatial joins "
    "(geohash/S2/H3 bucketing) and for any metric-ball join. "
    "Determinism: coordinates from seedless md5, distances exact "
    "BIGINT — the radius threshold has no float boundary anywhere.",
)
def q263(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    def u(suf: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("c_custkey").cast("string"), F.lit(suf))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        )

    pts = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nk"),
        u("-x").alias("x"),
        u("-y").alias("y"),
    )
    a = pts.select(
        F.col("id").alias("a_id"),
        F.col("nk").alias("a_nk"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.expr(f"(x DIV {_SP_R}) * 1024 + (y DIV {_SP_R})").alias("cell"),
    )
    b = (
        pts.select(
            F.col("id").alias("b_id"),
            F.col("nk").alias("b_nk"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
        )
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn(
            "cell",
            F.expr(f"(bx DIV {_SP_R} + dx) * 1024 + (by DIV {_SP_R} + dy)"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    prs = (
        a.join(b, "cell")
        .where((F.col("a_id") < F.col("b_id")) & (d2 <= _SP_R * _SP_R))
        .select(
            d2.alias("d2"),
            F.when(F.col("a_nk") == F.col("b_nk"), 1)
            .otherwise(0)
            .alias("same_nk"),
        )
    )
    return prs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.coalesce(F.sum("same_nk"), F.lit(0))
        .cast("long")
        .alias("n_same_nation"),
        F.coalesce(F.min("d2"), F.lit(0)).cast("long").alias("min_dist2"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("long").alias("sum_dist2"),
    )
