"""Mergeable sketch aggregates: HLL distinct-count rollups and theta-sketch
set algebra (Apache DataSketches, built into Spark 3.5+/4.x as
``hll_sketch_agg`` / ``theta_sketch_agg`` and friends).

Why sketches are a first-class 100 TB operator and not a novelty:

* **Exact COUNT(DISTINCT key) does not pre-aggregate.** The partial-agg
  state for an exact distinct is the distinct key set itself, so the
  shuffle carries every distinct key and a grand total over 100 TB is a
  full-corpus shuffle. An HLL sketch is a ~4 KB bounded partial state
  (lgK=12 -> +-1.6% rel. std. error) that map-side combines like a sum.
* **Sketches are MERGEABLE, so rollups never re-scan.** A maintained
  per-(event_type, day) sketch table answers per-type, per-month, and
  grand-total distinct questions by unioning yesterday's sketches with
  today's delta - the incremental pattern every warehouse-scale metrics
  system uses. Re-aggregating raw events for each grain would scan the
  fact table once per grain; the sketch rollup scans it once, total.
* **Theta sketches add set ALGEBRA.** Intersection/difference cardinality
  ("users who did A and B", "A but never B") over exact sets requires a
  join of the two distinct-key sets - at 100 TB, two giant shuffles per
  pair. Theta sketch intersections run on the two ~KB sketches alone.

Estimates are deterministic for a given input (DataSketches seeds are
fixed), but they are engine-specific - DuckDB's approx_count_distinct is
a different sketch - so these register rows-only (the SURVEY R16 pattern)
and the accuracy contract is pinned by tolerance tests against exact
counts in tests/test_sketches.py.

Reference parity note: the reference engine has no approximate aggregate
surface at all (in-memory exact matrices, /root/reference/src/harmony.h);
this module exists for the 100 TB curation workloads the extension
surface targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import table
from harmony_spark.registry import register

_LG_K = 12  # 2^12 buckets -> ~1.6% relative standard error, ~4 KB/sketch


def hll_sketch_table(events: DataFrame, key: str, *grains: str) -> DataFrame:
    """The maintained artifact: one HLL sketch of ``key`` per grain tuple.

    This is what an incremental pipeline persists (sketches are just
    BINARY columns - they survive a parquet round-trip) and unions with
    each day's delta instead of re-scanning history."""
    return events.groupBy(*grains).agg(
        F.hll_sketch_agg(key, F.lit(_LG_K)).alias("sk")
    )


def hll_rollup(sketches: DataFrame, *grains: str) -> DataFrame:
    """Roll a sketch table up to a coarser grain by UNIONING sketches -
    no raw-data access. Returns (grains..., approx_distinct)."""
    g = sketches.groupBy(*grains) if grains else sketches.groupBy()
    return g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "approx_distinct"
        )
    )


@register(
    "q129_hll_rollup",
    oracle=None,  # engine-specific estimates: rows-only + tolerance test
    doc="Mergeable distinct-count rollup: per-(event_type, day) HLL "
    "sketches of user_id (the persisted incremental artifact), rolled "
    "up to per-type and grand-total grains by sketch UNION - the fact "
    "table is scanned exactly once for all three grains, and the "
    "rollup input is ~4 KB per group instead of the distinct key set. "
    "Exact COUNT(DISTINCT) cannot map-side combine (its partial state "
    "is the key set itself); the sketch is the 100 TB answer. "
    "Estimates are deterministic but engine-specific (DataSketches vs "
    "DuckDB's sketch), so this row is rows-only; accuracy vs exact is "
    "pinned to <2% in tests/test_sketches.py.",
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    daily = hll_sketch_table(ev, "user_id", "event_type", "day").localCheckpoint(
        eager=False
    )
    per_type = hll_rollup(daily, "event_type").select(
        F.lit("1_by_type").alias("grain"),
        F.col("event_type").alias("key"),
        "approx_distinct",
    )
    total = hll_rollup(daily).select(
        F.lit("0_total").alias("grain"),
        F.lit("ALL").alias("key"),
        "approx_distinct",
    )
    return total.unionByName(per_type).orderBy("grain", "key")


@register(
    "q131_theta_overlap",
    oracle=None,  # engine-specific estimates: rows-only + tolerance test
    doc="Theta-sketch set algebra: pairwise audience overlap between "
    "event types - |A intersect B|, |A union B|, |A minus B| and the "
    "derived Jaccard - computed entirely on per-type theta sketches of "
    "user_id. The exact equivalent is a self-join of per-type distinct "
    "user sets (two corpus-scale shuffles per pair at 100 TB); the "
    "sketch version reduces the fact table once to K sketches and does "
    "all O(K^2) set operations on ~KB summaries. Rows-only (DuckDB has "
    "no theta sketch); accuracy pinned in tests/test_sketches.py.",
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select("user_id", "event_type")
    sk = (
        ev.groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("sk"))
        .localCheckpoint(eager=False)
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("a.sk"), F.col("b.sk"))
        ).alias("n_both"),
        F.theta_sketch_estimate(F.theta_union(F.col("a.sk"), F.col("b.sk"))).alias(
            "n_either"
        ),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("a.sk"), F.col("b.sk"))
        ).alias("n_only_a"),
    )
    return pairs.withColumn(
        "jaccard",
        F.round(F.col("n_both").cast("double") / F.col("n_either"), 6),
    ).orderBy("type_a", "type_b")
