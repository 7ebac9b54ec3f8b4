"""Accuracy + mergeability contract for the sketch surface
(extensions/sketches.py). The q129/q131 registry rows are rows-only
(estimates are engine-specific); these tests are their correctness gate:
estimates within tolerance of exact answers, and the merge path
(union of per-day sketches) agreeing with the direct one-shot sketch —
the property that makes incremental rollups sound."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmony_spark.extensions.sketches import hll_rollup, hll_sketch_table
from harmony_spark.io import table
from harmony_spark.registry import load_all

_TOL = 0.02  # lgK=12 -> 1.6% rel. std. error; 2% is > 1 sigma of headroom


def _exact(ev, *grains):
    g = ev.groupBy(*grains) if grains else ev.groupBy()
    return g.agg(F.countDistinct("user_id").alias("n"))


def test_hll_rollup_within_tolerance(spark, sf_dir):
    specs = load_all()
    rows = {
        (r["grain"], r["key"]): r["approx_distinct"]
        for r in specs["q129_hll_rollup"].fn(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact_total = _exact(ev).first()["n"]
    assert abs(rows[("0_total", "ALL")] - exact_total) <= max(1, _TOL * exact_total)
    for r in _exact(ev, "event_type").collect():
        est = rows[("1_by_type", r["event_type"])]
        assert abs(est - r["n"]) <= max(1, _TOL * r["n"])


def test_hll_merge_equals_direct_sketch(spark, sf_dir):
    """Union of per-day sketches == sketching the whole table directly:
    the identity that lets an incremental pipeline maintain sketches
    instead of re-scanning history."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    daily = hll_sketch_table(ev, "user_id", "event_type", "day")
    merged = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(daily, "event_type").collect()
    }
    direct = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(
            hll_sketch_table(ev, "user_id", "event_type"), "event_type"
        ).collect()
    }
    assert merged == direct


def test_sketch_survives_parquet_roundtrip(spark, sf_dir, tmp_path):
    """The sketch table is a persistable artifact: BINARY sketches written
    to parquet and read back must union to the same estimates."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    daily = hll_sketch_table(ev, "user_id", "event_type", "day")
    path = str(tmp_path / "sketches.parquet")
    daily.write.mode("overwrite").parquet(path)
    before = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(daily, "event_type").collect()
    }
    after = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_rollup(spark.read.parquet(path), "event_type").collect()
    }
    assert before == after


def test_theta_overlap_within_tolerance(spark, sf_dir):
    specs = load_all()
    got = {
        (r["type_a"], r["type_b"]): r
        for r in specs["q131_theta_overlap"].fn(spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    a = ev.withColumnRenamed("event_type", "type_a")
    b = ev.withColumnRenamed("event_type", "type_b")
    exact_both = {
        (r["type_a"], r["type_b"]): r["n"]
        for r in a.join(b, ["user_id"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(exact_both)
    for k, n in exact_both.items():
        assert abs(got[k]["n_both"] - n) <= max(1, _TOL * n)
        # set identity on the estimates themselves: |A u B| ~= |A| + |B\A| ... via
        # |only_a| + |both| <= |A| side checks are sketch-noisy; pin the
        # derived jaccard against exact instead.
        exact_either = (
            a.where(F.col("type_a") == k[0])
            .select("user_id")
            .union(b.where(F.col("type_b") == k[1]).select("user_id"))
            .distinct()
            .count()
        )
        assert abs(got[k]["n_either"] - exact_either) <= max(1, _TOL * exact_either)
