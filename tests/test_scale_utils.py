"""Tests for the explicit shuffle-management utilities and the
approximate-aggregate surface."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from harmony_spark.io import table
from harmony_spark.operators import skew


def _plan(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_salted_aggregate_equals_direct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    direct = {
        r["l_returnflag"]: (round(r["s"], 6), r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count("l_quantity").alias("c"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_quantity"])
        for r in skew.salted_aggregate(
            li, "l_returnflag", {"l_quantity": "sum"} | {}, n_salts=16
        )
        .join(
            skew.salted_aggregate(li, "l_returnflag", {"l_quantity": "count"}, 16)
            .withColumnRenamed("count_l_quantity", "count_l_quantity"),
            "l_returnflag",
        )
        .collect()
    }
    assert direct == salted


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy()
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 4).alias("s"))
        .first()
    )
    big = orders.withColumnRenamed("o_custkey", "k")
    small = customer.withColumnRenamed("c_custkey", "k")
    salted = (
        skew.salted_join(big, small, "k", n_salts=8)
        .groupBy()
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 4).alias("s"))
        .first()
    )
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_bucketed_join_plans_no_shuffle(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and cannot be redirected per-test
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    skew.write_bucketed(orders, "b_orders", "o_custkey", n_buckets=4)
    skew.write_bucketed(customer, "b_customer", "o_custkey", n_buckets=4)
    joined = skew.bucketed_join(spark, "b_orders", "b_customer", "o_custkey")
    # disable broadcast so the co-located layout is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        n = joined.count()
        assert n == table(spark, sf_dir, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_approx_count_distinct_tolerance(spark, sf_dir):
    """§2.8: approx_count_distinct within 5% of exact (engine-only —
    HLL sketches are engine-specific, so no cross-engine oracle)."""
    li = table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey").alias("n")).first()["n"]
    approx = li.select(F.approx_count_distinct("l_orderkey", rsd=0.02).alias("n")).first()["n"]
    assert abs(approx - exact) / exact < 0.05


def test_ivf_ann_matches_bruteforce_neighbors(spark, sf_dir):
    """IVF ANN: reported cosines must be exact; top-1 should usually
    agree with brute force (same-bucket queries)."""
    from harmony_spark.extensions.similarity import ivf_ann
    from harmony_spark.registry import load_all

    ivf = ivf_ann(spark, sf_dir).collect()
    assert ivf, "IVF returned nothing"
    brute = {
        (r["q_id"], r["c_id"]): r["cos"]
        for r in load_all()["q37_cosine_topk"].fn(spark, sf_dir).collect()
    }
    for r in ivf:
        if (r["q_id"], r["c_id"]) in brute:
            assert abs(brute[(r["q_id"], r["c_id"])] - r["cos"]) < 1e-9


def test_scale_expression_matches_dense_numpy(spark):
    """P2 kernel vs a dense NumPy z-score on random sparse matrices:
    implicit zeros included in mu/sd, clipping applied."""
    import numpy as np
    from harmony_spark.functions.preprocessing import scale_expression

    rng = np.random.default_rng(5)
    n_cells, n_genes = 40, 15
    dense = np.zeros((n_genes, n_cells))
    mask = rng.random((n_genes, n_cells)) < 0.25
    dense[mask] = rng.exponential(50, size=mask.sum())
    rows = [
        (int(c), int(g), float(dense[g, c]))
        for g in range(n_genes)
        for c in range(n_cells)
        if mask[g, c]
    ]
    coo = spark.createDataFrame(rows, "cell_id long, gene_id long, value double")
    got = {
        (r["cell_id"], r["gene_id"]): r["scaled"]
        for r in scale_expression(coo, n_cells=n_cells).collect()
    }
    mu = dense.mean(axis=1)
    sd = dense.std(axis=1, ddof=1)
    want = np.clip((dense - mu[:, None]) / sd[:, None], -10, 10)
    assert len(got) == len(rows)
    for (c, g), v in got.items():
        assert abs(v - want[g, c]) < 1e-9, (c, g, v, want[g, c])


# ---------------------------------------------------------------- layout


def test_clustered_write_enables_rowgroup_pruning(spark, sf_dir, tmp_path):
    """write_clustered must produce near-disjoint row-group key ranges
    (the property parquet min/max skipping needs), and the filtered read
    must push the predicate to the scan."""
    from harmony_spark.operators import layout

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    random_path = str(tmp_path / "events_random")
    clustered_path = str(tmp_path / "events_clustered")
    # adversarial baseline: shuffle rows randomly, several small row
    # groups per file so spans exist to measure
    ev.repartition(4).write.mode("overwrite").option(
        "parquet.block.size", 64 * 1024
    ).parquet(random_path)
    layout.write_clustered(ev, clustered_path, ["user_id"], num_files=4)

    q_random = layout.clustering_quality(random_path, "user_id")
    q_clustered = layout.clustering_quality(clustered_path, "user_id")
    # random layout: every row group spans ~the full user range
    assert q_random > 0.8
    # clustered: a point lookup touches a small fraction of row groups
    assert q_clustered < 0.5
    assert q_clustered < q_random / 2

    got = spark.read.parquet(clustered_path).where(F.col("user_id") == 7)
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)" in _plan(got)
    want = ev.where(F.col("user_id") == 7)
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )


def test_partitioned_write_plans_partition_filters(spark, sf_dir, tmp_path):
    """Directory partitioning must prune at plan time (PartitionFilters),
    before any file is read."""
    from harmony_spark.operators import layout

    ev = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "events_bytype")
    layout.write_partitioned(ev, path, ["event_type"])

    got = spark.read.parquet(path).where(F.col("event_type") == "click")
    plan = _plan(got)
    assert "PartitionFilters" in plan and "event_type" in plan
    n_click = ev.where(F.col("event_type") == "click").count()
    assert got.count() == n_click


def test_self_pairs_skew_safe_exact(spark):
    """Triangle-decomposed pair generation must emit exactly the naive
    self-join's pair set: one hot bucket (120 rows -> 7140 pairs spread
    over 10 block-pair tasks) plus cold buckets on the plain path."""
    import pyspark.sql.functions as F

    from harmony_spark.operators.skew import self_pairs_skew_safe

    rows = [("hot", i) for i in range(120)] + [
        (f"cold{g}", 1000 + g * 10 + i) for g in range(5) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "k string, id long")

    got = self_pairs_skew_safe(
        df, key_cols=["k"], id_col="id", hot_threshold=50, n_blocks=4
    )
    a, b = df.alias("a"), df.alias("b")
    naive = a.join(
        b, (F.col("a.k") == F.col("b.k")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.k").alias("k"),
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
    )
    g = sorted(map(tuple, got.collect()))
    n = sorted(map(tuple, naive.collect()))
    assert len(g) == len(n) == 120 * 119 // 2 + 5 * 6
    assert g == n


def test_self_pairs_skew_safe_shuffles_on_block_pairs(spark):
    """The scale claim itself: the hot path's join must shuffle on the
    composite (key, block_i, block_j) key — that is what spreads a hot
    bucket over n(n+1)/2 reducers instead of one."""
    import re

    from harmony_spark.operators.skew import self_pairs_skew_safe

    df = spark.createDataFrame(
        [("hot", i) for i in range(120)], "k string, id long"
    )
    p = self_pairs_skew_safe(df, ["k"], "id", hot_threshold=50, n_blocks=4)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"SortMergeJoin \[k#\d+, _i#\d+, _j#\d+\]", plan), plan


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """Single-key clustering serves only its own column; the Morton
    layout must make row-group stats selective on BOTH clustered
    columns (measured from parquet footers, no data pages)."""
    from harmony_spark.operators.layout import (
        clustering_quality,
        write_clustered,
        write_zordered,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    plain, bykey, zord = (
        str(tmp_path / "plain"), str(tmp_path / "bykey"), str(tmp_path / "zord")
    )
    li.write.parquet(plain)
    write_clustered(li, bykey, ["l_partkey"], num_files=8)
    write_zordered(li, zord, ["l_partkey", "l_suppkey"], bits=8, num_files=8)

    assert clustering_quality(plain, "l_partkey") > 0.95
    assert clustering_quality(bykey, "l_partkey") < 0.3  # its own key: strong
    assert clustering_quality(bykey, "l_suppkey") > 0.95  # other key: nothing
    # zorder: both dimensions substantially prunable
    assert clustering_quality(zord, "l_partkey") < 0.8
    assert clustering_quality(zord, "l_suppkey") < 0.8


def test_zorder_key_matches_python_interleave(spark):
    """The Spark bit-op expression must equal a reference Python Morton
    encode for the same equi-width bucketing."""
    from harmony_spark.operators.layout import zorder_key

    rows = [(i, (i * 37) % 100, float((i * 13) % 50)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a long, b double")
    z, stats = zorder_key(df, ["a", "b"], bits=4)
    got = {r["id"]: r["z"] for r in df.select("id", z.alias("z")).collect()}

    n_buckets = 15
    amin, amax = stats["min_a"], stats["max_a"]
    bmin, bmax = stats["min_b"], stats["max_b"]

    def bucket(x, lo, hi):
        return min(n_buckets, int((x - lo) * n_buckets / ((hi - lo) or 1)))

    def interleave(ba, bb):
        zz = 0
        for j in range(4):
            zz |= ((ba >> j) & 1) << (2 * j)
            zz |= ((bb >> j) & 1) << (2 * j + 1)
        return zz

    for i, a, b in rows:
        assert got[i] == interleave(
            bucket(a, amin, amax), bucket(b, bmin, bmax)
        ), (i, a, b)


def test_ivf_index_search_prunes_partitions(spark, sf_dir, tmp_path):
    """The persistent-index search must push the probe cells into
    PartitionFilters — the scan lists only probed cid directories."""
    import pyspark.sql.functions as F

    from harmony_spark.operators.advanced import (
        _ivf_scored,
        build_ivf_index,
        ivf_search,
    )

    idx = str(tmp_path / "idx")
    build_ivf_index(spark, sf_dir, idx)
    queries = _ivf_scored(spark, sf_dir).where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qe"),
        F.col("n").alias("qn"),
        "scores",
    )
    res = ivf_search(spark, idx, queries)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    # the filter clause names cid right after PartitionFilters
    assert "cid" in plan.split("PartitionFilters", 1)[1][:120], plan
    assert len(res.collect()) > 0


def test_zorder_equidepth_prunes_skewed_column(spark, tmp_path):
    """Equi-width bucketing collapses a heavy-tailed column into a few
    hot buckets: every mass-weighted lookup (probes drawn from the data
    itself) scans ~every row group. Equi-depth boundaries
    (percentile_approx quantiles) restore pruning. The uniform second
    dimension keeps working under both methods."""
    import numpy as np

    from harmony_spark.operators.layout import clustering_quality, write_zordered

    rng = np.random.default_rng(7)
    n = 60_000
    a = np.floor(rng.pareto(1.2, n) * 100).astype("int64")  # heavy tail
    b = rng.integers(0, 100_000, n)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a long, b long"
    )
    probes = [int(x) for x in rng.choice(a, 200)]  # mass-weighted workload

    width, depth = str(tmp_path / "width"), str(tmp_path / "depth")
    write_zordered(df, width, ["a", "b"], bits=8, num_files=8, method="equiwidth")
    write_zordered(df, depth, ["a", "b"], bits=8, num_files=8, method="equidepth")

    assert clustering_quality(width, "a", probes=probes) > 0.95  # no pruning
    assert clustering_quality(depth, "a", probes=probes) < 0.85
    # the uniform dimension stays prunable under both methods
    assert clustering_quality(width, "b") < 0.6
    assert clustering_quality(depth, "b") < 0.6


def test_read_any_roundtrip_formats(spark, sf_dir, tmp_path):
    """read_any must load csv/json/orc/parquet copies of the same table
    into identical row sets, and must refuse schema-less csv (the
    double-read trap) rather than silently scanning twice."""
    import pytest

    from harmony_spark.io import read_any, table

    src = table(spark, sf_dir, "nation")
    p_csv, p_json, p_orc = (
        str(tmp_path / "n_csv"), str(tmp_path / "n_json"), str(tmp_path / "n_orc")
    )
    src.write.option("header", "true").csv(p_csv)
    src.write.json(p_json)
    src.write.orc(p_orc)

    want = sorted(tuple(r) for r in src.collect())
    got_csv = read_any(spark, p_csv, "csv", schema=src.schema)
    got_json = read_any(spark, p_json, "json", schema=src.schema)
    got_orc = read_any(spark, p_orc, "orc")
    for got in (got_csv, got_json, got_orc):
        assert sorted(tuple(r) for r in got.select(*src.columns).collect()) == want

    with pytest.raises(ValueError, match="single-pass"):
        read_any(spark, p_csv, "csv")

    # events via read_any must yield the SAME ts dtype as table() — both
    # entry points normalize nanos unconditionally (Spark 4.x ntz cast
    # under pinned UTC, bigint rebuild on older Sparks), so downstream
    # epoch functions behave identically regardless of the entry point.
    ev = read_any(spark, f"{sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert dict(ev.dtypes)["ts"] == dict(table(spark, sf_dir, "events").dtypes)["ts"]
    want_us = table(spark, sf_dir, "events").selectExpr("min(unix_micros(ts))").first()[0]
    assert ev.selectExpr("min(unix_micros(ts))").first()[0] == want_us
