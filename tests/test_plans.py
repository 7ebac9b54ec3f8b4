"""Physical-plan shape assertions (the 100 TB guardrails).

These pin the properties that make the operators scale: filters reach
the parquet scan (PushedFilters), projections prune the read schema,
small dimensions broadcast instead of shuffling the fact side, narrow
array kernels plan no Exchange, and aggregates get map-side partial
aggregation. A regression here is a performance bug even when results
stay correct.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from harmony_spark.registry import load_all


def plan_of(spec, spark, sf_dir, mode: str = "formatted") -> str:
    df = spec.fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q01_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(load_all()["q01_scan_filter_project"], spark, sf_dir)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,30.0)" in plan
    assert "EqualTo(l_returnflag,R)" in plan
    # column pruning: only the 3 projected columns in the read schema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_shipdate" not in read_schema


def test_q16_broadcast_join(spark, sf_dir):
    plan = plan_of(load_all()["q16_broadcast_join_arith"], spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q11_both_dims_broadcast(spark, sf_dir):
    plan = plan_of(load_all()["q11_contingency"], spark, sf_dir, mode="simple")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_q23_range_join_is_broadcast_with_residual(spark, sf_dir):
    plan = plan_of(load_all()["q23_range_join"], spark, sf_dir)
    assert "BroadcastHashJoin" in plan
    # the inequality is a join residual, not a post-join filter stage
    assert "l_quantity" in plan and "p_size" in plan


def test_q04_narrow_no_shuffle(spark, sf_dir):
    """The L2-norm HOF kernel is one narrow pass: a TAKE at the end is
    fine, but no shuffle Exchange may appear before it."""
    plan = plan_of(load_all()["q04_l2_norm"], spark, sf_dir, mode="simple")
    assert "Exchange hashpartitioning" not in plan


def test_q08_partial_final_aggregate(spark, sf_dir):
    plan = plan_of(load_all()["q08_batch_counts"], spark, sf_dir)
    # partial + final hash aggregate around a single exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_q18_no_global_window_shuffle(spark, sf_dir):
    """The moving-average query must TakeOrdered first 100 rows, never
    sort the whole table into one partition."""
    plan = plan_of(load_all()["q18_sliding_window_avg"], spark, sf_dir, mode="simple")
    assert "TakeOrderedAndProject" in plan


def test_q35_join_keyed_on_band(spark, sf_dir):
    """LSH candidate pairing must join on the band hash (bucket-local),
    never cross-join documents."""
    plan = plan_of(load_all()["q35_minhash_lsh_pairs"], spark, sf_dir, mode="simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_on_relational_path(spark, sf_dir):
    plan = plan_of(load_all()["q13_grouped_weighted_sums"], spark, sf_dir, mode="codegen")
    assert "WholeStageCodegen" in plan
