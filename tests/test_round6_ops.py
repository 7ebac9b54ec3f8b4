"""Third-implementation checks for the round-6 operator families.

Each test recomputes the statistic with an INDEPENDENT pure-Python /
NumPy implementation over the same parquet inputs (pandas read — the
corpora are small at the test scale factor) and compares against the
registry query's Spark result. This is stronger than the DuckDB oracle
gate alone: the oracle shares the SQL formulation, the replica shares
nothing but the definition.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from harmony_spark.registry import load_all


@pytest.fixture(scope="module")
def queries():
    return load_all()


def _docs(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _orders(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def _lineitem(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def test_exact_span_dedup_matches_python(spark, sf_dir, queries):
    """q358 vs a direct Python replica of Lee-et-al span semantics:
    50-gram multiplicity census, then per-doc gap<=50 run-merge."""
    k = 50
    occurrences: dict[str, int] = {}
    doc_positions: dict[int, list[tuple[int, str]]] = {}
    for _, row in _docs(sf_dir).iterrows():
        toks = [t for t in re.split(r"\s+", row["text"].lower())]
        if len(toks) < k:
            continue
        pos = []
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            occurrences[g] = occurrences.get(g, 0) + 1
            pos.append((i + 1, g))
        doc_positions[row["doc_id"]] = pos
    spans = []
    docs_hit = set()
    for doc_id, pos in doc_positions.items():
        dup = [p for p, g in pos if occurrences[g] > 1]
        if not dup:
            continue
        docs_hit.add(doc_id)
        start = prev = dup[0]
        for p in dup[1:]:
            if p - prev <= k:
                prev = p
            else:
                spans.append(prev - start + k)
                start = prev = p
        spans.append(prev - start + k)
    expected = {
        "n_docs_affected": len(docs_hit),
        "n_spans": len(spans),
        "total_dup_tokens": sum(spans),
        "max_span_tokens": max(spans) if spans else 0,
    }
    got = queries["q358_exact_span_dedup"].fn(spark, sf_dir).collect()[0].asDict()
    assert got == expected


def test_trimmed_winsorized_matches_numpy(spark, sf_dir, queries):
    """q364 vs NumPy: rank-exact 10% trim and the clamp identity."""
    li = _lineitem(sf_dir)
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    expected = {}
    for grp in sorted(li["l_returnflag"].unique()):
        y = np.sort(cents[li["l_returnflag"].to_numpy() == grp])
        n = len(y)
        cut = n // 10
        kept = y[cut : n - cut]
        wins = np.concatenate(
            [np.full(cut, kept[0]), kept, np.full(cut, kept[-1])]
        )
        expected[grp] = (
            n,
            len(kept),
            round(float(kept.sum()) / len(kept), 6),
            round(float(wins.sum()) / n, 6),
        )
    rows = queries["q364_trimmed_winsorized_mean"].fn(spark, sf_dir).collect()
    got = {
        r["grp"]: (
            r["n"],
            r["n_kept"],
            r["trimmed_mean_cents"],
            r["winsorized_mean_cents"],
        )
        for r in rows
    }
    assert got == expected


def test_jackknife_matches_numpy(spark, sf_dir, queries):
    """q371 vs NumPy delete-one-group jackknife over the nation census."""
    o = _orders(sf_dir)
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    cents = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    nk = (
        o[["o_custkey"]]
        .merge(
            c[["c_custkey", "c_nationkey"]],
            left_on="o_custkey",
            right_on="c_custkey",
        )["c_nationkey"]
        .to_numpy()
    )
    df = pd.DataFrame({"nk": nk, "cents": cents})
    g = df.groupby("nk")["cents"].agg(["sum", "count"])
    st, nt = g["sum"].sum(), g["count"].sum()
    theta = st / nt
    theta_i = (st - g["sum"]) / (nt - g["count"])
    gg = len(g)
    tbar = theta_i.mean()
    se = math.sqrt((gg - 1) / gg * ((theta_i - tbar) ** 2).sum())
    row = queries["q371_jackknife_influence"].fn(spark, sf_dir).collect()[0]
    assert row["n_groups"] == gg
    assert row["mean_cents"] == pytest.approx(theta, abs=2e-6)
    assert row["jackknife_se"] == pytest.approx(se, rel=1e-6)
    assert row["max_influence_cents"] == pytest.approx(
        float((theta_i - theta).abs().max()), rel=1e-6
    )


def test_hash_bootstrap_properties(spark, sf_dir, queries):
    """q365: all replicas non-empty at the 0.632 rate, CI ordered and
    bracketing both means (B=32 on a symmetric-enough statistic)."""
    row = queries["q365_hash_bootstrap_ci"].fn(spark, sf_dir).collect()[0]
    assert row["n_replicas"] == 32
    assert row["ci_lo"] <= row["boot_mean"] <= row["ci_hi"]
    # Bernoulli(0.632) subsample means concentrate around the full mean
    assert row["ci_lo"] <= row["full_mean"] <= row["ci_hi"]


def test_randomization_test_properties(spark, sf_dir, queries):
    """q370: add-one p-value bounds, replica count, finite statistic."""
    row = queries["q370_randomization_test"].fn(spark, sf_dir).collect()[0]
    b = row["n_replicas"]
    assert 0 < b <= 64
    assert 1.0 / (b + 1) - 1e-9 <= row["p_value"] <= 1.0
    assert math.isfinite(row["t_obs"])
    assert row["n_a"] > 0 and row["n_rest"] > 0


def test_conformal_coverage_near_nominal(spark, sf_dir, queries):
    """q367: out-of-sample coverage of the 90% split-conformal interval
    is near nominal (finite-sample slack at the test scale factor)."""
    row = queries["q367_split_conformal"].fn(spark, sf_dir).collect()[0]
    assert row["n_calib"] > 0 and row["n_test"] > 0
    assert row["halfwidth_cents"] > 0
    assert 0.78 <= row["coverage"] <= 1.0


def test_hurst_exponent_range(spark, sf_dir, queries):
    """q363: H of an aggregated revenue series lands in (0, 1) and all
    three R/S scales contribute."""
    row = queries["q363_hurst_exponent"].fn(spark, sf_dir).collect()[0]
    assert row["n_scales"] == 3
    assert 0.0 < row["hurst_h"] < 1.0


def test_simpson_matches_python(spark, sf_dir, queries):
    """q373 vs a direct Python token census."""
    docs = _docs(sf_dir)
    exp = {}
    for src, grp in docs.groupby("source"):
        counts: dict[str, int] = {}
        for text in grp["text"]:
            for t in re.split(r"\s+", text.lower()):
                if t:
                    counts[t] = counts.get(t, 0) + 1
        n = sum(counts.values())
        c2 = sum(v * v for v in counts.values())
        exp[src] = (n, len(counts), round(1 - c2 / (n * n), 6))
    rows = queries["q373_simpson_diversity"].fn(spark, sf_dir).collect()
    for r in rows:
        n, v, div = exp[r["source"]]
        assert (r["n_tokens"], r["vocab"]) == (n, v)
        assert r["simpson_diversity"] == pytest.approx(div, abs=2e-6)


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """write_bucketed's contract: a join between two tables bucketed on
    the join key with the same bucket count plans WITHOUT a shuffle
    exchange on either side (the 100 TB fact-to-fact join path)."""
    from harmony_spark.io import table
    from harmony_spark.operators.layout import write_bucketed

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    spark.sql("DROP TABLE IF EXISTS t6_orders_b")
    spark.sql("DROP TABLE IF EXISTS t6_lineitem_b")
    write_bucketed(orders, "t6_orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "t6_lineitem_b", ["l_orderkey"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("t6_orders_b")
            .join(
                spark.table("t6_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # and it is not an accidentally-broadcast plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # correctness unchanged vs the unbucketed join
        expected = (
            orders.join(
                lineitem, F.col("o_orderkey") == F.col("l_orderkey")
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t6_orders_b")
        spark.sql("DROP TABLE IF EXISTS t6_lineitem_b")


def test_read_text_corpus_modes(spark, tmp_path):
    """Line mode: one record per non-empty line, splittable; wholetext:
    one record per file with newlines preserved."""
    from harmony_spark.io import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha beta\ngamma\n\ndelta\n")
    (d / "b.txt").write_text("epsilon zeta eta\n")
    lines = read_text_corpus(spark, str(d)).collect()
    assert sorted(r["text"] for r in lines) == [
        "alpha beta",
        "delta",
        "epsilon zeta eta",
        "gamma",
    ]
    assert all(r["file"].endswith((".txt",)) for r in lines)
    whole = read_text_corpus(spark, str(d), whole_files=True).collect()
    assert len(whole) == 2
    texts = {r["file"].rsplit("/", 1)[-1]: r["text"] for r in whole}
    assert texts["a.txt"].count("\n") >= 3
    assert texts["b.txt"].startswith("epsilon")
