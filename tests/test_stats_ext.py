"""Third-implementation checks for the q219+ statistics family: each
test recomputes the statistic in pure Python from the raw sf0.001
tables and compares to the engine output — independent of BOTH the
Spark plan and the DuckDB oracle (which share the author's SQL
formulation), so a formulation-level mistake mirrored into the oracle
still gets caught here."""

from __future__ import annotations

import math

import duckdb
import pytest

from harmony_spark.registry import load_all


@pytest.fixture(scope="module")
def queries():
    return load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _midranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def test_q219_spearman_matches_python_midranks(spark, sf_dir, queries, con):
    rows = con.sql(
        "SELECT l_returnflag, CAST(l_quantity AS BIGINT),"
        " CAST(ROUND(l_extendedprice * 100) AS BIGINT) FROM lineitem"
    ).fetchall()
    got = {
        r["grp"]: (r["n"], r["rho"])
        for r in queries["q219_spearman_rho"].fn(spark, sf_dir).collect()
    }
    groups = {}
    for g, x, y in rows:
        groups.setdefault(g, ([], []))
        groups[g][0].append(x)
        groups[g][1].append(y)
    for g, (xs, ys) in groups.items():
        rx, ry = _midranks(xs), _midranks(ys)
        n = len(xs)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        assert got[g][0] == n
        assert abs(got[g][1] - num / den) < 2e-6, g


def test_q220_kendall_matches_bruteforce_pairs(spark, sf_dir, queries, con):
    census = con.sql(
        """SELECT n.n_name,
                  CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT),
                  COUNT(DISTINCT c.c_custkey)
           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
           JOIN nation n ON n.n_nationkey = c.c_nationkey
           GROUP BY n.n_name"""
    ).fetchall()
    conc = disc = tx = ty = 0
    for i in range(len(census)):
        for j in range(i + 1, len(census)):
            dx = census[i][1] - census[j][1]
            dy = census[i][2] - census[j][2]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    npair = len(census) * (len(census) - 1) // 2
    tau = (conc - disc) / math.sqrt((npair - tx) * (npair - ty))
    row = queries["q220_kendall_tau"].fn(spark, sf_dir).collect()[0]
    assert row["n"] == len(census)
    assert row["concordant"] == conc and row["discordant"] == disc
    assert abs(row["tau_b"] - tau) < 2e-6


def test_q221_mann_whitney_matches_bruteforce_u(spark, sf_dir, queries, con):
    rows = con.sql(
        """SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)
           FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')"""
    ).fetchall()
    g1 = [v for p, v in rows if p == "1-URGENT"]
    g2 = [v for p, v in rows if p == "5-LOW"]
    # U1 = #{(a, b): a > b} + 0.5 * #ties, brute force
    u2 = 0  # doubled to stay integral under 0.5-ties
    for a in g1:
        for b in g2:
            if a > b:
                u2 += 2
            elif a == b:
                u2 += 1
    row = queries["q221_mann_whitney"].fn(spark, sf_dir).collect()[0]
    assert (row["n1"], row["n2"]) == (len(g1), len(g2))
    assert row["u1_x2"] == u2


def test_q228_isotonic_matches_python_pava(spark, sf_dir, queries):
    rows = (
        queries["q228_isotonic_calibration"].fn(spark, sf_dir).collect()
    )
    rows.sort(key=lambda r: r["bin"])
    # monotone nondecreasing
    iso = [r["iso_acc"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    # equals classic PAVA on the same (rate, n) sequence
    rates = [r["acc"] for r in rows]
    ns = [r["n"] for r in rows]
    blocks = []
    for v, w in zip(rates, ns):
        blocks.append([v, w])
        while len(blocks) > 1 and blocks[-2][0] >= blocks[-1][0]:
            v2, w2 = blocks.pop()
            v1, w1 = blocks.pop()
            blocks.append([(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2])
    want = []
    for v, w in blocks:
        n_bins = 0
        acc = 0
        while acc < w - 1e-9:
            acc += ns[len(want) + n_bins]
            n_bins += 1
        want.extend([v] * n_bins)
    assert all(abs(a - b) < 2e-6 for a, b in zip(iso, want))


def test_q232_waterfill_exhausts_budget(spark, sf_dir, queries, con):
    rows = (
        queries["q232_token_budget_waterfill"].fn(spark, sf_dir).collect()
    )
    total = con.sql("SELECT SUM(n_chars) FROM documents").fetchone()[0]
    budget = math.floor(total * 0.5)
    alloc = sum(r["alloc"] for r in rows)
    # allocations exactly exhaust the budget (up to the 4-dp rounding)
    assert abs(alloc - budget) < 1e-2 * len(rows)
    # every source: alloc == min(chars, water level); uncapped sources
    # keep everything, capped sources share one level
    capped = [r["alloc"] for r in rows if r["alloc"] < r["chars"]]
    assert len(set(capped)) <= 1
    for r in rows:
        assert r["alloc"] <= r["chars"] + 1e-9


def test_q238_rbo_matches_direct_depth_loop(spark, sf_dir, queries, con):
    import collections
    import re

    docs = con.sql("SELECT source, text FROM documents").fetchall()
    counts = {"A": collections.Counter(), "B": collections.Counter()}
    for source, text in docs:
        half = "A" if int(source[3:]) < 10 else "B"
        for tok in re.split(r"\s+", text.lower()):
            if tok:
                counts[half][tok] += 1
    tops = {}
    for h in "AB":
        ranked = sorted(counts[h].items(), key=lambda kv: (-kv[1], kv[0]))
        tops[h] = [t for t, _ in ranked[:50]]
    p = 0.9
    rbo = 0.0
    for d in range(1, 51):
        xd = len(set(tops["A"][:d]) & set(tops["B"][:d]))
        rbo += p ** (d - 1) * xd / d
    rbo *= 1 - p
    row = queries["q238_rank_biased_overlap"].fn(spark, sf_dir).collect()[0]
    want_common = len(set(tops["A"]) & set(tops["B"]))
    assert row["n_common"] == want_common
    assert abs(row["rbo"] - rbo) < 2e-6


def test_q241_moment_subtraction_equals_direct_fit(spark, sf_dir, queries, con):
    rows = con.sql(
        """SELECT l_orderkey % 5, CAST(l_quantity AS BIGINT),
                  CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           FROM lineitem"""
    ).fetchall()
    got = {
        r["fold"]: r
        for r in queries["q241_kfold_ols_cv"].fn(spark, sf_dir).collect()
    }
    for fold in range(5):
        train = [(x, y) for f, x, y in rows if f != fold]
        n = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxx = sum(x * x for x, _ in train)
        sxy = sum(x * y for x, y in train)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        icept = (sy - slope * sx) / n
        test = [(x, y) for f, x, y in rows if f == fold]
        rmse = math.sqrt(
            sum((y - icept - slope * x) ** 2 for x, y in test) / len(test)
        )
        assert got[fold]["n_train"] == n
        assert got[fold]["n_test"] == len(test)
        assert abs(got[fold]["slope"] - slope) < 2e-6
        assert abs(got[fold]["rmse_usd"] - rmse / 100) < 2e-4


def test_q272_dtw_matches_python_dp(spark, sf_dir, queries):
    """q272 is rows-only (the banded DP recurrence has a same-row
    dependency no SQL window expresses); gate it against an
    independent full-matrix pure-Python DP on the same integer-cents
    series."""
    from pyspark.sql import functions as F

    from harmony_spark.io import table_parallel

    got = tuple(queries["q272_dtw_alignment"].fn(spark, sf_dir).collect()[0])

    rows = (
        table_parallel(spark, sf_dir, "orders")
        .join(
            table_parallel(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .where(F.col("c_nationkey").isin(1, 2))
        .groupBy(
            F.col("c_nationkey").alias("sid"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .collect()
    )
    ser = {1: [], 2: []}
    for r in rows:
        ser[r.sid].append((r.day, r.cents))
    a = [c for _, c in sorted(ser[1])]
    b = [c for _, c in sorted(ser[2])]
    n, m = len(a), len(b)
    w = max(7, abs(n - m))
    inf = float("inf")
    D = [[inf] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(max(1, i - w), min(m, i + w) + 1):
            c = abs(a[i - 1] - b[j - 1])
            D[i][j] = c + min(D[i - 1][j], D[i][j - 1], D[i - 1][j - 1])
    assert got == (n, m, int(D[n][m]))
