"""TPC-H tail shapes q211-q218 — the eight optimizer shapes that
complete the 22-query TPC-H suite on the reduced testdata schema.

The testdata is TPC-H-ish (TESTDATA.md): no partsupp table, no
l_shipmode / l_commitdate / l_receiptdate / p_container columns. Each
query below keeps the REFERENCE SHAPE of its TPC-H counterpart (the
join topology, the correlation/decorrelation pattern, the predicate
structure Catalyst must optimize) while substituting available
columns; the substitution is documented per query.

Money contract: revenue terms are summed as exact integer 1e-4 units
(`ROUND(x * 10000)` — extendedprice has 2 decimals, discounts 2, so
the true product lives on the 1e-4 grid and the round is exact),
never as raw double sums, so engine summation order cannot move a
ROUND boundary (the oracle-portability trap PERFORMANCE.md records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.registry import register

__all__ = [
    "q211",
    "q212",
    "q213",
    "q214",
    "q215",
    "q216",
    "q217",
    "q218",
    "q291",
]


def _rev_e4(price="l_extendedprice", disc="l_discount"):
    """Line revenue in exact integer 1e-4 currency units."""
    return F.round(F.col(price) * (1 - F.col(disc)) * 10000).cast("long")


@register(
    "q211_market_share",
    oracle="""
        WITH base AS (
          SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
                      AS BIGINT) AS rev_e4,
                 sn.n_name AS supp_nation
          FROM lineitem l
          JOIN orders o    ON o.o_orderkey = l.l_orderkey
          JOIN customer c  ON c.c_custkey = o.o_custkey
          JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
          JOIN region r    ON r.r_regionkey = cn.n_regionkey
          JOIN supplier s  ON s.s_suppkey = l.l_suppkey
          JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
          JOIN part p      ON p.p_partkey = l.l_partkey
          WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                             THEN rev_e4 ELSE 0 END) AS BIGINT) AS nation_e4,
               CAST(SUM(rev_e4) AS BIGINT) AS total_e4,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN rev_e4 ELSE 0 END) * 1.0
                     / SUM(rev_e4), 6) AS mkt_share
        FROM base GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): NATION_3's share of "
    "ECONOMY-part revenue sold into the AMERICA market, by order "
    "year — the 8-table snowflake (lineitem fanning out to orders→"
    "customer→nation→region on the demand side and supplier→nation "
    "+ part on the supply side) that exercises join REORDERING: "
    "every dimension is broadcast, the two selective filters "
    "(region, p_type) must reach the fact scan through different "
    "arms, and nation is joined twice under different roles. "
    "Substitution vs TPC-H: p_type is a single word here ('ECONOMY' "
    "for 'ECONOMY ANODIZED STEEL'); share denominators are exact "
    "integer 1e-4 sums so the 6-dp share is engine-stable.",
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    o = table_parallel(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = table_parallel(spark, sf, "customer").select("c_custkey", "c_nationkey")
    cn = table_parallel(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    r = (
        table_parallel(spark, sf, "region")
        .where(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    s = table_parallel(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    sn = table_parallel(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    p = (
        table_parallel(spark, sf, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == cn["cn_nationkey"])
        .join(F.broadcast(r), cn["cn_regionkey"] == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["sn_nationkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev_e4().alias("rev_e4"),
            "supp_nation",
        )
    )
    nation_e4 = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("rev_e4")).otherwise(0)
    )
    return (
        base.groupBy("o_year")
        .agg(
            nation_e4.cast("long").alias("nation_e4"),
            F.sum("rev_e4").cast("long").alias("total_e4"),
            F.round(nation_e4 * 1.0 / F.sum("rev_e4"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "q212_product_profit",
    oracle="""
        SELECT sn.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)
                        - CAST(ROUND(p.p_retailprice * l.l_quantity * 1000)
                               AS BIGINT)) AS BIGINT) AS profit_e4
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY nation, o_year
        ORDER BY nation, o_year
    """,
    doc="TPC-H Q9 shape (product-type profit): per supplier-nation, "
    "per order-year profit on parts whose name matches a LIKE "
    "pattern — the non-prefix LIKE that cannot become a range "
    "predicate, the double fan-out (orders for the year, part for "
    "the filter, supplier→nation for the group key), and a profit "
    "expression mixing columns of two tables. Substitution vs "
    "TPC-H: no partsupp here, so unit cost is proxied as 10% of "
    "p_retailprice (ps_supplycost's role in the amount formula); "
    "quantities are integers, so cost_e4 = ROUND(retail * qty * "
    "1e3) is exact on the 1e-4 grid. Profit is summed as exact "
    "integer 1e-4 units; negative groups are kept (no HAVING), "
    "matching Q9's unfiltered output.",
)
def q212(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    o = table_parallel(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = table_parallel(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    sn = table_parallel(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    p = (
        table_parallel(spark, sf, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    cost_e4 = F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 1000
    ).cast("long")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == sn["n_nationkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(_rev_e4() - cost_e4).cast("long").alias("profit_e4"))
        .orderBy("nation", "o_year")
    )


@register(
    "q213_late_lines_by_priority",
    oracle="""
        SELECT l.l_returnflag,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (shipping modes / order priority): count "
    "URGENT+HIGH vs other-priority lineitems among LATE lines in a "
    "two-year window, grouped by category — the join-then-CASE "
    "pivot aggregate whose filter references columns of BOTH join "
    "sides (shipdate vs orderdate + 60 days), so it cannot be "
    "pushed below the join and must run as a post-join filter "
    "before the aggregate. Substitution vs TPC-H: no l_shipmode / "
    "l_commitdate / l_receiptdate here, so the group key is "
    "l_returnflag and 'late' is shipped more than 60 days after "
    "the order date (the receipt-after-commit role). Counts are "
    "exact integers; no rounding surface at all.",
)
def q213(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table_parallel(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q214_promo_revenue",
    oracle="""
        SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(ROUND(l.l_extendedprice
                                             * (1 - l.l_discount) * 10000)
                                       AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS promo_e4,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT) AS total_e4,
               ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                      THEN CAST(ROUND(l.l_extendedprice
                                             * (1 - l.l_discount) * 10000)
                                             AS BIGINT)
                                      ELSE 0 END)
                     / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                      * 10000) AS BIGINT)), 6)
                 AS promo_pct
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-02-01'
    """,
    doc="TPC-H Q14 shape (promotion effect): the percentage of one "
    "month's revenue earned by PROMO-type parts — a single "
    "fact-dim join with a conditional aggregate in BOTH the "
    "numerator and denominator of one output expression (the "
    "CASE-inside-SUM ratio Catalyst must not split into two "
    "passes), under a tight shipdate range that must reach the "
    "parquet scan as a pushed filter. Substitution vs TPC-H: "
    "p_type equals 'PROMO' rather than LIKE 'PROMO%' (single-word "
    "types here). Numerator/denominator are exact integer 1e-4 "
    "sums; the 6-dp percentage is the only double.",
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = table_parallel(spark, sf, "part").select("p_partkey", "p_type")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(0)
    )
    total = F.sum(_rev_e4())
    return li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).agg(
        promo.cast("long").alias("promo_e4"),
        total.cast("long").alias("total_e4"),
        F.round(100.0 * promo / total, 6).alias("promo_pct"),
    )


@register(
    "q215_supplier_relation_count",
    oracle="""
        SELECT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND p.p_size IN (1, 9, 17, 25, 33, 41, 49)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): how many "
    "distinct qualifying suppliers can furnish parts of each "
    "(brand, size) bucket — a NOT-IN anti-join against a filtered "
    "supplier subquery feeding a COUNT(DISTINCT) aggregate, with "
    "negated and IN-list predicates on the dim side. Substitution "
    "vs TPC-H: the supply relationship comes from lineitem (no "
    "partsupp), 'complaint' suppliers are those with negative "
    "account balance (no s_comment), and p_brand/p_size stand in "
    "unchanged. The NOT IN is null-safe by construction (s_suppkey "
    "is a key); Spark plans it as a broadcast anti join, keeping "
    "the distinct-count shuffle keyed on (brand, size, suppkey).",
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table_parallel(spark, sf, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 9, 17, 25, 33, 41, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    bad = (
        table_parallel(spark, sf, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(bad),
            li["l_suppkey"] == bad["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q216_disjunctive_revenue",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice
                                            * (1 - l.l_discount) * 10000)
                                      AS BIGINT)), 0) AS BIGINT) AS revenue_e4
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicate): "
    "revenue over an OR-of-three-conjunctions predicate that mixes "
    "columns from BOTH sides of the join (brand/size from part, "
    "quantity from lineitem) — the query that tests whether the "
    "optimizer extracts the common single-table implications "
    "(p_brand IN (...), p_size <= 15, l_quantity <= 30) and pushes "
    "them below the join while evaluating the full disjunction "
    "above it. Substitution vs TPC-H: no p_container or l_shipmode "
    "columns, so those conjuncts are dropped; the cross-table "
    "OR structure — the actual optimizer challenge — is intact.",
)
def q216(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    p = table_parallel(spark, sf, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(
            arm("Brand#12", 5, 1, 11)
            | arm("Brand#23", 10, 10, 20)
            | arm("Brand#34", 15, 20, 30)
        )
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.coalesce(F.sum(_rev_e4()), F.lit(0))
            .cast("long")
            .alias("revenue_e4"),
        )
    )


@register(
    "q217_promo_supplier_candidates",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
               CAST(q.total_qty AS BIGINT) AS total_qty
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        JOIN (
          SELECT l.l_suppkey, SUM(l.l_quantity) AS total_qty
          FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_type = 'PROMO'
            AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate <  TIMESTAMP '1997-01-01'
          GROUP BY l.l_suppkey
          HAVING SUM(l.l_quantity) > 150
        ) q ON q.l_suppkey = s.s_suppkey
        WHERE r.r_name = 'ASIA'
        ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 shape (potential part promotion): ASIAN suppliers "
    "who shipped more than a threshold quantity of PROMO parts in "
    "1996 — the nested correlated-IN of Q20 decorrelated into a "
    "grouped HAVING subquery joined back to the supplier dim, with "
    "a region filter on the outer side. Substitution vs TPC-H: no "
    "partsupp/availqty, so the '50% of shipped quantity' "
    "availability test becomes an absolute shipped-quantity "
    "threshold over the same filtered lineitem∙part join; the "
    "plan shape (selective inner aggregate feeding a dim join) is "
    "identical. Quantities are integer-valued doubles, so the "
    "BIGINT cast of the sum is exact.",
)
def q217(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = (
        table_parallel(spark, sf, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    q = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    s = table_parallel(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = table_parallel(spark, sf, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    r = (
        table_parallel(spark, sf, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(q, q["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            "nation",
            F.col("total_qty").cast("long").alias("total_qty"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q218_waiting_suppliers",
    oracle="""
        WITH l1 AS (
          SELECT l.l_orderkey, l.l_suppkey,
                 CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                      THEN 1 ELSE 0 END AS is_late
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderstatus = 'F'
        ),
        waiting AS (
          SELECT DISTINCT a.l_orderkey, a.l_suppkey
          FROM l1 a
          WHERE a.is_late = 1
            AND EXISTS (SELECT 1 FROM l1 b
                        WHERE b.l_orderkey = a.l_orderkey
                          AND b.l_suppkey <> a.l_suppkey)
            AND NOT EXISTS (SELECT 1 FROM l1 c
                            WHERE c.l_orderkey = a.l_orderkey
                              AND c.l_suppkey <> a.l_suppkey
                              AND c.is_late = 1)
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM waiting w
        JOIN supplier s ON s.s_suppkey = w.l_suppkey
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY numwait DESC, s.s_suppkey
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): for "
    "finished orders, suppliers who were the SOLE late supplier on "
    "a multi-supplier order, counted by distinct waiting order — "
    "the double-correlated EXISTS / NOT EXISTS of Q21. The oracle "
    "keeps the literal correlated form; the Spark plan "
    "decorrelates it into ONE per-order aggregate (distinct "
    "supplier count, distinct late-supplier count, the single late "
    "suppkey via max) + a filter — one shuffle on orderkey instead "
    "of two correlated self-joins, the rewrite that matters when "
    "lineitem is the 100 TB fact. Substitution vs TPC-H: 'late' is "
    "shipped >90 days after order date (no commit/receipt dates). "
    "Independent formulations on the two sides make the hash "
    "match a real equivalence check of the decorrelation.",
)
def q218(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = (
        table_parallel(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table_parallel(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1 = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
        ).alias("is_late"),
    )
    per_order = l1.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
        F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    waiting = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    s = table_parallel(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.groupBy("late_supp")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
    )


@register(
    "q291_tpch_q6",
    oracle="""
        SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                             AS BIGINT)), 0) AS BIGINT) AS revenue_cents,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecast revenue change) — the last of the 22 TPC-H "
    "shapes, completing the suite: a pure scan-filter-aggregate with "
    "THREE pushable predicates (date range, discount band, quantity "
    "cap) and no join, the query every columnar engine uses to "
    "demonstrate predicate pushdown + vectorized aggregation. "
    "Determinism: both engines compute the identical double product "
    "from the same parquet values and apply the same half-away-from-"
    "zero ROUND per item BEFORE the integer SUM, so summation order "
    "cannot move a boundary. Plan "
    "shape: all three predicates in PushedFilters, one partial+final "
    "aggregate, zero shuffles beyond the 1-row reduce.",
)
def q291(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * F.col("l_discount") * 100
                    ).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("revenue_cents"),
            F.count("*").cast("long").alias("n_items"),
        )
    )
