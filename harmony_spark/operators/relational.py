"""Relational operator surface, Q01–Q16 + Q19–Q26 of SURVEY.md §2.11.

Each query is the declared exercise of one operator family the engine
supports (scan/filter/project, joins of every flavor, hash aggregation,
rollup, set ops, scalar/array/json functions). Implementations are
DataFrame-API-first so Catalyst gets the whole logical plan: filters and
projections sit directly on the parquet scan (pushdown + pruning), small
dimensions broadcast, aggregates get partial+final hash agg automatically.

The harmony-reference operator each query descends from is cited per
function (file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harmony_spark.io import table
from harmony_spark.registry import register


# ---------------------------------------------------------------- scans ----


@register(
    "q01_scan_filter_project",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity > 30 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    doc="Scan + filter + project (S1/P5: /root/reference/R/ui.R:91-188). "
    "Predicates reach the parquet scan as PushedFilters.",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .where((F.col("l_quantity") > 30) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "q02_stddev_sink",
    oracle="""
        SELECT ROUND(STDDEV_SAMP(c_acctbal), 6) AS sd, ROUND(AVG(c_acctbal), 6) AS mu
        FROM customer
    """,
    doc="Per-column stddev of an embedding sink (A7: /root/reference/R/RunHarmony.R:108).",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "customer").agg(
        F.round(F.stddev_samp("c_acctbal"), 6).alias("sd"),
        F.round(F.avg("c_acctbal"), 6).alias("mu"),
    )


@register(
    "q03_array_slice",
    oracle="""
        SELECT vec_id,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS d0,
               ROUND(CAST(embedding[2] AS DOUBLE), 6) AS d1
        FROM embeddings ORDER BY vec_id LIMIT 100
    """,
    doc="Array element projection = dims.use column subsetting "
    "(S5: /root/reference/R/RunHarmony.R:77-87).",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "embeddings")
    return (
        e.select(
            "vec_id",
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("d0"),
            F.round(F.element_at("embedding", 2).cast("double"), 6).alias("d1"),
        )
        .orderBy("vec_id")
        .limit(100)
    )


# ------------------------------------------------- element-wise transforms ----


@register(
    "q04_l2_norm",
    oracle="""
        SELECT vec_id, ROUND(SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS l2
        FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings) t
        GROUP BY vec_id ORDER BY vec_id LIMIT 100
    """,
    doc="L2 norm per embedding row (P1 cosine normalization: "
    "/root/reference/src/harmony.cpp:42,220). Spark side uses the "
    "aggregate() higher-order function: one narrow pass, no shuffle.",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "embeddings")
    l2 = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return e.select("vec_id", F.round(l2, 6).alias("l2")).orderBy("vec_id").limit(100)


@register(
    "q05_grouped_zscore_clip",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(GREATEST(LEAST((o_totalprice - AVG(o_totalprice) OVER w)
                     / NULLIF(STDDEV_SAMP(o_totalprice) OVER w, 0), 10), -10), 6) AS z
        FROM orders WINDOW w AS (PARTITION BY o_custkey)
        ORDER BY o_custkey, o_orderkey LIMIT 100
    """,
    doc="Per-group z-score with clipping (P2 scaleRows_dgc: "
    "/root/reference/src/utils.cpp:112-155) as a window function.",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey")
    z = (F.col("o_totalprice") - F.avg("o_totalprice").over(w)) / F.nullif(
        F.stddev_samp("o_totalprice").over(w), F.lit(0.0)
    )
    return (
        table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.greatest(F.least(z, F.lit(10.0)), F.lit(-10.0)), 6).alias("z"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


@register(
    "q06_safe_entropy",
    oracle="""
        SELECT l_returnflag, ROUND(SUM(CASE WHEN p = 0 THEN 0 ELSE p * LN(p) END), 6) AS h
        FROM (SELECT l_returnflag, l_discount AS p FROM lineitem) t
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Safe entropy x*ln(x) with 0*log0 -> 0 (P3 safe_entropy: "
    "/root/reference/src/utils.cpp:77-90).",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    p = F.col("l_discount")
    term = F.when(p == 0, F.lit(0.0)).otherwise(p * F.log(p))
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum(term), 6).alias("h"))
        .orderBy("l_returnflag")
    )


@register(
    "q07_partition_softmax",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(EXP(l_discount) / SUM(EXP(l_discount)) OVER (PARTITION BY l_orderkey), 6) AS sm
        FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    doc="Softmax within partition (P4 column softmax of R: "
    "/root/reference/src/harmony.cpp:143-146,318-321).",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("l_orderkey")
    sm = F.exp("l_discount") / F.sum(F.exp("l_discount")).over(w)
    return (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", F.round(sm, 6).alias("sm"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


# ------------------------------------------------------------ aggregates ----


@register(
    "q08_batch_counts",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_b FROM customer
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Per-batch cell counts N_b = rowSums(Phi) (A1: /root/reference/R/ui.R:216). "
    "Partial+final hash agg from Catalyst.",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_b"))
        .orderBy("c_mktsegment")
    )


@register(
    "q09_batch_priors",
    oracle="""
        SELECT c_mktsegment, ROUND(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM customer), 6) AS pr_b
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Batch priors Pr_b = N_b/N (A2: /root/reference/src/harmony.cpp:67).",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    total = c.agg(F.count("*").alias("_total"))
    return (
        c.groupBy("c_mktsegment")
        .agg(F.count("*").alias("_cnt"))
        .crossJoin(F.broadcast(total))
        .select(
            "c_mktsegment",
            F.round(F.col("_cnt") * 1.0 / F.col("_total"), 6).alias("pr_b"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q10_level_cardinality",
    oracle="SELECT COUNT(DISTINCT p_brand) AS b_brand, COUNT(DISTINCT p_type) AS b_type FROM part",
    doc="Covariate level cardinality B_vec = nlevels (A3: /root/reference/R/ui.R:219-221).",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "part").agg(
        F.countDistinct("p_brand").alias("b_brand"),
        F.countDistinct("p_type").alias("b_type"),
    )


@register(
    "q11_contingency",
    oracle="""
        SELECT n_name, o_orderpriority, COUNT(*) AS o_kb
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, o_orderpriority ORDER BY n_name, o_orderpriority
    """,
    doc="Cluster-by-batch contingency table O = R*Phi^T, hard-label analogue "
    "(A4: /root/reference/src/harmony.cpp:150,227). customer & nation broadcast.",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(F.count("*").alias("o_kb"))
        .orderBy("n_name", "o_orderpriority")
    )


@register(
    "q12_expected_counts",
    oracle="""
        SELECT a.n_name, b.o_orderpriority,
               ROUND(a.cnt * b.cnt * 1.0 / (SELECT COUNT(*) FROM orders), 6) AS e_kb
        FROM (SELECT n_name, COUNT(*) AS cnt FROM orders JOIN customer ON o_custkey=c_custkey
              JOIN nation ON c_nationkey=n_nationkey GROUP BY n_name) a
        CROSS JOIN (SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority) b
        ORDER BY a.n_name, b.o_orderpriority
    """,
    doc="Independence-expected counts E = rowSums(R)*Pr_b^T, rank-1 outer "
    "product as a cross join (A5: /root/reference/src/harmony.cpp:149,226).",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    a = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt_a"))
    )
    b = o.groupBy("o_orderpriority").agg(F.count("*").alias("cnt_b"))
    total = o.agg(F.count("*").alias("_total"))
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(total))
        .select(
            "n_name",
            "o_orderpriority",
            F.round(F.col("cnt_a") * F.col("cnt_b") * 1.0 / F.col("_total"), 6).alias("e_kb"),
        )
        .orderBy("n_name", "o_orderpriority")
    )


@register(
    "q13_grouped_weighted_sums",
    oracle="""
        SELECT l_returnflag, ROUND(SUM(l_discount), 6) AS sum_w, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Grouped weighted sums = ridge Gram matrix entries "
    "(A8: /root/reference/src/harmony.cpp:561-567).",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_discount"), 6).alias("sum_w"), F.count("*").alias("n"))
        .orderBy("l_returnflag")
    )


@register(
    "q14_grouped_weighted_vector_sums",
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(l_discount * l_extendedprice), 2) AS wz1,
               ROUND(SUM(l_discount * l_quantity), 6) AS wz2
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Grouped weighted vector sums = ridge RHS Phi*diag(R_k)*Z^T "
    "(A9: /root/reference/src/harmony.cpp:592-609); partial+final agg is "
    "Catalyst's map-side combine, the treeAggregate analogue.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum(F.col("l_discount") * F.col("l_extendedprice")), 2).alias("wz1"),
            F.round(F.sum(F.col("l_discount") * F.col("l_quantity")), 6).alias("wz2"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q15_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ROUND(SUM(l_quantity), 6) AS q
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP grouping sets (general agg surface; no analogue in reference).",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 6).alias("q"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


# ----------------------------------------------------------------- joins ----


@register(
    "q16_broadcast_join_arith",
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice - c_acctbal, 6) AS corrected
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_orderkey LIMIT 100
    """,
    doc="Broadcast equi-join + arithmetic = the correction-gather shape "
    "(M2 Z_corr -= W^T*Phi*diag(R): /root/reference/src/harmony.cpp:615). "
    "customer is the small dim -> broadcast hash join, fact side never shuffles.",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", F.round(F.col("o_totalprice") - F.col("c_acctbal"), 6).alias("corrected"))
        .orderBy("o_orderkey")
        .limit(100)
    )


@register(
    "q20_multiway_join",
    oracle="""
        SELECT r_name, n_name, COUNT(*) AS suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name
    """,
    doc="Multi-way join over the dim hierarchy; both dims broadcast.",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("suppliers"))
        .orderBy("r_name", "n_name")
    )


@register(
    "q21_left_outer_join",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey LIMIT 100
    """,
    doc="Left outer join preserving unmatched customers.",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
        .limit(100)
    )


@register(
    "q22_anti_join",
    oracle="""
        SELECT COUNT(*) AS n FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Anti join: customers with no orders (NOT EXISTS).",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(F.count("*").alias("n"))


@register(
    "q23_range_join",
    oracle="""
        SELECT p_brand, COUNT(*) AS n
        FROM part JOIN lineitem ON p_partkey = l_partkey AND l_quantity > p_size
        GROUP BY p_brand ORDER BY p_brand
    """,
    doc="Theta/range join: equi key + inequality residual. part broadcast "
    "so the inequality is evaluated as a residual filter on the hash match.",
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part")
    li = table(spark, sf, "lineitem")
    return (
        li.join(
            F.broadcast(p),
            (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"))
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------- set ops ----


@register(
    "q19_union_all",
    oracle="""
        SELECT 'mkt' AS cov, c_mktsegment AS level, COUNT(*) AS n FROM customer GROUP BY c_mktsegment
        UNION ALL
        SELECT 'nat' AS cov, CAST(c_nationkey AS VARCHAR) AS level, COUNT(*) AS n FROM customer GROUP BY c_nationkey
        ORDER BY cov, level
    """,
    doc="UNION ALL = stacked per-covariate one-hot blocks, the Phi "
    "construction shape (/root/reference/R/ui.R:210-213).",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    mkt = c.groupBy("c_mktsegment").agg(F.count("*").alias("n")).select(
        F.lit("mkt").alias("cov"), F.col("c_mktsegment").alias("level"), "n"
    )
    nat = c.groupBy("c_nationkey").agg(F.count("*").alias("n")).select(
        F.lit("nat").alias("cov"), F.col("c_nationkey").cast("string").alias("level"), "n"
    )
    return mkt.unionAll(nat).orderBy("cov", "level")


@register(
    "q24_intersect",
    oracle="""
        SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier
        ORDER BY c_nationkey
    """,
    doc="INTERSECT set op (nations having both customers and suppliers).",
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select("c_nationkey")
    s = table(spark, sf, "supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    return c.intersect(s).orderBy("c_nationkey")


# --------------------------------------------------------- scalar functions ----


@register(
    "q25_string_date_fns",
    oracle="""
        SELECT UPPER(SUBSTR(o_orderpriority, 1, 1)) AS pri,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr, COUNT(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="String + date scalar functions (substr/upper/extract-year).",
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "orders")
        .groupBy(
            F.upper(F.substring("o_orderpriority", 1, 1)).alias("pri"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("pri", "yr")
    )


@register(
    "q26_json_extract",
    oracle="""
        SELECT event_type, COUNT(json_extract_string(props, '$.k')) AS with_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="JSON extraction from events.props (map/json function surface).",
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    return (
        table_parallel(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count(F.get_json_object("props", "$.k")).alias("with_k"))
        .orderBy("event_type")
    )


@register(
    "q48_pivot_contingency",
    oracle="""
        SELECT c_mktsegment,
               CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
               CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
               CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="PIVOT: the contingency table O as a wide matrix (A4's natural "
    "presentation, /root/reference/src/harmony.cpp:150). Spark pivot() "
    "with explicit level values so no extra distinct-scan job runs.",
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    wide = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .count()
    )
    return wide.select(
        "c_mktsegment",
        F.coalesce(F.col("1-URGENT"), F.lit(0)).alias("urgent"),
        F.coalesce(F.col("2-HIGH"), F.lit(0)).alias("high"),
        F.coalesce(F.col("3-MEDIUM"), F.lit(0)).alias("medium"),
    ).orderBy("c_mktsegment")


@register(
    "q49_semi_join",
    oracle="""
        SELECT COUNT(*) AS n FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    """,
    doc="Left semi join: customers with at least one urgent order "
    "(EXISTS). Complements the q22 anti join.",
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("n")
    )


@register(
    "q50_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="CUBE grouping sets (completes the rollup/cube/grouping-sets "
    "surface next to q15).",
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "q51_sql_text_surface",
    oracle="""
        SELECT n_name, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 6) AS avg_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name HAVING COUNT(*) >= 2 ORDER BY n_name
    """,
    doc="The engine's SQL-text entry point: the same ANSI SQL runs via "
    "spark.sql over registered views (Catalyst path end to end, "
    "including HAVING).",
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 6) AS avg_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name HAVING COUNT(*) >= 2 ORDER BY n_name
        """
    )


@register(
    "q52_date_arithmetic",
    oracle="""
        SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
               COUNT(*) AS n,
               CAST(CAST(MIN(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY) AS DATE) AS VARCHAR) AS first_due,
               CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')) AS BIGINT) AS max_age_days
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    doc="Date arithmetic surface: extract-month bucketing, date + "
    "interval, datediff against an anchor. first_due is rendered as an "
    "ISO string on both sides: a raw DATE column round-trips differently "
    "through pandas (Spark -> object datetime.date, DuckDB -> "
    "datetime64 Timestamp with a time component), which str-hash "
    "canonicalizers see as different values.",
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.groupBy(F.month("o_orderdate").cast("int").alias("mo"))
        .agg(
            F.count("*").alias("n"),
            F.date_format(F.min(F.date_add(F.to_date("o_orderdate"), 30)), "yyyy-MM-dd").alias(
                "first_due"
            ),
            F.max(F.datediff(F.lit("1998-01-01").cast("date"), F.to_date("o_orderdate")))
            .cast("long")
            .alias("max_age_days"),
        )
        .orderBy("mo")
    )


@register(
    "q53_string_fns",
    oracle="""
        SELECT UPPER(TRIM(r_name)) AS nm,
               CAST(LENGTH(r_name) AS INT) AS len,
               REPLACE(LOWER(r_name), 'a', '@') AS repl,
               LPAD(CAST(r_regionkey AS VARCHAR), 3, '0') AS padded,
               CONCAT_WS('-', r_name, CAST(r_regionkey AS VARCHAR)) AS joined
        FROM region ORDER BY nm
    """,
    doc="String scalar-function surface: trim/upper/length/replace/"
    "lpad/concat_ws.",
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    r = table(spark, sf, "region")
    return r.select(
        F.upper(F.trim("r_name")).alias("nm"),
        F.length("r_name").cast("int").alias("len"),
        F.replace(F.lower("r_name"), F.lit("a"), F.lit("@")).alias("repl"),
        F.lpad(F.col("r_regionkey").cast("string"), 3, "0").alias("padded"),
        F.concat_ws("-", "r_name", F.col("r_regionkey").cast("string")).alias("joined"),
    ).orderBy("nm")


@register(
    "q54_null_semantics",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS zero_disc,
               ROUND(SUM(COALESCE(NULLIF(l_discount, 0.0), 0.01)), 6) AS disc_floor,
               CAST(SUM(CASE WHEN l_returnflag IS NOT DISTINCT FROM 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nullsafe_r
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    doc="NULL-handling semantics: nullif/coalesce and null-safe "
    "equality (Spark <=> / IS NOT DISTINCT FROM).",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    nz = F.nullif("l_discount", F.lit(0.0))
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(nz.isNull(), 1).otherwise(0)).cast("long").alias("zero_disc"),
            F.round(F.sum(F.coalesce(nz, F.lit(0.01))), 6).alias("disc_floor"),
            F.sum(F.when(F.col("l_returnflag").eqNullSafe("R"), 1).otherwise(0))
            .cast("long")
            .alias("nullsafe_r"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q55_filtered_aggregates",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               ROUND(AVG(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 6) AS avg_f
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Filtered aggregates (FILTER clause / conditional aggregation).",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_big"),
            F.round(
                F.avg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 6
            ).alias("avg_f"),
        )
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------ compound TPC-H shapes ----


@register(
    "q56_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               COUNT(*) AS n
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-12-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-heavy pricing summary — pushdown filter, "
    "wide partial+final aggregate, arithmetic in the agg expressions.",
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1997-12-01").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
            F.round(F.sum(disc), 2).alias("sum_disc"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q57_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING' AND l_shipdate > TIMESTAMP '1996-06-30'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> broadcast join chain "
    "into the fact -> top-k by aggregated revenue.",
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit("1996-06-30").cast("timestamp")
    )
    # orders is fact-sized: leave the lineitem-orders join strategy to
    # Catalyst/AQE (sort-merge at 100 TB, broadcast at test SF); the
    # filtered customer dim is explicitly broadcast.
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q58_local_supplier_volume",
    oracle="""
        SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-way join with a cross-dimension equality "
    "(customer and supplier in the same nation) under a region filter.",
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").where(F.col("r_name") == "ASIA")
    # lineitem/orders/customer/supplier all scale with the data — their
    # join strategy is Catalyst/AQE's call; only nation/region (true
    # constant-size dims) are forced broadcast.
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q62_percentiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity), 6) AS med_qty,
               ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Exact interpolated percentiles (median / p90) per group — the "
    "sort-based aggregate surface.",
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("med_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q63_statistical_aggs",
    oracle="""
        SELECT l_linestatus,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS qty_disc_cov,
               ROUND(STDDEV_POP(l_tax), 6) AS tax_sd
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    doc="Statistical aggregates: Pearson correlation, sample covariance, "
    "population stddev.",
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_cov"),
            F.round(F.stddev_pop("l_tax"), 6).alias("tax_sd"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q64_json_typed",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Typed JSON parsing: from_json with an explicit schema (vs the "
    "path extraction of q26) — struct field access, aggregated.",
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    k = F.from_json("props", "k INT")["k"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("long").alias("k_sum"),
            F.max(k).cast("int").alias("k_max"),
        )
        .orderBy("event_type")
    )


# ------------------------------------- compound TPC-H shapes, continued ----


@register(
    "q79_order_priority_semi",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: semi join with a correlated non-equi residual "
    "(late shipments — l_shipdate > o_orderdate + 60d). The equi key "
    "carries the shuffle; the date inequality is a post-join residual, "
    "so no theta-join blowup at 100 TB.",
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q80_returned_items",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer — fact-fact "
    "join under pushdown filters, constant dim broadcast, top-k on the "
    "aggregate.",
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q81_large_volume_customer",
    oracle="""
        SELECT c_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
               ROUND(t.sum_qty, 6) AS sum_qty
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(l_quantity) > 250) t ON o_orderkey = t.l_orderkey
        ORDER BY price DESC, o_orderkey LIMIT 20
    """,
    doc="TPC-H Q18 shape: HAVING-filtered aggregate subquery joined back "
    "to the facts. The inner groupBy collapses lineitem to one row per "
    "order BEFORE the join, so the join input is already reduced — the "
    "aggregate acts as the filter.",
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    big = (
        table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .where(F.col("sum_qty_raw") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.round("sum_qty_raw", 6).alias("sum_qty"),
        )
        .orderBy(F.col("price").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q82_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, yr,
               CAST(SUM(volume_e4) AS BIGINT) AS revenue_e4
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
                     CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT) AS volume_e4
              FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE (n1.n_nationkey < 13 AND n2.n_nationkey >= 13)
                 OR (n1.n_nationkey >= 13 AND n2.n_nationkey < 13)) t
        GROUP BY supp_nation, cust_nation, yr
        ORDER BY supp_nation, cust_nation, yr
    """,
    doc="TPC-H Q7 shape: bidirectional nation-group volume by ship year — "
    "two roles of the same dim table (self-aliased nation), a symmetric "
    "OR predicate, and year bucketing. Both nation aliases broadcast; "
    "the OR filter prunes before the aggregate. (Groups of nations "
    "rather than the classic single pair so every test SF has rows; "
    "revenue summed in exact integer 1e-4 currency units — the repo's "
    "standard trick for cross-engine float-sum hashing.)",
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    s = table(spark, sf, "supplier")
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("n1_key") < 13) & (F.col("n2_key") >= 13) | (F.col("n1_key") >= 13) & (
        F.col("n2_key") < 13
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("yr"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("revenue_e4")
        )
        .orderBy("supp_nation", "cust_nation", "yr")
    )


@register(
    "q125_grouped_regression",
    oracle="""
        SELECT n_name,
               CAST(regr_count(l.l_extendedprice, l.l_quantity) AS BIGINT) AS n,
               ROUND(regr_slope(l.l_extendedprice, l.l_quantity), 6) AS slope,
               ROUND(regr_intercept(l.l_extendedprice, l.l_quantity), 6) AS intercept,
               ROUND(regr_r2(l.l_extendedprice, l.l_quantity), 6) AS r2
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    doc="Grouped ordinary-least-squares (price vs quantity per "
    "customer nation): the SQL-standard regr_slope / regr_intercept / "
    "regr_r2 aggregates - in-database ML's workhorse, computed as "
    "five streaming moments per group (count, means, co/variances), "
    "so the whole regression is ONE map-side-combinable hash "
    "aggregate after the dim joins broadcast. Both engines implement "
    "the identical SQL:2003 definitions, which is the parity the "
    "oracle checks.",
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.regr_count(y, x).cast("long").alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
        .orderBy("n_name")
    )


@register(
    "q126_table_stats",
    oracle="""
        -- averages via exact integer-cents sums: AVG(double) rounds
        -- differently across engines when the fp sum lands on a
        -- half-boundary (l_discount at sf0.01 did exactly that)
        SELECT 'l_quantity' AS col,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS ndv,
               CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS n_nulls,
               ROUND(MIN(l_quantity), 6) AS min_v,
               ROUND(MAX(l_quantity), 6) AS max_v,
               ROUND(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT))
                     / (100.0 * COUNT(l_quantity)), 6) AS avg_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT),
               CAST(COUNT(*) - COUNT(l_extendedprice) AS BIGINT),
               ROUND(MIN(l_extendedprice), 6), ROUND(MAX(l_extendedprice), 6),
               ROUND(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                     / (100.0 * COUNT(l_extendedprice)), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount',
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT l_discount) AS BIGINT),
               CAST(COUNT(*) - COUNT(l_discount) AS BIGINT),
               ROUND(MIN(l_discount), 6), ROUND(MAX(l_discount), 6),
               ROUND(SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT))
                     / (100.0 * COUNT(l_discount)), 6)
        FROM lineitem
        ORDER BY col
    """,
    doc="ANALYZE-style column statistics collection (count, exact NDV, "
    "null count, min/max/avg per column) - what a cost-based optimizer "
    "ingests and what data-profiling runs first on a new table. One "
    "pass per column family; count/min/max/avg combine map-side, the "
    "NDVs are the only real shuffles (keyed on the value), and at "
    "100 TB they swap to approx_count_distinct (HLL, also map-side-"
    "combinable) - the exact form here is what makes the oracle "
    "hashable.",
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    li = table(spark, sf, "lineitem")

    def stats(col: str) -> DataFrame:
        c = F.col(col)
        cents = F.round(c * 100, 0).cast("long")
        return li.agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct(c).cast("long").alias("ndv"),
            (F.count("*") - F.count(c)).cast("long").alias("n_nulls"),
            F.round(F.min(c), 6).alias("min_v"),
            F.round(F.max(c), 6).alias("max_v"),
            F.round(F.sum(cents) / (100.0 * F.count(c)), 6).alias("avg_v"),
        ).select(F.lit(col).alias("col"), "n", "ndv", "n_nulls", "min_v", "max_v", "avg_v")

    return (
        stats("l_quantity")
        .unionByName(stats("l_extendedprice"))
        .unionByName(stats("l_discount"))
        .orderBy("col")
    )


@register(
    "q138_variant_shred",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                 AS k_sum,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6)
                 AS k_avg
        FROM events
        GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT ingestion: props parses ONCE into the binary "
    "VARIANT encoding (parse_json) and fields come out typed via "
    "variant_get - the modern semi-structured path, replacing "
    "per-query string re-parsing (q26/q64's get_json_object) with a "
    "parse-at-ingest + shredded-access model. At 100 TB the VARIANT "
    "column persists to parquet (round-trip pinned by an engine "
    "test), so the JSON text is parsed exactly once in the table's "
    "lifetime instead of once per query per row. Oracle: DuckDB "
    "json_extract over the raw strings.",
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    v = table_parallel(spark, sf, "events").select(
        "event_type", F.parse_json("props").alias("pv")
    )
    k = F.variant_get("pv", "$.k", "int")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.round(F.avg("k"), 6).alias("k_avg"),
        )
        .orderBy("event_type")
    )


@register(
    "q143_custom_udaf_mad",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(mad(value), 6) AS value_mad
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Custom UDAF surface (R17, driver-checkable): median absolute "
    "deviation per group - a robust dispersion statistic Spark has no "
    "built-in for - implemented as an Arrow GROUPED_AGG pandas_udf "
    "(one vectorized numpy call per group, Arrow-batched transfer; "
    "the UDAF slot in the aggregate plan, not a collect-and-loop). "
    "Unlike algebraic aggregates a median-of-deviations cannot "
    "partially aggregate, so the group's values DO flow to its "
    "reducer - the honest cost of any exact rank statistic, same as "
    "Spark's own percentile(); use approx sketches (q129 rationale) "
    "when groups outgrow executors. Oracle: DuckDB's native mad().",
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from harmony_spark.io import table_parallel

    # explicit GROUPED_AGG: the type-hint route cannot see pd/np here
    # (module uses deferred annotations and imports them lazily)
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def mad(v):
        x = v.to_numpy()
        return float(np.median(np.abs(x - np.median(x))))

    # Spark forbids mixing a GROUPED_AGG pandas UDF with JVM aggregates
    # in one Aggregate node (INVALID_PANDAS_UDF_PLACEMENT), so the count
    # is its own tiny agg joined back on the 5-row group key.
    ev = table_parallel(spark, sf, "events")
    m = ev.groupBy("event_type").agg(F.round(mad("value"), 6).alias("value_mad"))
    n = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    return (
        n.join(F.broadcast(m), "event_type")
        .select("event_type", "n", "value_mad")
        .orderBy("event_type")
    )


@register(
    "q144_welch_ttest",
    oracle="""
        WITH g AS (
          SELECT CAST(ts AS DATE) AS day,
                 AVG(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
                 VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
                 COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n1,
                 AVG(CASE WHEN event_type = 'view' THEN value END) AS m2,
                 VAR_SAMP(CASE WHEN event_type = 'view' THEN value END) AS v2,
                 COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n2
          FROM events GROUP BY day
        )
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(n1 AS BIGINT) AS n_purchase,
               CAST(n2 AS BIGINT) AS n_view,
               ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
               ROUND(POW(v1 / n1 + v2 / n2, 2)
                     / (POW(v1 / n1, 2) / (n1 - 1) + POW(v2 / n2, 2) / (n2 - 1)),
                     6) AS dof
        FROM g WHERE n1 >= 2 AND n2 >= 2 ORDER BY day
    """,
    doc="Distributed hypothesis testing: per-day Welch's t-statistic "
    "(unequal-variance two-sample t) comparing purchase vs view value "
    "distributions, with the Welch-Satterthwaite degrees of freedom - "
    "the A/B-test primitive every experimentation platform runs at "
    "warehouse scale. The whole test is ONE conditional hash "
    "aggregate (six streaming moments per group, all map-side "
    "combinable); no per-variant re-scan, no shuffle beyond the "
    "day-keyed aggregate - the same plan shape at 100 TB.",
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    is_p = F.col("event_type") == "purchase"
    is_v = F.col("event_type") == "view"
    g = (
        table_parallel(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.avg(F.when(is_p, F.col("value"))).alias("m1"),
            F.var_samp(F.when(is_p, F.col("value"))).alias("v1"),
            F.count(F.when(is_p, F.lit(1))).alias("n1"),
            F.avg(F.when(is_v, F.col("value"))).alias("m2"),
            F.var_samp(F.when(is_v, F.col("value"))).alias("v2"),
            F.count(F.when(is_v, F.lit(1))).alias("n2"),
        )
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = (se2 ** 2) / (
        (F.col("v1") / F.col("n1")) ** 2 / (F.col("n1") - 1)
        + (F.col("v2") / F.col("n2")) ** 2 / (F.col("n2") - 1)
    )
    return (
        g.where((F.col("n1") >= 2) & (F.col("n2") >= 2))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n1").cast("long").alias("n_purchase"),
            F.col("n2").cast("long").alias("n_view"),
            F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
            F.round(dof, 6).alias("dof"),
        )
        .orderBy("day")
    )


@register(
    "q158_sole_latest_supplier",
    oracle="""
        WITH s AS (
          SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS sd
          FROM lineitem GROUP BY l_orderkey, l_suppkey
        )
        SELECT l_suppkey AS suppkey,
               CAST(COUNT(*) AS BIGINT) AS numwait
        FROM s
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = s.l_orderkey
                        AND l2.l_suppkey <> s.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = s.l_orderkey
                            AND l3.l_suppkey <> s.l_suppkey
                            AND l3.l_shipdate >= s.sd)
        GROUP BY suppkey ORDER BY numwait DESC, suppkey LIMIT 20
    """,
    doc="TPC-H Q21's double-correlated subquery shape (EXISTS + NOT "
    "EXISTS against the same fact with opposite residuals), expressed "
    "on the available columns: suppliers who were the SOLE latest "
    "shipper on multi-supplier orders - the blame-assignment query. "
    "The planner must turn the EXISTS into a left-semi and the NOT "
    "EXISTS into a left-anti join, BOTH equi-keyed on the order with "
    "their supplier/date predicates as join residuals - three passes "
    "over lineitem keyed the same way, so at 100 TB the three legs "
    "co-partition on l_orderkey and AQE reuses one exchange layout; "
    "none of the correlation becomes a per-row subquery loop.",
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    s = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("sd"))
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    multi = s.join(
        l2,
        (F.col("o2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
        "left_semi",
    )
    sole = multi.join(
        l3,
        (F.col("o3") == F.col("l_orderkey"))
        & (F.col("s3") != F.col("l_suppkey"))
        & (F.col("d3") >= F.col("sd")),
        "left_anti",
    )
    return (
        sole.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "suppkey")
        .limit(20)
    )


_BASKET_MIN_SUPPORT = 5


@register(
    "q159_basket_lift",
    oracle=f"""
        WITH b AS (
          SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        ),
        n AS (SELECT COUNT(DISTINCT okey) AS total FROM b),
        singles AS (SELECT brand, COUNT(*) AS n_a FROM b GROUP BY brand),
        pairs AS (
          SELECT a.brand AS brand_a, c.brand AS brand_b, COUNT(*) AS n_ab
          FROM b a JOIN b c ON c.okey = a.okey AND a.brand < c.brand
          GROUP BY brand_a, brand_b
        )
        SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
               ROUND(CAST(n_ab AS DOUBLE) * n.total
                     / (sa.n_a * sb.n_a), 6) AS lift
        FROM pairs
        JOIN singles sa ON sa.brand = pairs.brand_a
        JOIN singles sb ON sb.brand = pairs.brand_b
        CROSS JOIN n
        WHERE n_ab >= {_BASKET_MIN_SUPPORT}
        ORDER BY lift DESC, brand_a, brand_b LIMIT 20
    """,
    doc="Market-basket affinity (association rules): brand pairs that "
    "co-occur in the same order more than independence predicts, "
    "scored by lift = P(a,b)/(P(a)P(b)) with a minimum support floor "
    "- the cross-sell / co-view signal behind 'frequently bought "
    "together'. Scale shape: the pair generation is a self-join "
    "BUCKET-LOCAL on the order key (pairs never cross orders, so "
    "fan-out is bounded by basket size squared, the same locality "
    "argument as LSH band buckets); marginals are one census each, "
    "broadcast back onto the ~K^2 pair rows. Deterministic top-20 by "
    "(rounded lift, pair).",
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = table_parallel(spark, sf, "part").select("p_partkey", "p_brand")
    b = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # basket total as a 1-row broadcast inside the one plan, not a
    # separate count() action
    total_df = b.select("okey").distinct().agg(
        F.count("*").alias("n_orders")
    )
    singles = b.groupBy("brand").agg(F.count("*").alias("n_a"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("c.okey") == F.col("a.okey"))
            & (F.col("a.brand") < F.col("c.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("c.brand").alias("brand_b")
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= _BASKET_MIN_SUPPORT)
    )
    sa = singles.select(F.col("brand").alias("brand_a"), F.col("n_a").alias("na"))
    sb = singles.select(F.col("brand").alias("brand_b"), F.col("n_a").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(total_df))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )

@register(
    "q177_small_quantity_revenue",
    oracle="""
        WITH pa AS (
          SELECT l_partkey, 0.2 * AVG(l_quantity) AS qlim
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN pa ON pa.l_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13' AND l.l_quantity < pa.qlim
    """,
    doc="TPC-H Q17 shape: revenue lost to small-quantity orders — a "
    "correlated scalar AVG per part decorrelated into a part-keyed "
    "aggregate joined back to the fact (the rewrite every optimizer "
    "must find; a naive per-row subquery re-scans lineitem per "
    "part). Plan shape: the per-part quantity-limit table is "
    "|parts|-sized and broadcast; the brand filter pushes into the "
    "part scan and prunes the join early. Quantities are "
    "integer-valued doubles, so AVG is an exact-sum division and the "
    "0.2*avg threshold compare is bit-identical across engines. "
    "Reference: the classic decorrelation benchmark shape.",
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qlim")
    )
    p = table_parallel(spark, sf, "part").where(
        F.col("p_brand") == "Brand#13"
    ).select("p_partkey")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(pa), "l_partkey")
        .where(F.col("l_quantity") < F.col("qlim"))
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


@register(
    "q178_orders_per_customer_histogram",
    oracle="""
        WITH c AS (
          SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON o_custkey = c_custkey
          GROUP BY c_custkey
        )
        SELECT CAST(n_orders AS BIGINT) AS n_orders,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM c GROUP BY n_orders
        ORDER BY n_customers DESC, n_orders DESC
    """,
    doc="TPC-H Q13 shape: the orders-per-customer distribution "
    "INCLUDING zero-order customers — the left-outer-join-then-"
    "double-aggregate pattern (COUNT(o_orderkey) counts non-NULL, so "
    "customers with no orders land in the 0 bucket instead of "
    "vanishing, the mistake an inner join silently makes). Plan "
    "shape: one customer-keyed outer join + count, then a bounded "
    "histogram aggregate over the |distinct counts| keys; both "
    "aggregates take map-side partials.",
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    c = table_parallel(spark, sf, "customer").select("c_custkey")
    o = table_parallel(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy(F.col("n_orders").cast("long").alias("n_orders"))
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@register(
    "q179_idle_high_balance",
    oracle="""
        WITH t AS (
          SELECT AVG(c_acctbal) AS thr FROM customer WHERE c_acctbal > 0.0
        ),
        cutoff AS (
          SELECT MAX(o_orderdate) - INTERVAL 180 DAY AS cut FROM orders
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer, t, cutoff
        WHERE c_acctbal > t.thr
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c_custkey
                            AND o.o_orderdate >= cutoff.cut)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: high-balance customers with no RECENT order "
    "(nothing in the trailing 180 days of the order history) — a "
    "scalar-aggregate threshold (global positive-balance average) "
    "feeding a filter, composed with an ANTI join against the "
    "date-filtered fact table, grouped per segment. Plan shape: both "
    "scalars (threshold, recency cutoff) are 1-row aggregates "
    "broadcast over their scans; the NOT EXISTS plans as a broadcast "
    "anti join keyed on custkey — no correlated re-scan per "
    "customer.",
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    cust = table_parallel(spark, sf, "customer")
    orders = table_parallel(spark, sf, "orders")
    thr = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("thr")
    )
    cutoff = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 180 DAYS")).alias("cut")
    )
    recent = (
        orders.crossJoin(F.broadcast(cutoff))
        .where(F.col("o_orderdate") >= F.col("cut"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("thr"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q180_top_revenue_supplier",
    oracle="""
        WITH rev AS (
          SELECT l_suppkey,
                 ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2)
                   AS total_rev
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
          GROUP BY l_suppkey
        ),
        ranked AS (
          SELECT l_suppkey, total_rev,
                 RANK() OVER (ORDER BY total_rev DESC) AS r
          FROM rev
        )
        SELECT s.s_suppkey, s.s_name, ranked.total_rev
        FROM ranked JOIN supplier s ON s.s_suppkey = ranked.l_suppkey
        WHERE ranked.r = 1 ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 shape: the top supplier(s) by quarterly revenue — "
    "max-over-aggregate with TIES KEPT (RANK, not LIMIT 1, so equal "
    "top revenues all surface; the revenue is rounded BEFORE ranking "
    "so the tie set is engine-stable). Plan shape: the date window "
    "pushes into the lineitem scan; revenue is one suppkey-keyed "
    "aggregate; the tie-keeping max is a 1-row scalar aggregate "
    "broadcast (no rank window) and the supplier dim broadcasts "
    "onto the winners.",
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    rev = (
        table_parallel(spark, sf, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount"))),
                2,
            ).alias("total_rev")
        )
    )
    # rank()=1 with ties == total_rev equals the global max: a 1-row
    # scalar aggregate broadcast against the supplier summary — no
    # global rank window over the |suppliers|-row table.
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    ranked = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("__mx"))
        .drop("__mx")
    )
    s = table_parallel(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        ranked.join(s, ranked["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@register(
    "q181_supplier_part_concentration",
    oracle="""
        WITH ps AS (
          SELECT l_partkey, l_suppkey, SUM(l_extendedprice) AS val
          FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        tot AS (SELECT SUM(val) AS t, COUNT(*) AS n FROM ps)
        SELECT l_partkey, l_suppkey, ROUND(val, 2) AS val
        FROM ps, tot WHERE val > 3.0 * t / n
        ORDER BY l_partkey, l_suppkey
    """,
    doc="TPC-H Q11 shape: (part, supplier) cells whose traded value "
    "exceeds a GLOBAL-AGGREGATE threshold (3x the mean cell value — "
    "scale-adaptive, unlike Q11's fixed fraction, so the census "
    "stays non-degenerate as the cell table grows) — the "
    "aggregate-vs-scalar-subquery HAVING pattern decorrelated to a "
    "1-row total broadcast over the cell table. Plan shape: one "
    "(part, supp)-keyed aggregate builds the cell table, the global "
    "total is a second 1-row aggregate of that summary (not a "
    "second corpus scan), and the threshold filter is a broadcast "
    "nested loop over |cells| x 1 rows. The concentration census "
    "that finds single-supplier exposure in a procurement graph.",
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ps = (
        table_parallel(spark, sf, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_extendedprice").alias("val"))
        .localCheckpoint(eager=False)
    )
    tot = ps.agg(F.sum("val").alias("t"), F.count("*").alias("n"))
    return (
        ps.crossJoin(F.broadcast(tot))
        .where(F.col("val") > 3.0 * F.col("t") / F.col("n"))
        .select(
            "l_partkey", "l_suppkey", F.round("val", 2).alias("val")
        )
        .orderBy("l_partkey", "l_suppkey")
    )


def pareto_frontier_2d(points: DataFrame, x: str, y: str) -> DataFrame:
    """2-D skyline (minimize both ``x`` and ``y``): keep every row not
    dominated by another row that is <= on both axes and strictly < on
    at least one. Sort-scan formulation: collapse to one row per
    distinct x (min y at that x), take a running min over strictly
    smaller x with a ROWS frame on that distinct-x table, and join the
    thresholds back — O(n log n), no quadratic dominance join. A row
    survives iff no strictly-smaller-x row has y <= its own AND no
    equal-x row has strictly smaller y; equal-(x, y) duplicates all
    survive (the strictness clause fails both ways).

    The running min executes shard-parallel (dist_rank pattern): the
    distinct-x table is range-sharded on x, each shard takes the
    strictly-preceding running min under a PARTITIONED window, and the
    cross-shard carry-in (min of all previous shards' mins) is a
    <=65-row driver-side prefix scan broadcast back — never a
    single-task global window."""
    from harmony_spark.operators.dist_rank import with_range_shard

    lvl = (
        points.groupBy(x)
        .agg(F.min(y).alias("_min_y_at_x"))
        .localCheckpoint(eager=False)
    )
    sh = with_range_shard(lvl, x)
    mins = {
        r["__shard"]: r["m"]
        for r in sh.groupBy("__shard")
        .agg(F.min("_min_y_at_x").alias("m"))
        .collect()
    }
    carry_rows, cur = [], None
    for s in range(0, 65):
        carry_rows.append((s, cur))
        if s in mins:
            cur = mins[s] if cur is None else min(cur, mins[s])
    ytype = dict(lvl.dtypes)["_min_y_at_x"]
    carry = points.sparkSession.createDataFrame(
        carry_rows, f"__shard int, __carry {ytype}"
    )
    w_prev = (
        Window.partitionBy("__shard")
        .orderBy(x)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    thr = (
        sh.join(F.broadcast(carry), "__shard")
        .withColumn(
            "_min_y_smaller_x",
            F.least(F.min("_min_y_at_x").over(w_prev), F.col("__carry")),
        )
        .drop("__shard", "__carry")
    )
    return (
        points.join(thr, x)
        .where(
            (
                F.col("_min_y_smaller_x").isNull()
                | (F.col(y) < F.col("_min_y_smaller_x"))
            )
            & (F.col(y) == F.col("_min_y_at_x"))
        )
        .drop("_min_y_at_x", "_min_y_smaller_x")
    )



@register(
    "q188_pareto_frontier",
    oracle="""
        SELECT p_partkey, p_brand, p_retailprice,
               CAST(p_size AS BIGINT) AS p_size
        FROM part a
        WHERE NOT EXISTS (
          SELECT 1 FROM part b
          WHERE b.p_retailprice <= a.p_retailprice
            AND b.p_size <= a.p_size
            AND (b.p_retailprice < a.p_retailprice
                 OR b.p_size < a.p_size)
        )
        ORDER BY p_partkey
    """,
    doc="2-D Pareto frontier (skyline): parts minimizing (price, size) "
    "that no other part dominates on both axes — the multi-objective "
    "shortlist shape (cheapest-for-its-size catalog, efficient "
    "frontier screens). The oracle is the quadratic NOT EXISTS "
    "dominance anti-join; the Spark plan is the SORT-SCAN skyline: "
    "collapse to one row per DISTINCT price (min size at that "
    "price), take a running min over strictly-cheaper prices with a "
    "rows frame on that distinct-price table, and join the two "
    "thresholds back — O(n log n) total, the formulation that "
    "survives when the quadratic check cannot. (A rangeBetween(-1) "
    "frame would NOT mean 'strictly cheaper': range offsets are "
    "value-based, price minus 1.0.) Equal-(price, size) duplicates "
    "are all kept — none dominates, the strictness clause fails.",
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    p = table_parallel(spark, sf, "part").select(
        "p_partkey", "p_brand", "p_retailprice", "p_size"
    )
    out = pareto_frontier_2d(p, x="p_retailprice", y="p_size")
    return out.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.col("p_size").cast("long").alias("p_size"),
    ).orderBy("p_partkey")


@register(
    "q189_ordered_string_agg",
    oracle="""
        WITH top5 AS (
          SELECT n.n_name AS nation, c.c_name, c.c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n.n_name
                                    ORDER BY c.c_acctbal DESC, c.c_custkey)
                   AS r
          FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        )
        SELECT nation,
               CAST(COUNT(*) AS BIGINT) AS n_top,
               string_agg(c_name, ',' ORDER BY r) AS top_customers
        FROM top5 WHERE r <= 5
        GROUP BY nation ORDER BY nation
    """,
    doc="ORDERED string aggregation: each nation's top-5 customers by "
    "balance concatenated IN RANK ORDER — the report-formatting "
    "aggregate (DuckDB: string_agg ORDER BY; Spark has no ordered "
    "agg, so the plan collects (rank, name) structs, sorts the "
    "in-group array with array_sort, and projects the names — the "
    "general recipe for ANY order-sensitive aggregate on an engine "
    "with unordered aggregation). Plan shape: dim broadcast, one "
    "nation-keyed rank window, and a bounded 5-element array per "
    "group — never an unbounded collect.",
)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    c = table_parallel(spark, sf, "customer")
    n = table_parallel(spark, sf, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("nation").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    top5 = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(F.col("n_name").alias("nation"), "c_name", "c_acctbal", "c_custkey")
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 5)
    )
    return (
        top5.groupBy("nation")
        .agg(
            F.count("*").cast("long").alias("n_top"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("r", "c_name"))
                    ),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top_customers"),
        )
        .orderBy("nation")
    )


@register(
    "q190_chisq_independence",
    oracle="""
        WITH o AS (
          SELECT event_type, dayofweek(CAST(ts AS DATE)) AS dow,
                 COUNT(*) AS obs
          FROM events GROUP BY event_type, dow
        ),
        m AS (
          SELECT event_type, dow, obs,
                 SUM(obs) OVER (PARTITION BY event_type) AS row_tot,
                 SUM(obs) OVER (PARTITION BY dow) AS col_tot,
                 SUM(obs) OVER () AS n
          FROM o
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(MAX(n) AS BIGINT) AS n_events,
               ROUND(SUM(POW(obs - CAST(row_tot AS DOUBLE) * col_tot / n, 2)
                         / (CAST(row_tot AS DOUBLE) * col_tot / n)), 6)
                 AS chi_sq
        FROM m
    """,
    doc="Chi-square independence test of event type vs day-of-week: "
    "the contingency-table statistic sum((O-E)^2/E) with expected "
    "counts E = row*col/N — the seasonality detector behind 'is "
    "error rate independent of weekday'. All counts are exact "
    "integers; E is one double expression per cell, and the "
    "statistic sums |types|x7 terms, so the round-6 output is "
    "engine-stable. Plan shape: events collapse to the bounded "
    "contingency table in ONE aggregate; the marginals are window "
    "sums over that tiny table (the same decomposition as q11's "
    "contingency + q12's expected counts, fused to the test "
    "statistic).",
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = (
        table_parallel(spark, sf, "events")
        .groupBy(
            "event_type", F.dayofweek(F.to_date("ts")).alias("dow")
        )
        .agg(F.count("*").alias("obs"))
    )
    m = o.select(
        "obs",
        F.sum("obs").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.max("n").cast("long").alias("n_events"),
        F.round(F.sum(F.pow(F.col("obs") - e, 2) / e), 6).alias("chi_sq"),
    )


@register(
    "q196_benford_digits",
    oracle="""
        WITH digits AS (
          SELECT CAST(FLOOR(o_totalprice
                   / POW(10, FLOOR(LOG10(o_totalprice)))) AS BIGINT) AS d
          FROM orders WHERE o_totalprice >= 1.0
        ),
        census AS (
          SELECT d, COUNT(*) AS n, SUM(COUNT(*)) OVER () AS total
          FROM digits GROUP BY d
        )
        SELECT d AS leading_digit,
               CAST(n AS BIGINT) AS n_orders,
               ROUND(LOG10(1.0 + 1.0 / d), 6) AS benford_p,
               ROUND(POW(n - total * LOG10(1.0 + 1.0 / d), 2)
                     / (total * LOG10(1.0 + 1.0 / d)), 6) AS chisq_term
        FROM census ORDER BY leading_digit
    """,
    doc="Benford's-law leading-digit census over order values: "
    "observed first-digit counts vs the log10(1+1/d) expectation, "
    "with the per-digit chi-square contribution — the forensic "
    "screen for fabricated or capped monetary data (TPC-H's uniform "
    "price generator fails Benford spectacularly, which is exactly "
    "what the census should reveal; organic revenue passes). The "
    "leading digit is extracted arithmetically (floor(x/10^floor("
    "log10 x))), never via string formatting, so both engines agree "
    "bit-for-bit away from exact powers of ten. Plan shape: one "
    "projection + a 9-key aggregate.",
)
def q196(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    digits = (
        table_parallel(spark, sf, "orders")
        .where(F.col("o_totalprice") >= 1.0)
        .select(
            F.floor(
                F.col("o_totalprice")
                / F.pow(10.0, F.floor(F.log10("o_totalprice")))
            )
            .cast("long")
            .alias("d")
        )
    )
    census = digits.groupBy("d").agg(F.count("*").alias("n"))
    census = census.withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    p = F.log10(1.0 + 1.0 / F.col("d"))
    return census.select(
        F.col("d").alias("leading_digit"),
        F.col("n").cast("long").alias("n_orders"),
        F.round(p, 6).alias("benford_p"),
        F.round(
            F.pow(F.col("n") - F.col("total") * p, 2) / (F.col("total") * p), 6
        ).alias("chisq_term"),
    ).orderBy("leading_digit")


@register(
    "q203_referential_audit",
    oracle="""
        SELECT 'orders_without_customer' AS relationship,
               CAST((SELECT COUNT(*) FROM orders o
                     WHERE NOT EXISTS (SELECT 1 FROM customer c
                                       WHERE c.c_custkey = o.o_custkey))
                    AS BIGINT) AS n_orphans,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_total
        UNION ALL
        SELECT 'lineitems_without_order',
               CAST((SELECT COUNT(*) FROM lineitem l
                     WHERE NOT EXISTS (SELECT 1 FROM orders o
                                       WHERE o.o_orderkey = l.l_orderkey))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
        UNION ALL
        SELECT 'customers_without_nation',
               CAST((SELECT COUNT(*) FROM customer c
                     WHERE NOT EXISTS (SELECT 1 FROM nation n
                                       WHERE n.n_nationkey = c.c_nationkey))
                    AS BIGINT),
               CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
        ORDER BY relationship
    """,
    doc="Referential-integrity audit: orphan counts for the three "
    "declared foreign-key relationships (orders->customer, "
    "lineitem->orders, customer->nation) — the data-quality gate a "
    "warehouse runs after every ingest, since parquet enforces no "
    "constraints (zero orphans here is itself the assertion worth "
    "recording; nonzero after an incremental load means the load "
    "order broke). Plan shape: each check is one LEFT ANTI join "
    "keyed on the FK — the dimension sides broadcast, the fact "
    "side streams, and the three audits union into a single "
    "3-row report.",
)
def q203(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders")
    li = table_parallel(spark, sf, "lineitem")
    c = table_parallel(spark, sf, "customer")
    n = table_parallel(spark, sf, "nation")

    def audit(name, fact, dim, fk, pk):
        orphans = fact.join(
            F.broadcast(dim.select(F.col(pk).alias(fk))), fk, "left_anti"
        ).agg(F.count("*").cast("long").alias("n_orphans"))
        total = fact.agg(F.count("*").cast("long").alias("n_total"))
        return (
            orphans.crossJoin(total)
            .select(
                F.lit(name).alias("relationship"), "n_orphans", "n_total"
            )
        )

    return (
        audit("orders_without_customer", o, c, "o_custkey", "c_custkey")
        .unionByName(
            audit("lineitems_without_order", li, o, "l_orderkey", "o_orderkey")
        )
        .unionByName(
            audit("customers_without_nation", c, n, "c_nationkey", "n_nationkey")
        )
        .orderBy("relationship")
    )


@register(
    "q206_argmax_aggregate",
    oracle="""
        SELECT n.n_name AS nation,
               arg_max(c.c_name, CAST(ROUND(c.c_acctbal * 100) AS BIGINT)
                         * 10000000 + c.c_custkey) AS top_customer,
               ROUND(MAX(c.c_acctbal), 2) AS top_balance,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name ORDER BY nation
    """,
    doc="Argmax AGGREGATE: each nation's richest customer via "
    "max_by/arg_max — the single-aggregate top-1 path that replaces "
    "a rank window + filter when only the winner is needed (one "
    "map-side-combinable aggregate, no per-group sort, no window "
    "state: the plan difference that matters when groups are "
    "billions). Determinism: the comparison key packs (integer "
    "cents, custkey) into one BIGINT, so exact balance ties cannot "
    "be broken differently by different engines. Read against "
    "q158/q180, the window formulations of the same question.",
)
def q206(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    c = table_parallel(spark, sf, "customer")
    n = table_parallel(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max_by(
                "c_name",
                F.round(F.col("c_acctbal") * 100).cast("long") * 10_000_000
                + F.col("c_custkey"),
            ).alias("top_customer"),
            F.round(F.max("c_acctbal"), 2).alias("top_balance"),
            F.count("*").cast("long").alias("n_customers"),
        )
        .orderBy("nation")
    )


@register(
    "q207_min_cost_supplier",
    oracle="""
        WITH costs AS (
          SELECT l.l_partkey, l.l_suppkey,
                 ROUND(AVG(l.l_extendedprice / l.l_quantity), 4) AS unit_cost
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          WHERE r.r_name = 'EUROPE'
          GROUP BY l.l_partkey, l.l_suppkey
        ),
        best AS (
          SELECT l_partkey, MIN(unit_cost) AS min_cost
          FROM costs GROUP BY l_partkey
        )
        SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
               c.unit_cost
        FROM costs c
        JOIN best b ON b.l_partkey = c.l_partkey
                   AND c.unit_cost = b.min_cost
        JOIN part p ON p.p_partkey = c.l_partkey
        WHERE p.p_size < 10
        ORDER BY p_partkey, s_suppkey
    """,
    doc="TPC-H Q2 shape: for each small part, the cheapest EUROPEAN "
    "supplier — a correlated MIN subquery over a region-filtered "
    "4-table join, decorrelated into a per-part minimum joined back "
    "on equality (ties all kept, deterministic because the unit cost "
    "is ROUNDED before the min/equality — raw double averages would "
    "make the tie set engine-dependent). Plan shape: the region "
    "filter reaches the supplier side through two broadcast dim "
    "joins BEFORE the per-(part, supplier) aggregate; the min table "
    "and the part filter are |parts|-sized and broadcast onto the "
    "join-back.",
)
def q207(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    s = table_parallel(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = table_parallel(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    r = table_parallel(spark, sf, "region").where(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    costs = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4
            ).alias("unit_cost")
        )
    )
    best = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    p = table_parallel(spark, sf, "part").where(F.col("p_size") < 10).select(
        "p_partkey"
    )
    return (
        costs.join(F.broadcast(best), "l_partkey")
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), costs["l_partkey"] == p["p_partkey"])
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("s_suppkey"),
            "unit_cost",
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q208_multiset_ops",
    oracle="""
        WITH r AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
        a AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
        ea AS (SELECT l_partkey FROM r EXCEPT ALL SELECT l_partkey FROM a),
        ia AS (SELECT l_partkey FROM r INTERSECT ALL SELECT l_partkey FROM a),
        ed AS (SELECT l_partkey FROM r EXCEPT SELECT l_partkey FROM a)
        SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(l_partkey), 0) AS BIGINT) AS key_checksum
        FROM ea
        UNION ALL
        SELECT 'intersect_all', CAST(COUNT(*) AS BIGINT),
               CAST(COALESCE(SUM(l_partkey), 0) AS BIGINT) FROM ia
        UNION ALL
        SELECT 'except_distinct', CAST(COUNT(*) AS BIGINT),
               CAST(COALESCE(SUM(l_partkey), 0) AS BIGINT) FROM ed
        ORDER BY op
    """,
    doc="MULTISET set operations: EXCEPT ALL / INTERSECT ALL preserve "
    "per-key multiplicities (bag semantics: a key appearing 5 times "
    "in R and 2 in A survives EXCEPT ALL 3 times), against the "
    "distinct EXCEPT for contrast — the SQL surface q19/q24's "
    "set-semantics operators do not cover, and the one that answers "
    "'how many ROWS, not keys, differ between two loads'. Plan "
    "shape: Spark plans multiset ops as a count-per-key aggregate + "
    "generate (replicate min/difference counts), never a row-by-row "
    "anti join; checksums pin the exact multiset, not just sizes.",
)
def q208(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    r = li.where(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.where(F.col("l_returnflag") == "A").select("l_partkey")

    def census(name, df):
        return df.agg(
            F.lit(name).alias("op"),
            F.count("*").cast("long").alias("n_rows"),
            F.coalesce(F.sum("l_partkey"), F.lit(0))
            .cast("long")
            .alias("key_checksum"),
        )

    return (
        census("except_all", r.exceptAll(a))
        .unionByName(census("intersect_all", r.intersectAll(a)))
        .unionByName(census("except_distinct", r.subtract(a)))
        .orderBy("op")
    )


@register(
    "q244_period_movers",
    oracle="""
        WITH a AS (
          SELECT p.p_brand AS brand,
                 SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)) AS rev
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
            AND l.l_shipdate <  TIMESTAMP '1998-01-01'
          GROUP BY brand
        ),
        b AS (
          SELECT p.p_brand AS brand,
                 SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)) AS rev
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
            AND l.l_shipdate <  TIMESTAMP '1999-01-01'
          GROUP BY brand
        )
        SELECT COALESCE(a.brand, b.brand) AS brand,
               CAST(COALESCE(a.rev, 0) AS BIGINT) AS rev_1997_e4,
               CAST(COALESCE(b.rev, 0) AS BIGINT) AS rev_1998_e4,
               CAST(COALESCE(b.rev, 0) - COALESCE(a.rev, 0) AS BIGINT)
                 AS delta_e4,
               CASE WHEN a.brand IS NULL THEN 'new'
                    WHEN b.brand IS NULL THEN 'gone'
                    WHEN b.rev > a.rev THEN 'up' ELSE 'down' END AS status
        FROM a FULL OUTER JOIN b ON b.brand = a.brand
        ORDER BY delta_e4, brand
    """,
    doc="Period-over-period movers report: per-brand revenue for two "
    "adjacent years aligned by FULL OUTER join, with the exact "
    "integer delta and a new/gone/up/down status — the 'biggest "
    "movers' readout every BI consumer asks for after any rollup, "
    "and the query shape (two filtered aggregates of the SAME fact "
    "table full-outer-joined on the group key) that q120's "
    "snapshot diff applies to table versions, here applied to time "
    "slices. Absent periods are exact-integer 0 with an explicit "
    "status, not NULL (the no-null-numerics output rule) and not a "
    "ratio (a percent change against a 0 base is undefined — "
    "downstream consumers rank on the exact delta instead). Plan "
    "shape: the two year-sliced aggregates scan with pushed "
    "shipdate range filters; the full outer join runs on two "
    "~|brands|-row censuses.",
)
def q244(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    p = table_parallel(spark, sf, "part").select("p_partkey", "p_brand")
    rev = F.sum(
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        ).cast("long")
    )

    def year_census(lo: str, hi: str, out: str):
        return (
            li.where(
                (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
            )
            .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(F.col("p_brand").alias(out))
            .agg(rev.alias(out + "_rev"))
        )

    a = year_census("1997-01-01", "1998-01-01", "ba")
    b = year_census("1998-01-01", "1999-01-01", "bb")
    joined = a.join(b, F.col("ba") == F.col("bb"), "full_outer")
    ra = F.coalesce(F.col("ba_rev"), F.lit(0))
    rb = F.coalesce(F.col("bb_rev"), F.lit(0))
    return joined.select(
        F.coalesce(F.col("ba"), F.col("bb")).alias("brand"),
        ra.cast("long").alias("rev_1997_e4"),
        rb.cast("long").alias("rev_1998_e4"),
        (rb - ra).cast("long").alias("delta_e4"),
        F.when(F.col("ba").isNull(), "new")
        .when(F.col("bb").isNull(), "gone")
        .when(rb > ra, "up")
        .otherwise("down")
        .alias("status"),
    ).orderBy("delta_e4", "brand")


@register(
    "q245_triple_itemsets",
    oracle="""
        WITH baskets AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        triples AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
                 COUNT(*) AS support
          FROM baskets a
          JOIN baskets b ON b.l_orderkey = a.l_orderkey
                        AND b.l_partkey > a.l_partkey
          JOIN baskets c ON c.l_orderkey = a.l_orderkey
                        AND c.l_partkey > b.l_partkey
          GROUP BY p1, p2, p3
        )
        SELECT p1, p2, p3, CAST(support AS BIGINT) AS support
        FROM (
          SELECT p1, p2, p3, support,
                 ROW_NUMBER() OVER (ORDER BY support DESC, p1, p2, p3)
                   AS rn
          FROM triples) t
        WHERE rn <= 25
        ORDER BY support DESC, p1, p2, p3
    """,
    doc="Frequent 3-itemset mining: the top-25 part TRIPLES most "
    "often bought together in one order — the next association "
    "order above q159's pair lift (bundle design and 'customers "
    "also bought' need triples once pairs saturate). Candidate "
    "generation is ORDER-LOCAL: the double self-join runs inside "
    "each orderkey with p1 < p2 < p3 canonical ordering, so the "
    "work per order is C(lines, 3) — bounded by the basket size, "
    "never |parts|^3 (the q220 rule applied to joins: go "
    "combinatorial only within a key group). The DISTINCT "
    "de-dupes re-ordered parts so a part twice in one order "
    "cannot inflate support. Ranking breaks support ties on the "
    "triple itself — exact integers end to end.",
)
def q245(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    baskets = (
        table_parallel(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    c = baskets.alias("c")
    triples = (
        a.join(
            b,
            (F.col("b.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("b.l_partkey") > F.col("a.l_partkey")),
        )
        .join(
            c,
            (F.col("c.l_orderkey") == F.col("a.l_orderkey"))
            & (F.col("c.l_partkey") > F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
            F.col("c.l_partkey").alias("p3"),
        )
        .agg(F.count("*").alias("support"))
    )
    w = Window.orderBy(F.desc("support"), "p1", "p2", "p3")
    return (
        triples.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 25)
        .select("p1", "p2", "p3", F.col("support").cast("long").alias("support"))
        .orderBy(F.desc("support"), "p1", "p2", "p3")
    )


@register(
    "q265_column_profile",
    oracle="""
        WITH src AS (SELECT * FROM orders)
        SELECT 'o_orderkey' AS col,
               CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
               CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
               CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
        FROM src
        UNION ALL
        SELECT 'o_custkey',
               CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        FROM src
        UNION ALL
        SELECT 'o_orderstatus',
               CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
               MIN(o_orderstatus), MAX(o_orderstatus)
        FROM src
        UNION ALL
        SELECT 'o_totalprice_cents',
               CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
               CAST(COUNT(DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT),
               CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
               CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
        FROM src
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
               MIN(o_orderpriority), MAX(o_orderpriority)
        FROM src
        UNION ALL
        SELECT 'o_orderdate',
               CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
               CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT),
               CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR),
               CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR)
        FROM src
        ORDER BY col
    """,
    doc="One-scan column profiler over orders: per column, null count, "
    "exact distinct count, and min/max rendered as strings — the "
    "data-quality fingerprint a catalog records per snapshot and "
    "diffs between loads to catch schema/content drift (a distinct "
    "count collapsing, a max date jumping a decade) before any "
    "downstream query does. Completes the audit family next to "
    "q203's referential checks. Scale shape: the oracle's 6-branch "
    "UNION re-scans the table per column; the engine computes ALL "
    "profiles in ONE aggregate pass (Spark plans multi-distinct "
    "aggregates as a single expand + two-stage aggregation) and "
    "unpivots the 1-row result with stack() — the 100 TB version "
    "reads the table once, not once per column. Money is profiled "
    "in integer cents and dates as yyyy-MM-dd strings, so min/max "
    "render identically in both engines.",
)
def q265(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    day = F.to_date("o_orderdate")
    agg = o.agg(
        F.count("*").alias("n"),
        F.count("o_orderkey").alias("c1"),
        F.countDistinct("o_orderkey").alias("d1"),
        F.min("o_orderkey").cast("string").alias("mn1"),
        F.max("o_orderkey").cast("string").alias("mx1"),
        F.count("o_custkey").alias("c2"),
        F.countDistinct("o_custkey").alias("d2"),
        F.min("o_custkey").cast("string").alias("mn2"),
        F.max("o_custkey").cast("string").alias("mx2"),
        F.count("o_orderstatus").alias("c3"),
        F.countDistinct("o_orderstatus").alias("d3"),
        F.min("o_orderstatus").alias("mn3"),
        F.max("o_orderstatus").alias("mx3"),
        F.count("o_totalprice").alias("c4"),
        F.countDistinct(cents).alias("d4"),
        F.min(cents).cast("string").alias("mn4"),
        F.max(cents).cast("string").alias("mx4"),
        F.count("o_orderpriority").alias("c5"),
        F.countDistinct("o_orderpriority").alias("d5"),
        F.min("o_orderpriority").alias("mn5"),
        F.max("o_orderpriority").alias("mx5"),
        F.count("o_orderdate").alias("c6"),
        F.countDistinct(day).alias("d6"),
        F.date_format(F.min(day), "yyyy-MM-dd").alias("mn6"),
        F.date_format(F.max(day), "yyyy-MM-dd").alias("mx6"),
    )
    stacked = agg.select(
        F.expr(
            "stack(6,"
            " 'o_orderkey', n - c1, d1, mn1, mx1,"
            " 'o_custkey', n - c2, d2, mn2, mx2,"
            " 'o_orderstatus', n - c3, d3, mn3, mx3,"
            " 'o_totalprice_cents', n - c4, d4, mn4, mx4,"
            " 'o_orderpriority', n - c5, d5, mn5, mx5,"
            " 'o_orderdate', n - c6, d6, mn6, mx6"
            ") AS (col, n_nulls, n_distinct, min_val, max_val)"
        )
    )
    return stacked.select(
        "col",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    ).orderBy("col")
