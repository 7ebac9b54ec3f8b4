"""Window-function surface: ranking, frames, sessionization (SURVEY.md §2.7).

The reference's only windowed computation is the driver-side sliding-window
convergence check (C4: /root/reference/src/harmony.cpp:173-205, window_size=3
at src/harmony.h:61); Q18 is its relational shape. Q17 generalizes the
argmin/top-k selections of kmeans++ (/root/reference/src/utils.cpp:35,42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harmony_spark.io import table
from harmony_spark.registry import register


@register(
    "q17_topk_per_group",
    oracle="""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) t
        WHERE rn <= 3 ORDER BY o_custkey, rn LIMIT 100
    """,
    doc="Top-k per group via ranking window (kmeans++ argmin generalized: "
    "/root/reference/src/utils.cpp:35,42).",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
        .limit(100)
    )


@register(
    "q18_sliding_window_avg",
    oracle="""
        SELECT o_orderkey,
               ROUND(AVG(o_totalprice) OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS w3
        FROM orders ORDER BY o_orderkey LIMIT 100
    """,
    doc="Sliding-window(3) moving average = convergence-window shape "
    "(C4: /root/reference/src/harmony.cpp:173-205).",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    # A global-order window moves everything to one partition; since the
    # frame only looks 2 rows back and the query keeps the first 100 keys,
    # TakeOrdered the first 100 rows (no full shuffle) and window those.
    w = Window.orderBy("o_orderkey").rowsBetween(-2, 0)
    first100 = (
        table(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )
    return first100.select(
        "o_orderkey", F.round(F.avg("o_totalprice").over(w), 6).alias("w3")
    ).orderBy("o_orderkey")


@register(
    "q59_grouping_sets",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Explicit GROUPING SETS (completes rollup/cube/sets next to "
    "q15/q50); via the SQL-text path.",
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@register(
    "q60_window_analytics",
    oracle="""
        SELECT o_custkey, o_orderkey,
               COALESCE(LEAD(o_totalprice) OVER w, -1) AS next_price,
               ROUND(FIRST_VALUE(o_totalprice) OVER w, 6) AS first_price,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey LIMIT 100
    """,
    doc="Analytic window functions: lead / first_value / ntile over a "
    "per-customer time ordering. The partition-final LEAD null is kept "
    "in-play but COALESCEd to -1 (both sides): a nullable float column "
    "canonicalizes as NaN!=NULL once pandas gets hold of it.",
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.coalesce(F.lead("o_totalprice").over(w), F.lit(-1.0)).alias("next_price"),
            F.round(F.first("o_totalprice").over(w), 6).alias("first_price"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


@register(
    "q61_range_frame",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                    RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar
        FROM orders ORDER BY o_custkey, o_orderkey LIMIT 100
    """,
    doc="Value-based RANGE window frame: per customer, how many of their "
    "orders are within 1000 below this order's price (peer rows "
    "included, deterministic under ties).",
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return (
        table(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.count("*").over(w).cast("long").alias("n_similar"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(100)
    )


@register(
    "q83_event_funnel",
    oracle="""
        SELECT CAST(COUNT(DISTINCT CASE WHEN t_view IS NOT NULL THEN user_id END) AS BIGINT) AS n_viewed,
               CAST(COUNT(DISTINCT CASE WHEN t_click IS NOT NULL THEN user_id END) AS BIGINT) AS n_clicked,
               CAST(COUNT(DISTINCT CASE WHEN t_buy IS NOT NULL THEN user_id END) AS BIGINT) AS n_purchased
        FROM (
          SELECT user_id, t_view, t_click,
                 MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                     OVER (PARTITION BY user_id) AS t_buy
          FROM (
            SELECT user_id, event_type, ts, t_view,
                   MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                       OVER (PARTITION BY user_id) AS t_click
            FROM (
              SELECT user_id, event_type, ts,
                     MIN(CASE WHEN event_type = 'view' THEN ts END)
                         OVER (PARTITION BY user_id) AS t_view
              FROM events) a) b) c
    """,
    doc="Ordered funnel (view -> click-after-view -> purchase-after-click) "
    "as three chained conditional window minima over one events scan — no "
    "self-joins, one shuffle on user_id reused by all three windows "
    "(identical partitioning, Catalyst plans a single Exchange).",
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id")
    ev = table_parallel(spark, sf, "events").select("user_id", "event_type", "ts")
    step1 = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    step2 = step1.withColumn(
        "t_click",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")), F.col("ts"))
        ).over(w),
    )
    step3 = step2.withColumn(
        "t_buy",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")), F.col("ts")
            )
        ).over(w),
    )
    return step3.agg(
        F.countDistinct(F.when(F.col("t_view").isNotNull(), F.col("user_id")))
        .cast("long")
        .alias("n_viewed"),
        F.countDistinct(F.when(F.col("t_click").isNotNull(), F.col("user_id")))
        .cast("long")
        .alias("n_clicked"),
        F.countDistinct(F.when(F.col("t_buy").isNotNull(), F.col("user_id")))
        .cast("long")
        .alias("n_purchased"),
    )


@register(
    "q90_latest_per_key",
    oracle="""
        SELECT user_id, event_type, event_id, value FROM (
          SELECT user_id, event_type, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1 ORDER BY user_id, event_type
    """,
    doc="Latest-wins compaction (the CDC/upsert-view pattern): one row "
    "per (user_id, event_type) key, the newest by (ts, event_id). A "
    "single ranking window on the key — the materialization step every "
    "mutable-table view needs over an append-only log. At 100 TB this "
    "is the query run per partition during compaction; nothing global, "
    "shuffle keyed on the deduplication key only.",
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        table_parallel(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
        .orderBy("user_id", "event_type")
    )


# q136: z-normalized subsequence pattern matching (the distributed
# time-series similarity-search shape: REPOSE ICDE'21 / Odyssey VLDB'23
# study the same decomposition — window candidates generated locally,
# scored against a broadcast query, only survivors reported).
_TS_PATTERN = [0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 1.0, 0.0]  # a spike shape
_TS_W = len(_TS_PATTERN)  # 8
_TS_SP = sum(_TS_PATTERN)  # 10.0
_TS_DEN_P = _TS_W * sum(x * x for x in _TS_PATTERN) - _TS_SP * _TS_SP  # 108.0
_TS_CORR_MIN = 0.8


@register(
    "q136_ts_pattern_match",
    oracle=f"""
        WITH s AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS pos
          FROM events WHERE user_id < 50
        ),
        pat AS (SELECT UNNEST(range(0, {_TS_W})) AS j,
                       UNNEST({_TS_PATTERN}) AS p),
        ex AS (
          SELECT user_id, pos - j AS start, value * p AS vp, value
          FROM s, pat
        ),
        win AS (
          SELECT user_id, start,
                 COUNT(*) AS n, SUM(vp) AS sxy,
                 SUM(value) AS sx, SUM(value * value) AS sxx
          FROM ex WHERE start >= 1 GROUP BY user_id, start
        ),
        scored AS (
          SELECT user_id, start,
                 ({_TS_W} * sxy - sx * {_TS_SP})
                   / sqrt(({_TS_W} * sxx - sx * sx) * {_TS_DEN_P}) AS corr
          FROM win
          WHERE n = {_TS_W} AND ({_TS_W} * sxx - sx * sx) > 1e-9
        )
        SELECT user_id, CAST(start AS BIGINT) AS win_start,
               ROUND(corr, 6) AS corr
        FROM scored WHERE ROUND(corr, 6) >= {_TS_CORR_MIN}
        ORDER BY user_id, win_start
    """,
    doc="Distributed time-series subsequence similarity search "
    "(REPOSE/Odyssey family): every length-8 sliding window of each "
    "user's value series is scored by Pearson correlation against a "
    "broadcast spike pattern (z-normalized distance and correlation "
    "are affine equivalents), windows above 0.8 reported. The plan is "
    "join-FREE: posexplode fans each point into the 8 windows it "
    "belongs to (start = pos - j, weight p_j) and one (user, start)-"
    "keyed aggregate rebuilds every window's sufficient statistics "
    "(sum xy / sum x / sum x^2); pattern-side sums are plan-time "
    "constants. Shuffle = W x series points of scalars, partitioned "
    "by user — no self-join, no per-window recompute, skew-free "
    "because windows of one user stay in one partition only for the "
    "length of an aggregate. This is the textbook scale shape for "
    "telemetry pattern scans at 100 TB.",
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    wspec = Window.partitionBy("user_id").orderBy("ts", "event_id")
    series = (
        table_parallel(spark, sf, "events")
        .where(F.col("user_id") < 50)
        .select("user_id", "ts", "event_id", "value")
        .withColumn("pos", F.row_number().over(wspec))
    )
    pat = F.array(*[F.lit(x) for x in _TS_PATTERN])
    ex = series.select(
        "user_id", "pos", "value", F.posexplode(pat).alias("j", "p")
    ).select(
        "user_id",
        (F.col("pos") - F.col("j")).alias("start"),
        (F.col("value") * F.col("p")).alias("vp"),
        "value",
    )
    win = (
        ex.where(F.col("start") >= 1)
        .groupBy("user_id", "start")
        .agg(
            F.count("*").alias("n"),
            F.sum("vp").alias("sxy"),
            F.sum("value").alias("sx"),
            F.sum(F.col("value") * F.col("value")).alias("sxx"),
        )
    )
    var_x = _TS_W * F.col("sxx") - F.col("sx") * F.col("sx")
    corr = (_TS_W * F.col("sxy") - F.col("sx") * F.lit(_TS_SP)) / F.sqrt(
        var_x * F.lit(_TS_DEN_P)
    )
    return (
        win.where((F.col("n") == _TS_W) & (var_x > 1e-9))
        .select(
            "user_id",
            F.col("start").cast("long").alias("win_start"),
            F.round(corr, 6).alias("corr"),
        )
        .where(F.col("corr") >= _TS_CORR_MIN)
        .orderBy("user_id", "win_start")
    )


_ANOM_Z = 3.5  # Iglewicz-Hoaglin modified z-score cutoff


@register(
    "q146_robust_anomaly",
    oracle=f"""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day, SUM(value) AS v
          FROM events GROUP BY user_id, day
        ),
        med AS (SELECT user_id, quantile_cont(v, 0.5) AS m
                FROM daily GROUP BY user_id),
        dev AS (SELECT d.user_id, d.day, d.v, m.m, ABS(d.v - m.m) AS ad
                FROM daily d JOIN med m USING (user_id)),
        madt AS (SELECT user_id, quantile_cont(ad, 0.5) AS mad
                 FROM dev GROUP BY user_id),
        scored AS (
          SELECT dev.user_id, dev.day, dev.v,
                 ROUND(0.6745 * (dev.v - dev.m) / madt.mad, 4) AS mod_z
          FROM dev JOIN madt USING (user_id) WHERE madt.mad > 0
        )
        SELECT user_id, CAST(day AS VARCHAR) AS day,
               ROUND(v, 6) AS daily_value, mod_z
        FROM scored WHERE ABS(mod_z) > {_ANOM_Z}
        ORDER BY user_id, day
    """,
    doc="Robust per-entity anomaly detection: each user's daily activity "
    "total is scored by the MAD-based modified z-score "
    "(0.6745*(x - median)/MAD, Iglewicz-Hoaglin) and days beyond |3.5| "
    "flag - the outlier detector that, unlike mean/stddev z-scores, "
    "does not let the anomalies inflate their own threshold (median "
    "and MAD have a 50% breakdown point). Plan shape: two exact-"
    "percentile aggregates and one join, ALL keyed on user_id, so the "
    "data shuffles once onto its entity key and stays there - per-"
    "entity medians are small-group exact statistics, the place exact "
    "percentile is right (corpus-wide percentiles want the q68 sketch "
    "path instead).",
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    daily = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum("value").alias("v"))
    )
    med = daily.groupBy("user_id").agg(F.percentile("v", F.lit(0.5)).alias("m"))
    dev = daily.join(med, "user_id").withColumn("ad", F.abs(F.col("v") - F.col("m")))
    madt = dev.groupBy("user_id").agg(F.percentile("ad", F.lit(0.5)).alias("mad"))
    scored = (
        dev.join(madt, "user_id")
        .where(F.col("mad") > 0)
        .withColumn(
            "mod_z", F.round(0.6745 * (F.col("v") - F.col("m")) / F.col("mad"), 4)
        )
    )
    return (
        scored.where(F.abs(F.col("mod_z")) > _ANOM_Z)
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round("v", 6).alias("daily_value"),
            "mod_z",
        )
        .orderBy("user_id", "day")
    )


_XCORR_MAX_LAG = 3


@register(
    "q147_leadlag_xcorr",
    oracle=f"""
        WITH d AS (
          SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
                 COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS views,
                 COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases
          FROM events GROUP BY idx
        ),
        lags AS (SELECT UNNEST(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1})) AS lag),
        pairs AS (
          SELECT l.lag, a.views, b.purchases
          FROM d a CROSS JOIN lags l JOIN d b ON b.idx = a.idx + l.lag
        )
        SELECT CAST(lag AS BIGINT) AS lag,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(corr(views, purchases), 6) AS xcorr
        FROM pairs GROUP BY lag ORDER BY lag
    """,
    doc="Lead-lag cross-correlation between two event series: Pearson "
    "correlation of daily view counts against purchase counts shifted "
    "by each lag in [-3, +3] - the does-browsing-predict-buying "
    "diagnostic (the lag maximizing correlation estimates the "
    "conversion delay). Plan shape: the heavy work is ONE conditional "
    "day-keyed aggregate collapsing the corpus to one row per day; "
    "the lag fan-out and self-join run on that day-sized series, so "
    "cost is scan + tiny-table algebra at any corpus size - the "
    "aggregate-first discipline every telemetry correlation job "
    "needs.",
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = (
        table_parallel(spark, sf, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("idx")
        )
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "purchases"
            ),
        )
        .localCheckpoint(eager=False)
    )
    a = d.select(
        "idx",
        "views",
        F.explode(
            F.sequence(F.lit(-_XCORR_MAX_LAG), F.lit(_XCORR_MAX_LAG))
        ).alias("lag"),
    )
    b = d.select(F.col("idx").alias("bidx"), "purchases")
    pairs = a.join(b, F.col("bidx") == F.col("idx") + F.col("lag"))
    return (
        pairs.groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.corr("views", "purchases"), 6).alias("xcorr"),
        )
        .select(F.col("lag").cast("long").alias("lag"), "n_days", "xcorr")
        .orderBy("lag")
    )


@register(
    "q157_time_to_convert",
    oracle="""
        WITH seq AS (
          SELECT user_id, ts, event_type,
                 MAX(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_view
          FROM events
        ),
        conv AS (
          SELECT date_diff('microsecond', last_view, ts) // 60000000 AS delay_min
          FROM seq
          WHERE event_type = 'purchase' AND last_view IS NOT NULL
        )
        SELECT LEAST(11, CAST(delay_min // 60 AS INT)) AS delay_hours_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(MIN(delay_min) AS BIGINT) AS min_minutes,
               CAST(MAX(delay_min) AS BIGINT) AS max_minutes
        FROM conv GROUP BY delay_hours_bucket ORDER BY delay_hours_bucket
    """,
    doc="Time-to-convert distribution: each purchase is attributed to "
    "the user's most recent PRIOR view (a conditional carry-forward "
    "window - the as-of semantics inside an entity partition, no "
    "join), and the view->purchase delays aggregate into hour "
    "buckets (11+ capped) - the conversion-latency histogram that "
    "sets attribution windows and retargeting timers, and the "
    "empirical answer q147's lag correlation estimates in aggregate. "
    "Shuffle shape: one user-keyed window, one bounded histogram "
    "aggregate; the carry-forward is running MAX over a "
    "rows-preceding frame, so state per user is one timestamp.",
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = table_parallel(spark, sf, "events").withColumn(
        "last_view",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    conv = seq.where(
        (F.col("event_type") == "purchase") & F.col("last_view").isNotNull()
    ).select(
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("last_view")) / 60_000_000
        ).cast("long").alias("delay_min")
    )
    return (
        conv.groupBy(
            F.least(F.lit(11), (F.col("delay_min") / 60).cast("int")).alias(
                "delay_hours_bucket"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.min("delay_min").cast("long").alias("min_minutes"),
            F.max("delay_min").cast("long").alias("max_minutes"),
        )
        .orderBy("delay_hours_bucket")
    )



@register(
    "q182_percent_of_parent",
    oracle="""
        WITH rev AS (
          SELECT r.r_name AS region, n.n_name AS nation,
                 SUM(o.o_totalprice) AS nation_rev
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          GROUP BY r.r_name, n.n_name
        )
        SELECT region, nation,
               ROUND(nation_rev, 2) AS nation_rev,
               ROUND(nation_rev / SUM(nation_rev) OVER (PARTITION BY region),
                     6) AS pct_of_region,
               ROUND(nation_rev / SUM(nation_rev) OVER (), 6) AS pct_of_total
        FROM rev ORDER BY region, nation
    """,
    doc="Percent-of-parent OLAP shares: nation revenue as a share of "
    "its region and of the world, in one pass — the drill-down "
    "ratio every BI tool renders (and re-queries badly: the naive "
    "formulation re-aggregates the fact table once per grain). Plan "
    "shape: the corpus-sized work is ONE orders aggregate keyed by "
    "the joined-in (region, nation) dims (all dimension joins "
    "broadcast); both share denominators are window sums over the "
    "|nations|-row summary, so the multi-grain ratios cost nothing "
    "extra at 100 TB.",
)
def q182(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders")
    c = table_parallel(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = table_parallel(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = table_parallel(spark, sf, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("nation_rev"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round("nation_rev", 2).alias("nation_rev"),
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(w_region), 6).alias(
            "pct_of_region"
        ),
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(w_all), 6).alias(
            "pct_of_total"
        ),
    ).orderBy("region", "nation")

@register(
    "q187_revenue_pareto",
    oracle="""
        WITH c AS (
          SELECT o_custkey,
                 CAST(SUM(ROUND(o_totalprice * 100)) AS BIGINT) AS cents
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT cents,
                 ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS r,
                 COUNT(*) OVER () AS n,
                 SUM(cents) OVER () AS total,
                 SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM c
        ),
        pcts AS (SELECT UNNEST([1, 5, 20]) AS pct)
        SELECT CAST(pct AS BIGINT) AS top_pct,
               CAST(MAX(r) AS BIGINT) AS n_customers,
               ROUND(CAST(MAX(cum) AS DOUBLE) / MAX(total), 6)
                 AS revenue_share
        FROM ranked JOIN pcts
          ON ranked.r <= CAST(CEIL(pct * ranked.n / 100.0) AS BIGINT)
        GROUP BY pct ORDER BY top_pct
    """,
    doc="Revenue Pareto concentration: the share of total order value "
    "captured by the top 1/5/20 percent of customers — the "
    "whale-curve census behind account-tiering and risk-of-"
    "concentration reviews (80/20 checks). Money is exact integer "
    "cents; the cumulative and total sums are exact, with ONE double "
    "division per output row, so shares are engine-stable at round "
    "6. Plan shape: one custkey-keyed aggregate collapses orders to "
    "|customers| rows; the global rank and running revenue sum come "
    "from the two-phase sharded scan (dist_rank.with_global_order_"
    "stats — no single-task window), with count/total as free "
    "driver-side by-products; the head join is rank<=ceil(pct*n) "
    "vs the 3-row fixed percentile list.",
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    c = (
        table_parallel(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100))
            .cast("long")
            .alias("cents")
        )
    )
    from harmony_spark.operators.dist_rank import with_global_order_stats

    stats, totals = with_global_order_stats(
        c.withColumn("negcents", -F.col("cents")),
        "negcents",
        ("o_custkey",),
        rank_col="r",
        sum_cols={"cents": "cum"},
    )
    ranked = stats.select(
        "r",
        F.lit(totals["rows"]).cast("long").alias("n"),
        F.lit(totals["cents"]).cast("long").alias("total"),
        "cum",
    )
    pcts = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(20))).alias("pct")
    )
    return (
        ranked.join(
            pcts,
            ranked["r"]
            <= F.ceil(pcts["pct"] * ranked["n"] / 100.0).cast("long"),
        )
        .groupBy(F.col("pct").cast("long").alias("top_pct"))
        .agg(
            F.max("r").cast("long").alias("n_customers"),
            F.round(
                F.max("cum").cast("double") / F.max("total"), 6
            ).alias("revenue_share"),
        )
        .orderBy("top_pct")
    )
