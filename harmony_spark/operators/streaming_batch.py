"""Batch-mode equivalents of the Structured Streaming surface (SURVEY.md §2.9).

The reference is strictly batch (no streaming anywhere in /root/reference);
these queries declare the oracle-checkable batch semantics of the streaming
operators implemented in :mod:`harmony_spark.streaming.ops` — tumbling
window agg, gap-based sessionization, keyed dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harmony_spark.io import table
from harmony_spark.registry import register


@register(
    "q27_tumbling_window",
    oracle="""
        SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS v
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Tumbling-window aggregate, batch equivalent of "
    "groupBy(F.window(ts, '1 hour')) in streaming mode.",
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .orderBy("h", "event_type")
    )


@register(
    "q28_sessionization",
    oracle="""
        SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions FROM (
          SELECT user_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM (SELECT user_id, ts, event_id,
                       CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                                 OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                    > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events) a) b
        GROUP BY user_id ORDER BY user_id LIMIT 100
    """,
    doc="Gap-based sessionization (30-min gap), batch SQL equivalent of "
    "F.session_window(ts, '30 minutes'). Session id = running sum of "
    "gap-break indicators; n_sessions = max id.",
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lag_ts = F.lag("ts").over(order)
    new_s = F.when(
        lag_ts.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(lag_ts) > 1800),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        table(spark, sf, "events")
        .select("user_id", "ts", "event_id", new_s.alias("new_s"))
        .select("user_id", F.sum("new_s").over(cum).alias("sid"))
        .groupBy("user_id")
        .agg(F.max("sid").cast("long").alias("n_sessions"))
        .orderBy("user_id")
        .limit(100)
    )


@register(
    "q29_dedup_by_key",
    oracle="SELECT COUNT(*) AS n_unique FROM (SELECT DISTINCT event_id FROM events) t",
    doc="Keyed dedup, batch analogue of streaming dropDuplicates(['event_id']) "
    "within a watermark.",
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    return (
        table(spark, sf, "events")
        .select("event_id")
        .distinct()
        .agg(F.count("*").alias("n_unique"))
    )


@register(
    "q77_interval_join",
    oracle="""
        SELECT v.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(datediff('microseconds', v.ts, c.ts)) AS BIGINT) AS sum_delay_us
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
        GROUP BY v.user_id ORDER BY v.user_id
    """,
    doc="Interval (event-time range) join: every click within one hour "
    "after a view by the same user — the batch equivalent of the "
    "watermarked stream-stream join (streaming/ops.py "
    "interval_join_views_clicks). Equi-key on user_id carries the "
    "shuffle; the time bound is a residual predicate, so the plan is a "
    "plain sort-merge join, never a cross product. Delays summed in "
    "exact integer microseconds for engine-portable hashing.",
)
def q77(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.unix_micros("c_ts") - F.unix_micros("v_ts")).alias("sum_delay_us"),
        )
        .orderBy("user_id")
    )


@register(
    "q88_time_decayed_scores",
    oracle="""
        WITH mx AS (SELECT MAX(ts) AS tmax FROM events)
        SELECT user_id, COUNT(*) AS n,
               ROUND(SUM(value * EXP(-(datediff('microsecond', ts, tmax)
                                       / 86400000000.0))), 4) AS score
        FROM events, mx
        GROUP BY user_id ORDER BY user_id
    """,
    doc="Exponentially time-decayed engagement score per user "
    "(half-life-style recency weighting, tau = 1 day): "
    "score = sum(value * exp(-(t_max - ts)/tau)). The streaming-native "
    "metric computed batch-side: decay is a row-local expression against "
    "a driver-collected scalar t_max (no 1-row cross join in the plan), "
    "then one hash aggregate. DuckDB datediff('microsecond') and Spark "
    "unix_micros agree exactly, so the decay exponents are bit-identical "
    "cross-engine.",
)
def q88(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    tmax = ev.agg(F.max("ts")).first()[0]
    decay = F.exp(
        -(F.unix_micros(F.lit(tmax)) - F.unix_micros(F.col("ts"))) / F.lit(86400e6)
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value") * decay), 4).alias("score"),
        )
        .orderBy("user_id")
    )


@register(
    "q119_cohort_retention",
    oracle="""
        WITH firstday AS (
          SELECT user_id, date_trunc('day', MIN(ts)) AS cohort
          FROM events GROUP BY user_id
        ),
        active AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        )
        SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
               CAST(date_diff('day', f.cohort, a.day) AS BIGINT) AS day_offset,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
        FROM active a JOIN firstday f ON f.user_id = a.user_id
        GROUP BY f.cohort, day_offset ORDER BY cohort_day, day_offset
    """,
    doc="Cohort retention matrix (the product-analytics staple): users "
    "grouped by first-seen day, counted on each subsequent active day "
    "offset. Two aggregates keyed on user_id (first-touch + distinct "
    "active days) and one user-keyed equi-join - the cohort table is "
    "users-sized, never events-sized, and at 100 TB both aggregates "
    "combine map-side; nothing is keyed on the low-cardinality cohort "
    "until the final bounded matrix.",
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").select("user_id", "ts")
    firstday = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    active = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    return (
        active.join(firstday, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort")).cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q128_time_rollup",
    oracle="""
        SELECT COALESCE(strftime(date_trunc('day', ts), '%Y-%m-%d'), 'ALL') AS day,
               COALESCE(CAST(EXTRACT(hour FROM ts) AS VARCHAR), 'ALL') AS hour,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(CAST(ROUND(value * 1000, 0) AS BIGINT)) / 1000.0, 3)
                 AS v
        FROM events
        GROUP BY GROUPING SETS ((date_trunc('day', ts), EXTRACT(hour FROM ts)),
                                (date_trunc('day', ts)),
                                ())
        ORDER BY day, hour
    """,
    doc="Hypertable-style multi-granular time rollup: (day, hour-of-"
    "day), per-day, and grand-total aggregates in ONE grouping-sets "
    "pass over the event stream - the continuous-aggregate shape "
    "time-series stores maintain incrementally, here as a single "
    "scan with map-side partial aggregation at every grain (Spark "
    "expands grouping sets before the shuffle, so each input row "
    "shuffles once per grain on bounded keys). Sums ride exact "
    "integer millis to stay engine-deterministic.",
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events")
    day = F.date_trunc("day", "ts")
    hour = F.hour("ts")
    milli = F.round(F.col("value") * 1000, 0).cast("long")
    return (
        ev.select(day.alias("d"), hour.alias("h"), milli.alias("mv"))
        .groupingSets([["d", "h"], ["d"], []], "d", "h")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("mv") / 1000.0, 3).alias("v"),
        )
        .select(
            F.coalesce(F.date_format("d", "yyyy-MM-dd"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("h").cast("string"), F.lit("ALL")).alias("hour"),
            "n",
            "v",
        )
        .orderBy("day", "hour")
    )


@register(
    "q152_markov_transitions",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type AS src,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS dst
          FROM events
        ),
        t AS (SELECT src, dst, COUNT(*) AS n FROM seq
              WHERE dst IS NOT NULL GROUP BY src, dst)
        SELECT src, dst, CAST(n AS BIGINT) AS n,
               ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 6)
                 AS p
        FROM t ORDER BY src, dst
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next event type | current) estimated from every "
    "consecutive pair in each user's timeline - the behavioral model "
    "behind next-action prediction, anomalous-flow detection, and "
    "funnel leak analysis. Plan shape: one user-keyed LEAD window "
    "(the data shuffles onto its entity key once, same as q113/q146) "
    "then a hash aggregate to the K^2 transition cells; the "
    "normalizing window runs over those ~25 rows. Same plan at any "
    "corpus size.",
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        table_parallel(spark, sf, "events")
        .select(
            "user_id",
            F.col("event_type").alias("src"),
            "ts",
            "event_id",
        )
        .withColumn("dst", F.lead("src").over(w))
        .where(F.col("dst").isNotNull())
    )
    t = seq.groupBy("src", "dst").agg(F.count("*").cast("long").alias("n"))
    wn = Window.partitionBy("src")
    return (
        t.withColumn(
            "p", F.round(F.col("n").cast("double") / F.sum("n").over(wn), 6)
        )
        .orderBy("src", "dst")
    )


@register(
    "q153_new_vs_returning",
    oracle="""
        WITH firsts AS (
          SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
          FROM events GROUP BY user_id
        ),
        daily AS (
          SELECT CAST(ts AS DATE) AS day, user_id
          FROM events GROUP BY day, user_id
        ),
        d AS (
          SELECT daily.day,
                 COUNT(*) AS n_active,
                 SUM(CASE WHEN f.first_day = daily.day THEN 1 ELSE 0 END) AS n_new
          FROM daily JOIN firsts f USING (user_id)
          GROUP BY daily.day
        )
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(n_active AS BIGINT) AS n_active,
               CAST(n_new AS BIGINT) AS n_new,
               CAST(n_active - n_new AS BIGINT) AS n_returning,
               CAST(SUM(n_new) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
        FROM d ORDER BY day
    """,
    doc="New-vs-returning user census with cumulative reach: per day, "
    "active users split by whether this is their first-ever day, plus "
    "the running total of users ever seen - the DAU decomposition "
    "every product dashboard leads with. Plan shape: first-seen days "
    "are one user-keyed aggregate; the daily census joins it back on "
    "the user key (AQE-broadcastable); the cumulative window runs "
    "over the ~30 day rows. No distinct-over-window, no growing "
    "state - the first-touch table IS the deduplication.",
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = ev.distinct()
    d = (
        daily.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("n_active"),
            F.sum((F.col("first_day") == F.col("day")).cast("long")).alias(
                "n_new"
            ),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        d.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("n_new").cast("long").alias("n_new"),
            (F.col("n_active") - F.col("n_new")).cast("long").alias("n_returning"),
            F.sum("n_new").over(w).cast("long").alias("cumulative_users"),
        )
        .orderBy("day")
    )
