"""User-journey analytics over the events stream: ordered funnels,
multi-touch attribution, as-of enrichment, exponential smoothing, and
path n-grams.

These are the event-sequence operators a product-analytics or
training-telemetry pipeline runs at warehouse scale. The common
discipline: every operator reduces the event stream inside ONE
user-keyed (or day-keyed) shuffle before any join — per-entity state is
a handful of timestamps/counters, never the raw event list — so the
plans scale with the number of entities, not the number of events.

``asof_join`` is the reusable operator: Spark has no native AS OF join,
so it is expressed as the union-tag + carry-forward-window composition
(one shuffle, no range explosion); the q164 oracle cross-checks it
against DuckDB's native ``ASOF JOIN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """AS-OF join: attach to every left row the LATEST right row of the
    same key whose ``right_ts`` <= ``left_ts`` (inclusive).

    Spark-first formulation: tag both sides, union, and carry the right
    payload forward with a ``last(..., ignorenulls)`` window ordered by
    (ts, side) inside each key — right rows sort before simultaneous
    left rows, giving inclusive semantics. ONE shuffle on the key, no
    time-range join fan-out, state per key is a single struct: the
    shape that survives a 100 TB fact stream (a range join would
    explode; per-key sort is what the shuffle already does).

    The right payload is carried as one STRUCT column so legitimately
    NULL payload fields can't be leap-frogged by the ignorenulls carry.
    Right rows must be unique per (key, right_ts) — dedupe upstream,
    otherwise which duplicate wins is undefined (DuckDB ASOF has the
    same contract).

    ``how='inner'`` drops left rows with no prior right row;
    ``'left'`` keeps them with a NULL payload struct.
    """
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("_payload")
    r = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"), payload
    )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("_side") == 1)
    if how == "inner":
        out = out.where(F.col("_match").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: unsupported how={how!r}")
    for c in right_payload:
        out = out.withColumn(c, F.col("_match")[c])
    return out.drop("_ts", "_side", "_payload", "_match")


@register(
    "q161_funnel_conversion",
    oracle="""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id
        ),
        full_path AS (
          SELECT SUM(date_diff('microsecond', v.t1, p.t3)) AS total_us,
                 COUNT(*) AS n
          FROM p JOIN v USING (user_id)
        )
        SELECT (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
                 AS n_users,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewed,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_clicked,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchased,
               ROUND(CAST(total_us AS DOUBLE) / (n * 3600000000.0), 6)
                 AS avg_hours_to_convert
        FROM full_path
    """,
    doc="Ordered conversion funnel view -> click -> purchase: stage k "
    "counts users whose FIRST qualifying event strictly follows their "
    "stage-(k-1) timestamp — the sequenced-funnel semantics (a plain "
    "per-type distinct count would overcount users who purchased "
    "before ever viewing). Plan shape: one user-keyed conditional MIN "
    "aggregate per stage, each joined to the previous stage's "
    "user-level output — per-user state is one timestamp per stage, "
    "and the joins run on user-sized tables, not events. The mean "
    "view->purchase latency divides an EXACT integer-microsecond SUM "
    "(one double division at the end), so the result is bit-stable "
    "across engines and partitionings.",
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    # ONE grouped pass replaces the stage-join chain (view->click->
    # purchase joins + 5 cross-joined scalar aggregates, each of which
    # re-derived its upstream stages): per user, t1 = min view, t2 =
    # first click after t1, t3 = first purchase after t2 — the strict-
    # ordering funnel as array HOFs over the user's own (bounded)
    # per-type timestamp lists, then a single global rollup.  The
    # lambdas live in expr strings (name references, no captured
    # Columns).
    ev = table_parallel(spark, sf, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    per = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).alias(
                "t1"
            ),
            F.collect_list(
                F.when(F.col("event_type") == "click", F.col("us"))
            ).alias("cl"),
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("us"))
            ).alias("pl"),
        )
        .withColumn("t2", F.expr("array_min(filter(cl, x -> x > t1))"))
        .withColumn("t3", F.expr("array_min(filter(pl, x -> x > t2))"))
    )
    return per.agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("t1").cast("long").alias("n_viewed"),
        F.count("t2").cast("long").alias("n_clicked"),
        F.count("t3").cast("long").alias("n_purchased"),
        F.round(
            F.sum(F.col("t3") - F.col("t1")).cast("double")
            / (F.count("t3") * 3_600_000_000.0),
            6,
        ).alias("avg_hours_to_convert"),
    )


_ATTR_WINDOW_US = 72 * 3_600_000_000  # 72-hour attribution lookback


@register(
    "q162_linear_attribution",
    oracle=f"""
        WITH p AS (
          SELECT event_id AS pid, user_id, epoch_us(ts) AS pus,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        t AS (
          SELECT user_id, epoch_us(ts) AS tus, event_type AS touch_type
          FROM events WHERE event_type IN ('view', 'click')
        ),
        pairs AS (
          SELECT p.pid, p.cents, t.touch_type
          FROM p JOIN t ON p.user_id = t.user_id
           AND t.tus < p.pus AND t.tus >= p.pus - {_ATTR_WINDOW_US}
        ),
        k AS (SELECT pid, COUNT(*) AS n_touch FROM pairs GROUP BY pid)
        SELECT pairs.touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(SUM(pairs.cents // k.n_touch) AS BIGINT)
                 AS attributed_cents
        FROM pairs JOIN k USING (pid)
        GROUP BY pairs.touch_type ORDER BY pairs.touch_type
    """,
    doc="Multi-touch LINEAR attribution: every purchase's value is "
    "split equally across the user's view/click touches in the "
    "preceding 72 h, then credit rolls up per touch type — the "
    "marketing-mix primitive between last-touch (q157's as-of) and "
    "position-weighted models. Money math is integer cents with "
    "floor division (cents // n_touch), so the split is EXACT and "
    "engine/partitioning-independent — double division here would "
    "make the rounded sums flap by one ulp between engines. Shuffle "
    "shape: the touch-purchase pairing is a user-keyed equi-join with "
    "a residual time-range predicate (never a pure range join), and "
    "the per-purchase touch count is a pid-keyed aggregate on the "
    "pair table.",
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("pus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("tus"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = p.join(
        t,
        (p["user_id"] == t["user_id"])
        & (t["tus"] < p["pus"])
        & (t["tus"] >= p["pus"] - F.lit(_ATTR_WINDOW_US)),
    ).select("pid", "cents", "touch_type")
    k = pairs.groupBy("pid").agg(F.count("*").alias("n_touch"))
    return (
        pairs.join(k, "pid")
        .groupBy("touch_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum(F.floor(F.col("cents") / F.col("n_touch")))
            .cast("long")
            .alias("attributed_cents"),
        )
        .orderBy("touch_type")
    )


_EWMA_ALPHA = 0.9  # per-day decay


@register(
    "q163_ewma_daily",
    oracle=f"""
        WITH d AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
                 SUM(value) AS x
          FROM events GROUP BY event_type, idx
        ),
        m AS (
          SELECT event_type, idx, x,
                 MAX(idx) OVER (PARTITION BY event_type) AS last_idx
          FROM d
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(SUM(x * POW({_EWMA_ALPHA}, last_idx - idx))
                     / SUM(POW({_EWMA_ALPHA}, last_idx - idx)), 6) AS ewma
        FROM m GROUP BY event_type ORDER BY event_type
    """,
    doc="Exponentially weighted moving average of daily value mass per "
    "event type, evaluated at the most recent day — the trend-vs-spike "
    "smoother behind alerting and drift dashboards. The recursive "
    "definition ewma_t = a*ewma_(t-1) + x_t is re-expressed CLOSED-FORM "
    "as a normalized pow-decay dot product sum(x_i * a^(last-i)) / "
    "sum(a^(last-i)), which any engine computes in one grouped "
    "aggregate over the day-level series — no recursion, no ordered "
    "scan, no state. Plan shape: events collapse to one row per "
    "(type, day) in a single day-keyed aggregate; the decay algebra "
    "runs on that tiny series, so cost at 100 TB is the first "
    "aggregate alone.",
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = (
        table_parallel(spark, sf, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("idx"),
        )
        .agg(F.sum("value").alias("x"))
    )
    m = d.withColumn(
        "last_idx", F.max("idx").over(Window.partitionBy("event_type"))
    )
    decay = F.pow(F.lit(_EWMA_ALPHA), F.col("last_idx") - F.col("idx"))
    return (
        m.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.round(F.sum(F.col("x") * decay) / F.sum(decay), 6).alias("ewma"),
        )
        .orderBy("event_type")
    )


@register(
    "q164_asof_signup_attribution",
    oracle="""
        WITH s AS (
          SELECT user_id, ts, MAX(event_id) AS signup_id
          FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
        ),
        p AS (
          SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase'
        )
        SELECT p.purchase_id, p.user_id,
               s.signup_id,
               CAST(date_diff('microsecond', s.ts, p.ts) // 60000000
                    AS BIGINT) AS mins_since_signup
        FROM p ASOF JOIN s
          ON p.user_id = s.user_id AND p.ts >= s.ts
        ORDER BY p.purchase_id
    """,
    doc="AS-OF join as a first-class operator: every purchase is "
    "enriched with the user's latest signup at-or-before it "
    "(inclusive), the point-in-time lookup pattern behind feature "
    "stores, slowly-changing enrichment, and tick-data joins. Spark "
    "side is the generic asof_join() — union-tag + carry-forward "
    "window, ONE user-keyed shuffle, per-key state = one payload "
    "struct, no time-range fan-out. The oracle is DuckDB's NATIVE "
    "ASOF JOIN, so the two implementations are independent "
    "algorithms agreeing row-for-row; the right side is deduped to "
    "one row per (user, ts) upstream, the contract both formulations "
    "share.",
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", F.col("ts").alias("signup_ts"))
        .agg(F.max("event_id").alias("signup_id"))
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    joined = asof_join(
        p,
        s,
        on=["user_id"],
        left_ts="ts",
        right_ts="signup_ts",
        right_payload=["signup_id", "signup_ts"],
        how="inner",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "signup_id",
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("signup_ts")) / 60_000_000
        )
        .cast("long")
        .alias("mins_since_signup"),
    ).orderBy("purchase_id")


_TRIGRAM_TOP_K = 10


@register(
    "q168_journey_trigrams",
    oracle=f"""
        WITH seq AS (
          SELECT user_id, event_type AS step1,
                 LEAD(event_type, 1) OVER w AS step2,
                 LEAD(event_type, 2) OVER w AS step3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
        FROM seq WHERE step3 IS NOT NULL
        GROUP BY step1, step2, step3
        ORDER BY n_paths DESC, step1, step2, step3
        LIMIT {_TRIGRAM_TOP_K}
    """,
    doc="Top user-journey trigrams: consecutive event-type triples "
    "inside each user's time-ordered stream, censused and ranked — "
    "the path-analysis primitive behind sankey/flow dashboards and "
    "Markov-order sanity checks (q152's transition matrix is the "
    "bigram marginal of this). Plan shape: one user-keyed window "
    "produces both LEADs in a single sort (frame state = 2 rows), "
    "the census is a bounded |types|^3-key aggregate with map-side "
    "combine, and the top-k is TakeOrdered with a full "
    "count-then-lexicographic tiebreak so the cut is deterministic.",
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table_parallel(spark, sf, "events").select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    )
    return (
        seq.where(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count("*").cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "step1", "step2", "step3")
        .limit(_TRIGRAM_TOP_K)
    )

_KM_OBS_END = "2024-01-31"  # observation-window end (data ends 2024-01-30)
_KM_CENSOR_DAYS = 7  # active within the last 7 days => censored, not churned


@register(
    "q171_kaplan_meier",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 date_diff('microsecond', MIN(ts), MAX(ts)) // 86400000000
                   AS lifetime_days,
                 CASE WHEN date_diff('microsecond', MAX(ts),
                                     TIMESTAMP '{_KM_OBS_END} 00:00:00')
                           >= {_KM_CENSOR_DAYS} * 86400000000
                      THEN 1 ELSE 0 END AS churned
          FROM events GROUP BY user_id
        ),
        g AS (
          SELECT lifetime_days AS t,
                 SUM(churned) AS d,
                 COUNT(*) - SUM(churned) AS c
          FROM u GROUP BY lifetime_days
        ),
        k AS (
          SELECT t, d, c,
                 (SELECT COUNT(*) FROM u)
                   - COALESCE(SUM(d + c) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM g
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_churned,
               ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_risk))
                         OVER (ORDER BY t)), 6) AS survival
        FROM k ORDER BY t_days
    """,
    doc="Kaplan-Meier survival curve of user lifetime (first->last "
    "event), with right-censoring: users still active in the final "
    "7 days of the observation window are censored, not churned - "
    "the estimator retention dashboards should use instead of naive "
    "churn rates (naive rates treat censored users as churned and "
    "bias retention DOWN). The product-limit S(t) = prod(1 - d_i/n_i) "
    "is computed as EXP of a running LN-sum window - an ordered "
    "cumulative expression both engines evaluate identically, no "
    "recursion. Plan shape: events collapse to one row per user (one "
    "user-keyed aggregate), the curve algebra runs on the day-level "
    "summary; the unpartitioned window is over |distinct lifetimes| "
    "rows (<= observation days), not the corpus.",
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    obs_end_us = F.unix_micros(F.lit(_KM_OBS_END).cast("timestamp"))
    day_us = 86_400_000_000
    u = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / day_us
            ).alias("lifetime_days"),
            F.when(
                obs_end_us - F.unix_micros(F.max("ts"))
                >= _KM_CENSOR_DAYS * day_us,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    # u feeds the census count AND the grouped branch: lazy checkpoint
    # materialized by the count, so the per-user pass runs once
    u = u.localCheckpoint(eager=False)
    total = u.count()
    g = u.groupBy(F.col("lifetime_days").alias("t")).agg(
        F.sum("churned").alias("d"),
        (F.count("*") - F.sum("churned")).alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.withColumn(
        "n_risk",
        F.lit(total) - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    return k.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.round(
            F.exp(
                F.sum(
                    F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
                ).over(w_cum)
            ),
            6,
        ).alias("survival"),
    ).orderBy("t_days")


@register(
    "q172_ab_conversion_ztest",
    oracle="""
        WITH assign AS (
          SELECT user_id,
                 CASE WHEN (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) + 1.0) / 4294967297.0 < 0.5
                      THEN 'A' ELSE 'B' END AS arm,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= 14
                      THEN 1 ELSE 0 END AS converted
          FROM events GROUP BY user_id
        ),
        s AS (
          SELECT SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
                 SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS conv_a,
                 SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
                 SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS conv_b
          FROM assign
        )
        SELECT CAST(n_a AS BIGINT) AS n_a,
               CAST(conv_a AS BIGINT) AS conv_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(conv_b AS BIGINT) AS conv_b,
               ROUND((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / SQRT((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
        FROM s
    """,
    doc="Two-proportion A/B z-test on purchase conversion (converted = "
    ">= 14 purchases, the near-median engagement threshold, keeping "
    "both proportions interior at every scale), with arms "
    "assigned by the seedless md5(user_id) uniform (the same "
    "hash-randomization q170 samples with - assignment is "
    "reproducible across engines and re-runs, the property a real "
    "experiment framework needs for consistent bucketing). Pooled "
    "standard error, z = (pA-pB)/sqrt(p(1-p)(1/nA+1/nB)). Plan "
    "shape: one user-keyed conversion aggregate, then a single-row "
    "census - all counts are exact integers and the z algebra is "
    "one deterministic double expression at the end.",
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    assign = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("converted")
        )
        .withColumn("arm", F.when(u < 0.5, "A").otherwise("B"))
    )
    s = assign.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0)).alias("conv_b"),
    )
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("conv_a").cast("double") / F.col("n_a")
        - F.col("conv_b").cast("double") / F.col("n_b")
    ) / F.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return s.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(z, 6).alias("z_score"),
    )


@register(
    "q173_theil_sen_trend",
    oracle="""
        WITH d AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
                 SUM(value) AS x
          FROM events GROUP BY event_type, idx
        ),
        slopes AS (
          SELECT a.event_type, (b.x - a.x) / (b.idx - a.idx) AS slope
          FROM d a JOIN d b
            ON a.event_type = b.event_type AND a.idx < b.idx
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
        FROM slopes GROUP BY event_type ORDER BY event_type
    """,
    doc="Theil-Sen robust trend per event type: the MEDIAN of all "
    "pairwise slopes of the daily value series - breakdown point "
    "29%, immune to the outlier days that wreck an OLS slope (the "
    "robust companion to q146's MAD anomalies). Plan shape: events "
    "collapse to one row per (type, day) first; the O(days^2) "
    "pairwise join and exact interpolated median run on that tiny "
    "series (30 days = 435 pairs per type), so corpus cost is the "
    "day-keyed aggregate alone - pairwise-on-the-summary, never "
    "pairwise-on-the-events.",
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = (
        table_parallel(spark, sf, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("idx"),
        )
        .agg(F.sum("value").alias("x"))
        .localCheckpoint(eager=False)
    )
    a, b = d.alias("a"), d.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.idx") < F.col("b.idx")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.x") - F.col("a.x")) / (F.col("b.idx") - F.col("a.idx"))).alias("slope"),
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.percentile("slope", F.lit(0.5)), 6).alias("theil_sen_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "q174_time_weighted_avg",
    oracle="""
        WITH seq AS (
          SELECT user_id, value,
                 date_diff('microsecond', ts,
                           LEAD(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)) AS dur_us
          FROM events
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               ROUND(SUM(value * dur_us) / SUM(dur_us), 6) AS twap
        FROM seq WHERE dur_us IS NOT NULL AND dur_us > 0
        GROUP BY user_id ORDER BY user_id
    """,
    doc="Time-weighted average value per user (TWAP): each event's "
    "value is weighted by how long it remained the latest observation "
    "(duration to the next event), the estimator tick data and "
    "telemetry gauges need - an unweighted mean over-counts bursts "
    "of rapid-fire events. Plan shape: ONE user-keyed window "
    "producing the LEAD duration in the same sort the aggregate "
    "reuses, then a user-keyed SUM - durations are exact integer "
    "microseconds, zero-length intervals dropped.",
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table_parallel(spark, sf, "events").select(
        "user_id",
        "value",
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    )
    return (
        seq.where(F.col("dur_us").isNotNull() & (F.col("dur_us") > 0))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.round(
                F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
            ).alias("twap"),
        )
        .orderBy("user_id")
    )

_SESSION_GAP_MIN = 30  # inactivity gap that closes a session


@register(
    "q183_session_stats",
    oracle=f"""
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN date_diff('microsecond',
                        LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), ts)
                        > {_SESSION_GAP_MIN} * 60000000
                      OR LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sess AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id,
                 ts
          FROM marked
        ),
        stats AS (
          SELECT user_id, session_id,
                 COUNT(*) AS depth,
                 date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us
          FROM sess GROUP BY user_id, session_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bounces,
               CAST(SUM(depth) AS BIGINT) AS n_events,
               CAST(SUM(dur_us) // 60000000 AS BIGINT) AS total_minutes
        FROM stats
    """,
    doc="Gap-based sessionization census (30-min inactivity closes a "
    "session): session count, bounce count (single-event sessions), "
    "event volume, and total engaged minutes — the batch replica of "
    "q28's streaming session windows, via the gaps-and-islands "
    "pattern (new-session marker from LAG, session id from the "
    "running marker sum — the same island technique as q113's SCD2 "
    "intervals). Plan shape: both windows and the session aggregate "
    "share ONE user-keyed sort; per-user state is one timestamp; "
    "the final census is a single-row reduction.",
)
def q183(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.unix_micros(F.lag("ts").over(w))
    marked = table_parallel(spark, sf, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            lag_us.isNull()
            | (F.unix_micros("ts") - lag_us > _SESSION_GAP_MIN * 60_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sess = marked.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    stats = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("depth"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dur_us"
        ),
    )
    return stats.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum(F.when(F.col("depth") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
        F.sum("depth").cast("long").alias("n_events"),
        F.floor(F.sum("dur_us") / 60_000_000).cast("long").alias(
            "total_minutes"
        ),
    )

@register(
    "q184_cohort_ltv",
    oracle="""
        WITH s AS (
          SELECT user_id, MIN(ts) AS signup_ts
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        p AS (
          SELECT e.user_id,
                 date_diff('day', DATE '2024-01-01', CAST(s.signup_ts AS DATE))
                   // 7 AS cohort_week,
                 date_diff('microsecond', s.signup_ts, e.ts)
                   // (7 * 86400000000) AS weeks_since,
                 CAST(ROUND(e.value * 100) AS BIGINT) AS cents
          FROM events e JOIN s USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        ),
        wk AS (
          SELECT cohort_week, weeks_since,
                 SUM(cents) AS rev_cents
          FROM p GROUP BY cohort_week, weeks_since
        )
        SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
               CAST(weeks_since AS BIGINT) AS weeks_since,
               CAST(SUM(rev_cents) OVER (PARTITION BY cohort_week
                                         ORDER BY weeks_since) AS BIGINT)
                 AS cum_rev_cents
        FROM wk ORDER BY cohort_week, weeks_since
    """,
    doc="Cohort lifetime-value curve: purchases attributed to the "
    "user's signup-week cohort, revenue accumulated by "
    "weeks-since-signup — the LTV payback matrix that prices "
    "acquisition spend (read along a row: how fast a cohort's "
    "cumulative revenue grows; down a column: whether newer cohorts "
    "monetize faster). Money is exact integer cents so the "
    "cumulative sums are bit-stable. Plan shape: one user-keyed "
    "signup aggregate joined onto purchases (user-keyed equi join), "
    "one (cohort, week) aggregate, and the running total is a "
    "window over that |cohorts|x|weeks| summary.",
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    week_us = 7 * 86_400_000_000
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") >= F.col("signup_ts"))
        .select(
            F.floor(
                F.datediff(F.to_date("signup_ts"), F.lit("2024-01-01")) / 7
            ).alias("cohort_week"),
            F.floor(
                (F.unix_micros("ts") - F.unix_micros("signup_ts")) / week_us
            ).alias("weeks_since"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    wk = p.groupBy("cohort_week", "weeks_since").agg(
        F.sum("cents").alias("rev_cents")
    )
    w = Window.partitionBy("cohort_week").orderBy("weeks_since")
    return wk.select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("weeks_since").cast("long").alias("weeks_since"),
        F.sum("rev_cents").over(w).cast("long").alias("cum_rev_cents"),
    ).orderBy("cohort_week", "weeks_since")


_RFM_OBS_END = "2024-01-31"


@register(
    "q185_rfm_segments",
    oracle=f"""
        WITH m AS (
          SELECT user_id,
                 date_diff('day', CAST(MAX(ts) AS DATE),
                           DATE '{_RFM_OBS_END}') AS recency_days,
                 COUNT(*) AS frequency,
                 CAST(SUM(ROUND(value * 100)) AS BIGINT) AS monetary_cents
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        q AS (
          SELECT NTILE(5) OVER (ORDER BY recency_days, user_id) AS r_q,
                 NTILE(5) OVER (ORDER BY frequency DESC, user_id) AS f_q,
                 NTILE(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m_q
          FROM m
        )
        SELECT CAST(r_q AS BIGINT) AS r_q,
               CAST(f_q AS BIGINT) AS f_q,
               CAST(m_q AS BIGINT) AS m_q,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM q GROUP BY r_q, f_q, m_q
        ORDER BY r_q, f_q, m_q
    """,
    doc="RFM segmentation census: every purchasing user scored into "
    "recency/frequency/monetary quintiles (NTILE with a user_id "
    "tiebreak so the cut is deterministic — quintile 1 = most "
    "recent / most frequent / highest spend), then censused per "
    "(R,F,M) cell — the classic CRM segmentation grid (at most 125 "
    "cells; the '111' corner is the champions segment). Plan shape: "
    "one user-keyed purchase aggregate; each quintile is the exact "
    "two-phase sharded ntile (dist_rank.with_global_ntile — "
    "quantile shards + broadcast offsets, no single-task window); "
    "the census is a bounded aggregate.",
)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    m = (
        table_parallel(spark, sf, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.lit(_RFM_OBS_END).cast("date"), F.to_date(F.max("ts"))
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("value") * 100)).cast("long").alias(
                "monetary_cents"
            ),
        )
    )
    from harmony_spark.operators.dist_rank import with_global_rank

    # ONE sharded rank pass for all three quintiles: stack the three
    # (metric, value) pairs per user and rank partitioned by metric —
    # replaces three sequential with_global_ntile passes (each paying
    # its own quantile sketch + counts collect + window) with a single
    # sketch/collect/window over 3N rows.  The ntile(5) bucket math is
    # then column arithmetic on (rn, n): first N mod 5 buckets get the
    # extra row, identical to NTILE on both engines.
    stacked = m.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_days").cast("long").alias("v"),
                ),
                F.struct(
                    F.lit("f").alias("metric"),
                    (-F.col("frequency")).cast("long").alias("v"),
                ),
                F.struct(
                    F.lit("m").alias("metric"),
                    (-F.col("monetary_cents")).cast("long").alias("v"),
                ),
            )
        ).alias("s"),
    ).select("user_id", "s.metric", "s.v")
    ranked, _ = with_global_rank(
        stacked,
        "v",
        ("user_id",),
        partition_by=("metric",),
        out="rn",
        count_col="n",
    )
    base = F.expr("n DIV 5")
    rem = F.col("n") % 5
    cut = rem * (base + 1)
    rn = F.col("rn")
    tile = (
        F.when(base == 0, rn)
        .when(rn <= cut, F.expr("(rn + (n DIV 5)) DIV ((n DIV 5) + 1)"))
        .otherwise(rem + F.expr("(rn - (n % 5) * ((n DIV 5) + 1) + (n DIV 5) - 1) DIV (n DIV 5)"))
    )
    q = (
        ranked.withColumn("tile", tile)
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("metric") == "r", F.col("tile"))).alias("r_q"),
            F.max(F.when(F.col("metric") == "f", F.col("tile"))).alias("f_q"),
            F.max(F.when(F.col("metric") == "m", F.col("tile"))).alias("m_q"),
        )
        .select("r_q", "f_q", "m_q")
    )
    return (
        q.groupBy(
            F.col("r_q").cast("long").alias("r_q"),
            F.col("f_q").cast("long").alias("f_q"),
            F.col("m_q").cast("long").alias("m_q"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("r_q", "f_q", "m_q")
    )


@register(
    "q186_repurchase_intervals",
    oracle="""
        WITH p AS (
          SELECT user_id, ts,
                 LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
          FROM events WHERE event_type = 'purchase'
        ),
        d AS (
          SELECT date_diff('microsecond', prev_ts, ts) // 3600000000 AS gap_hours
          FROM p WHERE prev_ts IS NOT NULL
        )
        SELECT LEAST(5, CAST(gap_hours // 24 AS INT)) AS gap_days_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_hours) AS BIGINT) AS min_hours,
               CAST(MAX(gap_hours) AS BIGINT) AS max_hours
        FROM d GROUP BY gap_days_bucket ORDER BY gap_days_bucket
    """,
    doc="Repeat-purchase cadence: the distribution of gaps between a "
    "user's CONSECUTIVE purchases (day buckets, 5+ capped) — the "
    "replenishment-cycle histogram that sets reorder reminders and "
    "churn alarm thresholds (a user 2x past their modal gap is "
    "lapsing); the purchase-to-purchase companion of q157's "
    "view-to-purchase delay. Plan shape: one user-keyed LAG window "
    "over purchases only (events pre-filtered before the shuffle), "
    "then a bounded histogram aggregate; gaps are exact integer "
    "hours.",
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        table_parallel(spark, sf, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.lag("ts").over(w).alias("prev_ts"),
        )
    )
    d = p.where(F.col("prev_ts").isNotNull()).select(
        F.floor(
            (F.unix_micros("ts") - F.unix_micros("prev_ts")) / 3_600_000_000
        ).alias("gap_hours")
    )
    return (
        d.groupBy(
            F.least(F.lit(5), (F.col("gap_hours") / 24).cast("int")).alias(
                "gap_days_bucket"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.min("gap_hours").cast("long").alias("min_hours"),
            F.max("gap_hours").cast("long").alias("max_hours"),
        )
        .orderBy("gap_days_bucket")
    )



@register(
    "q194_value_imputation",
    oracle="""
        WITH nonerr AS (
          SELECT user_id, quantile_cont(value, 0.5) AS user_med
          FROM events WHERE event_type <> 'error' GROUP BY user_id
        ),
        gmed AS (
          SELECT quantile_cont(value, 0.5) AS global_med
          FROM events WHERE event_type <> 'error'
        ),
        imputed AS (
          SELECT COALESCE(n.user_med, g.global_med) AS v
          FROM events e
          LEFT JOIN nonerr n USING (user_id), gmed g
          WHERE e.event_type = 'error'
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_imputed,
               CAST(SUM(CAST(ROUND(v * 10000) AS BIGINT)) AS BIGINT)
                 AS imputed_sum_e4,
               ROUND(MIN(v), 4) AS min_imputed,
               ROUND(MAX(v), 4) AS max_imputed
        FROM imputed
    """,
    doc="Group-statistic imputation: 'error' events' corrupt values "
    "are repaired with the per-user MEDIAN of that user's clean "
    "events, falling back to the global clean median for users with "
    "no clean history — the data-cleaning primitive (median, not "
    "mean: one corrupt whale value would poison a mean-based "
    "repair). Plan shape: one user-keyed exact-percentile aggregate "
    "(|users| rows) left-joined onto the error rows, the global "
    "median a 1-row broadcast fallback; the census output pins the "
    "imputed values (sum in exact integer ten-thousandths - a raw "
    "double sum of interpolated medians straddles rounding "
    "boundaries between engines), not just the count.",
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    clean = ev.where(F.col("event_type") != "error")
    nonerr = clean.groupBy("user_id").agg(
        F.percentile("value", F.lit(0.5)).alias("user_med")
    )
    glob = clean.agg(F.percentile("value", F.lit(0.5)).alias("global_med"))
    imputed = (
        ev.where(F.col("event_type") == "error")
        .join(nonerr, "user_id", "left")
        .crossJoin(F.broadcast(glob))
        .select(F.coalesce("user_med", "global_med").alias("v"))
    )
    return imputed.agg(
        F.count("*").cast("long").alias("n_imputed"),
        F.sum(F.round(F.col("v") * 10000).cast("long"))
        .cast("long")
        .alias("imputed_sum_e4"),
        F.round(F.min("v"), 4).alias("min_imputed"),
        F.round(F.max("v"), 4).alias("max_imputed"),
    )


@register(
    "q195_cusum_changepoint",
    oracle="""
        WITH d AS (
          SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
                 SUM(value) AS x
          FROM events GROUP BY idx
        ),
        c AS (
          SELECT idx,
                 SUM(x - (SELECT AVG(x) FROM d)) OVER (ORDER BY idx) AS cusum
          FROM d
        ),
        r AS (
          SELECT idx, cusum,
                 ROW_NUMBER() OVER (ORDER BY ROUND(ABS(cusum), 6) DESC, idx)
                   AS rk
          FROM c
        )
        SELECT CAST(idx AS BIGINT) AS changepoint_day,
               ROUND(ABS(cusum), 6) AS max_abs_cusum,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days
        FROM r WHERE rk = 1
    """,
    doc="CUSUM change-point detection on the daily value series: the "
    "cumulative sum of deviations from the series mean peaks (in "
    "absolute value) at the most likely level-shift day — the "
    "classic offline change-point locator behind 'when did the "
    "metric actually move', sharper than eyeballing a rolling mean. "
    "The argmax ranks on the ROUNDED |cusum| with a day tiebreak, so "
    "a last-ulp difference between engines cannot flip the selected "
    "day. "
    "Plan shape: events collapse to one row per day in a single "
    "aggregate; the mean, the running CUSUM, and the ranking all "
    "operate on that |days|-row series, so corpus cost is the "
    "day-keyed aggregate alone.",
)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = (
        table_parallel(spark, sf, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("idx")
        )
        .agg(F.sum("value").alias("x"))
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    with_mean = d.select(
        "idx",
        "x",
        F.avg("x").over(w_all).alias("m"),
        F.count("*").over(w_all).alias("n_days"),
    )
    c = with_mean.select(
        "idx",
        "n_days",
        F.sum(F.col("x") - F.col("m")).over(w_cum).alias("cusum"),
    )
    r = c.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc(F.round(F.abs(F.col("cusum")), 6)), "idx")
        ),
    )
    return r.where(F.col("rk") == 1).select(
        F.col("idx").cast("long").alias("changepoint_day"),
        F.round(F.abs(F.col("cusum")), 6).alias("max_abs_cusum"),
        F.col("n_days").cast("long").alias("n_days"),
    )


@register(
    "q198_grouped_ols_trend",
    oracle="""
        WITH d AS (
          SELECT event_type,
                 date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
                 SUM(value) AS y
          FROM events GROUP BY event_type, idx
        ),
        s AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(CAST(idx AS DOUBLE)) AS sx,
                 SUM(y) AS sy,
                 SUM(CAST(idx AS DOUBLE) * idx) AS sxx,
                 SUM(CAST(idx AS DOUBLE) * y) AS sxy,
                 SUM(y * y) AS syy
          FROM d GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept,
               ROUND(POW(n * sxy - sx * sy, 2)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
                 AS r_squared
        FROM s ORDER BY event_type
    """,
    doc="Grouped OLS regression: slope, intercept, and R^2 of each "
    "event type's daily value series from the five closed-form "
    "moment sums (n, Sx, Sy, Sxx, Sxy, Syy) — the standard trend "
    "line q173's Theil-Sen is the robust alternative to; reading "
    "both together separates 'real trend' (both agree) from "
    "'outlier-driven trend' (OLS steep, Theil-Sen flat). Plan "
    "shape: the moments are ONE aggregate over the day-level "
    "series — distributive sums with map-side combine, no second "
    "pass, no collect; the regression algebra is a per-group scalar "
    "expression.",
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    d = (
        table_parallel(spark, sf, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("idx"),
        )
        .agg(F.sum("value").alias("y"))
    )
    x = F.col("idx").cast("double")
    s = d.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            F.pow(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"), 2)
            / (
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("r_squared"),
    ).orderBy("event_type")



@register(
    "q201_psi_drift",
    oracle="""
        WITH half AS (
          SELECT value,
                 CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
                      THEN 0 ELSE 1 END AS h
          FROM events
        ),
        edges AS (
          SELECT quantile_cont(value,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
          FROM half WHERE h = 0
        ),
        binned AS (
          SELECT h,
                 1 + CAST(e[1] < value AS INT) + CAST(e[2] < value AS INT)
                   + CAST(e[3] < value AS INT) + CAST(e[4] < value AS INT)
                   + CAST(e[5] < value AS INT) + CAST(e[6] < value AS INT)
                   + CAST(e[7] < value AS INT) + CAST(e[8] < value AS INT)
                   + CAST(e[9] < value AS INT) AS b
          FROM half, edges
        ),
        shares AS (
          SELECT b,
                 SUM(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS c0,
                 SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS c1
          FROM binned GROUP BY b
        ),
        tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM shares)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
               ROUND(SUM((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                         * LN((CAST(c1 AS DOUBLE) / n1)
                              / (CAST(c0 AS DOUBLE) / n0))), 6) AS psi
        FROM shares, tot
    """,
    doc="Population Stability Index between the first and second half "
    "of the observation window: decile bin edges learned on the "
    "REFERENCE half (exact interpolated quantiles), both halves "
    "binned on those fixed edges, PSI = sum((p1-p0)*ln(p1/p0)) — "
    "the ML-monitoring drift score with the industry thresholds "
    "(<0.1 stable, >0.25 investigate); the binned complement of "
    "q191's KS (which needs no bins but gives no per-bin "
    "attribution). Reference deciles guarantee every bin is "
    "populated on the reference side; ln is guarded by "
    "construction. Plan shape: one quantile aggregate on the "
    "reference half (broadcast 9 edges), one binned census, and "
    "the PSI algebra on 10 rows.",
)
def q201(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    half = table_parallel(spark, sf, "events").select(
        "value",
        F.when(
            F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("h"),
    )
    qs = [i / 10 for i in range(1, 10)]
    edges = half.where(F.col("h") == 0).agg(
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("e")
    )
    b = F.lit(1)
    for i in range(1, 10):
        b = b + F.when(F.element_at("e", i) < F.col("value"), 1).otherwise(0)
    shares = (
        half.crossJoin(F.broadcast(edges))
        .select(b.alias("b"), "h")
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("h") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("c1"),
        )
    )
    w_all = Window.partitionBy()
    rated = shares.select(
        (F.col("c1").cast("double") / F.sum("c1").over(w_all)).alias("p1"),
        (F.col("c0").cast("double") / F.sum("c0").over(w_all)).alias("p0"),
    )
    return rated.agg(
        F.count("*").cast("long").alias("n_bins"),
        F.round(
            F.sum((F.col("p1") - F.col("p0")) * F.log(F.col("p1") / F.col("p0"))),
            6,
        ).alias("psi"),
    )


@register(
    "q202_winsorization",
    oracle="""
        WITH cuts AS (
          SELECT event_type,
                 quantile_cont(value, 0.01) AS lo,
                 quantile_cont(value, 0.99) AS hi
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN e.value < c.lo OR e.value > c.hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               ROUND(AVG(LEAST(GREATEST(e.value, c.lo), c.hi)), 6)
                 AS winsorized_mean,
               ROUND(AVG(e.value), 6) AS raw_mean
        FROM events e JOIN cuts c USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Winsorization census per event type: values clamped to the "
    "[P1, P99] band (exact interpolated percentiles), reporting "
    "clip counts and the winsorized-vs-raw mean gap — the outlier "
    "treatment that keeps every row (unlike trimming) and the "
    "preprocessing step that decides whether a mean-based feature "
    "is usable at all (a large gap = the raw mean is a tail "
    "artifact). Plan shape: one percentile aggregate per type "
    "(|types| rows, broadcast back), then a single clamped census "
    "over the fact — two passes total, the minimum any exact-"
    "percentile treatment needs.",
)
def q202(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("lo"),
        F.percentile("value", F.lit(0.99)).alias("hi"),
    )
    w = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.when(
                    (F.col("value") < F.col("lo"))
                    | (F.col("value") > F.col("hi")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clipped"),
            F.round(F.avg(w), 6).alias("winsorized_mean"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "q209_linear_interpolation",
    oracle="""
        WITH obs AS (
          SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
                 SUM(value) AS x
          FROM events WHERE event_type = 'signup' AND user_id = 3
          GROUP BY idx
        ),
        cal AS (
          SELECT UNNEST(generate_series(
                   (SELECT MIN(idx) FROM obs),
                   (SELECT MAX(idx) FROM obs))) AS idx
        ),
        joined AS (
          SELECT cal.idx, obs.x FROM cal LEFT JOIN obs USING (idx)
        ),
        bracketed AS (
          SELECT idx, x,
                 LAST_VALUE(x IGNORE NULLS) OVER (ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                 LAST_VALUE(CASE WHEN x IS NOT NULL THEN idx END IGNORE NULLS)
                   OVER (ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
                 FIRST_VALUE(x IGNORE NULLS) OVER (ORDER BY idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 FIRST_VALUE(CASE WHEN x IS NOT NULL THEN idx END IGNORE NULLS)
                   OVER (ORDER BY idx
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
          FROM joined
        )
        SELECT CAST(idx AS BIGINT) AS idx,
               ROUND(CASE WHEN x IS NOT NULL THEN x
                          ELSE pv + (nv - pv) * (idx - pi) / (ni - pi)
                     END, 6) AS filled,
               CAST(CASE WHEN x IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS interpolated
        FROM bracketed ORDER BY idx
    """,
    doc="Linear interpolation of missing days in a sparse daily series "
    "(one user's signup value by day): the calendar spine is "
    "generated, observed days join on, and each gap day is bracketed "
    "by carry-forward (last observed) and carry-backward (next "
    "observed) windows, then filled on the straight line between "
    "them — the resample-and-interpolate step time-series feature "
    "pipelines need where q74's forward fill would flatten trends. "
    "Bracketing windows run in ONE sort each direction with "
    "IGNORE NULLS carries; edges inside [first, last] are always "
    "bracketed by construction. Plan shape: the corpus collapses to "
    "the day-level series first; everything else is spine-sized.",
)
def q209(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    obs = (
        table_parallel(spark, sf, "events")
        .where((F.col("event_type") == "signup") & (F.col("user_id") == 3))
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("idx")
        )
        .agg(F.sum("value").alias("x"))
        .localCheckpoint(eager=False)
    )
    bounds = obs.agg(
        F.min("idx").alias("lo"), F.max("idx").alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("idx")
    )
    joined = cal.join(obs, "idx", "left")
    w_fwd = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    w_bwd = Window.orderBy("idx").rowsBetween(0, Window.unboundedFollowing)
    obs_idx = F.when(F.col("x").isNotNull(), F.col("idx"))
    bracketed = joined.select(
        "idx",
        "x",
        F.last("x", ignorenulls=True).over(w_fwd).alias("pv"),
        F.last(obs_idx, ignorenulls=True).over(w_fwd).alias("pi"),
        F.first("x", ignorenulls=True).over(w_bwd).alias("nv"),
        F.first(obs_idx, ignorenulls=True).over(w_bwd).alias("ni"),
    )
    filled = F.when(F.col("x").isNotNull(), F.col("x")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * (F.col("idx") - F.col("pi"))
        / (F.col("ni") - F.col("pi"))
    )
    return bracketed.select(
        F.col("idx").cast("long").alias("idx"),
        F.round(filled, 6).alias("filled"),
        F.when(F.col("x").isNull(), 1).otherwise(0).cast("long").alias(
            "interpolated"
        ),
    ).orderBy("idx")

@register(
    "q210_decile_lift",
    oracle="""
        WITH u AS (
          SELECT user_id,
                 SUM(value) AS score,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= 14
                      THEN 1 ELSE 0 END AS label
          FROM events GROUP BY user_id
        ),
        d AS (
          SELECT label,
                 NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
          FROM u
        ),
        g AS (
          SELECT decile,
                 COUNT(*) AS n_users,
                 SUM(label) AS n_pos
          FROM d GROUP BY decile
        ),
        t AS (SELECT SUM(n_users) AS n, SUM(n_pos) AS pos FROM g)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(n_users AS BIGINT) AS n_users,
               CAST(n_pos AS BIGINT) AS n_pos,
               ROUND((CAST(n_pos AS DOUBLE) / n_users)
                     / (CAST(t.pos AS DOUBLE) / t.n), 6) AS lift,
               ROUND(CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE)
                     / t.pos, 6) AS cum_gain
        FROM g, t ORDER BY decile
    """,
    doc="Decile lift/gains table: users ranked by a score (total event "
    "value) into deterministic NTILE deciles, each reporting its "
    "positive rate relative to the base rate (LIFT) and the "
    "cumulative share of all positives captured so far (GAINS) — "
    "the campaign-targeting readout that complements q148's AUC "
    "(rank quality as one number) and q149's calibration "
    "(probability quality): lift says WHERE in the ranking the "
    "model earns its keep, the first thing a marketing or triage "
    "consumer asks. Counts exact; one double division per cell. "
    "Plan shape: one user-keyed aggregate, decile assignment via "
    "the exact two-phase sharded ntile (dist_rank.with_global_"
    "ntile — no single-task window), a 10-row census.",
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    u = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.sum("value").alias("score"),
            F.when(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14,
                1,
            )
            .otherwise(0)
            .alias("label"),
        )
    )
    from harmony_spark.operators.dist_rank import with_global_ntile

    d = with_global_ntile(
        u.withColumn("negscore", -F.col("score")),
        "negscore",
        ("user_id",),
        n=10,
        out="decile",
    ).select("label", "decile")
    g = d.groupBy("decile").agg(
        F.count("*").alias("n_users"), F.sum("label").alias("n_pos")
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n_users"))
            / (
                F.sum("n_pos").over(w_all).cast("double")
                / F.sum("n_users").over(w_all)
            ),
            6,
        ).alias("lift"),
        F.round(
            F.sum("n_pos").over(w_cum).cast("double")
            / F.sum("n_pos").over(w_all),
            6,
        ).alias("cum_gain"),
    ).orderBy("decile")


@register(
    "q296_mom_yoy_growth",
    oracle="""
        WITH m AS (
          SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders GROUP BY month
        ),
        lagged AS (
          SELECT month, cents,
                 LAG(cents) OVER (ORDER BY month) AS prev_m,
                 LAG(cents, 12) OVER (ORDER BY month) AS prev_y
          FROM m
        )
        SELECT strftime(month, '%Y-%m') AS month,
               cents,
               CAST(cents - prev_m AS BIGINT) AS mom_delta,
               ROUND(CAST(cents AS DOUBLE) / prev_m - 1, 6) AS mom_growth,
               ROUND(CAST(cents AS DOUBLE) / prev_y - 1, 6) AS yoy_growth
        FROM lagged
        WHERE prev_y IS NOT NULL
        ORDER BY month
    """,
    doc="Month-over-month and year-over-year revenue growth: the "
    "period-comparison census every business dashboard leads with — "
    "MoM delta/growth from LAG(1), YoY growth from LAG(12) on the "
    "calendar month census (the 12-step lag compares like-for-like "
    "months, immune to the seasonality that makes raw MoM "
    "misleading — the reporting-side complement of q237's seasonal "
    "decomposition). Exact integer cents; one double division per "
    "comparison; months without a 12-back comparator are dropped so "
    "every emitted row has both comparisons (numeric NULLs break the "
    "driver's pandas canonicalization). Plan "
    "shape: one month-keyed aggregate collapses orders to a "
    "CALENDAR-BOUNDED census; the LAG windows run on that tiny "
    "series (allowlisted bounded global window).",
)
def q296(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    m = (
        table_parallel(spark, sf, "orders")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("month")
    lagged = m.select(
        "month",
        "cents",
        F.lag("cents").over(w).alias("prev_m"),
        F.lag("cents", 12).over(w).alias("prev_y"),
    )
    return (
        lagged.where(F.col("prev_y").isNotNull())
        .select(
            F.date_format("month", "yyyy-MM").alias("month"),
            "cents",
            (F.col("cents") - F.col("prev_m")).cast("long").alias(
                "mom_delta"
            ),
            F.round(
                F.col("cents").cast("double") / F.col("prev_m") - 1, 6
            ).alias("mom_growth"),
            F.round(
                F.col("cents").cast("double") / F.col("prev_y") - 1, 6
            ).alias("yoy_growth"),
        )
        .orderBy("month")
    )


@register(
    "q309_nelson_aalen",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 date_diff('microsecond', MIN(ts), MAX(ts)) // 86400000000
                   AS lifetime_days,
                 CASE WHEN date_diff('microsecond', MAX(ts),
                                     TIMESTAMP '{_KM_OBS_END} 00:00:00')
                           >= {_KM_CENSOR_DAYS} * 86400000000
                      THEN 1 ELSE 0 END AS churned
          FROM events GROUP BY user_id
        ),
        g AS (
          SELECT lifetime_days AS t,
                 SUM(churned) AS d,
                 COUNT(*) - SUM(churned) AS c
          FROM u GROUP BY lifetime_days
        ),
        k AS (
          SELECT t, d, c,
                 (SELECT COUNT(*) FROM u)
                   - COALESCE(SUM(d + c) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM g
        )
        SELECT CAST(t AS BIGINT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(d AS BIGINT) AS n_churned,
               ROUND(SUM(CAST(d AS DOUBLE) / n_risk) OVER (ORDER BY t), 6)
                 AS cum_hazard,
               ROUND(SUM(CAST(d AS DOUBLE)
                         / (CAST(n_risk AS DOUBLE) * n_risk))
                     OVER (ORDER BY t), 6) AS hazard_var
        FROM k ORDER BY t_days
    """,
    doc="Nelson-Aalen cumulative-hazard estimator on the same "
    "right-censored user-lifetime construction as q171's Kaplan-"
    "Meier (active in the final 7 days => censored): H(t) = "
    "sum_{{s<=t}} d_s/n_s with its variance sum d_s/n_s^2 — the "
    "additive-hazard twin of KM's product-limit survival, preferred "
    "when hazards are the modeling target (H = -log S only "
    "asymptotically; NA is unbiased for H directly and is the "
    "building block of Cox-model diagnostics). Plan shape: "
    "identical to q171 — one user-keyed aggregate collapses events "
    "to a distinct-lifetime-day census, the cumulative windows run "
    "on that calendar-bounded series (allowlisted).",
)
def q309(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    obs_end_us = F.unix_micros(F.lit(_KM_OBS_END).cast("timestamp"))
    day_us = 86_400_000_000
    u = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / day_us
            ).alias("lifetime_days"),
            F.when(
                obs_end_us - F.unix_micros(F.max("ts"))
                >= _KM_CENSOR_DAYS * day_us,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    u = u.localCheckpoint(eager=False)
    total = u.count()
    g = u.groupBy(F.col("lifetime_days").alias("t")).agg(
        F.sum("churned").alias("d"),
        (F.count("*") - F.sum("churned")).alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    k = g.withColumn(
        "n_risk",
        F.lit(total)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    return k.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_churned"),
        F.round(
            F.sum(F.col("d").cast("double") / F.col("n_risk")).over(w_cum), 6
        ).alias("cum_hazard"),
        F.round(
            F.sum(
                F.col("d").cast("double")
                / (F.col("n_risk").cast("double") * F.col("n_risk"))
            ).over(w_cum),
            6,
        ).alias("hazard_var"),
    ).orderBy("t_days")


@register(
    "q310_ushape_attribution",
    oracle="""
        WITH conv AS (
          SELECT user_id, MIN(ts) AS first_purchase
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        touches AS (
          SELECT e.user_id, e.event_type,
                 ROW_NUMBER() OVER (PARTITION BY e.user_id
                                    ORDER BY e.ts, e.event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY e.user_id) AS k
          FROM events e JOIN conv c ON c.user_id = e.user_id
          WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
        ),
        credited AS (
          SELECT event_type,
                 CASE WHEN k = 1 THEN 1.0
                      WHEN k = 2 THEN 0.5
                      WHEN rn = 1 OR rn = k THEN 0.4
                      ELSE 0.2 / (k - 2) END AS credit
          FROM touches
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               ROUND(SUM(credit), 6) AS credit
        FROM credited GROUP BY event_type ORDER BY event_type
    """,
    doc="U-shaped (position-based 40/20/40) multi-touch attribution: "
    "each converting user's pre-conversion touches credit 40% to "
    "the first touch, 40% to the last, and the remaining 20% split "
    "across the middle (degenerating to 1.0 / 0.5-0.5 for 1- and "
    "2-touch journeys), summed per channel — the position-based "
    "alternative to q162's linear model, encoding the marketing "
    "prior that introduction and closing touches matter most. "
    "Per-user credits always sum to 1, so total credit equals the "
    "converting-user count (a built-in invariant the oracle "
    "replays). Plan shape: conversion census joined back, both "
    "windows PARTITIONED BY user_id (per-key parallel at any "
    "scale), one channel aggregate.",
)
def q310(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wk = Window.partitionBy("user_id")
    touches = (
        ev.join(conv, "user_id")
        .where(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wk).alias("k"),
        )
    )
    credit = (
        F.when(F.col("k") == 1, 1.0)
        .when(F.col("k") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("k")), 0.4)
        .otherwise(0.2 / (F.col("k") - 2))
    )
    return (
        touches.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(F.sum("credit"), 6).alias("credit"),
        )
        .orderBy("event_type")
    )


@register(
    "q315_logrank_test",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CASE WHEN (CAST(('0x' || substr(md5(CAST(user_id
                                  AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                           / 4294967297.0 < 0.5
                      THEN 1 ELSE 0 END AS grp,
                 date_diff('microsecond', MIN(ts), MAX(ts)) // 86400000000
                   AS t,
                 CASE WHEN date_diff('microsecond', MAX(ts),
                                     TIMESTAMP '{_KM_OBS_END} 00:00:00')
                           >= {_KM_CENSOR_DAYS} * 86400000000
                      THEN 1 ELSE 0 END AS churned
          FROM events GROUP BY user_id
        ),
        g AS (
          SELECT t,
                 SUM(CASE WHEN grp = 1 THEN churned ELSE 0 END) AS d1,
                 SUM(churned) AS d,
                 SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS m1,
                 COUNT(*) AS m
          FROM u GROUP BY t
        ),
        k AS (
          SELECT t, d1, d,
                 (SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) FROM u)
                   - COALESCE(SUM(m1) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n1,
                 (SELECT COUNT(*) FROM u)
                   - COALESCE(SUM(m) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n
          FROM g
        ),
        s AS (
          SELECT SUM(d1) AS o1,
                 SUM(d * n1 * 1.0 / n) AS e1,
                 SUM(CASE WHEN n > 1
                          THEN d * (n1 * 1.0 / n) * (1 - n1 * 1.0 / n)
                               * (n - d) / (n - 1.0)
                          ELSE 0 END) AS v
          FROM k WHERE d > 0
        )
        SELECT CAST(COALESCE(o1, 0) AS BIGINT) AS observed_a,
               ROUND(COALESCE(e1, 0), 6) AS expected_a,
               ROUND(CASE WHEN COALESCE(v, 0) > 0
                          THEN POW(o1 - e1, 2) / v ELSE 0 END, 6)
                 AS logrank_chi2
        FROM s
    """,
    doc="Log-rank test comparing the two md5-hash arms' survival on "
    "the q171/q309 right-censored lifetime construction: at each "
    "event day the hypergeometric expectation e1 = d*n1/n and "
    "variance d*(n1/n)(1-n1/n)(n-d)/(n-1) accumulate into chi2 = "
    "(O1-E1)^2/V — the standard whole-curve significance test that "
    "completes the survival family (q171 KM estimates the curves, "
    "q309 NA the hazards, q315 decides whether they DIFFER), "
    "weighting every event day equally rather than comparing one "
    "arbitrary horizon like a fixed-day z-test. Degenerate no-event "
    "inputs report zeros (COALESCE on both sides). Plan shape: "
    "user-keyed aggregate -> day census -> at-risk windows on the "
    "calendar-bounded census (allowlisted) -> 1-row reduce; the "
    "2-value group totals collect to the driver like q171's.",
)
def q315(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    obs_end_us = F.unix_micros(F.lit(_KM_OBS_END).cast("timestamp"))
    day_us = 86_400_000_000
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    u = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / day_us
            ).alias("t"),
            F.when(
                obs_end_us - F.unix_micros(F.max("ts"))
                >= _KM_CENSOR_DAYS * day_us,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
        .withColumn("grp", F.when(arm < 0.5, 1).otherwise(0))
    )
    tot = u.agg(
        F.sum("grp").alias("tot1"), F.count("*").alias("totn")
    ).collect()[0]
    g = u.groupBy("t").agg(
        F.sum(F.when(F.col("grp") == 1, F.col("churned")).otherwise(0)).alias(
            "d1"
        ),
        F.sum("churned").alias("d"),
        F.sum("grp").alias("m1"),
        F.count("*").alias("m"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    k = g.select(
        "t",
        "d1",
        "d",
        (
            F.lit(tot["tot1"]) - F.coalesce(F.sum("m1").over(w_prev), F.lit(0))
        ).alias("n1"),
        (
            F.lit(tot["totn"]) - F.coalesce(F.sum("m").over(w_prev), F.lit(0))
        ).alias("n"),
    ).where(F.col("d") > 0)
    frac = F.col("n1") * 1.0 / F.col("n")
    s = k.agg(
        F.sum("d1").alias("o1"),
        F.sum(F.col("d") * frac).alias("e1"),
        F.sum(
            F.when(
                F.col("n") > 1,
                F.col("d")
                * frac
                * (1 - frac)
                * (F.col("n") - F.col("d"))
                / (F.col("n") - 1.0),
            ).otherwise(0.0)
        ).alias("v"),
    )
    return s.select(
        F.coalesce(F.col("o1"), F.lit(0)).cast("long").alias("observed_a"),
        F.round(F.coalesce(F.col("e1"), F.lit(0.0)), 6).alias("expected_a"),
        F.round(
            F.when(
                F.coalesce(F.col("v"), F.lit(0.0)) > 0,
                F.pow(F.col("o1") - F.col("e1"), 2) / F.col("v"),
            ).otherwise(0.0),
            6,
        ).alias("logrank_chi2"),
    )


_MK_CHANNELS = ["click", "error", "signup", "view"]
_MK_STEPS = 12


def _mk_trans_sql() -> str:
    """Transition census from per-user journeys truncated at the first
    purchase: start->first touch, touch->touch, last touch->conv/null."""
    return """
        seqd AS (
          SELECT user_id, event_type, ts, event_id,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER (PARTITION BY user_id) AS conv_ts
          FROM events
        ),
        pre AS (
          SELECT user_id, event_type, ts, event_id,
                 conv_ts IS NOT NULL AS converted
          FROM seqd
          WHERE event_type <> 'purchase'
            AND (conv_ts IS NULL OR ts < conv_ts)
        ),
        hops AS (
          SELECT user_id, event_type AS src,
                 COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id),
                          CASE WHEN converted THEN 'conv'
                               ELSE 'null' END) AS dst,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM pre
        ),
        starts AS (
          SELECT 'start' AS src, src AS dst FROM hops WHERE rn = 1
        ),
        alltrans AS (
          SELECT src, dst FROM hops
          UNION ALL SELECT src, dst FROM starts
        ),
        census AS (
          SELECT src, dst, COUNT(*) AS c FROM alltrans GROUP BY src, dst
        ),
        rowsum AS (SELECT src, SUM(c) AS n FROM census GROUP BY src),
        pmat AS MATERIALIZED (
          SELECT census.src AS src, census.dst AS dst,
                 census.c * 1.0 / rowsum.n AS prob
          FROM census JOIN rowsum ON rowsum.src = census.src
        )"""


def _mk_chain_sql(tag: str, removed: str | None) -> str:
    """Unrolled absorbing-chain iteration v_{t+1} = P v_t for one
    transition matrix; removal redirects edges into `removed` to null.
    MATERIALIZED is load-bearing: without it DuckDB re-inlines the
    CTE chain and the 12-step unroll goes exponential (~300 s)."""
    if removed is None:
        pm = f"pm_{tag} AS MATERIALIZED (SELECT src, dst, prob FROM pmat)"
    else:
        pm = f"""pm_{tag} AS MATERIALIZED (
          SELECT src,
                 CASE WHEN dst = '{removed}' THEN 'null' ELSE dst END AS dst,
                 prob
          FROM pmat WHERE src <> '{removed}'
        )"""
    steps = [
        pm,
        f"""v_{tag}_0 AS MATERIALIZED (
          SELECT 'conv' AS s, 1.0 AS v
          UNION ALL SELECT 'null', 0.0
        )""",
    ]
    for t in range(_MK_STEPS):
        steps.append(
            f"""v_{tag}_{t + 1} AS MATERIALIZED (
          SELECT p.src AS s, SUM(p.prob * COALESCE(v.v,
                 CASE WHEN p.dst = 'conv' THEN 1.0 ELSE 0.0 END)) AS v
          FROM pm_{tag} p LEFT JOIN v_{tag}_{t} v ON v.s = p.dst
          WHERE p.src NOT IN ('conv', 'null')
          GROUP BY p.src
          UNION ALL SELECT 'conv', 1.0
          UNION ALL SELECT 'null', 0.0
        )"""
        )
    return ",\n        ".join(steps)


def _mk_oracle() -> str:
    chains = [_mk_chain_sql("full", None)]
    for ch in _MK_CHANNELS:
        chains.append(_mk_chain_sql(ch, ch))
    finals = ",\n        ".join(
        f"""p_{tag} AS (
          SELECT COALESCE((SELECT v FROM v_{tag}_{_MK_STEPS}
                           WHERE s = 'start'), 0.0) AS p)"""
        for tag in ["full"] + _MK_CHANNELS
    )
    effects = " UNION ALL ".join(
        f"SELECT '{ch}' AS channel, "
        f"(SELECT p FROM p_full) - (SELECT p FROM p_{ch}) AS eff"
        for ch in _MK_CHANNELS
    )
    return f"""
        WITH {_mk_trans_sql()},
        {",".join(chains)},
        {finals},
        eff AS ({effects}),
        tot AS (SELECT SUM(CASE WHEN eff > 0 THEN eff ELSE 0 END) AS t
                FROM eff)
        SELECT channel,
               ROUND((SELECT p FROM p_full), 6) AS p_conversion,
               ROUND(eff, 6) AS removal_effect,
               ROUND(CASE WHEN (SELECT t FROM tot) > 0
                          THEN (CASE WHEN eff > 0 THEN eff ELSE 0 END)
                               / (SELECT t FROM tot)
                          ELSE 0 END, 6) AS attribution_share
        FROM eff ORDER BY channel
    """


@register(
    "q323_markov_attribution",
    oracle=_mk_oracle(),
    doc=f"Markov removal-effect attribution: per-user journeys "
    "(truncated at first purchase, absorbed into conv/null) collapse "
    "to a first-order transition matrix; the conversion probability "
    f"from 'start' comes from {_MK_STEPS} absorbing-chain power steps, "
    "and each channel's credit is its REMOVAL EFFECT — how much "
    "p(conversion) drops when that channel's incoming edges are "
    "redirected to null — normalized into attribution shares. This "
    "is the data-driven attribution model that, unlike the "
    "positional heuristics (q162 linear, q310 U-shaped), credits a "
    "channel by its causal role IN THE OBSERVED GRAPH: a channel "
    "visited often but always bypassable earns little. Plan shape: "
    "one user-partitioned LEAD window builds the hop census "
    "(entity-scale work, key-parallel); everything after operates "
    "on the <=7x7 transition census collected to the driver — the "
    "bounded-K state pattern the harmony core uses — and the "
    "fixed-order Python float iteration matches the oracle's "
    "unrolled CTE arithmetic exactly.",
)
def q323(spark: SparkSession, sf: str) -> DataFrame:
    from collections import defaultdict

    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    wconv = Window.partitionBy("user_id")
    seqd = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(wconv)
        .alias("conv_ts"),
    )
    pre = seqd.where(
        (F.col("event_type") != "purchase")
        & (F.col("conv_ts").isNull() | (F.col("ts") < F.col("conv_ts")))
    ).withColumn("converted", F.col("conv_ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pre.select(
        F.col("event_type").alias("src"),
        F.coalesce(
            F.lead("event_type").over(w),
            F.when(F.col("converted"), "conv").otherwise("null"),
        ).alias("dst"),
        F.row_number().over(w).alias("rn"),
    )
    starts = hops.where(F.col("rn") == 1).select(
        F.lit("start").alias("src"), F.col("src").alias("dst")
    )
    census = (
        hops.select("src", "dst")
        .unionByName(starts)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    rowsum: dict = defaultdict(int)
    for r in census:
        rowsum[r["src"]] += r["c"]
    pmat: dict = {}
    for r in census:
        pmat[(r["src"], r["dst"])] = r["c"] * 1.0 / rowsum[r["src"]]

    def absorb(removed: str | None) -> float:
        edges: dict = defaultdict(float)
        for (s, d), p in sorted(pmat.items()):
            if removed is not None and s == removed:
                continue
            if removed is not None and d == removed:
                d = "null"
            edges[(s, d)] += p
        v = {"conv": 1.0, "null": 0.0}
        for _ in range(_MK_STEPS):
            acc: dict = defaultdict(float)
            for (s, d), p in sorted(edges.items()):
                if s in ("conv", "null"):
                    continue
                acc[s] += p * v.get(d, 1.0 if d == "conv" else 0.0)
            nxt = {"conv": 1.0, "null": 0.0}
            nxt.update(acc)
            v = nxt
        return v.get("start", 0.0)

    p_full = absorb(None)
    effs = {ch: p_full - absorb(ch) for ch in _MK_CHANNELS}
    tot = sum(e for e in effs.values() if e > 0)
    rows = []
    for ch in _MK_CHANNELS:
        share = (max(effs[ch], 0.0) / tot) if tot > 0 else 0.0
        rows.append(
            (ch, round(p_full, 6), round(effs[ch], 6), round(share, 6))
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_conversion double, removal_effect double, "
        "attribution_share double",
    ).orderBy("channel")


_TD_TAU_S = 7 * 86400.0


@register(
    "q328_timedecay_attribution",
    oracle=f"""
        WITH conv AS (
          SELECT user_id, MIN(ts) AS first_purchase
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        touches AS (
          SELECT e.user_id, e.event_type,
                 EXP(-date_diff('microsecond', e.ts, c.first_purchase)
                     / 1000000.0 / {_TD_TAU_S}) AS wgt
          FROM events e JOIN conv c ON c.user_id = e.user_id
          WHERE e.ts < c.first_purchase AND e.event_type <> 'purchase'
        ),
        usum AS (
          SELECT user_id, SUM(wgt) AS tot FROM touches GROUP BY user_id
        )
        SELECT t.event_type AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               ROUND(SUM(t.wgt / u.tot), 6) AS credit
        FROM touches t JOIN usum u ON u.user_id = t.user_id
        GROUP BY t.event_type ORDER BY t.event_type
    """,
    doc="Time-decay multi-touch attribution (7-day half-life scale): "
    "each pre-conversion touch earns weight exp(-dt/tau) by its "
    "recency to the user's first purchase, normalized so every "
    "converting journey distributes exactly 1 credit — the third "
    "heuristic in the attribution family (q162 linear = equal "
    "weights, q310 U-shaped = positional prior, q328 = recency "
    "prior, q323 Markov = data-driven), the one retail dashboards "
    "default to because recent touches dominate purchase intent. "
    "Per-journey credits summing to 1 means total credit equals the "
    "converting-user count, the same invariant as q310. Plan shape: "
    "conversion census joined back, per-user weight-sum aggregate "
    "joined back (both user-keyed, per-key parallel), one channel "
    "census; exp() is per-row arithmetic both engines evaluate "
    "identically.",
)
def q328(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    touches = (
        ev.join(conv, "user_id")
        .where(
            (F.col("ts") < F.col("first_purchase"))
            & (F.col("event_type") != "purchase")
        )
        .select(
            "user_id",
            "event_type",
            F.exp(
                -(F.unix_micros("first_purchase") - F.unix_micros("ts"))
                / 1000000.0
                / _TD_TAU_S
            ).alias("wgt"),
        )
    )
    usum = touches.groupBy("user_id").agg(F.sum("wgt").alias("tot"))
    return (
        touches.join(usum, "user_id")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.round(F.sum(F.col("wgt") / F.col("tot")), 6).alias("credit"),
        )
        .orderBy("event_type")
    )


@register(
    "q332_smr_standardization",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 CASE WHEN (CAST(('0x' || substr(md5(CAST(user_id
                                  AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                           / 4294967297.0 < 0.5
                      THEN 'A' ELSE 'B' END AS cohort,
                 date_diff('microsecond', MIN(ts), MAX(ts))
                   // (7 * 86400000000) AS tenure_wk,
                 CASE WHEN date_diff('microsecond', MAX(ts),
                                     TIMESTAMP '{_KM_OBS_END} 00:00:00')
                           >= {_KM_CENSOR_DAYS} * 86400000000
                      THEN 1 ELSE 0 END AS churned
          FROM events GROUP BY user_id
        ),
        strata AS (
          SELECT tenure_wk, AVG(CAST(churned AS DOUBLE)) AS global_rate
          FROM u GROUP BY tenure_wk
        ),
        coh AS (
          SELECT c.cohort,
                 COUNT(*) AS n_users,
                 SUM(c.churned) AS observed,
                 SUM(s.global_rate) AS expected
          FROM u c JOIN strata s ON s.tenure_wk = c.tenure_wk
          GROUP BY c.cohort
        )
        SELECT cohort,
               CAST(n_users AS BIGINT) AS n_users,
               CAST(observed AS BIGINT) AS observed_churn,
               ROUND(expected, 6) AS expected_churn,
               ROUND(CASE WHEN expected > 0 THEN observed / expected
                          ELSE 0 END, 6) AS smr
        FROM coh ORDER BY cohort
    """,
    doc="Indirectly-standardized churn ratio (the epidemiologists' "
    "SMR applied to retention): each cohort's expected churn is the "
    "sum of GLOBAL per-tenure-week rates over its own tenure mix, "
    "and SMR = observed/expected — the adjustment that separates "
    "'this cohort churns more' from 'this cohort is just newer' "
    "(raw churn-rate comparisons q153/q119 cannot distinguish the "
    "two when tenure mixes differ; Simpson's paradox in time). "
    "Same censored-churn construction as q171/q309/q315. Plan "
    "shape: one user census, a tenure-week stratum table broadcast "
    "back, one 2-row cohort reduce; deterministic per-stratum "
    "rates, guarded ratio.",
)
def q332(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 1.0
    ) / 4294967297.0
    obs_end_us = F.unix_micros(F.lit(_KM_OBS_END).cast("timestamp"))
    day_us = 86_400_000_000
    u = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / (7 * day_us)
            ).alias("tenure_wk"),
            F.when(
                obs_end_us - F.unix_micros(F.max("ts"))
                >= _KM_CENSOR_DAYS * day_us,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
        .withColumn("cohort", F.when(arm < 0.5, "A").otherwise("B"))
    )
    strata = u.groupBy("tenure_wk").agg(
        F.avg(F.col("churned").cast("double")).alias("global_rate")
    )
    coh = (
        u.join(F.broadcast(strata), "tenure_wk")
        .groupBy("cohort")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("churned").alias("observed"),
            F.sum("global_rate").alias("expected"),
        )
    )
    return coh.select(
        "cohort",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("observed").cast("long").alias("observed_churn"),
        F.round("expected", 6).alias("expected_churn"),
        F.round(
            F.when(
                F.col("expected") > 0, F.col("observed") / F.col("expected")
            ).otherwise(0.0),
            6,
        ).alias("smr"),
    ).orderBy("cohort")


@register(
    "q334_customer_alive",
    oracle="""
        WITH u AS (
          SELECT user_id,
                 COUNT(*) AS k,
                 date_diff('microsecond', MAX(ts),
                           TIMESTAMP '2024-01-31 00:00:00') // 86400000000
                   AS recency_d,
                 date_diff('microsecond', MIN(ts), MAX(ts)) // 86400000000
                   AS span_d
          FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        rate AS (
          SELECT user_id, k, recency_d,
                 CASE WHEN span_d > 0 THEN (k - 1.0) / span_d ELSE 0 END
                   AS lam
          FROM u
        ),
        scored AS (
          SELECT user_id, k, recency_d,
                 CASE WHEN lam > 0 THEN EXP(-lam * recency_d) ELSE 1.0 END
                   AS p_alive
          FROM rate
        ),
        bucketed AS (
          SELECT CAST(LEAST(FLOOR(p_alive * 10), 9) AS BIGINT) AS decile,
                 p_alive, k
          FROM scored
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(AVG(p_alive), 6) AS mean_p_alive,
               ROUND(AVG(k * 1.0), 6) AS mean_purchases
        FROM bucketed GROUP BY decile ORDER BY decile
    """,
    doc="Customer-alive probability under the exponential-recency "
    "heuristic (the closed-form BG/NBD stand-in a warehouse can "
    "compute in one pass): each purchaser's individual rate lambda "
    "= (k-1)/span from their own history, P(alive) = exp(-lambda * "
    "recency) — a frequent buyer gone quiet for a week scores LOWER "
    "than a yearly buyer gone quiet for a month, which recency-only "
    "cuts (q185 RFM's R quintile) invert. Reported as the decile "
    "census with mean purchase counts (the CRM targeting table). "
    "Plan shape: one purchase-keyed user aggregate, row-local "
    "arithmetic, one bounded decile census; exp() evaluated "
    "identically by both engines.",
)
def q334(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    day_us = 86_400_000_000
    obs = F.unix_micros(F.lit("2024-01-31 00:00:00").cast("timestamp"))
    u = (
        table_parallel(spark, sf, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("k"),
            F.floor((obs - F.unix_micros(F.max("ts"))) / day_us).alias(
                "recency_d"
            ),
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / day_us
            ).alias("span_d"),
        )
    )
    lam = F.when(
        F.col("span_d") > 0, (F.col("k") - 1.0) / F.col("span_d")
    ).otherwise(0.0)
    p_alive = F.when(lam > 0, F.exp(-lam * F.col("recency_d"))).otherwise(1.0)
    scored = u.select("k", p_alive.alias("p_alive"))
    return (
        scored.select(
            F.least(F.floor(F.col("p_alive") * 10), F.lit(9))
            .cast("long")
            .alias("decile"),
            "p_alive",
            "k",
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.round(F.avg("p_alive"), 6).alias("mean_p_alive"),
            F.round(F.avg(F.col("k") * 1.0), 6).alias("mean_purchases"),
        )
        .orderBy("decile")
    )


_WF_WINDOW_H = 72


@register(
    "q337_window_funnel",
    oracle=f"""
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN s1 ON s1.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
            AND date_diff('microsecond', s1.t1, e.ts)
                <= {_WF_WINDOW_H} * 3600000000
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN s2 ON s2.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            AND date_diff('microsecond', s2.t2, e.ts)
                <= {_WF_WINDOW_H} * 3600000000
          GROUP BY e.user_id
        ),
        lv AS (
          SELECT u.user_id,
                 CASE WHEN s3.user_id IS NOT NULL THEN 3
                      WHEN s2.user_id IS NOT NULL THEN 2
                      WHEN s1.user_id IS NOT NULL THEN 1
                      ELSE 0 END AS level
          FROM (SELECT DISTINCT user_id FROM events) u
          LEFT JOIN s1 ON s1.user_id = u.user_id
          LEFT JOIN s2 ON s2.user_id = u.user_id
          LEFT JOIN s3 ON s3.user_id = u.user_id
        )
        SELECT CAST(level AS BIGINT) AS level,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM lv GROUP BY level ORDER BY level
    """,
    doc="Deadline-constrained funnel (ClickHouse windowFunnel "
    "semantics): view -> click -> purchase where EACH step must land "
    "within 72 h of the previous step's first completion — the "
    "campaign-attribution cut that q161's unconstrained ordered "
    "funnel overstates (a click three weeks after the view still "
    "counts there; a deadline funnel says the journey went cold). "
    "Greedy earliest-completion per step; reported as the level "
    "census (0..3). Plan shape: three user-keyed min-aggregates "
    "chained by key-partitioned joins (no per-event window state), "
    "then a 4-row census — each stage's table shrinks, so the chain "
    "costs three small shuffles at any scale.",
)
def q337(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    win_us = _WF_WINDOW_H * 3_600_000_000
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.unix_micros("ts") - F.unix_micros("t1") <= win_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.unix_micros("ts") - F.unix_micros("t2") <= win_us)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    users = ev.select("user_id").distinct()
    lv = (
        users.join(
            s1.select("user_id", F.lit(1).alias("l1")), "user_id", "left"
        )
        .join(s2.select("user_id", F.lit(1).alias("l2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("l3")), "user_id", "left")
        .select(
            F.when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .alias("level")
        )
    )
    return (
        lv.groupBy("level")
        .agg(F.count("*").cast("long").alias("n_users"))
        .select(F.col("level").cast("long").alias("level"), "n_users")
        .orderBy("level")
    )


@register(
    "q338_revenue_bridge",
    oracle="""
        WITH base AS (
          SELECT c.c_mktsegment AS segment,
                 CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS y,
                 CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          WHERE o.o_orderdate >= DATE '1996-01-01'
            AND o.o_orderdate < DATE '1998-01-01'
        ),
        g AS (
          SELECT segment,
                 SUM(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS n0,
                 SUM(CASE WHEN y = 1997 THEN 1 ELSE 0 END) AS n1,
                 SUM(CASE WHEN y = 1996 THEN cents ELSE 0 END) AS c0,
                 SUM(CASE WHEN y = 1997 THEN cents ELSE 0 END) AS c1
          FROM base GROUP BY segment
        )
        SELECT segment,
               CAST(n0 AS BIGINT) AS n_1996,
               CAST(n1 AS BIGINT) AS n_1997,
               CAST(c1 - c0 AS BIGINT) AS delta_cents,
               ROUND((n1 - n0) * (CAST(c0 AS DOUBLE) / n0), 6)
                 AS volume_effect,
               ROUND(n1 * (CAST(c1 AS DOUBLE) / n1
                           - CAST(c0 AS DOUBLE) / n0), 6) AS rate_effect
        FROM g ORDER BY segment
    """,
    doc="Revenue bridge (volume/rate decomposition) per market "
    "segment, 1996 -> 1997: delta revenue splits EXACTLY into "
    "(n1-n0)*aov0 (volume effect: more orders at old value) + "
    "n1*(aov1-aov0) (rate effect: new value on new volume) — the "
    "FP&A waterfall that answers 'did revenue move because we sold "
    "MORE or sold BIGGER', which a plain q296-style delta cannot "
    "say; the two effects reconcile to delta_cents by construction "
    "(an identity the oracle replays). Plan shape: one broadcast "
    "dim join, one segment census with conditional sums — exact "
    "integer cents, two rounded doubles.",
)
def q338(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    base = o.join(F.broadcast(c), "o_custkey").select(
        "segment",
        F.year("o_orderdate").cast("long").alias("y"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = base.groupBy("segment").agg(
        F.sum(F.when(F.col("y") == 1996, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("y") == 1997, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("y") == 1996, F.col("cents")).otherwise(0)).alias(
            "c0"
        ),
        F.sum(F.when(F.col("y") == 1997, F.col("cents")).otherwise(0)).alias(
            "c1"
        ),
    )
    a0 = F.col("c0").cast("double") / F.col("n0")
    a1 = F.col("c1").cast("double") / F.col("n1")
    return g.select(
        "segment",
        F.col("n0").cast("long").alias("n_1996"),
        F.col("n1").cast("long").alias("n_1997"),
        (F.col("c1") - F.col("c0")).cast("long").alias("delta_cents"),
        F.round((F.col("n1") - F.col("n0")) * a0, 6).alias("volume_effect"),
        F.round(F.col("n1") * (a1 - a0), 6).alias("rate_effect"),
    ).orderBy("segment")


_AGING_CUT = "1998-08-01"


@register(
    "q340_open_order_aging",
    oracle=f"""
        WITH open_o AS (
          SELECT c.c_mktsegment AS segment,
                 date_diff('day', o.o_orderdate, DATE '{_AGING_CUT}')
                   AS age_d,
                 CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          WHERE o.o_orderstatus = 'O'
            AND o.o_orderdate <= DATE '{_AGING_CUT}'
        ),
        bucketed AS (
          SELECT segment,
                 CASE WHEN age_d <= 30 THEN '0-30'
                      WHEN age_d <= 60 THEN '31-60'
                      WHEN age_d <= 90 THEN '61-90'
                      ELSE '90+' END AS age_bucket,
                 cents
          FROM open_o
        )
        SELECT segment, age_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM bucketed GROUP BY segment, age_bucket
        ORDER BY segment, age_bucket
    """,
    doc="Open-order aging report (the accounts-receivable aging "
    "shape): every order still in status 'O' at the snapshot date, "
    "bucketed into the canonical 0-30/31-60/61-90/90+ day bands per "
    "market segment with exact outstanding cents — the operational "
    "backlog report that complements q250's day-by-day concurrency "
    "census with the point-in-time cut finance actually closes "
    "books on. Plan shape: pruned status+date scan, one broadcast "
    "dim join, one (segment x band) census; integer-exact.",
)
def q340(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    cut = F.lit(_AGING_CUT).cast("date")
    o = table_parallel(spark, sf, "orders").where(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderdate") <= cut)
    )
    c = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    age = F.datediff(cut, F.col("o_orderdate").cast("date"))
    bucketed = o.join(F.broadcast(c), "o_custkey").select(
        "segment",
        F.when(age <= 30, "0-30")
        .when(age <= 60, "31-60")
        .when(age <= 90, "61-90")
        .otherwise("90+")
        .alias("age_bucket"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return (
        bucketed.groupBy("segment", "age_bucket")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("segment", "age_bucket")
    )


@register(
    "q341_segment_migration",
    oracle="""
        WITH h AS (
          SELECT o_custkey,
                 CASE WHEN o_orderdate < DATE '1998-01-01' THEN 0
                      ELSE 1 END AS period,
                 COUNT(*) AS n
          FROM orders
          WHERE o_orderdate >= DATE '1996-01-01'
          GROUP BY o_custkey, period
        ),
        w AS (
          SELECT o_custkey,
                 MAX(CASE WHEN period = 0 THEN n END) AS n0,
                 MAX(CASE WHEN period = 1 THEN n END) AS n1
          FROM h GROUP BY o_custkey
        ),
        labeled AS (
          SELECT CASE WHEN n0 IS NULL THEN 'new'
                      WHEN n0 >= 5 THEN 'heavy' ELSE 'light' END
                   AS seg_from,
                 CASE WHEN n1 IS NULL THEN 'churned'
                      WHEN n1 >= 3 THEN 'heavy' ELSE 'light' END AS seg_to
          FROM w
        )
        SELECT seg_from, seg_to,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM labeled GROUP BY seg_from, seg_to
        ORDER BY seg_from, seg_to
    """,
    doc="Engagement-segment migration matrix between two periods "
    "(1996-97 vs 1998+): each customer is labeled heavy/light by "
    "order count in each period (new = absent before, churned = "
    "absent after), and the flow census counts every (from, to) "
    "cell — the customer-base waterfall that explains WHERE a "
    "top-line change came from (q244's period movers ranks "
    "individual movement; the migration matrix shows the aggregate "
    "flows, including the new/churned boundary a rank view has no "
    "row for). Plan shape: one (customer, period) census pivoted by "
    "conditional MAX, one bounded 4x3 flow census — two "
    "customer-keyed shuffles total.",
)
def q341(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    h = (
        o.select(
            "o_custkey",
            F.when(
                F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), 0
            )
            .otherwise(1)
            .alias("period"),
        )
        .groupBy("o_custkey", "period")
        .agg(F.count("*").alias("n"))
    )
    w = h.groupBy("o_custkey").agg(
        F.max(F.when(F.col("period") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("period") == 1, F.col("n"))).alias("n1"),
    )
    labeled = w.select(
        F.when(F.col("n0").isNull(), "new")
        .when(F.col("n0") >= 5, "heavy")
        .otherwise("light")
        .alias("seg_from"),
        F.when(F.col("n1").isNull(), "churned")
        .when(F.col("n1") >= 3, "heavy")
        .otherwise("light")
        .alias("seg_to"),
    )
    return (
        labeled.groupBy("seg_from", "seg_to")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .orderBy("seg_from", "seg_to")
    )


@register(
    "q346_order_islands",
    oracle="""
        WITH months AS (
          SELECT DISTINCT o_custkey AS ck,
                 CAST(EXTRACT(year FROM o_orderdate) * 12
                      + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m
          FROM orders
        ),
        tagged AS (
          SELECT ck, m,
                 m - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY m) AS isl
          FROM months
        ),
        islands AS (
          SELECT ck, isl, COUNT(*) AS len FROM tagged GROUP BY ck, isl
        )
        SELECT CAST(len AS BIGINT) AS island_len,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers
        FROM islands GROUP BY len ORDER BY island_len
    """,
    doc="Gaps-and-islands over each customer's active months: the "
    "classic month_index - row_number() grouping key turns runs of "
    "CONSECUTIVE active months into constant island ids with zero "
    "self-joins — one per-customer window (high-cardinality "
    "partition key, shuffle-parallel) and two aggregates. The "
    "engagement-streak census (how long do customers stay "
    "continuously active?) complementing q119's fixed-cohort "
    "retention grid and q186's repurchase-interval distribution; "
    "the same island key drives SLA-window and sensor-uptime "
    "analyses. Output is the bounded island-length histogram.",
)
def q346(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders")
    months = o.select(
        F.col("o_custkey").alias("ck"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("long")
        .alias("m"),
    ).distinct()
    w = Window.partitionBy("ck").orderBy("m")
    tagged = months.withColumn("isl", F.col("m") - F.row_number().over(w))
    isl = tagged.groupBy("ck", "isl").agg(F.count("*").alias("len"))
    return (
        isl.groupBy(F.col("len").cast("long").alias("island_len"))
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.countDistinct("ck").cast("long").alias("n_customers"),
        )
        .orderBy("island_len")
    )


_SHAP_CHANNELS = ("click", "error", "signup", "view")  # sorted non-purchase


def _shapley_oracle() -> str:
    """DuckDB leg for q356: per-user touch bitmask + converted flag,
    census by mask, then the exact Shapley weighted sum UNROLLED per
    channel over the 2^4 coalition values — python-generated SQL, the
    same portability pattern as the unrolled PageRank/LPA oracles."""
    from itertools import combinations
    from math import factorial

    bits = " + ".join(
        f"MAX(CASE WHEN event_type = '{c}' THEN {1 << i} ELSE 0 END)"
        for i, c in enumerate(_SHAP_CHANNELS)
    )
    n = len(_SHAP_CHANNELS)
    legs = []
    for i, c in enumerate(_SHAP_CHANNELS):
        terms = []
        others = [j for j in range(n) if j != i]
        for k in range(n):
            for s_set in combinations(others, k):
                m = sum(1 << j for j in s_set)
                w = (
                    factorial(len(s_set))
                    * factorial(n - len(s_set) - 1)
                    / factorial(n)
                )
                terms.append(
                    f"{w!r} * (COALESCE(v{m | (1 << i)}, 0)"
                    f" - COALESCE(v{m}, 0))"
                )
        legs.append(
            f"SELECT '{c}' AS channel, "
            f"ROUND({' + '.join(terms)}, 6) AS shapley FROM v"
        )
    vcols = ", ".join(
        f"MAX(CASE WHEN mask = {m} THEN cr END) AS v{m}"
        for m in range(1 << n)
    )
    return f"""
        WITH per_user AS (
          SELECT user_id,
                 {bits} AS mask,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM events GROUP BY user_id
        ),
        census AS (
          SELECT mask, COUNT(*) AS n_users,
                 AVG(CAST(conv AS DOUBLE)) AS cr
          FROM per_user GROUP BY mask
        ),
        v AS (SELECT {vcols} FROM census)
        {' UNION ALL '.join(legs)}
        ORDER BY channel
    """


@register(
    "q356_shapley_attribution",
    oracle=_shapley_oracle(),
    doc="Shapley-value channel attribution: the coalition value v(S) is "
    "the observed conversion rate of users whose touch set is exactly "
    "S, and each channel's credit is the exact Shapley average of its "
    "marginal contribution over all orderings — the game-theoretic "
    "attribution that completes the family (linear q162, U-shape "
    "q310, time-decay q328, Markov removal-effect q323): unlike the "
    "heuristics it is the unique allocation satisfying efficiency/"
    "symmetry/dummy. Scale shape: the channel set is BOUNDED (4 touch "
    "types -> 16 coalitions), so the engine computes one per-user "
    "bitmask aggregate and one 16-row census; the factorial-weighted "
    "sum is driver math on that census, and the oracle unrolls the "
    "identical sum per channel. At 100 TB only the two grouped passes "
    "grow; the powerset census stays 2^|channels| rows by "
    "construction.",
)
def q356(spark: SparkSession, sf: str) -> DataFrame:
    from itertools import combinations
    from math import factorial

    from harmony_spark.io import table_parallel

    ev = table_parallel(spark, sf, "events")
    bit = F.lit(0)
    for i, c in enumerate(_SHAP_CHANNELS):
        bit = bit + F.max(
            F.when(F.col("event_type") == c, 1 << i).otherwise(0)
        )
    per_user = ev.groupBy("user_id").agg(
        bit.alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    census = (
        per_user.groupBy("mask")
        .agg(F.avg(F.col("conv").cast("double")).alias("cr"))
        .collect()
    )
    v = {r["mask"]: r["cr"] for r in census}
    n = len(_SHAP_CHANNELS)
    out = []
    for i, c in enumerate(_SHAP_CHANNELS):
        others = [j for j in range(n) if j != i]
        s = 0.0
        for k in range(n):
            for s_set in combinations(others, k):
                m = sum(1 << j for j in s_set)
                w = (
                    factorial(len(s_set))
                    * factorial(n - len(s_set) - 1)
                    / factorial(n)
                )
                s += w * (v.get(m | (1 << i), 0.0) - v.get(m, 0.0))
        out.append((c, round(s, 6)))
    return spark.createDataFrame(out, "channel string, shapley double")


_RMST_TAU = 20  # restriction horizon in days


@register(
    "q357_rmst",
    oracle=f"""
        WITH u AS (
          SELECT user_id,
                 date_diff('microsecond', MIN(ts), MAX(ts)) // 86400000000
                   AS lifetime_days,
                 CASE WHEN date_diff('microsecond', MAX(ts),
                                     TIMESTAMP '{_KM_OBS_END} 00:00:00')
                           >= {_KM_CENSOR_DAYS} * 86400000000
                      THEN 1 ELSE 0 END AS churned
          FROM events GROUP BY user_id
        ),
        g AS (
          SELECT lifetime_days AS t,
                 SUM(churned) AS d,
                 COUNT(*) - SUM(churned) AS c
          FROM u GROUP BY lifetime_days
        ),
        k AS (
          SELECT t, d, c,
                 (SELECT COUNT(*) FROM u)
                   - COALESCE(SUM(d + c) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
          FROM g
        ),
        curve AS (
          SELECT t,
                 EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / n_risk))
                     OVER (ORDER BY t)) AS s
          FROM k
        ),
        seg AS (
          SELECT t, s,
                 COALESCE(LEAD(t) OVER (ORDER BY t), {_RMST_TAU}) AS nxt
          FROM curve
        ),
        head AS (
          SELECT LEAST(CAST(MIN(t) AS DOUBLE), {_RMST_TAU}) AS h FROM curve
        )
        SELECT CAST({_RMST_TAU} AS BIGINT) AS tau_days,
               CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_users,
               ROUND((SELECT h FROM head)
                     + SUM(s * (LEAST(CAST(nxt AS DOUBLE), {_RMST_TAU})
                                - LEAST(CAST(t AS DOUBLE), {_RMST_TAU}))),
                     6) AS rmst_days
        FROM seg
    """,
    doc=f"Restricted mean survival time at tau={_RMST_TAU} days: the "
    "area under q171's Kaplan-Meier curve up to the horizon — mean "
    "days of user life per user within the first tau days, the "
    "single-number survival summary that stays valid under heavy "
    "censoring where the median lifetime is undefined and a hazard "
    "ratio assumes proportionality. Trapezoid-free exact step-"
    "function integral: S(t_i) times the tau-clipped interval to the "
    "next event time, plus the leading [0, t_min) strip at S=1. Same "
    "plan shape as q171 (user-keyed collapse + day-census windows "
    "bounded by the observation span), one extra LEAD over the "
    "bounded curve.",
)
def q357(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    obs_end_us = F.unix_micros(F.lit(_KM_OBS_END).cast("timestamp"))
    day_us = 86_400_000_000
    u = (
        table_parallel(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / day_us
            ).alias("lifetime_days"),
            F.when(
                obs_end_us - F.unix_micros(F.max("ts"))
                >= _KM_CENSOR_DAYS * day_us,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    # u feeds the census count AND the grouped branch: lazy checkpoint
    # materialized by the count, so the per-user pass runs once
    u = u.localCheckpoint(eager=False)
    total = u.count()
    g = u.groupBy(F.col("lifetime_days").alias("t")).agg(
        F.sum("churned").alias("d"),
        (F.count("*") - F.sum("churned")).alias("c"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = g.withColumn(
        "n_risk",
        F.lit(total)
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    ).select(
        "t",
        F.exp(
            F.sum(
                F.log(1.0 - F.col("d").cast("double") / F.col("n_risk"))
            ).over(w_cum)
        ).alias("s"),
    )
    w = Window.orderBy("t")
    seg = curve.withColumn(
        "nxt", F.coalesce(F.lead("t").over(w), F.lit(_RMST_TAU))
    )
    tau = float(_RMST_TAU)
    return seg.agg(
        F.lit(_RMST_TAU).cast("long").alias("tau_days"),
        F.lit(total).cast("long").alias("n_users"),
        F.round(
            F.least(F.min("t").cast("double"), F.lit(tau))
            + F.sum(
                F.col("s")
                * (
                    F.least(F.col("nxt").cast("double"), F.lit(tau))
                    - F.least(F.col("t").cast("double"), F.lit(tau))
                )
            ),
            6,
        ).alias("rmst_days"),
    )
