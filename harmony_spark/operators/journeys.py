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

    ev = table_parallel(spark, sf, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    full_path = p.join(v, "user_id").agg(
        F.sum(F.unix_micros("t3") - F.unix_micros("t1")).alias("total_us"),
        F.count("*").alias("n"),
    )
    counts = (
        ev.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .crossJoin(v.agg(F.count("*").cast("long").alias("n_viewed")))
        .crossJoin(c.agg(F.count("*").cast("long").alias("n_clicked")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("n_purchased")))
    )
    return counts.crossJoin(
        full_path.select(
            F.round(
                F.col("total_us").cast("double")
                / (F.col("n") * 3_600_000_000.0),
                6,
            ).alias("avg_hours_to_convert")
        )
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
