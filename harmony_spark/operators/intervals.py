"""Interval / sweep-line analytics q250, q251, q253, q255.

The family's shared scale idea: problems naive SQL states as an
interval-overlap JOIN (open-order concurrency, sliding-window distinct
users, FIFO lot matching) are re-expressed so the only O(N) work is a
key-local aggregate, and anything ordered runs on a CENSUS-sized table
(days, warehouses) where a single-partition window is free:

- q250/q253/q255: the sweep line — intervals become +1/-1 boundary
  deltas, a day-level hash aggregate collapses them, and one cumulative
  sum over the day census replays the whole overlap structure. No
  interval ever joins another interval.
- q251: the bucketed range join — cumulative-quantity intervals are
  exploded into fixed-width blocks and equi-joined on (key, block),
  with the "overlap starts in this block" rule making the join
  duplicate-free without a distinct. The oracle runs the literal range
  predicate (DuckDB IEJoin); the engine never evaluates an unbounded
  theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harmony_spark.registry import register

__all__ = ["q250", "q251", "q253", "q255"]

_FIFO_WH = 50  # warehouses = l_partkey % _FIFO_WH
_FIFO_QB = 512  # cumulative-quantity block width for the bucketed join


@register(
    "q250_open_order_concurrency",
    oracle="""
        WITH span AS (
          SELECT o.o_orderkey,
                 CAST(o.o_orderdate AS DATE) AS sd,
                 GREATEST(CAST(o.o_orderdate AS DATE),
                          MAX(CAST(l.l_shipdate AS DATE))) AS ed
          FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
          GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
        ),
        deltas AS (
          SELECT sd AS day, 1 AS d FROM span
          UNION ALL
          SELECT ed + 1 AS day, -1 AS d FROM span
        ),
        byday AS (SELECT day, SUM(d) AS dd FROM deltas GROUP BY day),
        cum AS (
          SELECT day,
                 CAST(SUM(dd) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS open
          FROM byday
        ),
        mon AS (SELECT strftime(day, '%Y-%m') AS ym, day, open FROM cum),
        peaks AS (SELECT ym, MAX(open) AS peak FROM mon GROUP BY ym)
        SELECT p.ym,
               CAST(p.peak AS BIGINT) AS peak_open,
               CAST(MIN(m.day) AS VARCHAR) AS peak_day
        FROM peaks p JOIN mon m ON m.ym = p.ym AND m.open = p.peak
        GROUP BY p.ym, p.peak
        ORDER BY p.ym
    """,
    doc="Open-order concurrency profile: each order is open over "
    "[orderdate, max(shipdate)] and the output is the per-month PEAK "
    "number of simultaneously open orders plus the first day the "
    "peak is reached. The naive statement is an interval-overlap "
    "self-join of orders against orders (O(N^2) at any scale); the "
    "sweep-line restatement is two +1/-1 boundary deltas per order, "
    "a day-keyed hash aggregate (the only O(N) shuffle, map-side "
    "combinable), and ONE cumulative sum over the day census — at "
    "100 TB the census is still only a few thousand rows, so the "
    "single-partition ordered window costs nothing and no interval "
    "pair ever materializes. Concurrency changes only on boundary "
    "days, so the delta-day census carries the exact peak. "
    "Determinism: all-integer counts; peak day is MIN over exact "
    "integer equality.",
)
def q250(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("sd")
    )
    li = table_parallel(spark, sf, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("shipd")
    )
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "sd")
        .agg(F.greatest(F.first("sd"), F.max("shipd")).alias("ed"))
    )
    deltas = span.select(F.col("sd").alias("day"), F.lit(1).alias("d")).unionByName(
        span.select(F.date_add("ed", 1).alias("day"), F.lit(-1).alias("d"))
    )
    byday = deltas.groupBy("day").agg(F.sum("d").alias("dd"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = byday.select(
        "day", F.sum("dd").over(wcum).cast("long").alias("open")
    )
    mon = cum.select(F.date_format("day", "yyyy-MM").alias("ym"), "day", "open")
    peaks = mon.groupBy("ym").agg(F.max("open").alias("peak"))
    return (
        peaks.join(
            mon,
            (peaks.ym == mon.ym) & (peaks.peak == mon.open),
        )
        .groupBy(peaks.ym, "peak")
        .agg(F.date_format(F.min("day"), "yyyy-MM-dd").alias("peak_day"))
        .select("ym", F.col("peak").alias("peak_open"), "peak_day")
        .orderBy("ym")
    )


@register(
    "q251_fifo_allocation",
    oracle=f"""
        WITH base AS (
          SELECT l_partkey % {_FIFO_WH} AS wh,
                 CAST(l_quantity AS BIGINT) AS qty,
                 CAST(l_shipdate AS DATE) AS day,
                 l_linestatus AS st,
                 l_orderkey, l_linenumber
          FROM lineitem
        ),
        iv AS (
          SELECT wh, st, qty, day,
                 CAST(SUM(qty) OVER (PARTITION BY wh, st
                   ORDER BY day, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS hi
          FROM base
        ),
        s AS (SELECT wh, qty, day, hi, hi - qty AS lo FROM iv WHERE st = 'F'),
        d AS (SELECT wh, qty, day, hi, hi - qty AS lo FROM iv WHERE st = 'O'),
        m AS (
          SELECT s.wh,
                 LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS alloc,
                 d.day - s.day AS age
          FROM s JOIN d
            ON d.wh = s.wh AND s.lo < d.hi AND d.lo < s.hi
        )
        SELECT CAST(wh AS BIGINT) AS wh,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(alloc) AS BIGINT) AS matched_qty,
               ROUND(SUM(alloc * age) * 1.0 / SUM(alloc), 6) AS avg_age_days
        FROM m GROUP BY wh ORDER BY wh
    """,
    doc="Set-based FIFO lot matching (inventory costing / queue "
    "attribution): per warehouse (l_partkey mod 50), supply lots "
    "(linestatus F) and demand lots (linestatus O) are laid on the "
    "same cumulative-quantity axis in shipdate order, and FIFO "
    "allocation IS the interval intersection of supply range "
    "[cum-qty, cum) against demand range — the classic rewrite that "
    "turns an inherently sequential matching loop into one "
    "declarative join. Output: matched pairs, matched units, and "
    "the allocation-weighted mean supply->demand age in days. "
    "Scale shape: the oracle runs the literal range predicate "
    "(DuckDB IEJoin); the engine cannot rely on a range-join "
    f"physical operator, so each interval explodes into {_FIFO_QB}-"
    "unit blocks of the cumulative axis (an interval of row size q "
    "spans ceil(q/512)+1 <= 2 blocks) and the join is EQUI on "
    "(warehouse, block) — fan-out is O(rows), partition-pruned by "
    "key, and the 'overlap must start in this block' predicate "
    "makes each matched pair survive exactly once with no distinct. "
    "Determinism: exact BIGINT cumulative sums with a total "
    "(day, orderkey, linenumber) order; one double division at the "
    "very end.",
)
def q251(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    base = table_parallel(spark, sf, "lineitem").select(
        (F.col("l_partkey") % _FIFO_WH).alias("wh"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.to_date("l_shipdate").alias("day"),
        F.col("l_linestatus").alias("st"),
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("wh", "st")
        .orderBy("day", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    iv = base.select(
        "wh",
        "st",
        "qty",
        "day",
        F.sum("qty").over(w).cast("long").alias("hi"),
    ).withColumn("lo", F.col("hi") - F.col("qty"))

    def blocks(df: DataFrame, tag: str) -> DataFrame:
        return df.where(F.col("st") == tag).select(
            F.col("wh").alias(f"{tag}_wh"),
            F.col("day").alias(f"{tag}_day"),
            F.col("lo").alias(f"{tag}_lo"),
            F.col("hi").alias(f"{tag}_hi"),
            F.explode(
                F.sequence(
                    F.expr(f"lo DIV {_FIFO_QB}"),
                    F.expr(f"(hi - 1) DIV {_FIFO_QB}"),
                )
            ).alias(f"{tag}_blk"),
        )

    s = blocks(iv, "F")
    d = blocks(iv, "O")
    m = (
        s.join(
            d,
            (F.col("F_wh") == F.col("O_wh"))
            & (F.col("F_blk") == F.col("O_blk"))
            & (F.col("F_lo") < F.col("O_hi"))
            & (F.col("O_lo") < F.col("F_hi")),
        )
        # survive exactly once: in the block where the overlap begins
        .where(F.col("F_blk") == F.expr(f"GREATEST(F_lo, O_lo) DIV {_FIFO_QB}"))
        .select(
            F.col("F_wh").alias("wh"),
            (
                F.least(F.col("F_hi"), F.col("O_hi"))
                - F.greatest(F.col("F_lo"), F.col("O_lo"))
            ).alias("alloc"),
            F.datediff(F.col("O_day"), F.col("F_day")).alias("age"),
        )
    )
    return (
        m.groupBy(F.col("wh").cast("long").alias("wh"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("alloc").cast("long").alias("matched_qty"),
            F.round(
                F.sum(F.col("alloc") * F.col("age")) / F.sum("alloc"), 6
            ).alias("avg_age_days"),
        )
        .orderBy("wh")
    )


@register(
    "q253_dau_wau_stickiness",
    oracle="""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        days AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day),
        wau AS (
          SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
          FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day
        )
        SELECT CAST(d.day AS VARCHAR) AS day,
               CAST(d.dau AS BIGINT) AS dau,
               CAST(w.wau AS BIGINT) AS wau,
               ROUND(d.dau * 1.0 / w.wau, 6) AS stickiness
        FROM days d JOIN wau w ON w.day = d.day
        ORDER BY d.day
    """,
    doc="DAU / WAU(7-day) stickiness per day — EXACT sliding-window "
    "distinct users, the engagement ratio product analytics runs "
    "daily. The two naive plans both die at scale: a 7x explode of "
    "every (user, day) into the days it supports double-counts "
    "multi-active users unless a (user, day)-distinct lands AFTER "
    "the fan-out, and COUNT(DISTINCT) OVER a range window is "
    "unsupported/unbounded-state anyway (the oracle, on census-"
    "sized data, runs exactly that as a range join). The engine "
    "instead coalesces each user's [day, day+6] support intervals "
    "into maximal islands (gaps-and-islands per user: one key-local "
    "window over that user's active days), emits +1/-1 island "
    "boundaries, and replays membership with one cumulative sum "
    "over the day census, carried forward onto the DAU spine for "
    "days that fall inside an island without starting one. Work is "
    "O(active user-days) with NO fan-out and no distinct-over-"
    "window; the day-census window is free at any corpus size. "
    "Determinism: all-integer counts, one final division.",
)
def q253(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table

    ud = (
        table(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    # islands of overlapping/adjacent [day, day+6] supports per user
    wu = Window.partitionBy("user_id").orderBy("day")
    prev_end = F.max(F.date_add("day", 6)).over(
        wu.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ud.withColumn(
        "new_island",
        F.when(
            prev_end.isNull() | (F.col("day") > F.date_add(prev_end, 1)), 1
        ).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(wu))
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("day").alias("sd"), F.date_add(F.max("day"), 6).alias("ed")
    )
    deltas = islands.select(
        F.col("sd").alias("day"), F.lit(1).alias("d")
    ).unionByName(islands.select(F.date_add("ed", 1).alias("day"), F.lit(-1).alias("d")))
    # fold the DAU spine in with zero deltas so every output day has a
    # cumulative-membership row (a day inside an island need not start one)
    alldays = deltas.unionByName(
        dau.select("day", F.lit(0).alias("d"))
    ).groupBy("day").agg(F.sum("d").alias("dd"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = alldays.select("day", F.sum("dd").over(wcum).cast("long").alias("wau"))
    return (
        dau.join(cum, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "q255_net_drawdown",
    oracle="""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS day,
                 SUM(CASE WHEN event_type = 'purchase'
                          THEN CAST(ROUND(value * 100) AS BIGINT)
                          ELSE -CAST(ROUND(value * 100) AS BIGINT) END) AS net
          FROM events WHERE event_type IN ('purchase', 'error')
          GROUP BY day
        ),
        cum AS (
          SELECT day,
                 CAST(SUM(net) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS c
          FROM daily
        ),
        dd AS (
          SELECT day, c,
                 CAST(MAX(c) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) - c AS draw,
                 ROW_NUMBER() OVER (ORDER BY day) AS rn
          FROM cum
        ),
        uw AS (SELECT day, draw, rn FROM dd WHERE draw > 0),
        isl AS (
          SELECT day, rn - ROW_NUMBER() OVER (ORDER BY day) AS grp FROM uw
        ),
        spans AS (
          SELECT grp, MAX(day) - MIN(day) + 1 AS len FROM isl GROUP BY grp
        )
        SELECT (SELECT CAST(MAX(draw) AS BIGINT) FROM dd) AS max_dd_cents,
               (SELECT CAST(MIN(day) AS VARCHAR) FROM dd
                 WHERE draw = (SELECT MAX(draw) FROM dd)) AS trough_day,
               (SELECT CAST(COALESCE(MAX(len), 0) AS BIGINT) FROM spans)
                 AS longest_uw_days,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM uw) AS n_uw_days
    """,
    doc="Maximum drawdown + underwater profile of the daily NET "
    "series (purchase cents minus error cents): running peak, the "
    "deepest peak-to-trough drop in exact integer cents, the first "
    "trough day reaching it, and the longest underwater spell in "
    "calendar days (gaps-and-islands over consecutive census rows, "
    "span measured by date arithmetic). The risk-curve diagnostic "
    "finance runs on P&L and reliability teams run on error-burn. "
    "Scale shape: the only O(N) pass is the day-keyed integer "
    "aggregate; everything ordered (cumsum, running max, islands) "
    "runs on the day census where a single-partition window is "
    "free. Determinism: integer cents end-to-end — no float ever "
    "enters the ranking; trough day is MIN over exact integer "
    "equality.",
)
def q255(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table

    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        table(spark, sf, "events")
        .where(F.col("event_type").isin("purchase", "error"))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", cents).otherwise(-cents)
            ).alias("net")
        )
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        F.sum("net").over(wcum).cast("long").alias("c"),
    ).select(
        "day",
        (F.max("c").over(wcum).cast("long") - F.col("c")).alias("draw"),
        F.row_number().over(Window.orderBy("day")).alias("rn"),
    )
    uw = dd.where(F.col("draw") > 0)
    isl = uw.withColumn(
        "grp", F.col("rn") - F.row_number().over(Window.orderBy("day"))
    )
    spans = isl.groupBy("grp").agg(
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("len")
    )
    maxdd = dd.agg(F.max("draw").alias("max_dd_cents"))
    trough = (
        dd.join(F.broadcast(maxdd), dd.draw == maxdd.max_dd_cents)
        .agg(F.date_format(F.min("day"), "yyyy-MM-dd").alias("trough_day"))
    )
    uw_stats = uw.agg(F.count("*").cast("long").alias("n_uw_days"))
    span_stats = spans.agg(
        F.coalesce(F.max("len"), F.lit(0)).cast("long").alias("longest_uw_days")
    )
    return (
        maxdd.select(F.col("max_dd_cents").cast("long").alias("max_dd_cents"))
        .crossJoin(trough)
        .crossJoin(span_stats)
        .crossJoin(uw_stats)
    )
