"""Inventory / demand-planning operators (round 5): Croston
intermittent-demand forecasting, the newsvendor stocking level with
classical safety stock, and EOQ ordering policy.

The reference pipeline (immunogenomics/harmony) has no inventory
analytics; these extend the engine's ops-analytics family (q232
waterfill, q251 FIFO allocation, q343 ABC classes) with the three
classical demand-planning primitives a 100 TB order-history warehouse
actually runs. All three are census-shaped: one shuffle keyed on the
part/brand, per-key window or aggregate math, bounded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_spark.registry import register

__all__ = ["q347", "q348", "q353", "q376"]

_CR_A = 0.2  # Croston smoothing constant (exactly-representable)
_CR_W = 604_800_000_000  # µs per week
_NV_CR = 0.9  # newsvendor critical ratio
_NV_Z = 1.645  # ~95% cycle-service-level z


def _week(col: str):
    """Integer epoch-week from a parquet TIMESTAMP(_NTZ) column —
    micros floor-divided, identical arithmetic to the oracle's
    ``epoch_us(..) // week`` (integer division on BIGINT is floor on
    both engines; the UTC session pin makes the NTZ cast exact)."""
    return (
        F.floor(F.unix_micros(F.col(col).cast("timestamp")) / _CR_W)
        .cast("long")
    )


@register(
    "q347_croston_intermittent",
    oracle=f"""
        WITH wk AS (
          SELECT l_partkey AS pk,
                 CAST(epoch_us(l_shipdate) // {_CR_W} AS BIGINT) AS w,
                 CAST(SUM(l_quantity) AS DOUBLE) AS z
          FROM lineitem
          GROUP BY pk, CAST(epoch_us(l_shipdate) // {_CR_W} AS BIGINT)
        ),
        seq AS (
          SELECT pk, w, z,
                 ROW_NUMBER() OVER (PARTITION BY pk ORDER BY w) AS rn,
                 COUNT(*) OVER (PARTITION BY pk) AS m,
                 w - LAG(w) OVER (PARTITION BY pk ORDER BY w) AS iv
          FROM wk
        ),
        fit AS (
          SELECT pk,
                 SUM(CASE WHEN rn = 1 THEN POW(1 - {_CR_A}, m - 1) * z
                          ELSE {_CR_A} * POW(1 - {_CR_A}, m - rn) * z
                     END) AS z_hat,
                 SUM(CASE WHEN rn = 2 THEN POW(1 - {_CR_A}, m - 2) * iv
                          WHEN rn > 2
                            THEN {_CR_A} * POW(1 - {_CR_A}, m - rn) * iv
                          ELSE 0 END) AS a_hat,
                 MAX(m) AS m
          FROM seq GROUP BY pk
        )
        SELECT CAST(FLOOR(z_hat / a_hat) AS BIGINT) AS fc_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(AVG(z_hat), 6) AS avg_demand_sz,
               ROUND(AVG(a_hat), 6) AS avg_interval
        FROM fit WHERE m >= 3
        GROUP BY CAST(FLOOR(z_hat / a_hat) AS BIGINT) ORDER BY fc_bucket
    """,
    doc="Croston's method for intermittent demand, per part: separate "
    "exponential smoothing of the nonzero weekly demand SIZES and of "
    "the INTER-DEMAND intervals (the forecast is their ratio) — the "
    "standard spare-parts forecaster where plain SES over the mostly-"
    "zero weekly series collapses toward zero. The SES recurrence "
    "unrolls into its closed weighted-sum form, so each part's fit is "
    "ONE grouped aggregate over its demand events (alpha*(1-alpha)^"
    "(m-j) weights from the per-part row_number) — no iteration, no "
    "driver state, shuffle keyed on partkey. The registered census "
    "buckets parts by floor(forecast) with mean size/interval per "
    "bucket, so output stays bounded at any scale. Requires >= 3 "
    "demand events (the interval series needs >= 2 gaps).",
)
def q347(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    wk = li.groupBy(
        F.col("l_partkey").alias("pk"), _week("l_shipdate").alias("w")
    ).agg(F.sum("l_quantity").cast("double").alias("z"))
    w = Window.partitionBy("pk").orderBy("w")
    wp = Window.partitionBy("pk")
    seq = (
        wk.withColumn("rn", F.row_number().over(w))
        .withColumn("m", F.count("*").over(wp))
        .withColumn("iv", F.col("w") - F.lag("w").over(w))
    )
    b = F.lit(1 - _CR_A)
    z_term = F.when(
        F.col("rn") == 1, F.pow(b, F.col("m") - 1) * F.col("z")
    ).otherwise(_CR_A * F.pow(b, F.col("m") - F.col("rn")) * F.col("z"))
    a_term = (
        F.when(F.col("rn") == 2, F.pow(b, F.col("m") - 2) * F.col("iv"))
        .when(
            F.col("rn") > 2,
            _CR_A * F.pow(b, F.col("m") - F.col("rn")) * F.col("iv"),
        )
        .otherwise(F.lit(0.0))
    )
    fit = seq.groupBy("pk").agg(
        F.sum(z_term).alias("z_hat"),
        F.sum(a_term).alias("a_hat"),
        F.max("m").alias("m"),
    )
    return (
        fit.where(F.col("m") >= 3)
        .groupBy(
            F.floor(F.col("z_hat") / F.col("a_hat"))
            .cast("long")
            .alias("fc_bucket")
        )
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.round(F.avg("z_hat"), 6).alias("avg_demand_sz"),
            F.round(F.avg("a_hat"), 6).alias("avg_interval"),
        )
        .orderBy("fc_bucket")
    )


@register(
    "q348_newsvendor_stock",
    oracle=f"""
        WITH wk AS (
          SELECT p.p_brand AS brand,
                 CAST(epoch_us(l.l_shipdate) // {_CR_W} AS BIGINT) AS w,
                 CAST(ROUND(SUM(l.l_quantity)) AS BIGINT) AS d
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          GROUP BY brand, CAST(epoch_us(l.l_shipdate) // {_CR_W} AS BIGINT)
        ),
        stats AS (
          SELECT brand, COUNT(*) AS m, AVG(d) AS mu, STDDEV_SAMP(d) AS sigma
          FROM wk GROUP BY brand
        ),
        ranked AS (
          SELECT brand, d,
                 ROW_NUMBER() OVER (PARTITION BY brand ORDER BY d) AS rk,
                 COUNT(*) OVER (PARTITION BY brand) AS m
          FROM wk
        ),
        nv AS (
          SELECT brand, MIN(d) AS nv_level
          FROM ranked WHERE rk >= CEIL({_NV_CR} * m) GROUP BY brand
        )
        SELECT s.brand AS brand,
               CAST(s.m AS BIGINT) AS n_weeks,
               ROUND(s.mu, 6) AS mu,
               ROUND(s.sigma, 6) AS sigma,
               CAST(n.nv_level AS BIGINT) AS nv_level,
               ROUND(s.mu + {_NV_Z} * s.sigma, 6) AS reorder_point
        FROM stats s JOIN nv n ON n.brand = s.brand
        ORDER BY brand
    """,
    doc="Newsvendor stocking level + classical safety stock per brand "
    "from the weekly demand series: the critical-ratio quantile is the "
    "EXACT empirical order statistic (smallest demand whose per-brand "
    "rank reaches ceil(CR*m) — integer rank logic, engine-stable, no "
    "percentile interpolation divergence), next to the normal-"
    "approximation reorder point mu + z*sigma the textbook safety-"
    "stock formula gives. Demand is integer units so the order "
    "statistic is exact; per-brand windows are bounded-cardinality "
    "keys over entity-scale rows (shuffle on brand, parallel across "
    "the 25 brands).",
)
def q348(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    p = table_parallel(spark, sf, "part")
    wk = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"), _week("l_shipdate").alias("w")
        )
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("d"))
    )
    stats = wk.groupBy("brand").agg(
        F.count("*").alias("m"),
        F.avg("d").alias("mu"),
        F.stddev_samp("d").alias("sigma"),
    )
    wb = Window.partitionBy("brand").orderBy("d")
    wpb = Window.partitionBy("brand")
    ranked = wk.withColumn("rk", F.row_number().over(wb)).withColumn(
        "m", F.count("*").over(wpb)
    )
    nv = (
        ranked.where(F.col("rk") >= F.ceil(_NV_CR * F.col("m")))
        .groupBy("brand")
        .agg(F.min("d").alias("nv_level"))
    )
    return (
        stats.join(nv, "brand")
        .select(
            "brand",
            F.col("m").cast("long").alias("n_weeks"),
            F.round("mu", 6).alias("mu"),
            F.round("sigma", 6).alias("sigma"),
            F.col("nv_level").cast("long").alias("nv_level"),
            F.round(F.col("mu") + _NV_Z * F.col("sigma"), 6).alias(
                "reorder_point"
            ),
        )
        .orderBy("brand")
    )


_EOQ_S = 100.0  # fixed cost per order
_EOQ_HR = 0.2  # holding rate (fraction of unit price per year)


@register(
    "q353_eoq_policy",
    oracle=f"""
        WITH d AS (
          SELECT p.p_brand AS brand,
                 CAST(SUM(l.l_quantity) AS DOUBLE) AS tot_qty,
                 COUNT(DISTINCT EXTRACT(year FROM l.l_shipdate)) AS n_years,
                 AVG(p.p_retailprice) AS unit_price
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          GROUP BY p.p_brand
        )
        SELECT brand,
               ROUND(tot_qty / n_years, 6) AS annual_demand,
               ROUND(unit_price, 6) AS unit_price,
               ROUND(sqrt(2.0 * (tot_qty / n_years) * {_EOQ_S}
                          / ({_EOQ_HR} * unit_price)), 6) AS eoq,
               ROUND((tot_qty / n_years)
                     / sqrt(2.0 * (tot_qty / n_years) * {_EOQ_S}
                            / ({_EOQ_HR} * unit_price)), 6)
                 AS orders_per_year
        FROM d ORDER BY brand
    """,
    doc="Economic order quantity per brand: EOQ = sqrt(2*D*S/H) with "
    "annual demand D from the shipped-quantity census, fixed order "
    "cost S and holding cost H as a carrying-rate fraction of the "
    "brand's mean retail price — plus the implied replenishment "
    "frequency D/EOQ. Completes the q347/q348 demand-planning trio "
    "(how much to forecast, where to set stock, how much to order): "
    "one broadcast dim join + one brand-keyed aggregate, bounded "
    "output.",
)
def q353(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = table_parallel(spark, sf, "lineitem")
    p = table_parallel(spark, sf, "part")
    d = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum("l_quantity").cast("double").alias("tot_qty"),
            F.countDistinct(F.year("l_shipdate")).alias("n_years"),
            F.avg("p_retailprice").alias("unit_price"),
        )
    )
    ad = F.col("tot_qty") / F.col("n_years")
    eoq_c = F.sqrt(2.0 * ad * _EOQ_S / (_EOQ_HR * F.col("unit_price")))
    return d.select(
        "brand",
        F.round(ad, 6).alias("annual_demand"),
        F.round("unit_price", 6).alias("unit_price"),
        F.round(eoq_c, 6).alias("eoq"),
        F.round(ad / eoq_c, 6).alias("orders_per_year"),
    ).orderBy("brand")


_PX_Y0, _PX_Y1 = 1996, 1997  # full calendar years in the testdata range


@register(
    "q376_fisher_price_index",
    oracle=rf"""
        WITH li AS (
          SELECT p.p_brand AS item, EXTRACT(year FROM o.o_orderdate) AS yr,
                 CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS sp,
                 CAST(l.l_quantity AS BIGINT) AS q
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN part p ON p.p_partkey = l.l_partkey
          WHERE EXTRACT(year FROM o.o_orderdate) IN ({_PX_Y0}, {_PX_Y1})
        ),
        g AS (SELECT item, yr, SUM(sp) AS sp, SUM(q) AS sq
              FROM li GROUP BY item, yr),
        b AS (
          SELECT y0.item, y0.sp AS sp0, y0.sq AS sq0,
                 y1.sp AS sp1, y1.sq AS sq1
          FROM (SELECT * FROM g WHERE yr = {_PX_Y0}) y0
          JOIN (SELECT * FROM g WHERE yr = {_PX_Y1}) y1 USING (item)
        ),
        m AS (
          SELECT COUNT(*) AS n, SUM(sp0) AS v00, SUM(sp1) AS v11,
                 SUM(sp1 * sq0 / (1.0 * sq1)) AS v10,
                 SUM(sp0 * sq1 / (1.0 * sq0)) AS v01
          FROM b
        )
        SELECT CAST(n AS BIGINT) AS n_items,
               ROUND(v10 / v00, 6) AS laspeyres,
               ROUND(v11 / v01, 6) AS paasche,
               ROUND(SQRT((v10 / v00) * (v11 / v01)), 6) AS fisher
        FROM m
    """,
    doc=f"Price index {_PX_Y1} vs {_PX_Y0} over brand unit values: "
    "Laspeyres (base-year basket — overstates inflation when buyers "
    "substitute away from price rises), Paasche (current basket — "
    "understates it), and Fisher's ideal geometric mean, the "
    "time-reversible compromise national statistics use. Unit value "
    "p_y = Σprice/Σqty per (brand, year); only brands traded in BOTH "
    "years enter, per the matched-items definition. The SQL identity "
    "Σp1·q0 = Σ sp1·sq0/sq1 keeps everything on the (brand, year) "
    "census — two aggregates, one |brands|-row join, no raw-row "
    "revisit. At 100 TB: one shuffle on (brand, year), then census "
    "math; the same shape extends to chained monthly indices by "
    "swapping the year pair for consecutive periods.",
)
def q376(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    li = (
        table_parallel(spark, sf, "lineitem")
        .join(
            table_parallel(spark, sf, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            table_parallel(spark, sf, "part"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("item"),
            F.year("o_orderdate").alias("yr"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("sp"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .where(F.col("yr").isin(_PX_Y0, _PX_Y1))
    )
    g = li.groupBy("item", "yr").agg(
        F.sum("sp").alias("sp"), F.sum("q").alias("sq")
    )
    y0 = g.where(F.col("yr") == _PX_Y0).select(
        "item", F.col("sp").alias("sp0"), F.col("sq").alias("sq0")
    )
    y1 = g.where(F.col("yr") == _PX_Y1).select(
        "item", F.col("sp").alias("sp1"), F.col("sq").alias("sq1")
    )
    m = y0.join(y1, "item").agg(
        F.count("*").alias("n"),
        F.sum("sp0").alias("v00"),
        F.sum("sp1").alias("v11"),
        F.sum(F.col("sp1") * F.col("sq0") / F.col("sq1")).alias("v10"),
        F.sum(F.col("sp0") * F.col("sq1") / F.col("sq0")).alias("v01"),
    )
    lasp = F.col("v10") / F.col("v00")
    paas = F.col("v11") / F.col("v01")
    return m.select(
        F.col("n").cast("long").alias("n_items"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )
