"""Rank statistics and model-selection shapes q219-q223.

Completes the statistics suite (q144 Welch, q171 KM, q172 z-test,
q173 Theil-Sen, q190 chi-square, q191 KS, q192 Wilson, q198 OLS,
q199 weighted median) with the RANK-based family — Spearman, Kendall,
Mann-Whitney — plus categorical-association strength (Cramér's V /
mutual information) and a Gini-optimal decision stump.

Determinism contract shared by the rank statistics: average ranks are
carried as the INTEGER ``2·rank + ties − 1`` (twice the midrank), and
every moment that feeds a final ratio is an exact BIGINT sum of
centered integers, so engine summation order cannot move a ROUND
boundary. Bounds: the largest such moment is Σd² ≤ n³ (n = rows per
group), which fits BIGINT up to n ≈ 2M rows per group; beyond that a
single pre-scaling of ranks (divide the centered rank by a constant)
keeps the same 6-dp output — noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from harmony_spark.registry import register

__all__ = ["q219", "q220", "q221", "q222", "q223", "q228", "q229", "q230"]


@register(
    "q219_spearman_rho",
    oracle="""
        WITH pts AS (
          SELECT l_returnflag AS grp,
                 CAST(l_quantity AS BIGINT) AS x,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
          FROM lineitem
        ),
        ranked AS (
          SELECT grp, x, y,
                 2 * RANK() OVER (PARTITION BY grp ORDER BY x)
                   + COUNT(*) OVER (PARTITION BY grp, x) - 1 AS rx2,
                 2 * RANK() OVER (PARTITION BY grp ORDER BY y)
                   + COUNT(*) OVER (PARTITION BY grp, y) - 1 AS ry2,
                 COUNT(*) OVER (PARTITION BY grp) AS n
          FROM pts
        ),
        centered AS (
          SELECT grp, n, rx2 - (n + 1) AS dx, ry2 - (n + 1) AS dy
          FROM ranked
        )
        SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
               ROUND(SUM(dx * dy)
                     / SQRT(1.0 * SUM(dx * dx) * SUM(dy * dy)), 6) AS rho
        FROM centered GROUP BY grp ORDER BY grp
    """,
    doc="Spearman rank correlation rho per group (quantity vs "
    "extended price within each returnflag), tie-aware: midranks "
    "via the integer 2·rank+ties−1 trick, centered by (n+1) so all "
    "three moments (Σdxdy, Σdx², Σdy²) are exact BIGINT sums of "
    "integers — Pearson-on-midranks IS the definition of Spearman "
    "under ties, and the integer moments make the 6-dp rho "
    "engine-stable with no double-summation-order surface. Plan "
    "shape: two rank windows keyed on (group, value) — each a "
    "group-local sort, no global ordering — then one hash "
    "aggregate; Σd² ≤ n³ bounds BIGINT safety to ~2M rows/group "
    "(pre-scale midranks beyond that). Read against q125/q198, "
    "the PEARSON formulations on raw values.",
)
def q219(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    pts = table_parallel(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    wg = Window.partitionBy("grp")
    rx2 = (
        2 * F.rank().over(Window.partitionBy("grp").orderBy("x"))
        + F.count("*").over(Window.partitionBy("grp", "x"))
        - 1
    )
    ry2 = (
        2 * F.rank().over(Window.partitionBy("grp").orderBy("y"))
        + F.count("*").over(Window.partitionBy("grp", "y"))
        - 1
    )
    centered = pts.select(
        "grp",
        F.count("*").over(wg).alias("n"),
        (rx2 - (F.count("*").over(wg) + 1)).alias("dx"),
        (ry2 - (F.count("*").over(wg) + 1)).alias("dy"),
    )
    return (
        centered.groupBy("grp")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.round(
                F.sum(F.col("dx") * F.col("dy"))
                / F.sqrt(
                    1.0
                    * F.sum(F.col("dx") * F.col("dx"))
                    * F.sum(F.col("dy") * F.col("dy"))
                ),
                6,
            ).alias("rho"),
        )
        .orderBy("grp")
    )


@register(
    "q220_kendall_tau",
    oracle="""
        WITH census AS (
          SELECT n.n_name AS nation,
                 CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS rev_cents,
                 CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n   ON n.n_nationkey = c.c_nationkey
          GROUP BY n.n_name
        ),
        pairs AS (
          SELECT CASE WHEN (a.rev_cents - b.rev_cents)
                           * (a.n_cust - b.n_cust) > 0 THEN 1 ELSE 0
                 END AS conc,
                 CASE WHEN (a.rev_cents - b.rev_cents)
                           * (a.n_cust - b.n_cust) < 0 THEN 1 ELSE 0
                 END AS disc,
                 CASE WHEN a.rev_cents = b.rev_cents THEN 1 ELSE 0
                 END AS tie_x,
                 CASE WHEN a.n_cust = b.n_cust THEN 1 ELSE 0 END AS tie_y
          FROM census a JOIN census b ON a.nation < b.nation
        )
        SELECT CAST((SELECT COUNT(*) FROM census) AS BIGINT) AS n,
               CAST(SUM(conc) AS BIGINT) AS concordant,
               CAST(SUM(disc) AS BIGINT) AS discordant,
               ROUND((SUM(conc) - SUM(disc))
                     / SQRT(1.0 * (COUNT(*) - SUM(tie_x))
                            * (COUNT(*) - SUM(tie_y))), 6) AS tau_b
        FROM pairs
    """,
    doc="Kendall tau-b between a nation's total order revenue and its "
    "customer count — concordant/discordant/tied pair counts over "
    "the all-pairs self-join of the 25-row nation census, with the "
    "tie-corrected tau-b denominator. The quadratic pair join is "
    "BOUNDED BY CONSTRUCTION: it runs on the aggregated census "
    "(|nations|² pairs, never |orders|²), the pattern every "
    "pairwise statistic should follow at 100 TB — aggregate first, "
    "then go quadratic on the census. All pair counts are exact "
    "integers; tau_b's single SQRT is computed from them. Read "
    "against q219 (Spearman, rank-based) and q173 (Theil-Sen, the "
    "median-slope cousin of the same concordance idea).",
)
def q220(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    o = table_parallel(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = table_parallel(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = table_parallel(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    census = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("nation")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("rev_cents"),
            F.countDistinct("c_custkey").cast("long").alias("n_cust"),
        )
    )
    a = census.select(
        F.col("nation").alias("na"),
        F.col("rev_cents").alias("xa"),
        F.col("n_cust").alias("ya"),
    )
    b = census.select(
        F.col("nation").alias("nb"),
        F.col("rev_cents").alias("xb"),
        F.col("n_cust").alias("yb"),
    )
    # |nations|² pairs on a broadcast census — bounded, not a fact join.
    pairs = a.join(F.broadcast(b), F.col("na") < F.col("nb")).select(
        F.when(
            (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) > 0, 1
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb")) < 0, 1
        )
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("tie_y"),
    )
    n_census = census.agg(F.count("*").cast("long").alias("n"))
    return n_census.crossJoin(
        pairs.agg(
            F.sum("conc").cast("long").alias("concordant"),
            F.sum("disc").cast("long").alias("discordant"),
            F.round(
                (F.sum("conc") - F.sum("disc"))
                / F.sqrt(
                    1.0
                    * (F.count("*") - F.sum("tie_x"))
                    * (F.count("*") - F.sum("tie_y"))
                ),
                6,
            ).alias("tau_b"),
        )
    ).select("n", "concordant", "discordant", "tau_b")


@register(
    "q221_mann_whitney",
    oracle="""
        WITH pts AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
                 END AS g,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
        ),
        ranked AS (
          SELECT g, v,
                 2 * RANK() OVER (ORDER BY v)
                   + COUNT(*) OVER (PARTITION BY v) - 1 AS r2
          FROM pts
        ),
        agg AS (
          SELECT CAST(SUM(g) AS BIGINT) AS n1,
                 CAST(SUM(1 - g) AS BIGINT) AS n2,
                 CAST(SUM(CASE WHEN g = 1 THEN r2 ELSE 0 END) AS BIGINT)
                   AS r1_x2
          FROM ranked
        ),
        ties AS (
          SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
          FROM (SELECT COUNT(*) AS t FROM pts GROUP BY v) x
        )
        SELECT n1, n2,
               r1_x2 - n1 * (n1 + 1) AS u1_x2,
               ROUND((0.5 * (r1_x2 - n1 * (n1 + 1)) - 0.5 * n1 * n2)
                     / SQRT(n1 * n2 / 12.0
                            * ((n1 + n2 + 1)
                               - 1.0 * tie_term
                                 / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z
        FROM agg, ties
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) with normal approximation "
    "and tie correction: URGENT vs LOW order values — the "
    "nonparametric two-sample location test that q144's Welch t "
    "cannot replace when the distributions are skewed. Midranks "
    "carried as the integer 2·rank+ties−1, so the rank sum, U "
    "(emitted as the integer 2·U — U itself can be half-integral "
    "under ties), and the tie-correction term Σ(t³−t) are all "
    "exact BIGINTs; z's one SQRT is computed from them. Plan "
    "shape: one global rank window over the two-group subset (the "
    "only global sort; at 100 TB swap in the distributed-rank "
    "recipe q156's exact-median uses: per-partition histograms + "
    "offset join), one tie census, one row out.",
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    pts = (
        table_parallel(spark, sf, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("g"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
    )
    ranked = pts.select(
        "g",
        "v",
        (
            2 * F.rank().over(Window.orderBy("v"))
            + F.count("*").over(Window.partitionBy("v"))
            - 1
        ).alias("r2"),
    )
    agg = ranked.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(1 - F.col("g")).cast("long").alias("n2"),
        F.sum(F.when(F.col("g") == 1, F.col("r2")).otherwise(0))
        .cast("long")
        .alias("r1_x2"),
    )
    ties = (
        pts.groupBy("v")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
            .cast("long")
            .alias("tie_term")
        )
    )
    j = agg.crossJoin(ties)
    u1_x2 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    n_tot = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1")
        * F.col("n2")
        / 12.0
        * (
            (n_tot + 1)
            - 1.0 * F.col("tie_term") / (n_tot * (n_tot - 1.0))
        )
    )
    return j.select(
        "n1",
        "n2",
        u1_x2.alias("u1_x2"),
        F.round(
            (0.5 * u1_x2 - 0.5 * F.col("n1") * F.col("n2")) / sigma, 6
        ).alias("z"),
    )


@register(
    "q222_categorical_association",
    oracle="""
        WITH cells AS (
          SELECT c.c_mktsegment AS seg, r.r_name AS region,
                 CAST(COUNT(*) AS BIGINT) AS nij
          FROM customer c
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          GROUP BY seg, region
        ),
        tot AS (
          SELECT SUM(nij) AS n,
                 COUNT(DISTINCT seg) AS nr,
                 COUNT(DISTINCT region) AS nc
          FROM cells
        ),
        marg AS (
          SELECT c.seg, c.region, c.nij,
                 SUM(c.nij) OVER (PARTITION BY c.seg) AS ni,
                 SUM(c.nij) OVER (PARTITION BY c.region) AS nj
          FROM cells c
        )
        SELECT CAST(t.n AS BIGINT) AS n,
               ROUND(SUM((m.nij - 1.0 * m.ni * m.nj / t.n)
                         * (m.nij - 1.0 * m.ni * m.nj / t.n)
                         / (1.0 * m.ni * m.nj / t.n)), 6) AS chi2,
               ROUND(SQRT(SUM((m.nij - 1.0 * m.ni * m.nj / t.n)
                              * (m.nij - 1.0 * m.ni * m.nj / t.n)
                              / (1.0 * m.ni * m.nj / t.n))
                          / (t.n * (LEAST(t.nr, t.nc) - 1))), 6)
                 AS cramers_v,
               ROUND(SUM((1.0 * m.nij / t.n)
                         * LN(1.0 * m.nij * t.n / (m.ni * m.nj))), 6)
                 AS mutual_info
        FROM marg m, tot t
        GROUP BY t.n, t.nr, t.nc
    """,
    doc="Categorical association strength between market segment and "
    "region: chi-square statistic, Cramér's V (the [0,1]-normalized "
    "effect size q190's raw chi2 lacks), and mutual information in "
    "nats — all from ONE contingency aggregate with window-sum "
    "marginals, the single-pass contingency pattern. Cells with "
    "nij=0 contribute nothing to MI by convention and cannot occur "
    "in the chi2 sum here (only observed cells are materialized; "
    "expected counts use full marginals, so sparse zero cells are "
    "a documented approximation of the textbook chi2 — exact when "
    "the table is dense, as segment×region is). Integer counts in, "
    "three 6-dp doubles out over ≤|seg|·|region| cells.",
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    c = table_parallel(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_mktsegment").alias("seg")
    )
    n = table_parallel(spark, sf, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    r = table_parallel(spark, sf, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    cells = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("seg", "region")
        .agg(F.count("*").cast("long").alias("nij"))
    )
    marg = cells.select(
        "seg",
        "region",
        "nij",
        F.sum("nij").over(Window.partitionBy("seg")).alias("ni"),
        F.sum("nij").over(Window.partitionBy("region")).alias("nj"),
        F.sum("nij").over(Window.partitionBy()).alias("n"),
        F.size(
            F.collect_set("seg").over(Window.partitionBy())
        ).alias("nr"),
        F.size(
            F.collect_set("region").over(Window.partitionBy())
        ).alias("nc"),
    )
    e = 1.0 * F.col("ni") * F.col("nj") / F.col("n")
    chi2 = F.sum((F.col("nij") - e) * (F.col("nij") - e) / e)
    mi = F.sum(
        (1.0 * F.col("nij") / F.col("n"))
        * F.log(1.0 * F.col("nij") * F.col("n") / (F.col("ni") * F.col("nj")))
    )
    return marg.groupBy("n", "nr", "nc").agg(
        chi2.alias("_chi2"),
        mi.alias("_mi"),
    ).select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("_chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("_chi2")
                / (F.col("n") * (F.least("nr", "nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
        F.round(F.col("_mi"), 6).alias("mutual_info"),
    )


@register(
    "q223_decision_stump",
    oracle="""
        WITH pts AS (
          SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bucket,
                 CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 ELSE 0 END AS y
          FROM orders
        ),
        hist AS (
          SELECT bucket, COUNT(*) AS nb, SUM(y) AS pb
          FROM pts GROUP BY bucket
        ),
        cum AS (
          SELECT bucket,
                 SUM(nb) OVER (ORDER BY bucket) AS nl,
                 SUM(pb) OVER (ORDER BY bucket) AS pl,
                 SUM(nb) OVER () AS n,
                 SUM(pb) OVER () AS p
          FROM hist
        ),
        scored AS (
          SELECT bucket AS threshold,
                 CAST(nl AS BIGINT) AS n_left,
                 ROUND(1.0
                       - (1.0 * pl * pl + 1.0 * (nl - pl) * (nl - pl))
                         / (1.0 * nl * n)
                       - (1.0 * (p - pl) * (p - pl)
                          + 1.0 * ((n - nl) - (p - pl))
                            * ((n - nl) - (p - pl)))
                         / (1.0 * (n - nl) * n), 6) AS gini
          FROM cum WHERE nl < n
        )
        SELECT threshold, n_left, gini
        FROM scored
        ORDER BY gini, threshold
        LIMIT 1
    """,
    doc="Gini-optimal decision stump: the single best split threshold "
    "on bucketed order value predicting high order priority — "
    "weighted Gini impurity of (left, right) evaluated at EVERY "
    "bucket boundary via one cumulative window over the bucket "
    "histogram, then argmin on the ROUNDED score with the "
    "threshold as tiebreak (the rounded-key-argmax determinism "
    "rule). The feature is pre-bucketed ($1000 bins) exactly so "
    "the candidate-threshold table is a BOUNDED census and the "
    "global-ordered cumulative window runs over hundreds of rows, "
    "not |orders| — the move that keeps exhaustive split search "
    "viable at 100 TB (finer thresholds = finer buckets, still "
    "bounded). Counts are exact integers; the weighted Gini "
    "1 − Σside (pos²+neg²)/(n_side·N) is two divisions per row.",
)
def q223(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    pts = table_parallel(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("bucket"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    hist = pts.groupBy("bucket").agg(
        F.count("*").alias("nb"), F.sum("y").alias("pb")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.select(
        "bucket",
        F.sum("nb").over(w).alias("nl"),
        F.sum("pb").over(w).alias("pl"),
        F.sum("nb").over(wall).alias("n"),
        F.sum("pb").over(wall).alias("p"),
    )
    nl, pl = F.col("nl"), F.col("pl")
    n, p = F.col("n"), F.col("p")
    nr, pr = n - nl, p - pl
    gini = F.round(
        1.0
        - (1.0 * pl * pl + 1.0 * (nl - pl) * (nl - pl)) / (1.0 * nl * n)
        - (1.0 * pr * pr + 1.0 * (nr - pr) * (nr - pr)) / (1.0 * nr * n),
        6,
    )
    return (
        cum.where(nl < n)
        .select(
            F.col("bucket").alias("threshold"),
            nl.cast("long").alias("n_left"),
            gini.alias("gini"),
        )
        .orderBy("gini", "threshold")
        .limit(1)
    )


@register(
    "q228_isotonic_calibration",
    oracle="""
        WITH scored AS (
          SELECT CAST(label = 1 AS INT) AS pos,
                 1.0 / (1.0 + exp(-(list_sum(list_transform(list_zip(embedding,
                        range(1, len(embedding) + 1)),
                        p -> CAST(p[1] AS DOUBLE)
                             * (CASE WHEN p[2] % 2 = 1 THEN 1 ELSE -1 END)))
                        ) * 2.0)) AS prob
          FROM embeddings
        ),
        b AS (
          SELECT LEAST(9, CAST(FLOOR(prob * 10) AS INT)) AS bin,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pos) AS BIGINT) AS npos
          FROM scored GROUP BY bin
        ),
        pre AS (
          SELECT bin, n, npos,
                 SUM(n) OVER (ORDER BY bin) AS cn,
                 SUM(npos) OVER (ORDER BY bin) AS cp
          FROM b
        ),
        iv AS (
          SELECT lo.bin AS j, hi.bin AS k,
                 1.0 * (hi.cp - (lo.cp - lo.npos))
                     / (hi.cn - (lo.cn - lo.n)) AS avg
          FROM pre lo JOIN pre hi ON lo.bin <= hi.bin
        ),
        inner_min AS (
          SELECT i.bin AS i, iv.j, MIN(iv.avg) AS m
          FROM b i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
          GROUP BY i.bin, iv.j
        ),
        iso AS (SELECT i, MAX(m) AS iso_rate FROM inner_min GROUP BY i)
        SELECT b.bin, b.n,
               ROUND(1.0 * b.npos / b.n, 6) AS acc,
               ROUND(iso.iso_rate, 6) AS iso_acc
        FROM b JOIN iso ON iso.i = b.bin
        ORDER BY b.bin
    """,
    doc="Isotonic calibration (PAVA) of the q148/q149 sigmoid scorer: "
    "the empirical positive rate per confidence bin, replaced by "
    "the best MONOTONE fit via the minimax characterization of "
    "isotonic regression — iso(i) = max over j<=i of min over k>=i "
    "of the pooled rate on bins j..k, which equals the "
    "pool-adjacent-violators solution exactly, needs no iteration, "
    "and is pure SQL on the bin census (prefix sums give every "
    "interval's pooled rate as a ratio of INTEGER counts, so both "
    "engines compute identical doubles). This is the step that "
    "turns q149's calibration DIAGNOSIS (non-monotone acc vs conf) "
    "into the calibration MAP a serving pipeline applies. Plan "
    "shape: one aggregate to B=10 bins; the O(B^2) interval table "
    "and O(B^3)-tuple minimax run on the 10-row census (the q220 "
    "aggregate-first rule) — B stays fixed as the corpus grows.",
)
def q228(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    e = table_parallel(spark, sf, "embeddings")
    score = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.sequence(F.lit(1), F.size("embedding")),
            lambda v, i: v.cast("double")
            * F.when(i % 2 == 1, 1.0).otherwise(-1.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    prob = 1.0 / (1.0 + F.exp(-score * 2.0))
    b = (
        e.select(
            F.least(F.lit(9), F.floor(prob * 10).cast("int")).alias("bin"),
            (F.col("label") == 1).cast("int").alias("pos"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("npos"),
        )
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pre = b.select(
        "bin",
        "n",
        "npos",
        F.sum("n").over(wc).alias("cn"),
        F.sum("npos").over(wc).alias("cp"),
    )
    lo = pre.select(
        F.col("bin").alias("j"),
        (F.col("cp") - F.col("npos")).alias("cp0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    hi = pre.select(
        F.col("bin").alias("k"), F.col("cp").alias("cpk"), F.col("cn").alias("cnk")
    )
    iv = lo.join(hi, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            1.0 * (F.col("cpk") - F.col("cp0")) / (F.col("cnk") - F.col("cn0"))
        ).alias("avg"),
    )
    inner_min = (
        b.select(F.col("bin").alias("i"))
        .join(iv, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avg").alias("m"))
    )
    iso = inner_min.groupBy("i").agg(F.max("m").alias("iso_rate"))
    return (
        b.join(iso, b["bin"] == iso["i"])
        .select(
            "bin",
            "n",
            F.round(1.0 * F.col("npos") / F.col("n"), 6).alias("acc"),
            F.round("iso_rate", 6).alias("iso_acc"),
        )
        .orderBy("bin")
    )


_HUBER_C = 50_000  # cents: $500 clipping scale
_HUBER_ITERS = 5


def _huber_oracle() -> str:
    """Unrolled IRLS iterations (it0..itN CTEs), the q225 pattern."""
    steps = []
    for k in range(_HUBER_ITERS):
        steps.append(
            f"""it{k + 1} AS (
          SELECT p.grp,
                 SUM(p.v * CASE WHEN ABS(p.v - i.mu) <= {_HUBER_C} THEN 1.0
                                ELSE {_HUBER_C} / ABS(p.v - i.mu) END)
                 / SUM(CASE WHEN ABS(p.v - i.mu) <= {_HUBER_C} THEN 1.0
                            ELSE {_HUBER_C} / ABS(p.v - i.mu) END) AS mu
          FROM pts p JOIN it{k} i ON i.grp = p.grp
          GROUP BY p.grp
        )"""
        )
    chain = ",\n        ".join(steps)
    return f"""
        WITH pts AS (
          SELECT o_orderpriority AS grp,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
          FROM orders
        ),
        it0 AS (SELECT grp, AVG(1.0 * v) AS mu FROM pts GROUP BY grp),
        {chain}
        SELECT p.grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(AVG(1.0 * p.v) / 100, 2) AS mean_usd,
               ROUND(MAX(i.mu) / 100, 2) AS huber_usd
        FROM pts p JOIN it{_HUBER_ITERS} i ON i.grp = p.grp
        GROUP BY p.grp ORDER BY p.grp
    """


@register(
    "q229_huber_location",
    oracle=_huber_oracle(),
    doc=f"Huber M-estimator of location per order priority "
    f"({_HUBER_ITERS} IRLS iterations, clipping scale c = "
    f"${_HUBER_C // 100}): the robust mean that downweights "
    "outlier order values linearly beyond c instead of either "
    "keeping them (mean, q63) or discarding rank information "
    "(median, q156/q199) — reported beside the plain mean so the "
    "gap measures tail influence. Each iteration is one pass: the "
    "5-row (group, mu) census broadcasts onto the fact, weights "
    "are a scalar CASE, and one grouped aggregate re-solves mu "
    "(IRLS on a weighted-mean model). The oracle unrolls the "
    "identical iterations as it0..itN CTEs (the q225 recipe). "
    "Inputs are exact integer cents; the 2-dp dollar outputs "
    "tolerate the order-dependent 1e-16 of double weight sums.",
)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    pts = (
        table_parallel(spark, sf, "orders")
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
        .localCheckpoint(eager=False)
    )
    mu = pts.groupBy("grp").agg(F.avg(1.0 * F.col("v")).alias("mu"))
    for _ in range(_HUBER_ITERS):
        dev = F.abs(F.col("v") - F.col("mu"))
        w = F.when(dev <= _HUBER_C, 1.0).otherwise(_HUBER_C / dev)
        mu = (
            pts.join(F.broadcast(mu), "grp")
            .groupBy("grp")
            .agg((F.sum(F.col("v") * w) / F.sum(w)).alias("mu"))
        )
    return (
        pts.join(F.broadcast(mu), "grp")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg(1.0 * F.col("v")) / 100, 2).alias("mean_usd"),
            F.round(F.max("mu") / 100, 2).alias("huber_usd"),
        )
        .orderBy("grp")
    )


@register(
    "q230_markov_perplexity",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type AS src,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS dst
          FROM events
        ),
        t AS (SELECT src, dst, COUNT(*) AS n FROM seq
              WHERE dst IS NOT NULL GROUP BY src, dst),
        m AS (SELECT src, dst, n, SUM(n) OVER (PARTITION BY src) AS nsrc
              FROM t)
        SELECT CAST(SUM(n) AS BIGINT) AS n_transitions,
               ROUND(-SUM(n * LN(1.0 * n / nsrc)) / SUM(n), 6)
                 AS cross_entropy,
               ROUND(EXP(-SUM(n * LN(1.0 * n / nsrc)) / SUM(n)), 6)
                 AS perplexity
        FROM m
    """,
    doc="Sequence perplexity under the q152 first-order Markov model: "
    "the per-transition cross-entropy (nats) and perplexity of the "
    "event stream under its own MLE transition matrix — the "
    "one-number summary of how predictable user behavior is, and "
    "exactly the quantity language-model training tracks (here "
    "over the K-symbol event alphabet; the in-sample MLE "
    "perplexity, a lower bound for any held-out split). Computed "
    "ENTIRELY from the K^2 transition census: -sum(c_ij ln(c_ij / "
    "c_i)) / sum(c_ij), integer counts in, two 6-dp doubles out — "
    "the fact-sized work is the one user-keyed LEAD window q152 "
    "already pays; everything after runs on ~25 rows.",
)
def q230(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        table_parallel(spark, sf, "events")
        .select("user_id", F.col("event_type").alias("src"), "ts", "event_id")
        .withColumn("dst", F.lead("src").over(w))
        .where(F.col("dst").isNotNull())
    )
    t = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    m = t.select(
        "n", F.sum("n").over(Window.partitionBy("src")).alias("nsrc")
    )
    nll = -F.sum(F.col("n") * F.log(1.0 * F.col("n") / F.col("nsrc")))
    return m.agg(
        F.sum("n").cast("long").alias("n_transitions"),
        F.round(nll / F.sum("n"), 6).alias("cross_entropy"),
        F.round(F.exp(nll / F.sum("n")), 6).alias("perplexity"),
    )
