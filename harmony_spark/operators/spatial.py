"""Spatial analytics: grid-bucketed neighbor joins (q263).

The canonical big-big spatial join problem: "find all point pairs
within radius r" is O(N^2) stated naively. The scale pattern is the
uniform grid — hash every point into an r-wide cell, join each point's
cell against the 3x3 neighborhood of the other side's cells (any pair
within r must fall in adjacent cells), and verify the exact distance
on the candidates only. The same decomposition LSH uses for cosine
candidates (extensions/dedup.py) applied to metric space; at 100 TB
the join is cell-keyed equi work with AQE handling dense-city skew,
and no point ever compares against a point two cells away.

Coordinates here are synthesized deterministically from md5(custkey)
(the test tables carry no geo columns); distances are exact integer
squared-Euclidean, so the radius predicate has no float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.registry import register

__all__ = ["q263", "q286", "q289", "q377"]

_SP_R = 20000  # radius in map units; the synthetic world is 1e6 x 1e6


@register(
    "q263_spatial_neighbor_join",
    oracle=f"""
        WITH pts AS (
          SELECT c_custkey AS id, c_nationkey AS nk,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-x'),
                                      1, 8)) AS BIGINT) % 1000000 AS x,
                 CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-y'),
                                      1, 8)) AS BIGINT) % 1000000 AS y
          FROM customer
        ),
        prs AS (
          SELECT a.id AS a_id, b.id AS b_id,
                 (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
                 CASE WHEN a.nk = b.nk THEN 1 ELSE 0 END AS same_nk
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                <= {_SP_R} * {_SP_R}
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(same_nk), 0) AS BIGINT) AS n_same_nation,
               CAST(COALESCE(MIN(d2), 0) AS BIGINT) AS min_dist2,
               CAST(COALESCE(SUM(d2), 0) AS BIGINT) AS sum_dist2
        FROM prs
    """,
    doc=f"Radius-{_SP_R} neighbor self-join over md5-synthesized "
    "customer coordinates on a 1M x 1M map: pair count, same-nation "
    "pair count, and exact integer squared-distance stats. The "
    "oracle runs the literal O(N^2) distance predicate; the engine "
    "runs the GRID decomposition — each point lands in one r-wide "
    "cell, one side explodes into its 3x3 cell neighborhood (a "
    "constant 9x fan-out), and the join is EQUI on cell id, so "
    "candidates are only ever cell-adjacent and each surviving pair "
    "is found exactly once (the non-exploded side's cell is unique). "
    "This is the standard scale plan for spatial joins "
    "(geohash/S2/H3 bucketing) and for any metric-ball join. "
    "Determinism: coordinates from seedless md5, distances exact "
    "BIGINT — the radius threshold has no float boundary anywhere.",
)
def q263(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    def u(suf: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("c_custkey").cast("string"), F.lit(suf))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        )

    pts = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nk"),
        u("-x").alias("x"),
        u("-y").alias("y"),
    )
    a = pts.select(
        F.col("id").alias("a_id"),
        F.col("nk").alias("a_nk"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.expr(f"(x DIV {_SP_R}) * 1024 + (y DIV {_SP_R})").alias("cell"),
    )
    b = (
        pts.select(
            F.col("id").alias("b_id"),
            F.col("nk").alias("b_nk"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
        )
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn(
            "cell",
            F.expr(f"(bx DIV {_SP_R} + dx) * 1024 + (by DIV {_SP_R} + dy)"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    prs = (
        a.join(b, "cell")
        .where((F.col("a_id") < F.col("b_id")) & (d2 <= _SP_R * _SP_R))
        .select(
            d2.alias("d2"),
            F.when(F.col("a_nk") == F.col("b_nk"), 1)
            .otherwise(0)
            .alias("same_nk"),
        )
    )
    return prs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.coalesce(F.sum("same_nk"), F.lit(0))
        .cast("long")
        .alias("n_same_nation"),
        F.coalesce(F.min("d2"), F.lit(0)).cast("long").alias("min_dist2"),
        F.coalesce(F.sum("d2"), F.lit(0)).cast("long").alias("sum_dist2"),
    )


_GD_CELL = 50000  # density-grid cell width
_GD_MINPTS = 3  # core-cell density threshold
# Driver union-find allowlist for the grid-bounded core-cell graph: the
# cell census never exceeds (10^6/_GD_CELL)^2 cells (= 400 at this cell
# width) no matter the input scale, so collecting its edge list is safe
# by construction.  Set to 0 to force the distributed star-CC path.
_GD_CC_DRIVER_MAX = 100_000


@register(
    "q286_grid_density_clusters",
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT c_custkey AS id,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-x'),
                                  1, 8)) AS BIGINT) % 1000000 AS x,
             CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '-y'),
                                  1, 8)) AS BIGINT) % 1000000 AS y
      FROM customer
    ),
    cells AS (
      SELECT x // {_GD_CELL} AS cx, y // {_GD_CELL} AS cy, COUNT(*) AS n
      FROM pts GROUP BY cx, cy
    ),
    core AS (
      SELECT cx * 1024 + cy AS cell, cx, cy, n FROM cells
      WHERE n >= {_GD_MINPTS}
    ),
    adj AS (
      SELECT a.cell AS ca, b.cell AS cb
      FROM core a JOIN core b
        ON ABS(a.cx - b.cx) <= 1 AND ABS(a.cy - b.cy) <= 1
       AND a.cell < b.cell
    ),
    bi AS (SELECT ca AS a, cb AS b FROM adj
           UNION ALL SELECT cb AS a, ca AS b FROM adj),
    reach(a, b) AS (
      SELECT a, b FROM bi
      UNION
      SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a),
    comp AS (
      SELECT c.cell, COALESCE(LEAST(c.cell, m.mn), c.cell) AS cid
      FROM core c LEFT JOIN (
        SELECT a, MIN(b) AS mn FROM reach GROUP BY a
      ) m ON m.a = c.cell
    ),
    sizes AS (
      SELECT cm.cid, CAST(SUM(co.n) AS BIGINT) AS n_points,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM comp cm JOIN core co ON co.cell = cm.cell
      GROUP BY cm.cid
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sizes) AS n_clusters,
           (SELECT CAST(MAX(n_points) AS BIGINT) FROM sizes)
             AS largest_cluster_points,
           (SELECT CAST(MAX(n_cells) AS BIGINT) FROM sizes)
             AS largest_cluster_cells,
           (SELECT CAST(SUM(n_points) AS BIGINT) FROM sizes)
             AS clustered_points,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pts)
             - (SELECT CAST(SUM(n_points) AS BIGINT) FROM sizes)
             AS noise_points
""",
    doc="Grid-density clustering (DBSCAN-lite): cells with >= 3 "
    "points are core; clusters are connected components over the "
    "8-neighborhood of core cells; points in non-core cells are "
    "noise — the density-based clustering that finds arbitrary-"
    "shaped hotspots where centroid methods (core/kmeans.py) "
    "assume convex blobs, at grid resolution instead of exact "
    "point-epsilon resolution (the approximation that makes DBSCAN "
    "tractable at all at 100 TB: the O(N) pass is one cell-keyed "
    "count, after which EVERYTHING — adjacency, components, sizes — "
    "runs on the core-cell CENSUS). Composes the q263 grid with "
    "the star CC operator (graph.connected_components, O(log n) "
    "rounds). The oracle replays the identical cell graph with a "
    "recursive-CTE closure. Determinism: integer cells and counts "
    "end-to-end.",
)
def q286(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    def u(suf):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("c_custkey").cast("string"), F.lit(suf))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        )

    pts = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("id"), u("-x").alias("x"), u("-y").alias("y")
    )
    cells = pts.groupBy(
        F.expr(f"x DIV {_GD_CELL}").alias("cx"),
        F.expr(f"y DIV {_GD_CELL}").alias("cy"),
    ).agg(F.count("*").alias("n"))
    core = cells.where(F.col("n") >= _GD_MINPTS).select(
        (F.col("cx") * 1024 + F.col("cy")).alias("cell"), "cx", "cy", "n"
    ).localCheckpoint(eager=True)
    a = core.select(
        F.col("cell").alias("ca"), F.col("cx").alias("ax"), F.col("cy").alias("ay")
    )
    b = (
        core.select(
            F.col("cell").alias("cb"),
            F.col("cx").alias("bx"),
            F.col("cy").alias("by"),
        )
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            "cb",
            (F.col("bx") + F.col("dx")).alias("ax"),
            (F.col("by") + F.col("dy")).alias("ay"),
        )
    )
    adj = (
        a.join(b, ["ax", "ay"])
        .where(F.col("ca") < F.col("cb"))
        .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
    )
    # The core-cell graph is GRID-bounded by construction (cx, cy are
    # both < 10^6/_GD_CELL, so <= ~(10^6/_GD_CELL)^2 cells regardless of
    # how many points feed it — at 100 TB the cell census is exactly as
    # small as it is here).  When the edge census is under the driver
    # allowlist threshold, collect it and union-find on the driver
    # (O(E α(E)) instead of O(log n) distributed join rounds — the same
    # explicit-allowlist discipline as the 1-row broadcasts); the
    # distributed star-CC path remains for an unbounded cell graph.
    # limit(MAX+1) bounds the driver transfer BEFORE paying it: if the
    # limit is hit, fall back to distributed CC without ever having
    # collected more than the threshold (mirrors q262's histogram gate).
    edges = (
        adj.limit(_GD_CC_DRIVER_MAX + 1).collect() if _GD_CC_DRIVER_MAX else None
    )
    if edges is not None and len(edges) <= _GD_CC_DRIVER_MAX:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for e in edges:
            ra, rb = find(e["src"]), find(e["dst"])
            if ra != rb:
                # union by min id so the label matches the distributed
                # CC's min-node convention exactly
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        labels = sorted({n for e in edges for n in (e["src"], e["dst"])})
        cc = spark.createDataFrame(
            [(n, find(n)) for n in labels] or [(None, None)],
            "node long, component long",
        ).where(F.col("node").isNotNull())
    else:
        from harmony_spark.operators.graph import connected_components

        cc = connected_components(adj)  # (node, component); no singletons
    comp = core.join(
        cc.select(F.col("node").alias("cell"), "component"), "cell", "left"
    ).select(
        "cell", "n", F.coalesce("component", F.col("cell")).alias("cid")
    )
    sizes = comp.groupBy("cid").agg(
        F.sum("n").alias("n_points"), F.count("*").alias("n_cells")
    )
    agg = sizes.agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.max("n_points").cast("long").alias("largest_cluster_points"),
        F.max("n_cells").cast("long").alias("largest_cluster_cells"),
        F.sum("n_points").cast("long").alias("clustered_points"),
    )
    tot = pts.agg(F.count("*").alias("n_total"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "n_clusters",
        "largest_cluster_points",
        "largest_cluster_cells",
        "clustered_points",
        (F.col("n_total") - F.col("clustered_points"))
        .cast("long")
        .alias("noise_points"),
    )


_GM_ITERS = 3


def _gm_oracle() -> str:
    """Unrolled Weiszfeld iterations c0..cN as scalar CTEs."""
    steps = []
    for k in range(_GM_ITERS):
        steps.append(f"""w{k} AS (
          SELECT SUM(p.x / SQRT((p.x - c.cx) * (p.x - c.cx)
                                + (p.y - c.cy) * (p.y - c.cy) + 1.0)) AS sx,
                 SUM(p.y / SQRT((p.x - c.cx) * (p.x - c.cx)
                                + (p.y - c.cy) * (p.y - c.cy) + 1.0)) AS sy,
                 SUM(1.0 / SQRT((p.x - c.cx) * (p.x - c.cx)
                                + (p.y - c.cy) * (p.y - c.cy) + 1.0)) AS sw
          FROM pts p CROSS JOIN c{k} c
        ),
        c{k + 1} AS (SELECT sx / sw AS cx, sy / sw AS cy FROM w{k})""")
    chain = ",\n        ".join(steps)
    return """
        WITH pts AS (
          SELECT CAST(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                                               || '-x'), 1, 8)) AS BIGINT)
                      % 1000000 AS DOUBLE) AS x,
                 CAST(CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                                               || '-y'), 1, 8)) AS BIGINT)
                      % 1000000 AS DOUBLE) AS y
          FROM customer
        ),
        c0 AS (SELECT AVG(x) AS cx, AVG(y) AS cy FROM pts),
        {chain},
        final AS (SELECT cx, cy FROM c{n}),
        cost AS (
          SELECT SUM(SQRT((p.x - f.cx) * (p.x - f.cx)
                          + (p.y - f.cy) * (p.y - f.cy))) AS tc
          FROM pts p CROSS JOIN final f
        ),
        mcost AS (
          SELECT SUM(SQRT((p.x - m.cx) * (p.x - m.cx)
                          + (p.y - m.cy) * (p.y - m.cy))) AS tc
          FROM pts p CROSS JOIN c0 m
        )
        SELECT ROUND((SELECT cx FROM final), 2) AS median_x,
               ROUND((SELECT cy FROM final), 2) AS median_y,
               ROUND((SELECT tc FROM cost), 2) AS total_distance,
               ROUND((SELECT tc FROM mcost), 2) AS mean_total_distance
    """.format(chain=chain, n=_GM_ITERS)


@register(
    "q289_geometric_median",
    oracle=_gm_oracle(),
    doc=f"Geometric median of the customer point cloud by "
    "{n} Weiszfeld iterations from the centroid (smoothed weights "
    "1/sqrt(d^2+1)), reporting the total-travel-distance objective "
    "against the plain centroid's — the robust facility-location "
    "answer (minimize SUM of distances, not squared distances: one "
    "remote outpost drags the mean, barely moves the median). Each "
    "iteration is ONE aggregate over the points with the current "
    "center as a 1-row broadcast — O(N) per round, no pairwise "
    "anything, the same broadcast-scalar iteration shape as the "
    "harmony centroid updates. The oracle replays the identical "
    "unrolled iterations as scalar CTEs. Determinism: identical "
    "md5-synthesized doubles through IEEE-exact sqrt/divide; "
    "summation-order effects are absorbed by the 2-dp rounding on "
    "1e6-scale outputs.".format(n=_GM_ITERS),
)
def q289(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    def u(suf):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("c_custkey").cast("string"), F.lit(suf))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        ).cast("double")

    pts = table_parallel(spark, sf, "customer").select(
        u("-x").alias("x"), u("-y").alias("y")
    ).localCheckpoint(eager=True)
    c = pts.agg(F.avg("x").alias("cx"), F.avg("y").alias("cy"))
    mean_c = c
    for _ in range(_GM_ITERS):
        d = (
            pts.crossJoin(F.broadcast(c))
            .select(
                "x",
                "y",
                (
                    1.0
                    / F.sqrt(
                        (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                        + (F.col("y") - F.col("cy"))
                        * (F.col("y") - F.col("cy"))
                        + 1.0
                    )
                ).alias("w"),
            )
        )
        c = d.agg(
            (F.sum(F.col("x") * F.col("w")) / F.sum("w")).alias("cx"),
            (F.sum(F.col("y") * F.col("w")) / F.sum("w")).alias("cy"),
        )
    cost = (
        pts.crossJoin(F.broadcast(c))
        .agg(
            F.sum(
                F.sqrt(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                    + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
                )
            ).alias("tc")
        )
    )
    mcost = (
        pts.crossJoin(F.broadcast(mean_c))
        .agg(
            F.sum(
                F.sqrt(
                    (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
                    + (F.col("y") - F.col("cy")) * (F.col("y") - F.col("cy"))
                )
            ).alias("mtc")
        )
    )
    return (
        c.crossJoin(cost)
        .crossJoin(mcost)
        .select(
            F.round("cx", 2).alias("median_x"),
            F.round("cy", 2).alias("median_y"),
            F.round("tc", 2).alias("total_distance"),
            F.round("mtc", 2).alias("mean_total_distance"),
        )
    )


_MI_G = 100000  # 10x10 coarse grid over the 1e6 synthetic world


@register(
    "q377_morans_i",
    oracle=rf"""
        WITH pts AS (
          SELECT (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                       || '-x'), 1, 8)) AS BIGINT) % 1000000)
                   // {_MI_G} AS cx,
                 (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                       || '-y'), 1, 8)) AS BIGINT) % 1000000)
                   // {_MI_G} AS cy
          FROM customer
        ),
        cells AS (SELECT cx, cy, COUNT(*) AS v FROM pts GROUP BY cx, cy),
        tot AS (SELECT AVG(v) AS mu, COUNT(*) AS n FROM cells),
        dev AS (SELECT cx, cy, v - mu AS d, n FROM cells CROSS JOIN tot),
        offs AS (
          SELECT dx.dx, dy.dy
          FROM (SELECT unnest([-1, 0, 1]) AS dx) dx
          CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dy
          WHERE NOT (dx.dx = 0 AND dy.dy = 0)
        ),
        pairs AS (
          SELECT a.d AS da, b.d AS db, a.n
          FROM dev a
          JOIN (SELECT d0.cx + o.dx AS ax, d0.cy + o.dy AS ay, d0.d
                FROM dev d0 CROSS JOIN offs o) b
            ON b.ax = a.cx AND b.ay = a.cy
        ),
        num AS (SELECT SUM(da * db) AS cross_sum, COUNT(*) AS w, MAX(n) AS n
                FROM pairs),
        den AS (SELECT SUM(d * d) AS ss FROM dev)
        SELECT CAST(n AS BIGINT) AS n_cells,
               CAST(w AS BIGINT) AS n_neighbor_pairs,
               ROUND((n * 1.0 / w) * cross_sum / ss, 6) AS morans_i
        FROM num CROSS JOIN den
    """,
    doc="Moran's I spatial autocorrelation of customer density over the "
    "10x10 coarse grid (8-adjacency rook+bishop weights, w=1): I near "
    "-1/(n-1) = no spatial structure (the expected value under the "
    "null, NOT zero), positive = hot spots cluster — the global "
    "is-there-geography test run BEFORE q286's cluster extraction "
    "spends effort finding WHERE. Same md5-synthesized coordinates as "
    "q263/q286 (engine-portable, no RNG). Plan: the cell census is "
    "GRID-bounded regardless of point count; the neighbor join is the "
    "q286 offset-explode equi-join on cell ids (8 offsets, never "
    "all-pairs); both moments are census-local. At 100 TB only the "
    "cell-count aggregate touches the data.",
)
def q377(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    def u(suf: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("c_custkey").cast("string"), F.lit(suf))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 1000000
        )

    cells = (
        table_parallel(spark, sf, "customer")
        .select(
            (u("-x") / _MI_G).cast("long").alias("cx"),
            (u("-y") / _MI_G).cast("long").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("v"))
        # cells feeds the grand mean AND the deviation frame; dev then
        # fans out to both sides of the neighbour join — two lazy
        # checkpoints keep the grid census from being rebuilt 3x.
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.avg("v").alias("mu"), F.count("*").alias("n"))
    dev = (
        cells.crossJoin(F.broadcast(tot))
        .select("cx", "cy", (F.col("v") - F.col("mu")).alias("d"), "n")
        .localCheckpoint(eager=False)
    )
    a = dev.select(
        F.col("cx").alias("ax"),
        F.col("cy").alias("ay"),
        F.col("d").alias("da"),
        "n",
    )
    b = (
        dev.select(
            F.col("cx").alias("bx0"),
            F.col("cy").alias("by0"),
            F.col("d").alias("db"),
        )
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .where((F.col("dx") != 0) | (F.col("dy") != 0))
        .select(
            (F.col("bx0") + F.col("dx")).alias("ax"),
            (F.col("by0") + F.col("dy")).alias("ay"),
            "db",
        )
    )
    num = a.join(b, ["ax", "ay"]).agg(
        F.sum(F.col("da") * F.col("db")).alias("cross_sum"),
        F.count("*").alias("w"),
        F.max("n").alias("n"),
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("ss"))
    return num.crossJoin(F.broadcast(den)).select(
        F.col("n").cast("long").alias("n_cells"),
        F.col("w").cast("long").alias("n_neighbor_pairs"),
        F.round(
            (F.col("n") / F.col("w")) * F.col("cross_sum") / F.col("ss"), 6
        ).alias("morans_i"),
    )
