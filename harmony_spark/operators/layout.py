"""File-layout utilities: clustered (sorted) parquet writes for scan
pruning at scale.

At 100 TB the cheapest query is the one that never reads the data.
Parquet stores min/max statistics per row group; Spark pushes
predicates into the reader, which skips any row group whose stats
exclude the predicate. That skipping is only effective if rows are
*clustered* — a random layout gives every row group ~the full value
range, so nothing is skippable. These helpers produce the layout:

  * write_clustered — global range-partition on the cluster keys +
    sort within partitions, then write. Every file owns a disjoint key
    range and every row group within a file covers a narrow slice;
    point/range predicates on the key then touch one file and a couple
    of row groups. This is the open-source emulation of Z-order /
    liquid clustering for the single-key-prefix case (for genuinely
    multi-dimensional pruning, interleave the bits of two keys into a
    computed `zorder_key` column and cluster on that).
  * write_partitioned — directory-level partitioning (`partitionBy`):
    Catalyst prunes entire directories at plan time (PartitionFilters)
    before any file is opened. Use for low-cardinality keys (date,
    tenant); high-cardinality keys belong in the row-group clustering.
  * clustering_quality — measures the layout: reads parquet footers
    (no data pages) and returns the average fraction of row groups a
    random point-lookup on the key must scan. ~1.0 for a random
    layout, ~1/num_row_groups for a perfect clustering. This is the
    number a table-maintenance job would monitor to decide when to
    re-cluster.

The reference engine has no storage layer at all (in-memory matrices,
/root/reference/src/harmony.h:50); this surface exists because a
100 TB engine is mostly a storage-layout engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.registry import register


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
) -> None:
    """Range-partition on cluster_cols (global sort order across files),
    sort within partitions (ordered row groups within each file), write
    parquet. One shuffle — the same cost as any repartition — paid once
    at write time, repaid on every subsequent selective scan."""
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Directory-partitioned write: plan-time pruning via PartitionFilters
    (no file of a non-matching partition is even listed)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (``bucketBy`` + optional ``sortBy``):
    the rows are HASH-partitioned on ``bucket_cols`` at WRITE time, and
    the bucketing metadata lives in the catalog, so every subsequent
    join or aggregation keyed on the bucket columns between tables with
    compatible bucket counts runs with NO shuffle exchange — the
    planner proves both sides are already co-partitioned. This is the
    100 TB answer for the fact-to-fact join that broadcast cannot serve
    (both sides entity-scale) and that would otherwise shuffle both
    tables on every query: pay the partitioning once at ingest, never
    again. ``sort_cols`` additionally orders rows within each bucket
    file, upgrading those joins to sort-merge WITHOUT the sort step.
    Bucketed output must go through the catalog (``saveAsTable``) —
    plain ``.parquet(path)`` cannot record bucket metadata, which is
    why this takes a table name, not a path.
    """
    w = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).format("parquet").saveAsTable(table)


def clustering_quality(path: str, column: str, probes: list | None = None) -> float:
    """Average fraction of row groups a point lookup on `column` must
    read, estimated from parquet footer min/max stats only.

    For each probe value we count row groups whose [min, max] contains
    it. Returns mean(matching/total); lower is better (1.0 = every
    lookup scans everything).

    `probes` defaults to 64 evenly spaced points across the global value
    range — a *uniform-workload* model. For skewed data pass real values
    (e.g. a sample of the column) to get the *mass-weighted* quality:
    the number that matters when lookups arrive in proportion to the
    data, which is where equi-width bucketing falls over and equi-depth
    holds."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    spans: list[tuple] = []  # (min, max) per row group
    for f in files:
        meta = pq.ParquetFile(f).metadata
        try:
            ci = [meta.schema.column(i).name for i in range(meta.num_columns)].index(column)
        except ValueError:
            raise ValueError(f"column {column!r} not in {f}")
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or st.min is None:
                return 1.0  # no stats -> nothing prunable
            spans.append((st.min, st.max))
    if not spans:
        return 1.0
    if probes is None:
        lo = min(s[0] for s in spans)
        hi = max(s[1] for s in spans)
        if hi == lo:
            return 1.0
        probes = [lo + (hi - lo) * i / 63 for i in range(64)]
    fracs = [
        sum(1 for s in spans if s[0] <= p <= s[1]) / len(spans) for p in probes
    ]
    return sum(fracs) / len(fracs)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8, method: str = "equiwidth"):
    """Computed Morton (Z-order) key: each column is mapped to a
    2^bits-bucket grid and the bucket bits are interleaved. Rows close
    in Z-key are close in EVERY clustered dimension, so row-group
    min/max stats become selective for predicates on any single one —
    the plain-parquet emulation of Delta/Iceberg Z-ordering.

    Bucketing methods:
      * ``equiwidth`` — buckets of equal VALUE width over the observed
        min/max (one tiny agg). Right when values are ~uniform; on a
        skewed column most rows collapse into a few buckets and hot-
        range lookups stop pruning.
      * ``equidepth`` — bucket boundaries at the 1/2^bits quantiles
        (one percentile_approx agg), so every bucket holds ~equal ROW
        mass regardless of the value distribution. The boundary array
        is a literal in the plan; bucket assignment is an aggregate()
        over it (<= 255 comparisons/row, JVM-side).

    Returns (column_expression, stats) — equiwidth: the min/max Row;
    equidepth: {col: [boundaries]}. The expression uses only built-in
    ops either way, so it stays in whole-stage codegen."""
    from pyspark.sql import functions as F

    n_buckets = (1 << bits) - 1
    buckets: list = []
    if method == "equiwidth":
        stats = df.agg(
            *[F.min(c).alias(f"min_{c}") for c in cols],
            *[F.max(c).alias(f"max_{c}") for c in cols],
        ).first()
        for c in cols:
            lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
            span = (hi - lo) or 1
            buckets.append(
                F.least(
                    F.lit(n_buckets),
                    ((F.col(c) - F.lit(lo)) * n_buckets / F.lit(span)).cast("long"),
                )
            )
    elif method == "equidepth":
        qs = [i / (1 << bits) for i in range(1, 1 << bits)]
        row = df.agg(
            *[F.percentile_approx(c, qs, 10000).alias(c) for c in cols]
        ).first()
        stats = {}
        for c in cols:
            bounds = sorted(set(row[c]))  # skew collapses quantiles; dedupe
            stats[c] = bounds
            arr = F.array(*[F.lit(b) for b in bounds])
            buckets.append(
                F.aggregate(
                    arr,
                    F.lit(0).cast("long"),
                    lambda acc, b: acc
                    + F.when(F.col(c) > b, F.lit(1)).otherwise(F.lit(0)).cast("long"),
                )
            )
    else:
        raise ValueError(f"unknown zorder method {method!r}")

    z = F.lit(0).cast("long")
    for ci, bucket in enumerate(buckets):
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, j).bitwiseAND(F.lit(1)),
                    j * len(cols) + ci,
                )
            )
    return z, stats


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    method: str = "equiwidth",
) -> None:
    """Cluster on the interleaved key and write: multi-dimensional
    row-group pruning from a single sort, where write_clustered only
    serves its first column. ``method="equidepth"`` switches to
    quantile bucket boundaries — use it when any clustered column is
    skewed (see zorder_key)."""
    z, _ = zorder_key(df, cols, bits, method=method)
    zdf = df.withColumn("_zkey", z)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        zdf.repartitionByRange(n, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_mb: int = 128,
    cluster_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite a parquet directory into ~target_mb files; returns
    (files_before, files_after).

    Streaming sinks (parquet_sink) emit at least one file per trigger,
    and at 100 TB the small-file problem is what kills scan throughput
    (one task + one footer round-trip per tiny file). Compaction is the
    maintenance job: read, re-cluster (optionally on cluster_cols,
    restoring row-group pruning that interleaved appends destroyed),
    write to a staging dir sized from the actual bytes, swap. The swap
    is directory-rename based — atomic on a local/HDFS-style filesystem;
    on object stores run it under a table format or a lock.

    Compacting a STREAMING sink directory drops its _spark_metadata
    manifest: the result is a plain parquet table (batch reads list
    files directly — correct), but the producing stream must restart
    with a fresh checkpoint to keep appending. That lifecycle — drain
    with availableNow, compact, re-point — is the manifest-less
    equivalent of what a table format's commit log automates.
    """
    import glob
    import os
    import shutil

    files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    total_mb = sum(os.path.getsize(f) for f in files) / (1024 * 1024)
    n_out = max(1, round(total_mb / target_mb))

    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "._compact"
    if cluster_cols:
        (
            df.repartitionByRange(n_out, *cluster_cols)
            .sortWithinPartitions(*cluster_cols)
            .write.mode("overwrite")
            .parquet(staging)
        )
    else:
        df.coalesce(n_out).write.mode("overwrite").parquet(staging)

    backup = path.rstrip("/") + "._old"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    new_files = glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    return len(files), len(new_files)


_Z_BITS = 8  # per-dimension resolution of the interleaved key


def _morton_expr(xcol: str, ycol: str, div: str) -> str:
    """Bit-interleave two pre-normalized _Z_BITS-wide integer columns
    into a single Morton (Z-order) key — written as pure +/%//
    arithmetic so the IDENTICAL formula runs in Spark SQL (``DIV``)
    and in the DuckDB oracle (``//``); no engine-specific bit
    operators."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"(({xcol} {div} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "q256_zorder_layout_advisor",
    oracle=f"""
        WITH pts AS (
          SELECT l_partkey AS x,
                 CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                   AS y
          FROM lineitem
        ),
        mm AS (
          SELECT MIN(x) AS minx, MAX(x) AS maxx,
                 MIN(y) AS miny, MAX(y) AS maxy
          FROM pts
        ),
        nrm AS (
          SELECT ((x - minx) * 255) // (maxx - minx) AS x8,
                 ((y - miny) * 255) // (maxy - miny) AS y8,
                 x, y
          FROM pts CROSS JOIN mm
        ),
        keyed AS (
          SELECT x, y, x8, y8, {{morton}} AS morton FROM nrm
        ),
        files AS (
          SELECT 'natural' AS layout, y8 // 4 AS f, x, y FROM keyed
          UNION ALL
          SELECT 'zorder' AS layout, morton // 1024 AS f, x, y FROM keyed
        ),
        per_file AS (
          SELECT layout, f,
                 MAX(x) - MIN(x) AS span_x,
                 MAX(y) - MIN(y) AS span_y,
                 COUNT(*) AS n
          FROM files GROUP BY layout, f
        )
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               ROUND(AVG(span_x), 6) AS avg_span_x,
               ROUND(AVG(span_y), 6) AS avg_span_y,
               CAST(MAX(n) AS BIGINT) AS max_file_rows
        FROM per_file GROUP BY layout ORDER BY layout
    """.replace("{morton}", _morton_expr("x8", "y8", "//")),
    doc="Z-order (Morton) layout advisor: lays lineitem out into 64 "
    "files twice — 'natural' (date-clustered, the layout ingestion "
    "produces for free) vs 'zorder' (bit-interleaved partkey x "
    "ship-day key) — and reports each layout's per-file min/max "
    "SPANS of both columns, the exact statistics parquet row-group "
    "skipping runs on. The natural layout gives perfect date spans "
    "but every file covers ~the full partkey range (a partkey "
    "point-lookup reads all 64 files); the Z-order key shrinks BOTH "
    "spans to ~1/8 of their range, which is the whole argument for "
    "multi-dimensional clustering (Delta OPTIMIZE ZORDER BY, "
    "Iceberg sort orders) — write_zordered (above) produces the "
    "physical layout this query costs out. Scale "
    "shape: two hash aggregates (per-file stats, per-layout "
    "summary) after a pure-projection key computation; the only "
    "join is the 1-row min/max broadcast. The Morton key is "
    "engine-portable +/%-arithmetic, so the oracle replays the "
    "IDENTICAL interleave. Determinism: all-integer.",
)
def q256(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    pts = table_parallel(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("x"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("y"),
    )
    mm = pts.agg(
        F.min("x").alias("minx"),
        F.max("x").alias("maxx"),
        F.min("y").alias("miny"),
        F.max("y").alias("maxy"),
    )
    nrm = pts.crossJoin(F.broadcast(mm)).select(
        "x",
        "y",
        F.expr("((x - minx) * 255) DIV (maxx - minx)").alias("x8"),
        F.expr("((y - miny) * 255) DIV (maxy - miny)").alias("y8"),
    )
    keyed = nrm.withColumn("morton", F.expr(_morton_expr("x8", "y8", "DIV")))
    files = keyed.select(
        F.lit("natural").alias("layout"),
        F.expr("y8 DIV 4").alias("f"),
        "x",
        "y",
    ).unionByName(
        keyed.select(
            F.lit("zorder").alias("layout"),
            F.expr("morton DIV 1024").alias("f"),
            "x",
            "y",
        )
    )
    per_file = files.groupBy("layout", "f").agg(
        (F.max("x") - F.min("x")).alias("span_x"),
        (F.max("y") - F.min("y")).alias("span_y"),
        F.count("*").alias("n"),
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.round(F.avg("span_x"), 6).alias("avg_span_x"),
            F.round(F.avg("span_y"), 6).alias("avg_span_y"),
            F.max("n").cast("long").alias("max_file_rows"),
        )
        .orderBy("layout")
    )


_RDV_NODES = 5


@register(
    "q277_rendezvous_sharding",
    oracle=f"""
    WITH keys AS (SELECT doc_id FROM documents),
    asg AS (
      SELECT k.doc_id, n.n AS node,
             CAST(('0x' || substr(md5(CAST(k.doc_id AS VARCHAR) || '@'
                                      || CAST(n.n AS VARCHAR)), 1, 8))
                  AS BIGINT) AS w
      FROM keys k
      CROSS JOIN (SELECT unnest(generate_series(0, {_RDV_NODES})) AS n) n
    ),
    pick5 AS (
      SELECT doc_id, node FROM (
        SELECT doc_id, node,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY w DESC, node) AS r
        FROM asg WHERE node < {_RDV_NODES}
      ) t WHERE r = 1
    ),
    pick6 AS (
      SELECT doc_id, node FROM (
        SELECT doc_id, node,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY w DESC, node) AS r
        FROM asg
      ) t WHERE r = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN p5.node <> p6.node THEN 1 ELSE 0 END) AS BIGINT)
             AS n_moved,
           ROUND(SUM(CASE WHEN p5.node <> p6.node THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS moved_share,
           CAST(SUM(CASE WHEN p5.node <> p6.node
                          AND p6.node <> {_RDV_NODES}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced
    FROM pick5 p5 JOIN pick6 p6 ON p6.doc_id = p5.doc_id
""",
    doc=f"Rendezvous (highest-random-weight) sharding audit: every "
    "key takes the node with the highest md5(key@node) weight; the "
    "query replays the assignment at {n} and {n1} nodes and "
    "measures churn — HRW's defining guarantee is that adding a "
    "node moves ONLY the keys the new node wins (expected share "
    "1/(n+1), and n_misplaced — keys that moved anywhere else — "
    "must be exactly 0), where naive hash-mod resharding moves "
    "~n/(n+1) of all keys. The placement primitive behind "
    "consistent partition assignment for stateful shards, cache "
    "rings, and the shard-stability property streaming state "
    "migration depends on. Scale shape: a constant {n1}-row node "
    "spine broadcast against the key set (one narrow projection), "
    "then one per-key argmax — no shuffle grows with node count. "
    "Determinism: seedless md5 weights, node-id tiebreaks; both "
    "engines replay identical assignments.".format(
        n=_RDV_NODES, n1=_RDV_NODES + 1
    ),
)
def q277(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from harmony_spark.io import table

    keys = table(spark, sf, "documents").select("doc_id")
    nodes = spark.range(_RDV_NODES + 1).select(F.col("id").alias("node"))
    asg = keys.crossJoin(F.broadcast(nodes)).select(
        "doc_id",
        "node",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("@"),
                        F.col("node").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("w"),
    )

    def pick(df):
        return (
            df.withColumn(
                "r",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy(F.desc("w"), "node")
                ),
            )
            .where(F.col("r") == 1)
            .select("doc_id", "node")
        )

    p5 = pick(asg.where(F.col("node") < _RDV_NODES)).withColumnRenamed(
        "node", "n5"
    )
    p6 = pick(asg).withColumnRenamed("node", "n6")
    j = p5.join(p6, "doc_id")
    return j.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(F.col("n5") != F.col("n6"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
        F.round(
            F.sum(F.when(F.col("n5") != F.col("n6"), 1).otherwise(0))
            * 1.0
            / F.count("*"),
            6,
        ).alias("moved_share"),
        F.sum(
            F.when(
                (F.col("n5") != F.col("n6")) & (F.col("n6") != _RDV_NODES), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_misplaced"),
    )


_JS_HH = 20


@register(
    "q320_join_size_advisor",
    oracle=f"""
        WITH cnt AS (
          SELECT l_partkey, COUNT(*) AS c FROM lineitem GROUP BY l_partkey
        ),
        hh AS (
          SELECT l_partkey, c FROM cnt
          ORDER BY c DESC, l_partkey LIMIT {_JS_HH}
        ),
        hh_est AS (SELECT COALESCE(SUM(c * c), 0) AS e FROM hh),
        rest AS (
          SELECT COUNT(*) AS nd, COALESCE(SUM(c), 0) AS s
          FROM cnt WHERE l_partkey NOT IN (SELECT l_partkey FROM hh)
        ),
        truth AS (SELECT SUM(c * c) AS t FROM cnt)
        SELECT CAST((SELECT t FROM truth) AS BIGINT) AS true_size,
               CAST((SELECT e FROM hh_est)
                    + CASE WHEN (SELECT nd FROM rest) > 0
                           THEN CAST(FLOOR(CAST((SELECT s FROM rest)
                                AS BIGINT)
                                * (SELECT s FROM rest) * 1.0
                                / (SELECT nd FROM rest)) AS BIGINT)
                           ELSE 0 END AS BIGINT) AS estimated_size,
               ROUND(ABS(((SELECT e FROM hh_est)
                    + CASE WHEN (SELECT nd FROM rest) > 0
                           THEN CAST(FLOOR(CAST((SELECT s FROM rest)
                                AS BIGINT)
                                * (SELECT s FROM rest) * 1.0
                                / (SELECT nd FROM rest)) AS BIGINT)
                           ELSE 0 END) * 1.0
                    / (SELECT t FROM truth) - 1), 6) AS rel_error
    """,
    doc="Join-size advisor: estimate |lineitem JOIN lineitem ON "
    "l_partkey| (the self-join cardinality sum(c_k^2) that explodes "
    "under key skew) from per-key statistics WITHOUT executing the "
    "join — the top-20 heavy hitters contribute exactly, the "
    "residual mass under the uniform-frequency assumption "
    "(rest_sum^2 / rest_distinct), the estimator every "
    "cost-based optimizer and the q248/q76 skew tooling need before "
    "deciding broadcast/salt/sort-merge; reported against the exact "
    "truth with relative error. Plan shape: one key census, "
    "TakeOrdered(20) heavy-hitter head, an anti-join residual "
    "census, three 1-row reductions cross-joined (allowlisted); "
    "integer-exact except the error ratio. The truth itself is "
    "computed from the census (sum of squared counts), never by "
    "materializing the quadratic join.",
)
def q320(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel

    cnt = (
        table_parallel(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
    )
    hh = cnt.orderBy(F.desc("c"), "l_partkey").limit(_JS_HH)
    hh_est = hh.agg(
        F.coalesce(F.sum(F.col("c") * F.col("c")), F.lit(0)).alias("e")
    )
    rest = cnt.join(hh.select("l_partkey"), "l_partkey", "left_anti").agg(
        F.count("*").alias("nd"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("s"),
    )
    truth = cnt.agg(F.sum(F.col("c") * F.col("c")).alias("t"))
    est = F.col("e") + F.when(
        F.col("nd") > 0,
        F.floor(
            F.col("s").cast("long") * F.col("s") * 1.0 / F.col("nd")
        ).cast("long"),
    ).otherwise(0)
    return (
        truth.crossJoin(F.broadcast(hh_est))
        .crossJoin(F.broadcast(rest))
        .select(
            F.col("t").cast("long").alias("true_size"),
            est.cast("long").alias("estimated_size"),
            F.round(F.abs(est * 1.0 / F.col("t") - 1), 6).alias(
                "rel_error"
            ),
        )
    )


@register(
    "q325_equidepth_histogram",
    oracle="""
        WITH ranked AS (
          SELECT o_totalprice,
                 NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                   AS bucket
          FROM orders
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM ranked GROUP BY bucket ORDER BY bucket
    """,
    doc="Equi-depth (equal-height) histogram of order values, the "
    "optimizer-statistics structure ANALYZE builds for selectivity "
    "estimation: ten buckets with EXACT type-1 boundaries (NTILE "
    "semantics with orderkey tiebreak), each holding n/10 rows, so "
    "a range predicate's selectivity reads off the covered buckets "
    "regardless of skew — where the equal-WIDTH bins q303/q156 use "
    "collapse under a heavy tail (one bin holds everything). "
    "Complements q320 (join-size estimate) and q256 (layout "
    "advisor) as the third optimizer-statistics primitive. Plan "
    "shape: exact global ntile via dist_rank's range-sharded "
    "two-phase pass (never a single-task window), then one bucket "
    "census.",
)
def q325(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import table_parallel
    from harmony_spark.operators.dist_rank import with_global_ntile

    o = table_parallel(spark, sf, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    d = with_global_ntile(
        o, "o_totalprice", ("o_orderkey",), n=10, out="bucket"
    )
    return (
        d.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            "lo",
            "hi",
        )
        .orderBy("bucket")
    )
