"""CDC / warehouse-maintenance operators: SCD2 history build and
MERGE-INTO upsert emulation.

Spark without a table format (Delta/Iceberg, absent in this container)
has no MERGE INTO; the engine answer is the full-outer-join merge —
the same physical plan those formats produce underneath. SCD2
(slowly-changing-dimension type 2) compaction is the companion op:
collapse an append-only change log into validity-interval rows. Both
are key-partitioned window/join plans: shuffle keyed on the business
key only, nothing global, so the plan is per-key-parallel at any
corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmony_spark.io import table, table_parallel
from harmony_spark.registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def scd2_history(
    log: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an append-only change log into SCD2 validity intervals.

    Gaps-and-islands: per key (ordered by event time), a new island
    starts whenever ``attr`` differs from its predecessor; each island
    becomes one row with [valid_from, valid_to) and an is_current
    flag. One ranking window + one aggregate + one lead window, all
    partitioned by the business key — the shuffle is keyed on ``key``
    alone and each key's history is processed independently.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    flagged = log.withColumn(
        "_chg",
        F.when(
            F.lag(attr).over(w).isNull() | (F.lag(attr).over(w) != F.col(attr)), 1
        ).otherwise(0),
    ).withColumn("_grp", F.sum("_chg").over(w))
    islands = flagged.groupBy(key, "_grp").agg(
        F.first(attr).alias(attr), F.min(ts_col).alias("_from")
    )
    w2 = Window.partitionBy(key).orderBy("_grp")
    return islands.select(
        key,
        attr,
        F.col("_from").alias("valid_from"),
        F.lead("_from").over(w2).alias("valid_to"),
        F.lead("_from").over(w2).isNull().alias("is_current"),
    )


@register(
    "q113_scd2_history",
    oracle="""
        WITH flagged AS (
          SELECT user_id, ts, event_type,
                 CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events WHERE user_id < 40
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        grp AS (
          SELECT user_id, ts, event_type,
                 SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS g
          FROM flagged
        ),
        islands AS (
          SELECT user_id, g, ANY_VALUE(event_type) AS event_type,
                 MIN(ts) AS vf
          FROM grp GROUP BY user_id, g
        )
        SELECT user_id, event_type,
               strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               COALESCE(strftime(LEAD(vf) OVER w2, '%Y-%m-%d %H:%M:%S.%f'),
                        'current') AS valid_to,
               CAST(LEAD(vf) OVER w2 IS NULL AS BOOLEAN) AS is_current
        FROM islands
        WINDOW w2 AS (PARTITION BY user_id ORDER BY g)
        ORDER BY user_id, valid_from
    """,
    doc="SCD2 dimension-history build from an append-only event log "
    "(users' event_type as the tracked attribute): consecutive equal "
    "values collapse into one validity-interval row "
    "[valid_from, valid_to) with an is_current flag - the "
    "gaps-and-islands compaction every CDC pipeline runs. All three "
    "steps (change flag, island id, interval close) are windows/aggs "
    "partitioned by the business key; the oracle recomputes it "
    "independently in DuckDB window SQL.",
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    log = (
        table_parallel(spark, sf, "events")
        .where(F.col("user_id") < 40)
        .select("user_id", "ts", "event_type", "event_id")
    )
    hist = scd2_history(log, key="user_id", attr="event_type", tiebreak="event_id")
    return hist.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", _TS_FMT).alias("valid_from"),
        F.coalesce(F.date_format("valid_to", _TS_FMT), F.lit("current")).alias(
            "valid_to"
        ),
        "is_current",
    ).orderBy("user_id", "valid_from")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_set: dict[str, Column],
    insert_values: dict[str, Column],
) -> DataFrame:
    """MERGE INTO emulation: full outer join on the business key, then
    per-row resolution - matched rows take ``update_set`` expressions,
    source-only rows materialize from ``insert_values``, target-only
    rows pass through. This is the physical plan Delta/Iceberg MERGE
    lowers to; without a transactional format the caller rewrites the
    result atomically via write-new + rename (see layout.compact_parquet
    for the pattern). Shuffle is the one equi-join on ``key``; AQE
    broadcasts a small change set, which is the common CDC shape
    (daily delta << dimension).
    """
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col(f"t.{key}").isNotNull() & F.col(f"s.{key}").isNotNull()
    insert_only = F.col(f"t.{key}").isNull()
    cols = []
    for c in target.columns:
        upd = update_set.get(c, F.col(f"t.{c}"))
        ins = insert_values[c] if c in insert_values else F.lit(None)
        cols.append(
            F.when(matched, upd).when(insert_only, ins).otherwise(F.col(f"t.{c}")).alias(c)
        )
    return joined.select(*cols)


@register(
    "q114_merge_upsert",
    oracle="""
        WITH delta AS (
          -- integer cents end-to-end: float ROUND at a half-cent
          -- boundary flips between engines when the SUM order differs
          SELECT o_custkey AS k,
                 SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) // 1000 AS d
          FROM orders WHERE o_custkey % 7 = 0 GROUP BY o_custkey
        ),
        src AS (
          SELECT k, d FROM delta
          UNION ALL
          SELECT k + 10000000, d // 2 FROM delta WHERE k % 21 = 0
        ),
        merged AS (
          SELECT COALESCE(t.c_custkey, s.k) AS c_custkey,
                 CASE WHEN t.c_custkey IS NOT NULL AND s.k IS NOT NULL
                        THEN CAST(ROUND(t.c_acctbal * 100, 0) AS BIGINT) + s.d
                      WHEN t.c_custkey IS NULL THEN s.d
                      ELSE CAST(ROUND(t.c_acctbal * 100, 0) AS BIGINT)
                 END AS bal_cents,
                 CASE WHEN t.c_custkey IS NULL THEN CAST(s.k % 25 AS INTEGER)
                      ELSE t.c_nationkey END AS c_nationkey
          FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.k
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(bal_cents) AS BIGINT) AS total_bal_cents
        FROM merged GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="MERGE INTO emulation (upsert without a table format): a "
    "per-customer order-value delta updates matched customers' "
    "balances and inserts synthetic not-matched keys, then a "
    "per-nation census of the post-merge dimension. Matched/insert/"
    "pass-through resolution in ONE full-outer-join projection; the "
    "oracle replays the same MERGE semantics in SQL. The change set "
    "aggregates before the join, so the merge shuffles the delta "
    "(small) against the dimension keyed on the business key.",
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    delta = (
        table(spark, sf, "orders")
        .where(F.col("o_custkey") % 7 == 0)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum(cents).alias("sc"))
        .select("k", F.expr("sc div 1000").alias("d"))  # exact integral div
    )
    src = delta.unionByName(
        delta.where(F.col("k") % 21 == 0).select(
            (F.col("k") + 10000000).alias("k"), F.expr("d div 2").alias("d")
        )
    )
    target = (
        table(spark, sf, "customer")
        .select("c_custkey", "c_acctbal", "c_nationkey")
        .withColumn("bal_cents", F.round(F.col("c_acctbal") * 100, 0).cast("long"))
        .drop("c_acctbal")
    )
    merged = merge_upsert(
        target,
        src.withColumnRenamed("k", "c_custkey"),
        key="c_custkey",
        update_set={"bal_cents": F.col("t.bal_cents") + F.col("s.d")},
        insert_values={
            "c_custkey": F.col("s.c_custkey"),
            "bal_cents": F.col("s.d"),
            "c_nationkey": (F.col("s.c_custkey") % 25).cast("int"),
        },
    )
    return (
        merged.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("bal_cents").cast("long").alias("total_bal_cents"),
        )
        .orderBy("c_nationkey")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, digest: Column
) -> DataFrame:
    """Row-level diff of two table snapshots: full outer join on the
    business key comparing a content digest, labeling each key added /
    removed / changed / unchanged. The audit query behind incremental
    pipelines without a table format's changelog: both sides reduce to
    (key, digest) projections before the join, so 100 TB of content
    diffs by shuffling 16-byte digests only."""
    o = old.select(F.col(key).alias("k"), digest.alias("dg")).alias("o")
    n = new.select(F.col(key).alias("k"), digest.alias("dg")).alias("n")
    j = o.join(n, F.col("o.k") == F.col("n.k"), "full_outer")
    status = (
        F.when(F.col("o.k").isNull(), "added")
        .when(F.col("n.k").isNull(), "removed")
        .when(F.col("o.dg") != F.col("n.dg"), "changed")
        .otherwise("unchanged")
    )
    return j.select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias(key), status.alias("status")
    )


@register(
    "q120_snapshot_diff",
    oracle="""
        WITH snap_a AS (
          SELECT doc_id, source, md5(text) AS dg
          FROM documents WHERE doc_id % 10 <> 0
        ),
        snap_b AS (
          SELECT doc_id, source,
                 md5(CASE WHEN doc_id % 5 = 0 THEN upper(text) ELSE text END) AS dg
          FROM documents WHERE doc_id % 7 <> 0
        ),
        d AS (
          SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                 COALESCE(a.source, b.source) AS source,
                 CASE WHEN a.doc_id IS NULL THEN 'added'
                      WHEN b.doc_id IS NULL THEN 'removed'
                      WHEN a.dg <> b.dg THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
        )
        SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM d GROUP BY source, status ORDER BY source, status
    """,
    doc="Snapshot diff / audit: two synthetic snapshots of the corpus "
    "(disjoint retention rules + a simulated in-place edit) compared "
    "by content digest on the business key, censused as added / "
    "removed / changed / unchanged per source. The incremental-"
    "pipeline primitive a changelog-less lake needs; both snapshots "
    "project to (key, md5) before the one full-outer equi-join, so "
    "document text never shuffles.",
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    docs = table_parallel(spark, sf, "documents")
    snap_a = docs.where(F.col("doc_id") % 10 != 0)
    snap_b = docs.where(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0, F.upper("text")).otherwise(F.col("text")),
    )
    src_map = docs.select("doc_id", "source")
    d = snapshot_diff(snap_a, snap_b, "doc_id", F.md5(F.col("text").cast("binary")))
    return (
        d.join(src_map, "doc_id")
        .groupBy("source", "status")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("source", "status")
    )


@register(
    "q124_data_quality_checks",
    oracle="""
        SELECT 'orders_custkey_fk' AS chk,
               CAST((SELECT COUNT(*) FROM orders o
                     LEFT JOIN customer c ON c.c_custkey = o.o_custkey
                     WHERE c.c_custkey IS NULL) AS BIGINT) AS n_violations
        UNION ALL
        SELECT 'lineitem_orderkey_fk',
               CAST((SELECT COUNT(*) FROM lineitem l
                     LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
                     WHERE o.o_orderkey IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'orders_pk_unique',
               CAST((SELECT COALESCE(SUM(n - 1), 0) FROM
                     (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey) t
                     WHERE n > 1) AS BIGINT)
        UNION ALL
        SELECT 'lineitem_qty_range',
               CAST((SELECT COUNT(*) FROM lineitem
                     WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
        UNION ALL
        SELECT 'orders_date_not_null',
               CAST((SELECT COUNT(*) FROM orders
                     WHERE o_orderdate IS NULL) AS BIGINT)
        UNION ALL
        SELECT 'customer_acctbal_finite',
               CAST((SELECT COUNT(*) FROM customer
                     WHERE c_acctbal IS NULL OR isnan(c_acctbal)
                        OR isinf(c_acctbal)) AS BIGINT)
        ORDER BY chk
    """,
    doc="Data-quality constraint suite (the dbt/Great-Expectations "
    "audit shape): referential integrity via left-anti probes "
    "(orders->customer, lineitem->orders), primary-key uniqueness as "
    "excess-count, accepted-range, not-null, and finite-value checks, "
    "each reduced to a violation count in one row. Every check is one "
    "scan + (for the FKs) one key-only join - checks over different "
    "tables run as independent jobs, and none moves more than keys. "
    "The FK anti-joins broadcast the dimension side at this scale; at "
    "100 TB they become the same shuffle as any fact-dim join.",
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    li = table(spark, sf, "lineitem")

    def one(chk: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("long").alias("n_violations")).select(
            F.lit(chk).alias("chk"), "n_violations"
        )

    fk_orders = orders.join(
        cust.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "left_anti",
    )
    fk_line = li.join(
        orders.select("o_orderkey"),
        li.l_orderkey == F.col("o_orderkey"),
        "left_anti",
    )
    pk_dupes = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("n_violations"))
        .select(F.lit("orders_pk_unique").alias("chk"), "n_violations")
    )
    qty_range = li.where((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
    date_null = orders.where(F.col("o_orderdate").isNull())
    bal_finite = cust.where(
        F.col("c_acctbal").isNull()
        | F.isnan("c_acctbal")
        | (F.abs("c_acctbal") == float("inf"))
    )
    return (
        one("orders_custkey_fk", fk_orders)
        .unionByName(one("lineitem_orderkey_fk", fk_line))
        .unionByName(pk_dupes)
        .unionByName(one("lineitem_qty_range", qty_range))
        .unionByName(one("orders_date_not_null", date_null))
        .unionByName(one("customer_acctbal_finite", bal_finite))
        .orderBy("chk")
    )


@register(
    "q134_pit_enrichment",
    oracle="""
        WITH views AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN value < 20 THEN 'low'
                      WHEN value < 60 THEN 'mid' ELSE 'high' END AS seg
          FROM events WHERE user_id < 40 AND event_type = 'view'
        ),
        flagged AS (
          SELECT user_id, ts, seg,
                 CASE WHEN LAG(seg) OVER w IS DISTINCT FROM seg
                      THEN 1 ELSE 0 END AS chg
          FROM views
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        grp AS (
          SELECT user_id, ts, seg,
                 SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS g
          FROM flagged
        ),
        islands AS (
          SELECT user_id, g, ANY_VALUE(seg) AS seg, MIN(ts) AS vf
          FROM grp GROUP BY user_id, g
        ),
        hist AS (
          SELECT user_id, seg, vf, LEAD(vf) OVER w2 AS vt
          FROM islands WINDOW w2 AS (PARTITION BY user_id ORDER BY g)
        ),
        fact AS (
          SELECT user_id, ts, value FROM events
          WHERE user_id < 40 AND event_type = 'purchase'
        ),
        pit AS (
          SELECT COALESCE(h.seg, 'unknown') AS seg, f.value
          FROM fact f LEFT JOIN hist h
            ON h.user_id = f.user_id
           AND f.ts >= h.vf AND (h.vt IS NULL OR f.ts < h.vt)
        )
        SELECT seg,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               ROUND(SUM(value), 2) AS value_sum
        FROM pit GROUP BY seg ORDER BY seg
    """,
    doc="Point-in-time-correct enrichment - the feature-store join that "
    "keeps training data free of lookahead leakage: each purchase is "
    "enriched with the user's browsing segment (SCD2 history built "
    "from 'view' events via scd2_history) that was valid AT the "
    "purchase timestamp, never a later one; purchases before any view "
    "get 'unknown'. Joining the current dimension instead would leak "
    "future attribute values into past training rows - the classic "
    "offline/online skew bug. Shuffle shape: the PIT join is an "
    "equi-join on the business key with a residual validity-interval "
    "filter (at most one interval matches), so it costs exactly one "
    "user-keyed shuffle; history and facts both stay partitioned by "
    "the key at any scale.",
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    seg = (
        F.when(F.col("value") < 20, "low")
        .when(F.col("value") < 60, "mid")
        .otherwise("high")
    )
    ev = table_parallel(spark, sf, "events").where(F.col("user_id") < 40)
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", seg.alias("seg")
    )
    hist = scd2_history(views, key="user_id", attr="seg", tiebreak="event_id")
    fact = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    f, h = fact.alias("f"), hist.alias("h")
    pit = f.join(
        h,
        (F.col("h.user_id") == F.col("f.user_id"))
        & (F.col("f.ts") >= F.col("h.valid_from"))
        & (F.col("h.valid_to").isNull() | (F.col("f.ts") < F.col("h.valid_to"))),
        "left",
    ).select(F.coalesce(F.col("h.seg"), F.lit("unknown")).alias("seg"), "f.value")
    return (
        pit.groupBy("seg")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("seg")
    )


@register(
    "q311_ivm_window_advance",
    oracle="""
        WITH leavers AS (
          SELECT o_custkey, COUNT(*) AS dn,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS dc
          FROM orders
          WHERE o_orderdate >= DATE '1995-01-01'
            AND o_orderdate < DATE '1996-01-01'
          GROUP BY o_custkey
        ),
        enterers AS (
          SELECT o_custkey, COUNT(*) AS dn,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS dc
          FROM orders
          WHERE o_orderdate >= DATE '1998-01-01'
            AND o_orderdate < DATE '1999-01-01'
          GROUP BY o_custkey
        ),
        base AS (
          SELECT o_custkey, COUNT(*) AS n,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders
          WHERE o_orderdate >= DATE '1995-01-01'
            AND o_orderdate < DATE '1998-01-01'
          GROUP BY o_custkey
        ),
        merged AS (
          SELECT COALESCE(b.o_custkey, l.o_custkey, e.o_custkey) AS o_custkey,
                 COALESCE(b.n, 0) - COALESCE(l.dn, 0) + COALESCE(e.dn, 0)
                   AS n,
                 COALESCE(b.cents, 0) - COALESCE(l.dc, 0) + COALESCE(e.dc, 0)
                   AS cents
          FROM base b
          FULL OUTER JOIN leavers l ON l.o_custkey = b.o_custkey
          FULL OUTER JOIN enterers e
            ON e.o_custkey = COALESCE(b.o_custkey, l.o_custkey)
        ),
        alive AS (SELECT * FROM merged WHERE n > 0),
        digest AS (
          SELECT c.c_mktsegment AS segment,
                 COUNT(*) AS n_customers,
                 SUM(a.n) AS n_orders,
                 SUM(a.cents) AS cents
          FROM alive a JOIN customer c ON c.c_custkey = a.o_custkey
          GROUP BY segment
        )
        SELECT segment,
               CAST(n_customers AS BIGINT) AS n_customers,
               CAST(n_orders AS BIGINT) AS n_orders,
               CAST(cents AS BIGINT) AS cents
        FROM digest ORDER BY segment
    """,
    doc="Incremental view maintenance under a window advance: the "
    "materialized per-customer (order count, revenue cents) view "
    "over [1995, 1998) advances to [1996, 1999) by applying ONLY "
    "the delta partitions — retract the leaving year, add the "
    "entering year — via additive full-outer merges, never "
    "rescanning the unchanged middle years; customers whose count "
    "drops to zero fall out of the view. This is the maintenance "
    "loop a warehouse runs nightly where recomputation would rescan "
    "the fact table: the IVM cost is O(|delta|), not O(|view "
    "window|). The per-segment digest of the maintained state must "
    "equal the direct aggregate over the new window in exact "
    "integers — the oracle replays the same incremental plan, and "
    "the equality IS the IVM correctness property. Plan shape: "
    "three pruned partition scans (predicate pushdown on "
    "o_orderdate), customer-keyed aggregates and merges, one "
    "segment digest.",
)
def q311(spark: SparkSession, sf: str) -> DataFrame:
    o = table_parallel(spark, sf, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents1"),
    )

    def span(lo: str, hi: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(lo).cast("date"))
                & (F.col("o_orderdate") < F.lit(hi).cast("date"))
            )
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"), F.sum("cents1").alias("cents"))
        )

    base = span("1995-01-01", "1998-01-01")
    leavers = span("1995-01-01", "1996-01-01").select(
        "o_custkey", F.col("n").alias("ln"), F.col("cents").alias("lc")
    )
    enterers = span("1998-01-01", "1999-01-01").select(
        "o_custkey", F.col("n").alias("en"), F.col("cents").alias("ec")
    )
    merged = (
        base.join(leavers, "o_custkey", "full")
        .join(enterers, "o_custkey", "full")
        .select(
            "o_custkey",
            (
                F.coalesce("n", F.lit(0))
                - F.coalesce("ln", F.lit(0))
                + F.coalesce("en", F.lit(0))
            ).alias("n"),
            (
                F.coalesce("cents", F.lit(0))
                - F.coalesce("lc", F.lit(0))
                + F.coalesce("ec", F.lit(0))
            ).alias("cents"),
        )
        .where(F.col("n") > 0)
    )
    cust = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        merged.join(cust, "o_custkey")
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("segment")
    )


@register(
    "q312_bitemporal_asof",
    oracle="""
        WITH known AS (
          SELECT l_orderkey, MIN(l_shipdate) AS known_ts
          FROM lineitem GROUP BY l_orderkey
        ),
        facts AS (
          SELECT o.o_orderpriority AS priority,
                 CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
                 k.known_ts
          FROM orders o JOIN known k ON k.l_orderkey = o.o_orderkey
          WHERE o.o_orderdate < DATE '1996-07-01'
        ),
        snap AS (
          SELECT 'T1996-09' AS as_known_at, priority, cents FROM facts
          WHERE known_ts < TIMESTAMP '1996-09-01 00:00:00'
          UNION ALL
          SELECT 'T1997-03' AS as_known_at, priority, cents FROM facts
          WHERE known_ts < TIMESTAMP '1997-03-01 00:00:00'
        )
        SELECT as_known_at, priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM snap GROUP BY as_known_at, priority
        ORDER BY as_known_at, priority
    """,
    doc="Bitemporal as-of reporting: VALID time = o_orderdate (when "
    "the order economically happened), TRANSACTION time = the "
    "order's first l_shipdate (a proxy for when the warehouse "
    "learned it). The same valid-time question — revenue per "
    "priority for orders valid before 1996-07 — answered at two "
    "transaction-time cuts shows late-arriving facts accrue into a "
    "supposedly-closed period: the difference between the two "
    "snapshots IS the restatement a naive single-clock report "
    "silently overwrites. Completes the temporal family next to "
    "q134's single-clock point-in-time join and q113's SCD2 "
    "validity intervals. Plan shape: one orderkey-keyed min "
    "aggregate, one key-partitioned join, two filtered aggregates "
    "over the same cached lineage; no windows.",
)
def q312(spark: SparkSession, sf: str) -> DataFrame:
    known = (
        table_parallel(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min("l_shipdate").alias("known_ts"))
    )
    facts = (
        table_parallel(spark, sf, "orders")
        .where(F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))
        .join(known, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "known_ts",
        )
    )
    snaps = [
        facts.where(F.col("known_ts") < F.lit(cut).cast("timestamp")).select(
            F.lit(tag).alias("as_known_at"), "priority", "cents"
        )
        for tag, cut in (
            ("T1996-09", "1996-09-01 00:00:00"),
            ("T1997-03", "1997-03-01 00:00:00"),
        )
    ]
    return (
        snaps[0]
        .unionByName(snaps[1])
        .groupBy("as_known_at", "priority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("as_known_at", "priority")
    )


@register(
    "q313_business_day_lag",
    oracle="""
        WITH ship AS (
          SELECT l_orderkey, MIN(l_shipdate) AS first_ship
          FROM lineitem GROUP BY l_orderkey
        ),
        lag AS (
          SELECT o.o_orderpriority AS priority,
                 (5 * ((date_diff('day', DATE '1970-01-01',
                                  CAST(s.first_ship AS DATE)) - 3) // 7)
                  + LEAST((date_diff('day', DATE '1970-01-01',
                                     CAST(s.first_ship AS DATE)) - 3) % 7, 5))
                 -
                 (5 * ((date_diff('day', DATE '1970-01-01',
                                  o.o_orderdate) - 3) // 7)
                  + LEAST((date_diff('day', DATE '1970-01-01',
                                     o.o_orderdate) - 3) % 7, 5)) AS bd
          FROM orders o JOIN ship s ON s.l_orderkey = o.o_orderkey
        )
        SELECT priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(bd) AS BIGINT) AS min_bd,
               CAST(MAX(bd) AS BIGINT) AS max_bd,
               ROUND(AVG(CAST(bd AS DOUBLE)), 6) AS avg_business_days
        FROM lag GROUP BY priority ORDER BY priority
    """,
    doc="Business-day (weekend-excluding) order-to-first-ship lag per "
    "priority, via the closed-form Monday-aligned weekday prefix "
    "count H(u) = 5*(u//7) + LEAST(u%7, 5) with u = epoch_day - 4 "
    "(epoch day 4 = Monday 1970-01-05): lag = H(ship) - H(order), "
    "a pure O(1) integer expression per row — the calendar "
    "arithmetic an SLA dashboard needs, where q52's raw date_diff "
    "overstates lags that span weekends, computed WITHOUT a "
    "calendar-table join or a per-day explode (the naive "
    "implementations that cost a broadcast or an |days|-fold blowup "
    "at scale). Plan shape: one orderkey-keyed min aggregate, one "
    "key-partitioned join, one bounded priority aggregate; integer-"
    "exact except the final 6dp mean.",
)
def q313(spark: SparkSession, sf: str) -> DataFrame:
    ship = (
        table_parallel(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min(F.col("l_shipdate").cast("date")).alias("first_ship"))
    )

    def weekday_prefix(datecol: Column) -> Column:
        u = F.datediff(datecol, F.lit("1970-01-01").cast("date")) - 3
        return 5 * F.floor(u / 7) + F.least(u % 7, F.lit(5))

    lag = (
        table_parallel(spark, sf, "orders")
        .join(ship, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            (
                weekday_prefix(F.col("first_ship"))
                - weekday_prefix(F.col("o_orderdate").cast("date"))
            ).alias("bd"),
        )
    )
    return (
        lag.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("bd").cast("long").alias("min_bd"),
            F.max("bd").cast("long").alias("max_bd"),
            F.round(F.avg(F.col("bd").cast("double")), 6).alias(
                "avg_business_days"
            ),
        )
        .orderBy("priority")
    )


@register(
    "q321_idempotent_replay",
    oracle="""
        WITH feed AS (
          SELECT o_orderkey AS k, o_custkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
          WHERE o_orderdate >= DATE '1997-01-01'
            AND o_orderdate < DATE '1998-01-01'
        ),
        redelivered AS (
          SELECT * FROM feed
          UNION ALL SELECT * FROM feed WHERE k % 3 = 0
          UNION ALL SELECT * FROM feed WHERE k % 7 = 0
        ),
        applied AS (
          SELECT k, MIN(o_custkey) AS o_custkey, MIN(cents) AS cents
          FROM redelivered GROUP BY k
        ),
        base AS (
          SELECT o_custkey, COUNT(*) AS n,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders WHERE o_orderdate < DATE '1997-01-01'
          GROUP BY o_custkey
        ),
        delta AS (
          SELECT o_custkey, COUNT(*) AS n, SUM(cents) AS cents
          FROM applied GROUP BY o_custkey
        ),
        merged AS (
          SELECT COALESCE(b.o_custkey, d.o_custkey) AS o_custkey,
                 COALESCE(b.n, 0) + COALESCE(d.n, 0) AS n,
                 COALESCE(b.cents, 0) + COALESCE(d.cents, 0) AS cents
          FROM base b FULL OUTER JOIN delta d ON d.o_custkey = b.o_custkey
        )
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(m.n) AS BIGINT) AS n_orders,
               CAST(SUM(m.cents) AS BIGINT) AS cents
        FROM merged m JOIN customer c ON c.c_custkey = m.o_custkey
        GROUP BY segment ORDER BY segment
    """,
    doc="Idempotent change-feed replay under at-least-once delivery: "
    "the 1997 order feed arrives with deliberate duplicate "
    "redeliveries (every k%3 and k%7 key re-sent, the retry pattern "
    "a real bus produces), is deduplicated to exactly-once by "
    "event-key BEFORE accumulation, then additively merged into the "
    "pre-1997 per-customer state — naive accumulation without the "
    "dedup would double-count ~43% of the delta, and the "
    "per-segment digest (which must equal a clean single-delivery "
    "run) is the invariant a pipeline replay test asserts. "
    "Completes the CDC family: q114 merges keyed upserts, q311 "
    "retracts/advances windows, q321 makes the APPLY step safe to "
    "retry. Plan shape: event-key dedup aggregate, customer-keyed "
    "delta + full-outer merge, one segment digest — all "
    "key-partitioned.",
)
def q321(spark: SparkSession, sf: str) -> DataFrame:
    o = table_parallel(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents1"),
    )
    feed = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    ).select(
        F.col("o_orderkey").alias("k"),
        "o_custkey",
        F.col("cents1").alias("cents"),
    )
    redelivered = feed.unionByName(
        feed.where(F.col("k") % 3 == 0)
    ).unionByName(feed.where(F.col("k") % 7 == 0))
    applied = redelivered.groupBy("k").agg(
        F.min("o_custkey").alias("o_custkey"), F.min("cents").alias("cents")
    )
    base = (
        o.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("bn"), F.sum("cents1").alias("bc"))
    )
    delta = applied.groupBy("o_custkey").agg(
        F.count("*").alias("dn"), F.sum("cents").alias("dc")
    )
    merged = base.join(delta, "o_custkey", "full").select(
        "o_custkey",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0))).alias(
            "cents"
        ),
    )
    cust = table_parallel(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    return (
        merged.join(cust, "o_custkey")
        .groupBy("segment")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("segment")
    )


_DUP_DAYS = 30
_DUP_TOL = 0.05


@register(
    "q339_duplicate_charges",
    oracle=f"""
        WITH o AS (
          SELECT o_orderkey, o_custkey, o_orderdate,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        ),
        pairs AS (
          SELECT a.o_custkey,
                 a.o_orderkey AS k1, b.o_orderkey AS k2,
                 a.cents,
                 ABS(b.cents - a.cents) AS dc,
                 date_diff('day', a.o_orderdate, b.o_orderdate) AS gap_d
          FROM o a JOIN o b
            ON b.o_custkey = a.o_custkey
           AND a.o_orderkey < b.o_orderkey
           AND b.o_orderdate >= a.o_orderdate
           AND date_diff('day', a.o_orderdate, b.o_orderdate)
               <= {_DUP_DAYS}
           AND ABS(b.cents - a.cents) * 1.0 <= {_DUP_TOL} * a.cents
        )
        SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(k1 AS BIGINT) AS k1,
               CAST(k2 AS BIGINT) AS k2,
               CAST(cents AS BIGINT) AS cents,
               CAST(dc AS BIGINT) AS diff_cents,
               CAST(gap_d AS BIGINT) AS gap_days
        FROM pairs
        ORDER BY o_custkey, k1, k2
    """,
    doc="Duplicate-charge candidate detection: same customer, order "
    "values within 5%, placed within 30 days — the billing-audit "
    "sweep that surfaces double submissions, retry artifacts and "
    "split-then-resubmitted charges, which exact-key dedup (q29/"
    "q30's hash identity) misses by construction because a retried "
    "charge rarely reproduces the identical amount. Every candidate "
    "pair is emitted with the amount gap and day gap for triage. "
    "Plan shape: the self-join is EQUI on o_custkey (the blocking "
    "key — pair generation never leaves a customer partition, whose "
    "size is bounded by per-customer order cadence), with the "
    "amount band and date band as residual filters; the amount "
    "comparison is done in doubles identically on both engines.",
)
def q339(spark: SparkSession, sf: str) -> DataFrame:
    o = table_parallel(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("b.o_custkey") == F.col("a.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("b.d") >= F.col("a.d"))
        & (F.datediff(F.col("b.d"), F.col("a.d")) <= _DUP_DAYS)
        & (
            F.abs(F.col("b.cents") - F.col("a.cents")) * 1.0
            <= _DUP_TOL * F.col("a.cents")
        ),
    ).select(
        F.col("a.o_custkey").cast("long").alias("o_custkey"),
        F.col("a.o_orderkey").cast("long").alias("k1"),
        F.col("b.o_orderkey").cast("long").alias("k2"),
        F.col("a.cents").cast("long").alias("cents"),
        F.abs(F.col("b.cents") - F.col("a.cents"))
        .cast("long")
        .alias("diff_cents"),
        F.datediff(F.col("b.d"), F.col("a.d")).cast("long").alias(
            "gap_days"
        ),
    )
    return pairs.orderBy("o_custkey", "k1", "k2")
