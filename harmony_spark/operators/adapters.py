"""Format-adapter queries: prove the CSV / JSON-Lines sources preserve
values end-to-end by mirroring a parquet testdata table into the foreign
format, reading it back through :func:`harmony_spark.io.read_any`, and
hash-matching an aggregate against the DuckDB oracle computed on the
ORIGINAL parquet — any value corruption in the write/read round trip
(quoting, escaping, number formatting, schema application) breaks the
hash.

Mirrors live under a deterministic per-SF path in /tmp and are written
once per (format, sf) — the write is part of the adapter under test,
not of the timed query semantics. Reference parity: the reference reads
dense matrices/data frames from the R session (``/root/reference/R/
ui.R:91-188``); file-format adapters are this engine's equivalent
ingest surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import read_any, table
from harmony_spark.registry import register

_MIRROR_ROOT = os.environ.get("HARMONY_MIRROR_DIR", "/tmp/harmony_spark_mirrors")


def _mirror(spark: SparkSession, sf_dir: str, name: str, fmt: str) -> str:
    """Write the parquet table as fmt once per (sf, table, fmt); return
    the mirror path. Success marker (_SUCCESS) gates reuse."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = os.path.join(_MIRROR_ROOT, tag, f"{name}_{fmt}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = table(spark, sf_dir, name)
        if fmt == "csv":
            df.write.mode("overwrite").option("header", "true").csv(path)
        elif fmt == "json":
            df.write.mode("overwrite").json(path)
        elif fmt == "orc":
            df.write.mode("overwrite").orc(path)
        else:
            raise ValueError(fmt)
    return path


_ADAPTER_ORACLE = """
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
           ROUND(SUM(c_acctbal), 2) AS bal_sum,
           MIN(c_name) AS min_name,
           MAX(c_mktsegment) AS max_seg
    FROM customer
    GROUP BY c_nationkey ORDER BY c_nationkey
"""


def _adapter_agg(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
            F.round(F.sum("c_acctbal"), 2).alias("bal_sum"),
            F.min("c_name").alias("min_name"),
            F.max("c_mktsegment").alias("max_seg"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q93_csv_adapter",
    oracle=_ADAPTER_ORACLE,
    doc="CSV source adapter, value-checked end-to-end: customer is "
    "mirrored to headered CSV, read back through read_any with the "
    "parquet schema (single-pass scan, no inference), and aggregated; "
    "the oracle runs on the ORIGINAL parquet, so the hash match proves "
    "the CSV write/read round trip preserves every key, string "
    "(quoting/escaping) and decimal. Scale shape: CSV splits by line, "
    "so the scan parallelizes like parquet minus column pruning.",
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    schema = table(spark, sf, "customer").schema
    path = _mirror(spark, sf, "customer", "csv")
    return _adapter_agg(read_any(spark, path, "csv", schema=schema))


@register(
    "q100_partitioned_day_range",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(epoch_us(ts)) AS first_us,
               MAX(epoch_us(ts)) AS last_us
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        GROUP BY event_type ORDER BY event_type
    """,
    doc="Date-partitioned fact layout (io.write_time_partitioned / "
    "events_by_day): events re-laid-out partitioned by day, then a "
    "one-week range aggregated. The day predicate resolves as a "
    "PartitionFilter — 23 of 30 day directories are never opened "
    "(pinned by tests/test_plans.py) — which is the 100 TB answer to "
    "ts-range scans, since the nanos-normalize cast keeps row-group "
    "pushdown off the raw ts column. The oracle aggregates the RAW "
    "events under the equivalent ts predicate, so the hash match also "
    "proves the re-layout lost/duplicated no rows.",
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import events_by_day

    ev = events_by_day(spark, sf)
    return (
        ev.where(F.col("day").between("2024-01-08", "2024-01-14"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min(F.unix_micros("ts")).alias("first_us"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
        .orderBy("event_type")
    )


@register(
    "q94_jsonl_adapter",
    oracle=_ADAPTER_ORACLE,
    doc="JSON-Lines source adapter, value-checked end-to-end: same "
    "contract as q93 over the line-delimited JSON mirror (the only "
    "JSON layout that splits across workers). The explicit schema "
    "keeps the scan single-pass and pins types against JSON's "
    "number-literal ambiguity.",
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    schema = table(spark, sf, "customer").schema
    path = _mirror(spark, sf, "customer", "json")
    return _adapter_agg(read_any(spark, path, "json", schema=schema))


def _evolution_mirror(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Two schema epochs of customer, written once per sf: epoch 1
    (even c_custkey) predates the c_acctbal / c_mktsegment columns;
    epoch 2 (odd) has the full schema. History is never rewritten —
    exactly the state a years-old 100 TB table is in."""
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    root = os.path.join(_MIRROR_ROOT, tag, "customer_epochs")
    p1, p2 = os.path.join(root, "epoch1"), os.path.join(root, "epoch2")
    if not os.path.exists(os.path.join(p2, "_SUCCESS")):
        cust = table(spark, sf_dir, "customer")
        even = F.col("c_custkey") % 2 == 0
        cust.where(even).select("c_custkey", "c_nationkey", "c_name").write.mode(
            "overwrite"
        ).parquet(p1)
        cust.where(~even).select(
            "c_custkey", "c_nationkey", "c_name", "c_acctbal", "c_mktsegment"
        ).write.mode("overwrite").parquet(p2)
    return p1, p2


@register(
    "q133_schema_evolution",
    oracle="""
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
               CAST(COUNT(CASE WHEN c_custkey % 2 = 1 THEN c_mktsegment END)
                    AS BIGINT) AS n_with_segment,
               ROUND(SUM(CASE WHEN c_custkey % 2 = 1 THEN c_acctbal ELSE 0 END), 2)
                 AS bal_sum
        FROM customer
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    doc="Schema-evolution ingest (io.read_epochs): customer history "
    "split across two schema epochs — epoch 1 predates the balance and "
    "segment columns, epoch 2 has the full schema; neither is ever "
    "rewritten. Epoch-wise conforming (per-epoch footer schema, CAST "
    "present columns, typed-NULL absent ones, unionByName) yields one "
    "logical table; parquet mergeSchema cannot do this (no widening, "
    "no defaults policy). The oracle replays the epoch split on the "
    "ORIGINAL parquet, so the hash match proves no row or value was "
    "lost or invented across the evolution boundary. Scale shape: each "
    "epoch remains an independently pruned scan; the union is plan-"
    "level only (no shuffle).",
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.io import read_epochs

    target = table(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_name", "c_acctbal", "c_mktsegment"
    ).schema
    p1, p2 = _evolution_mirror(spark, sf)
    df = read_epochs(spark, [p1, p2], target)
    return (
        df.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
            F.count("c_mktsegment").cast("long").alias("n_with_segment"),
            F.round(F.sum(F.coalesce("c_acctbal", F.lit(0.0))), 2).alias("bal_sum"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q142_orc_adapter",
    oracle=_ADAPTER_ORACLE,
    doc="ORC source adapter, value-checked end-to-end: same contract as "
    "q93/q94 over an ORC mirror of customer - covers the third "
    "columnar format Spark reads natively (ORC is the Hive-ecosystem "
    "sibling of parquet: striped, with min/max stats and predicate "
    "pushdown). The hash match against the parquet-side oracle proves "
    "the ORC write/read round trip preserves every value.",
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    path = _mirror(spark, sf, "customer", "orc")
    return _adapter_agg(read_any(spark, path, "orc"))
