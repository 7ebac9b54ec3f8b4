"""Parquet sources for the driver testdata (TESTDATA.md).

All reads go through :func:`table` so filter pushdown / column pruning are
preserved (we hand Catalyst the bare scan and declare everything else on
top). Mirrors the reference's sources S1/S2 (``/root/reference/R/ui.R:91-188``)
— there, ingest is a dense-matrix copy; here it's a parquet scan whose
schema is fixed as cells-as-rows, so the reference's orientation-inference
transpose disappears (SURVEY.md §2.1 S1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Bare ``spark.read.parquet`` so predicates
    and projections declared downstream reach the scan (PushedFilters /
    ReadSchema).

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; we read it as raw nanos (legacy conf, runtime
    settable) and rebuild a micros timestamp — one narrow projection, no
    extra pass.
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer division: the ns value exceeds double's 53-bit mantissa,
        # so a float path would wobble the microsecond by up to ~1us
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan + round-robin repartition to the session's default parallelism.

    The testdata tables are single small parquet files, so Spark's
    size-based splitting yields ONE input partition; CPU-heavy per-row
    expressions (md5 chains, JSON parsing) then serialize on one core.
    On a real 100 TB table the files already split; this helper makes the
    local plan match that shape. Use only under compute-bound operators —
    plain scans stay on :func:`table` so pushdown isn't hidden behind an
    exchange.
    """
    df = table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for the SQL surface."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
