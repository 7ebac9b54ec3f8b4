"""Local replica of the driver's t2 correctness gate: run every registered
query on Spark AND its DuckDB oracle at sf0.001, compare row count, sorted
column names, and an order-insensitive value hash."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from harmony_spark.registry import load_all

QUERIES = load_all()
ORACLE_QUERIES = [q for q in QUERIES.values() if q.oracle is not None]
ROWS_ONLY_QUERIES = [q for q in QUERIES.values() if q.oracle is None]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash_rows(rows) -> str:
    digests = sorted("|".join(_canon(v) for v in row) for row in rows)
    h = hashlib.sha256()
    for d in digests:
        h.update(d.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("spec", ORACLE_QUERIES, ids=[q.name for q in ORACLE_QUERIES])
def test_query_matches_oracle(spec, spark, sf_dir, oracle):
    sdf = spec.fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    # column order normalized before hashing, mirroring the driver
    rows = sdf.collect()
    srows = [tuple(row[c] for c in spark_cols) for row in rows]

    # Numeric output columns must be null-free: pandas (the driver's
    # canonicalization substrate) turns a null float into NaN (!= NULL)
    # and promotes a nullable int64 column to float64, whose >1e15
    # values re-render with a trailing .0 — both silently break the
    # driver-side hash even though the collect-path compare below
    # passes (q60/q66, round 3). COALESCE in both the Spark plan and
    # the oracle instead of emitting numeric nulls.
    numeric = {
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    for row in rows:
        for c in numeric:
            assert row[c] is not None, (
                f"{spec.name}: numeric column {c!r} contains NULL — "
                "pandas canonicalization at the driver will diverge"
            )

    # DATE output columns are likewise hazardous: Spark->pandas renders
    # them as object datetime.date ('1995-05-01') while DuckDB->pandas
    # gives datetime64 Timestamps ('1995-05-01 00:00:00'), so a str-hash
    # canonicalizer sees different values even when both engines agree
    # (q52, round 3). Render dates as ISO strings on both sides instead.
    date_cols = [f.name for f in sdf.schema.fields if f.dataType.typeName() == "date"]
    assert not date_cols, (
        f"{spec.name}: raw DATE output column(s) {date_cols} — emit "
        "date_format(..., 'yyyy-MM-dd') / CAST(... AS VARCHAR) instead"
    )

    ores = oracle.sql(spec.oracle)
    ocols = sorted(ores.columns)
    oidx = [ores.columns.index(c) for c in ocols]
    orows = [tuple(row[i] for i in oidx) for row in ores.fetchall()]

    assert spark_cols == ocols, f"{spec.name}: column names differ {spark_cols} vs {ocols}"
    assert len(srows) == len(orows), f"{spec.name}: row count {len(srows)} vs {len(orows)}"
    assert _hash_rows(srows) == _hash_rows(orows), (
        f"{spec.name}: value hash mismatch\nspark sample: {sorted(srows)[:5]}\n"
        f"oracle sample: {sorted(orows)[:5]}"
    )


@pytest.mark.parametrize(
    "spec", ROWS_ONLY_QUERIES, ids=[q.name for q in ROWS_ONLY_QUERIES]
)
def test_rows_only_query_canonicalizes(spec, spark, sf_dir):
    """The driver canonicalizes EVERY entry's output in pandas (sort over
    all columns) even when no oracle exists — ARRAY columns crash it with
    ``unhashable type: 'list'`` (CORRECTNESS_r02 harmony_correct* rows).
    Replicate that path: collect to pandas, sort by every column, and
    require >0 rows so no-oracle entries still prove they ran."""
    pdf = spec.fn(spark, sf_dir).toPandas()
    pdf.sort_values(by=list(pdf.columns))  # raises on unhashable cells
    assert len(pdf) > 0, f"{spec.name}: rows-only entry produced 0 rows"
