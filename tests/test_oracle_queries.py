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
    srows = [tuple(row[c] for c in spark_cols) for row in sdf.collect()]

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
