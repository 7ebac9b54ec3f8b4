"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by :mod:`harmony_spark.registry`:
every implemented operator from SURVEY.md §2 registers a DataFrame
implementation plus (where SQL-expressible) the DuckDB oracle. ``entry``
runs the flagship pipeline on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the package lives next to this file; make the import robust to the
# driver loading this module by path from another working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from harmony_spark.registry import load_all

    specs = load_all()
    name = "harmony_correct" if "harmony_correct" in specs else "q11_contingency"
    return specs[name].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from harmony_spark.registry import load_all

    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops,
    which get the driver's rows-only check)."""
    from harmony_spark.registry import load_all

    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
