"""Registry entries for the harmony core algorithm (rows-only checks:
the iterative algorithm is not SQL-expressible, SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from harmony_spark.registry import register

# Filled in by harmony_spark.core.algorithm once implemented; the import
# hook lives here so registry.load_all() stays stable.
try:
    from harmony_spark.core import algorithm as _algorithm  # noqa: F401
except ImportError:  # pragma: no cover - during scaffolding only
    _algorithm = None
