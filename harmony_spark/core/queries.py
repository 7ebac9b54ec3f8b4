"""Registry entries for the harmony core algorithm.

The iterative algorithm (C1-C5, SURVEY.md §2.5) is not SQL-expressible,
so these register without oracle SQL — the driver records the weaker
rows-only check; numerical correctness is pinned by the NumPy
cross-oracle tests (tests/test_harmony_core.py, SURVEY.md §5 port
strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import table
from harmony_spark.registry import register


@register(
    "harmony_correct",
    oracle=None,
    doc="Flagship: full harmony batch-correction pipeline "
    "(RunHarmony.default equivalent, /root/reference/R/ui.R:91-296) on "
    "the embeddings table with `label` as the batch covariate. "
    "Deterministic (seeded init, batch-EM E-steps).",
)
def harmony_correct(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.core.algorithm import HarmonySpark

    e = table(spark, sf, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("string").alias("label")
    )
    model = HarmonySpark(
        e,
        ["label"],
        features_col="embedding",
        id_col="vec_id",
        nclust=5,
        max_iter=2,
        lamb=1.0,
        sigma=0.1,
        seed=42,
    )
    out = model.run().persist()
    out.count()
    model.cleanup()
    return out.select(
        F.col("cell_id").alias("vec_id"), F.col("code_0").alias("batch_code"), "z_corr"
    ).orderBy("vec_id")
