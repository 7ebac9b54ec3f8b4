"""harmony_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of immunogenomics/harmony (v2.0.4), rebuilt
Spark-first for 100 TB scale.

Layout:
    core/        the Harmony algorithm (diversity-penalized soft k-means +
                 mixture-of-experts ridge correction) as a Spark driver loop
                 with broadcast state and Arrow-vectorized kernels.
    operators/   the general relational operator surface (SURVEY.md §2.8)
                 expressed through the DataFrame API.
    extensions/  LLM-data-pipeline operators: dedup, similarity search,
                 text analysis, multimodal columns (SURVEY.md §2.10).
    streaming/   Structured Streaming surface (SURVEY.md §2.9).
    functions/   reusable column-expression helpers (array math, text).

Everything registers into :mod:`harmony_spark.registry`, which backs the
driver contract in ``__spark_entry__.py``.
"""

__version__ = "0.1.0"
