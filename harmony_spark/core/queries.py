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


def _flatten_zcorr(out: DataFrame, *code_aliases: tuple[str, str]) -> DataFrame:
    """Project a harmony result to driver-canonicalizable scalar rows.

    The driver's canonicalizer hash-sorts result columns in pandas and
    cannot sort ``ARRAY<FLOAT>`` cells (``unhashable type: 'list'`` —
    CORRECTNESS_r02). Explode ``z_corr`` to one ``(vec_id, codes...,
    dim, z_val)`` row per dimension, rounded to 4 decimals so the
    deterministic float32 pipeline canonicalizes stably.
    """
    codes = [F.col(src).alias(dst) for src, dst in code_aliases]
    return (
        out.select(
            F.col("cell_id").alias("vec_id"),
            *codes,
            F.posexplode("z_corr").alias("dim", "val"),
        )
        .select(
            "vec_id",
            *[dst for _, dst in code_aliases],
            "dim",
            F.round(F.col("val").cast("double"), 4).alias("z_val"),
        )
        .orderBy("vec_id", "dim")
    )


@register(
    "harmony_correct",
    oracle=None,
    doc="Flagship: full harmony batch-correction pipeline "
    "(RunHarmony.default equivalent, /root/reference/R/ui.R:91-296) on "
    "the embeddings table with `label` as the batch covariate. "
    "Deterministic (seeded init, batch-EM E-steps). NOTE: the driver row "
    "runs a REDUCED configuration (nclust=5, max_iter=2) for determinism "
    "and gate latency; full-size convergence parity is pinned by the "
    "NumPy cross-oracle suite (tests/test_harmony_core.py).",
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
    return _flatten_zcorr(out, ("code_0", "batch_code"))


@register(
    "harmony_correct_blocked",
    oracle=None,
    doc="Harmony with the distributed ONLINE blocked E-step (C3, "
    "/root/reference/src/harmony.cpp:269-342): per block, subtract the "
    "cached O/E contribution, reassign against the decremented penalty, "
    "add back — one aggregation job per block. Cross-checked against "
    "the NumPy blocked-hash oracle in tests.",
)
def harmony_correct_blocked(spark: SparkSession, sf: str) -> DataFrame:
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
        max_iter=1,
        lamb=1.0,
        sigma=0.1,
        seed=42,
        estep_mode="blocked",
        n_blocks=5,
    )
    out = model.run().persist()
    out.count()
    model.cleanup()
    return _flatten_zcorr(out, ("code_0", "batch_code"))


@register(
    "harmony_correct_2cov",
    oracle=None,
    doc="Two-covariate harmony (the test_two_variable.R configuration "
    "shape, /root/reference/tests/testthat/test_two_variable.R:5-11): "
    "embeddings joined with documents metadata for a second covariate; "
    "exercises the multi-covariate design (stacked one-hot blocks, "
    "cross-covariate Gram terms, C5 per-covariate support filtering) "
    "and the auto-lambda path (M8).",
)
def harmony_correct_2cov(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.core.algorithm import HarmonySpark

    e = table(spark, sf, "embeddings")
    d = table(spark, sf, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("lang")
    )
    cells = e.join(F.broadcast(d), "vec_id").select(
        "vec_id",
        "embedding",
        F.col("label").cast("string").alias("label"),
        "lang",
    )
    model = HarmonySpark(
        cells,
        ["label", "lang"],
        features_col="embedding",
        id_col="vec_id",
        nclust=5,
        max_iter=2,
        lamb=None,  # auto-lambda (M8)
        sigma=0.1,
        seed=42,
    )
    out = model.run().persist()
    out.count()
    model.cleanup()
    return _flatten_zcorr(out, ("code_0", "label_code"), ("code_1", "lang_code"))


@register(
    "harmony_stream_drift",
    oracle=None,
    doc="Streaming covariate-drift monitor (streaming/drift.py): fit on "
    "the embeddings table, then re-stream the same cells through "
    "applyInPandasWithState keeping running per-batch assignment mass "
    "and a chi-square statistic vs the fit-time P(cluster|batch). "
    "In-sample the stream must NOT drift; the statistic flags arriving "
    "populations that stopped matching the frozen model (refit signal). "
    "Non-SQL-expressible (stateful streaming) — rows-only check.",
)
def harmony_stream_drift(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.streaming.drift import drift_monitor

    e = table(spark, sf, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("string").alias("label")
    )
    model = HarmonySpark(
        e, ["label"], features_col="embedding", id_col="vec_id",
        nclust=5, max_iter=1, lamb=1.0, seed=42,
    )
    model.run().count()

    raw_schema = spark.read.parquet(f"{sf}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf)
        .select("vec_id", "embedding", F.col("label").cast("string").alias("label"))
    )
    mon = drift_monitor(model, stream, features_col="embedding", id_col="vec_id")
    q = (
        mon.writeStream.format("memory")
        .queryName("harmony_stream_drift_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(
        "SELECT batch_code, n_cells, chi2, chi2_crit, drifted "
        "FROM harmony_stream_drift_mem ORDER BY batch_code, n_cells"
    )


@register(
    "q290_project_dim",
    oracle="""
        WITH f AS (
          SELECT vec_id, s.i - 1 AS g, CAST(embedding[s.i] AS DOUBLE) AS x
          FROM embeddings,
               UNNEST(generate_series(1, len(embedding))) AS s(i)
        ),
        nrm AS (
          SELECT vec_id,
                 sqrt(list_sum(list_transform(embedding[1:4],
                      v -> CAST(v AS DOUBLE) * v))) AS nn
          FROM embeddings
        ),
        z AS (
          SELECT e.vec_id, s.k - 1 AS k,
                 CAST(e.embedding[s.k] AS DOUBLE) / n.nn AS z
          FROM embeddings e
          JOIN nrm n ON n.vec_id = e.vec_id,
               UNNEST(generate_series(1, 4)) AS s(k)
          WHERE n.nn > 0
        )
        SELECT CAST(f.g AS BIGINT) AS g, CAST(z.k AS BIGINT) AS k,
               ROUND(SUM(f.x * z.z), 6) AS loading
        FROM f JOIN z ON z.vec_id = f.vec_id
        GROUP BY f.g, z.k ORDER BY g, k
    """,
    doc="ProjectDim equivalent (/root/reference/R/RunHarmony.R:113-119, "
    "Seurat::ProjectDim): feature loadings = X^T Z, the feature matrix "
    "projected onto a reduction, via core.algorithm.project_dim's "
    "explode-join-aggregate distributed matmul. Here the features are "
    "the full embedding dims and the reduction is the L2-normalized "
    "4-dim head slice (a deterministic, SQL-expressible stand-in for "
    "the harmony-corrected reduction, so DuckDB can replay the exact "
    "projection; the same function runs on real z_corr output via "
    "save_embedding(project_features=...)). Plan shape: two narrow "
    "explodes co-located on vec_id (one shuffle) feeding a "
    "map-side-combinable G x d sum — no driver-side matrix.",
)
def q290(spark: SparkSession, sf: str) -> DataFrame:
    from harmony_spark.core.algorithm import project_dim

    e = table(spark, sf, "embeddings")
    sq = F.aggregate(
        F.slice("embedding", 1, 4),
        F.lit(0.0),
        lambda a, v: a + v.cast("double") * v,
    )
    nrm = e.select("vec_id", F.sqrt(sq).alias("nn"))
    red = (
        e.join(nrm, "vec_id")
        .where(F.col("nn") > 0)
        .select(
            "vec_id",
            F.transform(
                F.slice("embedding", 1, 4),
                lambda v: v.cast("double") / F.col("nn"),
            ).alias("z_corr"),
        )
    )
    feats = e.select("vec_id", F.col("embedding").alias("feature"))
    return project_dim(red, feats, id_col="vec_id").select(
        F.col("g").cast("long").alias("g"),
        F.col("k").cast("long").alias("k"),
        F.round("loading", 6).alias("loading"),
    )
