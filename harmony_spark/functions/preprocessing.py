"""Expression-matrix preprocessing: the reference's ``scaleData`` /
``scaleRows_dgc`` utility (P2: /root/reference/R/utils.R:87-98 ->
/root/reference/src/utils.cpp:112-155).

Semantics: the input is a sparse expression matrix in COO/long form
(cell, gene, value), zeros implicit. Each gene row is z-scored with the
IMPLICIT ZEROS INCLUDED in mean and (sample) standard deviation —
mean = sum(x)/N_cells, var = (sum((x-mu)^2 over nonzeros)
+ (N_cells - nnz) * mu^2) / (N_cells - 1) — then clipped to
±thresh. Only stored (nonzero) entries are emitted, matching the
reference's dense-fill-then-scale output restricted to stored cells.

Spark plan: one groupBy(gene) aggregate for the moments (partial+final
hash agg), broadcast back onto the COO rows — no N×genes densification
anywhere, which is what makes this work at 100 TB where the dense form
cannot exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import table
from harmony_spark.registry import register


def scale_expression(
    coo: DataFrame,
    *,
    n_cells: int | None = None,
    cell_col: str = "cell_id",
    gene_col: str = "gene_id",
    value_col: str = "value",
    thresh: float = 10.0,
) -> DataFrame:
    """Gene-wise z-score with implicit zeros + clipping over a COO table."""
    if n_cells is None:
        n_cells = coo.select(cell_col).distinct().count()
    stats = coo.groupBy(gene_col).agg(
        F.sum(value_col).alias("_sum"),
        F.sum(F.col(value_col) * F.col(value_col)).alias("_sumsq"),
        F.count("*").alias("_nnz"),
    )
    mu = F.col("_sum") / n_cells
    # E[(x-mu)^2] over all N cells: nonzero part + zeros part
    ss = (F.col("_sumsq") - 2 * mu * F.col("_sum") + F.col("_nnz") * mu * mu) + (
        n_cells - F.col("_nnz")
    ) * mu * mu
    stats = stats.select(
        gene_col,
        mu.alias("_mu"),
        F.sqrt(ss / (n_cells - 1)).alias("_sd"),
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sd")
    return (
        coo.join(F.broadcast(stats), gene_col)
        .select(
            cell_col,
            gene_col,
            F.greatest(F.least(z, F.lit(thresh)), F.lit(-thresh)).alias("scaled"),
        )
    )


@register(
    "q44_sparse_zscore",
    oracle="""
        WITH coo AS (SELECT l_orderkey AS cell_id, l_partkey AS gene_id,
                            l_quantity AS value
                     FROM lineitem),
        n AS (SELECT COUNT(DISTINCT cell_id) AS n_cells FROM coo),
        stats AS (
          SELECT gene_id,
                 SUM(value) / MAX(n.n_cells) AS mu,
                 SQRT(((SUM(value*value) - 2*(SUM(value)/MAX(n.n_cells))*SUM(value)
                        + COUNT(*) * POW(SUM(value)/MAX(n.n_cells), 2))
                       + (MAX(n.n_cells) - COUNT(*)) * POW(SUM(value)/MAX(n.n_cells), 2))
                      / (MAX(n.n_cells) - 1)) AS sd
          FROM coo, n GROUP BY gene_id)
        SELECT cell_id, gene_id,
               ROUND(GREATEST(LEAST((value - mu) / sd, 10), -10), 6) AS scaled
        FROM coo JOIN stats USING (gene_id)
        ORDER BY cell_id, gene_id, scaled LIMIT 200
    """,
    doc="scaleRows_dgc semantics (P2): gene-wise z-score over a sparse "
    "COO expression table with implicit zeros in mu/sd, clipped to ±10. "
    "lineitem reinterpreted as (cell=order, gene=part, value=quantity).",
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    coo = table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("cell_id"),
        F.col("l_partkey").alias("gene_id"),
        F.col("l_quantity").alias("value"),
    )
    out = scale_expression(coo)
    return (
        out.select("cell_id", "gene_id", F.round("scaled", 6).alias("scaled"))
        .orderBy("cell_id", "gene_id", "scaled")
        .limit(200)
    )
