"""R-user-facing convenience API: the RunHarmony entry point shapes.

``run_harmony_matrices`` is the faithful port of
``RunHarmony.default(data_mat, meta_data, vars_use)``
(/root/reference/R/ui.R:91-296) including the S1 orientation inference
(/root/reference/R/ui.R:178-188): the matrix may arrive cells-as-rows or
cells-as-columns; whichever dimension matches the metadata length is
the cell axis. A bare metadata vector is coerced to a one-column frame
(S2, /root/reference/R/ui.R:158-166).

A reference user migrates with:

    R:      RunHarmony(pca, meta, c('dataset'))
    here:   run_harmony_matrices(spark, pca, {'dataset': meta}, ['dataset'])
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def run_harmony_matrices(
    spark: SparkSession,
    data_mat: np.ndarray,
    meta_data,
    vars_use: list[str] | None = None,
    **kwargs,
) -> np.ndarray:
    """NumPy in, NumPy out (cells × dims), like the R entry point.

    meta_data: dict of covariate name -> length-N sequence, or a bare
    sequence (coerced to {'batch_variable': seq} like R/ui.R:158-162).
    """
    from harmony_spark.core.algorithm import run_harmony

    if not isinstance(meta_data, dict):
        meta_data = {"batch_variable": list(meta_data)}
        vars_use = ["batch_variable"]
    if vars_use is None:
        vars_use = list(meta_data.keys())
    lengths = {len(v) for v in meta_data.values()}
    if len(lengths) != 1:
        raise ValueError("metadata covariates have inconsistent lengths")
    N = lengths.pop()
    if N > 2_000_000:
        # inherently driver-sized shim (NumPy in, full result collected
        # back) — same ceiling as run_harmony(mode='blocked-local'); past
        # it, hand a DataFrame to run_harmony directly
        raise ValueError(
            "run_harmony_matrices caps at 2M cells (NumPy-in/NumPy-out is "
            "driver-sized); build a DataFrame and call run_harmony instead"
        )

    data_mat = np.asarray(data_mat, dtype=np.float32)
    if data_mat.ndim != 2:
        raise ValueError("data_mat must be 2-D")
    if data_mat.shape[0] == N:
        Z = data_mat  # cells as rows already
    elif data_mat.shape[1] == N:
        Z = data_mat.T  # cells as columns -> transpose (S1 inference)
    else:
        raise ValueError(
            "number of labels do not correspond to number of samples in data matrix"
        )

    import pandas as pd

    # Arrow path: one pandas frame, zero per-row Python tuple building
    pdf = pd.DataFrame(
        {
            "cell_id": np.arange(N, dtype=np.int64),
            "features": list(Z),
            **{v: [str(x) for x in meta_data[v]] for v in vars_use},
        }
    )
    covs = ", ".join(f"{v} string" for v in vars_use)
    df = spark.createDataFrame(pdf, f"cell_id long, features array<float>, {covs}")
    out = run_harmony(df, vars_use, id_col="cell_id", **kwargs)
    collected = {r["cell_id"]: r["z_corr"] for r in out.collect()}
    return np.stack([collected[i] for i in range(N)]).astype(np.float32)
