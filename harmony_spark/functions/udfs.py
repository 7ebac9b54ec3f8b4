"""The explicit Python-UDF surface (SURVEY.md §2.8): Arrow-vectorized
scalar pandas_udf and grouped-map applyInPandas.

These are the same execution vehicles the harmony core uses through
mapInPandas; exposed here as standalone operators so the surface is
independently tested. Row-at-a-time Python UDFs are deliberately absent
— they are never the right tool on this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity between two array columns (the M1
    kernel arithmetic as a scalar pandas UDF)."""
    A = np.stack(a.to_numpy()).astype(np.float64)
    B = np.stack(b.to_numpy()).astype(np.float64)
    num = (A * B).sum(axis=1)
    den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
    return pd.Series(num / np.maximum(den, 1e-30))


@pandas_udf("double")
def l2_norm_udf(a: pd.Series) -> pd.Series:
    """Vectorized L2 norm of an array column (P1)."""
    A = np.stack(a.to_numpy()).astype(np.float64)
    return pd.Series(np.linalg.norm(A, axis=1))


def grouped_zscore(df: DataFrame, group_col: str, value_col: str, thresh: float = 10.0) -> DataFrame:
    """Per-group z-score with clipping via applyInPandas grouped-map —
    the P2 scaleRows_dgc shape as an arbitrary-Python grouped transform
    (semantically identical to the q05 window form; tested against it)."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype=np.float64)
        sd = x.std(ddof=1) if len(x) > 1 else 0.0
        z = np.clip((x - x.mean()) / sd, -thresh, thresh) if sd > 0 else np.full(len(x), np.nan)
        out = pdf[[group_col]].copy()
        out["value"] = pdf[value_col].to_numpy()
        out["z"] = z
        return out

    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        scale, schema=f"{group_col} long, value double, z double"
    )
