"""Scale smoke: the harmony driver loop on 100k synthetic cells — two
orders of magnitude above the reference's test fixtures. Checks the
pass structure holds (no driver-side N-sized materialization, bounded
job count) and the invariants survive."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def big_cells(spark):
    N, d = 100_000, 20
    df = (
        spark.range(N)
        .withColumnRenamed("id", "cell_id")
        .withColumn(
            "features",
            F.transform(
                F.sequence(F.lit(1), F.lit(d)),
                lambda i: (
                    F.hash(F.col("cell_id") * F.lit(1000) + i) % 10000 / F.lit(5000.0)
                    - 1.0
                ).cast("float"),
            ),
        )
        .withColumn("batch", F.concat(F.lit("b"), (F.col("cell_id") % 3).cast("string")))
    )
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_harmony_100k(spark, big_cells):
    from harmony_spark.core.algorithm import HarmonySpark

    model = HarmonySpark(
        big_cells,
        ["batch"],
        id_col="cell_id",
        theta=1.0,
        lamb=1.0,
        nclust=50,
        max_iter=2,
        seed=1,
    )
    assert model.p.K == 50
    out = model.run()
    # spot-check a slice without collecting N rows to the driver
    sample = out.where(F.col("cell_id") < 100).collect()
    assert len(sample) == 100
    Z = np.stack([r["z_corr"] for r in sample])
    assert np.isfinite(Z).all()
    assert out.count() == 100_000
    # driver state stayed tiny
    assert model.O.shape == (50, 3)
    assert model.W_all.shape == (50, 3, 20)
    model.cleanup()
