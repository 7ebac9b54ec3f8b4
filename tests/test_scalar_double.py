"""HARMONY_SCALAR_DOUBLE=1 end-to-end: the engine-wide scalar switch
(mirroring the reference's compile-time template scalar,
/root/reference/src/types.h:5-9) must flip cell-vector storage to
float64 AND keep Spark/NumPy-oracle parity — at double precision the
cross-oracle tolerance tightens by ~3 orders of magnitude, which is
itself the check that the f64 path really runs end-to-end (an f32
kernel hiding behind an f64 schema would fail it).

Runs in a subprocess because the switch is read at import time.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import numpy as np
    from harmony_spark.core.scalars import DOUBLE, SCALAR, SPARK_SCALAR
    assert DOUBLE and SCALAR is np.float64 and SPARK_SCALAR == "double"

    sys.path.insert(0, {tests!r})
    from test_harmony_core import make_fixture, resolve
    from harmony_spark.core.numpy_ref import run_harmony_numpy
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.session import get_spark

    Z, blob, batch = make_fixture(n=300)
    spark = get_spark("f64-probe", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (int(i), [float(v) for v in Z[i]], f"b{{int(batch[i])}}")
        for i in range(Z.shape[0])
    ]
    df = spark.createDataFrame(rows, "cell_id long, z array<double>, batch string")
    model = HarmonySpark(
        df, ["batch"], id_col="cell_id", features_col="z",
        theta=1.0, sigma=0.1, lamb=1.0, nclust=20, max_iter=3, seed=7,
    )
    out_df = model.run()
    elem = dict(out_df.dtypes)["z_corr"]
    assert elem == "array<double>", elem
    out = out_df.orderBy("cell_id").collect()
    Zs = np.stack([r["z_corr"] for r in out])
    assert Zs.dtype == np.float64

    p = resolve(Z, batch, 3, theta=1.0, nclust=20, max_iter=3, seed=7)
    h = run_harmony_numpy(Z, batch[:, None], p, mode="batch")
    np.testing.assert_allclose(Zs, h.Z_corr, rtol=1e-6, atol=1e-6)
    spark.stop()
    print("F64_OK")
    """
).format(repo=REPO, tests=os.path.join(REPO, "tests"))


def test_scalar_double_end_to_end():
    env = dict(os.environ, HARMONY_SCALAR_DOUBLE="1")
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0 and "F64_OK" in res.stdout, res.stderr[-3000:]
