"""Scalar-precision switch mirroring the reference's compile-time
``HARMONY_SCALAR_DOUBLE`` (``/root/reference/src/types.h:5-9``,
``configure:1-20``) — there it selects the template scalar for the
whole engine at build time; here the env var selects it at import time.

Default is float32 storage/compute with float64 accumulation (strictly
more accurate than an all-f32 engine at half the shuffle/cache bytes).
Set ``HARMONY_SCALAR_DOUBLE=1`` for double-precision parity runs: cell
vectors (zn / r / z_corr) are then stored and computed as float64
end-to-end.

Cluster note: the flag is read in the Python worker at import, so on a
real cluster it must reach executors via
``spark.executorEnv.HARMONY_SCALAR_DOUBLE`` (local mode inherits the
driver env automatically).
"""

from __future__ import annotations

import os

import numpy as np

DOUBLE = os.environ.get("HARMONY_SCALAR_DOUBLE", "").lower() not in ("", "0", "false")

#: NumPy dtype for cell-vector storage/compute inside the kernels.
SCALAR = np.float64 if DOUBLE else np.float32

#: Spark SQL element type for cell-vector array columns.
SPARK_SCALAR = "double" if DOUBLE else "float"
