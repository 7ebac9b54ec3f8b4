"""Ship the harmony_spark package to executors on a real cluster.

In ``local[N]`` mode the driver and executors share one Python
process tree, so ``import harmony_spark`` on a worker resolves via the
driver's ``sys.path`` for free.  On a standalone/YARN/K8s cluster each
executor spawns its own Python workers with their own path, and any
cloudpickled closure that references a module-level function (every
Pandas-UDF kernel in :mod:`harmony_spark.core.kernels`) fails with
``ModuleNotFoundError`` unless the package is distributed.

:func:`ship` is the idiomatic Spark fix: zip the package and
``sc.addPyFile`` it.  Spark's file server copies the zip to every
executor (no shared filesystem needed — this works on a 1000-executor
cluster the same as on the 2-executor smoke rig) and prepends it to the
Python workers' ``sys.path``; a zip whose root contains
``harmony_spark/`` is directly importable.

Equivalent deployment alternatives, for ops docs:
  * ``spark-submit --py-files harmony_spark.zip ...``
  * ``pip install`` the wheel into the executor image (K8s)
``ship`` is the only one available to a live session, so it is what
the engine exposes.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SKIP_DIRS = {"__pycache__", ".pytest_cache"}


def package_zip(dest: str | None = None) -> str:
    """Build a zip of the harmony_spark package; return its path.

    The zip root contains ``harmony_spark/`` so that adding the zip to
    ``sys.path`` (which ``addPyFile`` does on executors) makes
    ``import harmony_spark`` work.  Deterministic content: .py files
    only, sorted, no bytecode.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "harmony_spark_pkg.zip")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = sorted(d for d in dirs if d not in _SKIP_DIRS)
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.join(
                    "harmony_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    return dest


def ship(spark: SparkSession, dest: str | None = None) -> str:
    """Distribute the package to all executors of ``spark``'s cluster.

    Call once right after building a session against a real master
    (``spark://``, ``yarn``, ``k8s://``).  Harmless in local mode.
    Returns the zip path that was shipped.
    """
    path = package_zip(dest)
    spark.sparkContext.addPyFile(path)
    return path
