"""Harmony-core scale probe: reproduces every cell-count claim in
PERFORMANCE.md from one committed script.

    python scripts/harmony_scale_probe.py --cells 100000 --dims 20 --k 50
    python scripts/harmony_scale_probe.py --cells 3400000 --k 100   # paper scale
    HARMONY_DRIVER_MEM=48g python scripts/harmony_scale_probe.py --cells 10000000

Generates the synthetic batch-effect mixture distributed (mapInPandas
over an id range — no driver-side N-sized array), fits, and prints one
JSON line {cells, dims, k, rounds, seconds, objective}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def synth_cells(spark, n: int, d: int, n_batches: int = 3, seed: int = 0):
    """Distributed fixture: 2 cell types + per-batch shift + noise,
    generated per-partition from the cell id (deterministic, no driver
    materialization)."""
    rng = np.random.default_rng(seed)
    type_centers = rng.normal(0, 2.0, size=(2, d)).astype(np.float32)
    batch_shift = rng.normal(0, 1.5, size=(n_batches, d)).astype(np.float32)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            r = np.random.default_rng(seed + 1 + ids[0])
            blob = (ids % 2).astype(np.int64)
            batch = np.where(r.random(len(ids)) < 0.34, n_batches - 1, blob)
            Z = (
                type_centers[blob]
                + batch_shift[batch]
                + r.normal(0, 0.8, size=(len(ids), d)).astype(np.float32)
            )
            yield pd.DataFrame(
                {
                    "cell_id": ids,
                    "features": list(Z.astype(np.float32)),
                    "batch": [f"b{b}" for b in batch],
                }
            )

    return (
        spark.range(n).withColumnRenamed("id", "id").repartition(
            spark.sparkContext.defaultParallelism
        ).mapInPandas(gen, schema="cell_id long, features array<float>, batch string")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=100_000)
    ap.add_argument("--dims", type=int, default=20)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--mode", default="batch")
    ap.add_argument("--blocks", type=int, default=0, help=">0: blocked online E-steps")
    args = ap.parse_args()

    from harmony_spark.core.algorithm import run_harmony
    from harmony_spark.session import get_spark

    spark = get_spark("harmony-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = synth_cells(spark, args.cells, args.dims)

    kw = dict(
        nclust=args.k,
        max_iter=args.rounds,
        theta=1.0,
        sigma=0.1,
        lamb=1.0,
        seed=7,
        id_col="cell_id",
    )
    if args.blocks > 0:
        kw.update(estep_mode="blocked", n_blocks=args.blocks)
    t0 = time.perf_counter()
    out = run_harmony(df, ["batch"], mode=args.mode, **kw)
    n_out = out.count()  # materialize the corrected embedding
    dt = time.perf_counter() - t0
    assert n_out == args.cells, (n_out, args.cells)

    def peak_mb(pid) -> float | None:
        """VmHWM (peak resident set) of a process, MiB."""
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        return round(int(line.split()[1]) / 1024, 1)
        except OSError:
            return None
        return None

    jvm_pid = int(
        spark._jvm.java.lang.ProcessHandle.current().pid()  # noqa: SLF001
    )
    print(
        json.dumps(
            {
                "cells": args.cells,
                "dims": args.dims,
                "k": args.k,
                "rounds": args.rounds,
                "seconds": round(dt, 1),
                "peak_mb_jvm": peak_mb(jvm_pid),
                "peak_mb_driver_py": peak_mb("self"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
