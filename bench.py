"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (collect) so the measurement covers
scan -> shuffle -> result, not just plan construction. A warmup query
first absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from harmony_spark.registry import load_all
    from harmony_spark.session import get_spark

    spark = get_spark("harmony-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # warmup: JVM, codegen, parquet footer caches
    specs["q08_batch_counts"].fn(spark, sf_dir).collect()

    timings: dict[str, float] = {}
    total = 0.0
    runs = int(os.environ.get("HARMONY_BENCH_RUNS", "2"))
    for name in sorted(specs):
        best, nrows = None, 0
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = specs[name].fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            nrows = len(rows)
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({nrows} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
