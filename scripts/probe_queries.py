"""Isolated query probe for optimization rounds (guide §1).

Times individual registry queries with the noop sink (computation only,
no collect/driver transfer) and optionally dumps .explain("formatted")
to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python scripts/probe_queries.py q219_spearman_rho q78_ivf_index_search \
      [--runs 3] [--plans plans/r07 --suffix before] [--sink noop|collect]

Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py and
uses the same warm-input mode (HARMONY_CACHE_TABLES=1) so numbers are
comparable with bench_full.json rows.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sink", default="collect", choices=["noop", "collect"])
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("HARMONY_CACHE_TABLES", "1")

    from harmony_spark.io import TABLES, table_parallel
    from harmony_spark.registry import load_all
    from harmony_spark.session import get_spark

    spark = get_spark("harmony-spark-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    for t in TABLES:
        table_parallel(spark, sf_dir, t).count()
    specs["q08_batch_counts"].fn(spark, sf_dir).collect()

    for name in args.names:
        spec = specs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            out = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(out, "w") as f:
                f.write(plan)
            print(f"# plan -> {out}")
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: " + " ".join(f"{t:.3f}" for t in times) + f"  best={min(times):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
