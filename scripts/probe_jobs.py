"""Job-count + wall-time probe (guide §1: measure first).

For each named registry query: run it to completion (collect) and report
wall seconds plus how many Spark JOBS the run submitted — read from the
DAGScheduler's job-id counter before/after, no UI needed.  The iterative
graph family's cost at small SF is the per-job scheduler/planning floor,
so "fewer jobs per round" is the measurable done-criterion.

    python scripts/probe_jobs.py q225_pagerank q262_kcore_peeling --runs 2
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
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--detail", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("HARMONY_CACHE_TABLES", "1")

    from harmony_spark.io import TABLES, table_parallel
    from harmony_spark.registry import load_all
    from harmony_spark.session import get_spark

    spark = get_spark("harmony-spark-probe-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    for t in TABLES:
        table_parallel(spark, sf_dir, t).count()
    specs["q08_batch_counts"].fn(spark, sf_dir).collect()

    sched = spark.sparkContext._jsc.sc().dagScheduler()

    def job_counter() -> int:
        v = sched.nextJobId()
        return v if isinstance(v, int) else v.get()

    store = spark.sparkContext._jsc.sc().statusStore()

    def job_details(j0: int, j1: int) -> list[str]:
        out = []
        for jid in range(j0, j1):
            try:
                j = store.job(jid)
            except Exception:  # noqa: BLE001
                continue
            dur = (
                j.completionTime().get().getTime()
                - j.submissionTime().get().getTime()
            ) / 1000.0
            out.append(
                f"    job {jid}: {dur:7.3f}s stages={j.stageIds().size()} "
                f"tasks={j.numTasks()}"
            )
        return out

    for name in args.names:
        spec = specs[name]
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            j0 = job_counter()
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            j1 = job_counter()
            print(f"{name} run{i}: {dt:.3f}s jobs={j1 - j0}")
            if args.detail and i == args.runs - 1:
                for line in job_details(j0, j1):
                    print(line)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
