"""Multi-executor smoke test on a real Spark standalone cluster.

Everything in this engine is *designed* for multi-executor (broadcast
state, no N-sized driver collects, Arrow UDF kernels, lineage
truncation), but the test suite runs on local[N] where driver and
executors share one JVM — which can mask serialization bugs (closures
capturing unpicklable state, broadcast misuse, Python-worker env
drift). This script launches an actual standalone master + worker
(2 executors x 4 cores), runs the driver contract and a representative
query slice against spark://, and asserts the work really ran on 2
separate executor JVMs.

Usage:  python scripts/cluster_smoke.py
(idempotent; tears the cluster down afterwards)
"""

from __future__ import annotations

import functools
import os
import subprocess
import sys
import time

print = functools.partial(print, flush=True)

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_URL = "spark://127.0.0.1:7077"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "SPARK_HOME": SPARK_HOME,
    "SPARK_MASTER_HOST": "127.0.0.1",
    "SPARK_LOCAL_IP": "127.0.0.1",
    # NOTE: do NOT set SPARK_NO_DAEMONIZE here — spark-daemon.sh tests
    # whether the variable is SET (not its value) and would run the
    # master in the foreground, blocking this script.
    "PYSPARK_PYTHON": sys.executable,
    "PYSPARK_DRIVER_PYTHON": sys.executable,
}


def sh(cmd: list[str]) -> None:
    subprocess.run(cmd, check=True, env=ENV, capture_output=True)


def main() -> int:
    sh([f"{SPARK_HOME}/sbin/start-master.sh"])
    sh([f"{SPARK_HOME}/sbin/start-worker.sh", MASTER_URL, "-c", "8", "-m", "10g"])
    time.sleep(4)
    try:
        return run_checks()
    finally:
        subprocess.run([f"{SPARK_HOME}/sbin/stop-worker.sh"], env=ENV, capture_output=True)
        subprocess.run([f"{SPARK_HOME}/sbin/stop-master.sh"], env=ENV, capture_output=True)


def run_checks() -> int:
    sys.path.insert(0, REPO)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("harmony-cluster-smoke")
        .master(MASTER_URL)
        # 2 executors x 4 cores out of the worker's 8
        .config("spark.executor.cores", "4")
        .config("spark.executor.memory", "4g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    sc = spark.sparkContext

    # real clusters don't share the driver's sys.path — ship the package
    from harmony_spark.deploy import ship

    ship(spark)

    # the work must land on 2 real executor JVMs, not the driver
    hosts = (
        sc.parallelize(range(64), 16)
        .map(lambda _: __import__("os").getpid())
        .distinct()
        .collect()
    )
    infos = sc._jsc.sc().statusTracker().getExecutorInfos()
    n_exec = len(infos) - 1  # one entry is the driver
    print(f"executors: {n_exec}  distinct python-worker pids: {len(hosts)}")
    assert n_exec == 2, f"expected 2 executors, got {n_exec}"

    import __spark_entry__ as E

    t0 = time.time()
    n = len(E.entry(spark).collect())
    t_entry = time.time() - t0
    print(f"entry() on {MASTER_URL}: {n} rows in {t_entry:.1f}s")
    assert n > 0

    qs = E.queries()
    sf = "/root/testdata/sf0.01"
    slice_ = [
        "q11_contingency",  # broadcast joins + agg
        "q27_tumbling_window",  # events nanos path on remote executors
        "q35_minhash_lsh_pairs",  # md5/HOF kernels
        "q65_ivf_ann",  # literal-array argmax + window
        "q73_dedup_components",  # iterative loop + localCheckpoint
        "q75_dedup_components_star",  # round-compressed CC
        "q76_lsh_pairs_skew_safe",  # triangle-decomposed hot buckets
        "q89_prefix_similarity_join",  # bitmask path + localCheckpoint
        "q97_dedup_pipeline",  # composed exact->LSH->CC funnel
        "q98_semantic_dedup",  # bucketed-cosine->CC funnel
        "q115_graph_centrality",  # iterative pagerank + checkpoints
        "q116_embedding_covariance",  # mapInPandas Gram partials
        "q117_leakage_free_split",  # CC + md5 split composition
        "q122_hybrid_rrf",  # BM25 + dense fusion, two TakeOrdered legs
        "q130_full_curation",  # five-stage composed curation pipeline
        "q135_bpe_tokens",  # driver-learned merges shipped to executors
        "q137_als_completion",  # iterative ALS, batched numpy solves
        "q148_distributed_auc",  # two-phase sharded global rank
        "q164_asof_signup_attribution",  # union-tag as-of window
        "q165_sequence_packing",  # per-bucket applyInPandas fold
        "q167_entity_resolution",  # levenshtein blocking + star CC
        "q251_fifo_allocation",  # cumulative-block bucketed range join
        "q253_dau_wau_stickiness",  # island coalescing + sweep cumsum
        "q254_bfs_reachability",  # min-semiring frontier rounds
        "q260_bootstrap_ci",  # md5 resample join on the day census
        "q263_spatial_neighbor_join",  # 3x3 grid-cell candidate join
        "q272_dtw_alignment",  # banded integer DP in applyInPandas
        "q273_golden_record",  # ER closure + survivorship votes
        "harmony_correct",  # full harmony: broadcasts + Arrow passes
        "harmony_stream_drift",  # stateful streaming on real executors
    ]
    for name in slice_:
        t0 = time.time()
        k = len(qs[name](spark, sf).collect())
        print(f"{name}: {k} rows in {time.time() - t0:.1f}s")
        assert k > 0, name
    print("CLUSTER SMOKE OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
