"""Per-query shuffle-volume report: run registered queries with the
Spark UI enabled and read stage-level shuffle read/write bytes from the
REST API (/api/v1/applications/<app>/stages). This turns the "digest-
not-document shuffles" design claims into numbers: a dedup query over
N MB of text should shuffle KBs, not the corpus.

    python scripts/query_metrics.py [query ...]   # default: dedup family

Output: one line per query — input rows, wall seconds, total shuffle
write bytes across its stages (attributed by stage submission time).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF = "/root/testdata/sf0.1"

DEFAULT = [
    "q30_exact_dedup",
    "q35_minhash_lsh_pairs",
    "q97_dedup_pipeline",
    "q112_source_overlap_matrix",
    "q118_soft_dedup_weights",
    "q120_snapshot_diff",
    "q110_unigram_surprisal",
]


def _stages(ui: str, app: str) -> dict[int, dict]:
    data = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    return {(s["stageId"], s["attemptId"]): s for s in data}


def main() -> int:
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from harmony_spark.registry import load_all

    spark = (
        SparkSession.builder.appName("query-metrics")
        .master(f"local[{os.environ['SPARK_GRAFT_CPUS']}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    qs = load_all()
    names = sys.argv[1:] or DEFAULT
    out = {}
    for name in names:
        before = set(_stages(ui, app))
        t0 = time.perf_counter()
        n = qs[name].fn(spark, SF).count()
        wall = time.perf_counter() - t0
        after = _stages(ui, app)
        new = [after[k] for k in after if k not in before]
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        sr = sum(s.get("shuffleReadBytes", 0) for s in new)
        inb = sum(s.get("inputBytes", 0) for s in new)
        out[name] = {
            "rows": n,
            "seconds": round(wall, 2),
            "input_mb": round(inb / 1e6, 2),
            "shuffle_write_mb": round(sw / 1e6, 3),
            "shuffle_read_mb": round(sr / 1e6, 3),
            "n_stages": len(new),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"query_metrics": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
