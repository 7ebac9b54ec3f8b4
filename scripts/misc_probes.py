"""Reproducers for the remaining PERFORMANCE.md measurements: every
number in those sections comes from one of these subcommands.

    python scripts/misc_probes.py cc         # connected components at scale
    python scripts/misc_probes.py skew       # hot-key agg/join strategies
    python scripts/misc_probes.py codec      # parquet codec size/scan
    python scripts/misc_probes.py warmstart  # init_Y warm-start refit
    python scripts/misc_probes.py quality    # E-step granularity vs quality
    python scripts/misc_probes.py curationscale  # curation ops at 20x corpus

Each prints one JSON line with its measurements.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _spark(name):
    from harmony_spark.session import get_spark

    s = get_spark(name)
    s.sparkContext.setLogLevel("ERROR")
    return s


def probe_cc() -> dict:
    """Large/small-star CC: a 1M-random-edge graph (collapses to one
    giant component) and a 5,000-node chain (diameter 4,999 — the case
    where min-label propagation would need ~5,000 rounds)."""
    from harmony_spark.operators.graph import connected_components

    spark = _spark("cc-probe")
    out = {}
    random_edges = (
        spark.range(1_000_000)
        .select(
            (F.abs(F.xxhash64("id")) % 800_000).alias("src"),
            (F.abs(F.xxhash64("id", F.lit(1))) % 800_000).alias("dst"),
        )
    )
    stats: dict = {}
    t0 = time.perf_counter()
    n = connected_components(random_edges, stats=stats).count()
    out["random_1m_edges"] = {
        "nodes": n, "rounds": stats.get("rounds"),
        "seconds": round(time.perf_counter() - t0, 1),
    }
    chain = spark.range(4_999).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    stats = {}
    t0 = time.perf_counter()
    n = connected_components(chain, stats=stats).count()
    out["chain_5k_diameter"] = {
        "nodes": n, "rounds": stats.get("rounds"),
        "seconds": round(time.perf_counter() - t0, 1),
    }
    spark.stop()
    return out


def probe_skew() -> dict:
    """Hot-key stress: 50% of rows on one key. Aggregation (plain vs
    salted) and a sort-merge join vs a 1k-key dim (plain+AQE-off,
    salted+AQE-off, plain+AQE-on)."""
    from harmony_spark.operators.skew import salted_aggregate, salted_join

    spark = _spark("skew-probe")
    out = {}
    hot = spark.range(20_000_000).select(
        F.when(F.rand(1) < 0.5, F.lit(0)).otherwise(F.col("id") % 100_000).alias("k"),
        F.rand(2).alias("v"),
    )
    t0 = time.perf_counter()
    hot.groupBy("k").agg(F.sum("v")).count()
    out["agg_plain_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    salted_aggregate(hot, "k", {"v": "sum"}, n_salts=32).count()
    out["agg_salted_s"] = round(time.perf_counter() - t0, 1)

    fact = spark.range(8_000_000).select(
        F.when(F.rand(3) < 0.5, F.lit(0)).otherwise(F.col("id") % 1_000).alias("k"),
        F.rand(4).alias("v"),
    )
    dim = spark.range(1_000).select(F.col("id").alias("k"), F.rand(5).alias("w"))
    for aqe in ("false", "true"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t0 = time.perf_counter()
        fact.join(dim, "k").count()
        out[f"join_plain_aqe_{aqe}_s"] = round(time.perf_counter() - t0, 1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t0 = time.perf_counter()
    salted_join(fact, dim, "k", n_salts=32).count()
    out["join_salted_aqe_false_s"] = round(time.perf_counter() - t0, 1)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    spark.stop()
    return out


def probe_codec() -> dict:
    """sf0.1 lineitem rewritten at 8 files per codec; scan = SUM over
    all numeric columns, best of 3."""
    spark = _spark("codec-probe")
    src = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").repartition(8)
    src.cache().count()
    import os

    out = {}
    tmp = tempfile.mkdtemp(prefix="codec_probe_")
    num_cols = [c for c, t in src.dtypes if t in ("double", "bigint", "int")]
    for codec in ("none", "snappy", "zstd", "gzip"):
        path = f"{tmp}/{codec}"
        t0 = time.perf_counter()
        src.write.option("compression", codec).parquet(path)
        wr = time.perf_counter() - t0
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spark.read.parquet(path).agg(*[F.sum(c) for c in num_cols]).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[codec] = {
            "mb": round(size / 1e6, 1),
            "write_s": round(wr, 2),
            "scan_s": round(best, 3),
        }
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


def probe_warmstart() -> dict:
    """Warm-start refit: fit on 90% of the sf0.1 embeddings, then refit
    the full corpus from the previous centroids (init_Y) vs cold."""
    from harmony_spark.core.algorithm import HarmonySpark

    spark = _spark("warmstart-probe")
    emb = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(
            F.col("vec_id").alias("cell_id"),
            F.col("embedding").cast("array<float>").alias("features"),
            (F.col("vec_id") % 3).cast("string").alias("batch"),
        )
    )
    kw = dict(id_col="cell_id", nclust=20, max_iter=10, theta=1.0, sigma=0.1, lamb=1.0, seed=7)
    sub = emb.where(F.col("cell_id") % 10 != 0)
    prev = HarmonySpark(sub, ["batch"], **kw)
    prev.run().count()
    t0 = time.perf_counter()
    cold = HarmonySpark(emb, ["batch"], **kw)
    cold.run().count()
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    warm = HarmonySpark(emb, ["batch"], init_Y=prev.get_Y(), **kw)
    warm.run().count()
    warm_s = time.perf_counter() - t0
    spark.stop()
    return {
        "cold_s": round(cold_s, 1),
        "warm_s": round(warm_s, 1),
        "cold_obj": round(cold.objective_kmeans[-1], 1),
        "warm_obj": round(warm.objective_kmeans[-1], 1),
    }


def probe_quality() -> dict:
    """E-step granularity vs quality: 20k-cell fixture with real batch
    structure, K=20, 5 full rounds (early stop disabled); final
    objective + chi2(cluster, batch) per mode."""
    from harmony_scale_probe import synth_cells

    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.core.params import HarmonyOptions

    spark = _spark("quality-probe")
    df = synth_cells(spark, 20_000, 20)
    opts = HarmonyOptions(epsilon_harmony=-1, epsilon_cluster=-1)
    out = {}
    for label, kw in (
        ("batch_em", {}),
        ("blocked_4", {"estep_mode": "blocked", "n_blocks": 4}),
        ("blocked_20", {"estep_mode": "blocked", "n_blocks": 20}),
    ):
        t0 = time.perf_counter()
        m = HarmonySpark(
            df, ["batch"], id_col="cell_id", nclust=20, max_iter=5,
            theta=1.0, sigma=0.1, lamb=1.0, seed=7, options=opts, **kw,
        )
        m.run().count()
        dt = time.perf_counter() - t0
        O, E = np.asarray(m.O, dtype=np.float64), np.asarray(m.E, dtype=np.float64)
        chi2 = float((((O - E) ** 2) / np.maximum(E, 1e-12)).sum())
        out[label] = {
            "seconds": round(dt, 1),
            "objective": round(m.objective_kmeans[-1], 4),
            "chi2": round(chi2, 1),
        }
    spark.stop()
    return out


def probe_textscale() -> dict:
    """Corpus-scaling check for the linear text operators: replicate
    sf0.1 documents 20x (100k docs) with fresh doc_ids and run token
    stats, lang-id, quality scoring and the repetition metrics — the
    ops whose cost must stay linear in corpus size."""
    from pyspark.sql import DataFrame

    from harmony_spark.registry import load_all

    spark = _spark("textscale-probe")
    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rest = [c for c in src.columns if c != "doc_id"]
    big = (
        spark.range(20)
        .crossJoin(src)
        .select(
            (F.col("doc_id") + F.col("id") * 1_000_000).alias("doc_id"), *rest
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    big.cache().count()
    tmp = tempfile.mkdtemp(prefix="textscale_")
    big.write.parquet(f"{tmp}/documents.parquet")

    specs = load_all()
    out: dict = {"n_docs": big.count()}
    for name in (
        "q32_token_stats",
        "q39_lang_id",
        "q40_quality_score",
        "q30_exact_dedup",
        "q41_fingerprint_dedup",
        "q358_exact_span_dedup",
        "q372_trigram_novelty",
        "q373_simpson_diversity",
    ):
        t0 = time.perf_counter()
        n = specs[name].fn(spark, tmp).count()
        out[name] = {"rows": n, "seconds": round(time.perf_counter() - t0, 2)}
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


def probe_curationscale() -> dict:
    """Corpus-scaling check for the curation operators (q102, q104-q109):
    replicate sf0.1 documents 20x (100k docs) with fresh doc_ids and
    compare wall time vs the sf0.1 bench numbers — every one of these is
    a scan + digest-keyed shuffle (or a bounded aggregate), so wall
    growth must stay at-or-below the 20x data growth."""
    from harmony_spark.registry import load_all

    spark = _spark("curationscale-probe")
    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rest = [c for c in src.columns if c != "doc_id"]
    big = (
        spark.range(20)
        .crossJoin(src)
        .select(
            (F.col("doc_id") + F.col("id") * 1_000_000).alias("doc_id"), *rest
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    big.cache().count()
    tmp = tempfile.mkdtemp(prefix="curationscale_")
    big.write.parquet(f"{tmp}/documents.parquet")

    specs = load_all()
    out: dict = {"n_docs": big.count()}
    for name in (
        "q102_quality_funnel",
        "q104_decontamination",
        "q105_chunk_dedup",
        "q106_boilerplate_removal",
        "q107_sequence_packing",
        "q108_domain_mix_weights",
        "q109_training_shards",
        "q110_unigram_surprisal",
        "q111_domain_kl_drift",
        "q135_bpe_tokens",
    ):
        t0 = time.perf_counter()
        n = specs[name].fn(spark, tmp).count()
        out[name] = {"rows": n, "seconds": round(time.perf_counter() - t0, 2)}
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


def probe_dedupscale() -> dict:
    """Near-dup-funnel scaling: replicate sf0.1 documents 20x (100k
    docs) with a per-copy suffix token — copies are NEAR-duplicates,
    not exact ones, so the LSH path does real work and every document
    sits in a ~20-member near-dup cluster. This is the adversarial
    shape for pair generation (every bucket is a clique); the star-CC
    + bucket-local band joins must stay wall-bounded."""
    from harmony_spark.registry import load_all

    spark = _spark("dedupscale-probe")
    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    rest = [c for c in src.columns if c not in ("doc_id", "text")]
    big = (
        spark.range(20)
        .crossJoin(src)
        .select(
            (F.col("doc_id") + F.col("id") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" copytag"), F.col("id").cast("string")).alias("text"),
            *rest,
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    big.cache().count()
    tmp = tempfile.mkdtemp(prefix="dedupscale_")
    big.write.parquet(f"{tmp}/documents.parquet")

    specs = load_all()
    out: dict = {"n_docs": big.count()}
    for name in (
        "q97_dedup_pipeline",
        "q112_source_overlap_matrix",
        "q115_graph_centrality",
        "q118_soft_dedup_weights",
        "q130_full_curation",
        "q132_incremental_neardup",
    ):
        t0 = time.perf_counter()
        n = specs[name].fn(spark, tmp).count()
        out[name] = {"rows": n, "seconds": round(time.perf_counter() - t0, 2)}
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cc"
    fn = {
        "cc": probe_cc,
        "skew": probe_skew,
        "codec": probe_codec,
        "warmstart": probe_warmstart,
        "quality": probe_quality,
        "textscale": probe_textscale,
        "curationscale": probe_curationscale,
        "dedupscale": probe_dedupscale,
    }[which]
    print(json.dumps({which: fn()}))
