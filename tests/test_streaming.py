"""Structured Streaming surface tests: each streaming operator is run
over the events file stream with availableNow and compared against its
oracle-checked batch equivalent (q27/q28/q29)."""

from __future__ import annotations

import pytest

from harmony_spark.registry import load_all
from harmony_spark.streaming import ops


def run_stream(q_df, spark, name: str, mode: str):
    query = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_matches_batch(spark, sf_dir):
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(ops.tumbling_counts(events), spark, "t_tumbling", "complete")
    batch = load_all()["q27_tumbling_window"].fn(spark, sf_dir)
    g = {(r["h"], r["event_type"]): (r["n"], r["v"]) for r in got.collect()}
    b = {(r["h"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()}
    assert g == b


def test_session_window_matches_batch(spark, sf_dir):
    events = ops.stream_events(spark, sf_dir)
    sessions = run_stream(ops.user_sessions(events), spark, "t_sessions", "complete")
    got = sessions.groupBy("user_id").count()
    batch = load_all()["q28_sessionization"].fn(spark, sf_dir)
    g = {r["user_id"]: r["count"] for r in got.collect()}
    b = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    # q28 limits to first 100 users; compare on that intersection
    assert all(g[u] == n for u, n in b.items())


def test_stateful_dedup_matches_batch(spark, sf_dir):
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(ops.stateful_dedup(events), spark, "t_dedup", "append")
    n_unique = load_all()["q29_dedup_by_key"].fn(spark, sf_dir).first()["n_unique"]
    assert got.count() == n_unique


def test_sliding_window_runs(spark, sf_dir):
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(ops.sliding_counts(events), spark, "t_sliding", "complete")
    rows = got.collect()
    assert len(rows) > 0
    # each event lands in size/slide = 4 windows
    total_events = sum(r["n"] for r in rows)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total_events == 4 * n_events


def test_custom_stateful_operator(spark, sf_dir):
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(ops.running_user_totals(events), spark, "t_totals", "update")
    # final state per user == batch groupBy
    import pyspark.sql.functions as F

    from harmony_spark.io import table

    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("value_sum"))
    )
    g = {r["user_id"]: (r["n_events"], r["value_sum"]) for r in got.collect()}
    b = {r["user_id"]: (r["n_events"], r["value_sum"]) for r in batch.collect()}
    assert g == b


def test_stream_static_join(spark, sf_dir):
    """Stream-static broadcast enrichment: every event row gets its
    user segment; result equals the batch join."""
    import pyspark.sql.functions as F
    from harmony_spark.io import table

    user_dim = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("segment", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    user_dim.persist().count()
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(ops.enrich_with_users(events, user_dim), spark, "t_enrich", "append")
    n_events = table(spark, sf_dir, "events").count()
    assert got.count() == n_events
    bad = got.where(
        (F.col("segment") != F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
        | F.col("segment").isNull()
    ).count()
    assert bad == 0
    user_dim.unpersist()


def test_streaming_harmony_inference(spark, sf_dir):
    """Fit harmony once, then fold new cells in via transform() — the
    streaming micro-batch path must produce exactly the batch-transform
    result for the same rows."""
    import numpy as np
    import pyspark.sql.functions as F
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.io import table

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("string").alias("label")
    )
    model = HarmonySpark(
        e, ["label"], features_col="embedding", id_col="vec_id",
        nclust=5, max_iter=1, lamb=1.0, seed=42,
    )
    model.run().count()

    batch_out = {
        r["cell_id"]: r["z_corr"]
        for r in model.transform(e, features_col="embedding", id_col="vec_id").collect()
    }

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
        .select("vec_id", "embedding", F.col("label").cast("string").alias("label"))
    )
    stream_corrected = model.transform(stream, features_col="embedding", id_col="vec_id")
    got = run_stream(stream_corrected, spark, "t_harmony_infer", "append")
    stream_out = {r["cell_id"]: r["z_corr"] for r in got.collect()}

    assert set(stream_out) == set(batch_out)
    for k in batch_out:
        np.testing.assert_allclose(stream_out[k], batch_out[k], atol=1e-6)


def test_drift_monitor_stateful_across_triggers(spark, sf_dir, tmp_path):
    """Fit once, then stream (a) the training cells split over 3 files /
    3 triggers — state must accumulate across triggers and nothing may
    drift — and (b) a shifted copy — every batch must flag."""
    import numpy as np
    import pyspark.sql.functions as F
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.io import table
    from harmony_spark.streaming.drift import drift_monitor

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("string").alias("label")
    )
    model = HarmonySpark(
        e, ["label"], features_col="embedding", id_col="vec_id",
        nclust=5, max_iter=1, lamb=1.0, seed=42,
    )
    model.run().count()
    batch_sizes = {r["label"]: r["n"] for r in e.groupBy("label").agg(F.count("*").alias("n")).collect()}

    insample_dir = str(tmp_path / "insample")
    e.repartition(3).write.parquet(insample_dir)
    # guaranteed drift at ANY fixture: every cell points exactly at
    # centroid 0, so the assignment mix collapses to (almost) one-hot —
    # chi2 grows with n regardless of the data's cluster structure
    c0 = [float(v) for v in model.get_Y()[:, 0]]
    shifted_dir = str(tmp_path / "shifted")
    e.withColumn(
        "embedding", F.array(*[F.lit(v) for v in c0]).cast("array<float>")
    ).write.parquet(shifted_dir)

    def run_drift(path, name, max_files=None):
        reader = spark.readStream.schema(e.schema)
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        stream = reader.parquet(path)
        mon = drift_monitor(model, stream, features_col="embedding", id_col="vec_id")
        return run_stream(mon, spark, name, "update").collect()

    rows = run_drift(insample_dir, "t_drift_in", max_files=1)
    # state crossed micro-batch boundaries: some key reported more than once
    per_key = {}
    for r in rows:
        per_key.setdefault(r["batch_code"], []).append(r["n_cells"])
    assert max(len(v) for v in per_key.values()) > 1
    # final running count per batch equals the true batch size
    label_of = dict(enumerate(model.p.levels[0]))
    for b, counts in per_key.items():
        assert max(counts) == batch_sizes[label_of[b]]
    assert not any(r["drifted"] for r in rows)
    assert all(r["chi2"] < r["chi2_crit"] for r in rows)

    rows = run_drift(shifted_dir, "t_drift_shift")
    assert len(rows) == len(per_key)
    assert all(r["drifted"] and r["chi2"] > r["chi2_crit"] for r in rows)


def test_drift_refit_controller_closes_loop(spark, sf_dir, tmp_path):
    """Shifted cells stream in over 3 triggers: the controller must fire
    the refit callback exactly once (2-consecutive latch), and a
    warm-started refit on the shifted corpus must stop flagging it."""
    import pyspark.sql.functions as F
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.io import table
    from harmony_spark.streaming.drift import DriftRefitController, drift_monitor

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("string").alias("label")
    )
    kw = dict(
        features_col="embedding", id_col="vec_id",
        nclust=5, max_iter=1, lamb=1.0, seed=42,
    )
    model = HarmonySpark(e, ["label"], **kw)
    model.run().count()

    shifted = e.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x + F.lit(2.0)).cast("array<float>"),
    )
    shifted_dir = str(tmp_path / "shifted")
    shifted.repartition(3).write.parquet(shifted_dir)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(shifted_dir)
    )
    mon = drift_monitor(model, stream, features_col="embedding", id_col="vec_id")

    episodes = []
    ctl = DriftRefitController(refit=episodes.append, consecutive=2)
    q = ctl.attach(mon)
    q.awaitTermination(120)

    # 3 triggers, all drifted: latch must allow exactly one refit
    assert len(ctl.refits) == 1 and len(episodes) == 1
    assert episodes[0]  # at least one batch level named

    # close the loop: warm-start refit on the drifted corpus clears it
    refit = HarmonySpark(shifted, ["label"], init_Y=model.get_Y(), **kw)
    refit.run().count()
    mon2 = drift_monitor(refit, spark.readStream.schema(e.schema).parquet(shifted_dir),
                         features_col="embedding", id_col="vec_id")
    rows = run_stream(mon2, spark, "t_refit_clear", "update").collect()
    assert rows and not any(r["drifted"] for r in rows)


def test_drift_monitor_second_covariate(spark, sf_dir, tmp_path):
    """covariate=1 tracks the second covariate's levels against its own
    column block of O: in-sample clean, shifted flagged."""
    import pyspark.sql.functions as F
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.io import table
    from harmony_spark.streaming.drift import drift_monitor

    e = table(spark, sf_dir, "embeddings")
    d = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    cells = e.join(F.broadcast(d), "vec_id").select(
        "vec_id", "embedding",
        F.col("label").cast("string").alias("label"), "lang",
    )
    model = HarmonySpark(
        cells, ["label", "lang"], features_col="embedding", id_col="vec_id",
        nclust=5, max_iter=1, lamb=1.0, seed=42,
    )
    model.run().count()

    in_dir, sh_dir = str(tmp_path / "in"), str(tmp_path / "sh")
    cells.write.parquet(in_dir)
    cells.withColumn(
        "embedding",
        F.transform("embedding", lambda x: x + F.lit(2.0)).cast("array<float>"),
    ).write.parquet(sh_dir)

    def monitor(path, name):
        stream = spark.readStream.schema(cells.schema).parquet(path)
        mon = drift_monitor(
            model, stream, features_col="embedding", id_col="vec_id", covariate=1
        )
        return run_stream(mon, spark, name, "update").collect()

    rows = monitor(in_dir, "t_drift_cov2_in")
    n_langs = len(model.p.levels[1])
    assert {r["batch_code"] for r in rows} == set(range(n_langs))
    assert not any(r["drifted"] for r in rows)
    rows = monitor(sh_dir, "t_drift_cov2_sh")
    assert all(r["drifted"] for r in rows)


def test_parquet_sink_checkpoint_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart semantics of the durable sink: run 1 drains file
    A; files B,C then arrive; run 2 (same checkpoint) must emit B+C and
    NOT re-emit A, leaving the sink exactly equal to the input set."""
    import shutil

    import pyspark.sql.functions as F
    from harmony_spark.io import table
    from harmony_spark.streaming.ops import parquet_sink

    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    parts = events.randomSplit([1.0, 1.0, 1.0], seed=7)
    staged = [str(tmp_path / f"staged{i}") for i in range(3)]
    for df, p in zip(parts, staged):
        df.coalesce(1).write.parquet(p)

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def arrive(i):
        for f in (tmp_path / f"staged{i}").glob("part-*.parquet"):
            shutil.copy(f, src / f"file{i}.parquet")

    def drain():
        q = parquet_sink(
            spark.readStream.schema(events.schema).parquet(str(src)), sink, ckpt
        )
        q.awaitTermination(120)

    arrive(0)
    drain()
    n_a = parts[0].count()
    assert spark.read.parquet(sink).count() == n_a

    arrive(1)
    arrive(2)
    drain()
    got = spark.read.parquet(sink)
    assert got.count() == events.count()  # A exactly once, B+C added
    assert got.select(F.countDistinct("event_id")).first()[0] == events.count()


def test_streaming_document_ingest_matches_batch(spark, sf_dir):
    """Quality gate + fingerprint dedup over the documents stream must
    keep exactly one representative per surviving fingerprint, matching
    the batch computation."""
    import pyspark.sql.functions as F
    from harmony_spark.io import table

    got = run_stream(
        ops.ingest_documents(ops.stream_documents(spark, sf_dir)),
        spark, "t_doc_ingest", "append",
    ).collect()

    toks = F.split(F.lower(F.col("text")), r"\s+")
    batch = (
        table(spark, sf_dir, "documents")
        .withColumn("n_tokens", F.size(toks))
        .where(F.col("n_tokens").between(20, 60))
        .withColumn(
            "fp",
            F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ").cast("binary")),
        )
    )
    want_fps = {r["fp"] for r in batch.select("fp").distinct().collect()}
    assert {r["fp"] for r in got} == want_fps
    assert len(got) == len(want_fps)  # exactly one survivor per fp
    assert all(20 <= r["n_tokens"] <= 60 for r in got)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """The watermarked stream-stream self-join must produce exactly the
    batch interval join's per-user pair counts (q77)."""
    import pyspark.sql.functions as F

    got = run_stream(
        ops.interval_join_views_clicks(ops.stream_events(spark, sf_dir)),
        spark, "t_interval_join", "append",
    )
    g = {
        r["user_id"]: r["n"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    b = {
        r["user_id"]: r["n_pairs"]
        for r in load_all()["q77_interval_join"].fn(spark, sf_dir).collect()
    }
    assert g == b


def test_drift_monitor_unseen_level_flags_not_crashes(spark, sf_dir, tmp_path):
    """A covariate level that never existed at fit time is the sharpest
    drift signal: it must surface as sentinel batch_code -1 and flag,
    not kill the stream; transform() on the same data must raise a
    clear error instead of an opaque worker crash."""
    import pyspark.sql.functions as F
    from harmony_spark.core.algorithm import HarmonySpark
    from harmony_spark.io import table
    from harmony_spark.streaming.drift import drift_monitor

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("string").alias("label")
    )
    model = HarmonySpark(
        e, ["label"], features_col="embedding", id_col="vec_id",
        nclust=5, max_iter=1, lamb=1.0, seed=42,
    )
    model.run().count()

    novel = e.withColumn("label", F.lit("brand_new_batch"))
    novel_dir = str(tmp_path / "novel")
    novel.write.parquet(novel_dir)

    stream = spark.readStream.schema(e.schema).parquet(novel_dir)
    mon = drift_monitor(model, stream, features_col="embedding", id_col="vec_id")
    rows = run_stream(mon, spark, "t_drift_novel", "update").collect()
    assert len(rows) == 1
    assert rows[0]["batch_code"] == -1
    assert rows[0]["n_cells"] == e.count()
    assert rows[0]["drifted"]

    import pyspark.errors

    with pytest.raises(Exception, match="unseen at fit time"):
        model.transform(novel, features_col="embedding", id_col="vec_id").collect()


def test_sink_compaction_preserves_rows(spark, sf_dir, tmp_path):
    """Three availableNow sink runs leave >=3 files; compaction must
    collapse them without losing or duplicating a row."""
    import glob

    import pyspark.sql.functions as F
    from harmony_spark.io import table
    from harmony_spark.operators.layout import compact_parquet
    from harmony_spark.streaming.ops import parquet_sink

    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    parts = events.randomSplit([1.0, 1.0, 1.0], seed=11)
    src = tmp_path / "src"
    src.mkdir()
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(str(tmp_path / f"st{i}"))
        for f in (tmp_path / f"st{i}").glob("part-*.parquet"):
            f.rename(src / f"file{i}.parquet")
        q = parquet_sink(
            spark.readStream.schema(events.schema).parquet(str(src)), sink, ckpt,
        )
        q.awaitTermination(120)

    before = len(glob.glob(f"{sink}/*.parquet"))
    assert before >= 3
    n_before, n_after = compact_parquet(spark, sink, target_mb=128)
    assert (n_before, n_after) == (before, 1)
    got = spark.read.parquet(sink)
    assert got.count() == events.count()
    assert got.select(F.countDistinct("event_id")).first()[0] == events.count()


def test_stream_stream_left_outer_interval_join(spark, sf_dir, tmp_path):
    """Outer rows must emit once the watermark passes their window:
    matched output is a subset of the batch inner join, unmatched views
    carry NULL click times, nothing is fabricated."""
    import pyspark.sql.functions as F
    from harmony_spark.io import table

    ev = table(spark, sf_dir, "events")
    srt = str(tmp_path / "sorted")
    ev.orderBy("ts").coalesce(1).write.parquet(srt)
    rows = spark.read.parquet(srt).collect()
    n = len(rows)
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for i in range(3):  # time-ordered thirds -> watermark advances per trigger
        part = spark.createDataFrame(rows[i * n // 3 : (i + 1) * n // 3], ev.schema)
        part.coalesce(1).write.parquet(str(tmp_path / f"p{i}"))
        for f in (tmp_path / f"p{i}").glob("part-*.parquet"):
            f.rename(stream_dir / f"file{i}.parquet")

    raw = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    got = run_stream(
        ops.interval_left_join_views_clicks(raw), spark, "t_outer_join", "append"
    ).collect()

    matched = {(r["user_id"], r["v_ts"], r["c_ts"]) for r in got if r["c_ts"] is not None}
    unmatched = [r for r in got if r["c_ts"] is None]
    assert unmatched, "watermark advancement must flush unmatched views"
    assert all(r["v_ts"] is not None for r in got)

    v = ev.where(F.col("event_type") == "view").select("user_id", F.col("ts").alias("v_ts"))
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    inner = {
        (r["user_id"], r["v_ts"], r["c_ts"])
        for r in v.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select("user_id", "v_ts", "c_ts").collect()
    }
    assert matched <= inner
    # an unmatched view really has no qualifying click in the batch view
    inner_views = {(u, t) for u, t, _ in inner}
    for r in unmatched:
        assert (r["user_id"], r["v_ts"]) not in inner_views


def test_streaming_heavy_hitters_bounds(spark, sf_dir):
    """Sharded Space-Saving sketch: every estimate must satisfy
    true <= est <= true + err (overestimate with tracked error), every
    key whose true count exceeds the per-shard guarantee threshold must
    be present, and state stays at <= n_shards * capacity counters."""
    import pyspark.sql.functions as F

    from harmony_spark.io import table

    # sf0.001 has ~15 distinct users; capacity 3 x 2 shards forces real
    # evictions so the error-tracking path is exercised, not just the
    # fill path
    capacity, n_shards = 3, 2
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(
        ops.streaming_heavy_hitters(events, capacity=capacity, n_shards=n_shards),
        spark,
        "t_hh",
        "update",
    )
    # single source file -> one micro-batch -> emissions ARE the final
    # sketch; max() per (shard, key) is then exact
    latest = (
        got.groupBy("shard", "key").agg(F.max("est").alias("est"), F.max("err").alias("err"))
    )
    sk = {r["key"]: (r["est"], r["err"]) for r in latest.collect()}
    assert len(sk) <= n_shards * capacity

    ev = table(spark, sf_dir, "events").select(F.col("user_id").cast("string").alias("k"))
    true = {r["k"]: r["n"] for r in ev.groupBy("k").agg(F.count("*").alias("n")).collect()}
    shard_of = {
        r["k"]: r["s"]
        for r in ev.select(
            "k", (F.abs(F.xxhash64("k")) % n_shards).alias("s")
        ).distinct().collect()
    }
    shard_n = {}
    for k, n in true.items():
        shard_n[shard_of[k]] = shard_n.get(shard_of[k], 0) + n

    for k, (est, err) in sk.items():
        assert true[k] <= est <= true[k] + err, (k, est, err, true[k])
    # guaranteed presence: true count > N_shard / capacity
    for k, n in true.items():
        if n > shard_n[shard_of[k]] / capacity:
            assert k in sk, (k, n)


def test_state_v2_running_totals_parity(spark, sf_dir):
    """Same parity check as test_custom_stateful_operator, on the
    Spark-4 transformWithStateInPandas API. Skips where the runtime
    lacks a working google.protobuf (the v2 state server's wire
    protocol) — see ops.state_v2_available."""
    if not ops.state_v2_available():
        pytest.skip("google.protobuf unavailable: state v2 runner cannot start")
    events = ops.stream_events(spark, sf_dir)
    got = run_stream(ops.running_user_totals_v2(events), spark, "t_totals_v2", "update")
    import pyspark.sql.functions as F

    from harmony_spark.io import table

    batch = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("value_sum"))
    )
    g = {r["user_id"]: (r["n_events"], r["value_sum"]) for r in got.collect()}
    b = {r["user_id"]: (r["n_events"], r["value_sum"]) for r in batch.collect()}
    assert g == b


def test_streaming_neardup_admission_matches_batch(spark, sf_dir):
    """The streaming delta-ingest admission (row-local signatures +
    stream-static band-index join) must flag exactly the delta docs the
    batch q132 pipeline flags, with the same per-doc match counts."""
    import pyspark.sql.functions as F
    from harmony_spark.extensions.dedup import _band_table_of
    from harmony_spark.io import table

    docs = table(spark, sf_dir, "documents")
    is_delta = F.col("doc_id") % 10 >= 8
    hist_bands = _band_table_of(docs.where(~is_delta)).localCheckpoint()

    delta_stream = ops.stream_documents(spark, sf_dir).where(is_delta)
    got = {
        r["doc_id"]: r["n_hist_matches"]
        for r in run_stream(
            ops.neardup_admission(delta_stream, hist_bands),
            spark, "t_neardup_admission", "update",
        ).collect()
    }

    want = {
        r["delta_id"]: r["n_matches"]
        for r in _band_table_of(docs.where(is_delta))
        .alias("d")
        .join(
            hist_bands.alias("h"),
            (F.col("d.b") == F.col("h.b")) & (F.col("d.band") == F.col("h.band")),
        )
        .select(F.col("d.doc_id").alias("delta_id"), F.col("h.doc_id").alias("hist_id"))
        .distinct()
        .groupBy("delta_id")
        .agg(F.count("*").alias("n_matches"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_rowlocal_signature_parity(spark, sf_dir):
    """The streaming-legal row-local MinHash formulation must produce
    byte-identical signatures to the batch explode+groupBy one."""
    from harmony_spark.extensions.dedup import (
        _minhash_sig_rowlocal,
        _minhash_sig_spark,
    )
    from harmony_spark.io import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    a = {tuple(r) for r in _minhash_sig_spark(docs).collect()}
    b = {tuple(r) for r in _minhash_sig_rowlocal(docs).collect()}
    assert a == b and len(a) > 0


def test_streaming_windowed_distinct_within_tolerance(spark, sf_dir):
    """Streaming HLL distinct-per-window (bounded state where exact
    distinct is illegal/unbounded) must land within 2% of the exact
    batch answer for every (window, event_type) group."""
    import pyspark.sql.functions as F
    from harmony_spark.io import table

    got = {
        (r["win_start"], r["event_type"]): r["approx_users"]
        for r in run_stream(
            ops.windowed_distinct_users(ops.stream_events(spark, sf_dir)),
            spark, "t_win_distinct", "update",
        ).collect()
    }
    exact = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n")
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(1, 0.02 * n), (k, got[k], n)


def test_streaming_asof_enrich_matches_batch(spark, sf_dir, tmp_path):
    """The streaming as-of enrichment (foreachBatch + asof_join against
    the static signup dim) must agree row-for-row with the batch q164
    (which DuckDB's native ASOF JOIN oracle-checks) — the static right
    side makes the result independent of micro-batch slicing."""
    from pyspark.sql import functions as F

    events = ops.stream_events(spark, sf_dir)
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    from harmony_spark.io import table

    signups = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "signup")
        .groupBy("user_id", F.col("ts").alias("signup_ts"))
        .agg(F.max("event_id").alias("signup_id"))
    )
    sink = str(tmp_path / "asof_sink")
    q = ops.asof_enrich_sink(
        purchases, signups, sink, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["signup_id"])
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        (r["purchase_id"], r["signup_id"])
        for r in load_all()["q164_asof_signup_attribution"].fn(spark, sf_dir).collect()
    }
    assert got == batch and len(got) > 0
