"""Structured Streaming surface (SURVEY.md §2.9 — extension; the
reference is strictly batch).

Every operator here has an oracle-checked batch equivalent in
:mod:`harmony_spark.operators.streaming_batch` (q27/q28/q29); the
streaming tests (tests/test_streaming.py) run these against the same
events data via a file stream with ``availableNow`` and assert agreement
with the batch results.

Scale notes: all operators are keyed-state operators — state is
partitioned by the grouping key and bounded by the watermark, so they
run unchanged on a real cluster against a Kafka/file firehose.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from harmony_spark.io import normalize_nanos_ts, table


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream (one-file micro-batch).

    Schema comes from the batch reader; ts is TIMESTAMP(NANOS) in the
    footer and gets the same version-adaptive normalization as the batch
    path (harmony_spark.io.normalize_nanos_ts): native micros-truncated
    timestamp_ntz on Spark 4.x, nanos-as-long rebuild on older Sparks.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_nanos_ts(stream)


def tumbling_counts(events: DataFrame, size: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window aggregate (q27 batch equivalent)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .select(F.col("w.start").alias("h"), "event_type", "n", "v")
    )


def sliding_counts(events: DataFrame, size: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Sliding event-time window (engine test only; no duckdb analogue)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n")
    )


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows with a 30-minute gap (q28 batch equivalent):
    one row per (user, session). Downstream per-user session counts are
    a stateless batch aggregate over this stream's sink (chaining a
    second streaming aggregation would need append+watermark
    finalization, which drops tail sessions on a bounded replay)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"), "n_events")
    )


def stateful_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Keyed dedup within the watermark (q29 batch equivalent)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_with_users(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a static
    dimension (broadcast to every micro-batch; no stream-side state).
    The canonical firehose -> dim-lookup pattern at 100 TB/day."""
    return events.join(F.broadcast(user_dim), "user_id", "left").select(
        "event_id", "ts", "user_id", "event_type", "value", "segment"
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum — the arbitrary-stateful surface the
    engine exposes for operators Spark lacks built-in."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [round(total, 6)]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, value_sum double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def parquet_sink(df: DataFrame, path: str, checkpoint: str, query_name: str = "parquet_sink"):
    """Durable streaming sink: append parquet with a checkpoint.

    The checkpoint (WAL + source offsets + file-sink manifest) is what
    makes restarts exactly-once: a restarted query resumes from the
    committed offsets and never re-emits a batch that already reached
    the sink manifest, so crash/redeploy at any point yields each input
    row exactly once in the output table. availableNow drains what
    exists and stops — the batch-ingest-shaped trigger for periodic
    runs of the same checkpointed pipeline."""
    return (
        df.writeStream.format("parquet")
        .queryName(query_name)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the documents table (schema from the batch
    footer; new parquet files landing in the directory are the
    micro-batches — the training-corpus ingest shape)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def ingest_documents(docs: DataFrame, min_tokens: int = 20, max_tokens: int = 60) -> DataFrame:
    """Streaming training-data ingest: quality gate + exact-dup drop.

    The length-window quality gate (q40's criterion) runs as a
    stateless filter; dedup keys on the canonical content fingerprint
    (q41: md5 of the sorted distinct token set) so the dedup state and
    shuffle carry 16-byte digests, never documents. dropDuplicates
    state grows with distinct fingerprints per run — bound it by
    running availableNow batches over a checkpointed parquet_sink
    (state resets per run, the sink manifest keeps cross-run
    exactly-once) or, with an event-time column, by a watermark."""
    toks = F.split(F.lower(F.col("text")), r"\s+")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(toks)), " ").cast("binary")
    )
    return (
        docs.withColumn("n_tokens", F.size(toks))
        .where(F.col("n_tokens").between(min_tokens, max_tokens))
        .withColumn("fp", fp)
        .dropDuplicates(["fp"])
        .select("doc_id", "lang", "source", "n_tokens", "fp")
    )


def interval_join_views_clicks(events: DataFrame) -> DataFrame:
    """Watermarked stream-stream self-join: clicks within one hour
    after a view by the same user (q77's streaming form).

    Both legs carry watermarks and the join has an explicit event-time
    bound, which is what lets the engine age out buffered view rows
    once no qualifying click can still arrive — state stays
    proportional to one watermark-window of traffic, not the stream's
    history. The click watermark is the view watermark + the join
    range, per the stream-stream join state-cleanup rule."""
    v = (
        events.where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    c = (
        events.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    return v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "v_ts", "c_ts")


def interval_left_join_views_clicks(events: DataFrame) -> DataFrame:
    """Left-outer variant of interval_join_views_clicks: views with no
    qualifying click emit (user_id, v_ts, NULL) once the watermark
    passes their join window — the "abandoned view" stream.

    Outer semantics under watermarks are inherently best-effort at the
    stream tail: a view is only declared unmatched when the watermark
    proves no click can still arrive, so rows near end-of-stream stay
    buffered. Matched output is a subset of the batch inner join (a
    click later than the view watermark may find its view evicted);
    tighten the view watermark to trade state for completeness."""
    v = (
        events.where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "30 minutes")
    )
    c = (
        events.where(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "90 minutes")
    )
    return v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("user_id", "v_ts", "c_ts")


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 32,
    n_shards: int = 8,
) -> DataFrame:
    """Hot-key detection over an unbounded stream with BOUNDED state:
    a sharded Space-Saving sketch via applyInPandasWithState.

    Why not running totals per key? `running_user_totals`-style state
    grows with key cardinality — at 100 TB/day of URLs that is the
    stream that OOMs. Space-Saving keeps at most `capacity` counters
    per shard: a new key evicts the current minimum and inherits its
    count (recorded as the entry's error bound). Keys are
    hash-sharded, so the per-shard sketches cover disjoint key sets
    and their union is the global sketch; total state is
    n_shards x capacity counters, independent of both stream length
    and key cardinality.

    Guarantees (classic Space-Saving): est >= true count, and
    est - err <= true count; any key with true count > N_shard/capacity
    is guaranteed present in its shard's sketch.

    Emits each shard's full sketch every trigger:
    (shard, key, est, err) in update mode.
    """

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            ks, cs, es = state.get
            sketch = {k: [c, e] for k, c, e in zip(ks, cs, es)}
        else:
            sketch = {}
        for pdf in pdfs:
            for k, inc in pdf["_k"].value_counts().items():
                inc = int(inc)
                if k in sketch:
                    sketch[k][0] += inc
                elif len(sketch) < capacity:
                    sketch[k] = [inc, 0]
                else:
                    evict = min(sketch, key=lambda x: sketch[x][0])
                    floor = sketch.pop(evict)[0]
                    sketch[k] = [floor + inc, floor]
        ks = list(sketch)
        state.update((ks, [sketch[k][0] for k in ks], [sketch[k][1] for k in ks]))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(ks),
                "key": ks,
                "est": [sketch[k][0] for k in ks],
                "err": [sketch[k][1] for k in ks],
            }
        )

    keyed = events.select(
        F.col(key_col).cast("string").alias("_k"),
        (F.abs(F.xxhash64(F.col(key_col).cast("string"))) % n_shards).alias("_shard"),
    )
    return keyed.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType="shard long, key string, est long, err long",
        stateStructType="ks array<string>, cs array<long>, es array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def state_v2_available() -> bool:
    """Whether Spark 4's transformWithStateInPandas (state API v2,
    SPARK-49187) can run here. The Python state server speaks protobuf
    to the JVM; a broken/absent google.protobuf makes the streaming
    runner die at init with STREAMING_PYTHON_RUNNER_INITIALIZATION_
    FAILURE ("cannot import name 'descriptor' from 'google.protobuf'"
    in this container), so callers must gate on this probe."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """`running_user_totals` on the modern transformWithStateInPandas
    API (Spark 4 state v2): same per-user running count + value sum,
    held in a typed ValueState instead of the single opaque
    applyInPandasWithState tuple. v2 is where streaming state is
    headed (typed value/list/map state, per-state TTL, timers,
    initial-state seeding, state-store repartitioning), so the engine
    exposes both; the parity test runs whichever the runtime supports.
    State size is O(distinct users), identical to the v1 operator.
    """
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("value_sum", DoubleType()),
        ]
    )

    class Totals(StatefulProcessor):
        def init(self, handle) -> None:
            self._st = handle.getValueState(
                "totals",
                StructType(
                    [StructField("n", LongType()), StructField("total", DoubleType())]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._st.get() if self._st.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._st.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def neardup_admission(
    delta_docs: DataFrame, history_bands: DataFrame
) -> DataFrame:
    """Streaming near-dup admission: the streaming face of q132.

    Each arriving delta document's MinHash band hashes are computed
    ROW-LOCALLY (``dedup._minhash_sig_rowlocal`` — a stateless
    projection, the only streaming-legal formulation: an aggregation
    here would force update mode and forbid the join below) and
    stream-static joined against the persisted HISTORY band index.
    Output is one row per admitted-with-suspicion document:
    (doc_id, n_hist_matches), in UPDATE mode (a streaming aggregation
    without watermark); the per-document group is complete after its
    own micro-batch, since a document's 4 band rows arrive together.

    At scale the history_bands side is the parquet band index the
    batch pipeline maintains (q132's doc); Spark re-reads it per
    micro-batch, so keep it compacted (layout.compact_parquet).
    """
    from harmony_spark.extensions.dedup import (
        _band_table_of,
        _minhash_sig_rowlocal,
    )

    delta_bands = _band_table_of(delta_docs, sig_fn=_minhash_sig_rowlocal)
    hist = history_bands.select(
        F.col("doc_id").alias("hist_id"), "b", "band"
    )
    return (
        delta_bands.join(hist, ["b", "band"])
        .groupBy("doc_id")
        # countDistinct is illegal in streaming aggs; collect_set is the
        # update-mode-safe equivalent (bounded: <= |history| per doc)
        .agg(F.size(F.collect_set("hist_id")).alias("n_hist_matches"))
    )


def windowed_distinct_users(
    events: DataFrame, size: str = "1 day", watermark: str = "1 hour"
) -> DataFrame:
    """Distinct users per (window, event_type) on a stream, via HLL
    sketch aggregation (extensions/sketches.py rationale).

    Exact streaming COUNT(DISTINCT) is illegal (and would be unbounded
    state: the distinct key set per open window); the ~4 KB HLL sketch
    is the bounded-state answer and merges across micro-batches like
    any algebraic aggregate. Watermark closes window state. Accuracy
    (+-1.6% rel. std. error at lgK=12) vs exact batch distinct is
    pinned in tests/test_streaming.py.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", size), "event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("approx_users")
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "approx_users",
        )
    )


def asof_enrich_sink(
    purchases: DataFrame,
    signups_static: DataFrame,
    sink_path: str,
    checkpoint: str,
    query_name: str = "asof_enrich",
):
    """Streaming point-in-time enrichment: each micro-batch of purchase
    events is AS-OF joined (operators.journeys.asof_join) against the
    STATIC signup dimension and appended to a parquet sink.

    Window functions are illegal on a streaming DataFrame, so the as-of
    runs inside foreachBatch — each micro-batch is a bounded batch
    DataFrame where the union-tag + carry-forward-window formulation
    applies unchanged. With a static right side this is exactly correct
    under any batch slicing: a purchase's set of candidate signups does
    not depend on which micro-batch it arrived in. (A signup STREAM
    would need applyInPandasWithState keyed on user, carrying the
    latest-signup struct — the q132-style delta/history split.)

    Exactly-once: foreachBatch replays a failed batch with the same
    batch_id; the parquet append is idempotized by writing to a
    batch-id subdirectory, the same discipline as
    operators/catalog.py's streaming sink.
    """
    from harmony_spark.operators.journeys import asof_join

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            signups_static,
            on=["user_id"],
            left_ts="ts",
            right_ts="signup_ts",
            right_payload=["signup_id", "signup_ts"],
            how="inner",
        )
        out.write.mode("overwrite").parquet(f"{sink_path}/batch_id={batch_id}")

    return (
        purchases.writeStream.foreachBatch(_enrich)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
