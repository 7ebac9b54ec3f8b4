"""Contract tests for the manifest-lite snapshot catalog
(operators/catalog.py): atomic visibility, time travel, optimistic
concurrency, stray-file isolation, and manifest-level stats pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from harmony_spark.io import table
from harmony_spark.operators import catalog


@pytest.fixture()
def orders(spark, sf_dir):
    return table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_append_overwrite_and_time_travel(spark, orders, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = catalog.commit_snapshot(spark, t, orders.where(F.col("o_orderkey") % 2 == 0))
    v1 = catalog.commit_snapshot(spark, t, orders.where(F.col("o_orderkey") % 2 == 1))
    assert (v0, v1) == (0, 1)
    n_all = orders.count()
    assert catalog.read_snapshot(spark, t).count() == n_all  # append = union
    assert catalog.read_snapshot(spark, t, version=0).count() == orders.where(
        F.col("o_orderkey") % 2 == 0
    ).count()  # time travel sees only v0's files

    v2 = catalog.commit_snapshot(spark, t, orders.limit(10), mode="overwrite")
    assert catalog.read_snapshot(spark, t).count() == 10
    assert catalog.read_snapshot(spark, t, version=v1).count() == n_all  # history intact
    hist = catalog.history(t)
    assert [h["version"] for h in hist] == [0, 1, v2]
    assert hist[-1]["n_rows"] == 10


def test_stray_files_invisible(spark, orders, tmp_path):
    """A file dropped into the data directory outside a commit (a
    crashed writer, a concurrent stage) must not appear in reads."""
    t = str(tmp_path / "tbl")
    catalog.commit_snapshot(spark, t, orders.limit(50))
    n = catalog.read_snapshot(spark, t).count()
    stray_dir = os.path.join(t, "data", "stray")
    orders.limit(7).write.parquet(stray_dir)
    assert catalog.read_snapshot(spark, t).count() == n  # unchanged


def test_commit_conflict_raises(spark, orders, tmp_path):
    """Optimistic concurrency: a commit based on a stale version must
    raise instead of clobbering the interleaved writer's snapshot."""
    t = str(tmp_path / "tbl")
    base = catalog.commit_snapshot(spark, t, orders.limit(5))
    catalog.commit_snapshot(spark, t, orders.limit(5))  # another writer
    with pytest.raises(catalog.CommitConflict):
        catalog.commit_snapshot(spark, t, orders.limit(5), base_version=base)
    # winner's state intact; the failed commit consumed no version
    # number, and a retry against the new head succeeds
    v = catalog.commit_snapshot(spark, t, orders.limit(5))
    assert v == 2 and catalog.history(t)[-1]["version"] == 2


def test_manifest_stats_pruning(spark, orders, tmp_path):
    """Per-file min/max in the manifest must prune files before any
    listing; pruned reads stay correct vs the full-scan answer."""
    t = str(tmp_path / "tbl")
    clustered = orders.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
        "o_orderkey"
    )
    catalog.commit_snapshot(spark, t, clustered, stat_cols=["o_orderkey"])
    all_files = [e["path"] for e in catalog._load_manifest(t, 0)["files"]]
    lo, hi = 100, 500
    kept = catalog.prune_files(t, "o_orderkey", lo, hi)
    assert 0 < len(kept) < len(all_files)  # real pruning happened
    want = orders.where(F.col("o_orderkey").between(lo, hi)).count()
    got = (
        spark.read.parquet(*kept)
        .where(F.col("o_orderkey").between(lo, hi))
        .count()
    )
    assert got == want


def test_streaming_catalog_sink_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch -> catalog: every micro-batch is one atomic
    version; a replayed batch id (crash-restart window) commits
    nothing — the exactly-once contract."""
    from harmony_spark.streaming import ops

    t, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")
    stream = ops.stream_events(spark, sf_dir).select("event_id", "user_id", "value")
    q = catalog.catalog_sink(stream, t, ck).trigger(availableNow=True).start()
    q.awaitTermination(120)

    n_batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert catalog.read_snapshot(spark, t).count() == n_batch
    versions_before = [h["version"] for h in catalog.history(t)]

    # simulate the replay window: re-deliver an already-committed batch
    replay = catalog.commit_stream_batch(
        spark, t, catalog.read_snapshot(spark, t).limit(5), batch_id=0
    )
    assert replay is None
    assert [h["version"] for h in catalog.history(t)] == versions_before
    assert catalog.read_snapshot(spark, t).count() == n_batch  # no duplicates


def test_incremental_diff_feeds_delta_processing(spark, orders, tmp_path):
    """Catalog-driven incremental processing: diff_files between two
    versions yields exactly the appended rows, so a downstream job
    re-reads nothing it already saw."""
    t = str(tmp_path / "tbl")
    first = orders.where(F.col("o_orderkey") % 3 == 0)
    second = orders.where(F.col("o_orderkey") % 3 != 0)
    v0 = catalog.commit_snapshot(spark, t, first)
    v1 = catalog.commit_snapshot(spark, t, second)
    inc = catalog.read_increment(spark, t, v_from=v0, v_to=v1)
    assert inc.count() == second.count()
    got = {r["o_orderkey"] for r in inc.select("o_orderkey").collect()}
    want = {r["o_orderkey"] for r in second.select("o_orderkey").collect()}
    assert got == want
    assert catalog.diff_files(t, v1, v1) == []


def test_vacuum_keeps_live_versions_readable(spark, orders, tmp_path):
    t = str(tmp_path / "tbl")
    for k in range(4):
        catalog.commit_snapshot(
            spark, t, orders.where(F.col("o_orderkey") % 4 == k)
        )
    n_all = catalog.read_snapshot(spark, t).count()
    n_manifests, n_files = catalog.vacuum(t, keep_last=2)
    assert n_manifests == 2
    # versions 2 and 3 survive; both still fully readable (append
    # manifests reference the older data files, which therefore stay)
    assert catalog.read_snapshot(spark, t).count() == n_all
    assert catalog.read_snapshot(spark, t, version=2).count() > 0
    with pytest.raises(FileNotFoundError):
        catalog._load_manifest(t, 0)
    # an overwrite then vacuum DOES free the replaced files
    catalog.commit_snapshot(spark, t, orders.limit(5), mode="overwrite")
    _, freed = catalog.vacuum(t, keep_last=1)
    assert freed > 0
    assert catalog.read_snapshot(spark, t).count() == 5


def test_merge_upsert_into_catalog_with_history(spark, orders, tmp_path):
    """The full lakehouse MERGE lifecycle from existing pieces: read the
    latest snapshot, resolve a CDC batch with cdc.merge_upsert, commit
    the result as an overwrite — readers flip atomically to the merged
    state and time travel still shows the pre-merge version."""
    from harmony_spark.operators.cdc import merge_upsert

    t = str(tmp_path / "tbl")
    base = orders.limit(100).select("o_orderkey", "o_totalprice")
    catalog.commit_snapshot(spark, t, base)

    target = catalog.read_snapshot(spark, t)
    changes = target.limit(10).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    ).unionByName(
        spark.createDataFrame([(999_999_001, 42.0)], "o_orderkey long, o_totalprice double")
    )
    merged = merge_upsert(
        target,
        changes,
        key="o_orderkey",
        update_set={"o_totalprice": F.col("s.o_totalprice")},
        insert_values={
            "o_orderkey": F.col("s.o_orderkey"),
            "o_totalprice": F.col("s.o_totalprice"),
        },
    )
    v = catalog.commit_snapshot(spark, t, merged, mode="overwrite")

    now = catalog.read_snapshot(spark, t)
    assert now.count() == 101  # 100 originals + 1 insert
    doubled = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in now.join(changes.limit(0).unionByName(changes), "o_orderkey", "semi").collect()
    }
    orig = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in catalog.read_snapshot(spark, t, version=0).collect()
    }
    for k, val in doubled.items():
        if k == 999_999_001:
            assert val == 42.0
        else:
            assert abs(val - 2 * orig[k]) < 1e-6
    # pre-merge state intact under time travel
    assert catalog.read_snapshot(spark, t, version=0).count() == 100
    assert v == 1


def test_concurrent_committers_all_land_exactly_once(spark, orders, tmp_path):
    """Contention stress: N threads race commits with conflict-retry;
    every commit must land exactly once (no lost updates, no version
    gaps) and the final table must hold all N slices."""
    import threading

    t = str(tmp_path / "tbl")
    slices = [orders.where(F.col("o_orderkey") % 6 == k) for k in range(6)]
    catalog.commit_snapshot(spark, t, slices[0])
    errors: list[Exception] = []

    def worker(df):
        for _ in range(30):  # retry loop under CommitConflict
            try:
                catalog.commit_snapshot(spark, t, df)
                return
            except catalog.CommitConflict:
                continue
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)
                return
        errors.append(RuntimeError("retries exhausted"))

    threads = [threading.Thread(target=worker, args=(s,)) for s in slices[1:]]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    hist = catalog.history(t)
    assert [h["version"] for h in hist] == list(range(6))  # no gaps, no dupes
    assert catalog.read_snapshot(spark, t).count() == orders.count()


def test_vacuum_rejects_keep_zero(spark, orders, tmp_path):
    t = str(tmp_path / "tbl")
    catalog.commit_snapshot(spark, t, orders.limit(5))
    with pytest.raises(ValueError):
        catalog.vacuum(t, keep_last=0)
    assert catalog.read_snapshot(spark, t).count() == 5  # untouched

def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    """GDPR-style targeted delete: files whose stats exclude the key
    range carry over BY REFERENCE (identical paths — their bytes were
    never read); only overlapping files rewrite; time travel still
    shows the pre-delete rows until vacuum erases them."""
    from harmony_spark.operators import catalog as C

    t = str(tmp_path / "tbl")
    lo = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    hi = spark.range(1000, 1100).selectExpr("id", "id * 2 AS v")
    C.commit_snapshot(spark, t, lo, mode="overwrite", stat_cols=["id"])
    v_before = C.commit_snapshot(spark, t, hi, mode="append", stat_cols=["id"])
    files_before = {e["path"] for e in C._load_manifest(t, v_before)["files"]}
    lo_files = {
        e["path"]
        for e in C._load_manifest(t, v_before)["files"]
        if e["max_id"] < 1000
    }

    v_after, report = C.delete_where(spark, t, "id", 1000, 1049, stat_cols=["id"])
    after = C._load_manifest(t, v_after)["files"]
    # untouched low-range files carried over with identical paths
    assert lo_files <= {e["path"] for e in after}
    # every low-range file is untouched; hi-range files whose stats
    # exclude [1000, 1049] are untouched too (stats prune better than
    # a whole-commit split)
    assert report["files_untouched"] >= len(lo_files)
    assert report["files_rewritten"] >= 1
    assert report["files_untouched"] + report["files_rewritten"] == len(
        files_before
    )
    assert report["rows_deleted"] == 50
    # current read: deleted keys gone, everything else intact
    cur = C.read_snapshot(spark, t)
    assert cur.where("id BETWEEN 1000 AND 1049").count() == 0
    assert cur.count() == 150
    # time travel still sees the deleted rows (audit trail)
    old = C.read_snapshot(spark, t, v_before)
    assert old.where("id BETWEEN 1000 AND 1049").count() == 50
    # vacuum completes the erasure: pre-delete manifests + orphans gone
    C.vacuum(t, keep_last=1)
    import glob
    import os

    live = {e["path"] for e in C._load_manifest(t, v_after)["files"]}
    on_disk = set(glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    assert on_disk == live
    assert files_before - live  # some pre-delete files were erased


def test_compact_files_preserves_contents_and_hides_from_increments(
    spark, tmp_path
):
    """OPTIMIZE-style compaction: contents identical, file count drops
    to the target, and read_increment across the compaction sees NO new
    data (data_change=False) — downstream incremental pipelines don't
    reprocess a storage reorganization."""
    from harmony_spark.operators import catalog as C

    t = str(tmp_path / "tbl")
    C.commit_snapshot(spark, t, spark.range(0, 50), mode="overwrite")
    C.commit_snapshot(spark, t, spark.range(50, 100), mode="append")
    v_pre = C.commit_snapshot(spark, t, spark.range(100, 150), mode="append")
    pre_rows = sorted(r["id"] for r in C.read_snapshot(spark, t).collect())

    v_c, report = C.compact_files(spark, t, target_files=1)
    assert report["files_after"] == 1
    assert report["files_before"] >= 3
    post_rows = sorted(r["id"] for r in C.read_snapshot(spark, t).collect())
    assert post_rows == pre_rows
    # incremental readers skip the compaction commit entirely
    assert C.diff_files(t, v_pre, v_c) == []
    assert C.read_increment(spark, t, v_pre, v_c).count() == 0
    # but a real append AFTER the compaction is still visible
    v_n = C.commit_snapshot(spark, t, spark.range(150, 160), mode="append")
    inc = C.read_increment(spark, t, v_pre, v_n)
    assert sorted(r["id"] for r in inc.collect()) == list(range(150, 160))
