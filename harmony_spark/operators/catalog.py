"""Manifest-lite snapshot catalog: transactional reads over plain parquet.

ROADMAP's "Delta/Iceberg sink" candidate, re-scoped to what those
formats fundamentally ARE minus the ecosystem: a TABLE is not a
directory of files, it is a MANIFEST — an explicit list of data files
plus stats — and a pointer naming the current manifest. Everything
transactional follows from that one inversion:

* **Atomic commits.** Writers stage data files, then publish a new
  manifest and swap the `_latest` pointer with an atomic rename.
  Readers never list the directory, so half-written files, stray
  files, and concurrent writers' staging output are INVISIBLE until
  their manifest publishes. (Rename is atomic on POSIX/HDFS; on an
  object store back the pointer with a conditional-put — the same
  single seam Delta's LogStore abstracts.)
* **Time travel.** Old manifests are never mutated; `read_snapshot(v)`
  reads the file list of version v. Retention = deleting manifests
  older than the horizon, then garbage-collecting unreferenced files.
* **Optimistic concurrency.** A commit records the version it was
  based on; if `_latest` moved meanwhile, the commit raises instead of
  silently clobbering the other writer (the reader-visible guarantee
  Delta calls mutual exclusion). Losers re-read and retry.
* **Stats pruning hook.** The manifest carries per-file row counts and
  min/max for requested columns (read from parquet footers, no data
  pages), so a planner can skip whole files before Spark ever lists
  them — the manifest-level pruning that directory listings cannot do.

Scale notes: manifests are O(#files), written by the driver once per
commit; data files never move on commit (append publishes the union of
the old list and the staged files). At 100 TB the listing-free read is
itself the win — object-store LIST is the slowest, least-consistent
operation in the stack.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """`_latest` moved since the commit's base version (another writer
    published first). Re-read the table and retry the commit."""


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, "_manifests", f"v{version:06d}.json")


def _latest_path(table: str) -> str:
    return os.path.join(table, "_manifests", "_latest")


def current_version(table: str) -> int | None:
    try:
        with open(_latest_path(table)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def _load_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _file_stats(files: list[str], stat_cols: list[str]) -> list[dict]:
    import pyarrow.parquet as pq

    out = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        entry: dict = {"path": f, "rows": meta.num_rows}
        names = [meta.schema.column(i).name for i in range(meta.num_columns)]
        for c in stat_cols:
            if c not in names:
                continue
            ci = names.index(c)
            lo = hi = None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                if st is None or st.min is None:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                entry[f"min_{c}"] = lo if not isinstance(lo, bytes) else None
                entry[f"max_{c}"] = hi if not isinstance(hi, bytes) else None
        out.append(entry)
    return out


def commit_snapshot(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    mode: str = "append",
    stat_cols: list[str] | None = None,
    base_version: int | None = None,
    meta: dict | None = None,
) -> int:
    """Stage df's parquet files, publish the next manifest, swap the
    pointer atomically. Returns the new version number.

    ``base_version`` (default: the version read at entry) implements
    optimistic concurrency: raises :class:`CommitConflict` if another
    writer published after it."""
    import glob

    if mode not in ("append", "overwrite"):
        raise ValueError(mode)
    os.makedirs(os.path.join(table, "_manifests"), exist_ok=True)
    before = current_version(table)
    if base_version is None:
        base_version = before

    staging = os.path.join(table, "data", uuid.uuid4().hex)
    df.write.parquet(staging)
    staged = sorted(glob.glob(os.path.join(staging, "*.parquet")))

    prev_files: list[dict] = []
    if mode == "append" and before is not None:
        prev_files = _load_manifest(table, before)["files"]

    return _publish(
        table,
        base_version=base_version,
        mode=mode,
        schema_json=df.schema.jsonValue(),
        file_entries=prev_files + _file_stats(staged, stat_cols or []),
        meta=meta,
    )


def read_snapshot(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Listing-free read of a table version (default: latest). Only
    files the manifest names are visible — stray or half-written files
    in the directory do not exist as far as readers are concerned."""
    v = current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {table}")
    m = _load_manifest(table, v)
    files = [e["path"] for e in m["files"]]
    if not files:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(m["schema"]))
    return spark.read.parquet(*files)


def prune_files(table: str, column: str, lo, hi, version: int | None = None) -> list[str]:
    """Manifest-level file pruning: the files of snapshot ``version``
    whose [min, max] for ``column`` intersects [lo, hi] — decided from
    the manifest alone, before Spark lists or opens anything. Files
    without stats are kept (pruning must never drop data)."""
    v = current_version(table) if version is None else version
    m = _load_manifest(table, v)
    keep = []
    for e in m["files"]:
        mn, mx = e.get(f"min_{column}"), e.get(f"max_{column}")
        if mn is None or mx is None or (mx >= lo and mn <= hi):
            keep.append(e["path"])
    return keep


def history(table: str) -> list[dict]:
    """Commit log: (version, mode, file/row counts, committed_at)."""
    import glob

    out = []
    for p in sorted(glob.glob(os.path.join(table, "_manifests", "v*.json"))):
        m = json.load(open(p))
        h = {
            "version": m["version"],
            "mode": m["mode"],
            "n_files": len(m["files"]),
            "n_rows": sum(e["rows"] for e in m["files"]),
            "committed_at": m["committed_at"],
        }
        if "meta" in m:
            h["meta"] = m["meta"]
        out.append(h)
    return out


def commit_stream_batch(spark, table: str, batch_df, batch_id: int) -> int | None:
    """Idempotent per-micro-batch commit: the manifest records the
    stream batch id, and a REPLAYED batch (restart after a crash
    between sink write and checkpoint advance - the window where plain
    file sinks duplicate) is recognized and skipped. Commit + skip
    check together give the exactly-once contract a transactional
    sink owes the stream. Returns the new version, or None if the
    batch had already committed."""
    if any(
        h.get("meta", {}).get("batch_id") == batch_id for h in history(table)
    ):
        return None
    return commit_snapshot(
        spark, table, batch_df, meta={"batch_id": batch_id}
    )


def catalog_sink(df, table: str, checkpoint: str, query_name: str = "catalog_sink"):
    """Structured Streaming -> snapshot-catalog sink via foreachBatch:
    each micro-batch publishes one atomic manifest version, so readers
    see batch boundaries, never partial files; replays dedupe on the
    recorded batch id. Start with .start() / .trigger(...) as usual."""

    def write_batch(batch_df, batch_id):
        commit_stream_batch(batch_df.sparkSession, table, batch_df, batch_id)

    return (
        df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
    )


def diff_files(table: str, v_from: int, v_to: int | None = None) -> list[str]:
    """Data files ADDED between two versions — the incremental-processing
    contract: a downstream job (dedup admission, index upsert, metric
    refresh) reads only these files instead of re-scanning the table,
    with the version pair recording exactly what it has seen. Overwrite
    commits show up as their full new file set (the old files left the
    manifest)."""
    v_to = current_version(table) if v_to is None else v_to
    old = {e["path"] for e in _load_manifest(table, v_from)["files"]}
    # files introduced by data_change=False commits (compaction) are
    # storage reorganizations, not new data: incremental readers skip
    # them (requires the manifests in (v_from, v_to] to be retained)
    skip: set[str] = set()
    for w in range(v_from + 1, v_to + 1):
        m = _load_manifest(table, w)
        if not m.get("data_change", True):
            prev = {e["path"] for e in _load_manifest(table, w - 1)["files"]}
            skip |= {e["path"] for e in m["files"]} - prev
    new = [e["path"] for e in _load_manifest(table, v_to)["files"]]
    return [p for p in new if p not in old and p not in skip]


def read_increment(spark: SparkSession, table: str, v_from: int, v_to: int | None = None) -> DataFrame:
    """DataFrame over just the files added in (v_from, v_to] — the
    catalog-driven delta that feeds incremental pipelines (q132's
    admission, IVF index upserts) without a full re-scan."""
    files = diff_files(table, v_from, v_to)
    if not files:
        m = _load_manifest(table, current_version(table) if v_to is None else v_to)
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(m["schema"]))
    return spark.read.parquet(*files)


def vacuum(table: str, keep_last: int = 2) -> tuple[int, int]:
    """Retention GC: drop all but the newest ``keep_last`` manifests and
    delete data files no surviving manifest references. Returns
    (manifests_removed, files_removed).

    Order matters for crash safety: manifests are removed FIRST, so a
    crash mid-vacuum can orphan files (re-vacuum collects them) but can
    never leave a live manifest pointing at deleted data - the same
    invariant a lakehouse VACUUM maintains with its retention window."""
    import glob

    if keep_last < 1:
        # keep_last=0 would delete every manifest while the just-read
        # file list still marks all data live - an unreadable table
        # with orphaned data. Dropping a table is an explicit rmtree,
        # not a vacuum parameter.
        raise ValueError("vacuum keeps at least one manifest (keep_last >= 1)")
    manifests = sorted(glob.glob(os.path.join(table, "_manifests", "v*.json")))
    doomed, kept = manifests[:-keep_last], manifests[-keep_last:]
    live: set[str] = set()
    for p in kept:
        live.update(e["path"] for e in json.load(open(p))["files"])
    for p in doomed:
        os.remove(p)
    removed = 0
    for f in glob.glob(os.path.join(table, "data", "*", "*.parquet")):
        if f not in live:
            os.remove(f)
            removed += 1
    return len(doomed), removed

def _publish(
    table: str,
    base_version: int | None,
    mode: str,
    schema_json: dict,
    file_entries: list[dict],
    meta: dict | None = None,
    data_change: bool = True,
) -> int:
    """Publish a manifest naming ``file_entries`` as the next version:
    the concurrency-critical tail shared by every committing operation
    (staleness fast-path, EXCLUSIVE hard-link publish, pointer swap).
    ``data_change=False`` marks commits that reorganize storage without
    changing table contents (compaction) so incremental readers can
    skip them — the same flag Delta attaches to OPTIMIZE's actions."""
    os.makedirs(os.path.join(table, "_manifests"), exist_ok=True)
    before = current_version(table)
    version = (before if before is not None else -1) + 1
    manifest = {
        "version": version,
        "base_version": base_version,
        "mode": mode,
        "committed_at": time.time(),
        "schema": schema_json,
        "files": file_entries,
        "data_change": data_change,
    }
    if meta:
        manifest["meta"] = meta
    tmp = _manifest_path(table, version) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    if current_version(table) != base_version:
        os.remove(tmp)
        raise CommitConflict(
            f"table moved to v{current_version(table)} (commit based on "
            f"{base_version}); re-read and retry"
        )
    try:
        os.link(tmp, _manifest_path(table, version))
    except FileExistsError:
        os.remove(tmp)
        raise CommitConflict(
            f"another writer published v{version} first; re-read and retry"
        ) from None
    os.remove(tmp)
    ptr_tmp = _latest_path(table) + f".tmp-{uuid.uuid4().hex}"
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.rename(ptr_tmp, _latest_path(table))
    return version


def delete_where(
    spark: SparkSession,
    table: str,
    column: str,
    lo,
    hi,
    stat_cols: list[str] | None = None,
) -> tuple[int, dict]:
    """Targeted delete (the right-to-be-forgotten / bad-batch retraction
    path): remove every row with ``column`` in [lo, hi] by REWRITING
    ONLY the files whose manifest [min, max] stats can contain such
    rows — untouched files carry over into the new manifest by
    reference, their bytes never read or moved. Returns (new_version,
    report). Old versions still see the deleted rows (time travel is
    the audit trail); ``vacuum`` is the actual erasure step that
    retires the pre-delete manifests and their orphaned files — run it
    to complete a compliance delete.

    Scale shape: the manifest stats decide file touch-set on the
    driver in O(#files); the rewrite reads and writes only the touched
    bytes. A delete keyed off a clustered/Z-ordered column
    (operators/layout.py) touches O(matching) files; a delete on an
    unclustered column degrades to a full rewrite — the layout choice
    IS the delete cost."""
    v = current_version(table)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {table}")
    m = _load_manifest(table, v)
    touched, untouched = [], []
    for e in m["files"]:
        mn, mx = e.get(f"min_{column}"), e.get(f"max_{column}")
        if mn is None or mx is None or (mx >= lo and mn <= hi):
            touched.append(e)
        else:
            untouched.append(e)
    new_entries = list(untouched)
    rows_deleted = 0
    if touched:
        import glob

        from pyspark.sql import functions as F

        df = spark.read.parquet(*[e["path"] for e in touched])
        kept = df.where(~F.col(column).between(lo, hi))
        rows_before = sum(e["rows"] for e in touched)
        staging = os.path.join(table, "data", uuid.uuid4().hex)
        kept.write.parquet(staging)
        staged = sorted(glob.glob(os.path.join(staging, "*.parquet")))
        entries = _file_stats(staged, stat_cols or [])
        rows_deleted = rows_before - sum(e["rows"] for e in entries)
        new_entries += entries
    version = _publish(
        table,
        base_version=v,
        mode="overwrite",
        schema_json=m["schema"],
        file_entries=new_entries,
        meta={"delete_where": {"column": column, "lo": lo, "hi": hi}},
    )
    return version, {
        "files_rewritten": len(touched),
        "files_untouched": len(untouched),
        "rows_deleted": rows_deleted,
    }


def compact_files(
    spark: SparkSession,
    table: str,
    target_files: int = 1,
    stat_cols: list[str] | None = None,
) -> tuple[int, dict]:
    """OPTIMIZE-style compaction: coalesce the current snapshot into
    ``target_files`` files as a NEW version. Contents are unchanged, so
    the manifest carries ``data_change=False`` and incremental readers
    (:func:`read_increment`) skip the rewritten files instead of
    reprocessing the whole table as 'new' — the flag that makes
    storage maintenance invisible to downstream pipelines. History is
    preserved: readers pinned to old versions keep their file lists
    until ``vacuum`` retires them."""
    import glob

    v = current_version(table)
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {table}")
    m = _load_manifest(table, v)
    n_before = len(m["files"])
    df = read_snapshot(spark, table, v).coalesce(max(1, target_files))
    staging = os.path.join(table, "data", uuid.uuid4().hex)
    df.write.parquet(staging)
    staged = sorted(glob.glob(os.path.join(staging, "*.parquet")))
    version = _publish(
        table,
        base_version=v,
        mode="overwrite",
        schema_json=m["schema"],
        file_entries=_file_stats(staged, stat_cols or []),
        meta={"compaction": True},
        data_change=False,
    )
    return version, {"files_before": n_before, "files_after": len(staged)}
