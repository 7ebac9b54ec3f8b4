"""Unit tests for the journey/packing/record-linkage operators beyond
the registry oracle gate: the generic asof_join semantics, next-fit
packing invariants, and entity-resolution transitivity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from harmony_spark.extensions.packing import PACK_CAPACITY, pack_next_fit
from harmony_spark.extensions.records import resolve_entities
from harmony_spark.operators.journeys import asof_join


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t("2024-01-01T10:00:00")),  # after r2 -> matches r2
            (2, 10, _t("2024-01-01T08:00:00")),  # exactly at r1 -> inclusive
            (3, 10, _t("2024-01-01T07:00:00")),  # before any right row
            (4, 20, _t("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _t("2024-01-01T08:00:00")),
            (200, 10, _t("2024-01-01T09:00:00")),
        ],
        "rid long, k long, rts timestamp",
    )
    return left, right


def test_asof_join_inner_latest_at_or_before(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_payload=["rid", "rts"], how="inner",
        ).collect()
    }
    # lid 1 at 10:00 sees the 09:00 row; lid 2 at 08:00 matches the
    # 08:00 row INCLUSIVELY; lid 3 precedes all right rows; key 20 has
    # no right rows at all.
    assert out == {1: 200, 2: 100}


def test_asof_join_left_keeps_unmatched_with_null_payload(spark):
    left, right = _asof_fixture(spark)
    rows = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], how="left",
    ).collect()
    assert len(rows) == 4  # every left row survives
    by_lid = {r["lid"]: r["rid"] for r in rows}
    assert by_lid[3] is None and by_lid[4] is None
    assert by_lid[1] == 200 and by_lid[2] == 100


def test_asof_join_carries_null_payload_fields_without_leapfrog(spark):
    """A legitimately-NULL field in the LATEST right row must surface as
    NULL, not be leap-frogged back to an older non-null value (the
    struct-payload contract)."""
    left = spark.createDataFrame(
        [(1, 10, _t("2024-01-01T10:00:00"))], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, _t("2024-01-01T08:00:00"), "old"),
            (10, _t("2024-01-01T09:00:00"), None),
        ],
        "k long, rts timestamp, tag string",
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["tag", "rts"], how="inner",
    ).collect()
    assert len(rows) == 1
    assert rows[0]["tag"] is None  # latest row's field, not the older "old"
    assert rows[0]["rts"] == _t("2024-01-01T09:00:00")


def test_pack_next_fit_invariants(spark):
    """Every bin respects capacity (given capped inputs), doc count is
    conserved, bins are contiguously numbered from 0, and the fold is
    the exact next-fit replay."""
    docs = spark.createDataFrame(
        [(0, i, tok) for i, tok in enumerate([60, 60, 60, 128, 1, 127, 2])],
        "bucket long, doc_id long, n_tokens long",
    )
    rows = sorted(
        pack_next_fit(docs, capacity=PACK_CAPACITY).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in rows] == list(range(len(rows)))
    assert sum(r["n_docs"] for r in rows) == 7
    assert all(r["fill"] <= PACK_CAPACITY for r in rows)
    # exact next-fit replay: [60,60]=120, [60]+128 doesn't fit -> [60],
    # [128], [1,127]=128, [2]
    assert [(r["n_docs"], r["fill"]) for r in rows] == [
        (2, 120), (1, 60), (1, 128), (2, 128), (1, 2),
    ]


def test_resolve_entities_transitive_closure(spark):
    """A~B and B~C (but A,C farther than the threshold) must still land
    in ONE entity: the clustering is transitive, not pairwise."""
    recs = spark.createDataFrame(
        [
            (1, "aaaaaa", "blk"),
            (2, "aaaabb", "blk"),  # 2 edits from rec 1
            (3, "aabbbb", "blk"),  # 2 edits from rec 2, 4 from rec 1
            (4, "zzzzzz", "blk"),  # matches nothing
            (5, "aaaaaa", "other"),  # identical key, different block
        ],
        "rid long, k string, blk string",
    )
    cc = {
        r["node"]: r["component"]
        for r in resolve_entities(
            recs, id_col="rid", key_col="k", block_col="blk", max_edits=3
        ).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1}  # one entity; 4 and 5 are singletons
