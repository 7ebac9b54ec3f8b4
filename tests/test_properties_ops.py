"""Property tests for the order-sensitive operators: randomized inputs
checked against brute-force Python references. These pin SEMANTICS the
oracle gate can't reach (the oracle runs on one fixed corpus; these
hunt edge cases — ties, duplicates, empty groups — that corpus may not
contain)."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from harmony_spark.extensions.packing import pack_next_fit
from harmony_spark.operators.journeys import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


def test_asof_join_matches_quadratic_reference_randomized(spark):
    """asof_join == brute-force latest-at-or-before on 20 random
    left/right table pairs, including exact-tie timestamps and keys
    with empty right sides."""
    rng = random.Random(42)
    for trial in range(20):
        n_left, n_right = rng.randint(1, 12), rng.randint(0, 10)
        left = [
            (i, rng.randint(0, 3), rng.randint(0, 30))
            for i in range(n_left)
        ]
        # unique (key, ts) per the operator contract
        right_keys = set()
        right = []
        for j in range(n_right):
            kt = (rng.randint(0, 3), rng.randint(0, 30))
            if kt in right_keys:
                continue
            right_keys.add(kt)
            right.append((100 + j, kt[0], kt[1]))
        ldf = spark.createDataFrame(
            [(i, k, _ts(t)) for i, k, t in left], "lid long, k long, lts timestamp"
        )
        rdf = spark.createDataFrame(
            [(j, k, _ts(t)) for j, k, t in right], "rid long, k long, rts timestamp"
        ) if right else spark.createDataFrame([], "rid long, k long, rts timestamp")
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
                right_payload=["rid"], how="inner",
            ).collect()
        }
        want = {}
        for i, k, t in left:
            cands = [(rt, rj) for rj, rk, rt in right if rk == k and rt <= t]
            if cands:
                want[i] = max(cands)[1]
        assert got == want, f"trial {trial}: {got} != {want}"


def test_pack_next_fit_randomized_invariants(spark):
    """Random workloads: token mass conserved, capacity respected for
    capped docs, and the 2-approximation bound n_bins <= 2*ceil(mass/C)
    + n_buckets (next-fit wastes < half a bin per closed bin)."""
    rng = random.Random(7)
    C = 100
    for trial in range(5):
        docs = [
            (rng.randint(0, 2), i, rng.randint(1, C))
            for i in range(rng.randint(1, 60))
        ]
        df = spark.createDataFrame(docs, "bucket long, doc_id long, n_tokens long")
        rows = pack_next_fit(df, capacity=C).collect()
        assert sum(r["fill"] for r in rows) == sum(t for _, _, t in docs)
        assert sum(r["n_docs"] for r in rows) == len(docs)
        assert all(r["fill"] <= C for r in rows)
        buckets = {b for b, _, _ in docs}
        total = sum(t for _, _, t in docs)
        assert len(rows) <= 2 * ((total + C - 1) // C) + len(buckets)
        # bins numbered contiguously from 0 within each bucket
        for b in buckets:
            bins = sorted(r["bin"] for r in rows if r["bucket"] == b)
            assert bins == list(range(len(bins)))


def test_pareto_frontier_matches_bruteforce_randomized(spark):
    """The sort-scan skyline == the quadratic dominance check on random
    point sets WITH duplicates and ties on both axes."""
    from harmony_spark.operators.relational import pareto_frontier_2d

    rng = random.Random(3)
    for trial in range(8):
        pts = [
            (i, float(rng.randint(0, 6)), rng.randint(0, 6))
            for i in range(rng.randint(1, 40))
        ]
        df = spark.createDataFrame(pts, "pid long, px double, py int")
        got = {
            r["pid"]
            for r in pareto_frontier_2d(df, x="px", y="py").collect()
        }
        want = {
            i
            for i, x, y in pts
            if not any(
                (x2 <= x and y2 <= y and (x2 < x or y2 < y))
                for _, x2, y2 in pts
            )
        }
        assert got == want, f"trial {trial}: {got ^ want}"
