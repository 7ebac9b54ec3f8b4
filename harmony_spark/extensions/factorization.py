"""Distributed ALS matrix factorization (alternating least squares),
DataFrame-native.

The classic Spark-scale recommender/completion workload (cf. DisTenC,
ICDE'18, for the tensor generalization). The (user, item, rating)
matrix here is (user_id, day, total event value) from the events log —
completion over it predicts a user's activity level on unseen days.

Scale design — each half-iteration is ONE keyed aggregate plus one
row-local batched solve, nothing else:

* The fixed side's factors (items during the user step; K x k doubles)
  BROADCAST as a plan literal via a join with a tiny DataFrame.
* The normal equations accumulate distributively: joining ratings with
  the broadcast factors gives per-rating r*v (k values) and the upper
  triangle of v v^T (k(k+1)/2 values); a groupBy(user) SUM shuffles
  one k^2-sized row per user — never the ratings, never a factor
  matrix gather.
* The per-user k x k ridge solve is row-local: an Arrow-batched
  mapInPandas calls one BATCHED numpy.linalg.solve over thousands of
  users at a time (vectorized LAPACK, no per-row Python).
* Driver state is only the fixed side's K x k factors (items/days are
  the SMALL dimension by construction — users can be billions, the
  catalog is not), mirroring the harmony core's O(K x B) state rule.

Determinism: init factors are a fixed arithmetic function of the item
id (no RNG), iteration order is fixed, and the only float
nondeterminism is partial-sum ordering (~1e-12 relative); the q137 row
rounds its RMSE census accordingly and the NumPy cross-oracle test
(tests/test_factorization.py) checks allclose, not hashes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.io import table_parallel
from harmony_spark.registry import register

RANK = 4
LAMB = 0.1
N_ITER = 3


def _init_factors(item_ids: list, rank: int = RANK) -> pd.DataFrame:
    """Deterministic, RNG-free init: spread values in [-0.5, 0.5) by a
    fixed arithmetic hash of (item, component)."""
    rows = []
    for it in item_ids:
        vec = [
            (((int(it) * 31 + j) * 2654435761) % 97) / 97.0 - 0.5
            for j in range(rank)
        ]
        rows.append((it, vec))
    return pd.DataFrame(rows, columns=["item", "vec"])


def _solve_side(
    ratings: DataFrame, fixed: pd.DataFrame, key: str, other: str, lamb: float
) -> DataFrame:
    """One ALS half-step: given the ``other`` side's factors (small,
    broadcast), return the ``key`` side's new factors as a DataFrame
    (key, vec ARRAY<DOUBLE>)."""
    spark = ratings.sparkSession
    k = RANK
    fdf = F.broadcast(
        spark.createDataFrame(
            [(int(r["item"]), [float(x) for x in r["vec"]]) for _, r in fixed.iterrows()],
            f"{other} long, fvec array<double>",
        )
    )
    j = ratings.join(fdf, other)
    # per-rating contributions: r*v_i and the upper triangle of v v^T
    rv = [(F.col("rating") * F.col("fvec")[i]).alias(f"rv_{i}") for i in range(k)]
    vv = [
        (F.col("fvec")[a] * F.col("fvec")[b]).alias(f"vv_{a}_{b}")
        for a in range(k)
        for b in range(a, k)
    ]
    agg = j.select(key, *rv, *vv).groupBy(key).agg(
        *[F.sum(f"rv_{i}").alias(f"rv_{i}") for i in range(k)],
        *[
            F.sum(f"vv_{a}_{b}").alias(f"vv_{a}_{b}")
            for a in range(k)
            for b in range(a, k)
        ],
    )

    rv_cols = [f"rv_{i}" for i in range(k)]
    vv_cols = [(a, b) for a in range(k) for b in range(a, k)]

    def solve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            A = np.zeros((n, k, k))
            for a, b in vv_cols:
                col = pdf[f"vv_{a}_{b}"].to_numpy()
                A[:, a, b] = col
                A[:, b, a] = col
            A += lamb * np.eye(k)[None, :, :]
            rhs = pdf[rv_cols].to_numpy()  # (n, k)
            sol = np.linalg.solve(A, rhs[:, :, None])[:, :, 0]
            yield pd.DataFrame({key: pdf[key], "vec": [list(map(float, row)) for row in sol]})

    return agg.mapInPandas(solve, f"{key} long, vec array<double>")


def als_fit(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    n_iter: int = N_ITER,
    lamb: float = LAMB,
) -> tuple[DataFrame, pd.DataFrame, list[float], int]:
    """Run ALS; returns (user_factors DF, item_factors pandas, rmse per
    iteration, n_ratings). Item factors stay driver-side (the small
    dimension); user factors never leave the cluster.  ``n_ratings``
    is a free by-product of the item-step census (Σ per-item counts),
    so callers need no separate count() job."""
    spark = ratings.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # hash-partition the ratings on USER once, before the checkpoint:
    # every iteration both aggregates on user (the U-step normal
    # equations) and joins on user (the item step) — establishing the
    # partitioning once removes the per-iteration ratings Exchange from
    # both (guide §2.4); localCheckpoint preserves it.
    r = (
        ratings.select(
            F.col(user_col).alias("user"),
            F.col(item_col).alias("item"),
            F.col("rating"),
        )
        .repartition(n_shuffle, "user")
        .localCheckpoint(eager=False)
    )
    items = sorted(x["item"] for x in r.select("item").distinct().collect())
    V = _init_factors(items)
    rmses: list[float] = []
    U = None
    for _ in range(n_iter):
        # U has exactly ONE distributed consumer per iteration (the item
        # step below; the RMSE pass is folded into it), so no checkpoint:
        # localCheckpoint — even eager=False — plans the U query through
        # Catalyst immediately (toRdd), and that duplicate planning pass
        # measured ~0.7-1.2 s/iteration, larger than the execution it
        # saved.  U's lineage is flat (r × broadcast V), so skipping the
        # checkpoint also cannot grow the plan across iterations.
        U = _solve_side(r, V, "user", "item", lamb)
        # item step: same shape with the sides swapped; U is NOT collected —
        # the join keys on user and the aggregate shuffles k^2 rows per item,
        # then the K item rows collect (K = catalog size, driver-bounded).
        # The same collected normal equations also price the iteration's
        # RMSE for free: per item, SSE = Σr² − 2·v·rv + vᵀA₀v (A₀ = the
        # ridge-free Gram), so the former per-iteration RMSE job — a full
        # ratings×U×V join pass — collapses into driver arithmetic over
        # the K already-collected rows (guide §1.2: remove whole passes
        # before tuning what's left).  Float effect: the expansion
        # cancels exactly the same partial sums the direct (r−u·v)² pass
        # sums, ~1e-12 relative — inside the cross-oracle's 1e-7 rtol.
        iv = (
            # shuffled-hash build of the per-user factors streams the
            # user-partitioned ratings sort-free (guide §3.1); U comes
            # out of a user-keyed aggregate, so neither side exchanges
            r.join(U.hint("shuffle_hash"), "user")
            .select(
                "item",
                "rating",
                *[(F.col("rating") * F.col("vec")[i]).alias(f"rv_{i}") for i in range(RANK)],
                *[
                    (F.col("vec")[a] * F.col("vec")[b]).alias(f"vv_{a}_{b}")
                    for a in range(RANK)
                    for b in range(a, RANK)
                ],
            )
            .groupBy("item")
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.col("rating") * F.col("rating")).alias("sr2"),
                *[F.sum(f"rv_{i}").alias(f"rv_{i}") for i in range(RANK)],
                *[
                    F.sum(f"vv_{a}_{b}").alias(f"vv_{a}_{b}")
                    for a in range(RANK)
                    for b in range(a, RANK)
                ],
            )
            .collect()
        )
        vrows, sse, n_total = [], 0.0, 0
        for row in iv:
            A0 = np.zeros((RANK, RANK))
            for a in range(RANK):
                for b in range(a, RANK):
                    A0[a, b] = A0[b, a] = row[f"vv_{a}_{b}"]
            rv = np.array([row[f"rv_{i}"] for i in range(RANK)])
            vec = np.linalg.solve(A0 + lamb * np.eye(RANK), rv)
            vrows.append((row["item"], [float(x) for x in vec]))
            sse += row["sr2"] - 2.0 * float(vec @ rv) + float(vec @ A0 @ vec)
            n_total += row["cnt"]
        V = pd.DataFrame(sorted(vrows), columns=["item", "vec"])
        rmses.append(float(np.sqrt(sse / n_total)))
    return U, V, rmses, n_total


@register(
    "q137_als_completion",
    oracle=None,  # iterative ALS is not SQL-expressible: rows-only +
    # NumPy cross-oracle (tests/test_factorization.py)
    doc="Distributed ALS matrix completion over the (user, day, total "
    "activity) matrix from the events log — the canonical Spark-scale "
    "recommender workload (DisTenC ICDE'18 generalizes it to "
    "tensors). Each half-iteration is one keyed aggregate of k^2-"
    "sized normal-equation rows plus an Arrow-batched vectorized "
    "numpy solve; item factors (the small catalog dimension) are the "
    "only driver state, user factors never leave the cluster — the "
    "same O(K x B) state discipline as the harmony core. Output: "
    "per-iteration RMSE (monotone non-increasing) plus matrix shape. "
    "Deterministic RNG-free init; NumPy cross-oracle pins every "
    "iteration to ~1e-9.",
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    ratings = (
        table_parallel(spark, sf, "events")
        .where(F.col("user_id") < 100)
        .groupBy(
            F.col("user_id").alias("user"),
            F.dayofmonth("ts").alias("item"),
        )
        .agg(F.round(F.sum("value"), 6).alias("rating"))
    )
    _, _, rmses, n = als_fit(ratings)
    rows = [(i + 1, round(r, 5), n) for i, r in enumerate(rmses)]
    return spark.createDataFrame(rows, "iteration long, rmse double, n_ratings long")
