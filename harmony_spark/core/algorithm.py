"""The harmony algorithm as a Spark driver loop.

Architecture (SURVEY.md §3.4, §7): the cells live in a persisted
DataFrame ``(cell_id, z_orig ARRAY<FLOAT>, code_<i> INT, zn)``; all
O(K·B)/O(B³) state (Y, O, E, W, λ, θ, σ) lives on the driver as NumPy
and is broadcast each pass. The soft assignment R is NEVER materialized
— it is a pure function of (zn, Y, O_prev, E_prev), described by
``self._r_state`` and recomputed inside whichever kernel needs it. The
N-sized data never moves to the driver and never shuffles.

Per harmony round (reference lifecycle R/utils.R:15-46):
  cold-start pass (src/harmony.cpp:214-228) — the ONE row-writing job:
    apply previous correction, normalize -> zn, fused O/E/objective
    partials (tag rows);
  x max_iter_cluster E-steps (:318-323) — aggregation-only jobs:
    * ``estep_mode="batch"``: one job, full-batch fixed point;
    * ``estep_mode="blocked"``: the reference's online update (C3),
      one job per block — driver subtracts the block's cached O/E
      contribution, the job reassigns it against the decremented
      penalty, the new contribution is added back;
  moe partials pass (:561-609)  -> per-combo Gram/RHS sums;
  driver: C5 support filter (:350-402), λ auto (M8), K ridge solves
  (M6), centroid update (M3)    -> W_all for the next round.
Convergence: window-3 cluster check + harmony check (:173-205), driver
floats. Both E-step modes are pinned to the NumPy cross-oracle
(numpy_ref.py) by allclose tests; ``run_harmony(mode="blocked-local")``
additionally offers the literal RNG-shuffled reference semantics for
single-node-sized data.
"""

from __future__ import annotations

import os
import sys

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmony_spark.core import kernels
from harmony_spark.core.kmeans import kmeans_centers
from harmony_spark.core.params import HarmonyOptions, ResolvedParams, resolve_params

from harmony_spark.core.scalars import SCALAR as F32, SPARK_SCALAR  # noqa: E402

_INIT_SAMPLE_CAP = 30_000  # driver-side kmeans sample (init only)


class HarmonySpark:
    def __init__(
        self,
        df: DataFrame,
        vars_use: list[str],
        *,
        features_col: str = "features",
        id_col: str | None = None,
        theta=None,
        sigma=0.1,
        lamb=None,
        nclust: int | None = None,
        max_iter: int = 10,
        early_stop: bool = True,
        options: HarmonyOptions | None = None,
        seed: int = 42,
        init_method: str = "sample",
        estep_mode: str = "batch",
        n_blocks: int | None = None,
        init_Y: "np.ndarray | None" = None,
    ):
        if init_method not in ("sample", "mllib"):
            raise ValueError("init_method must be 'sample' or 'mllib'")
        if estep_mode not in ("batch", "blocked"):
            raise ValueError("estep_mode must be 'batch' or 'blocked'")
        self.init_method = init_method
        self._init_Y_arg = init_Y
        self.estep_mode = estep_mode
        self._n_blocks_arg = n_blocks
        self._block_contrib: list[np.ndarray] = []
        self.spark: SparkSession = df.sparkSession
        self.vars_use = list(vars_use)
        self.code_cols = [f"code_{i}" for i in range(len(vars_use))]

        # ---- schema validation & cell ids (S2: R/ui.R:158-172) ----
        for v in vars_use:
            if v not in df.columns:
                raise ValueError(f"covariate {v!r} not in DataFrame columns")
        if id_col is None:
            df = df.withColumn("cell_id", F.monotonically_increasing_id())
            id_col = "cell_id"

        # ---- param resolution, ONE tiny aggregate (A1/A3) ----
        # the d-probe and every covariate's level census share one job:
        # explode the covariate values to (covariate_idx, level) keys and
        # aggregate once — one collect instead of 1 + len(vars_use)
        # (guide §1.2: remove whole passes; resolve_params sorts levels,
        # so collect order is immaterial)
        stats = (
            df.select(
                F.size(features_col).alias("__d"),
                F.posexplode(
                    F.array(
                        *[F.col(v).cast("string") for v in vars_use]
                    )
                ).alias("__ci", "__lvl"),
            )
            .groupBy("__ci", "__lvl")
            .agg(F.count("*").alias("count"), F.max("__d").alias("d"))
            .collect()
        )
        d = max(int(r["d"]) for r in stats)
        level_counts: dict[str, list[tuple[str, int]]] = {v: [] for v in vars_use}
        for r in stats:
            v = vars_use[r["__ci"]]
            if r["__lvl"] is None:
                raise ValueError(
                    f"covariate {v!r} contains NULLs; harmony requires a "
                    "level for every cell (drop or impute first)"
                )
            level_counts[v].append((r["__lvl"], r["count"]))
        N = sum(c for _, c in level_counts[vars_use[0]])
        self.p: ResolvedParams = resolve_params(
            N=N,
            d=d,
            vars_use=self.vars_use,
            level_counts=level_counts,
            theta=theta,
            sigma=sigma,
            lamb=lamb,
            nclust=nclust,
            max_iter=max_iter,
            early_stop=early_stop,
            options=options,
            seed=seed,
        )

        if init_Y is not None and np.shape(init_Y) != (self.p.d, self.p.K):
            raise ValueError(
                f"init_Y shape {np.shape(init_Y)} != (d={self.p.d}, K={self.p.K})"
            )

        # ---- encode covariate levels to codes (Phi never materialized) ----
        cells = df.select(
            F.col(id_col).cast("long").alias("cell_id"),
            F.col(features_col).cast(f"array<{SPARK_SCALAR}>").alias("z_orig"),
            *[
                self._level_code(v, i)
                for i, v in enumerate(self.vars_use)
            ],
        )
        # partition sizing: ~10k cells per task (matches the Arrow batch
        # size) so the ~12 jobs/round schedule O(N/10k) tasks, not
        # O(shuffle.partitions) tiny ones; at 1e9 cells this is 100k
        # tasks/pass on a cluster, at N=500 it is one.
        target_parts = max(1, min(self.spark.sparkContext.defaultParallelism, -(-N // 10_000)))
        # below the fuse cap, collapse to ONE partition: the whole kmeans
        # loop (and the MoE partials) then runs as a single Arrow pass
        # per round (_kmeans_loop fused path) instead of one job per
        # iteration — at 32k cells the per-job scheduler floor costs far
        # more than the lost map parallelism (a 64k-cell task is a few
        # tens of MB / tens of ms of vectorized numpy, guide §2.2: fewer,
        # larger partitions; §4: collapse tiny mapInPandas round-trips).
        # Above the cap the distributed per-iteration path is unchanged —
        # at 1e9 cells this branch never fires.
        if N <= int(os.environ.get("HARMONY_FUSE_CELLS", "65536")):
            target_parts = 1
        # single-partition inputs qualify for the fused kmeans-loop pass
        # (_kmeans_loop); repartition/mapInPandas/localCheckpoint all
        # preserve the partition count across rounds
        self._cells_nparts = target_parts
        cells = cells.repartition(target_parts)
        # LAZY persist: every first consumer (the init sample collect /
        # mllib fit / round-0 pass) is a single-scan stage, so its one
        # job fills the cache — the former eager count() was a whole
        # extra pass (guide §1.2)
        self.cells0 = cells.persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted: DataFrame | None = None

        # driver state
        self.Y: np.ndarray | None = None  # (d, K)
        self.O = np.zeros((self.p.K, self.p.B), dtype=F32)
        self.E = np.zeros((self.p.K, self.p.B), dtype=F32)
        self.W_all: np.ndarray | None = None  # (K, B, d)
        self.objective_kmeans: list[float] = []
        self.objective_harmony: list[float] = []
        self.kmeans_rounds: list[int] = []
        # description of the current soft assignment R (never
        # materialized; recomputed inside kernels from this state)
        self._r_state: dict | None = None
        # online blocked mode: #blocks = ceil(1/block_size) like the
        # reference (src/harmony.cpp:277) unless overridden
        self.n_blocks = (
            self._n_blocks_arg
            if self._n_blocks_arg is not None
            else int(np.ceil(1.0 / self.p.block_size))
        )

    # ------------------------------------------------------------ helpers

    def _level_code(self, var: str, i: int):
        levels = self.p.levels[i]
        mapping = F.create_map(
            *[x for lvl, code in zip(levels, range(len(levels))) for x in (F.lit(lvl), F.lit(code))]
        )
        return mapping[F.col(var).cast("string")].cast("int").alias(f"code_{i}")

    def _broadcast(self, **arrays):
        return self.spark.sparkContext.broadcast(arrays)

    def _swap_persist(self, df: DataFrame, materialize: bool = True) -> DataFrame:
        """Persist ``df`` and retire the previous round's cache.
        ``materialize=False`` skips the eager count when the CALLER's
        next action already touches every partition (a filtered collect
        still scans all partitions, so the cache fills as a by-product
        — one mapInPandas job instead of two per cold start)."""
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        if materialize:
            df.count()
        else:
            # Deferred fill is only safe from a cold start: if
            # _persisted held an ancestor of df, unpersisting it here
            # would force the caller's filling action to recompute the
            # whole lineage from scratch.
            assert self._persisted is None, (
                "_swap_persist(materialize=False) requires a cold start "
                "(_persisted must be None)"
            )
        if self._persisted is not None:
            self._persisted.unpersist()
        self._persisted = df
        return df

    @property
    def _pass_schema(self) -> str:
        codes = ", ".join(f"{c} int" for c in self.code_cols)
        return (
            f"cell_id long, z_orig array<{SPARK_SCALAR}>, {codes}, "
            f"zn array<{SPARK_SCALAR}>, "
            "blk int, o array<double>, rlogr array<double>, rdist double"
        )

    @property
    def _round_schema(self) -> str:
        # the fused-round pass additionally tags rows with the loop
        # iteration and carries the MoE combo partials
        return (
            self._pass_schema
            + ", it int, combo array<long>, s array<double>, m array<double>"
        )

    # ------------------------------------------------------------ passes
    #
    # R is never materialized: the current soft assignment is described
    # by `self._r_state` (Y, sigma [, theta, O, E]) and recomputed
    # inside whichever kernel needs it. Per round only the cold-start
    # pass writes N-sized rows (the zn column); the E-steps are
    # aggregation-only jobs over the cached zn.

    def _cold_start_pass(
        self, source: DataFrame, with_prev_correction: bool, push_objective: bool, round_idx: int
    ) -> DataFrame:
        state = {"Y": self.Y, "sigma": self.p.sigma}
        if with_prev_correction:
            state["W_all"] = self.W_all
            state["prev_state"] = self._r_state
        if self.estep_mode == "blocked":
            state["nb"] = self.n_blocks
            state["round_idx"] = round_idx
        bc = self._broadcast(**state)
        kernel = kernels.make_cold_start_kernel(
            bc, self.code_cols, self.p.offsets, self.p.K, self.p.B
        )
        # materialize=False: the partials collect below filters AFTER the
        # cache layer, so its one job both fills the round's cache and
        # returns the O/E partials — the separate count() job the old
        # path paid per cold start is gone.
        full = self._swap_persist(
            source.mapInPandas(kernel, schema=self._pass_schema),
            materialize=False,
        )
        parts = (
            full.where(F.col("cell_id").isNull())
            .select("blk", "o", "rlogr", "rdist")
            .collect()
        )
        self._finish_partials(parts, push_objective)
        # the fresh assignment is penalty-free against the current Y
        self._r_state = {"Y": self.Y, "sigma": self.p.sigma, "penalty": False}
        return full.where(F.col("cell_id").isNotNull()).drop("blk", "o", "rlogr", "rdist")

    def _estep_pass(self, cells: DataFrame, round_idx: int) -> None:
        """One E-step. ``batch`` mode: one aggregation-only job over all
        cells. ``blocked`` mode (C3, src/harmony.cpp:269-342): the round's
        cells are split into n_blocks by the arithmetic hash; each block
        is removed from O/E (driver subtraction of its cached
        contribution), reassigned against the decremented penalty, and
        added back — one aggregation job per block, sequential through
        the shared O/E exactly like the reference's online update.
        Block membership is fixed within a round (re-randomized across
        rounds via the round index); the reference reshuffles every
        E-step — same randomized-block-coordinate-descent family."""
        if self.estep_mode == "batch":
            state = {
                "Y": self.Y,
                "sigma": self.p.sigma,
                "theta": self.p.theta,
                "O": self.O,
                "E": self.E,
                "penalty": True,
            }
            bc = self._broadcast(**state)
            kernel = kernels.make_estep_kernel(
                bc, self.code_cols, self.p.offsets, self.p.K, self.p.B
            )
            parts = (
                cells.select("cell_id", "zn", *self.code_cols)
                .mapInPandas(kernel, schema=kernels.PARTIAL_SCHEMA)
                .collect()
            )
            self._r_state = state
            self._finish_partials(parts, push_objective=True)
            return

        # blocked online mode — the Gauss-Seidel state chain itself lives
        # in kernels.blocked_estep_chain (shared with the fused
        # single-partition kernel); this path supplies per-block partials
        # via one Spark job per block
        p = self.p
        nb = self.n_blocks
        block_expr = F.pmod(
            (F.col("cell_id") % kernels.BLOCK_P) * kernels.BLOCK_A
            + F.lit(round_idx * kernels.BLOCK_B),
            F.lit(nb),
        )

        def run_block(i: int, state_i: dict):
            bc = self._broadcast(**state_i)
            kernel = kernels.make_estep_kernel(
                bc, self.code_cols, p.offsets, p.K, p.B
            )
            parts = (
                cells.where(block_expr == i)
                .select("cell_id", "zn", *self.code_cols)
                .mapInPandas(kernel, schema=kernels.PARTIAL_SCHEMA)
                .collect()
            )
            C_new = np.zeros((p.K, p.B), dtype=np.float64)
            rl = np.zeros(p.K, dtype=np.float64)
            rd = 0.0
            for row in parts:
                C_new += np.asarray(row["o"]).reshape(p.K, p.B)
                rl += np.asarray(row["rlogr"])
                rd += row["rdist"]
            return C_new, rl, rd

        self._estep_apply_blocked(round_idx, run_block)

    def _estep_apply_blocked(self, round_idx: int, run_block) -> None:
        """Blocked-mode driver bookkeeping around one E-step: run the
        shared state chain with ``run_block`` as the partials source,
        commit O/E/_r_state and push the objective.  Used by both the
        per-block-job path and the fused-chain replay."""
        p = self.p
        nb = self.n_blocks
        O, states, rlogr_tot, rdist_tot = kernels.blocked_estep_chain(
            self.O,
            self._block_contrib,
            self.Y,
            p.sigma,
            p.theta,
            p.Pr_b,
            p.B_vec[0],
            nb,
            run_block,
        )
        self.O = O.astype(F32)
        mass = O[:, : p.B_vec[0]].sum(axis=1)
        self.E = (mass[:, None] * p.Pr_b[None, :].astype(np.float64)).astype(F32)
        self._r_state = {
            "blocked": True,
            "states": states,
            "iter": round_idx,
            "nb": nb,
        }
        self.objective_kmeans.append(
            kernels.km_objective(
                self.O, self.E, p.sigma, p.theta, rlogr_tot, rdist_tot, p.N
            )
        )

    def _kmeans_loop(self, cells: DataFrame, round_idx: int) -> int:
        """One harmony round's kmeans E-step loop (the DISTRIBUTED
        per-iteration path — single-partition inputs take _fused_round
        instead); returns the number of iterations run."""
        p = self.p
        iters = 0
        for it in range(p.max_iter_cluster):
            self._estep_pass(cells, round_idx)
            iters = it + 1
            if it > p.window_size and self._kmeans_converged():
                break
        return iters

    def _replay_chain(self, rows, round_idx: int) -> int:
        """Replay the driver bookkeeping from the fused pass's
        per-(iteration, block) chain partial rows — bit-identical to the
        per-iteration jobs' because the chain/objective code is shared
        (kernels._run_chain / blocked_estep_chain / km_objective).
        Returns the number of iterations the in-kernel loop ran."""
        p = self.p
        blocked = self.estep_mode == "blocked"
        by_it: dict[int, list] = {}
        for row in rows:
            by_it.setdefault(row["it"], []).append(row)
        iters = 0
        for it in sorted(by_it):
            parts = by_it[it]
            if blocked:
                by_blk = {row["blk"]: row for row in parts}

                def run_block(i: int, state_i: dict, _b=by_blk):
                    row = _b[i]
                    return (
                        np.asarray(row["o"]).reshape(p.K, p.B),
                        np.asarray(row["rlogr"]),
                        row["rdist"],
                    )

                self._estep_apply_blocked(round_idx, run_block)
            else:
                state = {
                    "Y": self.Y,
                    "sigma": p.sigma,
                    "theta": p.theta,
                    "O": self.O,
                    "E": self.E,
                    "penalty": True,
                }
                self._r_state = state
                self._finish_partials(
                    [
                        {
                            "blk": 0,
                            "o": row["o"],
                            "rlogr": row["rlogr"],
                            "rdist": row["rdist"],
                        }
                        for row in parts
                    ],
                    push_objective=True,
                )
            iters = it + 1
        return iters

    def _fused_round(
        self, source: DataFrame, round_idx: int
    ) -> tuple[DataFrame, int, dict]:
        """One WHOLE harmony round as ONE Arrow pass (single-partition
        inputs only, kernels.make_round_kernel): cold-start correction +
        re-assignment, the full kmeans E-step loop, and the MoE combo
        partials — what the distributed path runs as 3+ jobs (guide §4).
        Returns (cells_with_zn, kmeans_iters, moe_combos); driver
        bookkeeping (O/E/objectives/_r_state) is replayed from the
        tagged partial rows and stays bit-identical to the distributed
        path's."""
        p = self.p
        blocked = self.estep_mode == "blocked"
        nb = self.n_blocks if blocked else 1
        state = dict(
            Y=self.Y,
            sigma=p.sigma,
            theta=p.theta,
            mode=self.estep_mode,
            nb=nb,
            round_idx=round_idx,
            max_iter=p.max_iter_cluster,
            window=p.window_size,
            eps=p.epsilon_cluster,
            N=p.N,
            Pr_b=p.Pr_b,
            B0=p.B_vec[0],
            moe=True,
        )
        with_prev = round_idx > 0
        if with_prev:
            state["W_all"] = self.W_all
            state["prev_state"] = self._r_state
        bc = self.spark.sparkContext.broadcast(state)
        kernel = kernels.make_round_kernel(
            bc, self.code_cols, p.offsets, p.K, p.B
        )
        cols = ["cell_id", "z_orig", *self.code_cols]
        if with_prev:
            cols.append("zn")
        full = self._swap_persist(
            source.select(*cols).mapInPandas(kernel, schema=self._round_schema),
            materialize=False,
        )
        parts = (
            full.where(F.col("cell_id").isNull())
            .select("it", "blk", "o", "rlogr", "rdist", "combo", "s", "m")
            .collect()
        )
        # cold-start partials -> O/E/_block_contrib (+ the init objective
        # on round 0, matching the reference's init pass)
        self._finish_partials(
            [r for r in parts if r["it"] == kernels.ROUND_IT_COLD],
            push_objective=(round_idx == 0),
        )
        self._r_state = {"Y": self.Y, "sigma": p.sigma, "penalty": False}
        iters = self._replay_chain(
            [r for r in parts if r["it"] >= 0], round_idx
        )
        combos: dict[tuple, tuple] = {}
        for row in parts:
            if row["it"] != kernels.ROUND_IT_MOE:
                continue
            c = tuple(row["combo"])
            S = np.asarray(row["s"])
            M = np.asarray(row["m"]).reshape(p.K, p.d)
            if c in combos:
                combos[c] = (combos[c][0] + S, combos[c][1] + M)
            else:
                combos[c] = (S, M)
        cells = full.where(F.col("cell_id").isNotNull()).select(
            "cell_id", "z_orig", *self.code_cols, "zn"
        )
        return cells, iters, combos

    def _finish_partials(self, parts, push_objective: bool) -> None:
        """Final reduction of the per-partition partials: O, E (A4/A5)
        and the objective (A6; cross term contracts to sigma_k theta_b
        O_kb log((O+E+1)/(2E+1))). push_objective=False for the
        round>=2 cold start, which in the reference re-estimates O/E
        without recording an objective (src/harmony.cpp:214-228)."""
        p = self.p
        nb = self.n_blocks if self.estep_mode == "blocked" else 1
        per_block = [np.zeros((p.K, p.B), dtype=np.float64) for _ in range(nb)]
        rlogr = np.zeros(p.K, dtype=np.float64)
        rdist = 0.0
        for row in parts:
            per_block[row["blk"] or 0] += np.asarray(row["o"]).reshape(p.K, p.B)
            rlogr += np.asarray(row["rlogr"])
            rdist += row["rdist"]
        O = np.sum(per_block, axis=0)
        self._block_contrib = per_block
        self.O = O.astype(F32)
        mass = O[:, : p.B_vec[0]].sum(axis=1)  # sum_i R_ki via covariate 0
        self.E = (mass[:, None] * p.Pr_b[None, :].astype(np.float64)).astype(F32)
        if not push_objective:
            return
        norm_const = 2000.0 / p.N
        entropy = float((rlogr * p.sigma).sum())
        log_term = np.log((self.O + self.E + 1.0) / (2.0 * self.E + 1.0))
        cross = float((p.sigma[:, None] * p.theta[None, :] * log_term * self.O).sum())
        self.objective_kmeans.append((rdist + entropy + cross) * norm_const)

    def _moe_partials(self, cells: DataFrame) -> dict[tuple, tuple[np.ndarray, np.ndarray]]:
        p = self.p
        bc = self._broadcast(**self._r_state)
        kernel = kernels.make_moe_partials_kernel(bc, self.code_cols, p.offsets, p.K, p.d)
        rows = cells.select("cell_id", "z_orig", "zn", *self.code_cols).mapInPandas(
            kernel, schema="combo array<long>, s array<double>, m array<double>"
        ).collect()
        acc: dict[tuple, list] = {}
        for row in rows:
            combo = tuple(row["combo"])
            S = np.asarray(row["s"])
            M = np.asarray(row["m"]).reshape(p.K, p.d)
            if combo in acc:
                acc[combo][0] += S
                acc[combo][1] += M
            else:
                acc[combo] = [S, M]
        return {c: (v[0], v[1]) for c, v in acc.items()}

    # ------------------------------------------------------------ driver math

    def _init_Y(self) -> None:
        """Centroid init (M4/M5), two strategies:

        * ``sample`` (default): deterministic hash sample to the driver,
          seeded kmeans++/Lloyd in NumPy (shared with the cross-oracle).
          The reference clusters all N cells single-node
          (src/utils.cpp:52-64); subsequent rounds refine Y through the
          ridge intercept (M3) anyway.
        * ``mllib``: distributed ml.clustering.KMeans (k-means||) over
          the L2-normalized cells — the fully-distributed path for when
          even a 30k sample under-represents the data.

        A caller-provided ``init_Y`` (warm start — typically
        ``prev_model.get_Y()`` when new cells arrive and the corpus is
        refit incrementally; the reference is refit-from-scratch-only)
        overrides both: no sample collect, no kmeans, the loop starts
        from the previous optimum and converges in fewer rounds.
        """
        p = self.p
        if self._init_Y_arg is not None:
            Y = np.asarray(self._init_Y_arg, dtype=F32)
            if Y.shape != (p.d, p.K):
                raise ValueError(
                    f"init_Y shape {Y.shape} != (d={p.d}, K={p.K})"
                )
            self.Y = Y / np.maximum(np.linalg.norm(Y, axis=0, keepdims=True), 1e-12)
            return
        if self.init_method == "mllib":
            from pyspark.ml.clustering import KMeans
            from pyspark.ml.functions import array_to_vector
            from pyspark.sql.functions import aggregate as agg_hof, lit, sqrt, transform as tf_hof

            norm = sqrt(
                agg_hof(
                    "z_orig",
                    lit(0.0).cast("double"),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            )
            vecs = self.cells0.select(
                array_to_vector(
                    tf_hof("z_orig", lambda x: x.cast("double") / norm)
                ).alias("fv")
            )
            km = KMeans(k=p.K, maxIter=10, initMode="k-means||", seed=p.seed, featuresCol="fv")
            model = km.fit(vecs)
            Y = np.stack([np.asarray(c) for c in model.clusterCenters()]).astype(F32)
            Yn = Y / np.maximum(np.linalg.norm(Y, axis=1, keepdims=True), 1e-12)
            self.Y = Yn.T.copy()
            return
        if p.N <= _INIT_SAMPLE_CAP:
            sample = self.cells0.select("cell_id", "z_orig").orderBy("cell_id")
        else:
            sample = (
                self.cells0.select("cell_id", "z_orig")
                .orderBy(F.xxhash64("cell_id"))
                .limit(_INIT_SAMPLE_CAP)
                .orderBy("cell_id")
            )
        Z = np.stack([r["z_orig"] for r in sample.collect()]).astype(F32)
        Zn = Z / np.maximum(np.linalg.norm(Z, axis=1, keepdims=True), 1e-12)
        self.Y = kmeans_centers(Zn, p.K, p.seed)  # (d, K), L2-normalized cols

    @staticmethod
    def _arrowhead_solve(G: np.ndarray, rhs: np.ndarray) -> np.ndarray:
        """M7: closed-form solve of the single-covariate MoE system
        (/root/reference/src/harmony.cpp:572-586 computes this inverse).

        With one covariate every design row is [1, e_b], so the ridge
        Gram is an ARROWHEAD matrix [[a, c^T], [c, D]] (D diagonal:
        per-level soft counts + lambda; c: the same counts; a: total
        mass). Schur complement on the (0,0) entry gives

            inv(G) = v v^T / s + diag([0, 1/D])   with
            v = [1, -c/D],  s = a - sum(c^2 / D)

        so the solve is O(B*d) instead of O(B^3): irrelevant at B=5,
        decisive when a run has thousands of batch levels (sample-level
        covariates), where the K dense inversions would start to rival
        the E-step. Raises LinAlgError on a degenerate pivot so the
        caller's no-support skip path handles it like the dense solver.
        """
        a, c, d = G[0, 0], G[0, 1:], G.diagonal()[1:].copy()
        if np.any(d <= 0):
            raise np.linalg.LinAlgError("non-positive arrowhead diagonal")
        dinv = 1.0 / d
        s = a - np.sum(c * c * dinv)
        if not np.isfinite(s) or s <= 0:
            raise np.linalg.LinAlgError("non-positive Schur complement")
        v = np.concatenate([[1.0], -c * dinv])
        W = np.outer(v, v @ rhs) / s
        W[1:] += dinv[:, None] * rhs[1:]
        return W

    def _solve_moe(self, combos: dict[tuple, tuple[np.ndarray, np.ndarray]]) -> None:
        """C5 filter + M8 auto-lambda + M6 ridge solves + M3 centroid
        update, all driver-side from the tiny combo partials."""
        p = self.p
        C = len(p.B_vec)
        combo_keys = list(combos.keys())
        S_mat = np.stack([combos[c][0] for c in combo_keys])  # (T, K)
        M_mat = np.stack([combos[c][1] for c in combo_keys])  # (T, K, d)
        # global level indices per combo
        combo_levels = np.stack(
            [[combo[c] + p.offsets[c] for c in range(C)] for combo in combo_keys]
        )  # (T, C)

        W_all = np.zeros((p.K, p.B, p.d), dtype=np.float64)
        Y_new = self.Y.copy()

        for k in range(p.K):
            avg_R = self.O[k].astype(np.float64) / p.N_b
            qualifies = avg_R > p.batch_prop_cutoff
            keep = np.zeros(p.B, dtype=bool)
            active_covariates = 0
            for c in range(C):
                lo, hi = p.offsets[c], p.offsets[c] + p.B_vec[c]
                nq = int(qualifies[lo:hi].sum())
                if nq > 1:
                    keep[lo:hi] = qualifies[lo:hi]
                    active_covariates += 1
            if keep.sum() < p.B and active_covariates == 0:
                continue  # cluster skipped (src/harmony.cpp:452-455)

            kept_levels = np.flatnonzero(keep)
            pos = {b: j + 1 for j, b in enumerate(kept_levels)}
            m = len(kept_levels)
            # combo -> design vector u (intercept + kept levels)
            T = len(combo_keys)
            U = np.zeros((T, m + 1))
            combo_kept = np.zeros(T, dtype=bool)
            for t in range(T):
                lv = combo_levels[t]
                has = [b for b in lv if keep[b]]
                if has:
                    combo_kept[t] = True
                    U[t, 0] = 1.0
                    for b in has:
                        U[t, pos[b]] = 1.0
            if not combo_kept.any():
                continue
            Uk = U[combo_kept]
            Sk = S_mat[combo_kept, k]  # (T',)
            Mk = M_mat[combo_kept, k, :]  # (T', d)
            Gram = (Uk * Sk[:, None]).T @ Uk  # (m+1, m+1)
            if p.lamb is None:
                lam = np.concatenate(
                    [[0.0], p.alpha * self.E[k].astype(np.float64)[kept_levels]]
                )
            else:
                lam = np.concatenate([[0.0], p.lamb[1:][kept_levels]])
            Gram[np.diag_indices(m + 1)] += lam
            rhs = Uk.T @ Mk  # (m+1, d)
            try:
                if C == 1:
                    # single covariate -> arrowhead Gram, closed form (M7)
                    W = self._arrowhead_solve(Gram, rhs)
                else:
                    # multi-covariate designs have cross-covariate Gram
                    # terms (not arrowhead) — dense solve, like the
                    # reference's B_vec.size()>1 arma::inv branch
                    W = np.linalg.solve(Gram, rhs)
            except np.linalg.LinAlgError:
                # vanishing cluster mass (intercept row has lambda=0);
                # skip the cluster like the C5 no-support path
                continue
            Y_new[:, k] = W[0].astype(F32)
            for b in kept_levels:
                W_all[k, b] = W[pos[b]]

        norms = np.maximum(np.linalg.norm(Y_new, axis=0, keepdims=True), 1e-12)
        self.Y = (Y_new / norms).astype(F32)
        self.W_all = W_all.astype(F32)

    # ------------------------------------------------------------ lifecycle

    def _kmeans_converged(self) -> bool:
        w = self.p.window_size
        obj = self.objective_kmeans
        obj_old = sum(obj[-2 - i] for i in range(w))
        obj_new = sum(obj[-1 - i] for i in range(w))
        return abs(obj_old - obj_new) / abs(obj_old) < self.p.epsilon_cluster

    def _harmony_converged(self) -> bool:
        o = self.objective_harmony
        return (o[-2] - o[-1]) / abs(o[-2]) < self.p.epsilon_harmony

    def run(self, verbose: bool = False, progress=None) -> DataFrame:
        """``progress``, if given, is called after every harmony round as
        ``progress(round_idx, objective) -> bool | None``; returning
        ``False`` aborts the loop cooperatively (the model keeps the
        rounds completed so far and still emits a corrected embedding) —
        the C6 progress/abort surface (the reference's progress bar +
        interrupt, R/ui.R:268-272, re-expressed as a callback since a
        driver script has no TTY)."""
        if getattr(self, "cells0", None) is None:
            raise RuntimeError(
                "this model has no training cells (loaded via load_model?) — "
                "it supports transform()/assign()/get_Y(), not re-run()"
            )
        p = self.p
        self._init_Y()
        fused = self._cells_nparts == 1
        if not fused:
            cells = self._cold_start_pass(
                self.cells0, with_prev_correction=False, push_objective=True, round_idx=0
            )
            self.objective_harmony.append(self.objective_kmeans[-1])
            # cells0 (its own z_orig copy) is only a source for init + the
            # round-0 pass; dropping it now halves the steady-state cache —
            # at 1e9 cells x 64 dims that is ~256 GB of cluster memory back.
            # (_cold_start_pass materialized `cells` eagerly, so nothing
            # recomputes through this lineage.)
            self.cells0.unpersist()

        for round_idx in range(p.max_iter):
            if fused:
                # single-partition inputs: cold start + kmeans loop + MoE
                # partials are ONE Arrow pass per round (_fused_round)
                cells, iters, combos = self._fused_round(
                    self.cells0 if round_idx == 0 else cells, round_idx
                )
                if round_idx == 0:
                    # the init objective (reference's init pass) sits
                    # between the cold replay and the chain replay —
                    # index it out of the kmeans trace like the
                    # distributed flow does
                    self.objective_harmony.insert(
                        0, self.objective_kmeans[-iters - 1]
                    )
                    self.cells0.unpersist()
            else:
                if round_idx > 0:
                    # cold start: re-estimate R from corrected embedding
                    cells = self._cold_start_pass(
                        cells, with_prev_correction=True, push_objective=False,
                        round_idx=round_idx,
                    )
                iters = self._kmeans_loop(cells, round_idx)
                combos = None
            self.kmeans_rounds.append(iters)
            self.objective_harmony.append(self.objective_kmeans[-1])
            if verbose:
                # RunHarmony(verbose=TRUE) progress line (R/ui.R:268-272)
                print(
                    f"Harmony {round_idx + 1}/{p.max_iter}: "
                    f"objective {self.objective_kmeans[-1]:.4f}",
                    file=sys.stderr,
                )

            if combos is None:  # distributed path: separate MoE pass
                combos = self._moe_partials(cells)
            self._solve_moe(combos)

            if progress is not None and progress(round_idx, self.objective_kmeans[-1]) is False:
                break
            if self._harmony_converged():
                break
            # truncate lineage between rounds. localCheckpoint already
            # stores the partitions (MEMORY_AND_DISK) — persisting on top
            # would hold a SECOND full copy, so track the checkpoint
            # directly; the checkpoint blocks are released by the
            # ContextCleaner once the next round's pass materializes and
            # drops the reference.
            ck = cells.localCheckpoint(eager=True)
            if self._persisted is not None:
                self._persisted.unpersist()
                self._persisted = None
            cells = ck

        # final correction materialization (M2)
        self._cells_final = cells
        bc = self._broadcast(W_all=self.W_all, r_state=self._r_state)
        kernel = kernels.make_correct_kernel(bc, self.code_cols, p.offsets)
        codes = ", ".join(f"{c} int" for c in self.code_cols)
        result = cells.mapInPandas(
            kernel, schema=f"cell_id long, {codes}, z_corr array<{SPARK_SCALAR}>"
        )
        return result

    def transform(self, df: DataFrame, features_col: str = "features", id_col: str = "cell_id") -> DataFrame:
        """Fold NEW cells into the fitted model (extension — the
        reference is strictly refit-only): assign each incoming cell
        against the frozen centroids/penalty state and subtract its
        batch effect with the frozen W. Stateless given the broadcast
        model, so the same code path serves batch DataFrames and
        Structured Streaming sources (micro-batch inference).

        Assignment uses zn = normalize(z) (a new cell has no previous
        correction to fold in); covariate levels unseen at fit time are
        rejected inside the kernel via the level maps.
        """
        if self.W_all is None:
            raise RuntimeError("run() must complete before transform()")
        p = self.p
        cells = df.select(
            F.col(id_col).cast("long").alias("cell_id"),
            F.col(features_col).cast(f"array<{SPARK_SCALAR}>").alias("z_orig"),
            *[self._level_code(v, i) for i, v in enumerate(self.vars_use)],
        )
        # flatten a blocked r_state to its last block state for new
        # cells (they belong to no training block); batch state passes
        # through unchanged
        rs = self._r_state
        if rs.get("blocked"):
            rs = rs["states"][-1]
        bc = self._broadcast(W_all=self.W_all, r_state=rs)
        kernel = kernels.make_transform_kernel(bc, self.code_cols, p.offsets)
        codes = ", ".join(f"{c} int" for c in self.code_cols)
        return cells.mapInPandas(
            kernel, schema=f"cell_id long, {codes}, z_corr array<{SPARK_SCALAR}>"
        )

    def assign(self, df: DataFrame, features_col: str = "features", id_col: str = "cell_id") -> DataFrame:
        """Soft-assign NEW cells against the frozen model without
        correcting them: (cell_id, codes, r ARRAY<FLOAT>). The input to
        monitoring statistics (streaming/drift.py) — works on batch and
        streaming DataFrames alike."""
        if self.W_all is None:
            raise RuntimeError("run() must complete before assign()")
        cells = df.select(
            F.col(id_col).cast("long").alias("cell_id"),
            F.col(features_col).cast(f"array<{SPARK_SCALAR}>").alias("z_orig"),
            *[self._level_code(v, i) for i, v in enumerate(self.vars_use)],
        )
        rs = self._r_state
        if rs.get("blocked"):
            rs = rs["states"][-1]
        bc = self._broadcast(W_all=self.W_all, r_state=rs)
        kernel = kernels.make_infer_assignment_kernel(bc, self.code_cols, self.p.offsets)
        codes = ", ".join(f"{c} int" for c in self.code_cols)
        return cells.mapInPandas(
            kernel, schema=f"cell_id long, {codes}, r array<{SPARK_SCALAR}>"
        )

    # ------------------------------------------------------- model getters
    # Parity with the reference's Rcpp getters (getR/getY/getO/getE,
    # /root/reference/src/harmony.cpp:672-709). Y/O/E are tiny driver
    # NumPy; R is distributed and returned as a DataFrame.

    def get_Y(self) -> np.ndarray:
        """(d, K) centroids, L2-normalized columns."""
        return self.Y.copy()

    def get_O(self) -> np.ndarray:
        """(K, B) observed cluster-by-batch co-occurrence."""
        return self.O.copy()

    def get_E(self) -> np.ndarray:
        """(K, B) expected counts under batch independence."""
        return self.E.copy()

    def get_R(self) -> DataFrame:
        """(cell_id, r ARRAY<FLOAT>) — the final soft assignment,
        recomputed from the assignment state (R is never stored)."""
        if getattr(self, "_cells_final", None) is None:
            raise RuntimeError("run() must complete before get_R()")
        bc = self._broadcast(**self._r_state)
        kernel = kernels.make_assignment_kernel(bc, self.code_cols, self.p.offsets)
        return self._cells_final.select("cell_id", "zn", *self.code_cols).mapInPandas(
            kernel, schema=f"cell_id long, r array<{SPARK_SCALAR}>"
        )


    def cleanup(self) -> None:
        """Release cached intermediates (call after materializing the
        result — e.g. result.persist(); result.count(); model.cleanup())."""
        if self._persisted is not None:
            self._persisted.unpersist()
            self._persisted = None
        if getattr(self, "cells0", None) is not None:
            self.cells0.unpersist()

    # -------------------------------------------------------------- sinks

    def convergence_trace(self) -> "DataFrame":
        """Objective traces as a DataFrame — the HarmonyConvergencePlot
        data (C7: /root/reference/R/utils.R:50-81). One row per E-step
        objective, tagged with its harmony round."""
        rows, i = [], 0
        rounds = [1] + list(self.kmeans_rounds)  # entry 0 = init objective
        for round_idx, n in enumerate(rounds):
            for j in range(n):
                if i < len(self.objective_kmeans):
                    rows.append((round_idx, j, float(self.objective_kmeans[i])))
                    i += 1
        return self.spark.createDataFrame(
            rows, "harmony_round int, kmeans_step int, objective double"
        )


def export_convergence(trace: DataFrame, path: str) -> tuple[str, str]:
    """HarmonyConvergencePlot equivalent (C7:
    /root/reference/R/utils.R:50-81) without a plotting stack: render
    the :meth:`HarmonySpark.convergence_trace` frame to ``<path>.csv``
    (the exact rows) and ``<path>.svg`` (a dependency-free polyline of
    objective vs E-step, one colour per harmony round).  The trace is
    K x rounds-sized driver state — collecting it is O(iterations),
    never O(cells).  Returns the two artifact paths."""
    rows = sorted(
        trace.collect(),
        key=lambda r: (r["harmony_round"], r["kmeans_step"]),
    )
    csv_path, svg_path = path + ".csv", path + ".svg"
    with open(csv_path, "w") as f:
        f.write("harmony_round,kmeans_step,objective\n")
        for r in rows:
            f.write(
                f"{r['harmony_round']},{r['kmeans_step']},"
                f"{r['objective']!r}\n"
            )
    w, h, pad = 640, 360, 40
    objs = [r["objective"] for r in rows] or [0.0]
    lo, hi = min(objs), max(objs)
    span = (hi - lo) or 1.0
    n = max(len(rows) - 1, 1)

    def xy(i: int, v: float) -> str:
        x = pad + (w - 2 * pad) * i / n
        y = h - pad - (h - 2 * pad) * (v - lo) / span
        return f"{x:.1f},{y:.1f}"

    colors = ["#2563eb", "#dc2626", "#059669", "#d97706", "#7c3aed"]
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'viewBox="0 0 {w} {h}">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
        f'<text x="{w // 2}" y="20" text-anchor="middle" font-size="14">'
        "Harmony objective per E-step</text>",
    ]
    by_round: dict[int, list[tuple[int, float]]] = {}
    for i, r in enumerate(rows):
        by_round.setdefault(r["harmony_round"], []).append(
            (i, r["objective"])
        )
    for rnd, pts in sorted(by_round.items()):
        c = colors[rnd % len(colors)]
        coords = " ".join(xy(i, v) for i, v in pts)
        tag = "polyline" if len(pts) > 1 else "circle"
        if tag == "polyline":
            parts.append(
                f'<polyline points="{coords}" fill="none" stroke="{c}" '
                'stroke-width="2"/>'
            )
        else:
            x, y = coords.split(",")
            parts.append(f'<circle cx="{x}" cy="{y}" r="3" fill="{c}"/>')
    parts.append("</svg>")
    with open(svg_path, "w") as f:
        f.write("\n".join(parts))
    return csv_path, svg_path


def run_harmony(
    df: DataFrame,
    vars_use: list[str],
    mode: str = "batch",
    return_object: bool = False,
    verbose: bool = False,
    **kwargs,
):
    """Corrected embeddings for a cells DataFrame — the RunHarmony.default
    equivalent (/root/reference/R/ui.R:91-296), cells-as-rows.

    ``return_object=True`` returns the fitted :class:`HarmonySpark`
    (R's return_object returns the harmony object); ``verbose`` prints
    the per-round objective like R's progress output. R's
    plot_convergence has no plotting surface here — the trace is
    ``model.objective_kmeans`` (see README).

    mode:
      * ``batch`` (default) — the distributed engine (batch-EM E-steps,
        SURVEY.md §7.5).
      * ``blocked-local`` — exact reference semantics (sequential
        5%-block online E-steps, src/harmony.cpp:269-342) via the NumPy
        implementation on driver-collected data. Parity mode for
        datasets that fit one node (caps at 2M cells); the distributed
        mode is the scale path.
    """
    if mode == "batch":
        model = HarmonySpark(df, vars_use, **kwargs)
        result = model.run(verbose=verbose)
        return model if return_object else result
    if mode != "blocked-local":
        raise ValueError("mode must be 'batch' or 'blocked-local'")

    from harmony_spark.core.numpy_ref import run_harmony_numpy
    from harmony_spark.core.params import resolve_params

    features_col = kwargs.pop("features_col", "features")
    id_col = kwargs.pop("id_col", None)
    seed = kwargs.pop("seed", 42)
    if id_col is None:
        df = df.withColumn("cell_id", F.monotonically_increasing_id())
        id_col = "cell_id"
    rows = df.select(
        F.col(id_col).cast("long").alias("cell_id"),
        F.col(features_col).cast(f"array<{SPARK_SCALAR}>").alias("z"),
        *[F.col(v).cast("string").alias(v) for v in vars_use],
    ).orderBy("cell_id").collect()
    if len(rows) > 2_000_000:
        raise ValueError("blocked-local parity mode caps at 2M cells; use mode='batch'")
    Z = np.stack([r["z"] for r in rows]).astype(F32)
    level_counts: dict[str, list[tuple[str, int]]] = {}
    codes = np.zeros((len(rows), len(vars_use)), dtype=np.int64)
    for i, v in enumerate(vars_use):
        vals = [r[v] for r in rows]
        levels = sorted(set(vals))
        lut = {lvl: j for j, lvl in enumerate(levels)}
        codes[:, i] = [lut[x] for x in vals]
        level_counts[v] = [(lvl, vals.count(lvl)) for lvl in levels]
    p = resolve_params(
        N=Z.shape[0], d=Z.shape[1], vars_use=list(vars_use),
        level_counts=level_counts, seed=seed, **kwargs,
    )
    h = run_harmony_numpy(Z, codes, p, mode="blocked")
    spark = df.sparkSession
    out = [
        (int(rows[i]["cell_id"]), [float(x) for x in h.Z_corr[i]])
        for i in range(len(rows))
    ]
    return spark.createDataFrame(out, f"cell_id long, z_corr array<{SPARK_SCALAR}>")


def project_dim(
    result: DataFrame,
    features: DataFrame,
    *,
    id_col: str = "cell_id",
    embedding_col: str = "z_corr",
    feature_col: str = "feature",
) -> DataFrame:
    """ProjectDim equivalent (/root/reference/R/RunHarmony.R:113-119,
    the one piece of the Seurat sink with actual math): feature
    loadings L[g, k] = sum over cells of X[cell][g] * Z[cell][k] — the
    feature matrix projected onto the corrected reduction, so each
    output row says how strongly feature g drives harmonized dimension
    k.  Distributed as an explode-join-aggregate matmul: both arrays
    posexplode to long form, co-locate on the cell id (one shuffle),
    and the G x d result comes out of a map-side-combinable sum — no
    driver-side matrix ever materializes."""
    x = features.select(
        id_col, F.posexplode(feature_col).alias("g", "x")
    )
    z = result.select(
        id_col, F.posexplode(embedding_col).alias("k", "z")
    )
    return (
        x.join(z, id_col)
        .groupBy("g", "k")
        .agg(
            F.sum(
                F.col("x").cast("double") * F.col("z").cast("double")
            ).alias("loading")
        )
        .orderBy("g", "k")
    )


def save_embedding(
    result: DataFrame,
    path: str,
    embedding_col: str = "z_corr",
    project_features: DataFrame | None = None,
) -> DataFrame:
    """Sink equivalent of the Seurat/SCE adapters (S3/S4:
    /root/reference/R/RunHarmony.R:60-194): persist the corrected
    embedding to parquet and return the per-dimension stddev frame the
    Seurat DimReduc stores (A7: /root/reference/R/RunHarmony.R:108).
    When ``project_features`` is given (a (cell_id, feature-array)
    frame), the ``project.dim`` step of the Seurat sink also runs:
    :func:`project_dim` loadings are written to ``<path>_loadings``."""
    result.write.mode("overwrite").parquet(path)
    if project_features is not None:
        project_dim(result, project_features, embedding_col=embedding_col).write.mode(
            "overwrite"
        ).parquet(path + "_loadings")
    spark = result.sparkSession
    saved = spark.read.parquet(path)
    d = saved.select(F.size(embedding_col).alias("d")).first()["d"]
    exploded = saved.select(F.posexplode(embedding_col).alias("dim", "x"))
    return (
        exploded.groupBy("dim")
        .agg(F.stddev_samp("x").alias("stdev"))
        .orderBy("dim")
    )


def save_model(model: "HarmonySpark", path: str) -> None:
    """Persist a FITTED model's driver state — everything
    ``transform()`` / ``assign()`` / ``init_Y`` warm starts need —
    as one .npz plus a params json under ``path``.

    The reference's users ``saveRDS`` the harmony object; this is the
    engine's equivalent. The state is tiny (Y is d x K, W_all is
    K x (B+1) x d, the penalty state K x B), so it lives driver-side;
    pass a shared filesystem path to hand the model to another
    cluster. Blocked-mode runs store the flattened last-block penalty
    state — exactly what transform() uses for new cells.
    """
    import dataclasses
    import json
    import os

    if model.W_all is None:
        raise RuntimeError("run() must complete before save_model()")
    os.makedirs(path, exist_ok=True)
    rs = model._r_state
    if rs.get("blocked"):
        rs = rs["states"][-1]
    arrays = {
        "Y": model.Y,
        "W_all": model.W_all,
        "O": model.O,
        "E": model.E,
        "p_N_b": model.p.N_b,
        "p_Pr_b": model.p.Pr_b,
        "p_sigma": model.p.sigma,
        "p_theta": model.p.theta,
    }
    if model.p.lamb is not None:
        arrays["p_lamb"] = model.p.lamb
    rs_keys = []
    for k, v in rs.items():
        if isinstance(v, np.ndarray):
            arrays[f"rs_{k}"] = v
            rs_keys.append(k)
    np.savez(os.path.join(path, "state.npz"), **arrays)
    pdict = dataclasses.asdict(model.p)
    for k in ("N_b", "Pr_b", "sigma", "theta", "lamb"):
        pdict.pop(k, None)
    meta = {
        "params": pdict,
        "vars_use": model.vars_use,
        "has_lamb": model.p.lamb is not None,
        "rs_array_keys": rs_keys,
        "rs_scalars": {
            k: v for k, v in rs.items() if not isinstance(v, np.ndarray)
        },
        "objective_kmeans": [float(x) for x in model.objective_kmeans],
        "objective_harmony": [float(x) for x in model.objective_harmony],
        "kmeans_rounds": [int(x) for x in model.kmeans_rounds],
        "estep_mode": model.estep_mode,
        "n_blocks": int(model.n_blocks),
        "scalar_double": bool(F32 is np.float64),
    }
    with open(os.path.join(path, "model.json"), "w") as f:
        # numpy scalars (np.int64 counts, np.float32 objectives) leak
        # into params/state dicts; .item() them at the boundary
        json.dump(meta, f, default=lambda o: o.item())


def load_model(spark: SparkSession, path: str) -> "HarmonySpark":
    """Reconstruct a fitted model saved by :func:`save_model`: the
    returned object supports ``transform()`` / ``assign()`` /
    ``get_Y()`` etc. and its ``get_Y()`` feeds ``init_Y`` warm
    starts. (It cannot be re-``run()`` — that needs the training
    cells.)"""
    import json
    import os

    with open(os.path.join(path, "model.json")) as f:
        meta = json.load(f)
    if meta.get("scalar_double", False) and F32 is not np.float64:
        # f64-saved state in an f32 session would silently downcast every
        # model array; upcasting the other way is lossless and allowed.
        raise ValueError(
            "model was saved with scalar_double=True but this session runs "
            "float32 — set HARMONY_SCALAR_DOUBLE=1 (see core/scalars.py) "
            "before loading to avoid silently downcasting the model state"
        )
    arrs = np.load(os.path.join(path, "state.npz"))
    pdict = dict(meta["params"])
    p = ResolvedParams(
        **pdict,
        N_b=arrs["p_N_b"],
        Pr_b=arrs["p_Pr_b"],
        sigma=arrs["p_sigma"],
        theta=arrs["p_theta"],
        lamb=arrs["p_lamb"] if meta["has_lamb"] else None,
    )
    m = HarmonySpark.__new__(HarmonySpark)
    m.spark = spark
    m.vars_use = list(meta["vars_use"])
    m.code_cols = [f"code_{i}" for i in range(len(m.vars_use))]
    m.p = p
    m.Y = arrs["Y"].astype(F32)
    m.W_all = arrs["W_all"].astype(F32)
    m.O = arrs["O"].astype(F32)
    m.E = arrs["E"].astype(F32)
    rs = dict(meta["rs_scalars"])
    for k in meta["rs_array_keys"]:
        rs[k] = arrs[f"rs_{k}"]
    m._r_state = rs
    m.objective_kmeans = list(meta["objective_kmeans"])
    # the full lifecycle state, so post-fit accessors (convergence_trace,
    # get_R's guard, cleanup) hit their documented RuntimeError guards —
    # not AttributeError — on whatever a loaded model cannot support
    m.objective_harmony = list(meta.get("objective_harmony", []))
    m.kmeans_rounds = list(meta.get("kmeans_rounds", []))
    m.estep_mode = meta.get("estep_mode", "batch")
    m.n_blocks = int(meta.get("n_blocks", 1))
    m._cells_final = None
    m.cells0 = None  # training cells are not persisted; run() is guarded
    m._persisted = None
    m._block_contrib = []
    return m
