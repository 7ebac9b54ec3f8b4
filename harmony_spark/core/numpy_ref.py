"""Reference-faithful single-node NumPy implementation of harmony2.

This is the cross-implementation oracle (SURVEY.md §5 port strategy): it
reproduces the C++ math of /root/reference/src/harmony.cpp step by step
(cells-as-rows orientation) and is used by the tests to pin the Spark
engine's kernels to the reference semantics.

Three E-step modes:
  * ``blocked``      — the reference's sequential online update
    (update_R, src/harmony.cpp:269-342): RNG shuffle, 5% blocks,
    subtract block from E/O, recompute block R with the diversity
    penalty, add back.
  * ``blocked-hash`` — the same online update with the Spark engine's
    deterministic arithmetic block assignment (fixed within a round);
    the exact mirror of HarmonySpark(estep_mode='blocked') for
    cross-checking.
  * ``batch``        — full-batch EM: new R for all cells from the
    previous iteration's O/E, then O/E recomputed. Same fixed-point
    family; the Spark engine's default (SURVEY.md §7.5 trade-off).
"""

from __future__ import annotations

import numpy as np

from harmony_spark.core.kmeans import kmeans_centers
from harmony_spark.core.params import ResolvedParams

from harmony_spark.core.scalars import SCALAR as F32  # HARMONY_SCALAR_DOUBLE switch


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _global_codes(codes: np.ndarray, p: ResolvedParams) -> np.ndarray:
    """(N, C) per-covariate level codes -> (N, C) global batch indices."""
    return codes + np.asarray(p.offsets, dtype=codes.dtype)[None, :]


class HarmonyNumpy:
    """State container mirroring the harmony C++ class (src/harmony.h:40-66)."""

    def __init__(self, Z: np.ndarray, codes: np.ndarray, p: ResolvedParams, mode: str = "blocked"):
        assert Z.shape[0] == p.N and Z.shape[1] == p.d
        self.p = p
        self.mode = mode
        self.Z_orig = Z.astype(F32)  # (N, d)
        self.Z_corr = _normalize_rows(self.Z_orig)  # setup: src/harmony.cpp:42
        self.gcodes = _global_codes(codes, p)  # (N, C)
        self.rng = np.random.default_rng(p.seed)
        self.R = None  # (N, K)
        self.Y = None  # (d, K)
        self.O = np.zeros((p.K, p.B), dtype=F32)
        self.E = np.zeros((p.K, p.B), dtype=F32)
        self.objective_kmeans: list[float] = []
        self.objective_harmony: list[float] = []
        self.kmeans_rounds: list[int] = []

    # -- building blocks -------------------------------------------------

    def _dist(self, Zn: np.ndarray) -> np.ndarray:
        """(N, K) cosine-squared distance, cross-product trick
        (src/harmony.cpp:141)."""
        return 2.0 * (1.0 - Zn @ self.Y)

    def _soft_assign(self, dist: np.ndarray) -> np.ndarray:
        """R = exp(-dist/sigma) column-normalized (src/harmony.cpp:143-146)."""
        R = np.exp(-dist / self.p.sigma[None, :])
        return R / np.maximum(R.sum(axis=1, keepdims=True), 1e-30)

    def _accumulate_OE(self, R: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        K, B = self.p.K, self.p.B
        O = np.zeros((K, B), dtype=np.float64)
        for c in range(self.gcodes.shape[1]):
            np.add.at(O.T, self.gcodes[:, c], R.astype(np.float64))
        E = R.sum(axis=0, dtype=np.float64)[:, None] * self.p.Pr_b[None, :]
        return O.astype(F32), E.astype(F32)

    def _penalty_per_cell(self, O: np.ndarray, E: np.ndarray) -> np.ndarray:
        """(N, K) additive-over-covariates diversity penalty:
        sum_cov ((2E+1)/(O+E+1))^theta_b  at each cell's levels
        (harmony_pow(...)*Phi, src/harmony.cpp:322)."""
        pen = ((2.0 * E + 1.0) / (O + E + 1.0)) ** self.p.theta[None, :]  # (K, B)
        out = np.zeros((self.p.N, self.p.K), dtype=F32)
        for c in range(self.gcodes.shape[1]):
            out += pen[:, self.gcodes[:, c]].T
        return out

    # -- lifecycle: init / cluster / correct ------------------------------

    def init_cluster(self):
        """init_cluster_cpp (src/harmony.cpp:131-156)."""
        self.Y = kmeans_centers(self.Z_corr, self.p.K, self.p.seed)
        self.dist_mat = self._dist(self.Z_corr)
        self.R = self._soft_assign(self.dist_mat)
        self.O, self.E = self._accumulate_OE(self.R)
        self._compute_objective()
        self.objective_harmony.append(self.objective_kmeans[-1])

    def _compute_objective(self):
        """compute_objective (src/harmony.cpp:158-170). The cross-entropy
        term contracts over cells to sigma_k * theta_b * O_kb * log(...)."""
        p = self.p
        norm_const = 2000.0 / p.N
        kmeans_error = float((self.R * self.dist_mat).sum())
        safe = np.where(self.R > 0, self.R * np.log(np.maximum(self.R, 1e-30)), 0.0)
        entropy = float((safe * p.sigma[None, :]).sum())
        log_term = np.log((self.O + self.E + 1.0) / (2.0 * self.E + 1.0))
        cross = float(
            (p.sigma[:, None] * p.theta[None, :] * log_term * self.O).sum()
        )
        self.objective_kmeans.append((kmeans_error + entropy + cross) * norm_const)

    def _cold_start(self):
        """Re-estimate R/E/O from current Z_corr (src/harmony.cpp:214-228)."""
        self.Z_corr = _normalize_rows(self.Z_corr)
        self.dist_mat = self._dist(self.Z_corr)
        self.R = self._soft_assign(self.dist_mat)
        self.O, self.E = self._accumulate_OE(self.R)

    def _update_R_blocked(self):
        """update_R (src/harmony.cpp:269-342), sequential online blocks."""
        p = self.p
        order = self.rng.permutation(p.N)
        n_blocks = int(np.ceil(1.0 / p.block_size))
        cells_per_block = int(p.N * p.block_size)
        for i in range(n_blocks):
            lo = i * cells_per_block
            hi = p.N if i == n_blocks - 1 else (i + 1) * cells_per_block
            if lo >= p.N:
                break
            idx = order[lo:hi]
            Rb = self.R[idx]
            # Step 1: remove cells
            self.E -= Rb.sum(axis=0)[:, None] * p.Pr_b[None, :]
            for c in range(self.gcodes.shape[1]):
                np.add.at(self.O.T, self.gcodes[idx, c], -Rb)
            # Step 2: recompute R for removed cells
            Rb = np.exp(-self.dist_mat[idx] / p.sigma[None, :])
            Rb /= np.maximum(Rb.sum(axis=1, keepdims=True), 1e-30)
            pen = ((2.0 * self.E + 1.0) / (self.O + self.E + 1.0)) ** p.theta[None, :]
            mult = np.zeros_like(Rb)
            for c in range(self.gcodes.shape[1]):
                mult += pen[:, self.gcodes[idx, c]].T
            Rb = Rb * mult
            Rb /= np.maximum(Rb.sum(axis=1, keepdims=True), 1e-30)
            # Step 3: put cells back
            self.R[idx] = Rb
            self.E += Rb.sum(axis=0)[:, None] * p.Pr_b[None, :]
            for c in range(self.gcodes.shape[1]):
                np.add.at(self.O.T, self.gcodes[idx, c], Rb)

    def _update_R_batch(self):
        """Full-batch EM variant (the Spark engine's default mode)."""
        R = self._soft_assign(self.dist_mat)
        R = R * self._penalty_per_cell(self.O, self.E)
        R /= np.maximum(R.sum(axis=1, keepdims=True), 1e-30)
        self.R = R
        self.O, self.E = self._accumulate_OE(R)

    def _update_R_blocked_hash(self, round_idx: int):
        """Online blocked update with the Spark engine's deterministic
        arithmetic block assignment (fixed within a round) — the exact
        mirror of HarmonySpark(estep_mode='blocked') for cross-checking.
        Same O-=block / reassign / O+=block semantics as the reference
        (src/harmony.cpp:269-342); only the shuffle source differs."""
        from harmony_spark.core.kernels import block_ids

        p = self.p
        nb = int(np.ceil(1.0 / p.block_size))
        cell_ids = np.arange(p.N, dtype=np.int64)
        blocks = block_ids(cell_ids, round_idx, nb)
        O64 = self.O.astype(np.float64)
        for i in range(nb):
            idx = np.flatnonzero(blocks == i)
            if len(idx) == 0:
                continue
            C_i = np.zeros_like(O64)
            Rb_old = self.R[idx].astype(np.float64)
            for c in range(self.gcodes.shape[1]):
                codes_c = self.gcodes[idx, c]
                for b in np.unique(codes_c):
                    C_i[:, b] += Rb_old[codes_c == b].sum(axis=0)
            O_minus = O64 - C_i
            mass_minus = O_minus[:, : p.B_vec[0]].sum(axis=1)
            E_minus = (mass_minus[:, None] * p.Pr_b[None, :].astype(np.float64)).astype(F32)
            O_minus32 = O_minus.astype(F32)
            Rb = np.exp(-self.dist_mat[idx] / p.sigma[None, :])
            Rb /= np.maximum(Rb.sum(axis=1, keepdims=True), 1e-30)
            pen = ((2.0 * E_minus + 1.0) / (O_minus32 + E_minus + 1.0)) ** p.theta[None, :]
            mult = np.zeros_like(Rb)
            for c in range(self.gcodes.shape[1]):
                mult += pen[:, self.gcodes[idx, c]].T
            Rb = Rb * mult
            Rb /= np.maximum(Rb.sum(axis=1, keepdims=True), 1e-30)
            self.R[idx] = Rb
            C_new = np.zeros_like(O64)
            Rb64 = Rb.astype(np.float64)
            for c in range(self.gcodes.shape[1]):
                codes_c = self.gcodes[idx, c]
                for b in np.unique(codes_c):
                    C_new[:, b] += Rb64[codes_c == b].sum(axis=0)
            O64 = O_minus + C_new
        self.O = O64.astype(F32)
        mass = O64[:, : p.B_vec[0]].sum(axis=1)
        self.E = (mass[:, None] * p.Pr_b[None, :].astype(np.float64)).astype(F32)

    def cluster(self) -> int:
        """cluster_cpp (src/harmony.cpp:208-262)."""
        p = self.p
        if len(self.objective_harmony) != 1:
            self._cold_start()
        round_idx = len(self.kmeans_rounds)
        iters_done = 0
        for it in range(p.max_iter_cluster):
            if self.mode == "blocked":
                self._update_R_blocked()
            elif self.mode == "blocked-hash":
                self._update_R_blocked_hash(round_idx)
            else:
                self._update_R_batch()
            self._compute_objective()
            iters_done = it + 1
            if it > p.window_size and self._kmeans_converged():
                break
        self.kmeans_rounds.append(iters_done)
        self.objective_harmony.append(self.objective_kmeans[-1])
        return 0

    def _kmeans_converged(self) -> bool:
        """check_convergence(0) (src/harmony.cpp:177-190)."""
        w = self.p.window_size
        obj = self.objective_kmeans
        obj_old = sum(obj[-2 - i] for i in range(w))
        obj_new = sum(obj[-1 - i] for i in range(w))
        return abs(obj_old - obj_new) / abs(obj_old) < self.p.epsilon_cluster

    def harmony_converged(self) -> bool:
        """check_convergence(1) (src/harmony.cpp:191-199)."""
        obj_old, obj_new = self.objective_harmony[-2], self.objective_harmony[-1]
        return (obj_old - obj_new) / abs(obj_old) < self.p.epsilon_harmony

    def moe_correct_ridge(self):
        """moe_correct_ridge_cpp (src/harmony.cpp:345-638), dense form.

        Per cluster k: batch-support filter (C5), auto or fixed lambda,
        ridge solve W_k = (Phi* diag(R_k) Phi*^T + Lambda)^-1 Phi* diag(R_k)
        Z_orig, centroid update Y_k = W_k[0], correction subtracts the
        batch rows. Cells in dropped batches are excluded from both the
        regression and the correction for that cluster.
        """
        p = self.p
        self.Z_corr = self.Z_orig.copy()
        W_all = np.zeros((p.K, p.B, p.d), dtype=np.float64)  # batch rows only
        C = self.gcodes.shape[1]

        for k in range(p.K):
            avg_R = self.O[k] / p.N_b  # (B,)
            qualifies = avg_R > p.batch_prop_cutoff
            # per covariate: count qualifying levels
            cov_levels = []
            for c in range(C):
                lo = p.offsets[c]
                hi = lo + p.B_vec[c]
                cov_levels.append(int(qualifies[lo:hi].sum()))
            keep = np.zeros(p.B, dtype=bool)
            for c in range(C):
                lo = p.offsets[c]
                hi = lo + p.B_vec[c]
                if cov_levels[c] > 1:
                    keep[lo:hi] = qualifies[lo:hi]
            active_covariates = sum(1 for x in cov_levels if x > 1)
            if keep.sum() < p.B and active_covariates == 0:
                continue  # skip correction for this cluster entirely

            # cells kept: member of >=1 kept batch
            cell_keep = np.zeros(p.N, dtype=bool)
            for c in range(C):
                cell_keep |= keep[self.gcodes[:, c]]
            kept_levels = np.flatnonzero(keep)
            level_pos = {b: j + 1 for j, b in enumerate(kept_levels)}  # +1: intercept row 0
            m = len(kept_levels)

            Rk = self.R[cell_keep, k].astype(np.float64)  # (n_keep,)
            Zk = self.Z_orig[cell_keep].astype(np.float64)  # (n_keep, d)
            gck = self.gcodes[cell_keep]  # (n_keep, C)

            # design matrix rows: intercept + kept levels
            Phi = np.zeros((m + 1, len(Rk)))
            Phi[0] = 1.0
            for c in range(C):
                codes_c = gck[:, c]
                for j, b in enumerate(kept_levels):
                    Phi[j + 1, codes_c == b] = 1.0

            Gram = (Phi * Rk[None, :]) @ Phi.T  # (m+1, m+1)
            if p.lamb is None:
                lam = np.concatenate([[0.0], p.alpha * self.E[k][kept_levels]])
            else:
                lam = np.concatenate([[0.0], p.lamb[1:][kept_levels]])
            Gram[np.diag_indices(m + 1)] += lam
            rhs = (Phi * Rk[None, :]) @ Zk  # (m+1, d)
            W = np.linalg.solve(Gram, rhs)  # (m+1, d)

            self.Y[:, k] = W[0].astype(F32)  # centroid = intercept row
            for b in kept_levels:
                W_all[k, b] = W[level_pos[b]]

            # correction: z -= R_k * sum_cov W[level(cell)]
            corr = np.zeros((len(Rk), p.d))
            for c in range(C):
                codes_c = gck[:, c]
                mask = keep[codes_c]
                corr[mask] += W_all[k][codes_c[mask]]
            self.Z_corr[cell_keep] -= (Rk[:, None] * corr).astype(F32)

        self.Y = self.Y / np.maximum(np.linalg.norm(self.Y, axis=0, keepdims=True), 1e-12)

    def harmonize(self, max_iter: int | None = None) -> int:
        """harmonize (R/utils.R:15-46)."""
        max_iter = max_iter or self.p.max_iter
        for it in range(max_iter):
            self.cluster()
            self.moe_correct_ridge()
            if self.harmony_converged():
                return it + 1
        return max_iter


def run_harmony_numpy(
    Z: np.ndarray, codes: np.ndarray, p: ResolvedParams, mode: str = "blocked"
) -> HarmonyNumpy:
    h = HarmonyNumpy(Z, codes, p, mode=mode)
    h.init_cluster()
    h.harmonize()
    return h
