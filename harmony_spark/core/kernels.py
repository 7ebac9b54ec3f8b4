"""Arrow-vectorized kernels for the harmony Spark engine.

Each kernel is a mapInPandas function factory: the tiny model state
(Y, O, E, W, sigma, theta) arrives via a Spark broadcast, the N-sized
data streams through as Arrow batches, and all math runs in NumPy
float32 (mirroring the reference's float32 compute path,
/root/reference/src/types.h:5-9). The N-sized data never visits the
driver (SURVEY.md §3.4).

Kernel shapes:
  * estep      — the M1 distance GEMM ``2(1 - Zn Y)`` fused with the P4
    softmax and the diversity penalty (src/harmony.cpp:141,318-323):
    broadcast-join-with-compute, no shuffle.
  * accumulate — partial aggregation of O (A4), per-cluster R log R and
    R·dist sums (A6): each partition emits one tiny row; the driver
    finishes the reduction (map-side combine done by hand, shuffle-free).
  * moe_partials — grouped weighted vector sums keyed by the joint
    covariate-level combo (A8/A9): emits (combo, S_k, M_kd) partials.
  * correct    — the M2 correction gather: z = z_orig - sum_k R_k W_k[b(cell)].
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

F32 = np.float32


def _stack(series: pd.Series, dtype=F32) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(dtype, copy=False)


def _normalize_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def _codes_matrix(pdf: pd.DataFrame, code_cols: list[str], offsets: list[int]) -> np.ndarray:
    codes = pdf[code_cols].to_numpy(dtype=np.int64)
    return codes + np.asarray(offsets, dtype=np.int64)[None, :]


def _soft_assign(dist: np.ndarray, sigma: np.ndarray) -> np.ndarray:
    R = np.exp(-dist / sigma[None, :])
    return R / np.maximum(R.sum(axis=1, keepdims=True), 1e-30)


def _correction(z: np.ndarray, R: np.ndarray, gcodes: np.ndarray, W_all: np.ndarray) -> np.ndarray:
    """z - sum_k R_k * sum_cov W_all[k, b_cov], vectorized over the batch.

    W_all: (K, B, d) with zero rows for dropped batches / skipped
    clusters (src/harmony.cpp:611-615 with C5 filtering folded in).
    """
    # Wc[n, k, d] = sum over covariates of W_all[k, gcodes[n, c]]
    n = z.shape[0]
    K, B, d = W_all.shape
    corr = np.zeros((n, d), dtype=np.float64)
    for c in range(gcodes.shape[1]):
        # (n, K, d) gather is memory-heavy; contract k first per level.
        # group rows by level code for cache-friendly GEMMs
        codes_c = gcodes[:, c]
        for b in np.unique(codes_c):
            Wb = W_all[:, b, :]  # (K, d)
            if not Wb.any():
                continue
            mask = codes_c == b
            corr[mask] += R[mask].astype(np.float64) @ Wb
    return (z.astype(np.float64) - corr).astype(F32)


class _PartialAcc:
    """Accumulates O / R·logR / R·dist partials across the Arrow batches
    of one partition; emitted as a single tag row (cell_id NULL) so the
    row update and the aggregation share one pass over the data."""

    def __init__(self, K: int, B: int):
        self.O = np.zeros((K, B), dtype=np.float64)
        self.rlogr = np.zeros(K, dtype=np.float64)
        self.rdist = 0.0
        self.seen = False

    def add(self, R: np.ndarray, dist: np.ndarray, gcodes: np.ndarray) -> None:
        self.seen = True
        R64 = R.astype(np.float64)
        for c in range(gcodes.shape[1]):
            np.add.at(self.O.T, gcodes[:, c], R64)
        self.rlogr += np.where(R64 > 0, R64 * np.log(np.maximum(R64, 1e-30)), 0.0).sum(axis=0)
        self.rdist += float((R64 * dist).sum())

    def row(self, template: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({c: [None] for c in template.columns})
        out["o"] = [self.O.ravel()]
        out["rlogr"] = [self.rlogr]
        out["rdist"] = [self.rdist]
        return out


def make_cold_start_kernel(
    bc, code_cols: list[str], offsets: list[int], K: int, B: int, feature_col: str = "z_orig"
) -> Callable:
    """(z_orig, codes, [r]) -> rows with fresh zn (normalized corrected
    embedding), penalty-free soft assignment r (init:
    src/harmony.cpp:131-146; cold start: :214-228), plus one O/objective
    partial row per partition (fused A4/A6 aggregation)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = bc.value
        Y = st["Y"]  # (d, K)
        sigma = st["sigma"]
        W_all = st.get("W_all")  # None at init
        acc = _PartialAcc(K, B)
        template = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            z = _stack(pdf[feature_col])
            gcodes = _codes_matrix(pdf, code_cols, offsets)
            if W_all is not None:
                R_prev = _stack(pdf["r"])
                zc = _correction(z, R_prev, gcodes, W_all)
            else:
                zc = z
            zn = _normalize_rows(zc)
            dist = 2.0 * (1.0 - zn @ Y)
            R = _soft_assign(dist, sigma)
            acc.add(R, dist, gcodes)
            out = pdf[["cell_id", feature_col, *code_cols]].copy()
            out["zn"] = list(zn.astype(F32))
            out["r"] = list(R.astype(F32))
            out["o"] = None
            out["rlogr"] = None
            out["rdist"] = None
            template = out
            yield out
        if acc.seen:
            yield acc.row(template)

    return kernel


def make_estep_kernel(bc, code_cols: list[str], offsets: list[int], K: int, B: int) -> Callable:
    """Batch-EM diversity E-step (src/harmony.cpp:318-323 semantics with
    the full-batch O/E of the previous iteration; SURVEY.md §7.5), fused
    with the O/objective partial aggregation."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = bc.value
        Y, sigma, theta = st["Y"], st["sigma"], st["theta"]
        pen = ((2.0 * st["E"] + 1.0) / (st["O"] + st["E"] + 1.0)) ** theta[None, :]  # (K,B)
        acc = _PartialAcc(K, B)
        template = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            zn = _stack(pdf["zn"])
            gcodes = _codes_matrix(pdf, code_cols, offsets)
            dist = 2.0 * (1.0 - zn @ Y)
            R = _soft_assign(dist, sigma)
            mult = np.zeros_like(R)
            for c in range(gcodes.shape[1]):
                mult += pen[:, gcodes[:, c]].T
            R = R * mult
            R /= np.maximum(R.sum(axis=1, keepdims=True), 1e-30)
            acc.add(R, dist, gcodes)
            out = pdf.copy()
            out["r"] = list(R.astype(F32))
            out["o"] = None
            out["rlogr"] = None
            out["rdist"] = None
            template = out
            yield out
        if acc.seen:
            yield acc.row(template)

    return kernel


def make_moe_partials_kernel(
    code_cols: list[str], offsets: list[int], K: int, d: int, feature_col: str = "z_orig"
) -> Callable:
    """Per joint-covariate-combo partials: S (K) = sum_i R_i,
    M (K*d) = sum_i R_i z_orig_i — the A8 Gram entries and A9 RHS in one
    pass. Emits one row per (partition, combo)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, list] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            z = _stack(pdf[feature_col], dtype=np.float64)
            R = _stack(pdf["r"]).astype(np.float64)
            codes = pdf[code_cols].to_numpy(dtype=np.int64)
            # group rows by joint covariate combo (numpy, no pandas index games)
            uniq, inverse = np.unique(codes, axis=0, return_inverse=True)
            for u in range(len(uniq)):
                combo_t = tuple(int(x) for x in uniq[u])
                ii = np.flatnonzero(inverse == u)
                S = R[ii].sum(axis=0)  # (K,)
                M = R[ii].T @ z[ii]  # (K, d)
                if combo_t in acc:
                    acc[combo_t][0] += S
                    acc[combo_t][1] += M
                else:
                    acc[combo_t] = [S, M]
        if acc:
            rows = {
                "combo": [np.asarray(c, dtype=np.int64) for c in acc],
                "s": [v[0] for v in acc.values()],
                "m": [v[1].ravel() for v in acc.values()],
            }
            yield pd.DataFrame(rows)

    return kernel


def make_correct_kernel(
    bc, code_cols: list[str], offsets: list[int], feature_col: str = "z_orig"
) -> Callable:
    """Final materialization: z_corr = z_orig - correction (M2)."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        st = bc.value
        W_all = st["W_all"]
        for pdf in it:
            if len(pdf) == 0:
                continue
            z = _stack(pdf[feature_col])
            R = _stack(pdf["r"])
            gcodes = _codes_matrix(pdf, code_cols, offsets)
            zc = _correction(z, R, gcodes, W_all)
            out = pdf[["cell_id", *code_cols]].copy()
            out["z_corr"] = list(zc.astype(F32))
            yield out

    return kernel
