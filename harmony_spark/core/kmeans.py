"""Seeded k-means++ + Lloyd refinement on a driver-side sample.

Port of kmeans_centers (/root/reference/src/utils.cpp:10-64): kmeans++
weighted-reservoir seeding (prob = -log(u)/dist, argmin) followed by 10
Lloyd iterations keeping existing centroids. The reference runs this over
ALL cells single-node; at 100 TB the engine runs it over a deterministic
sample (standard scalable init — the subsequent harmony rounds refine Y
anyway via the ridge intercepts, src/harmony.cpp:610).

NumPy, seeded, shared by the Spark driver and the NumPy cross-oracle so
both sides start from identical centroids.
"""

from __future__ import annotations

import numpy as np


def kmeans_plusplus(X: np.ndarray, K: int, rng: np.random.Generator) -> np.ndarray:
    """X: (n, d) L2-normalized rows. Returns (K, d) seed centroids.

    Mirrors initialize_centroids (src/utils.cpp:10-49): start from K
    random picks, then for i in 0..K-1 replace centroid i by the
    exponential-race argmin against centroid i's distances.
    """
    n = X.shape[0]
    idx0 = np.floor(rng.random(K) * (n - 1)).astype(int)
    Y = X[idx0].copy()
    chosen: set[int] = set()
    for i in range(K):
        dist = np.abs(2.0 * (1.0 - X @ Y[i]))  # cosine-squared distance
        u = rng.random(n)
        with np.errstate(divide="ignore"):
            prob = -np.log(u) / np.maximum(dist, 1e-12)
        order = np.argsort(prob)
        j = 0
        pick = int(order[j])
        while pick in chosen and j + 1 < n:
            j += 1
            pick = int(order[j])
        chosen.add(pick)
        Y[i] = X[pick]
    return Y


def lloyd(X: np.ndarray, Y: np.ndarray, iters: int = 10) -> np.ndarray:
    """Plain Lloyd iterations keeping existing centroids (src/utils.cpp:52-64)."""
    K = Y.shape[0]
    for _ in range(iters):
        # cosine-squared distance via the cross-product trick
        d = 2.0 * (1.0 - X @ Y.T)
        assign = np.argmin(d, axis=1)
        for k in range(K):
            members = X[assign == k]
            if len(members):
                Y[k] = members.mean(axis=0)
    return Y


def kmeans_centers(X: np.ndarray, K: int, seed: int) -> np.ndarray:
    """(n, d) rows -> (d, K) centroid matrix, L2-normalized columns."""
    rng = np.random.default_rng(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    Y = kmeans_plusplus(Xn, K, rng)
    Y = lloyd(Xn, Y, iters=10)
    Yn = Y / np.maximum(np.linalg.norm(Y, axis=1, keepdims=True), 1e-12)
    from harmony_spark.core.scalars import SCALAR
    return Yn.T.astype(SCALAR)
