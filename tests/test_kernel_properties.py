"""Property-based tests (hypothesis) for the NumPy kernel math shared by
the Spark engine and the cross-oracle — fast, no SparkSession."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from harmony_spark.core import kernels
from harmony_spark.core.kmeans import kmeans_centers
from harmony_spark.core.params import resolve_params

finite_f32 = st.floats(-50, 50, width=32, allow_nan=False)


@settings(max_examples=50, deadline=None)
@given(
    dist=arrays(np.float32, (7, 4), elements=st.floats(0, 4, width=32)),
    sigma=arrays(np.float32, (4,), elements=st.floats(0.0625, 2, width=32)),
    sigma0=st.floats(0.0625, 2, width=32),
)
def test_soft_assign_row_stochastic(dist, sigma, sigma0):
    R = kernels._soft_assign(dist, sigma)
    assert (R >= 0).all() and (R <= 1 + 1e-6).all()
    np.testing.assert_allclose(R.sum(axis=1), 1.0, atol=1e-5)
    # with a CONSTANT sigma, smaller distance -> no smaller probability
    # (with per-cluster sigma this is intentionally false — the
    # reference's vector-sigma semantics, src/harmony.cpp:143-146)
    Rc = kernels._soft_assign(dist, np.full(4, sigma0, dtype=np.float32))
    for i in range(dist.shape[0]):
        order_d = np.argsort(dist[i], kind="stable")
        r_sorted = Rc[i][order_d]
        assert (np.diff(r_sorted) <= 1e-6).all()


@settings(max_examples=30, deadline=None)
@given(
    z=arrays(np.float32, (6, 5), elements=finite_f32),
    R=arrays(np.float32, (6, 3), elements=st.floats(0, 1, width=32)),
)
def test_correction_with_zero_W_is_identity(z, R):
    gcodes = np.zeros((6, 1), dtype=np.int64)
    W = np.zeros((3, 2, 5), dtype=np.float32)
    out = kernels._correction(z, R, gcodes, W)
    np.testing.assert_allclose(out, z, atol=1e-6)


@settings(max_examples=20, deadline=None)
@given(
    z=arrays(np.float32, (6, 5), elements=finite_f32),
    R=arrays(np.float32, (6, 3), elements=st.floats(0, 1, width=32)),
    W=arrays(np.float32, (3, 2, 5), elements=st.floats(-2, 2, width=32)),
    codes=arrays(np.int64, (6, 1), elements=st.integers(0, 1)),
)
def test_correction_matches_naive_loop(z, R, W, codes):
    out = kernels._correction(z, R, codes, W)
    naive = z.astype(np.float64).copy()
    for i in range(z.shape[0]):
        for k in range(R.shape[1]):
            naive[i] -= R[i, k] * W[k, codes[i, 0]]
    np.testing.assert_allclose(out, naive.astype(np.float32), atol=1e-3)


@settings(max_examples=10, deadline=None)
@given(
    X=arrays(np.float32, (40, 6), elements=st.floats(-10, 10, width=32)),
    K=st.integers(2, 6),
)
def test_kmeans_centers_unit_norm(X, K):
    # degenerate all-zero rows would make norms meaningless
    X = X + np.linspace(0.1, 1.0, 6)[None, :].astype(np.float32)
    Y = kmeans_centers(X, K, seed=3)
    assert Y.shape == (6, K)
    np.testing.assert_allclose(np.linalg.norm(Y, axis=0), 1.0, atol=1e-4)


@settings(max_examples=30, deadline=None)
@given(
    counts=st.lists(st.integers(1, 1000), min_size=2, max_size=5),
    theta=st.floats(0, 5),
    tau=st.floats(0, 10),
)
def test_param_expansion_shapes(counts, theta, tau):
    from harmony_spark.core.params import HarmonyOptions

    N = sum(counts)
    if N < 6:
        return
    p = resolve_params(
        N=N,
        d=4,
        vars_use=["b"],
        level_counts={"b": [(f"l{i}", c) for i, c in enumerate(counts)]},
        theta=theta,
        lamb=2.0,
        nclust=5,
        options=HarmonyOptions(tau=tau),
    )
    B = len(counts)
    assert p.theta.shape == (B,)
    assert p.lamb.shape == (B + 1,) and p.lamb[0] == 0
    assert p.Pr_b.shape == (B,)
    np.testing.assert_allclose(p.Pr_b.sum(), 1.0, atol=1e-5)
    # tau damping only ever shrinks theta
    assert (p.theta <= theta + 1e-6).all()
