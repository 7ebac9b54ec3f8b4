"""Parameter resolution for the harmony algorithm.

Faithful port of the reference's R-side "parse/analyze" stage
(/root/reference/R/ui.R:131-266 and /root/reference/R/harmony_option.R:25-45):
K / theta / sigma / lambda defaults, per-level theta expansion with tau
damping, lambda auto-estimation sentinel, and the small-N guards from
/root/reference/src/harmony.cpp:83-91.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class HarmonyOptions:
    """Mirrors harmony_options() defaults (/root/reference/R/harmony_option.R:33-40)."""

    alpha: float = 0.2
    tau: float = 0.0
    block_size: float = 0.05
    max_iter_cluster: int = 4
    epsilon_cluster: float = 1e-3
    epsilon_harmony: float = 1e-2
    batch_prop_cutoff: float = 1e-5

    def __post_init__(self):
        if not (0.0 < self.block_size <= 1.0):
            raise ValueError("block.size should be set between 0 and 1")


@dataclass
class ResolvedParams:
    """Everything the engine needs, fully expanded to per-level vectors."""

    N: int
    d: int
    K: int
    vars_use: list[str]
    B_vec: list[int]  # levels per covariate
    levels: list[list[str]]  # level names per covariate (sorted, factor order)
    offsets: list[int]  # starting global batch index per covariate
    B: int  # total levels across covariates
    N_b: np.ndarray  # (B,) cells per level
    Pr_b: np.ndarray  # (B,)
    sigma: np.ndarray  # (K,)
    theta: np.ndarray  # (B,)
    lamb: np.ndarray | None  # (B+1,) with lamb[0]=0, or None -> auto
    alpha: float
    block_size: float
    max_iter_cluster: int
    epsilon_cluster: float
    epsilon_harmony: float
    batch_prop_cutoff: float
    max_iter: int
    window_size: int = 3
    seed: int = 42


def resolve_params(
    *,
    N: int,
    d: int,
    vars_use: list[str],
    level_counts: dict[str, list[tuple[str, int]]],
    theta=None,
    sigma=0.1,
    lamb=None,
    nclust: int | None = None,
    max_iter: int = 10,
    early_stop: bool = True,
    options: HarmonyOptions | None = None,
    seed: int = 42,
) -> ResolvedParams:
    """level_counts: per covariate, the (level_name, count) pairs.

    Port of /root/reference/R/ui.R:175-258 + src/harmony.cpp:83-91.
    """
    options = options or HarmonyOptions()

    if N < 6:
        raise ValueError("Refusing to run with less than 6 cells")
    block_size = options.block_size
    if N < 40:
        block_size = 0.2  # src/harmony.cpp:86-88

    if nclust is None:
        nclust = min(round(N / 30), 100)  # R/ui.R:192-194
    K = int(max(nclust, 1))

    if theta is None:
        theta = [2.0] * len(vars_use)  # R/ui.R:197-198
    elif np.isscalar(theta):
        theta = [float(theta)] * len(vars_use)
    if len(theta) != len(vars_use):
        raise ValueError("Please specify theta for each variable")

    sigma_arr = (
        np.full(K, float(sigma), dtype=np.float32)
        if np.isscalar(sigma)
        else np.asarray(sigma, dtype=np.float32)
    )
    if sigma_arr.shape != (K,):
        raise ValueError(f"sigma must be scalar or length K={K}")

    levels, B_vec, N_b_parts = [], [], []
    for v in vars_use:
        if v not in level_counts:
            raise ValueError(f"covariate {v!r} not found in metadata")
        pairs = sorted(level_counts[v])  # factor order = sorted level names
        levels.append([p[0] for p in pairs])
        B_vec.append(len(pairs))
        N_b_parts.append(np.array([p[1] for p in pairs], dtype=np.float64))
    B = int(sum(B_vec))
    offsets = list(np.concatenate([[0], np.cumsum(B_vec)[:-1]]).astype(int))
    N_b = np.concatenate(N_b_parts)
    Pr_b = N_b / N

    # lambda: None -> auto estimation; scalar -> same for all levels;
    # vector -> one per covariate, expanded per level (R/ui.R:224-248)
    if lamb is None:
        lamb_vec = None
    else:
        lam_list = [float(lamb)] * len(vars_use) if np.isscalar(lamb) else list(lamb)
        if any(x <= 0 for x in lam_list):
            raise ValueError("Provided lambdas must be positive")
        if len(lam_list) != len(vars_use):
            raise ValueError(
                f"number of lambdas ({len(lam_list)}) and covariates "
                f"({len(vars_use)}) mismatch"
            )
        expanded = np.concatenate(
            [np.full(B_vec[i], lam_list[i]) for i in range(len(vars_use))]
        )
        lamb_vec = np.concatenate([[0.0], expanded]).astype(np.float32)

    # theta expanded per level, tau damping (R/ui.R:253-258); tau=0 -> no damping
    theta_exp = np.concatenate(
        [np.full(B_vec[i], float(theta[i])) for i in range(len(vars_use))]
    )
    if options.tau > 0:
        # damping factor 1 - exp(-z^2) saturates at 1 well before z=40;
        # clamp the NUMERATOR so neither the divide (subnormal tau) nor
        # the square (z ~ 1e154) can overflow for extreme N_b/(K*tau)
        den = float(K) * float(options.tau)
        z = np.minimum(np.asarray(N_b, dtype=np.float64), 40.0 * den) / den
        theta_exp = theta_exp * (1 - np.exp(-(z**2)))
    theta_exp = theta_exp.astype(np.float32)

    return ResolvedParams(
        N=N,
        d=d,
        K=K,
        vars_use=list(vars_use),
        B_vec=B_vec,
        levels=levels,
        offsets=offsets,
        B=B,
        N_b=N_b,
        Pr_b=Pr_b.astype(np.float32),
        sigma=sigma_arr,
        theta=theta_exp,
        lamb=lamb_vec,
        alpha=options.alpha,
        block_size=block_size,
        max_iter_cluster=options.max_iter_cluster,
        epsilon_cluster=options.epsilon_cluster,
        epsilon_harmony=(options.epsilon_harmony if early_stop else -np.inf),
        batch_prop_cutoff=options.batch_prop_cutoff,
        max_iter=max_iter,
        seed=seed,
    )
