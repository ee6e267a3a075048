"""Protograph EXIT (P-EXIT) analysis for BI-AWGN thresholds.

Gaussian-approximation density evolution on a protograph (Liva/Chiani
P-EXIT): tracks per-edge mutual information through VN/CN updates using the
ten Brink J-function. Used to *design* base matrices — the reference ships
an unpublished capacity-approaching code (94.9% of Shannon, README.md:77-88);
random realizations of a degree profile land well short of the ensemble
threshold, so candidate protographs are scored here and the best lifted via
codes/qc.py.

Accuracy: the Gaussian approximation is good to ~0.01 in σ for these
ensembles; on-chip FER measurement remains the final arbiter.
"""

from __future__ import annotations

import numpy as np

# ten Brink J-function approximation (Brannstrom/Rasmussen/Grant)
_A1, _B1, _C1 = -0.0421061, 0.209252, -0.00640081
_A2, _B2, _C2 = 0.00181491, -0.142675, -0.0822054
_D2 = 0.0549608


def J(sigma):
    """Mutual information of a consistent Gaussian LLR with std sigma."""
    s = np.asarray(sigma, dtype=np.float64)
    out = np.where(
        s < 1.6363,
        _A1 * s**3 + _B1 * s**2 + _C1 * s,
        1.0 - np.exp(_A2 * s**3 + _B2 * s**2 + _C2 * s + _D2),
    )
    return np.clip(out, 0.0, 1.0 - 1e-12)


def J_inv(i):
    """Inverse of J (same piecewise approximation)."""
    x = np.asarray(i, dtype=np.float64)
    x = np.clip(x, 1e-12, 1.0 - 1e-12)
    a, b, c = 1.09542, 0.214217, 2.33727
    d, e, f = 0.706692, 0.386013, 1.75017
    return np.where(
        x < 0.3646,
        a * x**2 + b * x + c * np.sqrt(x),
        -d * np.log(e * (1.0 - x)) + f * x,
    )


def pexit_converges(base, sigma_n, punctured_cols=(), max_iters=1000,
                    target=1.0 - 1e-6):
    """Does P-EXIT drive all edge MIs to ~1 at AWGN noise std sigma_n?

    ``base`` is an integer protomatrix (entries = edge multiplicities).
    Vectorized with bincount-based leave-one-out sums.
    """
    base = np.asarray(base)
    R, C = base.shape
    rows, cols = np.nonzero(base)
    mult = base[rows, cols]
    er = np.repeat(rows, mult)
    ec = np.repeat(cols, mult)
    nE = er.shape[0]
    punct = np.zeros(C, dtype=bool)
    for c in punctured_cols:
        punct[c] = True
    sig_ch2 = np.where(punct[ec], 0.0, (2.0 / sigma_n) ** 2)
    ch2_col = np.where(punct, 0.0, (2.0 / sigma_n) ** 2)

    I_ec = np.zeros(nE)
    for _ in range(max_iters):
        s2 = J_inv(I_ec) ** 2
        tot_v = np.bincount(ec, weights=s2, minlength=C)
        I_ev = J(np.sqrt(np.maximum(tot_v[ec] - s2, 0.0) + sig_ch2))
        t2 = J_inv(1.0 - I_ev) ** 2
        tot_c = np.bincount(er, weights=t2, minlength=R)
        I_new = 1.0 - J(np.sqrt(np.maximum(tot_c[er] - t2, 0.0)))
        done = np.allclose(I_new, I_ec, atol=1e-10)
        I_ec = I_new
        app = J(np.sqrt(tot_v + ch2_col))
        if app.min() >= target:
            return True
        if done:
            break
    return False


def pexit_threshold(base, punctured_cols=(), lo=0.5, hi=1.2, tol=1e-3,
                    max_iters=2000):
    """Binary-search the P-EXIT convergence threshold sigma* of a base."""
    while hi - lo > tol:
        mid = 0.5 * (lo + hi)
        if pexit_converges(base, mid, punctured_cols, max_iters=max_iters):
            lo = mid
        else:
            hi = mid
    return lo
