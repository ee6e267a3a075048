"""DE experiment: hybrid min-sum-burst -> sum-product-finish schedule.

Idea (round 4): the delayed-first-check burst phase (~70 iterations on
the flagship, no parity machinery) could run OFFSET MIN-SUM in int8 —
~half the HBM traffic, no transcendentals — then switch to exact BP for
the finish (messages converted once via phi(m)), keeping the final
convergence/FER behavior of sum-product. Decode time becomes
m * t_ms + (total - m) * t_sp; a win if min-sum's early iterations make
progress at a comparable per-iteration rate.

This script measures, via the sampled DE (codes/pexit internals), the
TOTAL iterations to converge for burst lengths m, at sigma.

Usage: python scripts/try_hybrid_de.py [sigma] [alpha] [beta]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from ldpc_decoder_tpu.codes.protographs import P41_BASE  # noqa: E402


def hybrid_run(base, sigma, punct_cols, m_burst, alpha, beta, clamp=64.0,
               n_samples=20000, max_iters=400, seed=7, target_err=0.0):
    """m_burst iterations of offset min-sum, then sum-product to target.
    Returns (converged, total_iters)."""
    base = np.asarray(base)
    R, C = base.shape
    rows, cols = np.nonzero(base)
    mult = base[rows, cols]
    er = np.repeat(rows, mult)
    ec = np.repeat(cols, mult)
    punct = np.zeros(C, bool)
    for c in punct_cols:
        punct[c] = True
    rng = np.random.default_rng(seed)
    mu, sd = 2.0 / sigma**2, 2.0 / sigma
    ch = np.zeros((C, n_samples), np.float32)
    for c in range(C):
        if not punct[c]:
            ch[c] = rng.normal(mu, sd, n_samples)
    row_edges = [np.flatnonzero(er == r) for r in range(R)]
    col_edges = [np.flatnonzero(ec == c) for c in range(C)]
    v2c = ch[ec].copy()
    c2v = np.zeros_like(v2c)
    for it in range(1, max_iters + 1):
        minsum = it <= m_burst
        rng.permuted(v2c, axis=1, out=v2c)
        for r in range(R):
            e = row_edges[r]
            m = v2c[e]
            if minsum:
                a = np.abs(m)
                sgn = np.sign(m)
                sgn[sgn == 0] = 1.0
                d = len(e)
                order = np.argsort(a, axis=0)
                min1 = np.take_along_axis(a, order[0:1], axis=0)
                min2 = (np.take_along_axis(a, order[1:2], axis=0)
                        if d > 1 else np.zeros_like(min1))
                pos = order[0:1]
                other = np.where(np.arange(d)[:, None] == pos, min2, min1)
                res = np.maximum(alpha * other - beta, 0.0)
                c2v[e] = (np.prod(sgn, axis=0, keepdims=True) * sgn) * res
            else:
                t = np.tanh(np.clip(m, -38.0, 38.0) / 2.0)
                is_z = t == 0.0
                nz = is_z.sum(axis=0, keepdims=True)
                t_safe = np.where(is_z, 1.0, t)
                prod_nz = np.prod(t_safe, axis=0, keepdims=True)
                loo = np.where(nz == 0, prod_nz / t_safe,
                               np.where((nz == 1) & is_z, prod_nz, 0.0))
                c2v[e] = 2.0 * np.arctanh(
                    np.clip(loo, -0.9999999, 0.9999999))
        rng.permuted(c2v, axis=1, out=c2v)
        err = 0.0
        for c in range(C):
            e = col_edges[c]
            r_in = c2v[e]
            tot = ch[c] + r_in.sum(axis=0)
            err = max(err, float(np.mean(tot < 0.0)))
            v2c[e] = np.clip(tot[None, :] - r_in, -clamp, clamp)
        if err <= target_err:
            return True, it
    return False, max_iters


def main():
    sigma = float(sys.argv[1]) if len(sys.argv) > 1 else 0.94
    alpha = float(sys.argv[2]) if len(sys.argv) > 2 else 0.95
    beta = float(sys.argv[3]) if len(sys.argv) > 3 else 0.4
    # per-iteration costs [ms] at B=256 on the flagship tables:
    # t_sp from the round-3 profile; t_ms placeholders refined by
    # scripts/micro_minsum.py (bf16) and the int8 measurement
    t_sp = 16.4
    for m in (0, 20, 40, 55, 70, 85, 1000):
        tots = []
        for sd in (7, 11, 3):
            ok, it = hybrid_run(P41_BASE, sigma, (6,), m, alpha, beta,
                                n_samples=12000, seed=sd,
                                target_err=10 / 12000)
            tots.append(it if ok else None)
        good = [t for t in tots if t]
        est = ""
        if good and m < 1000:
            tot = float(np.mean(good))
            for t_ms, tag in ((12.0, "bf16"), (9.0, "int8")):
                mm = min(m, tot)
                cost = mm * t_ms + max(tot - mm, 0) * t_sp
                est += f" {tag}:{cost:.0f}ms"
            est += f" (pure-SP {np.mean(good) if m == 0 else 0:.0f})"
        print(f"burst m={m}: total iters {tots}{est}", flush=True)


if __name__ == "__main__":
    main()
