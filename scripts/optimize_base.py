"""P-EXIT-guided protograph search.

Scores random realizations of the RU max-d_v-8 rate-1/2 degree profile and
hill-climbs with degree-preserving edge swaps, maximizing the
ITERATION-CONSTRAINED P-EXIT threshold (convergence within DE_ITERS
density-evolution iterations). Maximizing the asymptotic threshold alone
picks narrow-EXIT-tunnel bases that need hundreds of BP iterations
(measured: a sigma*=0.9471 base Fails at sigma 0.90 under a 120-iteration
decoder where a sigma*=0.9272 base succeeds). Prints the best base as a
reproducible literal.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ldpc_decoder_tpu.codes.pexit import pexit_threshold  # noqa: E402
from ldpc_decoder_tpu.codes.protographs import ru_irregular_base  # noqa: E402


def swap_move(base, rng):
    """Degree-preserving rewire: pick edges (r1,c1),(r2,c2) with the cross
    cells empty, move to (r1,c2),(r2,c1)."""
    rows, cols = np.nonzero(base)
    for _ in range(200):
        i, j = rng.integers(0, rows.shape[0], 2)
        r1, c1 = rows[i], cols[i]
        r2, c2 = rows[j], cols[j]
        if r1 == r2 or c1 == c2:
            continue
        if base[r1, c2] or base[r2, c1]:
            continue
        nb = base.copy()
        nb[r1, c1] = 0
        nb[r2, c2] = 0
        nb[r1, c2] = 1
        nb[r2, c1] = 1
        return nb
    return None


DE_ITERS = 60


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    t0 = time.perf_counter()
    best, best_thr = None, 0.0
    for seed in range(24):
        base, _ = ru_irregular_base(scale, seed=seed)
        thr = pexit_threshold(base, tol=2e-3, max_iters=DE_ITERS)
        if thr > best_thr:
            best, best_thr = base, thr
            print(f"seed {seed}: {thr:.4f} *", flush=True)
    print(f"best random: {best_thr:.4f} ({time.perf_counter()-t0:.0f}s)",
          flush=True)

    rng = np.random.default_rng(0)
    stall = 0
    while stall < 120:
        cand = swap_move(best, rng)
        if cand is None:
            break
        thr = pexit_threshold(cand, lo=best_thr - 0.01, tol=1e-3,
                              max_iters=DE_ITERS)
        if thr > best_thr + 5e-4:
            best, best_thr = cand, thr
            stall = 0
            print(f"climb -> {thr:.4f} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
        else:
            stall += 1
    print(f"FINAL threshold {best_thr:.4f}")
    print("col degrees:", np.bincount(np.nonzero(best)[1],
                                      minlength=best.shape[1]).tolist()
          if False else best.sum(axis=0).tolist())
    print("row degrees:", best.sum(axis=1).tolist())
    print("BASE = np.array(", best.tolist(), ", dtype=np.int8)")


if __name__ == "__main__":
    main()
