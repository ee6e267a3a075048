"""Lift and measure a fast-convergence 6x11/1p base (scripts/optimize_fast.py
at SIGMA_OP=0.94, EDGE=0.951) against the shipped p41 flagship.

DE predicts fewer iterations-to-converge at 0.94 (62-63 vs p41's 67,
scripts/out/fast_6x11_s21.log); p41's measured true-convergence average
(67.2) matched its DE count exactly, so the lift should land near the DE
number if the girth-8 repair preserves ensemble behavior.

Usage: python scripts/try_fast611.py  (BASE below is pasted from the
anneal log's FINAL line). Writes the alist to codes_cache/ for reuse.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

# pasted from scripts/out/fast_6x11_s21.log FINAL: DE iters 62 at 0.94
# (p41: 67), thr(120)=0.9547 (p41: 0.9549), col degs [5,6,3,1,1,3,2,1,2,7,8]
BASE = np.array(
    [[2, 2, 0, 0, 1, 0, 0, 0, 0, 2, 1],
     [2, 1, 0, 0, 0, 1, 1, 0, 0, 2, 1],
     [0, 2, 0, 0, 0, 0, 0, 1, 0, 2, 1],
     [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 2],
     [1, 1, 3, 0, 0, 1, 1, 0, 1, 0, 0],
     [0, 0, 0, 1, 0, 1, 0, 0, 0, 1, 3]], dtype=np.int8)

ALIST = "/root/repo/codes_cache/fast611.alist"
Z = int(os.environ.get("F611_Z", "11776"))  # 512*23: n = 11*8*Z = 1036288
M = 8


def main():
    from bench import run_point
    from ldpc_decoder_tpu.codes.protographs import (
        make_protograph_code_two_stage,
    )
    from ldpc_decoder_tpu.codes.qc import load_qc_alist, write_qc_alist

    if os.path.exists(ALIST):
        code, s = load_qc_alist(ALIST)
        print("loaded cached", ALIST, flush=True)
    else:
        assert BASE is not None, "paste the annealed BASE first"
        t0 = time.perf_counter()
        code, s = make_protograph_code_two_stage(
            BASE, (10,), m=M, Z=Z, seed=1, coarse=512, fine_mod=64)
        print(f"generated n={code.n_vars} (erased {code.n_erased_vars}) "
              f"in {time.perf_counter()-t0:.0f}s", flush=True)
        write_qc_alist(code, s, ALIST)
    if os.environ.get("F611_GEN_ONLY"):
        return
    for sigma in (0.94, 0.95):
        mbps, e2e, st = run_point(code, s, sigma, "bfloat16",
                                  "sum-product", 512, check_period=14,
                                  first_check=42)
        print(f"fast611 @ {sigma}: {mbps:.1f} Mb/s "
              f"(p41: ~210.6 @0.94), avg_iters {st['avg_iters']} "
              f"(p41: 71.9 @0.94), FER {st['fer1']:.4f}", flush=True)


if __name__ == "__main__":
    main()
