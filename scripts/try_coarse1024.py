"""p41 on a coarse=1024 shift lattice: tile-1024 kernels (halo amp
1.125 -> 1.0625). Measures avg iterations + throughput + FER at the
0.94 operating point vs the shipped coarse=512 flagship.

(coarse=2048 was a measured wash: +2.7%/iter kernel speed but +5% avg
iterations; 1024 is the untested middle point.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ALIST = "/root/repo/codes_cache/p41_coarse1024.alist"


def main():
    import jax

    from bench import run_point
    from ldpc_decoder_tpu.codes.protographs import (
        P41_BASE,
        make_protograph_code_two_stage,
    )
    from ldpc_decoder_tpu.codes.qc import load_qc_alist, write_qc_alist

    if os.path.exists(ALIST):
        code, s = load_qc_alist(ALIST)
        print("loaded cached", ALIST, flush=True)
    else:
        t0 = time.perf_counter()
        code, s = make_protograph_code_two_stage(
            P41_BASE, (6,), m=8, Z=18432, seed=1,
            coarse=1024, fine_mod=64)
        print(f"generated in {time.perf_counter()-t0:.0f}s", flush=True)
        write_qc_alist(code, s, ALIST)
    mbps, e2e, st = run_point(code, s, 0.94, "bfloat16", "sum-product",
                              512, check_period=14)
    print(f"coarse1024: {mbps:.1f} Mb/s (shipped coarse512: ~209), "
          f"avg_iters {st['avg_iters']} (shipped: 71.9), "
          f"FER {st['fer1']:.4f}", flush=True)


if __name__ == "__main__":
    main()
