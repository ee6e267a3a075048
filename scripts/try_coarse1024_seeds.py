"""Seed search for the coarse=1024 p41 lift (halo amp 1.125 -> 1.0625).

The seed=1 candidate measured a wash (72.5 avg iters eats the ~1%/iter
halo saving — ROADMAP dead ends). Iteration count varies slightly per
lift seed, so a seed whose avg iters matches the shipped 71.9 would
keep the halo saving. Measures each candidate at the 0.94 operating
point under the current bench config (k=14, first check 70, B=256,
512 frames); a winner must then also pass FER 0/512 at sigma 0.95 and
min-iters >= 70 before shipping.

Usage: python scripts/try_coarse1024_seeds.py [seed ...]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE = "/root/repo/codes_cache"


def get_candidate(seed):
    from ldpc_decoder_tpu.codes.protographs import (
        P41_BASE,
        make_protograph_code_two_stage,
    )
    from ldpc_decoder_tpu.codes.qc import load_qc_alist, write_qc_alist

    path = os.path.join(CACHE, f"p41_coarse1024_s{seed}.alist")
    if seed == 1:
        path = os.path.join(CACHE, "p41_coarse1024.alist")
    if os.path.exists(path):
        code, s = load_qc_alist(path)
        print(f"seed {seed}: loaded cached {path}", flush=True)
        return code, s
    t0 = time.perf_counter()
    code, s = make_protograph_code_two_stage(
        P41_BASE, (6,), m=8, Z=18432, seed=seed, coarse=1024, fine_mod=64)
    print(f"seed {seed}: generated in {time.perf_counter()-t0:.0f}s",
          flush=True)
    write_qc_alist(code, s, path)
    return code, s


def main():
    from bench import run_point

    seeds = [int(a) for a in sys.argv[1:]] or [1, 2, 3]
    results = []
    for seed in seeds:
        code, s = get_candidate(seed)
        mbps, _, st = run_point(code, s, 0.94, "bfloat16", "sum-product",
                                512, check_period=14, first_check=70)
        results.append((seed, mbps, st["avg_iters"], st["min_iters"],
                        st["fer1"]))
        print(f"seed {seed}: {mbps:.1f} Mb/s, avg_iters "
              f"{st['avg_iters']} (shipped 71.89 @ 212.0), min "
              f"{st['min_iters']}, FER {st['fer1']:.4f}", flush=True)
    print("\nsummary (seed, Mb/s, avg_iters, min_iters, FER):", flush=True)
    for r in results:
        print("  ", r, flush=True)


if __name__ == "__main__":
    main()
