"""Interleaved-alist speed benchmark (VERDICT r4 #4 throughput proof).

Decodes a NON-trivially-structured alist — the (3,6) 2^20 QC code
renumbered lift-index-first, which the plain aligned detector rejects —
through LDPCDecoder's automatic permuted-QC recovery, against the
aligned original as the control. Both must run the fused rotation
kernels at identical speed; without detect_qc_structure_permuted this
alist would fall to the general gather path (~0.4x).

Usage: python scripts/bench_interleaved.py [sigma] [frames]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import get_reg36_code, run_point  # noqa: E402
from ldpc_decoder_tpu.codes.qc import interleave_code_numbering  # noqa: E402


def main():
    sigma = float(sys.argv[1]) if len(sys.argv) > 1 else 0.87
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    code, s = get_reg36_code()
    print(f"aligned control ((3,6) 2^20, sigma={sigma}):", flush=True)
    mb_a, _, st_a = run_point(code, s, sigma, "bfloat16", "sum-product",
                              frames, first_check=0)
    icode, _, _ = interleave_code_numbering(code, s.Z)
    print("interleaved copy (plain detector fails; permuted autodetect "
          "must recover):", flush=True)
    mb_i, _, st_i = run_point(icode, None, sigma, "bfloat16",
                              "sum-product", frames, first_check=0)
    print(f"aligned {mb_a:.1f} Mb/s (FER {st_a['fer1']:.4f}) vs "
          f"interleaved {mb_i:.1f} Mb/s (FER {st_i['fer1']:.4f}) — "
          f"ratio {mb_i/mb_a:.3f}", flush=True)


if __name__ == "__main__":
    main()
