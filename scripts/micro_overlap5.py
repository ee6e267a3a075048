"""Ablate the REAL grouped CN kernel to find what serializes phi vs DMA.

micro_overlap4 replicated staging + dynamic offsets + leave-one-out
multi-output in a probe kernel and phi stayed hidden under DMA (marginal
<= 0.29 ms), while the production CN exposes +2.9 ms. This script times
the real cn_pass_grouped loop under LDPC_ABLATE timing-only knobs
(qc_pallas_grouped._ablate; results are WRONG under ablation — walls
only):

  baseline      the shipped kernel
  static_halo   halo staged at a constant scratch offset (no dynamic-
                destination store)
  static_fine   window read at a constant scratch offset (no dynamic-
                offset load)
  no_votes      skip the d-term sign/parity accumulation
  no_signs      skip the per-output sign select (write phi magnitude)
  all           all of the above
Each phi live vs stubbed: the marginal localizes the serializer.
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from ldpc_decoder_tpu.runtime import perf  # noqa: E402
from scripts.micro_kernel_split import (  # noqa: E402
    B, K, loop_cn, loop_vn, make_state, timeit,
)

ALL = "static_halo,static_fine,no_votes,no_signs"


def measure(tag, tables, state, bytes_cn, bytes_vn):
    m, rc, llr, syn = state
    loop_cn.clear_cache()
    loop_vn.clear_cache()
    t_cn, _ = timeit(lambda: loop_cn(m, rc, syn, tables, K))
    t_vn, _ = timeit(lambda: loop_vn(rc, m, llr, tables, K))
    t_cn /= K
    t_vn /= K
    print(f"{tag:44s} CN {t_cn*1e3:7.3f} ms ({bytes_cn/t_cn/1e9:4.0f} GB/s)"
          f"  VN {t_vn*1e3:7.3f} ms ({bytes_vn/t_vn/1e9:4.0f} GB/s)",
          flush=True)
    return t_cn, t_vn


def main():
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
    bytes_cn, bytes_vn = perf.grouped_bytes_split(tables, B, msg_bytes=2)
    state = make_state(tables, jax.random.PRNGKey(0))
    print(f"B={B} K={K} bytes CN {bytes_cn/1e9:.2f} VN {bytes_vn/1e9:.2f} GB",
          flush=True)

    orig = g._phi_abs_f32
    for ab in ("", "static_halo", "static_fine", "no_votes", "no_signs",
               ALL):
        if ab:
            os.environ["LDPC_ABLATE"] = ab
        else:
            os.environ.pop("LDPC_ABLATE", None)
        tag = ab or "baseline"
        cn1, vn1 = measure(f"{tag} phi=live", tables, state, bytes_cn,
                           bytes_vn)
        try:
            g._phi_abs_f32 = lambda x, high=None, pre=None: x
            cn0, vn0 = measure(f"{tag} phi=stub", tables, state, bytes_cn,
                               bytes_vn)
        finally:
            g._phi_abs_f32 = orig
        print(f"   -> phi marginal CN {1e3*(cn1-cn0):+.3f} ms  "
              f"VN {1e3*(vn1-vn0):+.3f} ms", flush=True)
    os.environ.pop("LDPC_ABLATE", None)


if __name__ == "__main__":
    main()
