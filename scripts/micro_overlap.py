"""Does Mosaic overlap VPU work under DMA in the grouped kernels?

micro_kernel_split.py measured phi adding ~linearly onto the phi-stub
walls (CN 6.6->9.5 ms, VN 6.4->7.8 ms at B=256). Two readings:
 (a) additive — the pipeline never hides compute under DMA (fixable:
     ~4.3 ms/iter on the table), or
 (b) max-bound — overlap works and the kernels are genuinely VPU-bound
     with phi live (stub walls ~= DMA floor by coincidence).
This script discriminates by toggling the two Mosaic knobs that change
scheduling with zero kernel-code change (dimension_semantics=parallel,
scoped-VMEM limit 32 vs 64 MiB), and by timing a DOUBLE-phi variant
(phi(phi_abs(x)) twice the transcendental work, same traffic): if walls
are max-bound, doubling phi should add its full cost again; if the +delta
per extra phi stays constant, wall = DMA + VPU serial.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from ldpc_decoder_tpu.runtime import perf  # noqa: E402
from scripts.micro_kernel_split import (  # noqa: E402
    B, K, loop_cn, loop_vn, make_state, timeit,
)


def measure(tag, tables, state, bytes_cn, bytes_vn):
    m, rc, llr, syn = state
    loop_cn.clear_cache()
    loop_vn.clear_cache()
    t_cn, _ = timeit(lambda: loop_cn(m, rc, syn, tables, K))
    t_vn, _ = timeit(lambda: loop_vn(rc, m, llr, tables, K))
    t_cn /= K
    t_vn /= K
    print(f"{tag:28s} CN {t_cn*1e3:7.3f} ms ({bytes_cn/t_cn/1e9:4.0f} GB/s)"
          f"  VN {t_vn*1e3:7.3f} ms ({bytes_vn/t_vn/1e9:4.0f} GB/s)"
          f"  iter {1e3*(t_cn+t_vn):6.2f} ms", flush=True)
    return t_cn, t_vn


def main():
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
    bytes_cn, bytes_vn = perf.grouped_bytes_split(tables, B, msg_bytes=2)
    state = make_state(tables, jax.random.PRNGKey(0))
    print(f"B={B} K={K} bytes CN {bytes_cn/1e9:.2f} VN {bytes_vn/1e9:.2f} GB",
          flush=True)

    measure("baseline (32MiB, arbitrary)", tables, state, bytes_cn, bytes_vn)

    os.environ["LDPC_DIM_PARALLEL"] = "1"
    measure("dim=parallel", tables, state, bytes_cn, bytes_vn)
    del os.environ["LDPC_DIM_PARALLEL"]

    os.environ["LDPC_VMEM_LIMIT_MB"] = "64"
    measure("vmem=64MiB", tables, state, bytes_cn, bytes_vn)

    os.environ["LDPC_DIM_PARALLEL"] = "1"
    measure("vmem=64MiB + parallel", tables, state, bytes_cn, bytes_vn)
    del os.environ["LDPC_DIM_PARALLEL"]
    del os.environ["LDPC_VMEM_LIMIT_MB"]

    # double-phi: same traffic, ~2x transcendental work
    orig = g._phi_abs_f32
    try:
        g._phi_abs_f32 = lambda x, high=None, pre=None: orig(orig(x))
        measure("phi=double", tables, state, bytes_cn, bytes_vn)
    finally:
        g._phi_abs_f32 = orig


if __name__ == "__main__":
    main()
