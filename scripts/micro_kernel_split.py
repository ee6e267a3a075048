"""Per-kernel CN/VN occupancy profile for the grouped flagship kernels.

VERDICT r4 #2: the iteration profile (11.98 ms DMA floor + 3.3 ms phi,
additive, scripts/micro_phi.py) was never interrogated PER KERNEL. This
script answers two questions on the real chip at the flagship operating
point (p41 grouped tables, B=256, bf16, sum-product):

 1. Per kernel, is wall = max(DMA, VPU) (pipeline hides compute) or
    DMA + VPU (no overlap)? Measured by looping ONE pass (CN only / VN
    only) inside a single jit dispatch, phi live vs phi stubbed to
    identity, against the exact per-kernel byte accounting
    (runtime/perf.grouped_bytes_split).
 2. If one kernel has DMA slack, phi's self-inverse property lets its
    evaluations move across the CN/VN boundary (evaluate on read instead
    of on write) -> wall = max per kernel instead of additive.

Timing per CLAUDE.md: end-to-end wall with outputs fetched, several reps,
min taken; single dispatch per measurement (tunnel RTT ~33 ms).
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import get_code  # noqa: E402
from ldpc_decoder_tpu.ops import qc_pallas_grouped as g  # noqa: E402
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables  # noqa: E402
from ldpc_decoder_tpu.runtime import perf  # noqa: E402

B = int(os.environ.get("MK_B", "256"))
K = int(os.environ.get("MK_K", "28"))
DTYPE = jnp.bfloat16


def make_state(tables, key):
    Z = tables.Z
    k1, k2, k3 = jax.random.split(key, 3)
    m = (jax.random.normal(k1, (tables.nbv_pad, Z, B), jnp.float32)
         * 0.5 + 1.0).astype(DTYPE)
    rc = (jax.random.normal(k2, (tables.nbc_pad, Z, B), jnp.float32)
          * 0.5 + 1.0).astype(DTYPE)
    llr = (jax.random.normal(k3, (tables.C, Z, B), jnp.float32)
           * 2.0 + 1.0).astype(DTYPE)
    syn = jnp.zeros((tables.R, Z, B), jnp.int8)
    return m, rc, llr, syn


@partial(jax.jit, static_argnames=("k",))
def loop_cn(m, rc, syn, tables, k):
    # rc is loop-carried and recycled in place by the aliased per-group
    # writes (XLA inserts one defensive copy at entry, amortized over k)
    def body(_, rc):
        return g.cn_pass_grouped(m, syn, rc, tables, "sum-product")

    return jax.lax.fori_loop(0, k, body, rc)


@partial(jax.jit, static_argnames=("k",))
def loop_vn(rc, m, llr, tables, k):
    def body(_, m):
        out, _ = g.vn_pass_grouped(rc, llr, m, tables, emit_bits=False,
                                   alg="sum-product")
        return out

    return jax.lax.fori_loop(0, k, body, m)


def timeit(fn, reps=4):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best, compile_s


def run_all(tag, tables, state, bytes_cn, bytes_vn):
    m, rc, llr, syn = state
    loop_cn.clear_cache()
    loop_vn.clear_cache()
    best, comp = timeit(lambda: loop_cn(m, rc, syn, tables, K))
    per = best / K
    print(f"{tag} CN : {per*1e3:7.3f} ms/pass  "
          f"{bytes_cn/per/1e9:6.0f} GB/s  (compile {comp:.1f}s)",
          flush=True)
    t_cn = per
    best, comp = timeit(lambda: loop_vn(rc, m, llr, tables, K))
    per = best / K
    print(f"{tag} VN : {per*1e3:7.3f} ms/pass  "
          f"{bytes_vn/per/1e9:6.0f} GB/s  (compile {comp:.1f}s)",
          flush=True)
    return t_cn, per


def main():
    code, qc = get_code()
    t = QCDecodeTables.from_structure(qc, code.n_erased_vars)
    tables = g.GroupedQCPallasTables.from_qc_tables(t, msg_bytes=2)
    print(f"Z={tables.Z} C={tables.C} R={tables.R} tile={tables.tile} "
          f"seam={tables.seam} nb={tables.nb} B={B} K={K}", flush=True)
    print("row groups:",
          [(gr.count, gr.degree) for gr in tables.row_groups])
    print("col groups:",
          [(gr.count, gr.degree) for gr in tables.col_groups])
    bytes_cn, bytes_vn = perf.grouped_bytes_split(tables, B, msg_bytes=2)
    print(f"bytes/pass: CN {bytes_cn/1e9:.2f} GB, VN {bytes_vn/1e9:.2f} GB",
          flush=True)

    state = make_state(tables, jax.random.PRNGKey(0))

    cn1, vn1 = run_all("phi=live", tables, state, bytes_cn, bytes_vn)

    orig = g._phi_abs_f32
    orig_n = g._phi_neg_f32
    try:
        g._phi_abs_f32 = lambda x, high=None, pre=None: x
        g._phi_neg_f32 = lambda x, high=None, pre=None: x
        cn0, vn0 = run_all("phi=stub", tables, state, bytes_cn, bytes_vn)
    finally:
        g._phi_abs_f32 = orig
        g._phi_neg_f32 = orig_n

    print(f"\nphi cost: CN {1e3*(cn1-cn0):+.3f} ms  VN {1e3*(vn1-vn0):+.3f}"
          f" ms   (additive => no overlap; ~0 => hidden under DMA)")
    print(f"iteration live {1e3*(cn1+vn1):.2f} ms, stub "
          f"{1e3*(cn0+vn0):.2f} ms")


if __name__ == "__main__":
    main()
